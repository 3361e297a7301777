"""Round-3 registry additions, batch 25 — regression discontinuity,
cohort LTV curves, and lexical-richness profiling.

Same contract as ``registry.py``. Imported at the bottom of
``registry.py``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import _register, _t

# ---------------------------------------------------------------------------
# Regression discontinuity at the zero account-balance cutoff
# ---------------------------------------------------------------------------

_RDD_BW = 50000  # bandwidth in balance cents around the cutoff


def _rdd_side_sql(name: str, cond: str) -> str:
    return f"""
    {name} AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx
      FROM obs WHERE {cond}
    )"""


def _rdd_fit_sql(t: str) -> str:
    """intercept at x=0 from exact integer moments."""
    return (
        f"(CAST({t}.sy AS DOUBLE) * {t}.sxx - CAST({t}.sx AS DOUBLE)"
        f" * {t}.sxy) / (CAST({t}.n AS DOUBLE) * {t}.sxx"
        f" - CAST({t}.sx AS DOUBLE) * {t}.sx)"
    )


def _rdd_slope_sql(t: str) -> str:
    return (
        f"(CAST({t}.n AS DOUBLE) * {t}.sxy - CAST({t}.sx AS DOUBLE)"
        f" * {t}.sy) / (CAST({t}.n AS DOUBLE) * {t}.sxx"
        f" - CAST({t}.sx AS DOUBLE) * {t}.sx)"
    )


@_register(
    "regression_discontinuity_balance",
    f"""
    WITH ords AS (
      SELECT o_custkey, CAST(count(*) AS BIGINT) AS y FROM orders
      GROUP BY 1
    ),
    obs AS (
      SELECT CAST(floor(c.c_acctbal * 100) AS BIGINT) AS x,
             coalesce(o.y, 0) AS y
      FROM customer c LEFT JOIN ords o ON o.o_custkey = c.c_custkey
      WHERE CAST(floor(c.c_acctbal * 100) AS BIGINT)
              BETWEEN -{_RDD_BW} AND {_RDD_BW}
    ),
    {_rdd_side_sql("lo", f"x < 0")},
    {_rdd_side_sql("hi", f"x >= 0")}
    SELECT lo.n AS n_left, hi.n AS n_right,
           floor(({_rdd_fit_sql("lo")}) * 1000000 + 0.5) / 1000000.0
             AS intercept_left,
           floor(({_rdd_fit_sql("hi")}) * 1000000 + 0.5) / 1000000.0
             AS intercept_right,
           floor(({_rdd_slope_sql("lo")}) * 1e12 + 0.5) / 1e12
             AS slope_left,
           floor(({_rdd_slope_sql("hi")}) * 1e12 + 0.5) / 1e12
             AS slope_right,
           floor((({_rdd_fit_sql("hi")}) - ({_rdd_fit_sql("lo")}))
                 * 1000000 + 0.5) / 1000000.0 AS rd_jump
    FROM lo CROSS JOIN hi
    """,
    "Regression discontinuity design at the zero account-balance "
    f"cutoff (bandwidth ±{_RDD_BW} cents): local linear fits of "
    "order count on balance from EXACT integer moments on each "
    "side, intercepts evaluated AT the cutoff, and the RD jump = "
    "right-intercept minus left-intercept — the causal-inference "
    "design for threshold-assigned treatments (credit lines, "
    "eligibility cliffs), completing the identification family: "
    "DiD (parallel trends), CUPED (variance reduction), uplift "
    "(heterogeneity), Shapley (credit), RDD (local randomization "
    "at a cutoff). Two 5-integer aggregates; every division "
    "pinned, slopes rounded at 1e-12 (cents-scale moments make "
    "them tiny).",
    ("stats", "causal", "customer"),
)
def regression_discontinuity_balance(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    ords = o.groupBy("o_custkey").agg(F.count("*").alias("y"))
    x = F.floor(F.col("c_acctbal") * 100).cast("long")
    obs = (
        c.join(ords, c.c_custkey == ords.o_custkey, "left")
        .select(
            x.alias("x"), F.coalesce(F.col("y"), F.lit(0)).alias("y")
        )
        .filter(F.col("x").between(-_RDD_BW, _RDD_BW))
        .localCheckpoint(eager=False)
    )

    def side(cond):
        return obs.filter(cond).agg(
            F.count("*").alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x").cast("decimal(20,0)") * F.col("y")).alias("sxy"),
            F.sum(F.col("x").cast("decimal(20,0)") * F.col("x")).alias("sxx"),
        )

    lo = side(F.col("x") < 0)
    hi = side(F.col("x") >= 0)

    def intercept(p):
        return (
            F.col(f"{p}_sy").cast("double") * F.col(f"{p}_sxx")
            - F.col(f"{p}_sx").cast("double") * F.col(f"{p}_sxy")
        ) / (
            F.col(f"{p}_n").cast("double") * F.col(f"{p}_sxx")
            - F.col(f"{p}_sx").cast("double") * F.col(f"{p}_sx")
        )

    def slope(p):
        return (
            F.col(f"{p}_n").cast("double") * F.col(f"{p}_sxy")
            - F.col(f"{p}_sx").cast("double") * F.col(f"{p}_sy")
        ) / (
            F.col(f"{p}_n").cast("double") * F.col(f"{p}_sxx")
            - F.col(f"{p}_sx").cast("double") * F.col(f"{p}_sx")
        )

    lo = lo.select(*[F.col(c0).alias(f"lo_{c0}") for c0 in lo.columns])
    hi = hi.select(*[F.col(c0).alias(f"hi_{c0}") for c0 in hi.columns])
    r6 = lambda col: F.floor(col * 1000000 + F.lit(0.5)) / 1000000.0  # noqa: E731
    r12 = lambda col: F.floor(col * 1e12 + F.lit(0.5)) / 1e12  # noqa: E731
    return lo.crossJoin(hi).select(
        F.col("lo_n").cast("long").alias("n_left"),
        F.col("hi_n").cast("long").alias("n_right"),
        r6(intercept("lo")).alias("intercept_left"),
        r6(intercept("hi")).alias("intercept_right"),
        r12(slope("lo")).alias("slope_left"),
        r12(slope("hi")).alias("slope_right"),
        r6(intercept("hi") - intercept("lo")).alias("rd_jump"),
    )


# ---------------------------------------------------------------------------
# Cohort LTV curve: cumulative revenue per user by cohort age
# ---------------------------------------------------------------------------

@_register(
    "cohort_ltv_curve",
    """
    WITH first_seen AS (
      SELECT user_id, CAST(date_trunc('month', min(ts)) AS DATE) AS cohort
      FROM events GROUP BY 1
    ),
    purchases AS (
      SELECT e.user_id, f.cohort,
             date_diff('month', f.cohort,
                       CAST(date_trunc('month', e.ts) AS DATE)) AS age,
             CAST(floor(e.value * 10000) AS BIGINT) AS rev
      FROM events e JOIN first_seen f ON f.user_id = e.user_id
      WHERE e.event_type = 'purchase'
    ),
    sizes AS (
      SELECT cohort, CAST(count(*) AS BIGINT) AS cohort_users
      FROM first_seen GROUP BY 1
    ),
    rev_age AS (
      SELECT cohort, age, CAST(sum(rev) AS BIGINT) AS rev
      FROM purchases GROUP BY 1, 2
    ),
    cum AS (
      SELECT cohort, age,
             CAST(sum(rev) OVER (PARTITION BY cohort ORDER BY age
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS cum_rev
      FROM rev_age
    )
    SELECT c.cohort, CAST(c.age AS INTEGER) AS age_months,
           s.cohort_users, c.cum_rev,
           CAST(c.cum_rev // s.cohort_users AS BIGINT)
             AS ltv_per_user
    FROM cum c JOIN sizes s ON s.cohort = c.cohort
    """,
    "Cohort LTV curve — the unit-economics readout behind every "
    "payback-period decision: users cohort by first-seen month, "
    "purchase revenue accumulates by months-since-cohort, and "
    "each (cohort, age) cell reports cumulative revenue per "
    "cohort user in exact integer ten-thousandths (floor division "
    "— both engines truncate identically). The revenue companion "
    "to `cohort_retention_events` (same triangle, counts) — "
    "retention says WHO stays, LTV says what staying is worth. "
    "Running sums partition per cohort over month-grained ages; "
    "everything is cohort-grid-sized after one fact rollup.",
    ("bi", "cohort", "revenue", "events"),
)
def cohort_ltv_curve(spark, sf_dir):
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events")
    first_seen = e.groupBy("user_id").agg(
        F.trunc(F.min("ts").cast("date"), "month").alias("cohort")
    )
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .join(first_seen, "user_id")
        .select(
            "cohort",
            (
                F.months_between(
                    F.trunc(F.col("ts").cast("date"), "month"),
                    F.col("cohort"),
                )
            )
            .cast("long")
            .alias("age"),
            F.floor(F.col("value") * 10000).cast("long").alias("rev"),
        )
    )
    sizes = first_seen.groupBy("cohort").agg(
        F.count("*").alias("cohort_users")
    )
    rev_age = purchases.groupBy("cohort", "age").agg(
        F.sum("rev").alias("rev")
    )
    w = (
        Window.partitionBy("cohort")
        .orderBy("age")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = rev_age.select(
        "cohort", "age", F.sum("rev").over(w).alias("cum_rev")
    )
    return cum.join(F.broadcast(sizes), "cohort").select(
        "cohort",
        F.col("age").cast("int").alias("age_months"),
        F.col("cohort_users").cast("long").alias("cohort_users"),
        F.col("cum_rev").cast("long").alias("cum_rev"),
        F.expr("cum_rev div cohort_users").cast("long").alias(
            "ltv_per_user"
        ),
    )


# ---------------------------------------------------------------------------
# Lexical richness profile per document source
# ---------------------------------------------------------------------------

@_register(
    "lexical_richness_by_source",
    """
    WITH toks AS (
      SELECT source, tok FROM (
        SELECT source,
               unnest(list_filter(string_split_regex(lower(text),
                                                     '[^a-z0-9]+'),
                                  x -> x <> '')) AS tok
        FROM documents
      )
    ),
    counts AS (
      SELECT source, tok, CAST(count(*) AS BIGINT) AS c
      FROM toks GROUP BY 1, 2
    ),
    agg AS (
      SELECT source,
             CAST(sum(c) AS BIGINT) AS n_tokens,
             CAST(count(*) AS BIGINT) AS n_types,
             CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS hapax,
             CAST(sum(c * (c - 1)) AS BIGINT) AS pairs2
      FROM counts GROUP BY 1
    )
    SELECT source, n_tokens, n_types, hapax,
           floor(n_types / CAST(n_tokens AS DOUBLE) * 1000000 + 0.5)
             / 1000000.0 AS ttr,
           floor(hapax / CAST(n_types AS DOUBLE) * 1000000 + 0.5)
             / 1000000.0 AS hapax_rate,
           floor(pairs2 / (CAST(n_tokens AS DOUBLE)
                           * (n_tokens - 1)) * 1000000 + 0.5)
             / 1000000.0 AS simpson_d
    FROM agg
    """,
    "Lexical richness profile per source: type-token ratio, hapax-"
    "legomena rate (the share of vocabulary seen exactly once — "
    "the sensitive indicator of templated vs organic text), and "
    "Simpson's D repeat-probability (sum c(c-1) / n(n-1), the "
    "unbiased collision estimate) — all exact integer counts with "
    "one pinned division each. The per-source companion to the "
    "corpus-level `vocab_growth_heaps_documents` / "
    "`zipf_slope_vocab` laws: a source whose TTR and hapax rate "
    "collapse is machine-generated or boilerplate-heavy, exactly "
    "what a 100 TB ingest wants flagged per-source before "
    "training. One token shuffle, one source-grid aggregate.",
    ("text-quality", "vocabulary", "documents"),
)
def lexical_richness_by_source(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "source",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
                lambda x: x != "",
            )
        ).alias("tok"),
    )
    counts = toks.groupBy("source", "tok").agg(F.count("*").alias("c"))
    agg = counts.groupBy("source").agg(
        F.sum("c").alias("n_tokens"),
        F.count("*").alias("n_types"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).alias("hapax"),
        F.sum(F.col("c") * (F.col("c") - 1)).alias("pairs2"),
    )
    r6 = lambda col: F.floor(col * 1000000 + F.lit(0.5)) / 1000000.0  # noqa: E731
    return agg.select(
        "source",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_types").cast("long").alias("n_types"),
        F.col("hapax").cast("long").alias("hapax"),
        r6(F.col("n_types") / F.col("n_tokens").cast("double")).alias("ttr"),
        r6(F.col("hapax") / F.col("n_types").cast("double")).alias(
            "hapax_rate"
        ),
        r6(
            F.col("pairs2")
            / (
                F.col("n_tokens").cast("double")
                * (F.col("n_tokens") - 1)
            )
        ).alias("simpson_d"),
    )
