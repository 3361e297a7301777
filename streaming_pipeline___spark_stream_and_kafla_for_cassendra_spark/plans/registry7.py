"""Round-2 (cont.) registry additions — causal inference (DiD),
heavy-tail estimation, experiment power planning, and distribution-
matching reweighting.

Same contract as ``registry.py``. Imported at the bottom of
``registry.py``.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import _register, _t


def _r6(col):
    return F.floor(col * 1000000 + F.lit(0.5)) / F.lit(1000000.0)


# ---------------------------------------------------------------------------
# Difference-in-differences estimator (md5 cohorts × pre/post period)
# ---------------------------------------------------------------------------

_DID_CUT = "2024-01-16"


@_register(
    "diff_in_diff_ab_events",
    f"""
    WITH cells AS (
      SELECT CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1)
                       IN ('0','1','2','3','4','5','6','7')
                  THEN 'A' ELSE 'B' END AS grp,
             CASE WHEN ts < TIMESTAMP '{_DID_CUT}' THEN 'pre' ELSE 'post' END
               AS period,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS s
      FROM events WHERE value IS NOT NULL
      GROUP BY 1, 2
    ),
    w AS (
      SELECT
        max(CASE WHEN grp = 'A' AND period = 'pre'  THEN s END)
          / CAST(max(CASE WHEN grp = 'A' AND period = 'pre'  THEN n END)
                 AS DOUBLE) AS a_pre,
        max(CASE WHEN grp = 'A' AND period = 'post' THEN s END)
          / CAST(max(CASE WHEN grp = 'A' AND period = 'post' THEN n END)
                 AS DOUBLE) AS a_post,
        max(CASE WHEN grp = 'B' AND period = 'pre'  THEN s END)
          / CAST(max(CASE WHEN grp = 'B' AND period = 'pre'  THEN n END)
                 AS DOUBLE) AS b_pre,
        max(CASE WHEN grp = 'B' AND period = 'post' THEN s END)
          / CAST(max(CASE WHEN grp = 'B' AND period = 'post' THEN n END)
                 AS DOUBLE) AS b_post,
        CAST(sum(n) AS BIGINT) AS n_events
      FROM cells
    )
    SELECT n_events,
           floor(a_pre  * 10000 + 0.5) / 10000.0 AS mean_a_pre_cents,
           floor(a_post * 10000 + 0.5) / 10000.0 AS mean_a_post_cents,
           floor(b_pre  * 10000 + 0.5) / 10000.0 AS mean_b_pre_cents,
           floor(b_post * 10000 + 0.5) / 10000.0 AS mean_b_post_cents,
           floor(((a_post - a_pre) - (b_post - b_pre)) * 1000000 + 0.5)
             / 1000000.0 AS did_cents
    FROM w
    """,
    "Difference-in-differences causal estimate: md5-hashed A/B "
    "cohorts × pre/post period form a 2×2 grid of mean event values "
    "(exact integer-cent sums / counts), and the DiD effect is "
    "(ΔA) − (ΔB) — the parallel-trends estimator that complements "
    "the CUPED operator's variance reduction. ONE map-side-combined "
    "scan produces all four cells; the pivot runs on 4 rows. Every "
    "double is a pinned IEEE expression over exact integers.",
    ("stats", "ab-testing", "causal", "events"),
)
def diff_in_diff_ab_events(spark, sf_dir):
    e = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    grp = F.when(
        F.substring(
            F.md5(F.col("user_id").cast("string").cast("binary")), 1, 1
        ).isin(*"01234567"),
        "A",
    ).otherwise("B")
    period = F.when(
        F.col("ts") < F.lit(_DID_CUT).cast("timestamp"), "pre"
    ).otherwise("post")
    cents = F.floor(F.col("value") * 100).cast("long")
    cells = e.groupBy(grp.alias("grp"), period.alias("period")).agg(
        F.count("*").alias("n"), F.sum(cents).alias("s")
    )

    def cell(g, p):
        m = F.max(
            F.when((F.col("grp") == g) & (F.col("period") == p), F.col("s"))
        )
        c = F.max(
            F.when((F.col("grp") == g) & (F.col("period") == p), F.col("n"))
        )
        return m / c.cast("double")

    w = cells.agg(
        cell("A", "pre").alias("a_pre"),
        cell("A", "post").alias("a_post"),
        cell("B", "pre").alias("b_pre"),
        cell("B", "post").alias("b_post"),
        F.sum("n").alias("n_events"),
    )
    r4 = lambda c: F.floor(c * 10000 + F.lit(0.5)) / F.lit(10000.0)  # noqa: E731
    return w.select(
        F.col("n_events").cast("long").alias("n_events"),
        r4(F.col("a_pre")).alias("mean_a_pre_cents"),
        r4(F.col("a_post")).alias("mean_a_post_cents"),
        r4(F.col("b_pre")).alias("mean_b_pre_cents"),
        r4(F.col("b_post")).alias("mean_b_post_cents"),
        _r6(
            (F.col("a_post") - F.col("a_pre"))
            - (F.col("b_post") - F.col("b_pre"))
        ).alias("did_cents"),
    )


# ---------------------------------------------------------------------------
# Hill estimator of the revenue tail index
# ---------------------------------------------------------------------------

_HILL_K = 200


@_register(
    "hill_tail_index_orders",
    f"""
    WITH cents AS (
      SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS v FROM orders
    ),
    ranked AS (
      SELECT v, row_number() OVER (ORDER BY v DESC) AS rk FROM cents
    ),
    thresh AS (SELECT v AS vk FROM ranked WHERE rk = {_HILL_K} + 1),
    terms AS (
      SELECT r.rk, ln(r.v / CAST(t.vk AS DOUBLE)) AS term
      FROM ranked r CROSS JOIN thresh t
      WHERE r.rk <= {_HILL_K}
    ),
    folded AS (
      SELECT list_reduce(list_prepend(0.0, list(term ORDER BY rk)),
                         (a, x) -> a + x) AS s
      FROM terms
    )
    SELECT CAST({_HILL_K} AS BIGINT) AS k,
           floor(s / {_HILL_K} * 1000000 + 0.5) / 1000000.0 AS hill_gamma,
           floor({_HILL_K} / s * 1000000 + 0.5) / 1000000.0 AS tail_alpha
    FROM folded
    """,
    "Hill estimator of the heavy-tail index of order revenue: "
    "γ̂ = (1/k)·Σ ln(x(i)/x(k+1)) over the top-k order statistics "
    "(k=200), with α̂ = 1/γ̂ — the standard answer to 'how heavy is "
    "the whale tail?' that Gini/Pareto curves don't quantify. The "
    "top-(k+1) rows come from one rank window (TOP-K pushdown at "
    "scale); the k log-ratio terms fold left-to-right in rank order "
    "so both engines sum identical doubles identically. Values are "
    "exact integer cents; ties broken by rank make the top-k set "
    "deterministic because equal values yield equal terms.",
    ("stats", "tail", "orders"),
)
def hill_tail_index_orders(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    cents = o.select(
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("v")
    )
    rk = Window.orderBy(F.desc("v"))
    ranked = cents.select("v", F.row_number().over(rk).alias("rk")).filter(
        F.col("rk") <= _HILL_K + 1
    )
    thresh = ranked.filter(F.col("rk") == _HILL_K + 1).select(
        F.col("v").alias("vk")
    )
    terms = (
        ranked.filter(F.col("rk") <= _HILL_K)
        .crossJoin(F.broadcast(thresh))
        .select("rk", F.log(F.col("v") / F.col("vk").cast("double")).alias("term"))
    )
    folded = terms.agg(
        F.aggregate(
            F.array_sort(
                F.collect_list(F.struct(F.col("rk"), F.col("term").alias("t")))
            ),
            F.lit(0.0),
            lambda a, x: a + x["t"],
        ).alias("s")
    )
    return folded.select(
        F.lit(_HILL_K).cast("long").alias("k"),
        _r6(F.col("s") / F.lit(_HILL_K)).alias("hill_gamma"),
        _r6(F.lit(_HILL_K) / F.col("s")).alias("tail_alpha"),
    )


# ---------------------------------------------------------------------------
# A/B power planning: minimum detectable effect at n-per-arm grid
# ---------------------------------------------------------------------------

# z_{alpha/2}=1.959964 (two-sided 5%), z_{beta}=0.841621 (80% power)
_POWER_ZSUM = 1.959964 + 0.841621
_POWER_ARMS = (1000, 10000, 100000, 1000000)


@_register(
    "ab_power_mde_events",
    f"""
    WITH s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS s1,
             CAST(sum(CAST(floor(value * 100) AS BIGINT)
                      * CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS s2
      FROM events WHERE value IS NOT NULL
    ),
    v AS (
      SELECT n, s1 / CAST(n AS DOUBLE) AS mu,
             (s2 - s1 * (s1 / CAST(n AS DOUBLE))) / (n - 1) AS var
      FROM s
    ),
    grid AS (SELECT unnest([{", ".join(str(a) for a in _POWER_ARMS)}])
               AS n_per_arm)
    SELECT CAST(g.n_per_arm AS BIGINT) AS n_per_arm,
           v.n AS n_observed,
           floor(v.mu * 10000 + 0.5) / 10000.0 AS mean_cents,
           floor(sqrt(v.var) * 10000 + 0.5) / 10000.0 AS sd_cents,
           floor({_POWER_ZSUM} * sqrt(2 * v.var / g.n_per_arm)
                 * 10000 + 0.5) / 10000.0 AS mde_cents,
           floor({_POWER_ZSUM} * sqrt(2 * v.var / g.n_per_arm) / v.mu
                 * 1000000 + 0.5) / 1000000.0 AS mde_rel
    FROM grid g CROSS JOIN v
    """,
    "Experiment power planning: the minimum detectable effect at 80% "
    "power / 5% two-sided alpha for a grid of per-arm sample sizes, "
    "MDE = (z_α/2+z_β)·√(2σ²/n), using the metric's observed variance "
    "from exact integer-cent moments (one map-side-combined scan). "
    "The z constants are fixed literals so both engines evaluate the "
    "same closed form; reported absolute (cents) and relative to the "
    "observed mean. This is the pre-experiment twin of the Welch/"
    "CUPED/DiD readout operators.",
    ("stats", "ab-testing", "power", "events"),
)
def ab_power_mde_events(spark, sf_dir):
    e = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    cents = F.floor(F.col("value") * 100).cast("long")
    s = e.agg(
        F.count("*").alias("n"),
        F.sum(cents).alias("s1"),
        F.sum(cents * cents).alias("s2"),
    )
    v = s.select(
        "n",
        (F.col("s1") / F.col("n").cast("double")).alias("mu"),
        (
            (F.col("s2") - F.col("s1") * (F.col("s1") / F.col("n").cast("double")))
            / (F.col("n") - 1)
        ).alias("var"),
    )
    grid = F.explode(
        F.array(*[F.lit(a) for a in _POWER_ARMS])
    ).alias("n_per_arm")
    mde = F.lit(_POWER_ZSUM) * F.sqrt(2 * F.col("var") / F.col("n_per_arm"))
    r4 = lambda c: F.floor(c * 10000 + F.lit(0.5)) / F.lit(10000.0)  # noqa: E731
    return (
        v.select(grid, "n", "mu", "var")
        .select(
            F.col("n_per_arm").cast("long").alias("n_per_arm"),
            F.col("n").cast("long").alias("n_observed"),
            r4(F.col("mu")).alias("mean_cents"),
            r4(F.sqrt(F.col("var"))).alias("sd_cents"),
            r4(mde).alias("mde_cents"),
            _r6(mde / F.col("mu")).alias("mde_rel"),
        )
    )


# ---------------------------------------------------------------------------
# Length-distribution matching: per-source decile reweighting
# ---------------------------------------------------------------------------

@_register(
    "length_match_reweight",
    """
    WITH binned AS (
      SELECT source,
             CAST(least(n_chars // 40, 9) AS INTEGER) AS len_bin
      FROM documents
    ),
    per AS (
      SELECT source, len_bin, CAST(count(*) AS BIGINT) AS n
      FROM binned GROUP BY 1, 2
    ),
    src AS (SELECT source, CAST(sum(n) AS BIGINT) AS n_src FROM per GROUP BY 1),
    tgt AS (
      SELECT len_bin, CAST(sum(n) AS BIGINT) AS n_bin FROM per GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_tot FROM per)
    SELECT p.source, p.len_bin, p.n,
           floor(p.n / CAST(s.n_src AS DOUBLE) * 1000000 + 0.5) / 1000000.0
             AS source_share,
           floor(t.n_bin / CAST(x.n_tot AS DOUBLE) * 1000000 + 0.5)
             / 1000000.0 AS target_share,
           floor((t.n_bin / CAST(x.n_tot AS DOUBLE))
                 / (p.n / CAST(s.n_src AS DOUBLE)) * 1000000 + 0.5)
             / 1000000.0 AS weight
    FROM per p
    JOIN src s USING (source)
    JOIN tgt t USING (len_bin)
    CROSS JOIN tot x
    """,
    "Length-distribution matching: importance weights that reshape "
    "each source's document-length histogram (10 fixed 40-char bins) "
    "onto the corpus-wide target distribution — w(source,bin) = "
    "target_share / source_share, the importance-resampling "
    "companion to `domain_mix_reweight` (which balances domains, not "
    "shapes). One map-side-combined (source,bin) count; shares and "
    "weights are pinned divisions of exact integers; the weight "
    "table is sources×10 rows, broadcast-sized for the downstream "
    "scan-local sampler at any corpus scale.",
    ("ml-prep", "sampling", "documents"),
)
def length_match_reweight(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    len_bin = F.least(F.floor(F.col("n_chars") / 40), F.lit(9).cast("long")).cast(
        "int"
    )
    per = d.select("source", len_bin.alias("len_bin")).groupBy(
        "source", "len_bin"
    ).agg(F.count("*").alias("n"))
    src = per.groupBy("source").agg(F.sum("n").alias("n_src"))
    tgt = per.groupBy("len_bin").agg(F.sum("n").alias("n_bin"))
    tot = per.agg(F.sum("n").alias("n_tot"))
    src_share = F.col("n") / F.col("n_src").cast("double")
    tgt_share = F.col("n_bin") / F.col("n_tot").cast("double")
    return (
        per.join(F.broadcast(src), "source")
        .join(F.broadcast(tgt), "len_bin")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            "len_bin",
            F.col("n").cast("long").alias("n"),
            _r6(src_share).alias("source_share"),
            _r6(tgt_share).alias("target_share"),
            _r6(tgt_share / src_share).alias("weight"),
        )
    )
