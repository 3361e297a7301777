"""Round-2 (cont.) registry additions — symmetric drift divergence,
leaderboard churn, rank correlation, likelihood-ratio independence,
shrinkage estimation, and trimmed means.

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
# Jensen–Shannon divergence per source (bounded symmetric drift)
# ---------------------------------------------------------------------------

@_register(
    "js_divergence_source_unigrams",
    """
    WITH tok AS (
      SELECT source,
             unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                t -> t <> '')) AS token
      FROM documents
    ),
    sc AS (
      SELECT source, token, CAST(count(*) AS BIGINT) AS c
      FROM tok GROUP BY 1, 2
    ),
    cc AS (SELECT token, CAST(sum(c) AS BIGINT) AS ct FROM sc GROUP BY 1),
    tot AS (SELECT CAST(sum(ct) AS BIGINT) AS big_n FROM cc),
    ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_src FROM sc GROUP BY 1),
    grid AS (
      SELECT n.source, c2.token, c2.ct, n.n_src, coalesce(s.c, 0) AS c
      FROM ns n CROSS JOIN cc c2
      LEFT JOIN sc s ON s.source = n.source AND s.token = c2.token
    ),
    terms AS (
      SELECT source, token, c, n_src,
             0.5 * (CASE WHEN c > 0 THEN
                      (c / CAST(n_src AS DOUBLE))
                      * log2((c / CAST(n_src AS DOUBLE))
                             / (0.5 * (c / CAST(n_src AS DOUBLE))
                                + 0.5 * (ct / CAST(t.big_n AS DOUBLE))))
                    ELSE 0.0 END)
             + 0.5 * ((ct / CAST(t.big_n AS DOUBLE))
                      * log2((ct / CAST(t.big_n AS DOUBLE))
                             / (0.5 * (c / CAST(n_src AS DOUBLE))
                                + 0.5 * (ct / CAST(t.big_n AS DOUBLE)))))
               AS term
      FROM grid CROSS JOIN tot t
    )
    SELECT source,
           CAST(max(n_src) AS BIGINT) AS n_tokens,
           CAST(count(*) AS INTEGER) AS vocab_size,
           floor(list_reduce(list_prepend(0.0, list(term ORDER BY token)),
                             (a, x) -> a + x) * 1000000 + 0.5) / 1000000.0
             AS js_bits
    FROM terms GROUP BY source
    """,
    "Jensen–Shannon divergence (bits) between each source's unigram "
    "distribution and the pooled corpus — the BOUNDED (≤1 bit) "
    "symmetric companion to `kl_divergence_source_unigrams`, defined "
    "even where a source misses corpus tokens: the grid is "
    "sources × corpus-vocabulary (both KB-sized after one token "
    "shuffle), each cell contributes ½p·log₂(p/m) + ½q·log₂(q/m) "
    "with m the even mixture, and per-source terms fold in token "
    "order so both engines sum identical doubles identically.",
    ("text-quality", "drift", "documents"),
)
def js_divergence_source_unigrams(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    tok = d.select(
        "source",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda t: t != ""
            )
        ).alias("token"),
    )
    sc = tok.groupBy("source", "token").agg(F.count("*").alias("c"))
    cc = sc.groupBy("token").agg(F.sum("c").alias("ct"))
    tot = cc.agg(F.sum("ct").alias("big_n"))
    ns = sc.groupBy("source").agg(F.sum("c").alias("n_src"))
    grid = (
        ns.crossJoin(F.broadcast(cc))
        .join(sc, ["source", "token"], "left")
        .select(
            "source",
            "token",
            "ct",
            "n_src",
            F.coalesce(F.col("c"), F.lit(0)).alias("c"),
        )
    )
    p = F.col("c") / F.col("n_src").cast("double")
    q = F.col("ct") / F.col("big_n").cast("double")
    m = F.lit(0.5) * p + F.lit(0.5) * q
    term = F.lit(0.5) * (
        F.when(F.col("c") > 0, p * F.log2(p / m)).otherwise(F.lit(0.0))
    ) + F.lit(0.5) * (q * F.log2(q / m))
    terms = grid.crossJoin(F.broadcast(tot)).withColumn("term", term)
    return (
        terms.groupBy("source")
        .agg(
            F.max("n_src").alias("n_tokens"),
            F.count("*").cast("int").alias("vocab_size"),
            F.aggregate(
                F.array_sort(
                    F.collect_list(
                        F.struct(F.col("token"), F.col("term").alias("v"))
                    )
                ),
                F.lit(0.0),
                lambda a, x: a + x["v"],
            ).alias("js"),
        )
        .select(
            "source",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            "vocab_size",
            _r6(F.col("js")).alias("js_bits"),
        )
    )


# ---------------------------------------------------------------------------
# Monthly top-20 revenue leaderboard churn
# ---------------------------------------------------------------------------

_LB_K = 20


@_register(
    "leaderboard_churn_monthly_parts",
    f"""
    WITH rev AS (
      SELECT CAST(date_trunc('month', o.o_orderdate) AS DATE) AS month,
             l.l_partkey AS part,
             CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS rev_cents
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT month, part, rev_cents,
             CAST(row_number() OVER (PARTITION BY month
                                     ORDER BY rev_cents DESC, part ASC)
                  AS INTEGER) AS rk
      FROM rev
    ),
    top AS (SELECT * FROM ranked WHERE rk <= {_LB_K}),
    months AS (
      SELECT month,
             row_number() OVER (ORDER BY month) AS midx
      FROM (SELECT DISTINCT month FROM rev)
    )
    SELECT t.month, t.part, t.rk,
           CAST(p.rk AS INTEGER) AS prev_rk,
           CASE WHEN p.rk IS NULL THEN 'entered'
                WHEN p.rk > t.rk THEN 'up'
                WHEN p.rk < t.rk THEN 'down'
                ELSE 'held' END AS movement
    FROM top t
    JOIN months m ON m.month = t.month
    LEFT JOIN months pm ON pm.midx = m.midx - 1
    LEFT JOIN top p ON p.month = pm.month AND p.part = t.part
    """,
    "Leaderboard churn: each month's top-20 parts by revenue with "
    "their previous-month rank and movement (entered / up / down / "
    "held) — the rank-migration report behind merchandising and "
    "anomaly review. Revenue ranks are deterministic (cents desc, "
    "part asc); the month sequence index makes 'previous month' "
    "gap-proof. Facts collapse to a (month,part) rollup in one "
    "shuffle; the top-20 window and the three months-sized joins run "
    "on the rollup. At 100 TB a rank(≤K) window pushes top-K "
    "per-partition pruning instead of a full sort.",
    ("window", "topk", "analytics", "lineitem"),
)
def leaderboard_churn_monthly_parts(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_extendedprice"
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    rev = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.trunc(F.col("o_orderdate"), "month").alias("month"),
            F.col("l_partkey").alias("part"),
        )
        .agg(
            F.sum(F.floor(F.col("l_extendedprice") * 100).cast("long")).alias(
                "rev_cents"
            )
        )
    )
    wrk = Window.partitionBy("month").orderBy(F.desc("rev_cents"), F.asc("part"))
    top = (
        rev.withColumn("rk", F.row_number().over(wrk).cast("int"))
        .filter(F.col("rk") <= _LB_K)
        .select("month", "part", "rk")
    )
    months = (
        rev.select("month")
        .distinct()
        .withColumn("midx", F.row_number().over(Window.orderBy("month")))
    )
    prev_m = months.select(
        F.col("midx").alias("pmidx"), F.col("month").alias("pmonth")
    )
    prev_top = top.select(
        F.col("month").alias("pmonth"),
        F.col("part").alias("part"),
        F.col("rk").alias("prev_rk"),
    )
    movement = (
        F.when(F.col("prev_rk").isNull(), "entered")
        .when(F.col("prev_rk") > F.col("rk"), "up")
        .when(F.col("prev_rk") < F.col("rk"), "down")
        .otherwise("held")
    )
    return (
        top.join(F.broadcast(months), "month")
        .join(
            F.broadcast(prev_m), F.col("pmidx") == F.col("midx") - 1, "left"
        )
        .join(prev_top, ["pmonth", "part"], "left")
        .select("month", "part", "rk", F.col("prev_rk").cast("int").alias("prev_rk"),
                movement.alias("movement"))
    )


# ---------------------------------------------------------------------------
# Kendall tau-b between the daily revenue and daily order-count series
# ---------------------------------------------------------------------------

@_register(
    "kendall_tau_daily_metrics",
    """
    WITH daily AS (
      SELECT o_orderdate AS day,
             CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev,
             CAST(count(*) AS BIGINT) AS cnt
      FROM orders GROUP BY 1
    ),
    pairs AS (
      SELECT CAST(count(*) AS BIGINT) AS n0,
             CAST(sum(CASE WHEN (b.rev - a.rev) * (b.cnt - a.cnt) > 0
                           THEN 1 ELSE 0 END) AS BIGINT) AS c,
             CAST(sum(CASE WHEN (b.rev - a.rev) * (b.cnt - a.cnt) < 0
                           THEN 1 ELSE 0 END) AS BIGINT) AS d,
             CAST(sum(CASE WHEN b.rev = a.rev AND b.cnt <> a.cnt
                           THEN 1 ELSE 0 END) AS BIGINT) AS tx,
             CAST(sum(CASE WHEN b.cnt = a.cnt AND b.rev <> a.rev
                           THEN 1 ELSE 0 END) AS BIGINT) AS ty
      FROM daily a JOIN daily b ON a.day < b.day
    )
    SELECT n0 AS n_pairs, c AS concordant, d AS discordant,
           floor((c - d) / sqrt(CAST((c + d + tx) AS DOUBLE)
                                * CAST((c + d + ty) AS DOUBLE))
                 * 1000000 + 0.5) / 1000000.0 AS tau_b
    FROM pairs
    """,
    "Kendall τ-b rank correlation between the daily revenue and "
    "daily order-count series: concordant/discordant/tied pair "
    "counts over all day pairs (exact integers from one O(days²) "
    "join AFTER the fact rollup — ~2,400 days at any fact scale), "
    "tie-adjusted denominator per the τ-b definition. The "
    "non-parametric cousin of `correlation_matrix_lineitem`'s "
    "Pearson r and the two-series companion of "
    "`mann_kendall_trend_daily` (which is τ against time itself).",
    ("stats", "correlation", "orders"),
)
def kendall_tau_daily_metrics(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias("rev"),
        F.count("*").alias("cnt"),
    )
    a = daily.select(
        F.col("day").alias("da"), F.col("rev").alias("ra"), F.col("cnt").alias("ca")
    )
    b = daily.select(
        F.col("day").alias("db"), F.col("rev").alias("rb"), F.col("cnt").alias("cb")
    )
    prod = (F.col("rb") - F.col("ra")) * (F.col("cb") - F.col("ca"))
    pairs = a.join(b, F.col("da") < F.col("db")).agg(
        F.count("*").alias("n0"),
        F.sum(F.when(prod > 0, 1).otherwise(0)).alias("c"),
        F.sum(F.when(prod < 0, 1).otherwise(0)).alias("d"),
        F.sum(
            F.when(
                (F.col("rb") == F.col("ra")) & (F.col("cb") != F.col("ca")), 1
            ).otherwise(0)
        ).alias("tx"),
        F.sum(
            F.when(
                (F.col("cb") == F.col("ca")) & (F.col("rb") != F.col("ra")), 1
            ).otherwise(0)
        ).alias("ty"),
    )
    tau = (F.col("c") - F.col("d")) / F.sqrt(
        (F.col("c") + F.col("d") + F.col("tx")).cast("double")
        * (F.col("c") + F.col("d") + F.col("ty")).cast("double")
    )
    return pairs.select(
        F.col("n0").cast("long").alias("n_pairs"),
        F.col("c").cast("long").alias("concordant"),
        F.col("d").cast("long").alias("discordant"),
        _r6(tau).alias("tau_b"),
    )


# ---------------------------------------------------------------------------
# G-test (log-likelihood ratio) of event_type × daypart independence
# ---------------------------------------------------------------------------

@_register(
    "g_test_type_daypart",
    """
    WITH cells AS (
      SELECT event_type,
             CASE WHEN hour(ts) BETWEEN 6 AND 11 THEN 'morning'
                  WHEN hour(ts) BETWEEN 12 AND 17 THEN 'afternoon'
                  WHEN hour(ts) BETWEEN 18 AND 23 THEN 'evening'
                  ELSE 'night' END AS daypart,
             CAST(count(*) AS BIGINT) AS o
      FROM events GROUP BY 1, 2
    ),
    rows_ AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS rt
              FROM cells GROUP BY 1),
    cols_ AS (SELECT daypart, CAST(sum(o) AS BIGINT) AS ct
              FROM cells GROUP BY 1),
    n_ AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
    terms AS (
      SELECT c.event_type, c.daypart, c.o,
             c.o * ln(c.o / (r.rt * (col.ct / CAST(x.n AS DOUBLE)))) AS term
      FROM cells c
      JOIN rows_ r USING (event_type)
      JOIN cols_ col USING (daypart)
      CROSS JOIN n_ x
    )
    SELECT CAST(count(*) AS INTEGER) AS n_cells,
           floor(2 * list_reduce(
                   list_prepend(0.0,
                     list(term ORDER BY event_type, daypart)),
                   (a, x) -> a + x) * 1000000 + 0.5) / 1000000.0 AS g_stat
    FROM terms
    """,
    "G-test (likelihood-ratio) of independence for the event_type × "
    "daypart contingency table: G = 2·Σ O·ln(O/E) with E from exact "
    "integer row/column/grand totals — the additive-decomposable "
    "companion to `chi_square_type_daypart` (G-values of subtables "
    "sum; χ² does not). The ≤20 cell terms fold in (type, daypart) "
    "order so both engines add identical doubles identically. One "
    "map-side-combined scan; everything after is cells-sized.",
    ("stats", "independence", "events"),
)
def g_test_type_daypart(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    h = F.hour(F.col("ts"))
    daypart = (
        F.when(h.between(6, 11), "morning")
        .when(h.between(12, 17), "afternoon")
        .when(h.between(18, 23), "evening")
        .otherwise("night")
    )
    cells = e.groupBy("event_type", daypart.alias("daypart")).agg(
        F.count("*").alias("o")
    )
    rows_ = cells.groupBy("event_type").agg(F.sum("o").alias("rt"))
    cols_ = cells.groupBy("daypart").agg(F.sum("o").alias("ct"))
    n_ = cells.agg(F.sum("o").alias("n"))
    term = F.col("o") * F.log(
        F.col("o")
        / (F.col("rt") * (F.col("ct") / F.col("n").cast("double")))
    )
    terms = (
        cells.join(F.broadcast(rows_), "event_type")
        .join(F.broadcast(cols_), "daypart")
        .crossJoin(F.broadcast(n_))
        .withColumn("term", term)
    )
    folded = terms.agg(
        F.count("*").cast("int").alias("n_cells"),
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("event_type"),
                        F.col("daypart"),
                        F.col("term").alias("v"),
                    )
                )
            ),
            F.lit(0.0),
            lambda a, x: a + x["v"],
        ).alias("s"),
    )
    return folded.select(
        "n_cells", _r6(F.lit(2) * F.col("s")).alias("g_stat")
    )


# ---------------------------------------------------------------------------
# Empirical-Bayes-style shrunken return rates per part
# ---------------------------------------------------------------------------

_SHRINK_PRIOR = 20


@_register(
    "shrunken_return_rates_parts",
    f"""
    WITH per_part AS (
      SELECT l_partkey AS part,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                  AS BIGINT) AS x
      FROM lineitem GROUP BY 1
    ),
    pooled AS (
      SELECT CAST(sum(x) AS BIGINT) AS sx, CAST(sum(n) AS BIGINT) AS sn
      FROM per_part
    )
    SELECT part, n, x,
           floor(x / CAST(n AS DOUBLE) * 1000000 + 0.5) / 1000000.0
             AS raw_rate,
           floor((x + {_SHRINK_PRIOR} * (sx / CAST(sn AS DOUBLE)))
                 / (n + {_SHRINK_PRIOR}) * 1000000 + 0.5) / 1000000.0
             AS shrunk_rate
    FROM per_part CROSS JOIN pooled
    WHERE n >= 3
    """,
    "Shrinkage estimation of per-part return rates: raw x/n is noisy "
    "for thin parts, so each rate shrinks toward the pooled corpus "
    "rate with prior strength 20 pseudo-observations — "
    "(x + k·p̂)/(n + k), the beta-binomial posterior-mean form that "
    "stops low-n parts from topping 'worst return rate' reports. One "
    "map-side-combined rollup; the pooled scalar broadcasts back; "
    "both rates are pinned IEEE expressions over exact integers.",
    ("stats", "shrinkage", "lineitem"),
)
def shrunken_return_rates_parts(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    per_part = (
        li.groupBy(F.col("l_partkey").alias("part"))
        .agg(
            F.count("*").alias("n"),
            F.sum(
                F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
            ).alias("x"),
        )
        .filter(F.col("n") >= 3)
    )
    pooled = per_part.agg(F.sum("x").alias("sx"), F.sum("n").alias("sn"))
    p0 = F.col("sx") / F.col("sn").cast("double")
    return per_part.crossJoin(F.broadcast(pooled)).select(
        "part",
        F.col("n").cast("long").alias("n"),
        F.col("x").cast("long").alias("x"),
        _r6(F.col("x") / F.col("n").cast("double")).alias("raw_rate"),
        _r6(
            (F.col("x") + F.lit(_SHRINK_PRIOR) * p0)
            / (F.col("n") + F.lit(_SHRINK_PRIOR))
        ).alias("shrunk_rate"),
    )


# ---------------------------------------------------------------------------
# 5% trimmed mean of order value per priority
# ---------------------------------------------------------------------------

@_register(
    "trimmed_mean_price_by_priority",
    """
    WITH ranked AS (
      SELECT o_orderpriority AS priority,
             CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY floor(o_totalprice * 100),
                                         o_orderkey) AS rk,
             count(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM orders
    ),
    kept AS (
      SELECT priority, cents, n
      FROM ranked
      WHERE rk > n * 5 // 100 AND rk <= n - n * 5 // 100
    )
    SELECT priority,
           CAST(max(n) AS BIGINT) AS n_total,
           CAST(count(*) AS BIGINT) AS n_kept,
           floor(sum(cents) / CAST(count(*) AS DOUBLE) * 10000 + 0.5)
             / 10000.0 AS trimmed_mean_cents
    FROM kept GROUP BY priority
    """,
    "5% two-sided trimmed mean of order value per priority: rows "
    "rank deterministically within each group (cents, orderkey), the "
    "bottom and top ⌊0.05n⌋ rows drop by integer rank bounds, and "
    "the mean of the kept EXACT integer cents is one pinned "
    "division — the outlier-robust mean that pairs with the "
    "median/MAD and winsorization operators (trim REMOVES tails "
    "rather than clamping them). One rank window per group + one "
    "aggregate; no collects, no arrays.",
    ("stats", "robust", "orders"),
)
def trimmed_mean_price_by_priority(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100).cast("long")
    w = Window.partitionBy("priority").orderBy("cents", "o_orderkey")
    wn = Window.partitionBy("priority")
    ranked = o.select(
        F.col("o_orderpriority").alias("priority"),
        cents.alias("cents"),
        "o_orderkey",
    ).select(
        "priority",
        "cents",
        F.row_number().over(w).alias("rk"),
        F.count("*").over(wn).alias("n"),
    )
    trim = F.floor(F.col("n") * 5 / 100)
    kept = ranked.filter(
        (F.col("rk") > trim) & (F.col("rk") <= F.col("n") - trim)
    )
    r4 = lambda c: F.floor(c * 10000 + F.lit(0.5)) / F.lit(10000.0)  # noqa: E731
    return kept.groupBy("priority").agg(
        F.max("n").cast("long").alias("n_total"),
        F.count("*").cast("long").alias("n_kept"),
        r4(F.sum("cents") / F.count("*").cast("double")).alias(
            "trimmed_mean_cents"
        ),
    )
