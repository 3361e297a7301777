"""Round-3 registry additions, batch 6 — Croston intermittent-demand
forecasting, Adamic–Adar link prediction on the co-purchase graph,
NDCG@k recommender evaluation, and a daily OHLC (candlestick) rollup.

Same contract as ``registry.py``. Imported at the bottom of
``registry.py``.
"""

from __future__ import annotations

import math

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import _register, _t


def _r6(col):
    return F.floor(col * 1000000 + F.lit(0.5)) / F.lit(1000000.0)


# ---------------------------------------------------------------------------
# Croston's method for intermittent demand (per slow-moving part)
# ---------------------------------------------------------------------------

_CROSTON_ALPHA = 0.2


@_register(
    "croston_intermittent_demand",
    f"""
    WITH demand AS (
      SELECT l_partkey,
             CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS DOUBLE)
               AS day,
             CAST(sum(l_quantity) AS DOUBLE) AS qty
      FROM lineitem GROUP BY 1, 2
    ),
    seq AS (
      SELECT l_partkey,
             list([day, qty] ORDER BY day) AS vals
      FROM demand GROUP BY 1
      HAVING count(*) >= 3
    ),
    folded AS (
      -- acc is [z, p, prev_day, n_intervals]; items padded to the
      -- same arity so list_reduce's single element type holds both
      SELECT l_partkey, len(vals) AS n,
             list_reduce(
               list_prepend(
                 [vals[1][2], 0.0::DOUBLE, vals[1][1], 0.0::DOUBLE],
                 list_transform(vals[2:],
                                x -> [x[1], x[2], 0.0::DOUBLE,
                                      0.0::DOUBLE])),
               (acc, x) -> [
                 {_CROSTON_ALPHA}::DOUBLE * x[2]
                   + {1.0 - _CROSTON_ALPHA}::DOUBLE * acc[1],
                 CASE WHEN acc[4] = 0.0
                      THEN x[1] - acc[3]
                      ELSE {_CROSTON_ALPHA}::DOUBLE * (x[1] - acc[3])
                           + {1.0 - _CROSTON_ALPHA}::DOUBLE * acc[2]
                 END,
                 x[1],
                 acc[4] + 1.0::DOUBLE
               ]) AS st
      FROM seq
    )
    SELECT l_partkey, CAST(n AS BIGINT) AS n_demand_days,
           round(st[1], 6) AS croston_size,
           round(st[2], 6) AS croston_interval_days,
           round(st[1] / st[2], 6) AS forecast_per_day
    FROM folded
    """,
    "Croston's method for intermittent demand, the standard "
    "forecaster for slow-moving SKUs where plain EWMA under-"
    "forecasts between demand spikes: per part (>=3 demand days), "
    "separate exponential smoothing of demand SIZES and of inter-"
    "demand INTERVALS (alpha=0.2, first interval seeds the interval "
    "state), forecast = size/interval per day. A coupled 4-variable "
    "sequential recurrence as an in-row fold — array_sort + "
    "F.aggregate with a (z, p, prev_day, n) struct accumulator, "
    "DuckDB twin as a list-typed list_reduce in the identical "
    "arithmetic order, so all three outputs hash-match bit-for-bit. "
    "One shuffle on partkey; per-part arrays are bounded by the "
    "date range (~2,400), never by fact count. Extends the "
    "recurrence family of `holt_forecast_users` / `ewma_user_value` "
    "to the demand-planning shape.",
    ("timeseries", "recurrence", "forecast", "lineitem"),
)
def croston_intermittent_demand(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    demand = li.groupBy(
        "l_partkey",
        F.datediff(F.col("l_shipdate").cast("date"), F.lit("1970-01-01"))
        .cast("double")
        .alias("day"),
    ).agg(F.sum("l_quantity").cast("double").alias("qty"))
    seq = (
        demand.groupBy("l_partkey")
        .agg(F.array_sort(F.collect_list(F.struct("day", "qty"))).alias("vals"))
        .filter(F.size("vals") >= 3)
    )
    first = F.element_at(F.col("vals"), 1)
    rest = F.slice(F.col("vals"), 2, F.greatest(F.size("vals") - 1, F.lit(0)))
    init = F.struct(
        first["qty"].alias("z"),
        F.lit(0.0).alias("p"),
        first["day"].alias("prev"),
        F.lit(0.0).alias("n"),
    )
    a = F.lit(_CROSTON_ALPHA)
    b = F.lit(1.0 - _CROSTON_ALPHA)

    def step(acc, x):
        interval = x["day"] - acc["prev"]
        zp = a * x["qty"] + b * acc["z"]
        pp = F.when(acc["n"] == 0.0, interval).otherwise(
            a * interval + b * acc["p"]
        )
        return F.struct(
            zp.alias("z"),
            pp.alias("p"),
            x["day"].alias("prev"),
            (acc["n"] + F.lit(1.0)).alias("n"),
        )

    st = F.aggregate(rest, init, step)
    return seq.select(
        "l_partkey",
        F.size("vals").cast("long").alias("n_demand_days"),
        F.round(st["z"], 6).alias("croston_size"),
        F.round(st["p"], 6).alias("croston_interval_days"),
        F.round(st["z"] / st["p"], 6).alias("forecast_per_day"),
    )


# ---------------------------------------------------------------------------
# Adamic–Adar link prediction on the co-purchase graph
# ---------------------------------------------------------------------------

@_register(
    "adamic_adar_link_prediction",
    """
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    edges_all AS (
      SELECT a.l_partkey AS src, b.l_partkey AS dst,
             CAST(count(*) AS BIGINT) AS w
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING count(*) >= 2
    ),
    edges AS (
      -- 20k-edge cap (weight desc, keys asc): a 10x-denser corpus
      -- multiplies qualifying edges and the common-neighbor join is
      -- quadratic in hub degree — the cap bounds the graph at any
      -- scale (a no-op at current SFs, ~3.5k edges qualify)
      SELECT src, dst FROM (
        SELECT src, dst,
               row_number() OVER (ORDER BY w DESC, src, dst) AS rk
        FROM edges_all
      ) WHERE rk <= 20000
    ),
    adj AS (
      SELECT src AS u, dst AS w FROM edges
      UNION ALL
      SELECT dst AS u, src AS w FROM edges
    ),
    deg AS (
      -- degree-1 nodes can never be a SHARED neighbor; dropping them
      -- here also keeps 1/ln(d) away from ln(1)=0
      SELECT u AS w, CAST(count(*) AS BIGINT) AS d,
             1.0 / ln(CAST(count(*) AS DOUBLE)) AS invln
      FROM adj GROUP BY 1
      HAVING count(*) >= 2
    ),
    cand AS (
      SELECT t1.u AS part_a, t2.u AS part_b, t1.w AS w, dg.invln
      FROM adj t1
      JOIN adj t2 ON t1.w = t2.w AND t1.u < t2.u
      JOIN deg dg ON dg.w = t1.w
      LEFT JOIN edges e ON e.src = t1.u AND e.dst = t2.u
      WHERE e.src IS NULL
    ),
    scored AS (
      SELECT part_a, part_b,
             CAST(count(*) AS BIGINT) AS common_neighbors,
             list_reduce(list_prepend(0.0::DOUBLE,
                                      list(invln ORDER BY w)),
                         (acc, x) -> acc + x) AS aa
      FROM cand GROUP BY 1, 2
      HAVING count(*) >= 2
    )
    SELECT part_a, part_b, common_neighbors,
           floor(aa * 1000000 + 0.5) / 1000000.0 AS aa_score
    FROM scored
    """,
    "Adamic–Adar link prediction over the pruned co-purchase graph "
    "(pair-count >= 2, the `part_copurchase_kcore` edge set): for "
    "every non-adjacent part pair sharing >= 2 neighbors, score "
    "sum(1/ln(deg(w))) over the common neighbors w — the classic "
    "hub-discounted 'friends you should know' ranker. The common-"
    "neighbor join fans out per shared neighbor (bounded by the "
    "pruned degree, never order size); existing edges drop out via "
    "a null-extending join used as an anti-join so both engines "
    "state it identically. The float sum is an in-row fold over "
    "neighbors ordered by id (common neighbors of any pair are "
    "bounded by min-degree), so scores hash-match bit-for-bit. "
    "deg >= 2 for any shared neighbor, so ln never hits zero.",
    ("graph", "link-prediction", "lineitem"),
)
def adamic_adar_link_prediction(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").dropDuplicates()
    a = items.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pa"))
    b = items.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pb"))
    edges = (
        a.join(b, "ok")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= 2)
        # TakeOrdered 20k-edge cap: bounds the quadratic-in-degree
        # common-neighbor join on 10x-denser corpora (no-op today)
        .orderBy(F.col("cnt").desc(), F.col("pa").asc(), F.col("pb").asc())
        .limit(20000)
        .select(F.col("pa").alias("src"), F.col("pb").alias("dst"))
        .localCheckpoint(eager=False)
    )
    adj = edges.select(F.col("src").alias("u"), F.col("dst").alias("w")).unionAll(
        edges.select(F.col("dst").alias("u"), F.col("src").alias("w"))
    )
    deg = (
        adj.groupBy(F.col("u").alias("dw"))
        .agg(F.count("*").alias("d"))
        .filter(F.col("d") >= 2)
    )
    deg = deg.select(
        "dw", (F.lit(1.0) / F.log(F.col("d").cast("double"))).alias("invln")
    )
    t1 = adj.select(F.col("u").alias("part_a"), F.col("w").alias("w"))
    t2 = adj.select(F.col("u").alias("part_b"), F.col("w").alias("w2"))
    cand = (
        t1.join(t2, (F.col("w") == F.col("w2")) & (F.col("part_a") < F.col("part_b")))
        .join(deg, F.col("dw") == F.col("w"))
        .join(
            edges,
            (F.col("src") == F.col("part_a")) & (F.col("dst") == F.col("part_b")),
            "left_anti",
        )
    )
    scored = cand.groupBy("part_a", "part_b").agg(
        F.count("*").alias("common_neighbors"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("w", "invln"))),
            F.lit(0.0),
            lambda acc, x: acc + x["invln"],
        ).alias("aa"),
    ).filter(F.col("common_neighbors") >= 2)
    return scored.select(
        "part_a",
        "part_b",
        F.col("common_neighbors").cast("long").alias("common_neighbors"),
        _r6(F.col("aa")).alias("aa_score"),
    )


# ---------------------------------------------------------------------------
# Recommender evaluation: NDCG@k on the same hash holdout as precision@k
# ---------------------------------------------------------------------------

_NDCG_K = 5
_NDCG_SALT = "reco-v1"
_DCG_C = [1.0 / math.log2(i + 1) for i in range(1, _NDCG_K + 1)]
_IDCG = [sum(_DCG_C[:n]) for n in range(1, _NDCG_K + 1)]

_DCG_SQL = " + ".join(f"h{i + 1} * {_DCG_C[i]!r}" for i in range(_NDCG_K))
_IDCG_SQL = "CASE least(n_actual, 5) " + " ".join(
    f"WHEN {n + 1} THEN {_IDCG[n]!r}" for n in range(_NDCG_K)
) + " END"


@_register(
    "reco_ndcg_at_k",
    f"""
    WITH split AS (
      SELECT l_orderkey, l_partkey,
             substr(md5('{_NDCG_SALT}' || CAST(l_orderkey AS VARCHAR)), 1, 1)
               IN ('0','1','2','3','4','5','6','7','8','9','a','b') AS is_train
      FROM lineitem
    ),
    train AS (SELECT DISTINCT l_orderkey, l_partkey FROM split WHERE is_train),
    test  AS (SELECT DISTINCT l_orderkey, l_partkey FROM split
              WHERE NOT is_train),
    co AS (
      SELECT a.l_partkey AS p, b.l_partkey AS q,
             CAST(count(*) AS BIGINT) AS w
      FROM train a JOIN train b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
      GROUP BY 1, 2
    ),
    recs AS (
      SELECT p, q, rk FROM (
        SELECT p, q,
               row_number() OVER (PARTITION BY p ORDER BY w DESC, q ASC) AS rk
        FROM co
      ) WHERE rk <= {_NDCG_K}
    ),
    actual AS (
      SELECT DISTINCT a.l_partkey AS p, b.l_partkey AS q
      FROM test a JOIN test b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
    ),
    eval_items AS (
      SELECT p, CAST(count(*) AS BIGINT) AS n_actual FROM actual GROUP BY 1
    ),
    flags AS (
      SELECT r.p,
             {", ".join(
                 f"max(CASE WHEN r.rk = {i + 1} AND a.q IS NOT NULL "
                 f"THEN 1 ELSE 0 END) AS h{i + 1}"
                 for i in range(_NDCG_K))}
      FROM recs r LEFT JOIN actual a ON a.p = r.p AND a.q = r.q
      GROUP BY 1
    ),
    per_p AS (
      SELECT e.p,
             CAST(floor(({_DCG_SQL}) / ({_IDCG_SQL}) * 1000000 + 0.5)
                  AS BIGINT) AS ndcg_micro
      FROM eval_items e JOIN flags f ON f.p = e.p
    )
    SELECT CAST(count(*) AS BIGINT) AS n_eval_parts,
           CAST(sum(ndcg_micro) AS BIGINT) AS sum_ndcg_micro,
           floor(CAST(sum(ndcg_micro) AS DOUBLE) / count(*) + 0.5)
             / 1000000.0 AS mean_ndcg
    FROM per_p
    """,
    "Recommender NDCG@5 on the identical 75/25 md5 holdout as "
    "`reco_precision_at_k`: each part's top-5 co-purchase "
    "recommendations (weight desc, part asc) are scored with "
    "position-discounted gain against the test-side actual "
    "co-baskets, normalized by the ideal DCG at min(|actual|, 5). "
    "The 1/log2(rank+1) discount and IDCG prefix sums are compile-"
    "time Python literals embedded full-precision into BOTH "
    "engines, and per-part DCG is a fixed 5-term linear form over "
    "0/1 hit flags — no float accumulation order anywhere; per-part "
    "NDCG is quantized to integer millionths BEFORE the corpus mean "
    "so the final aggregate is an order-free integer sum (unlike a "
    "naive AVG of doubles, which would not be distributable). "
    "Rank-aware companion to precision@5 / `reco_mrr_at_k`; "
    "recs/actual come from the materialized shared legs "
    "(_reco_eval_legs) — score once, evaluate many.",
    ("ml-eval", "recommendation", "lineitem"),
)
def reco_ndcg_at_k(spark, sf_dir):
    from .registry6 import _reco_eval_legs

    recs, actual = _reco_eval_legs(spark, sf_dir)
    eval_items = actual.groupBy("p").agg(F.count("*").alias("n_actual"))
    hit = recs.join(
        actual.select(F.col("p").alias("ap"), F.col("q").alias("aq")),
        (F.col("ap") == F.col("p")) & (F.col("aq") == F.col("q")),
        "left",
    )
    flags = hit.groupBy("p").agg(
        *[
            F.max(
                F.when(
                    (F.col("rk") == i + 1) & F.col("aq").isNotNull(), 1
                ).otherwise(0)
            ).alias(f"h{i + 1}")
            for i in range(_NDCG_K)
        ]
    )
    dcg = sum(
        (F.col(f"h{i + 1}") * F.lit(_DCG_C[i]) for i in range(1, _NDCG_K)),
        F.col("h1") * F.lit(_DCG_C[0]),
    )
    idcg = F.when(F.least(F.col("n_actual"), F.lit(5)) == 1, F.lit(_IDCG[0]))
    for n in range(1, _NDCG_K):
        idcg = idcg.when(
            F.least(F.col("n_actual"), F.lit(5)) == n + 1, F.lit(_IDCG[n])
        )
    per_p = eval_items.join(flags, "p").select(
        F.floor(dcg / idcg * 1000000 + F.lit(0.5)).cast("long").alias(
            "ndcg_micro"
        )
    )
    return per_p.agg(
        F.count("*").alias("n_eval_parts"),
        F.sum("ndcg_micro").cast("long").alias("sum_ndcg_micro"),
        (
            F.floor(
                F.sum("ndcg_micro").cast("double") / F.count("*") + F.lit(0.5)
            )
            / 1000000.0
        ).alias("mean_ndcg"),
    )


# ---------------------------------------------------------------------------
# Daily OHLC (candlestick) rollup of order prices
# ---------------------------------------------------------------------------

@_register(
    "ohlc_daily_orders",
    """
    SELECT CAST(o_orderdate AS DATE) AS day,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(arg_min(CAST(floor(o_totalprice * 100) AS BIGINT),
                        o_orderkey) AS BIGINT) AS open_cents,
           CAST(max(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS high_cents,
           CAST(min(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS low_cents,
           CAST(arg_max(CAST(floor(o_totalprice * 100) AS BIGINT),
                        o_orderkey) AS BIGINT) AS close_cents,
           CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS volume_cents
    FROM orders GROUP BY 1
    """,
    "Daily OHLC candlestick rollup of order prices: open/close via "
    "argmin/argmax on the unique order key (min_by/max_by — "
    "deterministic, no window, no sort), high/low/volume as plain "
    "min/max/sum, all in exact integer cents. One map-side-"
    "combinable aggregate keyed on day — min_by/max_by carry a "
    "(value, key) partial through the combiner, so the candlestick "
    "is a single shuffle at any scale where a first/last-by-window "
    "formulation would have sorted every partition. The price-"
    "series view that `bollinger_daily_revenue` / "
    "`max_drawdown_daily_revenue` band and locate.",
    ("agg", "timeseries", "orders"),
)
def ohlc_daily_orders(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100).cast("long")
    return o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.count("*").alias("n_orders"),
        F.min_by(cents, F.col("o_orderkey")).cast("long").alias("open_cents"),
        F.max(cents).cast("long").alias("high_cents"),
        F.min(cents).cast("long").alias("low_cents"),
        F.max_by(cents, F.col("o_orderkey")).cast("long").alias("close_cents"),
        F.sum(cents).cast("long").alias("volume_cents"),
    )
