"""Round-3 registry additions, batch 38 — active-order concurrency
sweep and backlog aging buckets.

Same contract as ``registry.py``. Imported at the bottom of
``registry.py``.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import _register, _t

# ---------------------------------------------------------------------------
# Active-order concurrency: the +1/-1 boundary sweep
# ---------------------------------------------------------------------------


@_register(
    "active_orders_peak",
    """
    WITH spans AS (
      SELECT o.o_orderkey,
             CAST(o.o_orderdate AS DATE) AS start_day,
             CAST(max(l.l_shipdate) AS DATE) AS end_day
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2
    ),
    deltas AS (
      SELECT start_day AS day, CAST(count(*) AS BIGINT) AS d FROM spans
      GROUP BY 1
      UNION ALL
      SELECT CAST(end_day + INTERVAL 1 DAY AS DATE),
             CAST(-count(*) AS BIGINT) FROM spans
      GROUP BY 1
    ),
    merged AS (
      SELECT day, CAST(sum(d) AS BIGINT) AS d FROM deltas GROUP BY 1
    ),
    swept AS (
      SELECT day,
             CAST(sum(d) OVER (ORDER BY day
                               ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS active
      FROM merged
    ),
    mx AS (SELECT CAST(max(active) AS BIGINT) AS peak FROM swept)
    SELECT s.day, s.active, s.active = m.peak AS is_peak
    FROM swept s CROSS JOIN mx m
    """,
    "Active-order concurrency sweep — the work-in-progress curve "
    "operations actually staffs against: each order is open from "
    "placement until its last lineitem ships, and the classic "
    "+1/-1 boundary sweep (deltas at the endpoints, one running "
    "sum) produces the daily count of simultaneously-open orders "
    "with the peak flagged — O(boundaries), never O(days x "
    "orders). At 100 TB the sweep runs on the date-grained delta "
    "table (~2,400 rows at ANY fact scale); the generic pattern "
    "behind peak-concurrency, room-occupancy and connection-pool "
    "sizing questions, complementing `interval_overlap_user_"
    "incidents` (pairwise) and `interval_union_by_user` "
    "(coverage).",
    ("interval", "sweep", "ops", "orders"),
)
def active_orders_peak(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    spans = (
        o.join(li, li.l_orderkey == o.o_orderkey)
        .groupBy(
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("start_day"),
        )
        .agg(F.max(F.col("l_shipdate").cast("date")).alias("end_day"))
        .localCheckpoint(eager=False)
    )
    starts = spans.groupBy(F.col("start_day").alias("day")).agg(
        F.count("*").alias("d")
    )
    ends = spans.groupBy(
        F.date_add(F.col("end_day"), 1).alias("day")
    ).agg((-F.count("*")).alias("d"))
    merged = starts.unionAll(ends).groupBy("day").agg(
        F.sum("d").alias("d")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    swept = merged.select(
        "day", F.sum("d").over(w).alias("active")
    ).localCheckpoint(eager=False)
    mx = swept.agg(F.max("active").alias("peak"))
    return swept.crossJoin(F.broadcast(mx)).select(
        "day",
        F.col("active").cast("long").alias("active"),
        (F.col("active") == F.col("peak")).alias("is_peak"),
    )


# ---------------------------------------------------------------------------
# Order backlog aging buckets at the corpus watermark
# ---------------------------------------------------------------------------

_AGE_BUCKETS = ((0, 30), (31, 90), (91, 180), (181, 100000))


@_register(
    "order_backlog_aging",
    f"""
    WITH wm AS (
      SELECT max(CAST(l_shipdate AS DATE)) - INTERVAL 90 DAY AS t
      FROM lineitem
    ),
    order_ship AS (
      SELECT o.o_orderkey, CAST(o.o_orderdate AS DATE) AS placed,
             CAST(max(floor(o.o_totalprice * 100)) AS BIGINT) AS cents,
             max(CAST(l.l_shipdate AS DATE)) AS last_ship
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2
    ),
    aged AS (
      -- open at snapshot T = watermark - 90d: placed on/before T,
      -- finishes shipping strictly after T
      SELECT s.o_orderkey, s.cents,
             date_diff('day', s.placed, CAST(w.t AS DATE)) AS age_days
      FROM order_ship s CROSS JOIN wm w
      WHERE s.placed <= CAST(w.t AS DATE) AND s.last_ship > CAST(w.t AS DATE)
    )
    {" UNION ALL ".join(
        f'''SELECT '{lo}-{hi if hi < 100000 else "plus"}' AS age_bucket,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(coalesce(sum(cents), 0) AS BIGINT) AS value_cents
        FROM aged WHERE age_days BETWEEN {lo} AND {hi}'''
        for lo, hi in _AGE_BUCKETS)}
    """,
    "Order-backlog aging — the AR-style bucket report for "
    "unfulfilled work: orders open at the snapshot T = watermark "
    "minus 90 days (placed on/before T, last lineitem ships after "
    "T), bucketed by days since placement (0-30/31-90/91-180/181+) "
    "with order counts and value at risk in exact cents. The aging "
    "shape is the fulfillment-health readout (mass in 181+ means "
    "stuck orders, not volume) — the stock snapshot complementing "
    "`active_orders_peak`\'s flow curve. Watermark-anchored for "
    "fixture reproducibility; one fact join, grid-sized output.",
    ("bi", "aging", "ops", "orders"),
)
def order_backlog_aging(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    wm = li.agg(
        F.date_sub(F.max(F.col("l_shipdate").cast("date")), 90).alias("t")
    )
    order_ship = (
        o.join(li, li.l_orderkey == o.o_orderkey)
        .groupBy(
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("placed"),
        )
        .agg(
            F.max(F.floor(F.col("o_totalprice") * 100))
            .cast("long")
            .alias("cents"),
            F.max(F.col("l_shipdate").cast("date")).alias("last_ship"),
        )
    )
    aged = (
        order_ship.crossJoin(F.broadcast(wm))
        .filter(
            (F.col("placed") <= F.col("t"))
            & (F.col("last_ship") > F.col("t"))
        )
        .select(
            "cents", F.datediff(F.col("t"), F.col("placed")).alias("age_days")
        )
        .localCheckpoint(eager=False)
    )
    out = None
    for lo, hi in _AGE_BUCKETS:
        label = f"{lo}-{hi if hi < 100000 else 'plus'}"
        one = aged.filter(
            F.col("age_days").between(lo, hi)
        ).agg(
            F.count("*").alias("n_orders"),
            F.coalesce(F.sum("cents"), F.lit(0)).alias("value_cents"),
        ).select(
            F.lit(label).alias("age_bucket"),
            F.col("n_orders").cast("long").alias("n_orders"),
            F.col("value_cents").cast("long").alias("value_cents"),
        )
        out = one if out is None else out.unionAll(one)
    return out
