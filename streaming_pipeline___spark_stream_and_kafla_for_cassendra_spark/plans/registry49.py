"""Round-3 registry additions, batch 36 — binary-segmentation
changepoint detection and a duplicate-payment screen.

Same contract as ``registry.py``. Imported at the bottom of
``registry.py``.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import _register, _t

# ---------------------------------------------------------------------------
# Binary segmentation: the SSE-optimal single changepoint
# ---------------------------------------------------------------------------


@_register(
    "binary_segmentation_daily_revenue",
    """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(floor(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                        / 100000) AS BIGINT) AS kd
      FROM orders GROUP BY 1
    ),
    idx AS (
      SELECT day, kd,
             row_number() OVER (ORDER BY day) AS i,
             CAST(sum(kd) OVER (ORDER BY day
                                ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS ck,
             CAST(sum(kd * kd) OVER (ORDER BY day
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS cq
      FROM daily
    ),
    tot AS (
      SELECT CAST(max(i) AS BIGINT) AS n, CAST(max(ck) AS BIGINT) AS sk,
             CAST(max(cq) AS BIGINT) AS sq
      FROM idx
    ),
    scored AS MATERIALIZED (
      -- split AFTER index i: SSE = (sq_l - ck^2/i) + (sq_r - sk_r^2/n_r),
      -- kept as one exact-integer numerator over i*(n-i)
      SELECT x.day, x.i,
             CAST(t.sq AS DOUBLE)
             - (CAST(x.ck AS DOUBLE) * x.ck) / x.i
             - (CAST(t.sk - x.ck AS DOUBLE) * (t.sk - x.ck)) / (t.n - x.i)
               AS sse,
             (CAST(t.sq AS DOUBLE) - (CAST(t.sk AS DOUBLE) * t.sk) / t.n)
               AS sse0
      FROM idx x CROSS JOIN tot t
      WHERE x.i >= 7 AND x.i <= t.n - 7
    ),
    best AS (
      SELECT day, i, sse, sse0 FROM scored
      ORDER BY sse ASC, day ASC LIMIT 1
    )
    SELECT b.day AS changepoint_day,
           CAST(b.i AS BIGINT) AS split_index,
           floor(b.sse0 * 10000 + 0.5) / 10000.0 AS sse_no_split,
           floor(b.sse * 10000 + 0.5) / 10000.0 AS sse_best_split,
           floor((1.0 - b.sse / b.sse0) * 1000000 + 0.5) / 1000000.0
             AS variance_explained
    FROM best b
    """,
    "Binary segmentation changepoint: the SSE-optimal single split "
    "of the daily-revenue series (mean-shift model), scanning "
    "every candidate day with O(1) prefix-moment arithmetic — "
    "integer cumulative sums make each candidate's two-segment "
    "SSE a pinned expression, so the argmin day is "
    "bit-deterministic (7-day margins avoid degenerate splits). "
    "Reports the variance the split explains — and because "
    "`cusum_changepoint_daily` locates its changepoint by a "
    "DIFFERENT criterion (max cumulative deviation), agreement "
    "between the two days is the practitioners' cross-check that "
    "the shift is real. Kilodollar units; windows on the "
    "days-sized rollup only.",
    ("timeseries", "changepoint", "orders"),
)
def binary_segmentation_daily_revenue(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.floor(
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")) / 100000
        )
        .cast("long")
        .alias("kd")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    idx = daily.select(
        "day",
        "kd",
        F.row_number().over(Window.orderBy("day")).alias("i"),
        F.sum("kd").over(w).alias("ck"),
        F.sum(
            F.col("kd").cast("decimal(20,0)") * F.col("kd")
        ).over(w).alias("cq"),
    ).localCheckpoint(eager=False)
    tot = idx.agg(
        F.max("i").alias("n"), F.max("ck").alias("sk"), F.max("cq").alias("sq")
    )
    scored = (
        idx.crossJoin(F.broadcast(tot))
        .filter((F.col("i") >= 7) & (F.col("i") <= F.col("n") - 7))
        .select(
            "day",
            "i",
            (
                F.col("sq").cast("double")
                - (F.col("ck").cast("double") * F.col("ck")) / F.col("i")
                - (
                    (F.col("sk") - F.col("ck")).cast("double")
                    * (F.col("sk") - F.col("ck"))
                )
                / (F.col("n") - F.col("i"))
            ).alias("sse"),
            (
                F.col("sq").cast("double")
                - (F.col("sk").cast("double") * F.col("sk")) / F.col("n")
            ).alias("sse0"),
        )
        .localCheckpoint(eager=False)
    )
    best = scored.orderBy(F.col("sse").asc(), F.col("day").asc()).limit(1)
    return best.select(
        F.col("day").alias("changepoint_day"),
        F.col("i").cast("long").alias("split_index"),
        (F.floor(F.col("sse0") * 10000 + F.lit(0.5)) / 10000.0).alias(
            "sse_no_split"
        ),
        (F.floor(F.col("sse") * 10000 + F.lit(0.5)) / 10000.0).alias(
            "sse_best_split"
        ),
        (
            F.floor(
                (F.lit(1.0) - F.col("sse") / F.col("sse0")) * 1000000
                + F.lit(0.5)
            )
            / 1000000.0
        ).alias("variance_explained"),
    )


# ---------------------------------------------------------------------------
# Duplicate-payment screen: same customer, same day, same amount
# ---------------------------------------------------------------------------


@_register(
    "duplicate_payment_screen",
    """
    WITH keyed AS (
      SELECT o_custkey, CAST(o_orderdate AS DATE) AS day,
             CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
             CAST(floor(o_totalprice * 100) AS BIGINT) // 1000000 AS band,
             o_orderkey
      FROM orders
    ),
    groups AS (
      SELECT o_custkey, band,
             CAST(count(*) AS BIGINT) AS n_orders,
             CAST(min(day) AS DATE) AS first_day,
             CAST(max(day) AS DATE) AS last_day,
             CAST(min(o_orderkey) AS BIGINT) AS first_orderkey,
             CAST(max(cents) AS BIGINT) AS max_cents
      FROM keyed GROUP BY 1, 2
      HAVING count(*) >= 2
         AND date_diff('day', min(day), max(day)) <= 30
    )
    SELECT o_custkey, band, n_orders, first_day, last_day,
           first_orderkey,
           CAST((n_orders - 1) * max_cents AS BIGINT) AS exposure_cents
    FROM groups
    """,
    "Duplicate-payment screen — the accounts-payable forensic that "
    "catches double-submitted invoices and retry storms: orders by "
    "the same customer in the same $10,000 amount band within 30 "
    "days of each other, with the at-risk exposure = "
    "(duplicates-1) x max amount per group. The cheap banded first "
    "pass of a payment-integrity pipeline — "
    "`part_name_edit_distance_pairs`-style fuzzy tiers only run "
    "on what this free screen can't catch. One shuffle on the "
    "(customer, band) key; output is violation-sized.",
    ("quality", "forensics", "orders"),
)
def duplicate_payment_screen(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100).cast("long")
    keyed = o.select(
        "o_custkey",
        F.col("o_orderdate").cast("date").alias("day"),
        cents.alias("cents"),
        F.expr(
            "CAST(floor(o_totalprice * 100) AS BIGINT) div 1000000"
        ).alias("band"),
        "o_orderkey",
    )
    groups = (
        keyed.groupBy("o_custkey", "band")
        .agg(
            F.count("*").alias("n_orders"),
            F.min("day").alias("first_day"),
            F.max("day").alias("last_day"),
            F.min("o_orderkey").alias("first_orderkey"),
            F.max("cents").alias("max_cents"),
        )
        .filter(
            (F.col("n_orders") >= 2)
            & (F.datediff(F.col("last_day"), F.col("first_day")) <= 30)
        )
    )
    return groups.select(
        "o_custkey",
        "band",
        F.col("n_orders").cast("long").alias("n_orders"),
        "first_day",
        "last_day",
        F.col("first_orderkey").cast("long").alias("first_orderkey"),
        ((F.col("n_orders") - 1) * F.col("max_cents"))
        .cast("long")
        .alias("exposure_cents"),
    )
