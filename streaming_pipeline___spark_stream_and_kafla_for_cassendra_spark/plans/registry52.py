"""Round-3 registry additions, batch 39 — fulfillment-latency SLA
percentiles, Wilson-interval purchase rates, and a day-of-month
uniformity audit.

Same contract as ``registry.py``. Imported at the bottom of
``registry.py``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import _register, _t

# ---------------------------------------------------------------------------
# Fulfillment latency percentiles by order priority (the SLA table)
# ---------------------------------------------------------------------------


@_register(
    "fulfillment_latency_by_priority",
    """
    WITH lat AS (
      SELECT o.o_orderpriority AS priority,
             date_diff('day', CAST(o.o_orderdate AS DATE),
                       min(CAST(l.l_shipdate AS DATE))) AS first_ship_days,
             date_diff('day', CAST(o.o_orderdate AS DATE),
                       max(CAST(l.l_shipdate AS DATE))) AS full_ship_days
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey, o.o_orderpriority, o.o_orderdate
    )
    SELECT priority,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(quantile_cont(first_ship_days, 0.5), 4)
             AS first_ship_p50,
           round(quantile_cont(first_ship_days, 0.9), 4)
             AS first_ship_p90,
           round(quantile_cont(full_ship_days, 0.5), 4)
             AS full_ship_p50,
           round(quantile_cont(full_ship_days, 0.9), 4)
             AS full_ship_p90,
           CAST(sum(CASE WHEN full_ship_days > 90 THEN 1 ELSE 0 END)
                AS BIGINT) AS breaches_90d
    FROM lat GROUP BY 1
    """,
    "Fulfillment-latency SLA table: per order priority, exact "
    "interpolated p50/p90 of days from placement to FIRST shipment "
    "(responsiveness) and to LAST shipment (completion), plus "
    "orders breaching a 90-day completion SLA — the table an ops "
    "review actually reads, and the one that exposes whether "
    "'URGENT' priority buys anything (compare the p90 columns "
    "across rows). Integer day latencies, the oracle-proven "
    "percentile/quantile_cont pairing, one order-keyed rollup to "
    "a 5-row grid.",
    ("bi", "sla", "latency", "orders"),
)
def fulfillment_latency_by_priority(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    lat = (
        o.join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_orderpriority", "o_orderdate")
        .agg(
            F.datediff(
                F.min(F.col("l_shipdate").cast("date")),
                F.col("o_orderdate").cast("date"),
            ).alias("first_ship_days"),
            F.datediff(
                F.max(F.col("l_shipdate").cast("date")),
                F.col("o_orderdate").cast("date"),
            ).alias("full_ship_days"),
        )
        .select(
            F.col("o_orderpriority").alias("priority"),
            "first_ship_days",
            "full_ship_days",
        )
    )

    def pct(col, q, name):
        return (
            F.round(F.expr(f"percentile({col}, {q})"), 4) + F.lit(0.0)
        ).alias(name)

    return lat.groupBy("priority").agg(
        F.count("*").alias("n_orders"),
        pct("first_ship_days", 0.5, "first_ship_p50"),
        pct("first_ship_days", 0.9, "first_ship_p90"),
        pct("full_ship_days", 0.5, "full_ship_p50"),
        pct("full_ship_days", 0.9, "full_ship_p90"),
        F.sum(F.when(F.col("full_ship_days") > 90, 1).otherwise(0))
        .cast("long")
        .alias("breaches_90d"),
    )


# ---------------------------------------------------------------------------
# Purchase rate by hour with Wilson 95% intervals
# ---------------------------------------------------------------------------


@_register(
    "purchase_rate_wilson_by_hour",
    """
    WITH hourly AS (
      SELECT CAST(hour(ts) AS INTEGER) AS hr,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS k
      FROM events GROUP BY 1
    )
    SELECT hr, n, k,
           floor(k / CAST(n AS DOUBLE) * 1000000 + 0.5) / 1000000.0
             AS rate,
           floor(((k / CAST(n AS DOUBLE) + 1.9208 / n
                   - 1.96 * sqrt((k / CAST(n AS DOUBLE))
                                 * (1 - k / CAST(n AS DOUBLE)) / n
                                 + 0.9604 / (CAST(n AS DOUBLE) * n)))
                  / (1 + 3.8416 / n)) * 1000000 + 0.5) / 1000000.0
             AS wilson_lo,
           floor(((k / CAST(n AS DOUBLE) + 1.9208 / n
                   + 1.96 * sqrt((k / CAST(n AS DOUBLE))
                                 * (1 - k / CAST(n AS DOUBLE)) / n
                                 + 0.9604 / (CAST(n AS DOUBLE) * n)))
                  / (1 + 3.8416 / n)) * 1000000 + 0.5) / 1000000.0
             AS wilson_hi
    FROM hourly
    """,
    "Purchase rate by hour of day with WILSON 95% score intervals "
    "— the proportion CI that stays sane at small n and near-0 "
    "rates where the naive Wald interval goes negative (z and z^2 "
    "baked in as the literals 1.96/3.8416/1.9208/0.9604, the same "
    "fixed-order expression in both engines). An hour whose "
    "interval clears the daily mean is a real daypart effect; "
    "overlapping intervals are noise a dashboard would have "
    "overclaimed — uncertainty-aware companion to "
    "`weekday_hour_heatmap_events` (counts without error bars). "
    "One grid aggregate, 24 rows.",
    ("stats", "proportion", "events"),
)
def purchase_rate_wilson_by_hour(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    hourly = e.groupBy(F.hour("ts").cast("int").alias("hr")).agg(
        F.count("*").alias("n"),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("k"),
    )
    p = F.col("k") / F.col("n").cast("double")
    nD = F.col("n").cast("double")
    inner = F.sqrt(p * (1 - p) / F.col("n") + 0.9604 / (nD * F.col("n")))
    denom = 1 + 3.8416 / F.col("n")
    lo = (p + 1.9208 / F.col("n") - 1.96 * inner) / denom
    hi = (p + 1.9208 / F.col("n") + 1.96 * inner) / denom
    r6 = lambda c: F.floor(c * 1000000 + F.lit(0.5)) / 1000000.0  # noqa: E731
    return hourly.select(
        "hr",
        F.col("n").cast("long").alias("n"),
        F.col("k").cast("long").alias("k"),
        r6(p).alias("rate"),
        r6(lo).alias("wilson_lo"),
        r6(hi).alias("wilson_hi"),
    )


# ---------------------------------------------------------------------------
# Day-of-month uniformity audit (batching / backdating detector)
# ---------------------------------------------------------------------------


@_register(
    "day_of_month_uniformity",
    """
    WITH dom AS (
      SELECT CAST(day(CAST(o_orderdate AS DATE)) AS INTEGER) AS dom,
             CAST(count(*) AS BIGINT) AS n
      FROM orders
      WHERE day(CAST(o_orderdate AS DATE)) <= 28
      GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM dom)
    SELECT d.dom, d.n,
           floor(d.n / CAST(t.total AS DOUBLE) * 1000000 + 0.5) / 1000000.0
             AS share,
           floor((d.n - t.total / 28.0) * (d.n - t.total / 28.0)
                 / (t.total / 28.0) * 10000 + 0.5) / 10000.0
             AS chi2_term
    FROM dom d CROSS JOIN tot t
    """,
    "Day-of-month uniformity audit over order dates (days 1-28 so "
    "every day has equal calendar exposure): per-day counts, "
    "shares, and chi-square terms against the uniform expectation "
    "— spikes at day 1 or month-end are the signature of BATCHED "
    "or backdated bookings (the temporal cousin of "
    "`benford_first_digit_orders`' amount forensics and "
    "`cent_digit_uniformity_orders`' rounding detector). Exact "
    "integer counts, pinned expectation arithmetic, 28-row "
    "output.",
    ("quality", "forensics", "orders"),
)
def day_of_month_uniformity(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    dom = (
        o.select(
            F.dayofmonth(F.col("o_orderdate").cast("date")).alias("dom")
        )
        .filter(F.col("dom") <= 28)
        .groupBy("dom")
        .agg(F.count("*").alias("n"))
    )
    tot = dom.agg(F.sum("n").alias("total"))
    exp = F.col("total") / 28.0
    return dom.crossJoin(F.broadcast(tot)).select(
        F.col("dom").cast("int").alias("dom"),
        F.col("n").cast("long").alias("n"),
        (
            F.floor(
                F.col("n") / F.col("total").cast("double") * 1000000
                + F.lit(0.5)
            )
            / 1000000.0
        ).alias("share"),
        (
            F.floor(
                (F.col("n") - exp) * (F.col("n") - exp) / exp * 10000
                + F.lit(0.5)
            )
            / 10000.0
        ).alias("chi2_term"),
    )
