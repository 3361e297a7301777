"""Round-2 (cont.) registry additions — conversion-latency CDF,
exact-moment elasticity slopes, and the weekday×hour activity grid.

Same contract as ``registry.py``. Imported at the bottom of
``registry.py``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import _register, _t


def _r6(col):
    return F.floor(col * 1000000 + F.lit(0.5)) / F.lit(1000000.0)


# ---------------------------------------------------------------------------
# Conversion-latency CDF at fixed hour offsets
# ---------------------------------------------------------------------------

_CDF_HOURS = (1, 2, 4, 8, 24, 48, 96)


@_register(
    "conversion_cdf_hours",
    f"""
    WITH per_user AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN ts END) AS t0,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS tp
      FROM events GROUP BY 1
    ),
    conv AS (
      SELECT CAST(floor((floor(epoch(tp)) - floor(epoch(t0))) / 3600)
                  AS BIGINT) AS lag_h
      FROM per_user
      WHERE t0 IS NOT NULL AND tp IS NOT NULL AND tp >= t0
    ),
    base AS (
      SELECT CAST((SELECT count(*) FROM per_user WHERE t0 IS NOT NULL)
                  AS BIGINT) AS n_viewers,
             CAST(count(*) AS BIGINT) AS n_converted
      FROM conv
    ),
    grid AS (SELECT unnest([{", ".join(str(h) for h in _CDF_HOURS)}]) AS h)
    SELECT CAST(g.h AS BIGINT) AS within_hours,
           b.n_viewers,
           b.n_converted,
           CAST((SELECT count(*) FROM conv c WHERE c.lag_h < g.h) AS BIGINT)
             AS n_within,
           floor((SELECT count(*) FROM conv c WHERE c.lag_h < g.h)
                 / CAST(b.n_viewers AS DOUBLE) * 1000000 + 0.5) / 1000000.0
             AS share_of_viewers
    FROM grid g CROSS JOIN base b
    """,
    "Conversion-latency CDF: among users with a first view, the "
    "share whose first purchase lands within 1/2/4/8/24/48/96 hours "
    "— the funnel-velocity curve behind attribution-window and "
    "retargeting-deadline choices, summarizing what "
    "`conversion_latency_percentiles` reports as quantiles from the "
    "opposite direction. One users-sized rollup; the CDF evaluates "
    "the 7-point grid against integer hour lags (conditional counts "
    "in one pass on the Spark side, mirrored by the oracle's "
    "correlated counts over the same integers).",
    ("funnel", "analytics", "events"),
)
def conversion_cdf_hours(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t0"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("tp"),
    )
    viewers = per_user.filter(F.col("t0").isNotNull())
    conv = viewers.filter(
        F.col("tp").isNotNull() & (F.col("tp") >= F.col("t0"))
    ).select(
        F.floor(
            (
                F.col("tp").cast("timestamp").cast("long")
                - F.col("t0").cast("timestamp").cast("long")
            )
            / 3600
        ).alias("lag_h")
    )
    base = viewers.agg(F.count("*").alias("n_viewers")).crossJoin(
        conv.agg(F.count("*").alias("n_converted"))
    )
    counts = conv.agg(
        *[
            F.sum(F.when(F.col("lag_h") < h, 1).otherwise(0)).alias(f"w{h}")
            for h in _CDF_HOURS
        ]
    )
    grid = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(h).alias("h"), F.col(f"w{h}").alias("n_within")
                )
                for h in _CDF_HOURS
            ]
        )
    ).alias("g")
    return (
        counts.crossJoin(F.broadcast(base))
        .select(grid, "n_viewers", "n_converted")
        .select(
            F.col("g.h").cast("long").alias("within_hours"),
            F.col("n_viewers").cast("long").alias("n_viewers"),
            F.col("n_converted").cast("long").alias("n_converted"),
            F.col("g.n_within").cast("long").alias("n_within"),
            _r6(
                F.col("g.n_within") / F.col("n_viewers").cast("double")
            ).alias("share_of_viewers"),
        )
    )


# ---------------------------------------------------------------------------
# Price–quantity slope per brand from exact integer moments
# ---------------------------------------------------------------------------

@_register(
    "price_quantity_slope_by_brand",
    """
    WITH base AS (
      SELECT p.p_brand AS brand,
             CAST(floor(l.l_extendedprice / l.l_quantity * 100) AS BIGINT)
               AS unit_cents,
             CAST(l.l_quantity AS BIGINT) AS qty
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    m AS (
      SELECT brand,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(unit_cents) AS BIGINT) AS sx,
             CAST(sum(qty) AS BIGINT) AS sy,
             CAST(sum(unit_cents * unit_cents) AS BIGINT) AS sxx,
             CAST(sum(unit_cents * qty) AS BIGINT) AS sxy
      FROM base GROUP BY 1
    )
    SELECT brand, n,
           floor(sx / CAST(n AS DOUBLE) * 10000 + 0.5) / 10000.0
             AS mean_unit_cents,
           floor(sy / CAST(n AS DOUBLE) * 10000 + 0.5) / 10000.0 AS mean_qty,
           floor((sxy - sx * (sy / CAST(n AS DOUBLE)))
                 / (sxx - sx * (sx / CAST(n AS DOUBLE)))
                 * 1000000000 + 0.5) / 1000000000.0 AS slope_qty_per_cent
    FROM m WHERE n > 1 AND sxx - sx * (sx / CAST(n AS DOUBLE)) <> 0.0
    """,
    "Price-sensitivity slope per brand: OLS slope of quantity on "
    "unit price (integer cents) from EXACT integer moment sums "
    "(n, Σx, Σy, Σx², Σxy) accumulated in ONE map-side-combined "
    "scan — the demand-curve screen that a log-log elasticity "
    "regression needs float-order-hazardous Σln sums for; using raw "
    "integer cents keeps every aggregate exact at any parallelism "
    "and the slope one pinned IEEE expression (the same moment "
    "discipline as `lineitem_regression_by_flag`, applied per "
    "brand with a degenerate-variance guard).",
    ("stats", "regression", "lineitem"),
)
def price_quantity_slope_by_brand(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_quantity"
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    base = li.join(p, li.l_partkey == p.p_partkey).select(
        F.col("p_brand").alias("brand"),
        F.floor(F.col("l_extendedprice") / F.col("l_quantity") * 100)
        .cast("long")
        .alias("unit_cents"),
        F.col("l_quantity").cast("long").alias("qty"),
    )
    m = (
        base.groupBy("brand")
        .agg(
            F.count("*").alias("n"),
            F.sum("unit_cents").alias("sx"),
            F.sum("qty").alias("sy"),
            F.sum(
                F.col("unit_cents").cast("decimal(20,0)")
                * F.col("unit_cents")
            ).alias("sxx"),
            F.sum(
                F.col("unit_cents").cast("decimal(20,0)") * F.col("qty")
            ).alias("sxy"),
        )
        .filter(
            (F.col("n") > 1)
            & (
                F.col("sxx")
                - F.col("sx") * (F.col("sx") / F.col("n").cast("double"))
                != 0.0
            )
        )
    )
    nd = F.col("n").cast("double")
    slope = (F.col("sxy") - F.col("sx") * (F.col("sy") / nd)) / (
        F.col("sxx") - F.col("sx") * (F.col("sx") / nd)
    )
    r4 = lambda c: F.floor(c * 10000 + F.lit(0.5)) / F.lit(10000.0)  # noqa: E731
    r9 = lambda c: F.floor(c * 1000000000 + F.lit(0.5)) / F.lit(1000000000.0)  # noqa: E731
    return m.select(
        "brand",
        F.col("n").cast("long").alias("n"),
        r4(F.col("sx") / nd).alias("mean_unit_cents"),
        r4(F.col("sy") / nd).alias("mean_qty"),
        r9(slope).alias("slope_qty_per_cent"),
    )


# ---------------------------------------------------------------------------
# Weekday × hour activity heatmap grid
# ---------------------------------------------------------------------------

@_register(
    "weekday_hour_heatmap_events",
    """
    WITH cells AS (
      SELECT CAST(dayofweek(ts) + 1 AS INTEGER) AS dow,
             CAST(hour(ts) AS INTEGER) AS hod,
             CAST(count(*) AS BIGINT) AS n,
             CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      FROM events GROUP BY 1, 2
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM cells)
    SELECT dow, hod, n, n_users,
           floor(n / CAST(nt AS DOUBLE) * 1000000 + 0.5) / 1000000.0
             AS share
    FROM cells CROSS JOIN tot
    """,
    "Weekday × hour activity heatmap: the 7×24 grid of event counts, "
    "distinct users and traffic share — the capacity-planning / "
    "anomaly-baseline census every ops dashboard opens with, and the "
    "2-D companion to `fano_burstiness_by_type`'s dispersion scalar. "
    "One map-side-combined aggregate to ≤168 cells (the distinct-"
    "user count adds the only user-keyed expansion); shares are "
    "pinned divisions of exact integers. DuckDB's 0=Sunday dayofweek "
    "is shifted +1 in the oracle to Spark's 1=Sunday convention.",
    ("census", "timeseries", "events"),
)
def weekday_hour_heatmap_events(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    cells = e.groupBy(
        F.dayofweek(F.col("ts")).alias("dow"),
        F.hour(F.col("ts")).alias("hod"),
    ).agg(
        F.count("*").alias("n"),
        F.countDistinct("user_id").alias("n_users"),
    )
    tot = cells.agg(F.sum("n").alias("nt"))
    return cells.crossJoin(F.broadcast(tot)).select(
        "dow",
        "hod",
        F.col("n").cast("long").alias("n"),
        F.col("n_users").cast("long").alias("n_users"),
        _r6(F.col("n") / F.col("nt").cast("double")).alias("share"),
    )
