"""Round-3 registry additions, batch 37 — split-conformal prediction
intervals and seasonality-strength diagnostics.

Same contract as ``registry.py``. Imported at the bottom of
``registry.py``.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import _register, _t

# ---------------------------------------------------------------------------
# Split-conformal prediction intervals for the seasonal-naive forecaster
# ---------------------------------------------------------------------------

_CONF_LEVELS = (0.8, 0.9, 0.95)


@_register(
    "conformal_prediction_intervals",
    f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev
      FROM orders GROUP BY 1
    ),
    idx AS (
      SELECT day, rev, row_number() OVER (ORDER BY day) AS i,
             lag(rev, 7) OVER (ORDER BY day) AS fc
      FROM daily
    ),
    n AS (SELECT CAST(max(i) AS BIGINT) AS n FROM idx),
    scored AS MATERIALIZED (
      SELECT x.i, x.rev, x.fc, abs(x.rev - x.fc) AS resid,
             x.i <= (t.n * 4) // 5 AS is_cal
      FROM idx x CROSS JOIN n t
      WHERE x.fc IS NOT NULL
    ),
    cal AS MATERIALIZED (
      -- discrete quantile pinned explicitly: the residual at sorted
      -- rank ceil(q * n_cal) — identical indexing in both engines
      SELECT list(resid ORDER BY resid) AS rs,
             CAST(count(*) AS BIGINT) AS nc
      FROM scored WHERE is_cal
    ),
    qhat AS (
      SELECT {", ".join(
          f"CAST(rs[CAST(ceil({q!r} * nc) AS INTEGER)] AS BIGINT)"
          f" AS q{int(q * 100)}"
          for q in _CONF_LEVELS)}
      FROM cal
    )
    {" UNION ALL ".join(
        f'''SELECT CAST({q!r} AS DOUBLE) AS level,
           (SELECT q{int(q * 100)} FROM qhat) AS interval_halfwidth_cents,
           CAST(count(*) AS BIGINT) AS n_test,
           CAST(sum(CASE WHEN resid <= (SELECT q{int(q * 100)} FROM qhat)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
           floor(sum(CASE WHEN resid <= (SELECT q{int(q * 100)} FROM qhat)
                          THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE) * 1000000 + 0.5) / 1000000.0
             AS empirical_coverage
        FROM scored WHERE NOT is_cal'''
        for q in _CONF_LEVELS)}
    """,
    "Split-conformal prediction intervals around the seasonal-naive "
    "(lag-7) forecaster: absolute residuals on the first 80% of "
    "days calibrate a DISCRETE quantile half-width per nominal "
    "level (the residual at sorted rank ceil(q*n) — indexed "
    "explicitly so both engines pick the identical integer), and "
    "the held-out 20% reports EMPIRICAL coverage — the "
    "distribution-free guarantee that turns any point forecaster "
    "into an honest interval, with the holdout check that catches "
    "exchangeability violations (trend/regime drift). Residuals "
    "are exact integer cents; the calibration array is days-sized. "
    "The uncertainty completion of the forecasting family "
    "(`seasonal_naive_mase_daily` scores the point forecast this "
    "wraps).",
    ("timeseries", "forecast", "uncertainty", "orders"),
)
def conformal_prediction_intervals(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias("rev")
    )
    w = Window.orderBy("day")
    idx = daily.select(
        "day",
        "rev",
        F.row_number().over(w).alias("i"),
        F.lag("rev", 7).over(w).alias("fc"),
    )
    n = idx.agg(F.max("i").alias("n"))
    scored = (
        idx.crossJoin(F.broadcast(n))
        .filter(F.col("fc").isNotNull())
        .select(
            "i",
            F.abs(F.col("rev") - F.col("fc")).alias("resid"),
            (F.col("i") <= F.expr("(n * 4) div 5")).alias("is_cal"),
        )
        .localCheckpoint(eager=False)
    )
    cal = scored.filter("is_cal").agg(
        F.array_sort(F.collect_list("resid")).alias("rs"),
        F.count("*").alias("nc"),
    )
    qhat = cal.select(
        *[
            F.element_at(
                F.col("rs"), F.ceil(F.lit(float(q)) * F.col("nc")).cast("int")
            )
            .cast("long")
            .alias(f"q{int(q * 100)}")
            for q in _CONF_LEVELS
        ]
    ).localCheckpoint(eager=False)
    test = scored.filter(~F.col("is_cal"))
    out = None
    for q in _CONF_LEVELS:
        qc = f"q{int(q * 100)}"
        one = (
            test.crossJoin(F.broadcast(qhat.select(qc)))
            .agg(
                F.max(qc).alias("hw"),
                F.count("*").alias("n_test"),
                F.sum(
                    F.when(F.col("resid") <= F.col(qc), 1).otherwise(0)
                ).alias("n_covered"),
            )
            .select(
                F.lit(float(q)).alias("level"),
                F.col("hw").cast("long").alias("interval_halfwidth_cents"),
                F.col("n_test").cast("long").alias("n_test"),
                F.col("n_covered").cast("long").alias("n_covered"),
                (
                    F.floor(
                        F.col("n_covered")
                        / F.col("n_test").cast("double")
                        * 1000000
                        + F.lit(0.5)
                    )
                    / 1000000.0
                ).alias("empirical_coverage"),
            )
        )
        out = one if out is None else out.unionAll(one)
    return out


# ---------------------------------------------------------------------------
# Seasonality strength of daily revenue (Hyndman's F_seasonal)
# ---------------------------------------------------------------------------


@_register(
    "seasonality_strength_daily",
    """
    WITH daily AS (
      SELECT day, CAST(floor(rev_cents / 100000) AS BIGINT) AS kd,
             CAST((CAST(day - DATE '1970-01-01' AS BIGINT) + 4) % 7
                  AS BIGINT) AS wd
      FROM (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS rev_cents
        FROM orders GROUP BY 1
      )
    ),
    ma AS (
      SELECT day, kd, wd,
             CASE WHEN count(*) OVER w = 7 THEN
               CAST(sum(kd) OVER w AS BIGINT) END AS ma7_sum
      FROM daily
      WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    detr AS MATERIALIZED (
      -- detrended in SEVENTHS of a kilodollar: 7*kd - MA-sum is integer
      SELECT day, wd, CAST(7 * kd - ma7_sum AS BIGINT) AS d7
      FROM ma WHERE ma7_sum IS NOT NULL
    ),
    seas AS (
      SELECT wd, CAST(sum(d7) AS BIGINT) AS s_sum,
             CAST(count(*) AS BIGINT) AS s_n
      FROM detr GROUP BY 1
    ),
    resid AS (
      -- floored remainder keeps every moment an exact integer
      SELECT CAST(floor(d.d7 - CAST(s.s_sum AS DOUBLE) / s.s_n) AS BIGINT)
               AS r,
             d.d7 AS d7
      FROM detr d JOIN seas s ON s.wd = d.wd
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(r) AS BIGINT) AS sr,
             CAST(sum(r * r) AS BIGINT) AS srr,
             CAST(sum(d7) AS BIGINT) AS sd,
             CAST(sum(d7 * d7) AS BIGINT) AS sdd
      FROM resid
    )
    SELECT n AS n_days,
           floor(greatest(0.0,
                 1.0 - (CAST(n * srr - sr * sr AS DOUBLE)
                        / CAST(n * sdd - sd * sd AS DOUBLE)))
                 * 1000000 + 0.5) / 1000000.0 AS f_seasonal,
           floor(CAST(n * srr - sr * sr AS DOUBLE)
                 / (CAST(n AS DOUBLE) * n) / 49.0 * 10000 + 0.5) / 10000.0
             AS resid_var_kd2
    FROM m
    """,
    "Seasonality strength of daily revenue (Hyndman's F_seasonal): "
    "classical decomposition with a centered 7-day moving average "
    "(kept integer by working in SEVENTHS of a kilodollar: 7*kd - "
    "MA-sum), weekday means as the seasonal component, remainders "
    "FLOORED to integers so every variance comes from exact "
    "integer moments — F_s = max(0, 1 - var(remainder)/"
    "var(detrended)), near 1 meaning the weekday cycle dominates "
    "(seasonal models justified), near 0 meaning Holt-Winters and "
    "seasonal-naive would be fitting noise. The model-selection "
    "diagnostic that arbitrates the forecasting family; windows "
    "on the days-sized rollup only.",
    ("timeseries", "diagnostics", "orders"),
)
def seasonality_strength_daily(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    base = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias(
            "rev_cents"
        )
    )
    daily = base.select(
        "day",
        F.floor(F.col("rev_cents") / 100000).cast("long").alias("kd"),
        (
            (F.datediff(F.col("day"), F.lit("1970-01-01")).cast("long") + 4)
            % 7
        ).alias("wd"),
    )
    w = Window.orderBy("day").rowsBetween(-3, 3)
    ma = daily.select(
        "day",
        "kd",
        "wd",
        F.when(F.count("*").over(w) == 7, F.sum("kd").over(w)).alias(
            "ma7_sum"
        ),
    )
    detr = (
        ma.filter(F.col("ma7_sum").isNotNull())
        .select(
            "day", "wd", (7 * F.col("kd") - F.col("ma7_sum")).alias("d7")
        )
        .localCheckpoint(eager=False)
    )
    seas = detr.groupBy("wd").agg(
        F.sum("d7").alias("s_sum"), F.count("*").alias("s_n")
    )
    resid = detr.join(F.broadcast(seas), "wd").select(
        F.floor(
            F.col("d7") - F.col("s_sum").cast("double") / F.col("s_n")
        )
        .cast("long")
        .alias("r"),
        "d7",
    )
    m = resid.agg(
        F.count("*").alias("n"),
        F.sum("r").alias("sr"),
        F.sum(F.col("r").cast("decimal(20,0)") * F.col("r")).alias("srr"),
        F.sum("d7").alias("sd"),
        F.sum(F.col("d7").cast("decimal(20,0)") * F.col("d7")).alias("sdd"),
    )
    var_r = (F.col("n") * F.col("srr") - F.col("sr") * F.col("sr")).cast(
        "double"
    )
    var_d = (F.col("n") * F.col("sdd") - F.col("sd") * F.col("sd")).cast(
        "double"
    )
    return m.select(
        F.col("n").cast("long").alias("n_days"),
        (
            F.floor(
                F.greatest(F.lit(0.0), F.lit(1.0) - var_r / var_d)
                * 1000000
                + F.lit(0.5)
            )
            / 1000000.0
        ).alias("f_seasonal"),
        (
            F.floor(
                var_r / (F.col("n").cast("double") * F.col("n")) / 49.0
                * 10000
                + F.lit(0.5)
            )
            / 10000.0
        ).alias("resid_var_kd2"),
    )
