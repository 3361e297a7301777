"""Round-3 registry additions, batch 24 — exact 1-D Wasserstein
distance between price distributions, and quantile treatment
effects for the A/B cohorts.

Same contract as ``registry.py``. Imported at the bottom of
``registry.py``.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import _register, _t

# ---------------------------------------------------------------------------
# Exact 1-D Wasserstein-1 distance: weekday vs weekend order prices
# ---------------------------------------------------------------------------


@_register(
    "wasserstein_price_weekday_weekend",
    """
    WITH labeled AS (
      SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
             (CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
              + 4) % 7 IN (0, 6) AS weekend
      FROM orders
    ),
    tot AS (
      SELECT CAST(sum(CASE WHEN weekend THEN 1 ELSE 0 END) AS BIGINT)
               AS n_we,
             CAST(sum(CASE WHEN weekend THEN 0 ELSE 1 END) AS BIGINT)
               AS n_wd
      FROM labeled
    ),
    vals AS (
      SELECT cents,
             CAST(sum(CASE WHEN weekend THEN 1 ELSE 0 END) AS BIGINT)
               AS c_we,
             CAST(sum(CASE WHEN weekend THEN 0 ELSE 1 END) AS BIGINT)
               AS c_wd
      FROM labeled GROUP BY 1
    ),
    cum AS (
      SELECT cents,
             lead(cents) OVER (ORDER BY cents) AS next_cents,
             CAST(sum(c_we) OVER (ORDER BY cents
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS cum_we,
             CAST(sum(c_wd) OVER (ORDER BY cents
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS cum_wd
      FROM vals
    ),
    segs AS (
      -- between consecutive support points the two empirical CDFs
      -- are constant, so W1 = sum over gaps of width * |F1 - F2|;
      -- |cum_we/n_we - cum_wd/n_wd| = |cum_we*n_wd - cum_wd*n_we|
      -- / (n_we*n_wd) keeps the numerator an exact integer
      SELECT (next_cents - cents)
             * abs(cum_we * t.n_wd - cum_wd * t.n_we) AS num,
             t.n_we * t.n_wd AS den
      FROM cum CROSS JOIN tot t
      WHERE next_cents IS NOT NULL
    )
    SELECT (SELECT n_we FROM tot) AS n_weekend,
           (SELECT n_wd FROM tot) AS n_weekday,
           CAST(sum(num) AS BIGINT) AS w1_numerator,
           CAST(max(den) AS BIGINT) AS w1_denominator,
           floor(sum(num) / CAST(max(den) AS DOUBLE) / 100.0 * 10000
                 + 0.5) / 10000.0 AS w1_dollars
    FROM segs
    """,
    "EXACT 1-D Wasserstein-1 (earth-mover) distance between the "
    "weekend and weekday order-price distributions: between "
    "consecutive support points both empirical CDFs are constant, "
    "so W1 = sum of gap-width x |F_we - F_wd| — and with the CDF "
    "difference kept as the integer |cum_we*n_wd - cum_wd*n_we| "
    "the entire integral is ONE exact integer divided once at the "
    "end (order-free integer SUM, no float accumulation anywhere). "
    "The transport metric completes the distribution-distance "
    "family: KS (`ks_statistic_value_by_type`) takes the max CDF "
    "gap, KL/JS weigh log-ratios, W1 integrates the gap — and is "
    "the one with units (dollars of movement). The ENGINE computes "
    "the integral via scale.py::cdf_area (range-partitioned support "
    "+ per-partition carry-ins — no single-partition window); the "
    "oracle states the same integer with a plain running-CDF "
    "window. Weekday convention is integer epoch-day arithmetic.",
    ("stats", "distribution", "transport", "orders"),
)
def wasserstein_price_weekday_weekend(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    weekend = (
        (
            F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01"))
            .cast("long")
            + 4
        )
        % 7
    ).isin(0, 6)
    labeled = o.select(
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        weekend.alias("weekend"),
    )
    tot = labeled.agg(
        F.sum(F.when(F.col("weekend"), 1).otherwise(0)).alias("n_we"),
        F.sum(F.when(F.col("weekend"), 0).otherwise(1)).alias("n_wd"),
    )
    from ..operators.scale import cdf_area

    vals = labeled.groupBy("cents").agg(
        F.sum(F.when(F.col("weekend"), 1).otherwise(0)).alias("c_we"),
        F.sum(F.when(F.col("weekend"), 0).otherwise(1)).alias("c_wd"),
    )
    # scale.py::cdf_area computes the CDF-gap integral with range
    # partitioning + per-partition carry-ins — the oracle states the
    # same integral with a plain running-CDF window, but the ENGINE
    # never funnels the support through one partition
    area = cdf_area(vals, "cents", ("c_we", "c_wd"))
    # cdf_area returns the numerator as exact decimal(38,0); this
    # query's oracle contract is BIGINT, which the sf-bounded
    # cents×rows product fits comfortably
    return area.select(
        F.col("n1").alias("n_weekend"),
        F.col("n2").alias("n_weekday"),
        F.col("numerator").cast("long").alias("w1_numerator"),
        (F.col("n1") * F.col("n2")).cast("long").alias("w1_denominator"),
        (
            F.floor(
                F.col("numerator").cast("double")
                / (F.col("n1") * F.col("n2")).cast("double")
                / 100.0
                * 10000
                + F.lit(0.5)
            )
            / 10000.0
        ).alias("w1_dollars"),
    )


# ---------------------------------------------------------------------------
# Quantile treatment effects: decile-by-decile A/B spend comparison
# ---------------------------------------------------------------------------

_QTE_QS = (0.1, 0.25, 0.5, 0.75, 0.9)


@_register(
    "quantile_treatment_effect_ab",
    f"""
    WITH spend AS (
      SELECT user_id,
             CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1)
                       IN ('0','1','2','3','4','5','6','7')
                  THEN 'A' ELSE 'B' END AS grp,
             CAST(sum(CAST(floor(value * 10000) AS BIGINT)) AS BIGINT)
               AS spend
      FROM events WHERE event_type = 'purchase'
      GROUP BY 1
    ),
    q AS (
      SELECT grp,
             {", ".join(
                 f"round(quantile_cont(spend, {q}), 4) AS q{int(q * 100)}"
                 for q in _QTE_QS)},
             CAST(count(*) AS BIGINT) AS n
      FROM spend GROUP BY 1
    )
    SELECT {", ".join(f"a.q{int(q * 100)} AS a_q{int(q * 100)}"
                      for q in _QTE_QS)},
           {", ".join(f"b.q{int(q * 100)} AS b_q{int(q * 100)}"
                      for q in _QTE_QS)},
           {", ".join(
               f"round(a.q{int(q * 100)} - b.q{int(q * 100)}, 4)"
               f" AS qte_{int(q * 100)}"
               for q in _QTE_QS)},
           a.n AS n_a, b.n AS n_b
    FROM (SELECT * FROM q WHERE grp = 'A') a
    CROSS JOIN (SELECT * FROM q WHERE grp = 'B') b
    """,
    "Quantile treatment effects for the md5 A/B cohorts: per-user "
    "purchase spend (integer ten-thousandths), EXACT interpolated "
    "percentiles at 5 quantiles per cohort, and the decile-by-"
    "decile difference — the distributional readout that catches "
    "what `two_proportion_ztest_ab` and mean-based CUPED miss: a "
    "treatment that moves the p90 while leaving the median alone. "
    "Spark's exact `percentile` aggregate and DuckDB's share the "
    "linear-interpolation definition (the oracle-proven pairing "
    "from `events_value_percentiles`). One user rollup, one 2-group "
    "aggregate.",
    ("ml-eval", "ab-test", "quantile", "events"),
)
def quantile_treatment_effect_ab(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    grp = F.when(
        F.substring(
            F.md5(F.col("user_id").cast("string").cast("binary")), 1, 1
        ).isin(*"01234567"),
        F.lit("A"),
    ).otherwise(F.lit("B"))
    spend = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.sum(F.floor(F.col("value") * 10000).cast("long")).alias(
                "spend"
            )
        )
        .select(grp.alias("grp"), "spend")
    )
    q = spend.groupBy("grp").agg(
        *[
            (F.round(F.expr(f"percentile(spend, {qq})"), 4) + F.lit(0.0)).alias(
                f"q{int(qq * 100)}"
            )
            for qq in _QTE_QS
        ],
        F.count("*").alias("n"),
    )
    a = q.filter(F.col("grp") == "A").drop("grp")
    b = q.filter(F.col("grp") == "B").drop("grp")
    a = a.select(
        *[F.col(f"q{int(qq * 100)}").alias(f"a_q{int(qq * 100)}") for qq in _QTE_QS],
        F.col("n").alias("n_a"),
    )
    b = b.select(
        *[F.col(f"q{int(qq * 100)}").alias(f"b_q{int(qq * 100)}") for qq in _QTE_QS],
        F.col("n").alias("n_b"),
    )
    out = a.crossJoin(b)
    return out.select(
        *[F.col(f"a_q{int(qq * 100)}") for qq in _QTE_QS],
        *[F.col(f"b_q{int(qq * 100)}") for qq in _QTE_QS],
        *[
            (
                F.round(
                    F.col(f"a_q{int(qq * 100)}") - F.col(f"b_q{int(qq * 100)}"),
                    4,
                )
                + F.lit(0.0)
            ).alias(f"qte_{int(qq * 100)}")
            for qq in _QTE_QS
        ],
        "n_a",
        "n_b",
    )
