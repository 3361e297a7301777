"""Round-3 registry additions, batch 31 — stratified ATE for an
observational treatment and a Poisson overdispersion check.

Same contract as ``registry.py``. Imported at the bottom of
``registry.py``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import _register, _t

# ---------------------------------------------------------------------------
# Stratified ATE: does a deep discount causally raise returns?
# ---------------------------------------------------------------------------


@_register(
    "stratified_ate_discount_returns",
    """
    WITH obs AS (
      SELECT o.o_orderpriority AS stratum,
             l.l_discount >= 0.05 AS treated,
             CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS y
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ),
    cells AS MATERIALIZED (
      SELECT stratum,
             CAST(count(*) AS BIGINT) AS n_s,
             CAST(sum(CASE WHEN treated THEN 1 ELSE 0 END) AS BIGINT)
               AS n_t,
             CAST(sum(CASE WHEN treated THEN y ELSE 0 END) AS BIGINT)
               AS y_t,
             CAST(sum(CASE WHEN NOT treated THEN y ELSE 0 END) AS BIGINT)
               AS y_c
      FROM obs GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(n_s) AS BIGINT) AS n FROM cells),
    scored AS MATERIALIZED (
      SELECT c.stratum, c.n_s, c.n_t, c.n_s - c.n_t AS n_c,
             CASE WHEN c.n_t > 0 AND c.n_s - c.n_t > 0 THEN
               floor((y_t / CAST(c.n_t AS DOUBLE)
                      - y_c / CAST(c.n_s - c.n_t AS DOUBLE))
                     * 1000000 + 0.5) / 1000000.0
             END AS stratum_effect,
             CASE WHEN c.n_t > 0 AND c.n_s - c.n_t > 0 THEN
               (c.n_s / CAST(t.n AS DOUBLE))
               * (y_t / CAST(c.n_t AS DOUBLE)
                  - y_c / CAST(c.n_s - c.n_t AS DOUBLE))
             END AS w_effect
      FROM cells c CROSS JOIN tot t
    )
    SELECT stratum, n_s, n_t, n_c, stratum_effect,
           floor((SELECT list_reduce(list_prepend(0.0::DOUBLE,
                    list(w_effect ORDER BY stratum)), (a, b) -> a + b)
                  FROM scored WHERE w_effect IS NOT NULL)
                 * 1000000 + 0.5) / 1000000.0 AS ate
    FROM scored
    """,
    "Stratified average treatment effect for an OBSERVATIONAL "
    "treatment (deep discount >= 5%, outcome = item returned), "
    "adjusting for order-priority confounding: per stratum the "
    "treated-minus-control return-rate difference from exact "
    "counts, combined with population weights n_s/N — the "
    "back-door-adjustment estimator (equivalent to IPW with "
    "within-stratum propensities), repeated on every row with the "
    "stratum-ordered fold so the ATE column is bit-identical. "
    "Completes the causal toolkit with the no-experiment case: "
    "RCT-style (z-test/CUPED/uplift/QTE), quasi-experimental "
    "(DiD/RDD), observational (this). One fact join, 5-cell grid.",
    ("stats", "causal", "lineitem"),
)
def stratified_ate_discount_returns(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    obs = li.join(o, o.o_orderkey == li.l_orderkey).select(
        F.col("o_orderpriority").alias("stratum"),
        (F.col("l_discount") >= 0.05).alias("treated"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
    )
    cells = obs.groupBy("stratum").agg(
        F.count("*").alias("n_s"),
        F.sum(F.when(F.col("treated"), 1).otherwise(0)).alias("n_t"),
        F.sum(F.when(F.col("treated"), F.col("y")).otherwise(0)).alias(
            "y_t"
        ),
        F.sum(F.when(~F.col("treated"), F.col("y")).otherwise(0)).alias(
            "y_c"
        ),
    ).localCheckpoint(eager=False)
    tot = cells.agg(F.sum("n_s").alias("n"))
    n_c = F.col("n_s") - F.col("n_t")
    valid = (F.col("n_t") > 0) & (n_c > 0)
    diff = F.col("y_t") / F.col("n_t").cast("double") - F.col("y_c") / n_c.cast(
        "double"
    )
    scored = cells.crossJoin(F.broadcast(tot)).select(
        "stratum",
        "n_s",
        "n_t",
        n_c.alias("n_c"),
        F.when(
            valid, F.floor(diff * 1000000 + F.lit(0.5)) / 1000000.0
        ).alias("stratum_effect"),
        F.when(valid, (F.col("n_s") / F.col("n").cast("double")) * diff).alias(
            "w_effect"
        ),
    ).localCheckpoint(eager=False)
    ate = scored.filter(F.col("w_effect").isNotNull()).agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("stratum", "w_effect"))),
            F.lit(0.0),
            lambda a, x: a + x["w_effect"],
        ).alias("ate_raw")
    ).select(
        (F.floor(F.col("ate_raw") * 1000000 + F.lit(0.5)) / 1000000.0).alias(
            "ate"
        )
    )
    return scored.select(
        "stratum", "n_s", "n_t", "n_c", "stratum_effect"
    ).crossJoin(F.broadcast(ate)).select(
        "stratum",
        F.col("n_s").cast("long").alias("n_s"),
        F.col("n_t").cast("long").alias("n_t"),
        F.col("n_c").cast("long").alias("n_c"),
        "stratum_effect",
        "ate",
    )


# ---------------------------------------------------------------------------
# Poisson overdispersion check for daily event counts per type
# ---------------------------------------------------------------------------

@_register(
    "overdispersion_check_events",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    m AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(c) AS BIGINT) AS s,
             CAST(sum(c * c) AS BIGINT) AS sq
      FROM daily GROUP BY 1
    )
    SELECT event_type, n_days, s AS total_events,
           floor(s / CAST(n_days AS DOUBLE) * 10000 + 0.5) / 10000.0
             AS mean_daily,
           floor((CAST(n_days AS DOUBLE) * sq - CAST(s AS DOUBLE) * s)
                 / (CAST(n_days AS DOUBLE) * (n_days - 1))
                 * 10000 + 0.5) / 10000.0 AS var_daily,
           floor(((CAST(n_days AS DOUBLE) * sq - CAST(s AS DOUBLE) * s)
                  / (CAST(n_days AS DOUBLE) * (n_days - 1)))
                 / (s / CAST(n_days AS DOUBLE)) * 10000 + 0.5) / 10000.0
             AS dispersion_index,
           ((CAST(n_days AS DOUBLE) * sq - CAST(s AS DOUBLE) * s)
            / (CAST(n_days AS DOUBLE) * (n_days - 1)))
           / (s / CAST(n_days AS DOUBLE)) > 1.5 AS overdispersed
    FROM m
    """,
    "Poisson overdispersion check: per event type, the dispersion "
    "index var/mean of DAILY counts from exact integer moments "
    "(sample variance, pinned arithmetic) with a >1.5 flag — the "
    "modeling gate that says whether Poisson rates (and every "
    "sqrt(n) error bar built on them) are legitimate or whether "
    "arrivals are bursty and need a negative-binomial treatment. "
    "The distribution-assumption companion to "
    "`fano_burstiness_by_type` (inter-arrival view) — same "
    "question, count-process view. One day-grained rollup per "
    "type.",
    ("stats", "timeseries", "modeling", "events"),
)
def overdispersion_check_events(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count("*").alias("c"))
    m = daily.groupBy("event_type").agg(
        F.count("*").alias("n_days"),
        F.sum("c").alias("s"),
        F.sum(F.col("c").cast("decimal(20,0)") * F.col("c")).alias("sq"),
    )
    nD = F.col("n_days").cast("double")
    sD = F.col("s").cast("double")
    var = (nD * F.col("sq") - sD * F.col("s")) / (nD * (F.col("n_days") - 1))
    mean = F.col("s") / nD
    r4 = lambda col: F.floor(col * 10000 + F.lit(0.5)) / 10000.0  # noqa: E731
    return m.select(
        "event_type",
        F.col("n_days").cast("long").alias("n_days"),
        F.col("s").cast("long").alias("total_events"),
        r4(mean).alias("mean_daily"),
        r4(var).alias("var_daily"),
        r4(var / mean).alias("dispersion_index"),
        (var / mean > 1.5).alias("overdispersed"),
    )
