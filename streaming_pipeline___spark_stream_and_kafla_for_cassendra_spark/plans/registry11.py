"""Round-2 (cont.) registry addition — Neyman optimal stratified
sample allocation.

Same contract as ``registry.py``. Imported at the bottom of
``registry.py``.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import _register, _t

_NEYMAN_N = 1000


@_register(
    "neyman_allocation_events",
    f"""
    WITH s AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS s1,
             CAST(sum(CAST(floor(value * 100) AS BIGINT)
                      * CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS s2
      FROM events WHERE value IS NOT NULL
      GROUP BY 1
    ),
    w AS (
      SELECT event_type, n,
             sqrt((s2 - s1 * (s1 / CAST(n AS DOUBLE))) / (n - 1)) AS sd,
             n * sqrt((s2 - s1 * (s1 / CAST(n AS DOUBLE))) / (n - 1)) AS wt
      FROM s WHERE n > 1
    ),
    tot AS (
      SELECT list_reduce(list_prepend(0.0, list(wt ORDER BY event_type)),
                         (a, x) -> a + x) AS big_w
      FROM w
    ),
    q AS (
      SELECT event_type, n, sd, wt,
             floor({_NEYMAN_N} * wt / t.big_w) AS fu,
             {_NEYMAN_N} * wt / t.big_w - floor({_NEYMAN_N} * wt / t.big_w)
               AS rem
      FROM w CROSS JOIN tot t
    ),
    ranked AS (
      SELECT *,
             row_number() OVER (ORDER BY rem DESC, event_type ASC) AS rk,
             CAST({_NEYMAN_N} - sum(fu) OVER () AS BIGINT) AS leftover
      FROM q
    )
    SELECT event_type,
           n AS stratum_size,
           floor(sd * 10000 + 0.5) / 10000.0 AS sd_cents,
           CAST(fu + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
             AS n_sample
    FROM ranked
    """,
    "Neyman optimal allocation for a stratified sample of "
    f"{_NEYMAN_N}: each event-type stratum gets n_h ∝ N_h·σ_h "
    "(minimum-variance allocation for estimating the overall mean), "
    "with σ_h from EXACT integer-cent moments and the fractional "
    "quotas settled by the largest-remainder rule so samples sum to "
    "exactly the budget. The Σ N_h·σ_h normalizer folds in "
    "event-type order (the repo's order-pinned float discipline), "
    "making every quota — and therefore the allocation — "
    "bit-deterministic across engines and parallelism. One map-side-"
    "combined scan; everything after is strata-sized. The design-"
    "stage companion to `stratified_sample_events` (which executes a "
    "fixed-rate plan) and `largest_remainder_allocation` (pure "
    "proportional rationing).",
    ("stats", "sampling", "design", "events"),
)
def neyman_allocation_events(spark, sf_dir):
    e = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    cents = F.floor(F.col("value") * 100).cast("long")
    s = (
        e.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(cents).alias("s1"),
            F.sum(cents * cents).alias("s2"),
        )
        .filter(F.col("n") > 1)
    )
    var = (F.col("s2") - F.col("s1") * (F.col("s1") / F.col("n").cast("double"))) / (
        F.col("n") - 1
    )
    w = s.select(
        "event_type",
        "n",
        F.sqrt(var).alias("sd"),
        (F.col("n") * F.sqrt(var)).alias("wt"),
    )
    tot = w.agg(
        F.aggregate(
            F.array_sort(
                F.collect_list(F.struct(F.col("event_type"), F.col("wt").alias("v")))
            ),
            F.lit(0.0),
            lambda a, x: a + x["v"],
        ).alias("big_w")
    )
    quota = F.lit(_NEYMAN_N) * F.col("wt") / F.col("big_w")
    q = w.crossJoin(F.broadcast(tot)).select(
        "event_type",
        "n",
        "sd",
        F.floor(quota).alias("fu"),
        (quota - F.floor(quota)).alias("rem"),
    )
    ranked = q.select(
        "*",
        F.row_number()
        .over(Window.orderBy(F.desc("rem"), F.asc("event_type")))
        .alias("rk"),
        (F.lit(_NEYMAN_N) - F.sum("fu").over(Window.partitionBy())).alias(
            "leftover"
        ),
    )
    r4 = lambda c: F.floor(c * 10000 + F.lit(0.5)) / F.lit(10000.0)  # noqa: E731
    return ranked.select(
        "event_type",
        F.col("n").cast("long").alias("stratum_size"),
        r4(F.col("sd")).alias("sd_cents"),
        (
            F.col("fu")
            + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_sample"),
    )
