"""Round-3 registry additions, batch 34 — hierarchical forecast
reconciliation, a churn-definition sweep, and an event-type lift
matrix.

Same contract as ``registry.py``. Imported at the bottom of
``registry.py``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import _register, _t

# ---------------------------------------------------------------------------
# Hierarchical forecast reconciliation: nations under regions
# ---------------------------------------------------------------------------

_HR_ALPHA = 0.3


def _hr_ewma_sql(val: str) -> str:
    return (
        f"list_reduce({val}, (acc, x) -> acc * {1.0 - _HR_ALPHA}::DOUBLE"
        f" + x * {_HR_ALPHA}::DOUBLE)"
    )


@_register(
    "hierarchical_forecast_reconciliation",
    f"""
    WITH nat_daily AS (
      SELECT n.n_regionkey AS rkey, n.n_nationkey AS nkey,
             n.n_name AS nation, r.r_name AS region,
             CAST(o.o_orderdate AS DATE) AS day,
             CAST(CAST(sum(CAST(floor(o.o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS DOUBLE) AS rev
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      GROUP BY 1, 2, 3, 4, 5
    ),
    nat_fc AS MATERIALIZED (
      SELECT rkey, nkey, nation, region,
             {_hr_ewma_sql("list(rev ORDER BY day)")} AS base_fc,
             CAST(sum(CAST(rev AS BIGINT)) AS BIGINT) AS hist_rev
      FROM nat_daily GROUP BY 1, 2, 3, 4
    ),
    reg_daily AS (
      SELECT rkey, day, CAST(sum(CAST(rev AS BIGINT)) AS DOUBLE) AS rev
      FROM nat_daily GROUP BY 1, 2
    ),
    reg_fc AS MATERIALIZED (
      SELECT rkey, {_hr_ewma_sql("list(rev ORDER BY day)")} AS region_fc
      FROM reg_daily GROUP BY 1
    ),
    reg_tot AS (
      SELECT rkey, CAST(sum(hist_rev) AS BIGINT) AS reg_hist,
             list_reduce(list_prepend(0.0::DOUBLE,
               list(base_fc ORDER BY nkey)), (a, b) -> a + b)
               AS bottom_up_sum
      FROM nat_fc GROUP BY 1
    )
    SELECT f.region, f.nation,
           floor(f.base_fc * 100 + 0.5) / 100.0 AS base_forecast,
           floor(r.region_fc * (f.hist_rev / CAST(t.reg_hist AS DOUBLE))
                 * 100 + 0.5) / 100.0 AS top_down_forecast,
           floor(r.region_fc * 100 + 0.5) / 100.0 AS region_forecast,
           floor(t.bottom_up_sum * 100 + 0.5) / 100.0
             AS bottom_up_region_sum,
           floor((t.bottom_up_sum - r.region_fc) * 100 + 0.5) / 100.0
             AS coherence_gap
    FROM nat_fc f
    JOIN reg_fc r ON r.rkey = f.rkey
    JOIN reg_tot t ON t.rkey = f.rkey
    """,
    "Hierarchical forecast reconciliation (nations roll up to "
    "regions): per-nation EWMA forecasts of daily revenue, the "
    "independently-forecast region series, and the two classic "
    "reconciliations side by side — TOP-DOWN (region forecast "
    "split by exact historical revenue shares) and BOTTOM-UP "
    "(nation-ordered fold of base forecasts), with the coherence "
    "gap that motivates reconciliation in the first place: "
    "independently-fit forecasts DON'T add up, and a planning org "
    "needs one number per level. Every fold day- or "
    "nation-ordered, every share an exact integer ratio — "
    "bit-identical across engines. Grid-sized after one fact "
    "rollup; the hierarchy completion of the forecasting family.",
    ("timeseries", "forecast", "hierarchy", "orders"),
)
def hierarchical_forecast_reconciliation(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    nat_daily = (
        o.join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey"))
        .groupBy(
            F.col("n_regionkey").alias("rkey"),
            F.col("n_nationkey").alias("nkey"),
            F.col("n_name").alias("nation"),
            F.col("r_name").alias("region"),
            F.col("o_orderdate").cast("date").alias("day"),
        )
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
            .cast("double")
            .alias("rev")
        )
        .localCheckpoint(eager=False)
    )

    def ewma_fold(sorted_vals):
        first = F.element_at(sorted_vals, 1)
        rest = F.slice(
            sorted_vals, 2, F.greatest(F.size(sorted_vals) - 1, F.lit(0))
        )
        return F.aggregate(
            rest,
            first,
            lambda acc, x: acc * (1.0 - _HR_ALPHA) + x * _HR_ALPHA,
        )

    nat_fc = (
        nat_daily.groupBy("rkey", "nkey", "nation", "region")
        .agg(
            F.array_sort(F.collect_list(F.struct("day", "rev"))).alias("s"),
            F.sum(F.col("rev").cast("long")).alias("hist_rev"),
        )
        .select(
            "rkey",
            "nkey",
            "nation",
            "region",
            ewma_fold(F.transform(F.col("s"), lambda x: x["rev"])).alias(
                "base_fc"
            ),
            "hist_rev",
        )
        .localCheckpoint(eager=False)
    )
    reg_daily = nat_daily.groupBy("rkey", "day").agg(
        F.sum(F.col("rev").cast("long")).cast("double").alias("rev")
    )
    reg_fc = reg_daily.groupBy("rkey").agg(
        F.array_sort(F.collect_list(F.struct("day", "rev"))).alias("s")
    ).select(
        "rkey",
        ewma_fold(F.transform(F.col("s"), lambda x: x["rev"])).alias(
            "region_fc"
        ),
    )
    reg_tot = nat_fc.groupBy("rkey").agg(
        F.sum("hist_rev").alias("reg_hist"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("nkey", "base_fc"))),
            F.lit(0.0),
            lambda a, x: a + x["base_fc"],
        ).alias("bottom_up_sum"),
    )
    r2 = lambda col: F.floor(col * 100 + F.lit(0.5)) / 100.0  # noqa: E731
    return (
        nat_fc.join(F.broadcast(reg_fc), "rkey")
        .join(F.broadcast(reg_tot), "rkey")
        .select(
            "region",
            "nation",
            r2(F.col("base_fc")).alias("base_forecast"),
            r2(
                F.col("region_fc")
                * (F.col("hist_rev") / F.col("reg_hist").cast("double"))
            ).alias("top_down_forecast"),
            r2(F.col("region_fc")).alias("region_forecast"),
            r2(F.col("bottom_up_sum")).alias("bottom_up_region_sum"),
            r2(F.col("bottom_up_sum") - F.col("region_fc")).alias(
                "coherence_gap"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Churn definition sweep: inactivity thresholds 7/14/30 days
# ---------------------------------------------------------------------------

_CHURN_DAYS = (7, 14, 30)


@_register(
    "churn_definition_sweep",
    f"""
    WITH wm AS (SELECT max(CAST(ts AS TIMESTAMP)) AS mx FROM events),
    last_seen AS (
      SELECT user_id, max(CAST(ts AS TIMESTAMP)) AS last_ts
      FROM events GROUP BY 1
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_users FROM last_seen)
    {" UNION ALL ".join(
        f'''SELECT {d} AS inactivity_days, t.n_users,
           CAST(sum(CASE WHEN l.last_ts < w.mx - INTERVAL {d} DAY
                         THEN 1 ELSE 0 END) AS BIGINT) AS churned,
           CAST(sum(CASE WHEN l.last_ts < w.mx - INTERVAL {d} DAY
                         THEN 1 ELSE 0 END) * 1000000 // t.n_users
                AS BIGINT) AS churn_ppm
        FROM last_seen l CROSS JOIN wm w CROSS JOIN tot t
        GROUP BY t.n_users'''
        for d in _CHURN_DAYS)}
    """,
    "Churn-definition sweep: the share of users inactive for "
    "7/14/30 days relative to the corpus watermark — three "
    "candidate operational definitions side by side, because the "
    "choice CHANGES the number the business tracks and the sweep "
    "shows how sensitive it is (a steep gradient means the "
    "definition is doing the work, not the users). Anchored to "
    "max event time for fixture reproducibility (production swaps "
    "now()); one user rollup, exact integer counts. The "
    "definition-selection companion to `dau_mau_stickiness` / "
    "`cohort_retention_events`.",
    ("bi", "churn", "events"),
)
def churn_definition_sweep(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    last_seen = e.groupBy("user_id").agg(
        F.max(F.col("ts").cast("timestamp")).alias("last_ts")
    ).localCheckpoint(eager=False)
    wm = last_seen.agg(F.max("last_ts").alias("mx"))
    tot = last_seen.agg(F.count("*").alias("n_users"))
    out = None
    for d in _CHURN_DAYS:
        one = (
            last_seen.crossJoin(F.broadcast(wm))
            .crossJoin(F.broadcast(tot))
            .agg(
                F.max("n_users").alias("n_users"),
                F.sum(
                    F.when(
                        F.col("last_ts")
                        < F.col("mx") - F.expr(f"INTERVAL {d} DAY"),
                        1,
                    ).otherwise(0)
                ).alias("churned"),
            )
            .select(
                F.lit(d).alias("inactivity_days"),
                F.col("n_users").cast("long").alias("n_users"),
                F.col("churned").cast("long").alias("churned"),
                F.expr("churned * 1000000 div n_users")
                .cast("long")
                .alias("churn_ppm"),
            )
        )
        out = one if out is None else out.unionAll(one)
    return out


# ---------------------------------------------------------------------------
# Event-type lift matrix: association strength within user histories
# ---------------------------------------------------------------------------


@_register(
    "event_type_lift_matrix",
    """
    WITH u AS (
      SELECT user_id, event_type FROM events GROUP BY 1, 2
    ),
    tot AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n FROM u),
    singles AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS c FROM u GROUP BY 1
    ),
    pairs AS (
      SELECT a.event_type AS ta, b.event_type AS tb,
             CAST(count(*) AS BIGINT) AS c_ab
      FROM u a JOIN u b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT p.ta AS type_a, p.tb AS type_b, p.c_ab AS n_both,
           sa.c AS n_a, sb.c AS n_b,
           floor(p.c_ab * CAST(t.n AS DOUBLE) / (sa.c * CAST(sb.c AS DOUBLE))
                 * 1000000 + 0.5) / 1000000.0 AS lift
    FROM pairs p
    JOIN singles sa ON sa.event_type = p.ta
    JOIN singles sb ON sb.event_type = p.tb
    CROSS JOIN tot t
    """,
    "Event-type lift matrix: for every pair of event types, "
    "P(both)/P(a)P(b) over user histories — lift > 1 means the "
    "behaviors co-occur beyond chance (signup+purchase), < 1 "
    "means substitution (error vs purchase), from exact "
    "distinct-user counts with one pinned division. The "
    "behavioral-association companion to `market_basket_pairs` "
    "(items) and `audience_overlap_event_types` (raw overlap "
    "counts — lift adds the independence baseline that makes "
    "overlap interpretable). User-keyed pair join bounded by 5 "
    "types per user.",
    ("stats", "association", "events"),
)
def event_type_lift_matrix(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    u = e.select("user_id", "event_type").distinct().localCheckpoint(
        eager=False
    )
    tot = u.agg(F.countDistinct("user_id").alias("n"))
    singles = u.groupBy("event_type").agg(F.count("*").alias("c"))
    a = u.select(F.col("user_id").alias("uid"), F.col("event_type").alias("ta"))
    b = u.select(F.col("user_id").alias("uid"), F.col("event_type").alias("tb"))
    pairs = (
        a.join(b, "uid")
        .filter(F.col("ta") < F.col("tb"))
        .groupBy("ta", "tb")
        .agg(F.count("*").alias("c_ab"))
    )
    return (
        pairs.join(
            F.broadcast(
                singles.select(
                    F.col("event_type").alias("ta"), F.col("c").alias("n_a")
                )
            ),
            "ta",
        )
        .join(
            F.broadcast(
                singles.select(
                    F.col("event_type").alias("tb"), F.col("c").alias("n_b")
                )
            ),
            "tb",
        )
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("ta").alias("type_a"),
            F.col("tb").alias("type_b"),
            F.col("c_ab").cast("long").alias("n_both"),
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            (
                F.floor(
                    F.col("c_ab")
                    * F.col("n").cast("double")
                    / (F.col("n_a") * F.col("n_b").cast("double"))
                    * 1000000
                    + F.lit(0.5)
                )
                / 1000000.0
            ).alias("lift"),
        )
    )
