"""Round-3 registry additions, batch 10 — Nelson–Aalen cumulative
hazard, uplift by user segment, a watermark-delay lateness audit,
and a Huber robust location (IRLS) estimate.

Same contract as ``registry.py``. Imported at the bottom of
``registry.py``.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import _register, _t


def _r6(col):
    return F.floor(col * 1000000 + F.lit(0.5)) / F.lit(1000000.0)


# ---------------------------------------------------------------------------
# Nelson–Aalen cumulative hazard of time-to-first-purchase
# ---------------------------------------------------------------------------

_NA_HORIZONS = (1, 6, 12, 24, 48, 96, 168)


@_register(
    "nelson_aalen_hazard",
    f"""
    WITH u AS (
      SELECT user_id,
             min(ts) AS t0,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS tp,
             max(ts) AS tmax
      FROM events GROUP BY 1
    ),
    obs AS (
      SELECT user_id,
             tp IS NOT NULL AS d,
             CASE WHEN tp IS NOT NULL
                  THEN date_diff('second', t0, tp) // 3600
                  ELSE date_diff('second', t0, tmax) // 3600 END AS tobs
      FROM u
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM obs),
    at_t AS (SELECT tobs AS t, CAST(count(*) AS BIGINT) AS c
             FROM obs GROUP BY 1),
    cum AS (
      SELECT t, c,
             CAST(coalesce(sum(c) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS less_t
      FROM at_t
    ),
    deaths AS (
      SELECT tobs AS t, CAST(count(*) AS BIGINT) AS dd
      FROM obs WHERE d GROUP BY 1
    ),
    terms AS MATERIALIZED (
      SELECT de.t, de.dd,
             CAST(de.dd AS DOUBLE) / (nn.n - cu.less_t) AS hterm,
             CAST(de.dd AS DOUBLE)
               / ((nn.n - cu.less_t) * CAST(nn.n - cu.less_t AS DOUBLE))
               AS vterm
      FROM deaths de
      JOIN cum cu ON cu.t = de.t
      CROSS JOIN nn
    ),
    hz AS (SELECT unnest([{", ".join(str(h) for h in _NA_HORIZONS)}])
             AS horizon_hours)
    SELECT CAST(hz.horizon_hours AS BIGINT) AS horizon_hours,
           nn.n AS n_users,
           floor(coalesce((SELECT list_reduce(list_prepend(0.0::DOUBLE,
                    list(t2.hterm ORDER BY t2.t)), (a, b) -> a + b)
                  FROM terms t2 WHERE t2.t <= hz.horizon_hours), 0.0)
                 * 1000000 + 0.5) / 1000000.0 AS cum_hazard,
           floor(coalesce((SELECT list_reduce(list_prepend(0.0::DOUBLE,
                    list(t3.vterm ORDER BY t3.t)), (a, b) -> a + b)
                  FROM terms t3 WHERE t3.t <= hz.horizon_hours), 0.0)
                 * 1000000 + 0.5) / 1000000.0 AS hazard_var
    FROM hz CROSS JOIN nn
    """,
    "Nelson–Aalen cumulative hazard of time-to-first-purchase (the "
    "nonparametric hazard companion to `kaplan_meier_conversion`'s "
    "survival product — same at-risk machinery, sum fold instead of "
    "product fold): H(h) = sum over conversion hours <= h of "
    "d_i/n_i plus the standard variance estimator sum d_i/n_i^2, "
    "both folded in event-time order so every double matches the "
    "DuckDB twin bit-for-bit, evaluated at 7 fixed horizons. One "
    "user rollup, then hour-grained (time-span-bounded) arithmetic; "
    "right-censoring at last activity.",
    ("stats", "survival", "events"),
)
def nelson_aalen_hazard(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        F.min("ts").alias("t0"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "tp"
        ),
        F.max("ts").alias("tmax"),
    )
    obs = u.select(
        F.col("tp").isNotNull().alias("d"),
        F.when(
            F.col("tp").isNotNull(),
            F.expr(
                "(CAST(CAST(tp AS TIMESTAMP) AS LONG)"
                " - CAST(CAST(t0 AS TIMESTAMP) AS LONG)) div 3600"
            ),
        )
        .otherwise(
            F.expr(
                "(CAST(CAST(tmax AS TIMESTAMP) AS LONG)"
                " - CAST(CAST(t0 AS TIMESTAMP) AS LONG)) div 3600"
            )
        )
        .alias("tobs"),
    ).localCheckpoint(eager=False)
    nn = obs.agg(F.count("*").alias("n"))
    at_t = obs.groupBy(F.col("tobs").alias("t")).agg(F.count("*").alias("c"))
    wcum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    cum = at_t.select(
        "t", F.coalesce(F.sum("c").over(wcum), F.lit(0)).alias("less_t")
    )
    deaths = obs.filter("d").groupBy(F.col("tobs").alias("t")).agg(
        F.count("*").alias("dd")
    )
    at_risk = F.col("n") - F.col("less_t")
    terms = (
        deaths.join(cum, "t")
        .crossJoin(F.broadcast(nn))
        .select(
            "t",
            "dd",
            (F.col("dd").cast("double") / at_risk).alias("hterm"),
            (
                F.col("dd").cast("double")
                / (at_risk * at_risk.cast("double"))
            ).alias("vterm"),
        )
        .localCheckpoint(eager=False)
    )
    hz = spark.range(0, len(_NA_HORIZONS)).select(
        F.element_at(
            F.array(*[F.lit(h) for h in _NA_HORIZONS]),
            (F.col("id") + 1).cast("int"),
        ).alias("horizon_hours")
    )
    joined = hz.join(
        F.broadcast(terms), F.col("t") <= F.col("horizon_hours"), "left"
    )
    folded = joined.groupBy("horizon_hours").agg(
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("t").isNotNull(),
                        F.struct("t", "hterm"),
                    )
                )
            ),
            F.lit(0.0),
            lambda a, x: a + x["hterm"],
        ).alias("ch"),
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("t").isNotNull(),
                        F.struct("t", "vterm"),
                    )
                )
            ),
            F.lit(0.0),
            lambda a, x: a + x["vterm"],
        ).alias("hv"),
    )
    return folded.crossJoin(F.broadcast(nn)).select(
        F.col("horizon_hours").cast("long").alias("horizon_hours"),
        F.col("n").cast("long").alias("n_users"),
        _r6(F.col("ch")).alias("cum_hazard"),
        _r6(F.col("hv")).alias("hazard_var"),
    )


# ---------------------------------------------------------------------------
# Uplift (treatment-effect difference) by user-activity segment
# ---------------------------------------------------------------------------

@_register(
    "uplift_by_segment_events",
    """
    WITH uc AS (
      SELECT user_id,
             CAST(count(*) AS BIGINT) AS cnt,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS conv
      FROM events GROUP BY 1
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS nu,
                   CAST(sum(cnt) AS BIGINT) AS te FROM uc),
    u AS (
      SELECT CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1)
                       IN ('0','1','2','3','4','5','6','7')
                  THEN 'A' ELSE 'B' END AS grp,
             -- mean-relative activity terciles in pure integers:
             -- heavy if cnt >= 1.25x mean, light if <= 0.75x mean
             CASE WHEN 4 * cnt * tot.nu >= 5 * tot.te THEN 'heavy'
                  WHEN 4 * cnt * tot.nu <= 3 * tot.te THEN 'light'
                  ELSE 'medium' END AS segment,
             conv
      FROM uc CROSS JOIN tot
    ),
    g AS (
      SELECT segment,
             CAST(count(*) FILTER (WHERE grp = 'A') AS BIGINT) AS na,
             CAST(coalesce(sum(conv) FILTER (WHERE grp = 'A'), 0) AS BIGINT) AS xa,
             CAST(count(*) FILTER (WHERE grp = 'B') AS BIGINT) AS nb,
             CAST(coalesce(sum(conv) FILTER (WHERE grp = 'B'), 0) AS BIGINT) AS xb
      FROM u GROUP BY 1
    )
    SELECT segment, na AS n_treat, xa AS conv_treat,
           nb AS n_ctrl, xb AS conv_ctrl,
           CASE WHEN na > 0 THEN
             floor(xa / CAST(na AS DOUBLE) * 1000000 + 0.5) / 1000000.0
           END AS rate_treat,
           CASE WHEN nb > 0 THEN
             floor(xb / CAST(nb AS DOUBLE) * 1000000 + 0.5) / 1000000.0
           END AS rate_ctrl,
           CASE WHEN na > 0 AND nb > 0 THEN
             floor((xa / CAST(na AS DOUBLE) - xb / CAST(nb AS DOUBLE))
                   * 1000000 + 0.5) / 1000000.0
           END AS uplift
    FROM g
    """,
    "Uplift (conditional average treatment effect) by user-activity "
    "segment: the md5 50/50 cohorts of `two_proportion_ztest_ab` "
    "become treatment/control, users stratify into light/medium/"
    "heavy activity segments, and each segment reports conversion "
    "rates and their difference — the heterogeneous-treatment-"
    "effect readout that tells you WHO the feature moved, not just "
    "whether it moved the average; segments are mean-relative integer "
    "thresholds so they exist at every SF (the T-learner counterpart of "
    "`cuped_adjusted_ab_events`'s variance reduction and "
    "`diff_in_diff_ab_events`'s time dimension). One user rollup, "
    "one 3-row segment aggregate; all counts exact integers, every "
    "division pinned.",
    ("ml-eval", "ab-test", "uplift", "events"),
)
def uplift_by_segment_events(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    grp = F.when(
        F.substring(
            F.md5(F.col("user_id").cast("string").cast("binary")), 1, 1
        ).isin(*"01234567"),
        F.lit("A"),
    ).otherwise(F.lit("B"))
    uc = e.groupBy("user_id").agg(
        F.count("*").alias("cnt"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("conv"),
    )
    tot = uc.agg(
        F.count("*").alias("nu"), F.sum("cnt").alias("te")
    )
    u = uc.crossJoin(F.broadcast(tot)).select(
        grp.alias("grp"),
        F.when(
            4 * F.col("cnt") * F.col("nu") >= 5 * F.col("te"), "heavy"
        )
        .when(4 * F.col("cnt") * F.col("nu") <= 3 * F.col("te"), "light")
        .otherwise("medium")
        .alias("segment"),
        "conv",
    )
    isa = F.col("grp") == "A"
    g = u.groupBy("segment").agg(
        F.sum(F.when(isa, 1).otherwise(0)).alias("na"),
        F.sum(F.when(isa, F.col("conv")).otherwise(0)).alias("xa"),
        F.sum(F.when(~isa, 1).otherwise(0)).alias("nb"),
        F.sum(F.when(~isa, F.col("conv")).otherwise(0)).alias("xb"),
    )
    ra = F.col("xa") / F.col("na").cast("double")
    rb = F.col("xb") / F.col("nb").cast("double")
    return g.select(
        "segment",
        F.col("na").cast("long").alias("n_treat"),
        F.col("xa").cast("long").alias("conv_treat"),
        F.col("nb").cast("long").alias("n_ctrl"),
        F.col("xb").cast("long").alias("conv_ctrl"),
        F.when(F.col("na") > 0, _r6(ra)).alias("rate_treat"),
        F.when(F.col("nb") > 0, _r6(rb)).alias("rate_ctrl"),
        F.when((F.col("na") > 0) & (F.col("nb") > 0), _r6(ra - rb)).alias(
            "uplift"
        ),
    )


# ---------------------------------------------------------------------------
# Watermark-delay audit: events that would be dropped per delay candidate
# ---------------------------------------------------------------------------

_WM_DELAYS = (60, 300, 900, 3600)


@_register(
    "watermark_delay_audit_events",
    f"""
    WITH ordered AS (
      SELECT user_id,
             CAST(ts AS TIMESTAMP) AS ts,
             max(CAST(ts AS TIMESTAMP)) OVER (
               PARTITION BY user_id ORDER BY event_id
               ROWS UNBOUNDED PRECEDING) AS high_water
      FROM events
    ),
    late AS (
      SELECT date_diff('second', ts, high_water) AS lateness
      FROM ordered
    ),
    delays AS (SELECT unnest([{", ".join(str(d) for d in _WM_DELAYS)}])
                 AS delay_s),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_events FROM late)
    SELECT CAST(d.delay_s AS BIGINT) AS delay_s,
           t.n_events,
           CAST(coalesce(sum(CASE WHEN l.lateness > d.delay_s
                                  THEN 1 ELSE 0 END), 0) AS BIGINT)
             AS n_dropped,
           CAST(coalesce(sum(CASE WHEN l.lateness > d.delay_s
                                  THEN 1 ELSE 0 END), 0) * 1000000
                // t.n_events AS BIGINT) AS dropped_ppm
    FROM delays d
    CROSS JOIN tot t
    CROSS JOIN late l
    GROUP BY 1, 2
    """,
    "Watermark-delay audit — the measurement that PICKS the "
    "withWatermark() delay instead of guessing it: per user stream "
    "(event_id as arrival order), an event's lateness is how far "
    "the user's running event-time high-water mark has already "
    "passed it; for each candidate delay (1m/5m/15m/1h) the audit "
    "counts events a stateful operator would drop, in ppm. This is "
    "the data-driven answer to the reference's missing-watermark "
    "bug (SURVEY T3): the per-user window shuffles once on user_id "
    "and the delay sweep is a 4-literal broadcast over the "
    "lateness distribution. Exact integer second arithmetic.",
    ("streaming", "watermark", "audit", "events"),
)
def watermark_delay_audit_events(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ordered = e.select(
        F.col("ts").cast("timestamp").alias("tts"),
        F.max(F.col("ts").cast("timestamp")).over(w).alias("high_water"),
    )
    late = ordered.select(
        (
            F.col("high_water").cast("long") - F.col("tts").cast("long")
        ).alias("lateness")
    )
    counts = late.agg(
        F.count("*").alias("n_events"),
        *[
            F.sum(F.when(F.col("lateness") > d, 1).otherwise(0)).alias(
                f"d{d}"
            )
            for d in _WM_DELAYS
        ],
    ).localCheckpoint(eager=False)  # one windowed scan feeds all 4 rows
    out = None
    for d in _WM_DELAYS:
        one = counts.select(
            F.lit(d).cast("long").alias("delay_s"),
            F.col("n_events").cast("long").alias("n_events"),
            F.col(f"d{d}").cast("long").alias("n_dropped"),
            F.expr(f"d{d} * 1000000 div n_events").cast("long").alias(
                "dropped_ppm"
            ),
        )
        out = one if out is None else out.unionAll(one)
    return out


# ---------------------------------------------------------------------------
# Huber robust location of daily revenue via 4 unrolled IRLS passes
# ---------------------------------------------------------------------------

_HUBER_ITERS = 4
_HUBER_C = 1.345


def _huber_layer_sql(i: int) -> str:
    """One IRLS pass: weighted mean with w = min(1, c/|x - m|). Two
    CTE layers (fold, then divide) — DuckDB's binder rejects the
    fold inside a correlated scalar subquery."""
    return f"""
    f{i} AS (
      SELECT vals, n, s, c,
             list_reduce(
               list_prepend([0.0::DOUBLE, 0.0::DOUBLE],
                 list_transform(vals, v -> [
                   CASE WHEN abs(v - m{i}) <= c THEN 1.0::DOUBLE
                        ELSE c / abs(v - m{i}) END,
                   CASE WHEN abs(v - m{i}) <= c THEN v
                        ELSE (c / abs(v - m{i})) * v END])),
               (a, x) -> [a[1] + x[1], a[2] + x[2]]) AS fx
      FROM it{i}
    ),
    it{i + 1} AS (
      SELECT vals, n, s, c, fx[2] / fx[1] AS m{i + 1} FROM f{i}
    )"""


@_register(
    "huber_location_daily_revenue",
    f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(floor(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                        / 100000) AS BIGINT) AS rev
      FROM orders GROUP BY 1
    ),
    agg AS (
      SELECT list(CAST(rev AS DOUBLE) ORDER BY day) AS vals,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(rev) AS BIGINT) AS sm,
             CAST(sum(rev * rev) AS BIGINT) AS sq
      FROM daily
    ),
    it0 AS (
      SELECT vals, n,
             sqrt((CAST(n AS DOUBLE) * sq - CAST(sm AS DOUBLE) * sm)
                  / (CAST(n AS DOUBLE) * n)) AS s,
             {_HUBER_C!r} * sqrt((CAST(n AS DOUBLE) * sq
                  - CAST(sm AS DOUBLE) * sm) / (CAST(n AS DOUBLE) * n))
               AS c,
             CAST(sm AS DOUBLE) / n AS m0
      FROM agg
    ),
    {",".join(_huber_layer_sql(i) for i in range(_HUBER_ITERS))}
    SELECT n AS n_days,
           floor(CAST((SELECT sm FROM agg) AS DOUBLE)
                 / n * 10000 + 0.5) / 10000.0 AS mean_kd,
           floor(s * 10000 + 0.5) / 10000.0 AS scale_kd,
           floor(m{_HUBER_ITERS} * 10000 + 0.5) / 10000.0
             AS huber_location_kd
    FROM it{_HUBER_ITERS}
    """,
    "Huber M-estimator of daily-revenue location via "
    f"{_HUBER_ITERS} unrolled IRLS passes (tuning constant "
    f"{_HUBER_C} x sigma from exact integer moments, start = mean): "
    "each pass is a weighted mean with w = min(1, c/|x-m|), run as "
    "an in-row fold over the day-ordered series so the two weighted "
    "sums accumulate in the identical order in both engines — the "
    "robust-location companion to `trimmed_mean_price_by_priority` "
    "/ `winsorize_bounds_lineitem` (which clip by rank; Huber "
    "downweights smoothly and is the textbook bridge between mean "
    "and median). Series units are kilodollars so the exact moment "
    "sums stay in int64 at any SF. Days-sized rollup, zero extra "
    "shuffle.",
    ("stats", "robust", "recurrence", "orders"),
)
def huber_location_daily_revenue(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.floor(
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")) / 100000
        )
        .cast("long")
        .alias("rev")
    )
    agg = daily.agg(
        F.array_sort(
            F.collect_list(F.struct("day", F.col("rev").cast("double").alias("v")))
        ).alias("seq"),
        F.count("*").alias("n"),
        F.sum("rev").alias("sm"),
        F.sum(F.col("rev").cast("decimal(20,0)") * F.col("rev")).alias("sq"),
    )
    vals = F.transform(F.col("seq"), lambda x: x["v"])
    nD = F.col("n").cast("double")
    s = F.sqrt((nD * F.col("sq") - F.col("sm").cast("double") * F.col("sm")) / (nD * F.col("n")))
    c = F.lit(_HUBER_C) * s
    base = agg.select(
        "n",
        F.col("sm").alias("sm"),
        vals.alias("vals"),
        s.alias("s"),
        c.alias("c"),
        (F.col("sm").cast("double") / F.col("n")).alias("m0"),
    )
    def make_step(m, cc):
        # closure factory: a default-arg lambda would present extra
        # params to Spark's higher-order-function arity check
        def step(a, x):
            r = F.abs(x - m)
            w = F.when(r <= cc, F.lit(1.0)).otherwise(cc / r)
            wx = F.when(r <= cc, x).otherwise((cc / r) * x)
            return F.struct(
                (a["sw"] + w).alias("sw"), (a["swx"] + wx).alias("swx")
            )

        return step

    cur = base
    for i in range(_HUBER_ITERS):
        folded = F.aggregate(
            F.col("vals"),
            F.struct(F.lit(0.0).alias("sw"), F.lit(0.0).alias("swx")),
            make_step(F.col(f"m{i}"), F.col("c")),
        )
        cur = cur.withColumn(f"m{i + 1}", folded["swx"] / folded["sw"])
    r4 = lambda col: F.floor(col * 10000 + F.lit(0.5)) / F.lit(10000.0)  # noqa: E731
    return cur.select(
        F.col("n").cast("long").alias("n_days"),
        r4(F.col("sm").cast("double") / F.col("n")).alias("mean_kd"),
        r4(F.col("s")).alias("scale_kd"),
        r4(F.col(f"m{_HUBER_ITERS}")).alias("huber_location_kd"),
    )
