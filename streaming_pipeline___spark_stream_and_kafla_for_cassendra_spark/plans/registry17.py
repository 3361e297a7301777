"""Round-3 registry additions, batch 4 — completing the attribution
family (linear credit), survival analysis (Kaplan–Meier retention
curve), and a first-digit Benford data-quality audit.

Same contract as ``registry.py``. Imported at the bottom of
``registry.py``.
"""

from __future__ import annotations

import math

from pyspark.sql import Window
from pyspark.sql import functions as F

import os

from .registry import _await_stream, _register, _t


def _r6(col):
    return F.floor(col * 1000000 + F.lit(0.5)) / F.lit(1000000.0)


_ATTR_WINDOW_DAYS = 7


@_register(
    "attribution_linear",
    f"""
    WITH purchases AS (
      SELECT event_id AS pid, user_id, ts AS pts
      FROM events WHERE event_type = 'purchase'
    ),
    touches AS (
      SELECT p.pid, e.event_type AS channel,
             row_number() OVER (PARTITION BY p.pid
                                ORDER BY e.ts, e.event_id) AS pos,
             count(*) OVER (PARTITION BY p.pid) AS k
      FROM purchases p
      JOIN events e
        ON e.user_id = p.user_id
       AND e.event_type IN ('view', 'click')
       AND e.ts < p.pts
       AND e.ts >= p.pts - INTERVAL {_ATTR_WINDOW_DAYS} DAY
    ),
    credited AS (
      SELECT channel,
             CAST(1000000 // k AS BIGINT)
               + CASE WHEN pos = 1 THEN CAST(1000000 % k AS BIGINT)
                      ELSE 0 END AS micro
      FROM touches
    )
    SELECT channel,
           CAST(count(*) AS BIGINT) AS n_touches,
           CAST(sum(micro) AS BIGINT) AS credit_micro
    FROM credited GROUP BY channel
    """,
    "Linear (even-split) attribution completing the last-touch / "
    "position-based family: every view/click inside the 7-day "
    "pre-purchase window shares the conversion credit equally in "
    "exact integer micro-credits (floor division, remainder to the "
    "first touch — credits per purchase sum to exactly 1,000,000, "
    "no float drift). Purchase-keyed window over bounded per-user "
    "touch fan-out, then one channel aggregate",
    ("join", "attribution", "events"),
)
def attribution_linear(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"), "user_id", F.col("ts").alias("pts")
    )
    touches_raw = purchases.join(
        e.filter(F.col("event_type").isin("view", "click")).select(
            F.col("user_id").alias("tu"),
            F.col("event_type").alias("channel"),
            F.col("ts").alias("tts"),
            F.col("event_id").alias("tid"),
        ),
        (F.col("tu") == F.col("user_id"))
        & (F.col("tts") < F.col("pts"))
        & (
            F.col("tts")
            >= F.col("pts") - F.expr(f"INTERVAL {_ATTR_WINDOW_DAYS} DAY")
        ),
    )
    w = Window.partitionBy("pid").orderBy("tts", "tid")
    wc = Window.partitionBy("pid")
    credited = touches_raw.select(
        "channel",
        F.row_number().over(w).alias("pos"),
        F.count("*").over(wc).alias("k"),
    ).select(
        "channel",
        (
            F.expr("1000000 div k").cast("long")
            + F.when(F.col("pos") == 1, (F.lit(1000000) % F.col("k")).cast("long"))
            .otherwise(F.lit(0))
        ).alias("micro"),
    )
    return credited.groupBy("channel").agg(
        F.count("*").alias("n_touches"),
        F.sum("micro").alias("credit_micro"),
    )


_KM_HORIZONS = (1, 6, 12, 24, 48, 96, 168)


@_register(
    "kaplan_meier_conversion",
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
    terms AS (
      SELECT de.t, de.dd,
             1.0::DOUBLE - CAST(de.dd AS DOUBLE) / (nn.n - cu.less_t)
               AS term
      FROM deaths de
      JOIN cum cu ON cu.t = de.t
      CROSS JOIN nn
    ),
    hz AS (SELECT unnest([{", ".join(str(h) for h in _KM_HORIZONS)}])
             AS horizon_hours)
    SELECT CAST(hz.horizon_hours AS BIGINT) AS horizon_hours,
           nn.n AS n_users,
           CAST(coalesce((SELECT sum(t2.dd) FROM terms t2
                          WHERE t2.t <= hz.horizon_hours), 0) AS BIGINT)
             AS n_converted_by_h,
           floor(coalesce((SELECT list_reduce(list_prepend(1.0::DOUBLE,
                    list(t3.term ORDER BY t3.t)), (a, b) -> a * b)
                  FROM terms t3 WHERE t3.t <= hz.horizon_hours), 1.0)
                 * 1000000 + 0.5) / 1000000.0 AS survival
    FROM hz CROSS JOIN nn
    """,
    "Kaplan–Meier time-to-first-purchase curve: per user, hours from "
    "first event to first purchase (event) or to last activity "
    "(right-censored); S(h) = Π over conversion hours ≤ h of "
    "(1 − d_i/n_i) with the standard at-risk convention, evaluated "
    "at 7 fixed horizons. Every d_i/n_i is an exact integer ratio "
    "and each product folds in event-time order (F.aggregate ≡ "
    "list_reduce), so the curve bit-matches DuckDB. The survival "
    "companion to the logrank A/B test and conversion-CDF "
    "operators; plan: one user rollup, then hour-grained "
    "(constant-bounded) arithmetic",
    ("stats", "survival", "retention", "events"),
)
def kaplan_meier_conversion(spark, sf_dir):
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
    # hour-grained table: cardinality bounded by the corpus time span
    # in hours, never by rows — the window here is constant-sized
    wcum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    cum = at_t.select(
        "t", F.coalesce(F.sum("c").over(wcum), F.lit(0)).alias("less_t")
    )
    deaths = (
        obs.filter("d").groupBy(F.col("tobs").alias("t")).agg(
            F.count("*").alias("dd")
        )
    )
    terms = (
        deaths.join(cum, "t")
        .crossJoin(F.broadcast(nn))
        .select(
            "t",
            "dd",
            (
                F.lit(1.0)
                - F.col("dd").cast("double") / (F.col("n") - F.col("less_t"))
            ).alias("term"),
        )
    )
    hz = spark.createDataFrame(
        [(h,) for h in _KM_HORIZONS], "horizon_hours long"
    )
    joined = hz.join(
        terms, terms.t <= hz.horizon_hours, "left"
    ).groupBy("horizon_hours").agg(
        F.sum("dd").alias("n_conv"),
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("t").isNotNull(),
                        F.struct("t", "term"),
                    )
                )
            ),
            F.lit(1.0),
            lambda a, x: a * x["term"],
        ).alias("surv"),
    )
    return joined.crossJoin(F.broadcast(nn)).select(
        "horizon_hours",
        F.col("n").cast("long").alias("n_users"),
        F.coalesce(F.col("n_conv"), F.lit(0)).cast("long").alias(
            "n_converted_by_h"
        ),
        _r6(F.coalesce(F.col("surv"), F.lit(1.0))).alias("survival"),
    )


def _benford_oracle() -> str:
    """Benford shares inlined as full-precision Python literals so
    neither engine's log implementation participates."""
    shares = {d: math.log10(1 + 1 / d) for d in range(1, 10)}
    share_rows = ", ".join(
        f"({d}, CAST({repr(p)} AS DOUBLE))" for d, p in shares.items()
    )
    return f"""
    WITH cents AS (
      SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS c
      FROM orders WHERE o_totalprice > 0
    ),
    digits AS (
      SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS INTEGER) AS digit
      FROM cents
    ),
    obs AS (SELECT digit, CAST(count(*) AS BIGINT) AS n
            FROM digits GROUP BY 1),
    exp_ AS (SELECT * FROM (VALUES {share_rows}) AS t(digit, p)),
    nn AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM obs),
    cells AS (
      SELECT e.digit, coalesce(o.n, 0) AS n, e.p,
             (coalesce(o.n, 0) - nn.total * e.p)
             * (coalesce(o.n, 0) - nn.total * e.p)
             / (nn.total * e.p) AS term
      FROM exp_ e LEFT JOIN obs o ON o.digit = e.digit CROSS JOIN nn
    ),
    chi AS (SELECT list_reduce(list_prepend(0.0::DOUBLE,
              list(term ORDER BY digit)), (a, b) -> a + b) AS chi2
            FROM cells)
    SELECT c.digit, CAST(c.n AS BIGINT) AS n_orders,
           floor(c.n / CAST(nn.total AS DOUBLE) * 1000000 + 0.5)
             / 1000000.0 AS observed_share,
           floor(c.p * 1000000 + 0.5) / 1000000.0 AS benford_share,
           floor(chi.chi2 * 10000 + 0.5) / 10000.0 AS chi2
    FROM cells c CROSS JOIN nn CROSS JOIN chi
    """


@_register(
    "benford_chi2_orders",
    _benford_oracle(),
    "Benford's-law first-significant-digit audit of order totals "
    "with the chi-square deviation statistic (the existing benford_"
    "first_digit_orders reports per-digit deviations; THIS adds the "
    "single-number test) — "
    "the fraud/synthetic-data screen: digit frequencies of the "
    "integer-cent amounts vs log10(1+1/d) expectations plus the χ² "
    "deviation statistic. The first digit comes from integer-to-"
    "string conversion (exact in both engines — no cross-engine "
    "log10 of data), the Benford constants are inlined full-"
    "precision Python literals, and the χ² folds in digit order. "
    "One map-side-combined digit aggregate; 9-row arithmetic after",
    ("quality", "stats", "audit", "orders"),
)
def benford_chi2_orders(spark, sf_dir):
    shares = {d: math.log10(1 + 1 / d) for d in range(1, 10)}
    o = _t(spark, sf_dir, "orders")
    digits = o.filter(F.col("o_totalprice") > 0).select(
        F.substring(
            F.floor(F.col("o_totalprice") * 100).cast("long").cast("string"),
            1,
            1,
        )
        .cast("int")
        .alias("digit")
    )
    obs = digits.groupBy("digit").agg(F.count("*").alias("n"))
    exp_ = spark.createDataFrame(
        [(d, p) for d, p in shares.items()], "digit int, p double"
    )
    nn = obs.agg(F.sum("n").alias("total"))
    cells = (
        exp_.join(obs, "digit", "left")
        .crossJoin(F.broadcast(nn))
        .select(
            "digit",
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
            "p",
            "total",
        )
        .withColumn(
            "term",
            (F.col("n") - F.col("total") * F.col("p"))
            * (F.col("n") - F.col("total") * F.col("p"))
            / (F.col("total") * F.col("p")),
        )
    )
    chi = cells.agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("digit", "term"))),
            F.lit(0.0),
            lambda a, x: a + x["term"],
        ).alias("chi2")
    )
    r4 = lambda c: F.floor(c * 10000 + F.lit(0.5)) / F.lit(10000.0)  # noqa: E731
    return cells.crossJoin(F.broadcast(chi)).select(
        "digit",
        F.col("n").cast("long").alias("n_orders"),
        _r6(F.col("n") / F.col("total").cast("double")).alias(
            "observed_share"
        ),
        _r6(F.col("p")).alias("benford_share"),
        r4(F.col("chi2")).alias("chi2"),
    )


@_register(
    "gdpr_cascade_counts",
    """
    SELECT 'customer' AS table_name, CAST(count(*) AS BIGINT) AS n_rows
    FROM customer WHERE c_custkey % 97 = 0
    UNION ALL
    SELECT 'orders', CAST(count(*) AS BIGINT)
    FROM orders WHERE o_custkey % 97 = 0
    UNION ALL
    SELECT 'lineitem', CAST(count(*) AS BIGINT)
    FROM lineitem l
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_orderkey = l.l_orderkey
                    AND o.o_custkey % 97 = 0)
    """,
    "Right-to-erasure cascade plan (GDPR/CCPA): a deterministic root "
    "set of customers walks the FK graph customer→orders→lineitem "
    "via operators/cascade.py::cascade_plan — one LEFT SEMI join per "
    "table against the parent's key-sized (broadcast) affected keys "
    "— and reports the per-table blast radius. The oracle states "
    "each table's truth as a direct semi-join; cascade_tombstones "
    "then feeds the same frames to the lake's resurrection-blocking "
    "tombstone path (tested in tests/test_round8_ops.py)",
    ("compliance", "cascade", "join", "orders", "lineitem"),
)
def gdpr_cascade_counts(spark, sf_dir):
    from ..operators.cascade import cascade_plan

    tables = {
        "customer": _t(spark, sf_dir, "customer"),
        "orders": _t(spark, sf_dir, "orders"),
        "lineitem": _t(spark, sf_dir, "lineitem"),
    }
    roots = (
        tables["customer"]
        .filter(F.col("c_custkey") % 97 == 0)
        .select("c_custkey")
    )
    plan = cascade_plan(
        tables,
        edges=[
            ("customer", "c_custkey", "orders", "o_custkey"),
            ("orders", "o_orderkey", "lineitem", "l_orderkey"),
        ],
        roots=roots,
        root_table="customer",
        root_key="c_custkey",
    )
    parts = [
        df.agg(F.count("*").alias("n_rows")).select(
            F.lit(name).alias("table_name"), "n_rows"
        )
        for name, df in plan.items()
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@_register(
    "kappa_backfill_rollup_events",
    """
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
           CAST(date_trunc('hour', ts) AS TIMESTAMP) + INTERVAL 1 HOUR
             AS window_end,
           event_type,
           CAST(count(*) AS BIGINT) AS event_count,
           round(sum(value), 4) AS total_value,
           min(value) AS min_value,
           max(value) AS max_value
    FROM events
    GROUP BY 1, 2, 3
    """,
    "Kappa backfill→stream handoff, oracle-proven exactly-once: the "
    "events table splits at a half-open cutover chosen MID-WINDOW "
    "(2024-01-16 00:30) — history folds into the rollup as one "
    "ledgered batch, the stream (availableNow) processes only rows "
    "at/after the cutover, and the materialized table must equal "
    "DuckDB's one-shot batch aggregate: nothing double-counted, "
    "nothing missed, and the straddling half-hour windows are "
    "correct because BOTH sides contribute mergeable partials to "
    "the same rollup row (streaming/rollup.py::backfill_then_stream)",
    ("streaming", "rollup", "backfill", "kappa", "events"),
)
def kappa_backfill_rollup_events(spark, sf_dir):
    import datetime as dt
    import tempfile

    from ..sources.tables import load_events_stream, load_table
    from ..streaming.rollup import RollupTable, backfill_then_stream

    batch = load_table(spark, sf_dir, "events")
    stream = load_events_stream(spark, sf_dir)
    base = tempfile.mkdtemp(prefix="kappa_rollup_")
    table = RollupTable(path=os.path.join(base, "t"), keys=("event_type",))
    cutover = dt.datetime(2024, 1, 16, 0, 30)
    q = backfill_then_stream(
        table,
        history=batch,
        stream=stream,
        cutover=cutover,
        checkpoint_root=os.path.join(base, "ck"),
        available_now=True,
    )
    _await_stream(q, 300)
    return table.read(spark).select(
        "window_start",
        "window_end",
        "event_type",
        F.col("cnt").alias("event_count"),
        F.round("sum_value", 4).alias("total_value"),
        "min_value",
        "max_value",
    )


_ZIPF_K = 500


@_register(
    "zipf_slope_vocab",
    f"""
    WITH tok AS (
      SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                    x -> x <> '')) AS token
      FROM documents
    ),
    tc AS (SELECT token, CAST(count(*) AS BIGINT) AS cnt
           FROM tok GROUP BY 1),
    top AS (
      SELECT token, cnt,
             row_number() OVER (ORDER BY cnt DESC, token ASC) AS rank
      FROM tc
      QUALIFY rank <= {_ZIPF_K}
    ),
    pts AS (
      SELECT rank, ln(CAST(rank AS DOUBLE)) AS x,
             ln(CAST(cnt AS DOUBLE)) AS y
      FROM top
    ),
    sums AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             list_reduce(list_prepend(0.0::DOUBLE, list(x ORDER BY rank)),
                         (a, b) -> a + b) AS sx,
             list_reduce(list_prepend(0.0::DOUBLE, list(y ORDER BY rank)),
                         (a, b) -> a + b) AS sy,
             list_reduce(list_prepend(0.0::DOUBLE, list(x * x ORDER BY rank)),
                         (a, b) -> a + b) AS sxx,
             list_reduce(list_prepend(0.0::DOUBLE, list(x * y ORDER BY rank)),
                         (a, b) -> a + b) AS sxy,
             list_reduce(list_prepend(0.0::DOUBLE, list(y * y ORDER BY rank)),
                         (a, b) -> a + b) AS syy
      FROM pts
    )
    SELECT k,
           floor((k * sxy - sx * sy) / (k * sxx - sx * sx)
                 * 1000000 + 0.5) / 1000000.0 AS zipf_slope,
           floor((sy - (k * sxy - sx * sy) / (k * sxx - sx * sx) * sx) / k
                 * 1000000 + 0.5) / 1000000.0 AS intercept,
           floor((k * sxy - sx * sy) * (k * sxy - sx * sy)
                 / ((k * sxx - sx * sx) * (k * syy - sy * sy))
                 * 1000000 + 0.5) / 1000000.0 AS r2
    FROM sums
    """,
    "Zipf's-law fit over the corpus vocabulary: OLS slope of "
    "ln(frequency) vs ln(rank) for the top-500 tokens (natural "
    "corpora sit near −1; a far-off slope flags synthetic or "
    "degenerate text) with intercept and R². Companion to the Heaps-"
    "law vocab-growth operator. The top-500 selection is a lossless "
    "two-stage top-k; all five OLS sums fold in rank order "
    "(F.aggregate ≡ list_reduce) so the doubles — including ln of "
    "identical integer-derived values — match DuckDB bit-for-bit. "
    "One token aggregate, then 500-row arithmetic",
    ("text", "stats", "zipf", "documents"),
)
def zipf_slope_vocab(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    from ..functions.text import tokens

    tok = d.select(F.explode(tokens(F.col("text"))).alias("token"))
    tc = tok.groupBy("token").agg(F.count("*").alias("cnt"))
    pw = Window.partitionBy("_pid").orderBy(F.desc("cnt"), F.asc("token"))
    gw = Window.orderBy(F.desc("cnt"), F.asc("token"))
    top = (
        tc.withColumn("_pid", F.spark_partition_id())
        .withColumn("_prk", F.row_number().over(pw))
        .filter(F.col("_prk") <= _ZIPF_K)
        .drop("_pid", "_prk")
        .withColumn("rank", F.row_number().over(gw))
        .filter(F.col("rank") <= _ZIPF_K)
    )
    pts = top.select(
        "rank",
        F.log(F.col("rank").cast("double")).alias("x"),
        F.log(F.col("cnt").cast("double")).alias("y"),
    )

    def fold(expr_col):
        return F.aggregate(
            F.array_sort(F.collect_list(F.struct("rank", expr_col.alias("v")))),
            F.lit(0.0),
            lambda a, x: a + x["v"],
        )

    sums = pts.agg(
        F.count("*").alias("k"),
        fold(F.col("x")).alias("sx"),
        fold(F.col("y")).alias("sy"),
        fold(F.col("x") * F.col("x")).alias("sxx"),
        fold(F.col("x") * F.col("y")).alias("sxy"),
        fold(F.col("y") * F.col("y")).alias("syy"),
    )
    k = F.col("k").cast("double")
    slope = (k * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        k * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return sums.select(
        F.col("k").cast("long").alias("k"),
        _r6(slope).alias("zipf_slope"),
        _r6((F.col("sy") - slope * F.col("sx")) / k).alias("intercept"),
        _r6(
            (k * F.col("sxy") - F.col("sx") * F.col("sy"))
            * (k * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (
                (k * F.col("sxx") - F.col("sx") * F.col("sx"))
                * (k * F.col("syy") - F.col("sy") * F.col("sy"))
            )
        ).alias("r2"),
    )


def _card_est_oracle() -> str:
    blocks = []
    for name, a, ka, b, kb in (
        ("orders_customer", "orders", "o_custkey", "customer", "c_custkey"),
        ("lineitem_orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem_part", "lineitem", "l_partkey", "part", "p_partkey"),
    ):
        blocks.append(f"""
    SELECT '{name}' AS join_name,
           (SELECT CAST(count(*) AS BIGINT) FROM {a}) AS left_rows,
           (SELECT CAST(count(*) AS BIGINT) FROM {b}) AS right_rows,
           CAST(floor(
             (SELECT count(*) FROM {a}) * 1.0
             * (SELECT count(*) FROM {b})
             / greatest((SELECT count(DISTINCT {ka}) FROM {a}),
                        (SELECT count(DISTINCT {kb}) FROM {b}))
           ) AS BIGINT) AS est_rows,
           (SELECT CAST(count(*) AS BIGINT)
            FROM {a} JOIN {b} ON {a}.{ka} = {b}.{kb}) AS actual_rows,
           floor(
             (SELECT count(*) FROM {a}) * 1.0
             * (SELECT count(*) FROM {b})
             / greatest((SELECT count(DISTINCT {ka}) FROM {a}),
                        (SELECT count(DISTINCT {kb}) FROM {b}))
             / (SELECT count(*) FROM {a} JOIN {b}
                ON {a}.{ka} = {b}.{kb})
             * 10000 + 0.5) / 10000.0 AS err_ratio""")
    return "\n    UNION ALL\n".join(blocks)


@_register(
    "join_cardinality_estimates",
    _card_est_oracle(),
    "Cost-based-optimizer join cardinality estimation, validated "
    "against ground truth: for three FK joins, the textbook estimate "
    "|A|·|B|/max(ndv_A, ndv_B) from EXACT ndv counts next to the "
    "actual join cardinality and the error ratio — the arithmetic a "
    "planner runs before picking join order/strategy, and the "
    "calibration report that tells you when to ANALYZE. All inputs "
    "are exact integer counts (one aggregate per side + the actual "
    "joins), so both engines derive identical doubles",
    ("cbo", "statistics", "join", "orders", "lineitem"),
)
def join_cardinality_estimates(spark, sf_dir):
    out = None
    for name, a, ka, b, kb in (
        ("orders_customer", "orders", "o_custkey", "customer", "c_custkey"),
        ("lineitem_orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem_part", "lineitem", "l_partkey", "part", "p_partkey"),
    ):
        da = _t(spark, sf_dir, a)
        db = _t(spark, sf_dir, b)
        sa = da.agg(
            F.count("*").alias("left_rows"),
            F.countDistinct(ka).alias("ndv_a"),
        )
        sb = db.agg(
            F.count("*").alias("right_rows"),
            F.countDistinct(kb).alias("ndv_b"),
        )
        actual = (
            da.join(db, da[ka] == db[kb])
            .agg(F.count("*").alias("actual_rows"))
        )
        est = (
            F.col("left_rows") * F.lit(1.0) * F.col("right_rows")
            / F.greatest(F.col("ndv_a"), F.col("ndv_b"))
        )
        r4 = lambda c: F.floor(c * 10000 + F.lit(0.5)) / F.lit(10000.0)  # noqa: E731
        row = (
            sa.crossJoin(sb)
            .crossJoin(actual)
            .select(
                F.lit(name).alias("join_name"),
                F.col("left_rows").cast("long").alias("left_rows"),
                F.col("right_rows").cast("long").alias("right_rows"),
                F.floor(est).cast("long").alias("est_rows"),
                F.col("actual_rows").cast("long").alias("actual_rows"),
                r4(est / F.col("actual_rows")).alias("err_ratio"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


@_register(
    "kfold_balance_documents",
    """
    WITH f AS (
      SELECT lang,
             CAST(('0x' || substr(md5('kfold-v1' || CAST(doc_id AS VARCHAR)),
                                  1, 8))::BIGINT % 5 AS INTEGER) AS fold
      FROM documents
    )
    SELECT lang, fold, CAST(count(*) AS BIGINT) AS n_docs
    FROM f GROUP BY 1, 2
    """,
    "Deterministic 5-fold cross-validation assignment over documents "
    "(fold = md5-hash(doc_id) mod 5 via operators/sampling.py::"
    "kfold_assign — recomputable anywhere, no assignment table, keys "
    "never straddle a fold boundary) with the per-(lang, fold) "
    "balance report that validates hash uniformity. One "
    "map-side-combined aggregate",
    ("sampling", "kfold", "ml-eval", "documents"),
)
def kfold_balance_documents(spark, sf_dir):
    from ..operators.sampling import kfold_assign

    d = _t(spark, sf_dir, "documents")
    f = kfold_assign(d.select("lang", "doc_id"), "doc_id", k=5)
    return f.groupBy("lang", "fold").agg(F.count("*").alias("n_docs"))


@_register(
    "edit_distance_pairs_parts",
    """
    SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INTEGER)
             AS edit_distance
    FROM part a JOIN part b ON a.p_partkey < b.p_partkey
    WHERE abs(length(a.p_name) - length(b.p_name)) <= 2
      AND levenshtein(a.p_name, b.p_name) <= 2
    """,
    "Edit-distance similarity self-join (typo-tolerant record "
    "linkage): all part-name pairs within Levenshtein distance 2 via "
    "operators/strings.py::edit_distance_self_join with "
    "method='deletes' — SymSpell symmetric-delete blocking (ed ≤ k "
    "⟹ the ≤k-deletion neighborhoods intersect, a LOSSLESS "
    "candidate join on hashed deletion variants), then a codegen "
    "levenshtein verify on survivors only — never a cross product. "
    "Part names are built from a ~90-word vocabulary, so the q-gram "
    "variant's posting lists collide corpus-wide (305 s at sf0.1); "
    "deletion blocking keys on near-identity instead (seconds). The "
    "oracle states the O(n²) truth; both engines' levenshtein is "
    "the standard unit-cost distance",
    ("similarity", "strings", "linkage", "part"),
)
def edit_distance_pairs_parts(spark, sf_dir):
    from ..operators.strings import edit_distance_self_join

    p = _t(spark, sf_dir, "part")
    return edit_distance_self_join(
        p, text_col="p_name", id_col="p_partkey", max_dist=2,
        method="deletes",
    )


@_register(
    "sketch_distinct_error_floor",
    """
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           CAST(0.05 AS DOUBLE) AS tolerance,
           TRUE AS within_tolerance
    FROM events GROUP BY event_type
    """,
    "Driver-visible accuracy gate for the DataSketches HLL tier "
    "(same contract as the ANN recall floors): per event type, the "
    "hll_sketch_agg estimate must land within ±5% of the exact "
    "distinct-user count computed in the SAME Spark job; the oracle "
    "pins the exact counts and the expectation — the sketch's binary "
    "image is engine-specific, its ACCURACY CONTRACT is not. A "
    "regression in sketch config/lgK breaks this row red",
    ("sketch", "evaluation", "events"),
)
def sketch_distinct_error_floor(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    per_type = e.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("approx"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    rel_err = (
        F.abs(F.col("approx") - F.col("exact_users"))
        / F.col("exact_users").cast("double")
    )
    return per_type.select(
        "event_type",
        F.col("exact_users").cast("long").alias("exact_users"),
        F.lit(0.05).cast("double").alias("tolerance"),
        (rel_err <= F.lit(0.05)).alias("within_tolerance"),
    )


@_register(
    "cusum_changepoint_daily",
    """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(cents) AS BIGINT) AS s,
                   CAST(count(*) AS BIGINT) AS n FROM daily),
    dev AS (
      SELECT day, cents,
             sum(cents * tot.n - tot.s) OVER (ORDER BY day
               ROWS UNBOUNDED PRECEDING) AS cum_scaled
      FROM daily CROSS JOIN tot
    )
    SELECT d.day AS changepoint_day,
           CAST(abs(d.cum_scaled) AS BIGINT) AS peak_abs_scaled,
           t.n AS n_days
    FROM dev d CROSS JOIN tot t
    ORDER BY abs(d.cum_scaled) DESC, d.day ASC
    LIMIT 1
    """,
    "CUSUM changepoint LOCATION for daily revenue — the companion "
    "the drift DETECTORS (Page–Hinkley, PSI, Mann–Kendall) lack: "
    "the day where the cumulative deviation from the global mean "
    "peaks is the classic single-changepoint estimator. All "
    "arithmetic is exact integers (deviations scaled by n to avoid "
    "any division: cum Σ(x_i·n − S) is the n-scaled CUSUM), the "
    "running sum is over the days-sized rollup (constant-bounded "
    "window), and the argmax is a 1-row top-k",
    ("stats", "drift", "changepoint", "events"),
)
def cusum_changepoint_daily(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(F.floor(F.col("value") * 100).cast("long")).alias("cents")
    )
    tot = daily.agg(
        F.sum("cents").alias("s"), F.count("*").alias("n")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    dev = daily.crossJoin(F.broadcast(tot)).select(
        "day",
        F.sum(
            F.col("cents").cast("decimal(20,0)") * F.col("n") - F.col("s")
        ).over(w).alias(
            "cum_scaled"
        ),
        "n",
    )
    return (
        dev.orderBy(F.abs(F.col("cum_scaled")).desc(), F.col("day").asc())
        .limit(1)
        .select(
            F.col("day").alias("changepoint_day"),
            F.abs(F.col("cum_scaled")).cast("long").alias("peak_abs_scaled"),
            F.col("n").cast("long").alias("n_days"),
        )
    )


@_register(
    "seasonal_naive_mase_daily",
    """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1
    ),
    lagged AS (
      SELECT day, cents,
             lag(cents, 7) OVER (ORDER BY day) AS season_pred,
             lag(cents, 1) OVER (ORDER BY day) AS naive_pred
      FROM daily
    ),
    scored AS (
      SELECT CAST(count(*) AS BIGINT) AS n_eval_days,
             CAST(sum(abs(cents - season_pred)) AS BIGINT) AS sae_seasonal,
             CAST(sum(abs(cents - naive_pred)) AS BIGINT) AS sae_naive
      FROM lagged WHERE season_pred IS NOT NULL
    )
    SELECT n_eval_days, sae_seasonal, sae_naive,
           floor(sae_seasonal / CAST(sae_naive AS DOUBLE) * 1000000 + 0.5)
             / 1000000.0 AS mase
    FROM scored
    """,
    "Forecast-accuracy evaluation (MASE): the seasonal-naive "
    "forecast (value 7 days ago) scored against the one-step naive "
    "baseline on daily revenue — MASE < 1 means weekly seasonality "
    "carries real signal; the standard scale-free forecast metric, "
    "completing the time-series family (STL decomposition, EWMA, "
    "Bollinger, trend tests) with an EVALUATION operator. Absolute "
    "errors are exact integer cents summed over the days-sized "
    "rollup (constant-bounded lag window); one double division at "
    "the end",
    ("timeseries", "forecast", "evaluation", "events"),
)
def seasonal_naive_mase_daily(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(F.floor(F.col("value") * 100).cast("long")).alias("cents")
    )
    w = Window.orderBy("day")
    lagged = daily.select(
        "cents",
        F.lag("cents", 7).over(w).alias("season_pred"),
        F.lag("cents", 1).over(w).alias("naive_pred"),
    ).filter(F.col("season_pred").isNotNull())
    scored = lagged.agg(
        F.count("*").alias("n_eval_days"),
        F.sum(F.abs(F.col("cents") - F.col("season_pred"))).alias(
            "sae_seasonal"
        ),
        F.sum(F.abs(F.col("cents") - F.col("naive_pred"))).alias("sae_naive"),
    )
    return scored.select(
        F.col("n_eval_days").cast("long").alias("n_eval_days"),
        F.col("sae_seasonal").cast("long").alias("sae_seasonal"),
        F.col("sae_naive").cast("long").alias("sae_naive"),
        _r6(
            F.col("sae_seasonal") / F.col("sae_naive").cast("double")
        ).alias("mase"),
    )


_IPF_ITERS = 4


def _ipf_oracle(iters: int = _IPF_ITERS) -> str:
    """Unrolled iterative-proportional-fitting twin: each iteration is
    a row-margin scaling then a column-margin scaling; margin sums
    fold in key order, every literal is DOUBLE-cast."""
    head = """
    cells AS (
      SELECT lang, source, CAST(count(*) AS BIGINT) AS n
      FROM documents GROUP BY 1, 2
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM cells),
    dims AS (SELECT CAST(count(DISTINCT lang) AS BIGINT) AS nr,
                    CAST(count(DISTINCT source) AS BIGINT) AS nc
             FROM cells),
    w0 AS (SELECT lang, source, n,
                  CAST(n AS DOUBLE) / tot.nn AS w
           FROM cells CROSS JOIN tot)"""
    layers = []
    prev = "w0"
    for i in range(iters):
        r, c = f"wr{i + 1}", f"wc{i + 1}"
        layers.append(f"""
    {r} AS (
      SELECT p.lang, p.source, p.n,
             p.w * ((CAST(1.0 AS DOUBLE) / d.nr) / rs.s) AS w
      FROM {prev} p
      JOIN (SELECT lang,
                   list_reduce(list_prepend(0.0::DOUBLE,
                     list(w ORDER BY source)), (a, b) -> a + b) AS s
            FROM {prev} GROUP BY lang) rs ON rs.lang = p.lang
      CROSS JOIN dims d
    ),
    {c} AS (
      SELECT p.lang, p.source, p.n,
             p.w * ((CAST(1.0 AS DOUBLE) / d.nc) / cs.s) AS w
      FROM {r} p
      JOIN (SELECT source,
                   list_reduce(list_prepend(0.0::DOUBLE,
                     list(w ORDER BY lang)), (a, b) -> a + b) AS s
            FROM {r} GROUP BY source) cs ON cs.source = p.source
      CROSS JOIN dims d
    )""")
        prev = c
    return (
        "    WITH"
        + head
        + ","
        + ",".join(layers)
        + f"""
    SELECT p.lang, p.source, p.n AS n_docs,
           floor(p.w * 1000000 + 0.5) / 1000000.0 AS raked_weight,
           floor(p.w / (CAST(p.n AS DOUBLE) / t.nn) * 10000 + 0.5)
             / 10000.0 AS sampling_factor
    FROM {prev} p CROSS JOIN tot t
    """
    )


@_register(
    "ipf_raking_lang_source",
    _ipf_oracle(),
    "Iterative proportional fitting (raking) of the (lang × source) "
    "cell table to UNIFORM marginals — the survey-weighting / "
    "corpus-rebalancing workhorse: after "
    f"{_IPF_ITERS} row/column scaling rounds each language and each "
    "source carries (approximately) equal total weight while cell "
    "structure is preserved; sampling_factor is the per-cell up/"
    "down-weight a sampler applies. Margin sums fold in key order "
    "(F.aggregate ≡ list_reduce) so all "
    f"{2 * _IPF_ITERS} scaling layers bit-match the unrolled DuckDB "
    "twin. Everything after the one cells aggregate is "
    "categories²-sized",
    ("sampling", "raking", "weighting", "documents"),
)
def ipf_raking_lang_source(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    cells = d.groupBy("lang", "source").agg(F.count("*").alias("n"))
    tot = cells.agg(F.sum("n").alias("nn"))
    nr = cells.select("lang").distinct().count()  # category-sized
    nc = cells.select("source").distinct().count()
    w = (
        cells.crossJoin(F.broadcast(tot))
        .select(
            "lang", "source", "n",
            (F.col("n").cast("double") / F.col("nn")).alias("w"),
        )
        .localCheckpoint(eager=False)
    )

    def fold_by(df, group_col, order_col):
        return df.groupBy(group_col).agg(
            F.aggregate(
                F.array_sort(
                    F.collect_list(F.struct(order_col, F.col("w").alias("v")))
                ),
                F.lit(0.0),
                lambda a, x: a + x["v"],
            ).alias("s")
        )

    for _ in range(_IPF_ITERS):
        rs = fold_by(w, "lang", "source")
        w = w.join(F.broadcast(rs), "lang").select(
            "lang", "source", "n",
            (F.col("w") * (F.lit(1.0 / nr) / F.col("s"))).alias("w"),
        )
        cs = fold_by(w, "source", "lang")
        w = (
            w.join(F.broadcast(cs), "source")
            .select(
                "lang", "source", "n",
                (F.col("w") * (F.lit(1.0 / nc) / F.col("s"))).alias("w"),
            )
            .localCheckpoint(eager=False)
        )

    r4 = lambda col: F.floor(col * 10000 + F.lit(0.5)) / F.lit(10000.0)  # noqa: E731
    return w.crossJoin(F.broadcast(tot)).select(
        "lang",
        "source",
        F.col("n").cast("long").alias("n_docs"),
        _r6(F.col("w")).alias("raked_weight"),
        r4(
            F.col("w") / (F.col("n").cast("double") / F.col("nn"))
        ).alias("sampling_factor"),
    )
