"""Round-3 registry additions, batch 5 — Spearman rank correlation,
max-drawdown location, a functional-dependency profiler, and a
Bloom-filter screen with exact false-positive accounting.

Same contract as ``registry.py``. Imported at the bottom of
``registry.py``.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import _register, _t
from .registry4 import BLOCKLIST_WEIGHTS


def _r6(col):
    return F.floor(col * 1000000 + F.lit(0.5)) / F.lit(1000000.0)


# ---------------------------------------------------------------------------
# Spearman rank correlation between daily revenue and daily order count
# ---------------------------------------------------------------------------

@_register(
    "spearman_rho_daily_metrics",
    """
    WITH daily AS (
      SELECT o_orderdate AS day,
             CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev,
             CAST(count(*) AS BIGINT) AS cnt
      FROM orders GROUP BY 1
    ),
    ranked AS (
      SELECT 2 * rank() OVER (ORDER BY rev)
               + count(*) OVER (PARTITION BY rev) - 1 AS rx,
             2 * rank() OVER (ORDER BY cnt)
               + count(*) OVER (PARTITION BY cnt) - 1 AS ry
      FROM daily
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(rx) AS BIGINT) AS sx, CAST(sum(ry) AS BIGINT) AS sy,
             CAST(sum(rx * ry) AS BIGINT) AS sxy,
             CAST(sum(rx * rx) AS BIGINT) AS sxx,
             CAST(sum(ry * ry) AS BIGINT) AS syy
      FROM ranked
    )
    SELECT n AS n_days,
           CASE WHEN CAST(n * sxx - sx * sx AS DOUBLE)
                     * CAST(n * syy - sy * sy AS DOUBLE) = 0.0 THEN NULL
                ELSE floor(CAST(n * sxy - sx * sy AS DOUBLE)
                           / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                                  * CAST(n * syy - sy * sy AS DOUBLE))
                           * 1000000 + 0.5) / 1000000.0
           END AS rho_spearman
    FROM m
    """,
    "Spearman rank correlation between the daily revenue and daily "
    "order-count series: tie-correct average ranks (doubled so they "
    "stay exact integers), then Pearson on ranks from pure integer "
    "moments — bit-identical across engines, no float accumulation "
    "order anywhere. The rank windows run on the days-sized rollup "
    "(~2,400 rows at ANY fact scale), so the global sort the raw "
    "table could never afford is a no-op here. Completes the "
    "correlation family next to Kendall tau-b "
    "(`kendall_tau_daily_metrics`, O(days^2) pair counts) and "
    "Pearson (`correlation_matrix_lineitem`).",
    ("stats", "correlation", "orders"),
)
def spearman_rho_daily_metrics(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias("rev"),
        F.count("*").alias("cnt"),
    )
    rx = (
        2 * F.rank().over(Window.orderBy("rev"))
        + F.count("*").over(Window.partitionBy("rev"))
        - 1
    )
    ry = (
        2 * F.rank().over(Window.orderBy("cnt"))
        + F.count("*").over(Window.partitionBy("cnt"))
        - 1
    )
    ranked = daily.select(rx.cast("long").alias("rx"), ry.cast("long").alias("ry"))
    m = ranked.agg(
        F.count("*").alias("n"),
        F.sum("rx").alias("sx"),
        F.sum("ry").alias("sy"),
        F.sum(F.col("rx") * F.col("ry")).alias("sxy"),
        F.sum(F.col("rx") * F.col("rx")).alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).alias("syy"),
    )
    varx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    vary = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    cov = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    return m.select(
        F.col("n").alias("n_days"),
        F.when(varx * vary == 0.0, F.lit(None).cast("double"))
        .otherwise(_r6(cov / F.sqrt(varx * vary)))
        .alias("rho_spearman"),
    )


# ---------------------------------------------------------------------------
# Maximum drawdown of the daily-revenue series (location + depth)
# ---------------------------------------------------------------------------

@_register(
    "max_drawdown_daily_revenue",
    """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev
      FROM orders GROUP BY 1
    ),
    dd AS (
      SELECT day, rev,
             max(rev) OVER (ORDER BY day
                            ROWS UNBOUNDED PRECEDING) AS peak,
             max(rev) OVER (ORDER BY day
                            ROWS UNBOUNDED PRECEDING) - rev AS draw
      FROM daily
    ),
    trough AS (
      SELECT day AS trough_day, rev AS trough_cents, peak AS peak_cents,
             draw AS drawdown_cents
      FROM dd ORDER BY draw DESC, day ASC LIMIT 1
    )
    SELECT t.trough_day, t.trough_cents,
           (SELECT min(day) FROM dd
             WHERE rev = t.peak_cents AND day <= t.trough_day) AS peak_day,
           t.peak_cents, t.drawdown_cents,
           floor(CAST(t.drawdown_cents AS DOUBLE)
                 / CAST(t.peak_cents AS DOUBLE) * 1000000 + 0.5)
             / 1000000.0 AS drawdown_frac
    FROM trough t
    """,
    "Maximum-drawdown locator for the daily-revenue series: running "
    "peak (cumulative max), deepest peak-to-trough drop in exact "
    "integer cents, earliest-day tie-break, and the matching peak "
    "day recovered by joining the 1-row trough back against the "
    "series. The running-max window orders the days-sized rollup "
    "(~2,400 rows at any fact scale), never the raw table. The "
    "regime-shift companion to `cusum_changepoint_daily` (mean "
    "shifts) and `bollinger_daily_revenue` (volatility bands).",
    ("stats", "timeseries", "orders"),
)
def max_drawdown_daily_revenue(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias("rev")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    dd = daily.select(
        "day",
        "rev",
        F.max("rev").over(w).alias("peak"),
        (F.max("rev").over(w) - F.col("rev")).alias("draw"),
    ).localCheckpoint()
    trough = (
        dd.orderBy(F.col("draw").desc(), F.col("day").asc())
        .limit(1)
        .select(
            F.col("day").alias("trough_day"),
            F.col("rev").alias("trough_cents"),
            F.col("peak").alias("peak_cents"),
            F.col("draw").alias("drawdown_cents"),
        )
    )
    peak_day = (
        trough.join(
            dd.select(F.col("day").alias("pd"), F.col("rev").alias("prev")),
            (F.col("prev") == F.col("peak_cents"))
            & (F.col("pd") <= F.col("trough_day")),
        )
        .groupBy("trough_day", "trough_cents", "peak_cents", "drawdown_cents")
        .agg(F.min("pd").alias("peak_day"))
    )
    return peak_day.select(
        "trough_day",
        "trough_cents",
        "peak_day",
        "peak_cents",
        "drawdown_cents",
        _r6(
            F.col("drawdown_cents").cast("double")
            / F.col("peak_cents").cast("double")
        ).alias("drawdown_frac"),
    )


# ---------------------------------------------------------------------------
# Functional-dependency audit (approximate FD discovery over candidates)
# ---------------------------------------------------------------------------

_FD_CANDIDATES = (
    ("lineitem", "l_partkey", "l_suppkey"),
    ("lineitem", "l_orderkey", "l_returnflag"),
    ("orders", "o_custkey", "o_orderpriority"),
    ("part", "p_brand", "p_type"),
    ("customer", "c_nationkey", "c_mktsegment"),
    ("events", "user_id", "event_type"),
)


def _fd_one_sql(table, lhs, rhs):
    return f"""
    SELECT '{table}: {lhs} -> {rhs}' AS fd,
           CAST(sum(t) AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS lhs_groups,
           CAST(sum(CASE WHEN d > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS violating_groups,
           CAST(sum(t) - sum(maxc) AS BIGINT) AS g3_remove_rows,
           CAST((sum(t) - sum(maxc)) * 1000000 // sum(t) AS BIGINT)
             AS g3_error_ppm,
           sum(CASE WHEN d > 1 THEN 1 ELSE 0 END) = 0 AS holds
    FROM (
      SELECT lhs, count(*) AS d, max(c) AS maxc, sum(c) AS t
      FROM (
        SELECT {lhs} AS lhs, {rhs} AS rhs, count(*) AS c
        FROM {table} GROUP BY 1, 2
      ) GROUP BY 1
    )
    """


@_register(
    "functional_dependency_audit",
    "\nUNION ALL\n".join(_fd_one_sql(*c) for c in _FD_CANDIDATES),
    "Approximate functional-dependency profiler over a fixed "
    "candidate set (6 LHS->RHS pairs across 5 tables): per "
    "candidate, LHS-group count, groups violating the dependency, "
    "and the g3 repair metric (minimum rows to delete so the FD "
    "holds = rows minus the per-LHS majority class) in exact "
    "integers with a ppm error rate. Two map-side-combinable "
    "aggregations per candidate, shuffle keyed on the LHS — the "
    "schema-discovery companion to `referential_integrity_report` "
    "(which audits FK edges; this audits column determinism).",
    ("quality", "profiling", "lineitem"),
)
def functional_dependency_audit(spark, sf_dir):
    # NOT spread (r9 A/B): adding a round-robin exchange per fact
    # branch doubled the wall time (1.8 -> 3.5 s re-timed solo) — six
    # unioned branches x 32-partition exchanges is pure scheduling
    # overhead against 2-column partial aggregates this cheap.
    out = None
    for table, lhs, rhs in _FD_CANDIDATES:
        src = _t(spark, sf_dir, table).select(
            F.col(lhs).alias("lhs"), F.col(rhs).alias("rhs")
        )
        pairs = src.groupBy("lhs", "rhs").agg(F.count("*").alias("c"))
        grp = pairs.groupBy("lhs").agg(
            F.count("*").alias("d"),
            F.max("c").alias("maxc"),
            F.sum("c").alias("t"),
        )
        viol = F.sum(F.when(F.col("d") > 1, 1).otherwise(0))
        one = grp.agg(
            F.sum("t").alias("n_rows"),
            F.count("*").alias("lhs_groups"),
            viol.alias("violating_groups"),
            (F.sum("t") - F.sum("maxc")).alias("g3_remove_rows"),
        ).select(
            F.lit(f"{table}: {lhs} -> {rhs}").alias("fd"),
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("lhs_groups").cast("long").alias("lhs_groups"),
            F.col("violating_groups").cast("long").alias("violating_groups"),
            F.col("g3_remove_rows").cast("long").alias("g3_remove_rows"),
            F.expr("g3_remove_rows * 1000000 div n_rows")
            .cast("long")
            .alias("g3_error_ppm"),
            (F.col("violating_groups") == 0).alias("holds"),
        )
        out = one if out is None else out.unionAll(one)
    return out


# ---------------------------------------------------------------------------
# Bloom-filter blocklist screen with exact false-positive accounting
# ---------------------------------------------------------------------------

_BLOOM_M = 256
_BLOOM_K = 3


def _bloom_positions(term):
    return [
        int(hashlib.md5(f"{term}#bloom{i}".encode()).hexdigest()[:8], 16)
        % _BLOOM_M
        for i in range(_BLOOM_K)
    ]


_BLOOM_BITS = sorted(
    {p for t in BLOCKLIST_WEIGHTS for p in _bloom_positions(t)}
)
_BLOOM_TERMS_SQL = ", ".join(f"'{t}'" for t in sorted(BLOCKLIST_WEIGHTS))
_BLOOM_BITS_SQL = ", ".join(str(b) for b in _BLOOM_BITS)


def _bloom_probe_sql(i):
    return (
        f"CAST(CAST(('0x' || substr(md5(tok || '#bloom{i}'), 1, 8)) "
        f"AS UBIGINT) % {_BLOOM_M} AS INTEGER) IN ({_BLOOM_BITS_SQL})"
    )


@_register(
    "bloom_filter_fp_audit",
    f"""
    WITH toks AS (
      SELECT DISTINCT tok FROM (
        SELECT unnest(list_filter(string_split_regex(lower(text),
                                                     '[^a-z0-9]+'),
                                  x -> x <> '')) AS tok
        FROM documents
      )
    ),
    probed AS (
      SELECT tok,
             ({_bloom_probe_sql(0)}) AND ({_bloom_probe_sql(1)})
               AND ({_bloom_probe_sql(2)}) AS bloom_pos,
             tok IN ({_BLOOM_TERMS_SQL}) AS exact_pos
      FROM toks
    )
    SELECT CAST(count(*) AS BIGINT) AS n_distinct_tokens,
           CAST({len(_BLOOM_BITS)} AS INTEGER) AS n_bits_set,
           CAST(sum(CASE WHEN bloom_pos THEN 1 ELSE 0 END) AS BIGINT)
             AS bloom_positives,
           CAST(sum(CASE WHEN exact_pos THEN 1 ELSE 0 END) AS BIGINT)
             AS exact_positives,
           CAST(sum(CASE WHEN bloom_pos AND NOT exact_pos
                         THEN 1 ELSE 0 END) AS BIGINT) AS false_positives,
           CAST(sum(CASE WHEN bloom_pos AND NOT exact_pos
                         THEN 1 ELSE 0 END) * 1000000 // count(*)
                AS BIGINT) AS fp_rate_ppm
    FROM probed
    """,
    "Bloom-filter pre-screen for the blocklist with EXACT "
    "false-positive accounting: a 256-bit / 3-hash filter is built "
    "over the policy terms at plan time (md5-derived bit positions "
    "materialized as literals into both engines, so membership is "
    "bit-identical), every distinct corpus token is probed, and the "
    "audit reports bloom vs exact positives and the realized FP "
    "rate in ppm. This is the cheap first stage a 100 TB pipeline "
    "runs scan-local before the exact `blocklist_screen_documents` "
    "pass: the filter is a compile-time constant (no join, no "
    "shuffle), and only the vocabulary-bounded distinct-token set "
    "is shuffled for the audit. The deliberately small m=256 makes "
    "the FP path observable at test scale.",
    ("text-quality", "sketch", "documents"),
)
def bloom_filter_fp_audit(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    toks = (
        d.select(
            F.explode(
                F.filter(
                    F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
                    lambda x: x != "",
                )
            ).alias("tok")
        )
        .distinct()
    )

    def _pos(i):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("tok"), F.lit(f"#bloom{i}"))), 1, 8
                ),
                16,
                10,
            ).cast("long")
            % _BLOOM_M
        ).cast("int")

    bits = F.array(*[F.lit(b) for b in _BLOOM_BITS])
    bloom_pos = (
        F.array_contains(bits, _pos(0))
        & F.array_contains(bits, _pos(1))
        & F.array_contains(bits, _pos(2))
    )
    exact_pos = F.col("tok").isin(*sorted(BLOCKLIST_WEIGHTS))
    probed = toks.select(
        bloom_pos.alias("bloom_pos"), exact_pos.alias("exact_pos")
    )
    fp = F.sum(
        F.when(F.col("bloom_pos") & ~F.col("exact_pos"), 1).otherwise(0)
    )
    return probed.agg(
        F.count("*").alias("n_distinct_tokens"),
        F.lit(len(_BLOOM_BITS)).cast("int").alias("n_bits_set"),
        F.sum(F.when(F.col("bloom_pos"), 1).otherwise(0))
        .cast("long")
        .alias("bloom_positives"),
        F.sum(F.when(F.col("exact_pos"), 1).otherwise(0))
        .cast("long")
        .alias("exact_positives"),
        fp.cast("long").alias("false_positives"),
        F.expr(
            "CAST(sum(CASE WHEN bloom_pos AND NOT exact_pos THEN 1 ELSE 0 "
            "END) * 1000000 div count(*) AS BIGINT)"
        ).alias("fp_rate_ppm"),
    )
