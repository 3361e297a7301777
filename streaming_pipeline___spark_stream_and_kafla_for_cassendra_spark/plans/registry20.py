"""Round-3 registry additions, batch 7 — additive Holt–Winters with
weekly seasonality, an SPRT early-exit sequential language filter,
and the GROUPING SETS member of the SQL grouping surface.

Same contract as ``registry.py``. Imported at the bottom of
``registry.py``.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from .registry import _register, _t


def _r6(col):
    return F.floor(col * 1000000 + F.lit(0.5)) / F.lit(1000000.0)


# ---------------------------------------------------------------------------
# Additive Holt–Winters (weekly seasonality) on daily revenue
# ---------------------------------------------------------------------------

_HW_A = 0.3   # level
_HW_B = 0.1   # trend
_HW_G = 0.3   # seasonal

# state vector: [l, b, s0..s6, wd_last]  (weekday 0=Sunday via
# (epoch_day + 4) % 7 — pure integer arithmetic, no engine-specific
# dayofweek convention)
_HW_CUR_SQL = "(" + " + ".join(
    f"CASE WHEN x[2] = {w}.0 THEN acc[{w + 3}] ELSE 0.0 END"
    for w in range(7)
) + ")"


def _hw_slot_sql(w):
    return (
        f"CASE WHEN x[2] = {w}.0 THEN {_HW_G}::DOUBLE * (x[1] - ("
        f"{_HW_A}::DOUBLE * (x[1] - {_HW_CUR_SQL}) "
        f"+ {1.0 - _HW_A}::DOUBLE * (acc[1] + acc[2]))) "
        f"+ {1.0 - _HW_G}::DOUBLE * acc[{w + 3}] "
        f"ELSE acc[{w + 3}] END"
    )


@_register(
    "holt_winters_daily_revenue",
    f"""
    WITH daily AS (
      SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS DOUBLE)
               AS day,
             CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
               AS rev
      FROM orders GROUP BY 1
    ),
    seq AS (
      SELECT list([rev, CAST((CAST(day AS BIGINT) + 4) % 7 AS DOUBLE)]
                  ORDER BY day) AS vals,
             count(*) AS n
      FROM daily
    ),
    folded AS (
      SELECT n,
             list_reduce(
               list_prepend(
                 [vals[1][1], 0.0::DOUBLE, 0.0::DOUBLE, 0.0::DOUBLE,
                  0.0::DOUBLE, 0.0::DOUBLE, 0.0::DOUBLE, 0.0::DOUBLE,
                  0.0::DOUBLE, vals[1][2]],
                 list_transform(vals[2:],
                                x -> [x[1], x[2], 0.0::DOUBLE, 0.0::DOUBLE,
                                      0.0::DOUBLE, 0.0::DOUBLE, 0.0::DOUBLE,
                                      0.0::DOUBLE, 0.0::DOUBLE,
                                      0.0::DOUBLE])),
               (acc, x) -> [
                 {_HW_A}::DOUBLE * (x[1] - {_HW_CUR_SQL})
                   + {1.0 - _HW_A}::DOUBLE * (acc[1] + acc[2]),
                 {_HW_B}::DOUBLE * (({_HW_A}::DOUBLE * (x[1] - {_HW_CUR_SQL})
                     + {1.0 - _HW_A}::DOUBLE * (acc[1] + acc[2])) - acc[1])
                   + {1.0 - _HW_B}::DOUBLE * acc[2],
                 {_hw_slot_sql(0)},
                 {_hw_slot_sql(1)},
                 {_hw_slot_sql(2)},
                 {_hw_slot_sql(3)},
                 {_hw_slot_sql(4)},
                 {_hw_slot_sql(5)},
                 {_hw_slot_sql(6)},
                 x[2]
               ]) AS st
      FROM seq
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           round(st[1], 4) AS level_cents,
           round(st[2], 4) AS trend_cents,
           {", ".join(f"round(st[{w + 3}], 4) AS s{w}" for w in range(7))},
           round(st[1] + st[2]
                 + ({" + ".join(
                       f"CASE WHEN CAST(st[10] AS BIGINT) % 7 = {(w + 6) % 7}"
                       f" THEN st[{w + 3}] ELSE 0.0 END"
                       for w in range(7))}),
                 4) AS forecast_next_day
    FROM folded
    """,
    "Additive Holt–Winters (level + trend + weekly seasonality, "
    "alpha=0.3 beta=0.1 gamma=0.3, zero-initialized seasonals, "
    "l0 = first observation) over the daily-revenue series: a "
    "TEN-variable coupled recurrence — the seasonal slot is keyed by "
    "weekday computed as (epoch_day+4)%7 so both engines share one "
    "convention and calendar gaps cannot misalign the cycle — run as "
    "an in-row fold on the days-sized rollup. Spark F.aggregate with "
    "a 10-field struct accumulator; DuckDB twin is a 10-list "
    "list_reduce GENERATED from the same Python constants in the "
    "identical arithmetic order, so level, trend, all seven "
    "seasonals AND the one-step-ahead forecast hash-match. Completes "
    "the forecasting ladder: EWMA (1 state) -> Holt (2) -> Croston "
    "(4, event-paced) -> Holt-Winters (10, seasonal).",
    ("timeseries", "recurrence", "forecast", "orders"),
)
def holt_winters_daily_revenue(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01"))
        .cast("double")
        .alias("day")
    ).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
        .cast("double")
        .alias("rev")
    )
    seq = daily.agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("day").alias("day"),
                    F.col("rev").alias("y"),
                    ((F.col("day").cast("long") + 4) % 7)
                    .cast("double")
                    .alias("wd"),
                )
            )
        ).alias("vals"),
        F.count("*").alias("n"),
    )
    first = F.element_at(F.col("vals"), 1)
    rest = F.slice(F.col("vals"), 2, F.greatest(F.size("vals") - 1, F.lit(0)))
    init = F.struct(
        first["y"].alias("l"),
        F.lit(0.0).alias("b"),
        *[F.lit(0.0).alias(f"s{w}") for w in range(7)],
        first["wd"].alias("wd"),
    )
    a, ac = F.lit(_HW_A), F.lit(1.0 - _HW_A)
    bb, bc = F.lit(_HW_B), F.lit(1.0 - _HW_B)
    g, gc = F.lit(_HW_G), F.lit(1.0 - _HW_G)

    def cur_of(acc, x):
        expr = F.when(x["wd"] == 0.0, acc["s0"])
        for w in range(1, 7):
            expr = expr.when(x["wd"] == float(w), acc[f"s{w}"])
        return expr.otherwise(F.lit(0.0))

    def step(acc, x):
        # mirror the SQL exactly: cur/lp are re-derived inline per
        # slot in DuckDB, but the arithmetic per term is identical,
        # so computing them once here produces the same doubles
        cur = cur_of(acc, x)
        lp = a * (x["y"] - cur) + ac * (acc["l"] + acc["b"])
        bp = bb * (lp - acc["l"]) + bc * acc["b"]
        snew = g * (x["y"] - lp) + gc * cur
        slots = [
            F.when(x["wd"] == float(w), snew)
            .otherwise(acc[f"s{w}"])
            .alias(f"s{w}")
            for w in range(7)
        ]
        return F.struct(
            lp.alias("l"), bp.alias("b"), *slots, x["wd"].alias("wd")
        )

    st = F.aggregate(rest, init, step)
    nxt = F.when((st["wd"].cast("long") % 7) == 6, st["s0"])
    for w in range(7):
        if (w + 6) % 7 != 6:
            nxt = nxt.when(
                (st["wd"].cast("long") % 7) == (w + 6) % 7, st[f"s{w}"]
            )
    return seq.select(
        F.col("n").cast("long").alias("n_days"),
        F.round(st["l"], 4).alias("level_cents"),
        F.round(st["b"], 4).alias("trend_cents"),
        *[F.round(st[f"s{w}"], 4).alias(f"s{w}") for w in range(7)],
        F.round(st["l"] + st["b"] + nxt, 4).alias("forecast_next_day"),
    )


# ---------------------------------------------------------------------------
# SPRT early-exit sequential language filter over document characters
# ---------------------------------------------------------------------------

# Public English letter frequencies (percent); renormalized over a-z.
_EN_FREQ = {
    "a": 8.17, "b": 1.49, "c": 2.78, "d": 4.25, "e": 12.70, "f": 2.23,
    "g": 2.02, "h": 6.09, "i": 6.97, "j": 0.15, "k": 0.77, "l": 4.03,
    "m": 2.41, "n": 6.75, "o": 7.51, "p": 1.93, "q": 0.10, "r": 5.99,
    "s": 6.33, "t": 9.06, "u": 2.76, "v": 0.98, "w": 2.36, "x": 0.15,
    "y": 1.97, "z": 0.07,
}
_EN_TOT = sum(_EN_FREQ.values())
# per-letter LLR increment: ln(p_en(c) / (1/26))
_SPRT_INC = {
    c: math.log(v / _EN_TOT * 26.0) for c, v in sorted(_EN_FREQ.items())
}
_SPRT_ALPHA = 0.01
_SPRT_UPPER = math.log((1.0 - _SPRT_ALPHA) / _SPRT_ALPHA)
_SPRT_LOWER = -_SPRT_UPPER
_SPRT_CAP = 400

_SPRT_CASE_SQL = "CASE c " + " ".join(
    f"WHEN '{c}' THEN {v!r}::DOUBLE" for c, v in sorted(_SPRT_INC.items())
) + " ELSE 0.0 END"

_SPRT_LLRP = "(acc[1] + x[1])"
_SPRT_DEC = (
    f"CASE WHEN {_SPRT_LLRP} >= {_SPRT_UPPER!r} THEN 1.0::DOUBLE "
    f"WHEN {_SPRT_LLRP} <= {_SPRT_LOWER!r} THEN -1.0::DOUBLE "
    f"ELSE 0.0::DOUBLE END"
)


@_register(
    "sprt_langid_early_exit",
    f"""
    WITH chars AS (
      SELECT doc_id,
             regexp_replace(lower(text), '[^a-z]', '', 'g') AS s
      FROM documents
    ),
    incs AS (
      SELECT doc_id,
             list_transform(
               list_transform(generate_series(1, least(length(s),
                                                       {_SPRT_CAP})),
                              i -> substr(s, CAST(i AS INTEGER), 1)),
               c -> [{_SPRT_CASE_SQL}, 0.0::DOUBLE, 0.0::DOUBLE]) AS xs
      FROM chars WHERE length(s) >= 1
    ),
    folded AS (
      -- the early-exit freeze is a SCALAR CASE per state component:
      -- a list-valued CASE branch (CASE ... THEN acc ELSE [..] END)
      -- returns wrong lanes under DuckDB's vectorized list_reduce on
      -- multi-row inputs (correct on a 1-row slice — verified), so
      -- never branch on the whole accumulator
      SELECT doc_id, len(xs) AS n_scanned,
             list_reduce(
               list_prepend([0.0::DOUBLE, 0.0::DOUBLE, 0.0::DOUBLE], xs),
               (acc, x) -> [
                 CASE WHEN acc[2] <> 0.0 THEN acc[1] ELSE {_SPRT_LLRP} END,
                 CASE WHEN acc[2] <> 0.0 THEN acc[2] ELSE {_SPRT_DEC} END,
                 CASE WHEN acc[2] <> 0.0 THEN acc[3]
                      ELSE acc[3] + 1.0::DOUBLE END
               ]) AS st
      FROM incs
    )
    SELECT doc_id, CAST(n_scanned AS BIGINT) AS n_scanned,
           CASE WHEN st[2] = 1.0 THEN 'en'
                WHEN st[2] = -1.0 THEN 'other'
                ELSE 'undecided' END AS decision,
           CAST(st[3] AS BIGINT) AS steps_used,
           floor(st[1] * 1000000 + 0.5) / 1000000.0 AS llr
    FROM folded
    """,
    "Wald SPRT early-exit language filter — the sequential-analysis "
    "answer to 'how few characters must we READ to route each "
    "document': per character a log-likelihood-ratio increment "
    "ln(p_english(c)*26) (public letter-frequency table embedded as "
    "full-precision literals into BOTH engines), folded in document "
    "order with alpha=beta=0.01 Wald boundaries and a hard freeze "
    "after the first crossing, capped at 400 letters. Emits the "
    "decision, the characters actually consumed (the early-exit "
    "economics a 100 TB ingest pipeline banks as skipped decode "
    "work), and the frozen LLR. In-row fold, zero shuffle, scan-"
    "local at any scale; the whole-document companion is "
    "`langid_heuristic`, which always pays the full scan.",
    ("text-quality", "langid", "sequential", "documents"),
)
def sprt_langid_early_exit(spark, sf_dir):
    from ..operators.scale import spread_for_compute

    d = _t(spark, sf_dir, "documents")
    s = F.regexp_replace(F.lower(F.col("text")), "[^a-z]", "")
    base = spread_for_compute(
        d.select("doc_id", s.alias("s")).filter(F.length("s") >= 1)
    )

    # O(1) per-char lookup: the filtered string is [a-z] only, so
    # ascii(c)-96 indexes a 26-literal array — the same doubles the
    # oracle's CASE table holds, ~26x cheaper than a comparison chain
    inc_arr = F.array(
        *[F.lit(_SPRT_INC[chr(97 + i)]) for i in range(26)]
    )

    def inc_of(c):
        return F.element_at(inc_arr, F.ascii(c) - 96)

    # split the capped prefix ONCE into a char array: substr(s, i, 1)
    # inside a per-position transform is O(i) per call (UTF8 byte
    # scan), i.e. O(cap²) per document — the quadratic-substr trap the
    # CDC rolling hash hit; element_at over the split array is O(1)
    # (r9: this one fold was a 1.3 s single-task job at sf0.1)
    xs = F.transform(
        F.split(F.substring(F.col("s"), 1, _SPRT_CAP), ""),
        lambda c: inc_of(c),
    )
    folded = base.select(
        "doc_id", F.size(xs).alias("n_scanned"), xs.alias("xs")
    )
    init = F.struct(
        F.lit(0.0).alias("llr"), F.lit(0.0).alias("dec"), F.lit(0.0).alias("k")
    )
    up, lo = F.lit(_SPRT_UPPER), F.lit(_SPRT_LOWER)

    def step(acc, x):
        llrp = acc["llr"] + x
        dec = (
            F.when(llrp >= up, F.lit(1.0))
            .when(llrp <= lo, F.lit(-1.0))
            .otherwise(F.lit(0.0))
        )
        nxt = F.struct(
            llrp.alias("llr"), dec.alias("dec"), (acc["k"] + 1.0).alias("k")
        )
        return F.when(acc["dec"] != 0.0, acc).otherwise(nxt)

    st = F.aggregate(F.col("xs"), init, step)
    return folded.select(
        "doc_id",
        F.col("n_scanned").cast("long").alias("n_scanned"),
        F.when(st["dec"] == 1.0, F.lit("en"))
        .when(st["dec"] == -1.0, F.lit("other"))
        .otherwise(F.lit("undecided"))
        .alias("decision"),
        st["k"].cast("long").alias("steps_used"),
        _r6(st["llr"]).alias("llr"),
    )


# ---------------------------------------------------------------------------
# GROUPING SETS revenue report with grouping_id
# ---------------------------------------------------------------------------

@_register(
    "grouping_sets_revenue_report",
    """
    SELECT coalesce(r_name, 'ALL') AS region,
           coalesce(o_orderpriority, 'ALL') AS priority,
           CAST(CASE WHEN r_name IS NULL THEN 2 ELSE 0 END
                + CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END
                AS INTEGER) AS gid,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY GROUPING SETS ((r_name, o_orderpriority), (r_name),
                            (o_orderpriority), ())
    """,
    "GROUPING SETS revenue report — the irregular-lattice member of "
    "the SQL grouping surface next to `cube_status_priority_sales` "
    "(full cube) and `rollup_region_nation_sales` (hierarchy): one "
    "pass emits (region x priority), region totals, priority totals "
    "and the grand total, with an explicit grouping id derived from "
    "the NULL pattern (stated identically in both engines instead "
    "of engine-specific grouping_id() numbering; 'ALL' placeholders "
    "keep the levels distinguishable after coalesce). Spark expands "
    "grouping sets with a single Expand operator over the one "
    "shuffled aggregate — 4 groupings never mean 4 scans. Dimension "
    "joins are broadcast (region/nation/customer vs orders).",
    ("agg", "grouping", "sql-surface", "orders"),
)
def grouping_sets_revenue_report(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    joined = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("r_name", "o_orderpriority", "o_totalprice")
    )
    joined.createOrReplaceTempView("gs_rev_src")
    return spark.sql(
        """
        SELECT coalesce(r_name, 'ALL') AS region,
               coalesce(o_orderpriority, 'ALL') AS priority,
               CAST(CASE WHEN r_name IS NULL THEN 2 ELSE 0 END
                    + CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END
                    AS INT) AS gid,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS revenue_cents
        FROM gs_rev_src
        GROUP BY GROUPING SETS ((r_name, o_orderpriority), (r_name),
                                (o_orderpriority), ())
        """
    )
