"""Round-3 registry additions, batch 30 — EWMA smoothing-parameter
grid search and degree assortativity of the trade graph.

Same contract as ``registry.py``. Imported at the bottom of
``registry.py``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import _register, _t

# ---------------------------------------------------------------------------
# Grid search over the EWMA smoothing constant (one-step SSE backtest)
# ---------------------------------------------------------------------------

_GRID_ALPHAS = (0.05, 0.1, 0.2, 0.3, 0.4, 0.5, 0.7, 0.9)


def _grid_fold_sql(a: float) -> str:
    """acc = [ewma, sse]; the one-step error is scored BEFORE the
    state updates — a true backtest, not an in-sample fit."""
    return f"""
      SELECT CAST({a!r} AS DOUBLE) AS alpha,
             list_reduce(
               list_prepend([vals[1], 0.0::DOUBLE],
                 list_transform(vals[2:], v -> [v, 0.0::DOUBLE])),
               (acc, x) -> [
                 acc[1] * {1.0 - a!r} + x[1] * {a!r},
                 acc[2] + (x[1] - acc[1]) * (x[1] - acc[1])
               ])[2] AS sse
      FROM seq"""


@_register(
    "ewma_alpha_grid_search",
    f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(CAST(floor(sum(CAST(floor(o_totalprice * 100)
                   AS BIGINT)) / 100000) AS BIGINT) AS DOUBLE) AS kd
      FROM orders GROUP BY 1
    ),
    seq AS (
      SELECT list(kd ORDER BY day) AS vals,
             CAST(count(*) AS BIGINT) AS n
      FROM daily
    ),
    grid AS ({" UNION ALL ".join(_grid_fold_sql(a) for a in _GRID_ALPHAS)}),
    best AS (
      SELECT alpha FROM grid ORDER BY sse ASC, alpha ASC LIMIT 1
    )
    SELECT g.alpha,
           (SELECT n FROM seq) AS n_days,
           floor(g.sse * 10000 + 0.5) / 10000.0 AS sse,
           g.alpha = (SELECT alpha FROM best) AS is_best
    FROM grid g
    """,
    "Smoothing-constant GRID SEARCH for the daily-revenue EWMA: 8 "
    "candidate alphas each run a one-step-ahead backtest fold "
    "(error scored against the PRE-update state — honest "
    "out-of-sample residuals, not in-sample fit), SSE accumulates "
    "inside the same day-ordered fold so every candidate's score "
    "is bit-identical across engines, and the argmin (tie -> "
    "smaller alpha) is flagged. This is the missing TUNING loop "
    "of the forecasting family — EWMA/Holt/Holt-Winters/Croston "
    "all fix their constants; this one earns them. Kilodollar "
    "units; 8 folds over one days-sized rollup, no extra shuffle.",
    ("timeseries", "forecast", "tuning", "orders"),
)
def ewma_alpha_grid_search(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.floor(
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")) / 100000
        )
        .cast("long")
        .cast("double")
        .alias("kd")
    )
    seq = daily.agg(
        F.array_sort(F.collect_list(F.struct("day", "kd"))).alias("s"),
        F.count("*").alias("n"),
    ).select(
        F.transform(F.col("s"), lambda x: x["kd"]).alias("vals"), "n"
    ).localCheckpoint(eager=False)
    rest = F.slice(
        F.col("vals"), 2, F.greatest(F.size("vals") - 1, F.lit(0))
    )
    rows = []
    for a in _GRID_ALPHAS:
        init = F.struct(
            F.element_at(F.col("vals"), 1).alias("e"),
            F.lit(0.0).alias("sse"),
        )

        def make_step(aa):
            def step(acc, x):
                return F.struct(
                    (acc["e"] * (1.0 - aa) + x * aa).alias("e"),
                    (acc["sse"] + (x - acc["e"]) * (x - acc["e"])).alias(
                        "sse"
                    ),
                )

            return step

        st = F.aggregate(rest, init, make_step(a))
        rows.append(
            seq.select(
                F.lit(a).alias("alpha"),
                F.col("n").cast("long").alias("n_days"),
                st["sse"].alias("sse_raw"),
            )
        )
    grid = rows[0]
    for r in rows[1:]:
        grid = grid.unionAll(r)
    grid = grid.localCheckpoint(eager=False)
    best = (
        grid.orderBy(F.col("sse_raw").asc(), F.col("alpha").asc())
        .limit(1)
        .select(F.col("alpha").alias("best_alpha"))
    )
    return grid.crossJoin(F.broadcast(best)).select(
        "alpha",
        "n_days",
        (F.floor(F.col("sse_raw") * 10000 + F.lit(0.5)) / 10000.0).alias(
            "sse"
        ),
        (F.col("alpha") == F.col("best_alpha")).alias("is_best"),
    )


# ---------------------------------------------------------------------------
# Degree assortativity of the nation trade graph
# ---------------------------------------------------------------------------

@_register(
    "degree_assortativity_nations",
    """
    WITH ew AS (
      SELECT c.c_nationkey AS u, s.s_nationkey AS v
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE c.c_nationkey <> s.s_nationkey
      GROUP BY 1, 2
    ),
    adj AS (
      SELECT u, v FROM ew UNION ALL SELECT v AS u, u AS v FROM ew
    ),
    deg AS (
      SELECT u AS node, CAST(count(*) AS BIGINT) AS d FROM adj GROUP BY 1
    ),
    pairs AS (
      SELECT du.d AS x, dv.d AS y
      FROM adj
      JOIN deg du ON du.node = adj.u
      JOIN deg dv ON dv.node = adj.v
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy
      FROM pairs
    )
    SELECT n AS n_directed_edges,
           CASE WHEN CAST(n * sxx - sx * sx AS DOUBLE)
                     * CAST(n * syy - sy * sy AS DOUBLE) > 0.0 THEN
             floor(CAST(n * sxy - sx * sy AS DOUBLE)
                   / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                          * CAST(n * syy - sy * sy AS DOUBLE))
                   * 1000000 + 0.5) / 1000000.0
           END AS assortativity
    FROM m
    """,
    "Degree assortativity of the nation trade graph — Newman's r: "
    "the Pearson correlation of endpoint degrees over all directed "
    "edge instances, from pure integer moments (bit-identical "
    "across engines, no float accumulation). Negative r = "
    "hub-and-spoke (high-degree nations trade with low-degree "
    "ones, the disassortative shape of most economic networks); "
    "positive = rich-club. One number that summarizes the "
    "topology the centrality family (degree -> PageRank -> "
    "betweenness) describes node-by-node. Graph-bounded "
    "arithmetic after one fact scan.",
    ("graph", "topology", "lineitem"),
)
def degree_assortativity_nations(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    ew = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .groupBy(
            F.col("c_nationkey").alias("u"), F.col("s_nationkey").alias("v")
        )
        .agg(F.count("*").alias("w"))
        .select("u", "v")
    )
    adj = ew.unionAll(
        ew.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint(eager=False)
    deg = adj.groupBy(F.col("u").alias("node")).agg(
        F.count("*").alias("d")
    )
    pairs = (
        adj.join(
            F.broadcast(deg.select(F.col("node").alias("u"), F.col("d").alias("x"))),
            "u",
        )
        .join(
            F.broadcast(
                deg.select(F.col("node").alias("v"), F.col("d").alias("y"))
            ),
            "v",
        )
        .select("x", "y")
    )
    m = pairs.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    vx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    vy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "double"
    )
    cov = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    return m.select(
        F.col("n").cast("long").alias("n_directed_edges"),
        F.when(
            vx * vy > 0.0,
            F.floor(cov / F.sqrt(vx * vy) * 1000000 + F.lit(0.5))
            / 1000000.0,
        ).alias("assortativity"),
    )
