"""Round-3 registry additions, batch 32 — newsvendor critical-
fractile stocking and graph percolation under hub removal.

Same contract as ``registry.py``. Imported at the bottom of
``registry.py``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import _register, _t

# ---------------------------------------------------------------------------
# Newsvendor: which stocking quantile minimizes realized cost?
# ---------------------------------------------------------------------------

_NV_LEVELS = (0.5, 0.6, 0.7, 0.8, 0.9)
_NV_CO = 1   # holding (overage) cost per unit
_NV_CU = 3   # stockout (underage) cost per unit
# critical fractile cu/(cu+co) = 0.75 -> the 0.7/0.8 levels should win


@_register(
    "newsvendor_critical_fractile",
    f"""
    WITH daily AS (
      SELECT p.p_brand AS brand,
             CAST(CAST(l.l_shipdate AS DATE) AS DATE) AS day,
             CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1, 2
    ),
    stocks AS (
      SELECT brand,
             {", ".join(
                 f"CAST(ceil(quantile_cont(qty, {q})) AS BIGINT)"
                 f" AS s{int(q * 100)}"
                 for q in _NV_LEVELS)}
      FROM daily GROUP BY 1
    ),
    costs AS (
      SELECT d.brand,
             {", ".join(
                 f"CAST(sum({_NV_CO} * greatest(s.s{int(q * 100)} - d.qty, 0)"
                 f" + {_NV_CU} * greatest(d.qty - s.s{int(q * 100)}, 0))"
                 f" AS BIGINT) AS c{int(q * 100)}"
                 for q in _NV_LEVELS)}
      FROM daily d JOIN stocks s ON s.brand = d.brand
      GROUP BY 1
    ),
    unp AS (
      {" UNION ALL ".join(
          f"SELECT brand, CAST({q!r} AS DOUBLE) AS service_level, "
          f"c{int(q * 100)} AS realized_cost FROM costs"
          for q in _NV_LEVELS)}
    ),
    best AS (
      SELECT brand, service_level FROM (
        SELECT brand, service_level,
               row_number() OVER (PARTITION BY brand
                                  ORDER BY realized_cost ASC,
                                           service_level ASC) AS rk
        FROM unp
      ) WHERE rk = 1
    )
    SELECT u.brand, u.service_level, u.realized_cost,
           u.service_level = b.service_level AS is_best
    FROM unp u JOIN best b ON b.brand = u.brand
    """,
    "Newsvendor stocking evaluation: per brand, five candidate "
    "service levels set stock at the (exact, interpolated, "
    "ceil'd) quantile of daily demand, and each is scored by the "
    f"REALIZED cost over the whole history (overage {_NV_CO}/unit, "
    f"underage {_NV_CU}/unit — critical fractile "
    f"{_NV_CU}/({_NV_CU}+{_NV_CO}) = 0.75, so theory says the "
    "0.7-0.8 levels win, and the integer cost columns let the "
    "data agree or disagree exactly). The decision-theoretic "
    "companion to `inventory_ss_policy_replay` (fixed rule "
    "replay) and `croston_intermittent_demand` (forecasting): "
    "choose the RULE by backtest, not by faith. One demand "
    "rollup, one quantile pass, one cost join — brand-grid sized "
    "after the fact scan.",
    ("supply-chain", "decision", "quantile", "lineitem"),
)
def newsvendor_critical_fractile(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    daily = (
        li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.col("l_shipdate").cast("date").alias("day"),
        )
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("qty"))
        .localCheckpoint(eager=False)
    )
    stocks = daily.groupBy("brand").agg(
        *[
            F.ceil(F.expr(f"percentile(qty, {q})")).cast("long").alias(
                f"s{int(q * 100)}"
            )
            for q in _NV_LEVELS
        ]
    )
    costs = (
        daily.join(F.broadcast(stocks), "brand")
        .groupBy("brand")
        .agg(
            *[
                F.sum(
                    _NV_CO
                    * F.greatest(
                        F.col(f"s{int(q * 100)}") - F.col("qty"), F.lit(0)
                    )
                    + _NV_CU
                    * F.greatest(
                        F.col("qty") - F.col(f"s{int(q * 100)}"), F.lit(0)
                    )
                ).alias(f"c{int(q * 100)}")
                for q in _NV_LEVELS
            ]
        )
        .localCheckpoint(eager=False)
    )
    unp = None
    for q in _NV_LEVELS:
        one = costs.select(
            "brand",
            F.lit(float(q)).alias("service_level"),
            F.col(f"c{int(q * 100)}").cast("long").alias("realized_cost"),
        )
        unp = one if unp is None else unp.unionAll(one)
    from pyspark.sql import Window

    rk = Window.partitionBy("brand").orderBy(
        F.col("realized_cost").asc(), F.col("service_level").asc()
    )
    best = (
        unp.withColumn("rk", F.row_number().over(rk))
        .filter(F.col("rk") == 1)
        .select("brand", F.col("service_level").alias("best_level"))
    )
    return unp.join(F.broadcast(best), "brand").select(
        "brand",
        "service_level",
        "realized_cost",
        (F.col("service_level") == F.col("best_level")).alias("is_best"),
    )


# ---------------------------------------------------------------------------
# Percolation: connected components before/after removing the top hubs
# ---------------------------------------------------------------------------

_PERC_EDGES = 50
_PERC_HUBS = 2
_PERC_ROUNDS = 8


def _perc_cc_sql(edges_cte: str, prefix: str) -> str:
    sql = f"""
    {prefix}adj AS (
      SELECT a AS u, b AS v FROM {edges_cte}
      UNION ALL SELECT b AS u, a AS v FROM {edges_cte}
    ),
    {prefix}lab0 AS (
      SELECT DISTINCT u AS node, u AS label FROM {prefix}adj
    )"""
    for r in range(1, _PERC_ROUNDS + 1):
        sql += f""",
    {prefix}lab{r} AS MATERIALIZED (
      SELECT n.node, least(n.label, coalesce(m.ml, n.label)) AS label
      FROM {prefix}lab{r - 1} n
      LEFT JOIN (
        SELECT a.u AS node, min(l.label) AS ml
        FROM {prefix}adj a JOIN {prefix}lab{r - 1} l ON l.node = a.v
        GROUP BY 1
      ) m ON m.node = n.node
    )"""
    return sql


@_register(
    "percolation_hub_removal",
    f"""
    WITH ew AS (
      SELECT least(c.c_nationkey, s.s_nationkey) AS a,
             greatest(c.c_nationkey, s.s_nationkey) AS b,
             CAST(count(*) AS BIGINT) AS w
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE c.c_nationkey <> s.s_nationkey
      GROUP BY 1, 2
    ),
    e AS MATERIALIZED (
      SELECT a, b FROM (
        SELECT a, b, row_number() OVER (ORDER BY w DESC, a, b) AS rk
        FROM ew
      ) WHERE rk <= {_PERC_EDGES}
    ),
    degs AS (
      SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
        SELECT a AS node FROM e UNION ALL SELECT b AS node FROM e
      ) GROUP BY 1
    ),
    hubs AS MATERIALIZED (
      SELECT node FROM (
        SELECT node, row_number() OVER (ORDER BY d DESC, node ASC) AS rk
        FROM degs
      ) WHERE rk <= {_PERC_HUBS}
    ),
    e2 AS MATERIALIZED (
      SELECT a, b FROM e
      WHERE a NOT IN (SELECT node FROM hubs)
        AND b NOT IN (SELECT node FROM hubs)
    ),
    {_perc_cc_sql("e", "f_")},
    {_perc_cc_sql("e2", "r_")},
    f_sizes AS (
      SELECT label, CAST(count(*) AS BIGINT) AS sz
      FROM f_lab{_PERC_ROUNDS} GROUP BY 1
    ),
    r_sizes AS (
      SELECT label, CAST(count(*) AS BIGINT) AS sz
      FROM r_lab{_PERC_ROUNDS} GROUP BY 1
    )
    SELECT 'full' AS scenario,
           CAST(sum(sz) AS BIGINT) AS n_nodes,
           CAST(count(*) AS BIGINT) AS n_components,
           CAST(max(sz) AS BIGINT) AS largest_component
    FROM f_sizes
    UNION ALL
    SELECT 'hubs_removed',
           CAST(coalesce(sum(sz), 0) AS BIGINT),
           CAST(count(*) AS BIGINT),
           CAST(coalesce(max(sz), 0) AS BIGINT)
    FROM r_sizes
    """,
    "Percolation / robustness audit of the trade graph: connected "
    f"components (min-label propagation, {_PERC_ROUNDS} unrolled "
    "rounds) on the top-50-edge graph BEFORE and AFTER removing "
    f"the top-{_PERC_HUBS} degree hubs — the targeted-attack "
    "experiment that quantifies hub dependence: a resilient "
    "network keeps its giant component, a hub-and-spoke one "
    "shatters (and `degree_assortativity_nations` predicts which "
    "you have). Integer labels make every round bit-deterministic; "
    "all iteration tables are 25-node-bounded after one fact scan. "
    "The failure-mode companion to betweenness (which FINDS the "
    "brokers this audit removes).",
    ("graph", "robustness", "iterative", "lineitem"),
)
def percolation_hub_removal(spark, sf_dir):
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
            F.least("c_nationkey", "s_nationkey").alias("a"),
            F.greatest("c_nationkey", "s_nationkey").alias("b"),
        )
        .agg(F.count("*").alias("w"))
    )
    # One fact scan + top-k edge selection stays in Spark; every
    # iteration table after it is bounded by the LIMIT to ≤ 50
    # integer edge pairs over ≤ 25 nation nodes. The 2×8 label-
    # propagation rounds used to run as ~75 tiny AQE stage-jobs
    # (seconds of pure scheduling at any input scale — measured
    # round 8); they are a driver-side integer loop with identical
    # min-label semantics, bit-exact by construction (all-integer
    # math, same tie rules, same fixed round count as the oracle).
    edge_rows = (
        ew.orderBy(F.col("w").desc(), F.col("a").asc(), F.col("b").asc())
        .limit(_PERC_EDGES)
        .select("a", "b")
        .collect()
    )
    edges = [(r["a"], r["b"]) for r in edge_rows]

    deg: dict[int, int] = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    hubs = {
        n for n, _ in sorted(deg.items(), key=lambda kv: (-kv[1], kv[0]))[
            :_PERC_HUBS
        ]
    }
    e2 = [(a, b) for a, b in edges if a not in hubs and b not in hubs]

    def cc_sizes(pairs):
        adj: dict[int, list[int]] = {}
        for a, b in pairs:
            adj.setdefault(a, []).append(b)
            adj.setdefault(b, []).append(a)
        lab = {n: n for n in adj}
        for _ in range(_PERC_ROUNDS):
            nxt = {}
            for n, label in lab.items():
                ml = min((lab[v] for v in adj[n]), default=label)
                nxt[n] = min(label, ml)
            lab = nxt
        sizes: dict[int, int] = {}
        for label in lab.values():
            sizes[label] = sizes.get(label, 0) + 1
        return sizes

    def summarize(sizes, name):
        return (
            name,
            sum(sizes.values()),
            len(sizes),
            max(sizes.values()) if sizes else 0,
        )

    return spark.createDataFrame(
        [
            summarize(cc_sizes(edges), "full"),
            summarize(cc_sizes(e2), "hubs_removed"),
        ],
        "scenario string, n_nodes long, n_components long, "
        "largest_component long",
    )
