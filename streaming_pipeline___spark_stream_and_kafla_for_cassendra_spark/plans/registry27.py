"""Round-3 registry additions, batch 14 — exact betweenness
centrality (all-sources Brandes) on the pruned nation trade graph.

Same contract as ``registry.py``. Imported at the bottom of
``registry.py``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import _register, _t

_BC_EDGES = 50   # keep the top-50 undirected edges by trade weight
_BC_DEPTH = 6    # BFS unroll depth (diameter bound on the pruned graph)


def _bc_oracle() -> str:
    """Unrolled Brandes: forward BFS layers carry (source, node,
    depth, sigma = shortest-path counts, all integers); the backward
    dependency sweep folds sigma_v/sigma_w * (1 + delta_w) over
    successors ordered by node id, and the final per-node sum folds
    over sources — both orderings mirrored by F.aggregate."""
    head = f"""
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
      ) WHERE rk <= {_BC_EDGES}
    ),
    adj AS MATERIALIZED (
      SELECT a AS u, b AS v FROM e UNION ALL SELECT b AS u, a AS v FROM e
    ),
    nodes AS (SELECT DISTINCT u AS node FROM adj),
    l0 AS (SELECT node AS s, node AS v, 0 AS d,
                  CAST(1 AS BIGINT) AS sigma FROM nodes),
    vis0 AS (SELECT * FROM l0)"""
    layers = []
    for k in range(_BC_DEPTH):
        layers.append(f"""
    l{k + 1} AS MATERIALIZED (
      SELECT f.s, adj.v, {k + 1} AS d,
             CAST(sum(f.sigma) AS BIGINT) AS sigma
      FROM l{k} f
      JOIN adj ON adj.u = f.v
      LEFT JOIN vis{k} vs ON vs.s = f.s AND vs.v = adj.v
      WHERE vs.v IS NULL
      GROUP BY 1, 2
    ),
    vis{k + 1} AS MATERIALIZED (
      SELECT * FROM vis{k} UNION ALL SELECT * FROM l{k + 1}
    )""")
    back = [f"""
    dl{_BC_DEPTH} AS (
      SELECT s, v, CAST(0.0 AS DOUBLE) AS delta FROM l{_BC_DEPTH}
    )"""]
    for k in range(_BC_DEPTH - 1, 0, -1):
        back.append(f"""
    dl{k} AS MATERIALIZED (
      SELECT cur.s, cur.v, coalesce(f.delta, 0.0::DOUBLE) AS delta
      FROM l{k} cur
      LEFT JOIN (
        SELECT c2.s, c2.v,
               list_reduce(list_prepend(0.0::DOUBLE,
                 list(CAST(c2.sigma AS DOUBLE) / nx.sigma
                      * (1.0::DOUBLE + nx.delta) ORDER BY nx.v)),
                 (x, y) -> x + y) AS delta
        FROM l{k} c2
        JOIN adj ON adj.u = c2.v
        JOIN (
          SELECT n.s, n.v, n.sigma, d.delta FROM l{k + 1} n
          JOIN dl{k + 1} d ON d.s = n.s AND d.v = n.v
        ) nx ON nx.s = c2.s AND nx.v = adj.v
        GROUP BY c2.s, c2.v
      ) f ON f.s = cur.s AND f.v = cur.v
    )""")
    alldl = " UNION ALL ".join(
        f"SELECT s, v, delta FROM dl{k}" for k in range(1, _BC_DEPTH + 1)
    )
    return (
        head
        + ","
        + ",".join(layers)
        + ","
        + ",".join(back)
        + f""",
    alld AS ({alldl})
    SELECT n.n_name AS nation,
           floor(coalesce(list_reduce(list_prepend(0.0::DOUBLE,
                   list(a.delta / 2.0 ORDER BY a.s)), (x, y) -> x + y),
                 0.0) * 1000000 + 0.5) / 1000000.0 AS betweenness,
           CAST(coalesce((SELECT count(*) FROM adj
                          WHERE adj.u = nd.node), 0) AS BIGINT) AS degree
    FROM nodes nd
    LEFT JOIN alld a ON a.v = nd.node AND a.s <> nd.node
    JOIN nation n ON n.n_nationkey = nd.node
    GROUP BY n.n_name, nd.node
    """
    )


@_register(
    "betweenness_centrality_nations",
    _bc_oracle(),
    "EXACT betweenness centrality via all-sources Brandes on the "
    f"nation trade graph pruned to its top-{_BC_EDGES} undirected "
    "edges (weight desc — pruning is what gives the graph bridges "
    "worth measuring): forward BFS runs ALL 25 sources "
    f"simultaneously in {_BC_DEPTH} unrolled layers carrying exact "
    "integer shortest-path counts (sigma), then the dependency "
    "sweep walks depths backwards accumulating delta = "
    "sigma_v/sigma_w * (1 + delta_w) over successors — every float "
    "fold ordered (successors by node, sources at the end), halved "
    "for the undirected double-count, so the scores match the "
    "unrolled-CTE twin bit-for-bit. Completes the centrality "
    "ladder: degree -> PageRank (influence) -> betweenness "
    "(brokerage). Per-layer plan: one frontier⋈adjacency join + "
    "one (source,node)-keyed aggregate, all on 25x25-bounded "
    "tables after one fact scan.",
    ("graph", "centrality", "iterative", "lineitem"),
)
def betweenness_centrality_nations(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    ew = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .groupBy(
            F.least("c_nationkey", "s_nationkey").alias("a"),
            F.greatest("c_nationkey", "s_nationkey").alias("b"),
        )
        .agg(F.count("*").alias("w"))
    )
    e = (
        ew.orderBy(F.col("w").desc(), F.col("a").asc(), F.col("b").asc())
        .limit(_BC_EDGES)
        .select("a", "b")
        .localCheckpoint(eager=False)
    )
    # Brandes on the LIMIT-bounded top-50-edge nation graph used to
    # run as ~70 checkpointed stage-jobs (6 forward levels + 5
    # backward sweeps, pure scheduling at any input size — measured
    # round 8). The driver loop below replicates it exactly: integer
    # path counts (order-free sums), the backward dependency fold in
    # w_node order and the per-node fold in source order — the same
    # IEEE ops in the same order as the distributed form and the
    # unrolled oracle.
    import math

    edges = [(r["a"], r["b"]) for r in e.collect()]
    adj: dict[int, list[int]] = {}
    deg: dict[int, int] = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    nodes_l = sorted(adj)
    # forward: per-source level sets with integer path counts
    levels: list[dict[tuple[int, int], int]] = [
        {(s, s): 1 for s in nodes_l}
    ]
    visited: dict[int, dict[int, int]] = {
        s: {s: 0} for s in nodes_l
    }
    for k in range(_BC_DEPTH):
        nxt: dict[tuple[int, int], int] = {}
        for (s, v), sigma in levels[k].items():
            for w in adj[v]:
                if w not in visited[s]:
                    nxt[(s, w)] = nxt.get((s, w), 0) + sigma
        for s, w in nxt:
            visited[s][w] = k + 1
        levels.append(nxt)
    # backward dependency sweep
    all_deltas: list[dict[tuple[int, int], float]] = [
        {sv: 0.0 for sv in levels[_BC_DEPTH]}
    ]
    for k in range(_BC_DEPTH - 1, 0, -1):
        prev = all_deltas[-1]
        nxt_level = levels[k + 1]
        dk: dict[tuple[int, int], float] = {}
        for (s, v), sigma in levels[k].items():
            acc = 0.0
            for w in sorted(adj[v]):
                if (s, w) in nxt_level:
                    acc = acc + sigma / nxt_level[(s, w)] * (
                        1.0 + prev[(s, w)]
                    )
            dk[(s, v)] = acc
        all_deltas.append(dk)
    bc = {node: 0.0 for node in nodes_l}
    contribs: dict[int, list[tuple[int, float]]] = {}
    for dk in all_deltas:
        for (s, v), delta in dk.items():
            if s != v:
                contribs.setdefault(v, []).append((s, delta))
    for node, terms in contribs.items():
        acc = 0.0
        for _, delta in sorted(terms):
            acc = acc + delta / 2.0
        bc[node] = acc
    scored = spark.createDataFrame(
        [
            (
                node,
                math.floor(bc[node] * 1000000 + 0.5) / 1000000.0,
                deg.get(node, 0),
            )
            for node in nodes_l
        ],
        "node int, betweenness double, degree long",
    )
    return scored.join(
        F.broadcast(n), scored.node == F.col("n_nationkey")
    ).select(
        F.col("n_name").alias("nation"), "betweenness", "degree"
    )
