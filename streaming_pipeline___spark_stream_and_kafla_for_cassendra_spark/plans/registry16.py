"""Round-3 registry additions, batch 3 — iterative graph analytics
with exactly-unrolled oracles.

Same contract as ``registry.py``. Imported at the bottom of
``registry.py``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import _register, _t

_PR_ITERS = 8
_PR_DAMP = 0.85


def _pagerank_oracle(iters: int = _PR_ITERS) -> str:
    """Unrolled PageRank twin: DuckDB disallows aggregation in a
    recursive term, so the fixed iteration count is unrolled into
    ``iters`` CTE layers. Every float op is pinned: per-node incoming
    contributions fold in src order (list_reduce ≡ F.aggregate over
    an array_sort'ed collect_list), and literals are cast to DOUBLE
    so DuckDB's DECIMAL literals can't change the arithmetic."""
    edge_cte = """
    e AS MATERIALIZED (
      SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
             CAST(count(*) AS BIGINT) AS w
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE c.c_nationkey <> s.s_nationkey
      GROUP BY 1, 2
    ),
    outw AS (SELECT src, CAST(sum(w) AS BIGINT) AS ow FROM e GROUP BY 1),
    inw AS (SELECT dst, CAST(count(*) AS BIGINT) AS ie FROM e GROUP BY 1),
    nodes AS (SELECT DISTINCT src AS node FROM e),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
    r0 AS (SELECT node, CAST(1.0 AS DOUBLE) / nn.n AS r
           FROM nodes CROSS JOIN nn)"""
    layers = []
    for i in range(iters):
        layers.append(f"""
    r{i + 1} AS (
      SELECT nd.node,
             CAST(0.15 AS DOUBLE) / nn.n
               + CAST(0.85 AS DOUBLE) * coalesce(f.inc, 0.0) AS r
      FROM nodes nd CROSS JOIN nn
      LEFT JOIN (
        SELECT e.dst AS node,
               list_reduce(list_prepend(0.0,
                 list(p.r * e.w / ow.ow ORDER BY e.src)),
                 (a, b) -> a + b) AS inc
        FROM e
        JOIN r{i} p ON p.node = e.src
        JOIN outw ow ON ow.src = e.src
        GROUP BY e.dst
      ) f ON f.node = nd.node
    )""")
    return (
        "    WITH"
        + edge_cte
        + ","
        + ",".join(layers)
        + f"""
    SELECT n.n_name AS nation,
           floor(r{iters}.r * 1000000 + 0.5) / 1000000.0 AS pagerank,
           CAST(coalesce(ow.ow, 0) AS BIGINT) AS out_trade_weight,
           CAST(coalesce(iw.ie, 0) AS BIGINT) AS in_edges
    FROM r{iters}
    JOIN nation n ON n.n_nationkey = r{iters}.node
    LEFT JOIN outw ow ON ow.src = r{iters}.node
    LEFT JOIN inw iw ON iw.dst = r{iters}.node
    """
    )


@_register(
    "pagerank_nation_trade",
    _pagerank_oracle(),
    "Weighted PageRank over the nation trade graph (customer nation → "
    "supplier nation, edge weight = lineitem count, damping 0.85, "
    f"{_PR_ITERS} fixed iterations): the graph-centrality operator "
    "completing the BFS / connected-components / k-core / label-"
    "propagation / clustering-coefficient family. Per-iteration plan "
    "is one edge⋈rank join + one dst-keyed aggregate (shuffles keyed "
    "on node, lineage pinned with localCheckpoint like the CC "
    "operators); incoming contributions fold in src order so every "
    "double matches DuckDB's unrolled-CTE twin bit-for-bit. The "
    "fixture graph has no dangling nodes (all 25 nations export), "
    "so no teleport-mass correction is needed",
    ("graph", "pagerank", "iterative", "lineitem"),
)
def pagerank_nation_trade(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")

    e = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .groupBy(
            F.col("c_nationkey").alias("src"),
            F.col("s_nationkey").alias("dst"),
        )
        .agg(F.count("*").alias("w"))
        .localCheckpoint(eager=False)
    )
    # One fact scan builds the ≤ nation² weighted edge list; the
    # PageRank iterations over that bounded graph ran distributed
    # (~60 tiny AQE stage-jobs of pure scheduling — measured round 8)
    # and are now a driver loop with the identical src-sorted
    # contribution fold: same IEEE-754 ops in the same order, so
    # every double is bit-identical to the distributed form and the
    # unrolled-CTE oracle. Node/edge counts bound the driver work
    # (graph nodes, never rows).
    import math

    rows = e.collect()
    out_w: dict[int, int] = {}
    in_edges_cnt: dict[int, int] = {}
    incoming: dict[int, list[tuple[int, int]]] = {}
    for row in rows:
        src, dst, w = row["src"], row["dst"], row["w"]
        out_w[src] = out_w.get(src, 0) + w
        in_edges_cnt[dst] = in_edges_cnt.get(dst, 0) + 1
        incoming.setdefault(dst, []).append((src, w))
    nodes_l = sorted(out_w)
    nf = float(len(nodes_l))
    rank = {u: 1.0 / nf for u in nodes_l}
    for _ in range(_PR_ITERS):
        nxt = {}
        for node in nodes_l:
            inc = 0.0
            for src, w in sorted(incoming.get(node, [])):
                inc = inc + rank[src] * w / out_w[src]
            nxt[node] = 0.15 / nf + 0.85 * inc
        rank = nxt
    scored = spark.createDataFrame(
        [
            (
                node,
                math.floor(rank[node] * 1000000 + 0.5) / 1000000.0,
                out_w[node],
                in_edges_cnt.get(node, 0),
            )
            for node in nodes_l
        ],
        "node int, pagerank double, out_trade_weight long, "
        "in_edges long",
    )
    return scored.join(
        F.broadcast(n), scored.node == F.col("n_nationkey")
    ).select(
        F.col("n_name").alias("nation"),
        "pagerank",
        "out_trade_weight",
        "in_edges",
    )


_MK_ITERS = 16


def _markov_conv_oracle(iters: int = _MK_ITERS) -> str:
    """Unrolled value-iteration twin (no aggregates allowed in a
    DuckDB recursive term): every probability is an integer-count
    ratio, every fold is t-ordered, every literal DOUBLE-cast."""
    head = """
    seq AS (
      SELECT user_id, event_type AS s,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts)
               AS t
      FROM events
    ),
    pairs AS (SELECT s, coalesce(t, '__END__') AS t FROM seq
              WHERE s <> 'purchase'),
    cnt AS (SELECT s, t, CAST(count(*) AS BIGINT) AS n
            FROM pairs GROUP BY 1, 2),
    outs AS (SELECT s, CAST(sum(n) AS BIGINT) AS o FROM cnt GROUP BY 1),
    states AS (SELECT DISTINCT s FROM cnt),
    v0 AS (SELECT s, CAST(0.0 AS DOUBLE) AS v FROM states)"""
    layers = []
    for i in range(iters):
        layers.append(f"""
    v{i + 1} AS (
      SELECT st.s, coalesce(f.val, 0.0) AS v
      FROM states st LEFT JOIN (
        SELECT c.s,
               list_reduce(list_prepend(0.0,
                 list((CAST(c.n AS DOUBLE) / o.o)
                      * CASE WHEN c.t = 'purchase' THEN CAST(1.0 AS DOUBLE)
                             WHEN c.t = '__END__' THEN CAST(0.0 AS DOUBLE)
                             ELSE coalesce(p.v, 0.0) END
                      ORDER BY c.t)),
                 (a, b) -> a + b) AS val
        FROM cnt c
        JOIN outs o ON o.s = c.s
        LEFT JOIN v{i} p ON p.s = c.t
        GROUP BY c.s
      ) f ON f.s = st.s
    )""")
    return (
        "    WITH"
        + head
        + ","
        + ",".join(layers)
        + f"""
    SELECT v{iters}.s AS state,
           o.o AS n_transitions,
           floor(coalesce(
             (SELECT CAST(c2.n AS DOUBLE) / o.o FROM cnt c2
              WHERE c2.s = v{iters}.s AND c2.t = 'purchase'), 0.0)
             * 1000000 + 0.5) / 1000000.0 AS p_direct,
           floor(v{iters}.v * 1000000 + 0.5) / 1000000.0 AS conv_prob
    FROM v{iters} JOIN outs o ON o.s = v{iters}.s
    """
    )


@_register(
    "markov_conversion_probability",
    _markov_conv_oracle(),
    "Absorbing-Markov-chain conversion probability per event state — "
    "the principled companion to last-touch / position-based "
    "attribution: consecutive same-user events form a first-order "
    "chain, 'purchase' absorbs with value 1, sequence end absorbs "
    f"with 0, and {_MK_ITERS} fixed value-iteration steps give each "
    "transient state its eventual-conversion probability. "
    "Transition probabilities are exact integer-count ratios; the "
    "per-state expectation folds in next-state order, so all "
    f"{_MK_ITERS} iterations bit-match DuckDB's unrolled-CTE twin. "
    "Plan: one user-keyed lead window + a states²-sized iteration "
    "(state space = event types, never rows)",
    ("graph", "markov", "attribution", "iterative", "events"),
)
def markov_conversion_probability(spark, sf_dir):
    import math

    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    seq = e.select(
        F.col("event_type").alias("s"),
        F.lead("event_type").over(w).alias("t"),
    )
    pairs = seq.filter(F.col("s") != "purchase").select(
        "s", F.coalesce(F.col("t"), F.lit("__END__")).alias("t")
    )
    cnt = pairs.groupBy("s", "t").agg(F.count("*").alias("n"))
    # The chain's state space is the event-type enum — states², not
    # rows, and the transition table is one map-side-combinable
    # count aggregate. The 16 value-iteration steps over that tiny
    # table used to run distributed (16 joins + 16 checkpointed
    # folds = ~100 AQE stage-jobs, 4-6 s of pure scheduling at any
    # input size — measured round 8). They are a driver-side loop
    # over ≤ states² doubles: same IEEE-754 ops in the same t-sorted
    # fold order, so the result is bit-identical to the distributed
    # form and to the unrolled-CTE oracle. Guarded: an unbounded
    # state universe (not an enum) would fall back to the
    # distributed loop rather than collect.
    # LIMIT-bounded decide-then-use (ADVICE r8): collecting at most
    # 4097 rows bounds driver memory BEFORE we know the universe is
    # enum-sized; >4096 rows means non-enum states — take the
    # distributed fallback instead of ever collecting the full table.
    rows = cnt.limit(4097).collect()
    if len(rows) > 4096:
        return _markov_conv_distributed(spark, cnt)
    outs: dict[str, int] = {}
    trans: dict[str, list[tuple[str, int]]] = {}
    n_dir: dict[str, int] = {}
    for r in rows:
        outs[r["s"]] = outs.get(r["s"], 0) + r["n"]
        trans.setdefault(r["s"], []).append((r["t"], r["n"]))
        if r["t"] == "purchase":
            n_dir[r["s"]] = r["n"]
    v = {s: 0.0 for s in trans}
    for _ in range(_MK_ITERS):
        nv = {}
        for s, ts in trans.items():
            acc = 0.0
            for t, n in sorted(ts):
                p = n / outs[s]
                if t == "purchase":
                    term = p * 1.0
                elif t == "__END__":
                    term = p * 0.0
                else:
                    term = p * v.get(t, 0.0)
                acc = acc + term
            nv[s] = acc
        v = nv

    def r6(x: float) -> float:
        return math.floor(x * 1000000 + 0.5) / 1000000.0

    out = [
        (
            s,
            outs[s],
            r6(n_dir[s] / outs[s]) if s in n_dir else 0.0,
            r6(v[s]),
        )
        for s in sorted(trans)
    ]
    return spark.createDataFrame(
        out,
        "state string, n_transitions long, p_direct double, "
        "conv_prob double",
    )


def _markov_conv_distributed(spark, cnt):
    """Distributed value iteration — the fallback when the state
    universe is not enum-sized (never at the fixture scales; kept
    for posture at arbitrary cardinality)."""
    cnt = cnt.localCheckpoint(eager=False)
    outs = cnt.groupBy("s").agg(F.sum("n").alias("o"))
    states = cnt.select("s").distinct()
    ct = cnt.join(outs, "s").select(
        "s", "t", (F.col("n").cast("double") / F.col("o")).alias("p")
    ).localCheckpoint(eager=False)

    v = states.withColumn("v", F.lit(0.0)).localCheckpoint(eager=False)
    for _ in range(_MK_ITERS):
        prev = v.select(F.col("s").alias("ps"), F.col("v").alias("pv"))
        term = ct.join(prev, ct.t == prev.ps, "left").select(
            "s",
            "t",
            (
                F.col("p")
                * F.when(F.col("t") == "purchase", F.lit(1.0))
                .when(F.col("t") == "__END__", F.lit(0.0))
                .otherwise(F.coalesce(F.col("pv"), F.lit(0.0)))
            ).alias("term"),
        )
        folded = term.groupBy("s").agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("t", "term"))),
                F.lit(0.0),
                lambda a, x: a + x["term"],
            ).alias("val")
        )
        v = (
            states.join(folded, "s", "left")
            .select("s", F.coalesce(F.col("val"), F.lit(0.0)).alias("v"))
            .localCheckpoint(eager=False)
        )

    direct = cnt.filter(F.col("t") == "purchase").select(
        "s", F.col("n").alias("n_dir")
    )
    r6 = lambda c: F.floor(c * 1000000 + F.lit(0.5)) / F.lit(1000000.0)  # noqa: E731
    return (
        v.join(outs, "s")
        .join(direct, "s", "left")
        .select(
            F.col("s").alias("state"),
            F.col("o").cast("long").alias("n_transitions"),
            r6(
                F.coalesce(
                    F.col("n_dir").cast("double") / F.col("o"), F.lit(0.0)
                )
            ).alias("p_direct"),
            r6(F.col("v")).alias("conv_prob"),
        )
    )


@_register(
    "runtime_filter_asia_revenue",
    """
    SELECT n.n_name AS nation,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(floor(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY 1
    """,
    "Dynamic runtime filter (dimension-to-fact pushdown): the ASIA "
    "customer keys collect once (broadcast-build cost class) and "
    "push into the orders scan as an In predicate via scale.py::"
    "runtime_in_filter — non-qualifying orders die inside the scan's "
    "codegen stage BEFORE the join shuffle, the generalization of "
    "dynamic partition pruning to arbitrary keys; above the key-set "
    "guard the operator degrades to a broadcast semi-join with the "
    "identical result. The oracle states the plain four-table join "
    "truth; revenue is exact integer cents",
    ("scale", "runtime-filter", "join", "orders"),
)
def runtime_filter_asia_revenue(spark, sf_dir):
    from ..operators.scale import runtime_in_filter

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    dim = (
        c.join(
            F.broadcast(
                n.join(
                    F.broadcast(r.filter(F.col("r_name") == "ASIA")),
                    n.n_regionkey == r.r_regionkey,
                )
            ),
            c.c_nationkey == F.col("n_nationkey"),
        )
        .select("c_custkey", "n_name")
    )
    filtered = runtime_in_filter(o, dim, "o_custkey", "c_custkey")
    cents = F.floor(F.col("o_totalprice") * 100).cast("long")
    return (
        filtered.join(
            F.broadcast(dim), filtered.o_custkey == dim.c_custkey
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(cents).alias("revenue_cents"),
        )
    )
