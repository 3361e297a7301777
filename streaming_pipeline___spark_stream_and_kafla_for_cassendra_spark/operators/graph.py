"""Graph operators over DataFrame edge lists.

The reference has no graph surface; these are engine additions for
training-data curation at scale (near-dup cluster resolution lives in
``operators/dedup.py::connected_components``; this module adds
importance scoring). Everything is expressed as joins + grouped
aggregations so Catalyst/AQE handle distribution — no GraphFrames
dependency, no driver-side adjacency.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    iterations: int = 5,
    damping: float = 0.85,
) -> DataFrame:
    """Weighted PageRank with a fixed iteration count.

    rank_{t+1}(n) = (1-d) + d * Σ_{m→n} rank_t(m) · w(m,n) / outw(m)

    Returns (node, rank). Fixed iterations (not convergence-tested)
    keep the run deterministic and oracle-comparable.

    Scale notes: per iteration one shuffle join of the edge list with
    the (node, rank) frame — state is 2 columns per node, edges are
    re-read from their lazily-checkpointed frame rather than
    recomputed; lineage is truncated every iteration so the plan stays
    flat. Dangling nodes (no out-edges) contribute nothing; nodes with
    no in-edges settle at (1-d).
    """
    w = F.col(weight).cast("double") if weight else F.lit(1.0)
    e = (
        edges.select(F.col(src).alias("e_src"), F.col(dst).alias("e_dst"), w.alias("w"))
        .localCheckpoint(eager=False)
    )
    outw = e.groupBy("e_src").agg(F.sum("w").alias("ow"))
    # contribution fraction per edge is iteration-invariant: precompute
    frac = (
        e.join(outw, "e_src")
        .select("e_src", "e_dst", (F.col("w") / F.col("ow")).alias("frac"))
        .localCheckpoint(eager=False)
    )
    nodes = (
        e.select(F.col("e_src").alias("node"))
        .union(e.select(F.col("e_dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    ranks = nodes.withColumn("rank", F.lit(1.0))
    for _ in range(iterations):
        acc = (
            frac.join(ranks, frac["e_src"] == ranks["node"])
            .groupBy(F.col("e_dst").alias("node"))
            .agg(F.sum(F.col("rank") * F.col("frac")).alias("acc"))
        )
        ranks = (
            nodes.join(acc, "node", "left")
            .select(
                "node",
                (
                    F.lit(1.0 - damping)
                    + F.lit(damping) * F.coalesce("acc", F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks


def bfs_hops(
    edges: DataFrame,
    source,
    src: str = "src",
    dst: str = "dst",
    max_hops: int = 6,
) -> DataFrame:
    """Unweighted shortest-path hop counts from ``source`` via BFS.

    Frontier-expansion breadth-first search over an undirected edge
    list: round ``h`` joins the current frontier with the edge list
    and keeps previously-unseen endpoints at distance ``h``. Returns
    (node, hops) for every node reachable within ``max_hops``
    (source included at 0).

    Scale notes: per round one shuffle join frontier×edges plus one
    anti-join against the visited set; frontier and visited frames
    carry (node, hops) only. The fixed-round cap keeps the recurrence
    reproducible as a bounded recursive CTE (the oracle pattern of
    :func:`pagerank`/:func:`kcore`); rounds beyond the graph's
    eccentricity are no-ops and exit early on an empty frontier.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    und = (
        e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .filter(F.col("a") != F.col("b"))
        .dropDuplicates()
        .localCheckpoint(eager=False)
    )
    visited = (
        und.sparkSession.createDataFrame([(source, 0)], ["node", "hops"])
        .localCheckpoint(eager=False)
    )
    frontier = visited
    for h in range(1, max_hops + 1):
        nxt = (
            frontier.join(und, frontier["node"] == und["a"])
            .select(F.col("b").alias("node"))
            .dropDuplicates()
            .join(visited, "node", "left_anti")
            .withColumn("hops", F.lit(h))
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=False)
        frontier = nxt
    return visited


def kcore(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    k: int = 3,
    rounds: int = 8,
) -> DataFrame:
    """k-core subgraph via fixed-round iterative peeling.

    Each round removes nodes of degree < ``k`` and restricts the edge
    set to surviving endpoints; the surviving subgraph after
    convergence is the k-core (maximal subgraph with min degree ≥ k).
    Returns (node, core_degree) for surviving nodes.

    Runs AT MOST ``rounds`` rounds with an early stop when the node
    set stabilizes — a fixed-round cap makes the result reproducible
    as an unrolled SQL CTE chain (the oracle pattern shared with
    :func:`pagerank`); stopping early is safe because further rounds
    of a stable set are no-ops. Per round: one degree aggregation and
    one semi-join per side, state is (src, dst) pairs only, lineage
    truncated per round. At 100 TB the degree agg map-side combines
    to #nodes rows and peeling converges in O(max coreness) rounds.
    """
    und = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).filter(
        F.col("a") != F.col("b")
    ).dropDuplicates()
    # undirected: count each edge from both endpoints
    cur = und.unionByName(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).dropDuplicates().localCheckpoint(eager=False)
    prev_n = -1
    for _ in range(rounds):
        deg = cur.groupBy("a").agg(F.count("*").alias("deg"))
        # eager checkpoint materializes keep ONCE; the early-stop count
        # and both semi-joins below read the materialized partitions
        # instead of re-running the degree aggregation (2 jobs -> 1).
        keep = deg.filter(F.col("deg") >= k).select("a").localCheckpoint()
        n_keep = keep.count()
        if n_keep == prev_n:
            break
        prev_n = n_keep
        cur = (
            cur.join(keep, "a", "left_semi")
            .join(keep.withColumnRenamed("a", "b"), "b", "left_semi")
            .localCheckpoint(eager=False)
        )
    return (
        cur.groupBy("a")
        .agg(F.count("*").alias("core_degree"))
        .filter(F.col("core_degree") >= k)
        .select(F.col("a").alias("node"), "core_degree")
    )
