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
