"""Compliance cascade planning (GDPR/CCPA right-to-erasure at scale).

The reference pipeline lands CDC rows in lake tables keyed by record
id; an erasure request arrives as ROOT keys (a user, a customer) and
must remove every dependent row across the table graph. Scanning each
table for ad-hoc predicates per request does not scale; the cascade
is a foreign-key walk, and each step is a LEFT SEMI join — the
join build sides are key-sized (erasure batches, broadcastable)
while every fact table is touched exactly once.

``cascade_plan`` derives the affected-row frame per table;
``cascade_tombstones`` marks such a frame as the delete batch
:meth:`~..streaming.lake.LakeTable.upsert_batch` consumes (winning
tombstones persist as markers, so replayed pre-erasure CDC cannot
resurrect erased keys — the compliance property).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cascade_plan(
    tables: dict[str, DataFrame],
    edges: list[tuple[str, str, str, str]],
    roots: DataFrame,
    root_table: str,
    root_key: str,
) -> dict[str, DataFrame]:
    """Walk the FK graph from erasure roots to every dependent table.

    ``edges`` entries are ``(parent_table, parent_key, child_table,
    child_fk)``; ``roots`` is a one-column frame of root key values.
    Returns ``{table: affected-row frame}`` — each table's rows that
    the cascade erases. Tables are resolved in TOPOLOGICAL order of
    the FK graph, so every parent's affected set is final before any
    of its children is derived, and a child with multiple cascading
    in-edges (a diamond) takes the OR of ALL of them — rows reachable
    only via the second parent are erased too, which is the whole
    compliance property. A single in-edge is one left-semi join; a
    multi-in-edge child is one scan with one broadcast left join per
    in-edge (distinct key build sides, so no row fan-out) filtered on
    any-hit. The FK graph must be acyclic (FK graphs are); a cyclic
    ``edges`` list raises ``ValueError``.
    """
    nodes = (
        {root_table}
        | {p for p, _, _, _ in edges}
        | {c for _, _, c, _ in edges}
    )
    indeg = {n: 0 for n in nodes}
    for _, _, child, _ in edges:
        indeg[child] += 1
    frontier = sorted(n for n in nodes if indeg[n] == 0)
    topo: list[str] = []
    while frontier:
        n = frontier.pop(0)
        topo.append(n)
        for _, _, child, _ in (e for e in edges if e[0] == n):
            indeg[child] -= 1
            if indeg[child] == 0:
                frontier.append(child)
    if len(topo) < len(nodes):
        raise ValueError(
            "cascade_plan requires an acyclic FK graph; cycle through: "
            + ", ".join(sorted(n for n in nodes if n not in set(topo)))
        )

    affected: dict[str, DataFrame] = {
        root_table: tables[root_table].join(
            F.broadcast(
                roots.select(F.col(roots.columns[0]).alias(root_key))
            ),
            on=root_key,
            how="left_semi",
        )
    }
    for node in topo:
        if node == root_table:
            continue
        in_edges = [
            (p, pk, fk)
            for p, pk, c, fk in edges
            if c == node and p in affected
        ]
        if not in_edges:
            continue
        if len(in_edges) == 1:
            parent, pkey, cfk = in_edges[0]
            parent_keys = (
                affected[parent].select(F.col(pkey).alias(cfk)).distinct()
            )
            affected[node] = tables[node].join(
                F.broadcast(parent_keys), on=cfk, how="left_semi"
            )
            continue
        # Diamond: OR the in-edges. Left joins against DISTINCT key
        # frames never duplicate child rows (at most one match each),
        # so any-hit filtering is exactly the union of the semi-joins
        # WITHOUT a full-row distinct (which would collapse genuine
        # duplicate rows in the child table).
        frame = tables[node]
        hit_cols: list[str] = []
        for i, (parent, pkey, cfk) in enumerate(in_edges):
            hit = f"_cascade_hit_{i}"
            keys = (
                affected[parent]
                .select(F.col(pkey).alias(cfk))
                .distinct()
                .withColumn(hit, F.lit(True))
            )
            frame = frame.join(F.broadcast(keys), on=cfk, how="left")
            hit_cols.append(hit)
        pred = F.col(hit_cols[0]).isNotNull()
        for h in hit_cols[1:]:
            pred = pred | F.col(h).isNotNull()
        affected[node] = frame.where(pred).drop(*hit_cols).select(
            *tables[node].columns
        )
    return affected


def cascade_tombstones(
    affected_rows: DataFrame,
    delete_col: str = "_is_delete",
) -> DataFrame:
    """Full-row tombstone batch for a lake upsert: a ``cascade_plan``
    entry with ``delete_col`` set — ready for
    ``LakeTable.upsert_batch(..., delete_col=...)`` so each delete
    competes in precombine order and persists as a
    resurrection-blocking marker."""
    return affected_rows.withColumn(delete_col, F.lit(True))
