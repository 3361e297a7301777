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
    the cascade erases, each derived from ONE left-semi join of the
    table against its parent's (distinct, key-sized) affected keys.
    Edges are re-processed until the reachable set closes, so
    multi-hop chains resolve in any edge order; the FK graph must be
    acyclic (FK graphs are).
    """
    affected: dict[str, DataFrame] = {
        root_table: tables[root_table].join(
            F.broadcast(
                roots.select(F.col(roots.columns[0]).alias(root_key))
            ),
            on=root_key,
            how="left_semi",
        )
    }
    for _ in range(len(edges) + 1):
        grew = False
        for parent, pkey, child, cfk in edges:
            if parent not in affected or child in affected:
                continue
            parent_keys = (
                affected[parent].select(F.col(pkey).alias(cfk)).distinct()
            )
            affected[child] = tables[child].join(
                F.broadcast(parent_keys), on=cfk, how="left_semi"
            )
            grew = True
        if not grew:
            break
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
