"""Snapshot diffing — derive a CDC changelog from two table versions.

The reference CONSUMES Debezium changelogs (op ∈ {c,u,d} envelopes,
``spark-streaming/multi_source_streaming_processor.py:106-124``); it
has no way to PRODUCE one when a source can only hand over periodic
full snapshots (the common "nightly dump" integration). ``snapshot_diff``
closes that loop: given two keyed snapshots it emits exactly the
Debezium op taxonomy — ``c`` (key only in new), ``d`` (key only in
old), ``u`` (key in both, any tracked column changed) — so downstream
CDC consumers (lake upsert, SCD2, rollup) work unchanged from a
snapshot-only source.

Scale design: one full-outer shuffle join on the key — the minimum
possible for a diff; both sides prune to key + tracked columns at the
scan (ReadSchema), unchanged rows are dropped before anything wider
is materialized. At 100 TB, pre-bucketing both snapshots on the key
(``save_bucketed``) makes the join zero-exchange; the null-safe
equality on tracked columns is pure codegen.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    tracked: Sequence[str],
) -> DataFrame:
    """Changelog between two snapshots of a keyed table.

    Returns one row per created / deleted / changed key with columns:
    ``*keys``, ``op`` ('c'|'u'|'d'), and ``old_<c>`` / ``new_<c>`` for
    every tracked column. Keys present in both snapshots with all
    tracked columns null-safe-equal produce no row.
    """
    keys = list(keys)
    tracked = list(tracked)
    o = old.select(
        *[F.col(k).alias(f"_ok_{k}") for k in keys],
        *[F.col(c).alias(f"old_{c}") for c in tracked],
    )
    n = new.select(
        *[F.col(k).alias(f"_nk_{k}") for k in keys],
        *[F.col(c).alias(f"new_{c}") for c in tracked],
    )
    cond = [o[f"_ok_{k}"] == n[f"_nk_{k}"] for k in keys]
    joined = o.join(n, cond, "full_outer")

    in_old = F.col(f"_ok_{keys[0]}").isNotNull()
    in_new = F.col(f"_nk_{keys[0]}").isNotNull()
    changed = F.lit(False)
    for c in tracked:
        # null-safe inequality: NOT (old <=> new)
        changed = changed | ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))

    op = (
        F.when(in_old & in_new & changed, F.lit("u"))
        .when(in_old & ~in_new, F.lit("d"))
        .when(~in_old & in_new, F.lit("c"))
    )
    out_keys = [
        F.coalesce(F.col(f"_nk_{k}"), F.col(f"_ok_{k}")).alias(k) for k in keys
    ]
    return (
        joined.withColumn("op", op)
        .filter(F.col("op").isNotNull())
        .select(
            *out_keys,
            "op",
            *[f"old_{c}" for c in tracked],
            *[f"new_{c}" for c in tracked],
        )
    )
