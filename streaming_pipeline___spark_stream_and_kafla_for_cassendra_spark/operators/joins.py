"""Join operators beyond plain equi-joins (SURVEY.md §2.4).

The reference only gestures at joins (FK DDL + a monitoring LEFT
JOIN, `KAFKA_LEARNING_MANUAL.md:459-463`); plain inner/left/semi/anti
need no wrapper — ``df.join`` is already the right call. This module
adds the operators Spark lacks as built-ins:

* ``asof_join`` — "most recent right row at or before the left
  timestamp", the standard event-stream enrichment join.

Scale design: the as-of join is implemented as union + window, NOT a
range cross-join. One shuffle on the join key, one sort per
partition — the same plan a purpose-built as-of merge would do.
A time-bounded range join would explode to |L|·|R| per key before
filtering; this stays linear.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Backward (inclusive) as-of join.

    For every left row, attach the right row with the greatest
    ``right_ts`` ≤ ``left_ts`` within the same ``on`` key group.
    Equivalent of DuckDB/pandas ``ASOF LEFT JOIN``.

    Implementation: tag both sides, union by key, then a single
    partition-sorted window pass carrying the last-seen right row
    forward (``last(..., ignorenulls=True)``). Right rows sort before
    left rows at identical timestamps so "at or before" is inclusive.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys and c != right_ts]

    carried = F.struct(
        F.col(right_ts).alias(f"{right_ts}{suffix}"),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
    )
    r = right.select(
        *keys,
        F.col(right_ts).alias("_asof_ts"),
        F.lit(0).alias("_side"),
        carried.alias("_carried"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in keys],
    )
    l = left.select(
        *keys,
        F.col(left_ts).alias("_asof_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_carried"].dataType).alias("_carried"),
        *[c for c in left.columns if c not in keys],
    )
    unioned = r.unionByName(l)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_asof_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn(
        "_match", F.last("_carried", ignorenulls=True).over(w)
    )
    out = matched.filter(F.col("_side") == 1).select(
        *keys,
        *[c for c in left.columns if c not in keys],
        F.col("_match.*"),
    )
    return out


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Point-in-interval range join without an equi-key.

    Spark turns a bare ``p BETWEEN s AND e`` join condition into
    BroadcastNestedLoopJoin — O(|P|·|I|) comparisons, a non-starter
    when both sides are large. This bucketizes time instead: each
    interval explodes into the coarse buckets it overlaps, each point
    maps to exactly ONE bucket, and the join becomes a hash equi-join
    on bucket id followed by the exact range filter. Cost is
    O(|P| + |I|·w/bucket + matches); each (point, interval) pair
    meets in exactly one bucket, so no post-join dedup is needed.

    Pick ``bucket_seconds`` ≈ the typical interval width: shorter
    buckets shrink the candidate set but fan intervals into more
    bucket rows. Skewed hot buckets are handled by AQE skew-join
    splitting at runtime.
    """
    epoch = lambda c: F.col(c).cast("timestamp").cast("long")  # noqa: E731
    pb = points.withColumn("_bucket", F.floor(epoch(point_col) / bucket_seconds))
    ib = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(epoch(start_col) / bucket_seconds),
                F.floor(epoch(end_col) / bucket_seconds),
            )
        ),
    )
    return (
        pb.join(ib, "_bucket")
        .filter(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) <= F.col(end_col))
        )
        .drop("_bucket")
    )
