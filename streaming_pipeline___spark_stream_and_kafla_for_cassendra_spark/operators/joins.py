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
    direction: str = "backward",
) -> DataFrame:
    """Inclusive as-of join, backward (default) or forward.

    ``direction="backward"``: for every left row, attach the right row
    with the greatest ``right_ts`` ≤ ``left_ts`` within the same
    ``on`` key group — equivalent of DuckDB/pandas ``ASOF LEFT JOIN``.
    ``direction="forward"``: smallest ``right_ts`` ≥ ``left_ts`` (the
    "next reading at or after" enrichment, e.g. first quote published
    after an order).

    Implementation: tag both sides, union by key, then a single
    partition-sorted window pass carrying the last-seen right row
    forward (``last(..., ignorenulls=True)``). Right rows sort before
    left rows at identical timestamps so the match is inclusive; the
    forward variant just flips the time sort. Either direction costs
    one shuffle + one sort — never a range cross-join.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
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
    ts_order = (
        F.col("_asof_ts").asc() if direction == "backward" else F.col("_asof_ts").desc()
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_order, F.col("_side").asc())
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


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Interval × interval overlap join without an equi-key.

    Matches every (L, R) pair with ``L.start ≤ R.end AND
    R.start ≤ L.end`` (closed-interval overlap). The naive plan is a
    BroadcastNestedLoopJoin over the bare theta condition —
    O(|L|·|R|). Here BOTH sides explode into the coarse time buckets
    they cover and meet in a hash equi-join on bucket id; the exact
    overlap predicate filters inside the join.

    An overlapping pair shares every bucket in the overlap region, so
    naive bucketing would emit duplicates. Each pair is emitted
    exactly once by keeping only the FIRST shared bucket — the bucket
    containing ``greatest(L.start, R.start)``, which both sides cover
    by definition — so no post-join distinct (a full extra shuffle at
    scale) is needed. Cost is O((|L|+|R|)·w/bucket + matches); AQE
    skew splitting absorbs hot buckets.
    """
    epoch = lambda c: F.col(c).cast("timestamp").cast("long")  # noqa: E731

    def explode_side(df, start, end):
        return df.withColumn(
            "_bucket",
            F.explode(
                F.sequence(
                    F.floor(epoch(start) / bucket_seconds),
                    F.floor(epoch(end) / bucket_seconds),
                )
            ),
        )

    lb = explode_side(left, left_start, left_end)
    rb = explode_side(right, right_start, right_end)
    first_shared = F.floor(
        F.greatest(epoch(left_start), epoch(right_start)) / bucket_seconds
    )
    return (
        lb.join(rb, "_bucket")
        .filter(
            (F.col(left_start) <= F.col(right_end))
            & (F.col(right_start) <= F.col(left_end))
            & (F.col("_bucket") == first_shared)
        )
        .drop("_bucket")
    )
