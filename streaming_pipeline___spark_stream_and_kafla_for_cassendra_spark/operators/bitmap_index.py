"""Materialized bitmap index: exact distinct counts over arbitrary
date ranges without rescanning facts.

``count(DISTINCT id)`` has no mergeable partial — per-day distinct
counts cannot be added across days. Sketches (HLL) fix mergeability
but surrender exactness. Bitmap state gives both: per-day bitmaps of
the id space are re-aggregatable (bitwise OR across any set of days)
AND their popcount is exact — the Snowflake / ClickHouse / Druid
bitmap-index pattern, built here from Spark 3.5's native
``bitmap_bucket_number`` / ``bitmap_bit_position`` /
``bitmap_construct_agg`` / ``bitmap_or_agg`` / ``bitmap_count``
functions (pure JVM aggregates, map-side combinable).

Layout and scale story:

* one row per (date, key..., bucket) — each bucket covers 2³² bits
  of id space as a fixed 4 KB blob, so index size is
  #days × #groups × #occupied-buckets, independent of fact rows;
* the index is date-partitioned parquet: a range query reads ONLY
  its partitions (pruning asserted in tests) and ORs
  #days × #buckets blobs — never touches the fact table;
* refresh is per-day overwrite (idempotent rebuild of the touched
  day), the same touched-partition discipline as the lake sinks.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class BitmapDistinctIndex:
    """Date-partitioned exact-distinct bitmap index over one id col."""

    path: str
    time_col: str = "ts"
    id_col: str = "user_id"
    keys: tuple[str, ...] = ("event_type",)

    def build(self, base: DataFrame) -> None:
        """Full build: one aggregation of the fact table into
        per-(date, keys, bucket) bitmaps."""
        day = F.to_date(F.col(self.time_col)).alias("index_date")
        bitmaps = base.groupBy(
            day,
            *self.keys,
            F.expr(f"bitmap_bucket_number({self.id_col})").alias("bucket"),
        ).agg(
            F.expr(
                f"bitmap_construct_agg(bitmap_bit_position({self.id_col}))"
            ).alias("bm"),
            F.count("*").alias("n_rows"),
        )
        bitmaps.write.mode("overwrite").partitionBy("index_date").parquet(self.path)

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.path)

    def refresh_day(self, base_day: DataFrame, spark: SparkSession, day) -> None:
        """Idempotent single-day rebuild (late/corrected data): only
        that partition is overwritten."""
        day_lit = str(day)
        scoped = base_day.filter(
            F.to_date(F.col(self.time_col)) == F.lit(day_lit).cast("date")
        )
        bitmaps = scoped.groupBy(
            F.to_date(F.col(self.time_col)).alias("index_date"),
            *self.keys,
            F.expr(f"bitmap_bucket_number({self.id_col})").alias("bucket"),
        ).agg(
            F.expr(
                f"bitmap_construct_agg(bitmap_bit_position({self.id_col}))"
            ).alias("bm"),
            F.count("*").alias("n_rows"),
        )
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            bitmaps.write.mode("overwrite").partitionBy("index_date").parquet(
                self.path
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    # -- incremental maintenance (streaming foreachBatch) --------------

    def merge_batch(
        self, batch: DataFrame, spark: SparkSession, batch_id: int | None = None
    ) -> None:
        """Fold one micro-batch into the stored index. Bitmap OR is
        the mergeable operation, so per-batch bitmaps combine with
        the stored ones exactly; only the days the batch touches are
        rewritten, and a commit marker makes foreachBatch replays
        no-ops (n_rows would otherwise double-count — OR itself is
        idempotent, the ledger protects the row counter)."""
        if batch_id is not None and self._committed(batch_id):
            return
        if len(batch.take(1)) == 0:
            self._commit(batch_id)
            return
        incoming = batch.groupBy(
            F.to_date(F.col(self.time_col)).alias("index_date"),
            *self.keys,
            F.expr(f"bitmap_bucket_number({self.id_col})").alias("bucket"),
        ).agg(
            F.expr(
                f"bitmap_construct_agg(bitmap_bit_position({self.id_col}))"
            ).alias("bm"),
            F.count("*").alias("n_rows"),
        )
        from ..streaming.lake import path_has_data

        if path_has_data(spark, self.path):
            touched = [
                r[0] for r in incoming.select("index_date").distinct().collect()
            ]
            existing = self.read(spark).filter(
                F.col("index_date").isin(touched)
            )
            merged = existing.unionByName(incoming).groupBy(
                "index_date", *self.keys, "bucket"
            ).agg(
                F.expr("bitmap_or_agg(bm)").alias("bm"),
                F.sum("n_rows").alias("n_rows"),
            )
        else:
            merged = incoming
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            merged.write.mode("overwrite").partitionBy("index_date").parquet(
                self.path
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        self._commit(batch_id)

    def _marker(self, batch_id: int) -> str:
        return os.path.join(self.path, "_bitmap_commits", str(batch_id))

    def _committed(self, batch_id: int) -> bool:
        return os.path.exists(self._marker(batch_id))

    def _commit(self, batch_id: int | None) -> None:
        if batch_id is None:
            return
        os.makedirs(os.path.dirname(self._marker(batch_id)), exist_ok=True)
        with open(self._marker(batch_id), "w", encoding="utf-8"):
            pass

    def distinct_over(
        self,
        spark: SparkSession,
        date_from,
        date_to,
        by_keys: bool = True,
    ) -> DataFrame:
        """Exact distinct ids in [date_from, date_to] — per key group
        (default) or overall — by OR-merging stored day bitmaps.
        Partition pruning keeps the read to the range's partitions."""
        idx = self.read(spark).filter(
            (F.col("index_date") >= F.lit(str(date_from)).cast("date"))
            & (F.col("index_date") <= F.lit(str(date_to)).cast("date"))
        )
        group = list(self.keys) if by_keys else []
        merged = idx.groupBy(*group, "bucket").agg(
            F.expr("bitmap_or_agg(bm)").alias("bm"),
            F.sum("n_rows").alias("n_rows"),
        )
        agg = merged.groupBy(*group).agg(
            F.sum(F.expr("bitmap_count(bm)")).alias("distinct_ids"),
            F.sum("n_rows").alias("n_rows"),
        )
        return agg


def write_stream_to_bitmap_index(
    df: DataFrame,
    index: BitmapDistinctIndex,
    checkpoint_root: str,
    processing_time: str | None = "30 seconds",
    available_now: bool = False,
):
    """Stream → incrementally-maintained bitmap index via foreachBatch
    (same touched-partition + commit-ledger discipline as the rollup
    sink). No watermark needed: state lives in the table, and a late
    row ORs into its old day's bitmaps exactly like an on-time one."""
    spark = df.sparkSession

    def sink(batch: DataFrame, batch_id: int) -> None:
        index.merge_batch(batch, spark, batch_id=batch_id)

    writer = (
        df.writeStream.foreachBatch(sink)
        .option(
            "checkpointLocation",
            os.path.join(
                checkpoint_root, f"bmidx-{os.path.basename(index.path)}"
            ),
        )
        .outputMode("update")
        .queryName(f"bmidx-{os.path.basename(index.path)}")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()
