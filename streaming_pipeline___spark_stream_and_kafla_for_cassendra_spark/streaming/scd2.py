"""SCD type-2 history lake — versioned upserts with time travel.

The reference's Hudi COW table keeps only the latest row per key
(precombine latest-wins, ``multi_source_streaming_processor.py:264-266``);
``LakeTable`` reproduces that. This module adds the warehouse pattern
the reference lacks: every version preserved with a validity interval
(``_valid_from``/``_valid_to``), plus an as-of read for time travel.

Layout (two layers so closure never rewrites history):

* ``current/`` — exactly one open row per key (``_valid_to`` IS NULL),
  hash-bucketed on the record key; an upsert rewrites only the
  buckets its keys land in (dynamic partition overwrite), the same
  touched-partition discipline as ``LakeTable``.
* ``history/`` — append-only closed versions; a version is written
  once when superseded and never touched again.

Scale notes: the per-batch work is one window over the batch's keys
(intra-batch version chaining), one semi/anti split of the touched
buckets, and an append — no global rewrite at any table size. Late
(out-of-order) versions are rejected per key rather than silently
interleaved: CDC feeds deliver per-key ordered changes (Debezium WAL
order), so an older-than-current version indicates replay or skew and
is dropped idempotently.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .lake import path_has_data

VALID_FROM = "_valid_from"
VALID_TO = "_valid_to"
BUCKET = "_bucket"


@dataclass
class Scd2Table:
    path: str
    record_key: str = "id"
    precombine_field: str = "processing_timestamp"
    n_buckets: int = 16

    # -- paths ----------------------------------------------------------

    @property
    def _current_path(self) -> str:
        return os.path.join(self.path, "current")

    @property
    def _history_path(self) -> str:
        return os.path.join(self.path, "history")

    def _exists(self, spark: SparkSession, path: str) -> bool:
        return path_has_data(spark, path)

    def _bucketed(self, df: DataFrame) -> DataFrame:
        return df.withColumn(
            BUCKET, F.pmod(F.xxhash64(F.col(self.record_key)), self.n_buckets)
        )

    # -- reads ----------------------------------------------------------

    def read_current(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self._current_path).drop(BUCKET)

    def read_history(self, spark: SparkSession) -> DataFrame:
        """All versions, open and closed."""
        cur = self.read_current(spark)
        if self._exists(spark, self._history_path):
            hist = spark.read.parquet(self._history_path)
            return hist.unionByName(cur, allowMissingColumns=True)
        return cur

    def read_as_of(self, spark: SparkSession, ts) -> DataFrame:
        """Rows as they were valid at ``ts``:
        _valid_from <= ts < coalesce(_valid_to, +inf)."""
        t = F.lit(ts).cast("timestamp")
        return self.read_history(spark).filter(
            (F.col(VALID_FROM) <= t)
            & (F.col(VALID_TO).isNull() | (F.col(VALID_TO) > t))
        )

    # -- upsert ---------------------------------------------------------

    def upsert_batch(self, batch: DataFrame, spark: SparkSession) -> None:
        if len(batch.take(1)) == 0:
            return
        key, pre = self.record_key, self.precombine_field
        w = Window.partitionBy(key).orderBy(F.col(pre).asc())
        versioned = (
            batch.withColumn(VALID_FROM, F.col(pre).cast("timestamp"))
            .withColumn(VALID_TO, F.lead(VALID_FROM).over(w))
            .localCheckpoint(eager=False)
        )

        if not self._exists(spark, self._current_path):
            intra_closed = versioned.filter(F.col(VALID_TO).isNotNull())
            newest = versioned.filter(F.col(VALID_TO).isNull())
            if len(intra_closed.take(1)) > 0:
                intra_closed.write.mode("append").parquet(self._history_path)
            (
                self._bucketed(newest)
                # hash-distribute on the bucket before the partitioned
                # write (guide §6): without it every input task
                # writes a file into every bucket it touches —
                # n_tasks × n_buckets small files per upsert.
                .repartition(self.n_buckets, F.col(BUCKET))
                .write.partitionBy(BUCKET)
                .mode("overwrite")
                .parquet(self._current_path)
            )
            return

        # reject versions not newer than the key's current open version
        cur_all = spark.read.parquet(self._current_path)
        cur_from = cur_all.select(
            F.col(key).alias("_k"), F.col(VALID_FROM).alias("_cur_from")
        )
        fresh = (
            versioned.join(
                cur_from, versioned[key] == cur_from["_k"], "left"
            )
            .filter(
                F.col("_cur_from").isNull()
                | (F.col(VALID_FROM) > F.col("_cur_from"))
            )
            .drop("_k", "_cur_from")
            .localCheckpoint(eager=False)
        )
        intra_closed = fresh.filter(F.col(VALID_TO).isNotNull())
        newest = fresh.filter(F.col(VALID_TO).isNull())

        # touched buckets only: close superseded current rows there.
        # A key's current row closes at the EARLIEST fresh version
        # (intra-batch chaining covers the rest of the interval).
        first_new = self._bucketed(
            fresh.groupBy(F.col(key).alias("_k")).agg(
                F.min(VALID_FROM).alias("_new_from")
            ).withColumnRenamed("_k", key)
        ).select(
            F.col(key).alias("_k"), "_new_from", BUCKET
        )
        # one action doubles as the fresh-emptiness check (was a
        # separate take(1) before the bucket collect)
        touched_buckets = [
            r[0] for r in first_new.select(BUCKET).distinct().collect()
        ]
        if not touched_buckets:
            return
        first_new = first_new.drop(BUCKET)
        cur_touched = cur_all.filter(F.col(BUCKET).isin(touched_buckets))
        joined = cur_touched.join(
            first_new, cur_touched[key] == first_new["_k"], "left"
        )
        closed = (
            joined.filter(F.col("_k").isNotNull())
            .withColumn(VALID_TO, F.col("_new_from"))
            .drop("_k", "_new_from", BUCKET)
        )
        kept_in_bucket = joined.filter(F.col("_k").isNull()).drop(
            "_k", "_new_from"
        )

        closed_out = closed.unionByName(
            intra_closed, allowMissingColumns=True
        )
        if len(closed_out.take(1)) > 0:
            closed_out.write.mode("append").parquet(self._history_path)

        new_current = kept_in_bucket.unionByName(
            self._bucketed(newest), allowMissingColumns=True
        )
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                new_current.repartition(self.n_buckets, F.col(BUCKET))
                .write.partitionBy(BUCKET)
                .mode("overwrite")
                .parquet(self._current_path)
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def write_stream_to_scd2(
    df: DataFrame,
    table: Scd2Table,
    checkpoint_root: str,
    processing_time: str | None = "2 minutes",
    available_now: bool = False,
):
    """Stream → SCD2 history lake via foreachBatch (same trigger and
    checkpoint contract as ``write_stream_to_lake``; replays of a
    committed batch are idempotent because stale versions drop)."""
    spark = df.sparkSession

    def sink(batch: DataFrame, batch_id: int) -> None:
        table.upsert_batch(batch, spark)

    writer = (
        df.writeStream.foreachBatch(sink)
        .option(
            "checkpointLocation",
            os.path.join(
                checkpoint_root, f"scd2-{os.path.basename(table.path)}"
            ),
        )
        .queryName(f"scd2-{os.path.basename(table.path)}")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()
