"""Streaming near-duplicate dedup against a persistent MinHash-LSH
index (the streaming tier of corpus dedup).

The batch pair-miners (``operators/dedup.py``) answer "which existing
documents duplicate each other"; a 100 TB *ingest* pipeline needs the
other direction: as new documents arrive, drop the ones that
near-duplicate ANYTHING already accepted, and remember the survivors
so later batches dedup against them too. This module implements that
as a ``foreachBatch`` sink:

* A parquet **band index** persists (band, bucket, doc id) rows for
  every accepted document — ~``bands`` rows of 3 longs per doc,
  independent of document size (the text itself is never indexed).
* Per micro-batch: signatures → band buckets (the SAME banding layer
  as the batch miner, ``operators/dedup.py::banded_signatures``, so
  batch-built indexes are probe-able by the stream and vice versa);
  a **left-semi join** against the index marks collided docs, a
  min-id-per-bucket pass dedups WITHIN the batch, survivors append to
  the output table and their bands append to the index.
* The join is an equi-join on (band, bucket) — hash-partitioned,
  bucket-local work, never a cross join; at scale the index is just
  another parquet table that partition-prunes on band.
* foreachBatch is at-least-once: a per-batch commit marker (the same
  ledger discipline as ``streaming/rollup.py``) makes replays no-ops,
  so a crashed batch cannot append survivors or index rows twice.

Accept-first-arrival semantics: within a batch the LOWEST id in a
colliding bucket wins (deterministic); across batches the earlier
batch wins (its rows are already indexed).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.dedup import banded_signatures
from .lake import path_has_data


@dataclass
class LshDedupSink:
    """Persistent LSH dedup state: survivor table + band index."""

    out_path: str
    index_path: str
    text_col: str = "text"
    id_col: str = "doc_id"
    num_hashes: int = 64
    bands: int = 16
    shingle_n: int = 3

    # -- commit ledger (at-least-once → effectively-once) ---------------

    def _marker(self, batch_id: int) -> str:
        return os.path.join(self.index_path, "_dedup_commits", str(batch_id))

    def _committed(self, batch_id: int) -> bool:
        return os.path.exists(self._marker(batch_id))

    def _commit(self, batch_id: int | None) -> None:
        if batch_id is None:
            return
        os.makedirs(os.path.dirname(self._marker(batch_id)), exist_ok=True)
        open(self._marker(batch_id), "w").close()

    # -- the per-batch dedup ---------------------------------------------

    def process_batch(self, batch: DataFrame, batch_id: int | None = None) -> None:
        if batch_id is not None and self._committed(batch_id):
            return
        spark = batch.sparkSession
        if batch.isEmpty():
            self._commit(batch_id)
            return

        bands_df = banded_signatures(
            batch,
            self.text_col,
            self.id_col,
            self.num_hashes,
            self.bands,
            self.shingle_n,
        ).select(self.id_col, "band", "bucket")
        # signatures feed THREE consumers (index probe, in-batch owner
        # pass, index append); pin one evaluation of the Python stage
        bands_df = bands_df.localCheckpoint(eager=False)

        # docs too short to shingle never collide; they pass through
        drop = None
        if path_has_data(spark, self.index_path):
            idx = spark.read.parquet(self.index_path)
            drop = (
                bands_df.join(idx, ["band", "bucket"], "left_semi")
                .select(self.id_col)
                .distinct()
            )
        # within-batch: lowest id per colliding bucket is the owner;
        # every other member of that bucket drops
        owners = bands_df.groupBy("band", "bucket").agg(
            F.min(self.id_col).alias("_owner"),
            F.count("*").alias("_n"),
        )
        batch_dup = (
            bands_df.join(owners.filter(F.col("_n") > 1), ["band", "bucket"])
            .filter(F.col(self.id_col) > F.col("_owner"))
            .select(self.id_col)
            .distinct()
        )
        drop = batch_dup if drop is None else drop.unionByName(batch_dup)
        drop = drop.distinct()

        survivors = batch.join(drop, self.id_col, "left_anti")
        survivors.write.mode("append").parquet(self.out_path)
        bands_df.join(drop, self.id_col, "left_anti").select(
            self.id_col, "band", "bucket"
        ).write.mode("append").parquet(self.index_path)
        self._commit(batch_id)

    def read_survivors(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.out_path)


def write_stream_dedup_lsh(
    stream: DataFrame,
    sink: LshDedupSink,
    checkpoint_root: str,
    available_now: bool = False,
    trigger_seconds: int = 30,
) -> StreamingQuery:
    """Attach the LSH dedup sink to a streaming DataFrame."""
    writer = (
        stream.writeStream.foreachBatch(
            lambda df, bid: sink.process_batch(df, bid)
        )
        .option("checkpointLocation", checkpoint_root)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


@dataclass
class VectorDedupSink:
    """Embedding-space streaming dedup: drop arriving vectors whose
    cosine similarity to any ACCEPTED vector reaches ``threshold``.

    Same architecture as :class:`LshDedupSink` with one difference
    dictated by the geometry: sign-band collisions are only a
    CANDIDATE signal (moderately-similar vectors share bands often),
    so every collision is verified with an exact cosine against the
    accepted vector before it drops anything — candidates-sized work,
    never corpus-sized. The band index stores (band, bucket, id) longs;
    the survivor table keeps the vectors themselves (they are needed
    as the verify side and they ARE the output).

    Bands/bits/seed must match between runs — they are part of the
    index format, recorded once at first commit.
    """

    out_path: str
    index_path: str
    id_col: str = "vec_id"
    vec_col: str = "embedding"
    dim: int = 64
    n_bands: int = 8
    band_bits: int = 8
    seed: int = 42
    threshold: float = 0.9

    def _marker(self, batch_id: int) -> str:
        return os.path.join(self.index_path, "_dedup_commits", str(batch_id))

    def _committed(self, batch_id: int) -> bool:
        return os.path.exists(self._marker(batch_id))

    def _commit(self, batch_id: int | None) -> None:
        if batch_id is None:
            return
        os.makedirs(os.path.dirname(self._marker(batch_id)), exist_ok=True)
        open(self._marker(batch_id), "w").close()

    def process_batch(self, batch: DataFrame, batch_id: int | None = None) -> None:
        from ..operators.similarity import _band_signatures, cosine_pairs_pandas

        if batch_id is not None and self._committed(batch_id):
            return
        spark = batch.sparkSession
        if batch.isEmpty():
            self._commit(batch_id)
            return

        bands_df = _band_signatures(
            batch,
            self.id_col,
            self.vec_col,
            self.dim,
            self.n_bands,
            self.band_bits,
            self.seed,
        ).withColumnRenamed("_sid", self.id_col)
        bands_df = bands_df.localCheckpoint(eager=False)
        vecs = batch.select(
            F.col(self.id_col).alias("_bid"),
            F.col(self.vec_col).cast("array<double>").alias("_bvec"),
        )

        drops = []
        if path_has_data(spark, self.index_path):
            idx = spark.read.parquet(self.index_path)
            accepted = spark.read.parquet(self.out_path).select(
                F.col(self.id_col).alias("_aid"),
                F.col(self.vec_col).cast("array<double>").alias("_avec"),
            )
            cand = (
                bands_df.join(
                    idx.withColumnRenamed(self.id_col, "_aid"),
                    ["band", "bucket"],
                )
                .select(F.col(self.id_col).alias("_bid"), "_aid")
                .dropDuplicates(["_bid", "_aid"])
            )
            verified = (
                cand.join(vecs, "_bid")
                .join(accepted, "_aid")
                .withColumn("_cos", cosine_pairs_pandas("_bvec", "_avec"))
                .filter(F.col("_cos") >= self.threshold)
                .select(F.col("_bid").alias(self.id_col))
                .distinct()
            )
            drops.append(verified)

        # within-batch: verified near-dup with a SMALLER id drops the row
        a = bands_df.select(
            F.col(self.id_col).alias("_ida"), "band", "bucket"
        )
        b = bands_df.select(
            F.col(self.id_col).alias("_idb"), "band", "bucket"
        )
        in_batch = (
            a.join(b, ["band", "bucket"])
            .filter(F.col("_ida") < F.col("_idb"))
            .select("_ida", "_idb")
            .dropDuplicates(["_ida", "_idb"])
            .join(vecs.withColumnRenamed("_bid", "_ida").withColumnRenamed("_bvec", "_va"), "_ida")
            .join(vecs.withColumnRenamed("_bid", "_idb").withColumnRenamed("_bvec", "_vb"), "_idb")
            .withColumn("_cos", cosine_pairs_pandas("_va", "_vb"))
            .filter(F.col("_cos") >= self.threshold)
            .select(F.col("_idb").alias(self.id_col))
            .distinct()
        )
        drops.append(in_batch)

        drop = drops[0]
        for d in drops[1:]:
            drop = drop.unionByName(d)
        drop = drop.distinct()

        survivors = batch.join(drop, self.id_col, "left_anti")
        survivors.write.mode("append").parquet(self.out_path)
        bands_df.join(drop, self.id_col, "left_anti").select(
            self.id_col, "band", "bucket"
        ).write.mode("append").parquet(self.index_path)
        self._commit(batch_id)

    def read_survivors(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.out_path)


def write_stream_dedup_vectors(
    stream: DataFrame,
    sink: VectorDedupSink,
    checkpoint_root: str,
    available_now: bool = False,
    trigger_seconds: int = 30,
) -> StreamingQuery:
    """Attach the vector dedup sink to a streaming DataFrame."""
    writer = (
        stream.writeStream.foreachBatch(
            lambda df, bid: sink.process_batch(df, bid)
        )
        .option("checkpointLocation", checkpoint_root)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
