"""Persistent IVF vector index: an ANN index that is just a parquet
layout (the lakehouse answer to a vector database).

``ivf_topk`` (operators/similarity.py) re-partitions the corpus by
coarse-quantizer list on EVERY query run; at 100 TB the index must
live at rest. This module materializes it:

* ``centroids.parquet`` — the spherical-k-means coarse quantizer
  (trained ONCE on a bounded sample of the first batch, then frozen:
  list assignment is part of the storage layout, exactly like Hudi's
  record-key hashing).
* ``vecs/list_id=<n>/…`` — vectors partitioned BY LIST, so a search
  that probes ``n_probe`` of ``n_lists`` lists reads ~n_probe/n_lists
  of the files: partition pruning does the candidate selection before
  a single byte of vector data is scanned (asserted via inputFiles in
  tests).
* Streaming ingest via ``foreachBatch`` with the same commit-marker
  ledger as the other sinks — replayed batches are no-ops.

Search joins the probed partitions' vectors against the query set and
re-ranks exactly (one Arrow cosine pass over candidates only); recall
is tuned by ``n_probe`` without touching stored data.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


@dataclass
class IvfVectorIndex:
    path: str
    id_col: str = "vec_id"
    vec_col: str = "embedding"
    n_lists: int = 16
    train_sample: int = 4096
    seed: int = 42

    @property
    def _centroid_path(self) -> str:
        return os.path.join(self.path, "centroids.parquet")

    @property
    def _vec_path(self) -> str:
        return os.path.join(self.path, "vecs")

    def _marker(self, batch_id: int) -> str:
        return os.path.join(self.path, "_index_commits", str(batch_id))

    def _committed(self, batch_id: int) -> bool:
        return os.path.exists(self._marker(batch_id))

    def _commit(self, batch_id: int | None) -> None:
        if batch_id is None:
            return
        os.makedirs(os.path.dirname(self._marker(batch_id)), exist_ok=True)
        open(self._marker(batch_id), "w").close()

    # -- coarse quantizer ------------------------------------------------

    def _load_centroids(self, spark: SparkSession):
        import numpy as np

        rows = (
            spark.read.parquet(self._centroid_path)
            .orderBy("list_id")
            .collect()
        )
        return np.array([r["centroid"] for r in rows], dtype=np.float64)

    def _train(self, batch: DataFrame):
        """Spherical k-means on a bounded sample (driver numpy — the
        only driver work, same REPLAYABLE recipe as ``ivf_topk``:
        lowest-id sample, first-k init — an unordered limit depends
        on partition order, and rng.choice indices depend on runtime
        sample size, so neither survives a cluster nor an oracle).
        ``seed`` kept for index-format compatibility; unused."""
        import numpy as np

        sample = [
            r[1]
            for r in batch.select(self.id_col, self.vec_col)
            .orderBy(self.id_col)
            .limit(self.train_sample)
            .collect()
        ]
        train = np.asarray(sample, dtype=np.float64)
        train /= np.maximum(
            np.linalg.norm(train, axis=1, keepdims=True), 1e-300
        )
        k = min(self.n_lists, len(train))
        cent = train[:k].copy()
        for _ in range(10):
            assign = np.argmax(train @ cent.T, axis=1)
            for j in range(k):
                members = train[assign == j]
                if len(members):
                    c = members.sum(axis=0)
                    cent[j] = c / max(np.linalg.norm(c), 1e-300)
        spark = batch.sparkSession
        # One-slice parallelize, NOT coalesce(1): coalesce of a
        # Python-rows DataFrame folds its ~16 tiny parent partitions
        # into one task that runs that many Python-worker round trips
        # serially — measured 3.6 s for 16 rows (round 8); a single
        # slice is one round trip.
        spark.createDataFrame(
            spark.sparkContext.parallelize(
                [
                    (int(i), [float(x) for x in cent[i]])
                    for i in range(len(cent))
                ],
                1,
            ),
            "list_id int, centroid array<double>",
        ).write.mode("overwrite").parquet(self._centroid_path)
        return cent

    def _assign(self, df: DataFrame, cent, probes: int) -> DataFrame:
        """(row..., list_id) — nearest-centroid assignment (or the
        n_probe nearest for query routing), one matmul per batch."""
        from pyspark.sql.types import (
            ArrayType,
            DoubleType,
            IntegerType,
            LongType,
            StructField,
            StructType,
        )

        bc = df.sparkSession.sparkContext.broadcast(cent)

        out_schema = StructType(
            [
                StructField("_id", LongType()),
                StructField("_vec", ArrayType(DoubleType())),
                StructField("list_id", IntegerType()),
            ]
        )

        def assign(batches):
            import numpy as np
            import pandas as pd

            C = bc.value
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                mat = np.stack(pdf["_vec"].to_numpy()).astype(np.float64)
                unit = mat / np.maximum(
                    np.linalg.norm(mat, axis=1, keepdims=True), 1e-300
                )
                sims = unit @ C.T
                if probes == 1:
                    lists = np.argmax(sims, axis=1)[:, None]
                else:
                    p = min(probes, sims.shape[1])
                    lists = np.argpartition(-sims, p - 1, axis=1)[:, :p]
                n, pp = lists.shape
                yield pd.DataFrame(
                    {
                        "_id": np.repeat(
                            pdf["_id"].to_numpy(dtype=np.int64), pp
                        ),
                        "_vec": [
                            v
                            for v in np.repeat(
                                unit, pp, axis=0
                            ).tolist()
                        ],
                        "list_id": lists.ravel().astype(np.int32),
                    }
                )

        from ..operators.scale import spread_for_compute

        return spread_for_compute(
            df.select(
                F.col(self.id_col).alias("_id"),
                F.col(self.vec_col).cast("array<double>").alias("_vec"),
            )
        ).mapInPandas(assign, out_schema)

    # -- ingest ----------------------------------------------------------

    def append_batch(self, batch: DataFrame, batch_id: int | None = None) -> None:
        if batch_id is not None and self._committed(batch_id):
            return
        spark = batch.sparkSession
        if batch.isEmpty():
            self._commit(batch_id)
            return
        if os.path.exists(self._centroid_path):
            cent = self._load_centroids(spark)
        else:
            cent = self._train(batch)
        assigned = self._assign(batch, cent, probes=1)
        # Hash-distribute on (list_id, id-salt) before the partitioned
        # write (guide §6, Iceberg write.distribution-mode=hash
        # analog): without it every input task writes one file per
        # list it touches — n_tasks × n_lists small files at scale,
        # and a single-split micro-batch writes all lists serially
        # from one task (measured 4.5 s at the fixture scale). The
        # salt keeps one list from collapsing to one writer.
        spark = batch.sparkSession
        par = spark.sparkContext.defaultParallelism
        salt = max(1, par // max(self.n_lists, 1))
        (
            assigned.withColumnRenamed("_id", self.id_col)
            .withColumnRenamed("_vec", self.vec_col)
            .repartition(
                self.n_lists * salt,
                F.col("list_id"),
                F.pmod(F.col(self.id_col), F.lit(salt)),
            )
            .write.mode("append")
            .partitionBy("list_id")
            .parquet(self._vec_path)
        )
        self._commit(batch_id)

    # -- search ----------------------------------------------------------

    def search(
        self,
        spark: SparkSession,
        queries: DataFrame,
        k: int = 5,
        n_probe: int = 4,
    ) -> DataFrame:
        """Top-k per query reading ONLY the probed list partitions."""
        cent = self._load_centroids(spark)
        probes = self._assign(queries, cent, probes=n_probe).select(
            F.col("_id").alias("query_id"),
            F.col("_vec").alias("_qv"),
            "list_id",
        )
        probe_lists = [
            int(r["list_id"])
            for r in probes.select("list_id").distinct().collect()
        ]
        cands = spark.read.parquet(self._vec_path).filter(
            F.col("list_id").isin(probe_lists)
        )
        from ..operators.similarity import cosine_pairs_pandas

        scored = (
            probes.join(
                cands.select(
                    F.col(self.id_col).alias("neighbor_id"),
                    F.col(self.vec_col).alias("_cv"),
                    "list_id",
                ),
                "list_id",
            )
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .withColumn("cosine_sim", cosine_pairs_pandas("_qv", "_cv"))
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
        )
        return (
            scored.withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= k)
            .select(
                "query_id",
                "neighbor_id",
                F.round("cosine_sim", 4).alias("cosine_sim"),
                "rank",
            )
        )

    def probed_files(self, spark: SparkSession, probe_lists: list[int]) -> int:
        """How many files a probe of these lists ACTUALLY reads —
        measured at runtime via input_file_name() (``inputFiles()``
        reports the unpruned file index, so it cannot see partition
        pruning working)."""
        return (
            spark.read.parquet(self._vec_path)
            .filter(F.col("list_id").isin([int(x) for x in probe_lists]))
            .select(F.input_file_name())
            .distinct()
            .count()
        )

    def total_files(self, spark: SparkSession) -> int:
        return (
            spark.read.parquet(self._vec_path)
            .select(F.input_file_name())
            .distinct()
            .count()
        )


def write_stream_to_ivf_index(
    stream: DataFrame,
    index: IvfVectorIndex,
    checkpoint_root: str,
    available_now: bool = False,
    trigger_seconds: int = 30,
) -> StreamingQuery:
    """Attach the IVF index ingest to a streaming DataFrame."""
    writer = (
        stream.writeStream.foreachBatch(
            lambda df, bid: index.append_batch(df, bid)
        )
        .option("checkpointLocation", checkpoint_root)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    partition_col: str | None = None,
    files_per_partition: int = 1,
) -> int:
    """Rewrite an append-fragmented parquet directory into
    ``files_per_partition`` files (per partition when partitioned) —
    the same small-files discipline the reference configures Hudi's
    inline compaction for (``MSP:279-280``). Streaming sinks append
    one file set per micro-batch; after N batches a probe reads N
    fragments per partition. Returns the file count after the
    rewrite.

    Local-FS staging swap (write tmp → replace); on object storage
    swap the rename for the store's atomic-commit primitive.
    """
    import shutil

    df = spark.read.parquet(path)
    staging = path.rstrip("/") + "._compacting"
    if partition_col:
        (
            df.repartition(files_per_partition, F.col(partition_col))
            .write.mode("overwrite")
            .partitionBy(partition_col)
            .parquet(staging)
        )
    else:
        df.coalesce(files_per_partition).write.mode("overwrite").parquet(
            staging
        )
    # keep ledger/marker dirs (underscore-prefixed) across the swap
    keep = [
        n
        for n in os.listdir(path)
        if n.startswith("_") and os.path.isdir(os.path.join(path, n))
    ]
    for n in keep:
        shutil.move(os.path.join(path, n), os.path.join(staging, n))
    shutil.rmtree(path)
    shutil.move(staging, path)
    return (
        spark.read.parquet(path)
        .select(F.input_file_name())
        .distinct()
        .count()
    )
