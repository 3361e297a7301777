"""Persistent IVF vector index (streaming/ann_index.py): streaming
build, partition-pruned search, recall vs brute force, replay
idempotency."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.operators.similarity import (
    brute_force_topk,
)
from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.streaming.ann_index import (
    IvfVectorIndex,
    write_stream_to_ivf_index,
)


def _clustered(seed=7, n_centers=20, per=10, dim=64):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_centers, dim))
    rows, vid = [], 0
    for c in centers:
        for _ in range(per):
            v = c + 0.05 * rng.standard_normal(dim)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    return rows


@pytest.fixture()
def paths(tmp_path):
    return {
        "src": str(tmp_path / "src"),
        "idx": str(tmp_path / "idx"),
        "ck": str(tmp_path / "ck"),
    }


def _stream_build(spark, src, index, ck):
    stream = (
        spark.readStream.schema("vec_id bigint, embedding array<float>")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = write_stream_to_ivf_index(stream, index, ck, available_now=True)
    assert q.awaitTermination(180)


def test_ivf_index_streaming_build_and_recall(spark, paths):
    rows = _clustered()
    half = len(rows) // 2
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    # two files -> two micro-batches; quantizer trains on batch 1 only
    for part in (rows[:half], rows[half:]):
        spark.createDataFrame(
            part, "vec_id bigint, embedding array<float>"
        ).coalesce(1).write.mode("append").parquet(paths["src"])

    index = IvfVectorIndex(path=paths["idx"], n_lists=8)
    _stream_build(spark, paths["src"], index, paths["ck"])

    # every vector is indexed exactly once
    stored = spark.read.parquet(f"{paths['idx']}/vecs")
    assert stored.count() == len(rows)
    assert stored.select("vec_id").distinct().count() == len(rows)

    queries = emb.filter(F.col("vec_id") % 40 == 0)
    exact = brute_force_topk(emb, queries, k=5).collect()
    approx = index.search(spark, queries, k=5, n_probe=4).collect()
    exact_at1 = {r.query_id: r.neighbor_id for r in exact if r.rank == 1}
    approx_sets: dict[int, set[int]] = {}
    for r in approx:
        approx_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(
        1 for q, nn in exact_at1.items() if nn in approx_sets.get(q, set())
    )
    assert hits >= int(0.8 * len(exact_at1))


def test_ivf_index_search_prunes_partitions(spark, paths):
    rows = _clustered()
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>"
    ).coalesce(1).write.mode("append").parquet(paths["src"])
    index = IvfVectorIndex(path=paths["idx"], n_lists=8)
    _stream_build(spark, paths["src"], index, paths["ck"])

    total = index.total_files(spark)
    probed = index.probed_files(spark, [0, 1])
    # reading 2 of 8 lists must touch strictly fewer files than a scan
    assert 0 < probed < total


def test_ivf_index_replay_is_noop(spark, paths):
    rows = _clustered(n_centers=4, per=5)
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>"
    ).coalesce(1).write.mode("append").parquet(paths["src"])
    index = IvfVectorIndex(path=paths["idx"], n_lists=4)
    _stream_build(spark, paths["src"], index, paths["ck"])
    n1 = spark.read.parquet(f"{paths['idx']}/vecs").count()

    index.append_batch(spark.read.parquet(paths["src"]), batch_id=0)
    assert spark.read.parquet(f"{paths['idx']}/vecs").count() == n1


def test_compaction_shrinks_files_preserves_results(spark, paths):
    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.streaming.ann_index import (
        compact_parquet_dir,
    )

    rows = _clustered()
    # 4 files -> 4 micro-batches of appends (fragmented index)
    quarter = len(rows) // 4
    for i in range(4):
        spark.createDataFrame(
            rows[i * quarter : (i + 1) * quarter],
            "vec_id bigint, embedding array<float>",
        ).coalesce(1).write.mode("append").parquet(paths["src"])
    index = IvfVectorIndex(path=paths["idx"], n_lists=8)
    _stream_build(spark, paths["src"], index, paths["ck"])

    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    queries = emb.filter(F.col("vec_id") % 40 == 0)
    before_files = index.total_files(spark)
    before = sorted(
        (r.query_id, r.rank, r.neighbor_id)
        for r in index.search(spark, queries, k=5, n_probe=4).collect()
    )

    after_files = compact_parquet_dir(
        spark, f"{paths['idx']}/vecs", partition_col="list_id"
    )
    assert after_files < before_files
    # ledger markers survive the rewrite (they live under the index root,
    # not vecs/, but assert the dir still reads cleanly and results match)
    after = sorted(
        (r.query_id, r.rank, r.neighbor_id)
        for r in index.search(spark, queries, k=5, n_probe=4).collect()
    )
    assert after == before
