"""Streaming near-dup dedup against a persistent LSH index
(streaming/dedup.py): cross-batch suppression, in-batch dedup,
short-doc pass-through, replay idempotency."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.streaming.dedup import (
    LshDedupSink,
    write_stream_dedup_lsh,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the rain "
    "in spain falls mainly on the plain and the cat sits on the mat "
    "watching the birds fly south for the winter season again"
)
NEAR = BASE.replace("lazy dog", "sleepy dog")  # high-jaccard near-copy
FRESH = (
    "completely different content about distributed query engines "
    "optimizing columnar scans with vectorized execution and adaptive "
    "partition coalescing across thousand node clusters every day"
)
SHORT = "tiny doc"  # < shingle_n tokens: passes through by design


def _write_docs(spark, path, rows):
    spark.createDataFrame(rows, "doc_id bigint, text string").coalesce(
        1
    ).write.mode("append").parquet(path)


def _run_stream(spark, src, sink, ck):
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = write_stream_dedup_lsh(stream, sink, ck, available_now=True)
    assert q.awaitTermination(120)


@pytest.fixture()
def paths(tmp_path):
    return {
        "src": str(tmp_path / "src"),
        "out": str(tmp_path / "out"),
        "idx": str(tmp_path / "idx"),
        "ck": str(tmp_path / "ck"),
    }


def test_streaming_dedup_cross_batch_and_in_batch(spark, paths):
    # batch 1: base doc + an in-batch near-copy + a short doc
    _write_docs(
        spark,
        paths["src"],
        [(1, BASE), (2, NEAR), (50, SHORT)],
    )
    sink = LshDedupSink(out_path=paths["out"], index_path=paths["idx"])
    _run_stream(spark, paths["src"], sink, paths["ck"])

    ids = {
        r["doc_id"] for r in sink.read_survivors(spark).select("doc_id").collect()
    }
    # lowest id wins the in-batch bucket; short doc passes through
    assert ids == {1, 50}

    # batch 2 (same checkpoint → only the new file): another near-copy
    # of an ACCEPTED doc (cross-batch drop) + genuinely fresh content
    _write_docs(spark, paths["src"], [(3, BASE + " extra tail"), (4, FRESH)])
    _run_stream(spark, paths["src"], sink, paths["ck"])

    ids = {
        r["doc_id"] for r in sink.read_survivors(spark).select("doc_id").collect()
    }
    assert ids == {1, 50, 4}

    # index holds band rows ONLY for accepted shingle-able docs
    idx_ids = {
        r["doc_id"]
        for r in spark.read.parquet(paths["idx"]).select("doc_id").collect()
    }
    assert idx_ids == {1, 4}


def test_streaming_dedup_replay_is_noop(spark, paths):
    _write_docs(spark, paths["src"], [(1, BASE), (4, FRESH)])
    sink = LshDedupSink(out_path=paths["out"], index_path=paths["idx"])
    _run_stream(spark, paths["src"], sink, paths["ck"])
    n1 = sink.read_survivors(spark).count()
    idx1 = spark.read.parquet(paths["idx"]).count()

    # simulate an at-least-once redelivery of batch 0
    batch = spark.read.parquet(paths["src"])
    sink.process_batch(batch, batch_id=0)
    assert sink.read_survivors(spark).count() == n1
    assert spark.read.parquet(paths["idx"]).count() == idx1

    # an UNSEEN batch id with already-indexed content still dedups
    sink.process_batch(batch, batch_id=99)
    assert sink.read_survivors(spark).count() == n1


def test_streaming_index_interoperates_with_batch_banding(spark, paths):
    """An index written by the stream is probe-able with the batch
    banding layer — same bucketing on both tiers."""
    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.operators.dedup import (
        banded_signatures,
    )

    _write_docs(spark, paths["src"], [(1, BASE)])
    sink = LshDedupSink(out_path=paths["out"], index_path=paths["idx"])
    _run_stream(spark, paths["src"], sink, paths["ck"])

    probe = spark.createDataFrame(
        [(100, NEAR), (101, FRESH)], "doc_id bigint, text string"
    )
    bands = banded_signatures(probe, "text", "doc_id")
    idx = spark.read.parquet(paths["idx"])
    collided = {
        r["doc_id"]
        for r in bands.join(idx.select("band", "bucket"), ["band", "bucket"], "left_semi")
        .select("doc_id")
        .distinct()
        .collect()
    }
    assert collided == {100}


# ---------------------------------------------------------------------------
# vector dedup sink: cosine-verified drops, fresh vectors survive
# ---------------------------------------------------------------------------

def _write_vecs(spark, path, rows):
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>"
    ).coalesce(1).write.mode("append").parquet(path)


def test_streaming_vector_dedup(spark, paths):
    import numpy as np

    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.streaming.dedup import (
        VectorDedupSink,
        write_stream_dedup_vectors,
    )

    rng = np.random.default_rng(11)
    base = rng.standard_normal(64)
    near = base + 0.01 * rng.standard_normal(64)      # cos ≈ 0.9999
    fresh = rng.standard_normal(64)                    # cos ≈ 0 to base

    def row(vid, v):
        return (vid, [float(x) for x in v])

    # batch 1: base + an in-batch near-copy
    _write_vecs(spark, paths["src"], [row(1, base), row(2, near)])
    sink = VectorDedupSink(
        out_path=paths["out"], index_path=paths["idx"], threshold=0.95
    )
    stream = (
        spark.readStream.schema("vec_id bigint, embedding array<float>")
        .option("maxFilesPerTrigger", "1")
        .parquet(paths["src"])
    )
    q = write_stream_dedup_vectors(stream, sink, paths["ck"], available_now=True)
    assert q.awaitTermination(120)
    ids = {r["vec_id"] for r in sink.read_survivors(spark).collect()}
    assert ids == {1}

    # batch 2: near-copy of ACCEPTED base drops; fresh vector survives
    _write_vecs(
        spark,
        paths["src"],
        [row(3, base + 0.02 * rng.standard_normal(64)), row(4, fresh)],
    )
    stream = (
        spark.readStream.schema("vec_id bigint, embedding array<float>")
        .option("maxFilesPerTrigger", "1")
        .parquet(paths["src"])
    )
    q = write_stream_dedup_vectors(stream, sink, paths["ck"], available_now=True)
    assert q.awaitTermination(120)
    ids = {r["vec_id"] for r in sink.read_survivors(spark).collect()}
    assert ids == {1, 4}

    # replayed batch is a no-op
    n1 = sink.read_survivors(spark).count()
    sink.process_batch(spark.read.parquet(paths["src"]), batch_id=0)
    assert sink.read_survivors(spark).count() == n1
