"""Streaming join operators (SURVEY §2.4 J1 / §2.10 T9).

Deterministic: parquet file sources with maxFilesPerTrigger=1 force a
known micro-batch order, availableNow runs to completion, memory sinks
collect. The multi-batch test proves watermark-driven state eviction —
the property that bounds join state at 100 TB — by showing a
too-late row really is dropped while an in-horizon row still matches.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.streaming.joins import (
    stream_static_enrich,
    stream_stream_interval_join,
)


def _write_parquet_files(spark, dirpath, schema_cols, batches):
    """One parquet file per batch (ordered names → ordered triggers)."""
    dirpath.mkdir(parents=True, exist_ok=True)
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(rows, schema_cols).coalesce(1)
        df.write.parquet(str(dirpath / f"b{i:02d}.parquet"))
    return dirpath


def _read_stream(spark, dirpath, schema):
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(dirpath))
    )


TS = "timestamp"
LEFT_COLS = "k int, l_ts timestamp, l_val string"
RIGHT_COLS = "k2 int, r_ts timestamp, r_val string"


def _ts(s):
    from datetime import datetime

    return datetime.fromisoformat(s)


def test_interval_join_matches_within_bounds(spark, tmp_path):
    left = _write_parquet_files(
        spark,
        tmp_path / "l",
        LEFT_COLS,
        [[(1, _ts("2024-01-01 10:00:00"), "a"), (2, _ts("2024-01-01 10:00:00"), "b")]],
    )
    right = _write_parquet_files(
        spark,
        tmp_path / "r",
        RIGHT_COLS,
        [
            [
                (1, _ts("2024-01-01 10:10:00"), "in-window"),
                (1, _ts("2024-01-01 11:10:00"), "too-late"),
                (1, _ts("2024-01-01 09:50:00"), "before-left"),
                (2, _ts("2024-01-01 10:30:00"), "edge-exact"),
                (3, _ts("2024-01-01 10:05:00"), "no-left-key"),
            ]
        ],
    )
    l = _read_stream(spark, left, LEFT_COLS)
    r = _read_stream(spark, right, RIGHT_COLS)
    joined = stream_stream_interval_join(
        l, r, "k", "k2", "l_ts", "r_ts", upper="30 minutes"
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ivj_bounds")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(row.k, row.r_val) for row in spark.table("ivj_bounds").collect()}
    assert got == {(1, "in-window"), (2, "edge-exact")}


def test_interval_join_multi_batch_watermark_eviction(spark, tmp_path):
    # Eviction is an end-of-batch action and late input is not
    # pre-filtered, so the drop only becomes observable one batch
    # AFTER the watermark passes: b00 advances the global watermark to
    # 19:48, b01 keeps it advancing while state for the 08:00 left row
    # is physically removed (left state horizon = wm - upper = 19:18),
    # and b02's late right row then finds no state to join. The
    # in-horizon left row (19:58) still matches in b02.
    left = _write_parquet_files(
        spark,
        tmp_path / "l",
        LEFT_COLS,
        [
            [
                (1, _ts("2024-01-01 08:00:00"), "old-left"),
                (2, _ts("2024-01-01 19:58:00"), "live-left"),
            ]
        ],
    )
    right = _write_parquet_files(
        spark,
        tmp_path / "r",
        RIGHT_COLS,
        [
            [(9, _ts("2024-01-01 20:00:00"), "watermark-advancer")],
            [(9, _ts("2024-01-01 20:10:00"), "watermark-advancer-2")],
            [
                (2, _ts("2024-01-01 20:05:00"), "match-live"),
                (1, _ts("2024-01-01 08:10:00"), "match-evicted-left"),
            ],
        ],
    )
    l = _read_stream(spark, left, LEFT_COLS)
    r = _read_stream(spark, right, RIGHT_COLS)
    joined = stream_stream_interval_join(
        l,
        r,
        "k",
        "k2",
        "l_ts",
        "r_ts",
        upper="30 minutes",
        left_watermark="10 minutes",
        right_watermark="10 minutes",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ivj_evict")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(row.k, row.r_val) for row in spark.table("ivj_evict").collect()}
    assert ("2", "match-live") not in got  # sanity: keys are ints
    assert (2, "match-live") in got
    assert (1, "match-evicted-left") not in got


def test_stream_static_enrich_broadcast_left(spark, tmp_path):
    facts = _write_parquet_files(
        spark,
        tmp_path / "f",
        LEFT_COLS,
        [[(1, _ts("2024-01-01 10:00:00"), "x"), (7, _ts("2024-01-01 10:01:00"), "y")]],
    )
    dim = spark.createDataFrame([(1, "gold"), (2, "silver")], "dk int, tier string")
    s = _read_stream(spark, facts, LEFT_COLS)
    enriched = stream_static_enrich(
        s, dim, on=F.col("k") == F.col("dk"), how="left"
    )
    q = (
        enriched.writeStream.format("memory")
        .queryName("enrich_left")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(row.k, row.tier) for row in spark.table("enrich_left").collect()}
    assert got == {(1, "gold"), (7, None)}


def test_stream_static_enrich_rejects_right_outer(spark):
    dim = spark.createDataFrame([(1, "gold")], "dk int, tier string")
    with pytest.raises(ValueError, match="left/inner"):
        stream_static_enrich(dim, dim, on="dk", how="right")
