"""SCD2 history lake: versioned upserts, validity chaining, time
travel, bucket-scoped rewrites (beyond-reference lake depth)."""

from __future__ import annotations

import datetime as dt

from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.streaming.scd2 import (
    Scd2Table,
)


def _rows(spark, data):
    return spark.createDataFrame(
        data, "id int, val string, processing_timestamp timestamp"
    )


def _t(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def test_scd2_versions_chain_across_batches(spark, tmp_path):
    table = Scd2Table(path=str(tmp_path / "t"))
    table.upsert_batch(_rows(spark, [(1, "v1", _t(10)), (2, "w1", _t(10))]), spark)
    table.upsert_batch(_rows(spark, [(1, "v2", _t(12))]), spark)

    cur = {r.id: (r.val, r._valid_to) for r in table.read_current(spark).collect()}
    assert cur == {1: ("v2", None), 2: ("w1", None)}

    hist = {
        (r.id, r.val): (r._valid_from, r._valid_to)
        for r in table.read_history(spark).collect()
    }
    assert hist[(1, "v1")] == (_t(10), _t(12))
    assert hist[(1, "v2")] == (_t(12), None)
    assert hist[(2, "w1")] == (_t(10), None)


def test_scd2_intra_batch_chain_closes_current_at_earliest(spark, tmp_path):
    """A batch carrying two versions of one key chains them; the
    pre-existing current row closes at the EARLIEST incoming
    version."""
    table = Scd2Table(path=str(tmp_path / "t"))
    table.upsert_batch(_rows(spark, [(1, "v1", _t(10))]), spark)
    table.upsert_batch(
        _rows(spark, [(1, "v2", _t(11)), (1, "v3", _t(13))]), spark
    )
    hist = {
        r.val: (r._valid_from, r._valid_to)
        for r in table.read_history(spark).filter("id = 1").collect()
    }
    assert hist == {
        "v1": (_t(10), _t(11)),
        "v2": (_t(11), _t(13)),
        "v3": (_t(13), None),
    }


def test_scd2_as_of_time_travel(spark, tmp_path):
    table = Scd2Table(path=str(tmp_path / "t"))
    table.upsert_batch(_rows(spark, [(1, "v1", _t(10))]), spark)
    table.upsert_batch(_rows(spark, [(1, "v2", _t(12))]), spark)
    table.upsert_batch(_rows(spark, [(1, "v3", _t(14))]), spark)

    def as_of(h):
        rows = table.read_as_of(spark, _t(h)).filter("id = 1").collect()
        return [r.val for r in rows]

    assert as_of(9) == []
    assert as_of(11) == ["v1"]
    assert as_of(13) == ["v2"]
    assert as_of(15) == ["v3"]


def test_scd2_stale_replay_dropped(spark, tmp_path):
    """Replayed / out-of-order versions older than the current open
    version are rejected idempotently."""
    table = Scd2Table(path=str(tmp_path / "t"))
    table.upsert_batch(_rows(spark, [(1, "v2", _t(12))]), spark)
    table.upsert_batch(_rows(spark, [(1, "v1", _t(10))]), spark)  # stale
    table.upsert_batch(_rows(spark, [(1, "v2", _t(12))]), spark)  # replay

    hist = [(r.val, r._valid_to) for r in table.read_history(spark).collect()]
    assert hist == [("v2", None)]


def test_scd2_untouched_buckets_not_rewritten(spark, tmp_path):
    """An upsert rewrites only the hash buckets its keys land in."""
    import glob
    import os

    table = Scd2Table(path=str(tmp_path / "t"), n_buckets=8)
    table.upsert_batch(
        _rows(spark, [(i, f"v{i}", _t(10)) for i in range(40)]), spark
    )
    before = {
        f: os.path.getmtime(f)
        for f in glob.glob(str(tmp_path / "t" / "current" / "*/*.parquet"))
    }
    table.upsert_batch(_rows(spark, [(1, "v1b", _t(12))]), spark)
    after = {
        f: os.path.getmtime(f)
        for f in glob.glob(str(tmp_path / "t" / "current" / "*/*.parquet"))
    }
    untouched_same = [
        f for f in before if f in after and before[f] == after[f]
    ]
    # 40 keys over 8 buckets: most buckets keep their original files
    assert len(untouched_same) >= 5
    # and the data is still right
    cur = {r.id: r.val for r in table.read_current(spark).collect()}
    assert cur[1] == "v1b" and cur[2] == "v2" and len(cur) == 40


def test_scd2_streaming_sink(spark, tmp_path):
    """File stream → SCD2 via foreachBatch: versions across
    micro-batches chain into validity intervals."""
    import json

    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.streaming.scd2 import (
        write_stream_to_scd2,
    )

    indir = tmp_path / "in"
    indir.mkdir()
    (indir / "b0.jsonl").write_text(
        json.dumps({"id": 1, "val": "v1", "processing_timestamp": "2024-01-01 10:00:00"})
    )
    (indir / "b1.jsonl").write_text(
        json.dumps({"id": 1, "val": "v2", "processing_timestamp": "2024-01-01 12:00:00"})
    )
    stream = (
        spark.readStream.schema(
            "id int, val string, processing_timestamp timestamp"
        )
        .option("maxFilesPerTrigger", 1)
        .json(str(indir))
    )
    table = Scd2Table(path=str(tmp_path / "t"))
    q = write_stream_to_scd2(
        stream, table, str(tmp_path / "ckpt"), available_now=True
    )
    q.awaitTermination(180)
    hist = {
        r.val: (r._valid_from, r._valid_to)
        for r in table.read_history(spark).collect()
    }
    assert hist == {
        "v1": (_t(10), _t(12)),
        "v2": (_t(12), None),
    }
