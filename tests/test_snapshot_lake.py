"""Snapshot-isolated lake: MVCC manifests, time travel, file sharing,
vacuum retention, and optimistic-concurrency conflicts."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.streaming.snapshot_lake import (
    ConcurrentCommitError,
    SnapshotLakeTable,
    write_stream_to_snapshot_lake,
)

D1, D2 = dt.date(2024, 6, 1), dt.date(2024, 6, 2)
T = [dt.datetime(2024, 6, 1, 9 + i) for i in range(4)]


def _rows(spark, data):
    return spark.createDataFrame(
        data, "id int, val string, processing_timestamp timestamp, processing_date date"
    )


def test_time_travel_reconstructs_every_version(spark, tmp_path):
    t = SnapshotLakeTable(path=str(tmp_path / "snap"))
    v1 = t.upsert_batch(_rows(spark, [(1, "a", T[0], D1), (2, "b", T[0], D2)]), spark)
    v2 = t.upsert_batch(_rows(spark, [(1, "a2", T[1], D1)]), spark)
    v3 = t.upsert_batch(_rows(spark, [(3, "c", T[2], D2)]), spark)
    assert (v1, v2, v3) == (1, 2, 3)

    def state(version):
        return {r["id"]: r["val"] for r in t.read(spark, version).collect()}

    assert state(1) == {1: "a", 2: "b"}
    assert state(2) == {1: "a2", 2: "b"}
    assert state(3) == {1: "a2", 2: "b", 3: "c"}
    assert state(None) == state(3)


def test_untouched_partitions_share_files_across_versions(spark, tmp_path):
    t = SnapshotLakeTable(path=str(tmp_path / "snap2"))
    t.upsert_batch(_rows(spark, [(1, "a", T[0], D1), (2, "b", T[0], D2)]), spark)
    t.upsert_batch(_rows(spark, [(1, "a2", T[1], D1)]), spark)  # touches D1 only
    f1 = t._live_files(1)
    f2 = t._live_files(2)
    assert f1[str(D2)] == f2[str(D2)]          # D2 files shared, not rewritten
    assert f1[str(D1)] != f2[str(D1)]          # D1 got new files


def test_precombine_latest_wins_and_stale_loses_across_commits(spark, tmp_path):
    t = SnapshotLakeTable(path=str(tmp_path / "snap3"))
    t.upsert_batch(_rows(spark, [(1, "new", T[2], D1)]), spark)
    t.upsert_batch(_rows(spark, [(1, "stale", T[0], D1)]), spark)  # older ts
    got = {r["id"]: r["val"] for r in t.read(spark).collect()}
    assert got == {1: "new"}


def test_vacuum_keeps_retained_versions_readable(spark, tmp_path):
    t = SnapshotLakeTable(path=str(tmp_path / "snap4"))
    for i, val in enumerate(["a", "b", "c", "d"]):
        t.upsert_batch(_rows(spark, [(1, val, T[min(i, 3)], D1)]), spark)
    deleted = t.vacuum(keep_last=2)
    assert deleted  # versions 1-2's D1 files are unreferenced by 3-4
    assert {r["val"] for r in t.read(spark, 4).collect()} == {"d"}
    assert {r["val"] for r in t.read(spark, 3).collect()} == {"c"}
    with pytest.raises(Exception):
        t.read(spark, 1)


def test_concurrent_commit_conflict_detected(spark, tmp_path):
    t = SnapshotLakeTable(path=str(tmp_path / "snap5"))
    t.upsert_batch(_rows(spark, [(1, "a", T[0], D1)]), spark)
    base = t.latest_version()
    # a second writer commits under our merge
    t.upsert_batch(_rows(spark, [(2, "b", T[1], D1)]), spark)
    with pytest.raises(ConcurrentCommitError):
        t._publish(base, t._live_files(base), op="upsert")


def test_streaming_sink_commits_one_version_per_batch(spark, tmp_path):
    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.sources.tables import (
        load_events_stream,
        load_table,
    )

    sf = "/root/testdata/sf0.001"
    stream = load_events_stream(spark, sf).select(
        F.col("event_id").alias("id"),
        F.col("event_type").alias("val"),
        F.col("ts").alias("processing_timestamp"),
        F.to_date("ts").alias("processing_date"),
    )
    t = SnapshotLakeTable(path=str(tmp_path / "snap6"))
    q = write_stream_to_snapshot_lake(
        stream, t, checkpoint_root=str(tmp_path / "ck"), available_now=True
    )
    assert q.awaitTermination(120)
    assert t.latest_version() >= 1
    total = t.read(spark).count()
    want = load_table(spark, sf, "events").count()
    assert total == want


def test_change_feed_replays_exactly_the_missed_commits(spark, tmp_path):
    """CDF between versions: per-step c/u/d rows with version stamps;
    folding the feed over the starting snapshot reproduces the final
    snapshot."""
    from pyspark.sql import functions as F

    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.streaming.snapshot_lake import (
        SnapshotLakeTable,
        change_feed,
    )

    t = SnapshotLakeTable(
        path=str(tmp_path / "t"),
        record_key="id",
        precombine_field="seq",
        partition_field="part",
    )

    def rows(seq, data):
        return spark.createDataFrame(
            [(i, v, p, seq) for i, v, p in data],
            "id int, val string, part string, seq int",
        )

    t.upsert_batch(rows(1, [(1, "a", "p0"), (2, "b", "p0")]), spark)   # v1
    t.upsert_batch(rows(2, [(2, "b2", "p0"), (3, "c", "p1")]), spark)  # v2
    t.upsert_batch(rows(3, [(1, "a3", "p0")]), spark)                  # v3

    feed = change_feed(
        t, spark, keys=["id"], tracked=["val"], from_version=2
    ).collect()
    by_ver = {}
    for r in feed:
        by_ver.setdefault(r._commit_version, {})[r.id] = (r.op, r.old_val, r.new_val)
    assert by_ver[2] == {2: ("u", "b", "b2"), 3: ("c", None, "c")}
    assert by_ver[3] == {1: ("u", "a", "a3")}

    # replaying the feed over snapshot v1 reproduces v3
    base = {r.id: r.val for r in t.read(spark, version=1).collect()}
    for v in sorted(by_ver):
        for k, (op, _old, new) in by_ver[v].items():
            if op == "d":
                base.pop(k, None)
            else:
                base[k] = new
    want = {r.id: r.val for r in t.read(spark, version=3).collect()}
    assert base == want

    # full-range feed starts from the empty table: v1 is all creates
    full = change_feed(t, spark, keys=["id"], tracked=["val"]).collect()
    v1 = {r.id: r.op for r in full if r._commit_version == 1}
    assert v1 == {1: "c", 2: "c"}
