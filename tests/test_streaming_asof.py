"""Streaming as-of enrichment (AsofEnrichView): ordered multi-batch
replay equals the batch as-of join; replays are no-ops; state stays
compacted to one row per key."""

from __future__ import annotations

import os
import time

import pandas as pd
import pytest

from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.operators.joins import (
    asof_join,
)
from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.streaming.asof import (
    AsofEnrichView,
    write_streams_to_asof_enrich,
)

F_SCHEMA = "fact_id bigint, k bigint, ts timestamp"
S_SCHEMA = "k bigint, ts timestamp, sv string"


def _ts(minute):
    return pd.Timestamp(2024, 1, 1, 9, minute)


def _pyts(minute):
    import datetime

    return datetime.datetime(2024, 1, 1, 9, minute)


def _write_slices(dirpath, frames):
    """Write time-slice files with strictly increasing mtimes so the
    file stream source replays them in event-time order."""
    dirpath.mkdir()
    for i, frame in enumerate(frames):
        p = dirpath / f"{i}.parquet"
        frame.to_parquet(p, coerce_timestamps="us", allow_truncated_timestamps=True)
        t = time.time() + i * 10
        os.utime(p, (t, t))


def test_multi_batch_ordered_replay_equals_batch_asof(spark, tmp_path):
    fdir, sdir = tmp_path / "facts", tmp_path / "state"
    # slice 0: minutes 0-9, slice 1: 10-19, slice 2: 20-29
    _write_slices(
        fdir,
        [
            pd.DataFrame({"fact_id": [1], "k": [1], "ts": [_ts(5)]}),
            pd.DataFrame({"fact_id": [2, 3], "k": [1, 2], "ts": [_ts(15), _ts(16)]}),
            pd.DataFrame({"fact_id": [4], "k": [2], "ts": [_ts(25)]}),
        ],
    )
    _write_slices(
        sdir,
        [
            pd.DataFrame({"k": [1], "ts": [_ts(1)], "sv": ["a"]}),
            pd.DataFrame({"k": [1, 2], "ts": [_ts(12), _ts(11)], "sv": ["b", "x"]}),
            pd.DataFrame({"k": [2], "ts": [_ts(24)], "sv": ["y"]}),
        ],
    )
    facts = (
        spark.readStream.schema(F_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(fdir))
    )
    updates = (
        spark.readStream.schema(S_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(sdir))
    )
    view = AsofEnrichView(
        path=str(tmp_path / "v"), on=("k",), left_ts="ts", right_ts="ts"
    )
    q = write_streams_to_asof_enrich(
        facts, updates, view,
        checkpoint_root=str(tmp_path / "ck"),
        available_now=True,
    )
    assert q.awaitTermination(180)

    got = sorted(
        tuple(r)
        for r in view.read(spark)
        .select("fact_id", "k", "sv_right")
        .collect()
    )
    fb = spark.read.schema(F_SCHEMA).parquet(str(fdir))
    sb = spark.read.schema(S_SCHEMA).parquet(str(sdir))
    want = sorted(
        tuple(r)
        for r in asof_join(fb, sb, on="k", left_ts="ts", right_ts="ts")
        .select("fact_id", "k", "sv_right")
        .collect()
    )
    assert got == want
    # the run really was incremental
    ledger = os.path.join(view.path, "_asof_commits")
    assert len(os.listdir(ledger)) >= 2
    # facts before any state row enrich to null, later ones see updates
    by_id = {r[0]: r[2] for r in got}
    assert by_id[1] == "a" and by_id[2] == "b"


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_replayed_batch_is_noop(spark, tmp_path):
    view = AsofEnrichView(
        path=str(tmp_path / "v"), on=("k",), left_ts="ts", right_ts="ts"
    )
    f0 = _mk(spark, [(1, 1, _pyts(5))], F_SCHEMA)
    s0 = _mk(spark, [(1, _pyts(1), "a")], S_SCHEMA)
    view.apply_batch(f0, s0, spark, 0)
    n0 = view.read(spark).count()
    # crash-replay: marker removed -> re-run rewrites the SAME files
    os.remove(view._marker(0))
    view.apply_batch(f0, s0, spark, 0)
    assert view.read(spark).count() == n0
    # committed replay: immediate no-op
    view.apply_batch(f0, s0, spark, 0)
    assert view.read(spark).count() == n0


def test_state_compacts_to_latest_per_key(spark, tmp_path):
    view = AsofEnrichView(
        path=str(tmp_path / "v"), on=("k",), left_ts="ts", right_ts="ts"
    )
    view.apply_batch(
        _mk(spark, [], F_SCHEMA),
        _mk(spark, [(1, _pyts(1), "a"), (1, _pyts(2), "b"), (2, _pyts(1), "x")], S_SCHEMA),
        spark,
        0,
    )
    view.apply_batch(
        _mk(spark, [(1, 1, _pyts(10)), (2, 2, _pyts(10))], F_SCHEMA),
        _mk(spark, [(1, _pyts(4), "c")], S_SCHEMA),
        spark,
        1,
    )
    state = spark.read.parquet(os.path.join(view._state, "batch=1"))
    rows = sorted(tuple(r) for r in state.select("k", "sv").collect())
    assert rows == [(1, "c"), (2, "x")]
    out = {
        r[0]: r[1]
        for r in view.read(spark).select("fact_id", "sv_right").collect()
    }
    assert out == {1: "c", 2: "x"}


def test_uncommitted_state_generation_is_skipped(spark, tmp_path):
    view = AsofEnrichView(
        path=str(tmp_path / "v"), on=("k",), left_ts="ts", right_ts="ts"
    )
    view.apply_batch(
        _mk(spark, [], F_SCHEMA), _mk(spark, [(1, _pyts(1), "a")], S_SCHEMA), spark, 0
    )
    # batch 1 wrote state but "crashed" before committing
    view.apply_batch(
        _mk(spark, [], F_SCHEMA), _mk(spark, [(1, _pyts(2), "b")], S_SCHEMA), spark, 1
    )
    os.remove(view._marker(1))
    # batch 2 must fall back to generation 0 ("a"), not see "b"
    prev = view._latest_state(spark, 2)
    assert [tuple(r) for r in prev.select("k", "sv").collect()] == [(1, "a")]
