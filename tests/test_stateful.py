"""Stateful sessionization (applyInPandasWithState) — deterministic
streaming tests plus batch-twin cross-check."""

from __future__ import annotations

import uuid

import pytest

from pyspark.sql import functions as F

from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.streaming.stateful import (
    sessionize,
    sessionize_batch_oracle,
)

EVENTS_SCHEMA = "event_id long, ts timestamp, user_id long, value double"


def _rows():
    # user 1: two sessions (10:00-10:10, then 12:00 — gap > 30 min)
    # user 2: one session with three events
    return [
        (1, "2024-01-01 10:00:00", 1, 1.0),
        (2, "2024-01-01 10:10:00", 1, 2.0),
        (3, "2024-01-01 12:00:00", 1, 4.0),
        (4, "2024-01-01 10:05:00", 2, 10.0),
        (5, "2024-01-01 10:20:00", 2, 10.0),
        (6, "2024-01-01 10:40:00", 2, 10.0),
    ]


def _write_events(spark, path, rows):
    df = spark.createDataFrame(rows, "event_id long, ts string, user_id long, value double")
    df.withColumn("ts", F.col("ts").cast("timestamp")).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_sessionize_streaming_closes_on_gap(spark, tmp_path):
    src = str(tmp_path / "events")
    _write_events(spark, src, _rows())

    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, value double"
    ).parquet(src)
    sessions = sessionize(stream, gap="30 minutes", watermark="5 minutes")

    sink = f"sessions_{uuid.uuid4().hex[:8]}"
    q = (
        sessions.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, str(r.session_start)): (r.n_events, r.total_value)
        for r in spark.table(sink).collect()
    }
    # user 1's first session closes intra-batch on the 12:00 gap;
    # user 2's closes by event-time timeout in the final batch (the
    # watermark ends at 11:55 > 10:40 + 30 min); the 12:00 singleton
    # stays open (its horizon 12:30 is past the final watermark).
    assert got == {
        (1, "2024-01-01 10:00:00"): (2, 3.0),
        (2, "2024-01-01 10:05:00"): (3, 30.0),
    }


def test_sessionize_timeout_across_batches(spark, tmp_path):
    src = str(tmp_path / "events")
    _write_events(spark, src, _rows()[:2])  # batch 1: user 1, 10:00+10:10
    # batch 2: far-future event advances the watermark past
    # last(10:10) + gap(30m) + delay(5m) → event-time timeout fires
    _write_events(spark, src, [(99, "2024-01-02 00:00:00", 7, 0.5)])

    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, value double"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    sessions = sessionize(stream, gap="30 minutes", watermark="5 minutes")

    sink = f"sessions_{uuid.uuid4().hex[:8]}"
    q = (
        sessions.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {
        (r.user_id, str(r.session_start), str(r.session_end), r.n_events)
        for r in spark.table(sink).collect()
    }
    assert (1, "2024-01-01 10:00:00", "2024-01-01 10:10:00", 2) in rows


def test_sessionize_session_continues_across_batches(spark, tmp_path):
    """A session spanning micro-batches must merge the carried state
    with the next batch's first segment (the sequential carry-in fold
    of the r9 vectorized group pass) and then close on the later gap
    with the merged aggregates."""
    src = str(tmp_path / "events")
    # batch 1: two events 10:00 / 10:10 (session stays open)
    _write_events(spark, src, _rows()[:2])
    # batch 2: 10:20 continues the session (gap 30m not exceeded),
    # 11:30 closes it; the closer stays open and is never emitted
    # (its 12:00 horizon is past the final watermark 11:25).
    _write_events(
        spark,
        src,
        [
            (7, "2024-01-01 10:20:00", 1, 4.0),
            (8, "2024-01-01 11:30:00", 1, 8.0),
        ],
    )

    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, value double"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    sessions = sessionize(stream, gap="30 minutes", watermark="5 minutes")

    sink = f"sessions_{uuid.uuid4().hex[:8]}"
    q = (
        sessions.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {
        (
            r.user_id,
            str(r.session_start),
            str(r.session_end),
            r.n_events,
            float(r.total_value),
        )
        for r in spark.table(sink).collect()
    }
    assert rows == {
        (1, "2024-01-01 10:00:00", "2024-01-01 10:20:00", 3, 7.0)
    }


def test_batch_oracle_matches_closed_sessions(spark):
    df = spark.createDataFrame(
        _rows(), "event_id long, ts string, user_id long, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        (r.user_id, str(r.session_start)): (r.n_events, float(r.total_value))
        for r in sessionize_batch_oracle(df, gap="30 minutes").collect()
    }
    assert got == {
        (1, "2024-01-01 10:00:00"): (2, 3.0),
        (1, "2024-01-01 12:00:00"): (1, 4.0),
        (2, "2024-01-01 10:05:00"): (3, 30.0),
    }


def test_debounce_emits_first_and_counts_suppressed(spark, tmp_path):
    """Per-key event-time debounce: first event emits, events inside
    the cooldown are absorbed and counted, the next event after the
    cooldown emits with the suppression count; state survives across
    micro-batches."""
    import json

    def ev(k, ts, v):
        return json.dumps({"user_id": k, "ts": ts, "value": v})

    batch1 = [
        ev(1, "2024-01-01 10:00:00", 1.0),
        ev(1, "2024-01-01 10:01:00", 2.0),   # suppressed
        ev(1, "2024-01-01 10:02:00", 3.0),   # suppressed
        ev(2, "2024-01-01 10:00:30", 9.0),
    ]
    batch2 = [
        ev(1, "2024-01-01 10:06:00", 4.0),   # > 5 min after 10:00 -> emits
        ev(2, "2024-01-01 10:03:00", 8.0),   # suppressed (cooldown)
    ]
    d = tmp_path / "deb"
    d.mkdir()
    (d / "b0.jsonl").write_text("\n".join(batch1))
    (d / "b1.jsonl").write_text("\n".join(batch2))

    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.streaming.stateful import (
        debounce,
    )

    stream = (
        spark.readStream.schema("user_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .json(str(d))
    )
    out = debounce(stream, cooldown="5 minutes", watermark="1 minute")
    q = (
        out.writeStream.format("memory")
        .queryName("debounced")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = {
        (r.key, str(r.ts)): (r.value, r.suppressed_since_last)
        for r in spark.table("debounced").collect()
    }
    assert rows == {
        (1, "2024-01-01 10:00:00"): (1.0, 0),
        (1, "2024-01-01 10:06:00"): (4.0, 2),
        (2, "2024-01-01 10:00:30"): (9.0, 0),
    }


def test_debounce_streaming_matches_batch_twin(spark, tmp_path):
    """Kappa parity: the streaming debounce over a replayed file
    stream emits exactly what the batch twin computes on the same
    bounded data."""
    import json
    import random

    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.streaming.stateful import (
        debounce,
        debounce_batch,
    )

    rng = random.Random(3)
    rows = [
        {
            "user_id": rng.randrange(5),
            "ts": f"2024-01-01 {h:02d}:{m:02d}:00",
            "value": round(rng.random() * 10, 3),
        }
        for h in range(6)
        for m in sorted(rng.sample(range(60), 8))
    ]
    d = tmp_path / "kappa"
    d.mkdir()
    half = len(rows) // 2
    (d / "b0.jsonl").write_text("\n".join(json.dumps(r) for r in rows[:half]))
    (d / "b1.jsonl").write_text("\n".join(json.dumps(r) for r in rows[half:]))

    schema = "user_id long, ts timestamp, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(d))
    )
    q = (
        debounce(stream, cooldown="45 minutes", watermark="0 seconds")
        .writeStream.format("memory")
        .queryName("kappa_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got_stream = {
        (r.key, str(r.ts)): (r.value, r.suppressed_since_last)
        for r in spark.table("kappa_stream").collect()
    }

    batch_df = spark.read.schema(schema).json(str(d))
    got_batch = {
        (r.key, str(r.ts)): (r.value, r.suppressed_since_last)
        for r in debounce_batch(batch_df, cooldown="45 minutes").collect()
    }
    assert got_stream == got_batch and len(got_batch) > 10


def test_running_totals_transform_with_state_across_restarts(spark, tmp_path):
    """transformWithStateInPandas (Spark 4 arbitrary-state API): per-key
    lifetime totals held in RocksDB ValueState accumulate across a
    query restart on the same checkpoint."""
    import json

    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState state protocol requires protobuf",
    )
    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.streaming.stateful import (
        running_totals,
    )

    indir = tmp_path / "in"
    indir.mkdir()
    ckpt = str(tmp_path / "ckpt")
    prev_provider = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        def run_once(sink_name):
            stream = spark.readStream.schema("user_id long, value double").json(
                str(indir)
            )
            q = (
                running_totals(stream)
                .writeStream.format("memory")
                .queryName(sink_name)
                .outputMode("update")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            return {
                r["user_id"]: (r["n_events"], r["total_value"])
                for r in spark.sql(f"SELECT * FROM {sink_name}").collect()
            }

        (indir / "a.jsonl").write_text(
            "\n".join(
                json.dumps(r)
                for r in [
                    {"user_id": 1, "value": 10.0},
                    {"user_id": 1, "value": 5.0},
                    {"user_id": 2, "value": 1.0},
                ]
            )
        )
        first = run_once("rt_sink1")
        assert first[1] == (2, 15.0)
        assert first[2] == (1, 1.0)

        (indir / "b.jsonl").write_text(
            "\n".join(
                json.dumps(r)
                for r in [
                    {"user_id": 1, "value": 2.5},
                    {"user_id": 3, "value": 7.0},
                ]
            )
        )
        second = run_once("rt_sink2")
        # restarted query resumes RocksDB state: user 1 continues from 15
        assert second[1] == (3, 17.5)
        assert second[3] == (1, 7.0)
        assert 2 not in second  # no new rows for user 2 → no update emitted
    finally:
        if prev_provider is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev_provider
            )


# ---------------------------------------------------------------------------
# streaming EWMA: cross-batch state == batch fold
# ---------------------------------------------------------------------------

def test_ewma_stream_state_carries_across_batches(spark, tmp_path):
    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.streaming.stateful import (
        ewma_stream,
    )

    src = str(tmp_path / "ewma_events")
    # batch 1 (file 1): first two events per user; batch 2: the rest
    _write_events(spark, src, [
        (1, "2024-01-01 10:00:00", 1, 10.0),
        (2, "2024-01-01 10:01:00", 1, 20.0),
        (3, "2024-01-01 10:00:30", 2, 5.0),
    ])
    _write_events(spark, src, [
        (4, "2024-01-01 10:02:00", 1, 40.0),
        (5, "2024-01-01 10:03:00", 2, 15.0),
    ])

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    sink = f"ewma_{uuid.uuid4().hex[:8]}"
    q = (
        ewma_stream(stream)
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)

    rows = spark.table(sink).collect()
    final = {}
    for r in rows:
        if r.user_id not in final or r.n_events > final[r.user_id][0]:
            final[r.user_id] = (r.n_events, r.ewma_value)

    # sequential fold over ALL events in (ts, id) order
    u1 = ((10.0 * 0.7 + 20.0 * 0.3) * 0.7) + 40.0 * 0.3
    u2 = 5.0 * 0.7 + 15.0 * 0.3
    assert final[1] == (3, u1)
    assert final[2] == (2, u2)
    # intermediate emission from batch 1 exists too (update mode)
    assert any(r.user_id == 1 and r.n_events == 2 for r in rows)


# ---------------------------------------------------------------------------
# streaming anomaly detection: planted spike alerts, steady series quiet
# ---------------------------------------------------------------------------

def test_anomaly_stream_flags_planted_spike_across_batches(spark, tmp_path):
    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.streaming.stateful import (
        anomaly_stream,
    )

    src = str(tmp_path / "anom_events")
    # batch 1: user 1 steady-with-jitter warm-up (8 events);
    #          user 2 steady, no anomalies ever
    jitter = [10.0, 10.5, 9.5, 10.2, 9.8, 10.4, 9.6, 10.1]
    _write_events(spark, src, [
        (i, f"2024-01-01 10:{i:02d}:00", 1, v) for i, v in enumerate(jitter)
    ] + [
        (100 + i, f"2024-01-01 10:{i:02d}:30", 2, 5.0 + 0.1 * (i % 3))
        for i in range(8)
    ])
    # batch 2: user 1 gets a 10x spike then returns to normal
    _write_events(spark, src, [
        (50, "2024-01-01 11:00:00", 1, 100.0),
        (51, "2024-01-01 11:01:00", 1, 10.0),
        (150, "2024-01-01 11:00:30", 2, 5.1),
    ])

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    sink = f"anom_{uuid.uuid4().hex[:8]}"
    q = (
        anomaly_stream(stream, alpha=0.1, z=4.0, min_obs=5)
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)

    rows = spark.table(sink).collect()
    # exactly the spike alerts — warm-up jitter and user 2 stay quiet
    assert [(r.user_id, r.value) for r in rows] == [(1, 100.0)]
    assert rows[0].deviation_sigmas > 4.0
    assert abs(rows[0].expected - 10.0) < 1.0
