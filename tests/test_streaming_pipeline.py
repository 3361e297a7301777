"""Deterministic streaming tests: file sources + availableNow + memory
sinks (the test strategy the reference lacked — SURVEY §5)."""

from __future__ import annotations

from pathlib import Path

import pytest
from conftest import activity_row, employee_row, make_envelope

from pyspark.sql import functions as F

from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.streaming.pipeline import (
    CdcPipeline,
)


def _write_stream_files(dirpath: Path, groups: list[list[str]]) -> None:
    dirpath.mkdir(parents=True, exist_ok=True)
    for i, lines in enumerate(groups):
        (dirpath / f"batch{i}.jsonl").write_text("\n".join(lines) + "\n")


@pytest.fixture()
def cdc_dirs(tmp_path):
    emp_envs = [
        make_envelope(employee_row(1, dept="Engineering"), "c", 1704100000000),
        make_envelope(employee_row(2, dept="Sales", email="x.lead@c.t"), "c", 1704100001000),
        make_envelope(None, "d", 1704100002000, before=employee_row(3)),
    ]
    act_envs = [
        make_envelope(activity_row(1, 1, "login", "2024-01-01 10:05:00", 20), "c", 1704100003000),
        make_envelope(activity_row(2, 1, "login", "2024-01-01 10:25:00", 40), "c", 1704100004000),
        make_envelope(activity_row(3, 2, "click", "2024-01-01 11:05:00", 400, device="tablet"), "c", 1704100005000),
        make_envelope(activity_row(4, 2, "click", "2024-01-02 09:00:00", 10, device="desktop"), "u", 1704100006000),
        make_envelope(None, "d", 1704100007000, before=activity_row(5)),
    ]
    _write_stream_files(tmp_path / "emp", [emp_envs])
    _write_stream_files(tmp_path / "act", [act_envs])
    return tmp_path


def test_cdc_pipeline_fanout(spark, cdc_dirs, tmp_path):
    emp_raw = spark.readStream.text(str(cdc_dirs / "emp"))
    act_raw = spark.readStream.text(str(cdc_dirs / "act"))

    pipe = CdcPipeline(spark, checkpoint_root=str(tmp_path / "ckpt"))
    orch = pipe.start_memory_fanout(
        emp_raw, act_raw, lake_root=str(tmp_path / "lake")
    )
    assert orch.await_all(timeout=180)
    assert orch.failed() == {}

    emp = {r.id: r for r in spark.table("employees_enriched").collect()}
    assert set(emp) == {1, 2}  # delete dropped
    assert emp[1].department_category == "Technical"
    assert emp[2].employee_level == "Lead"

    act = {r.id: r for r in spark.table("activities_enriched").collect()}
    assert set(act) == {"1", "2", "3", "4"}
    assert act["3"].device_category == "Tablet"

    hourly = {
        (str(r.window_start), r.employee_id, r.activity_type): r
        for r in spark.table("hourly_agg").collect()
    }
    key = ("2024-01-01 10:00:00", 1, "login")
    assert key in hourly
    assert hourly[key].activity_count == 2
    assert hourly[key].total_duration == 60
    assert hourly[key].avg_duration == 30.0
    assert hourly[key].primary_device == "Mobile"

    daily = {
        (str(r.window_start), r.activity_type, r.device_category): r
        for r in spark.table("daily_agg").collect()
    }
    dkey = ("2024-01-01 00:00:00", "login", "Mobile")
    assert dkey in daily and daily[dkey].activity_count == 2
    # streaming distinct is the HLL sketch (approx_count_distinct)
    assert daily[dkey].unique_employees == 1

    # lake got the upserted employees, partitioned by processing_date
    lake = spark.read.parquet(str(tmp_path / "lake" / "employees"))
    assert {r.id for r in lake.collect()} == {1, 2}


def test_watermark_finalizes_append_windows(spark, tmp_path):
    """Append-mode windowed agg emits only watermark-expired windows:
    the reference's missing-watermark bug (T3) fixed and observable."""
    early = [
        make_envelope(activity_row(i, 1, "view", f"2024-01-01 0{h}:10:00"), "c", 1704100000000 + i)
        for i, h in enumerate((1, 2, 3))
    ]
    late = [
        make_envelope(activity_row(99, 1, "view", "2024-01-01 07:00:00"), "c", 1704100009000)
    ]
    _write_stream_files(tmp_path / "acts", [early, late])

    raw = (
        spark.readStream.option("maxFilesPerTrigger", 1)
        .text(str(tmp_path / "acts"))
    )
    pipe = CdcPipeline(spark, checkpoint_root=str(tmp_path / "ckpt2"))
    agg = pipe.hourly_aggregation(pipe.activities(raw))
    q = (
        agg.writeStream.format("memory")
        .queryName("wm_hourly")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {str(r.window_start) for r in spark.table("wm_hourly").collect()}
    # watermark advanced to 05:00 (07:00 − 2h): windows 01-03 finalized,
    # the 07:00 window still open → not emitted in append mode
    assert got == {
        "2024-01-01 01:00:00",
        "2024-01-01 02:00:00",
        "2024-01-01 03:00:00",
    }


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """T8: dropDuplicatesWithinWatermark on the decoded stream."""
    envs = [
        make_envelope(activity_row(1, 1, "login", "2024-01-01 10:00:00"), "c", 1),
        make_envelope(activity_row(1, 1, "login", "2024-01-01 10:00:30"), "c", 2),
        make_envelope(activity_row(2, 1, "click", "2024-01-01 10:01:00"), "c", 3),
    ]
    _write_stream_files(tmp_path / "dups", [envs])
    raw = spark.readStream.text(str(tmp_path / "dups"))
    pipe = CdcPipeline(spark, checkpoint_root=str(tmp_path / "ckpt3"))
    acts = pipe.activities(raw).withColumn(
        "event_ts", F.col("activity_timestamp").cast("timestamp")
    )
    deduped = acts.withWatermark("event_ts", "10 minutes").dropDuplicatesWithinWatermark(
        ["id"]
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName("deduped_acts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    ids = [r.id for r in spark.table("deduped_acts").collect()]
    assert sorted(ids) == ["1", "2"]


def test_orchestrator_duplicate_name_rejected(spark, tmp_path):
    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.streaming.orchestrator import (
        StreamOrchestrator,
    )

    orch = StreamOrchestrator()
    orch.queries["x"] = object()  # type: ignore[assignment]
    with pytest.raises(ValueError):
        orch.register("x", object())  # type: ignore[arg-type]


def test_stream_stream_join(spark, tmp_path):
    """T9: watermarked stream-stream equi-join with a time-range bound."""
    import json

    def ev(i, user, ts):
        return json.dumps({"id": i, "user_id": user, "ts": ts})

    (tmp_path / "l").mkdir()
    (tmp_path / "r").mkdir()
    (tmp_path / "l" / "a.jsonl").write_text(
        "\n".join([
            ev(1, 1, "2024-01-01 10:05:00"),
            ev(2, 1, "2024-01-01 12:00:00"),
            ev(3, 2, "2024-01-01 10:02:00"),
        ])
    )
    (tmp_path / "r" / "a.jsonl").write_text(
        "\n".join([
            ev(100, 1, "2024-01-01 10:00:00"),
            ev(200, 2, "2024-01-01 09:59:00"),
            ev(300, 2, "2024-01-01 11:00:00"),
        ])
    )
    schema = "id long, user_id long, ts timestamp"
    left = (
        spark.readStream.schema(schema).json(str(tmp_path / "l"))
        .withWatermark("ts", "1 hour")
        .select(F.col("id").alias("l_id"), F.col("user_id").alias("l_user"),
                F.col("ts").alias("l_ts"))
    )
    right = (
        spark.readStream.schema(schema).json(str(tmp_path / "r"))
        .withWatermark("ts", "1 hour")
        .select(F.col("id").alias("r_id"), F.col("user_id").alias("r_user"),
                F.col("ts").alias("r_ts"))
    )
    joined = left.join(
        right,
        (F.col("l_user") == F.col("r_user"))
        & (F.col("r_ts") <= F.col("l_ts"))
        & (F.col("r_ts") >= F.col("l_ts") - F.expr("INTERVAL 10 MINUTES")),
    )
    q = (
        joined.writeStream.format("memory").queryName("ss_join")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    got = {(r.l_id, r.r_id) for r in spark.table("ss_join").collect()}
    # 1 matches 100 (5 min before); 3 matches 200 (3 min); 2 matches
    # nothing (view 2h earlier is out of range)
    assert got == {(1, 100), (3, 200)}


def test_stream_static_broadcast_join(spark, tmp_path):
    """J1: the employees↔activities FK enrichment as a stream-static
    join — the static dim is broadcast to every micro-batch; no state,
    no watermark needed on the static side."""
    import json
    import uuid

    static_emps = spark.createDataFrame(
        [(1, "emp1", "Engineering"), (2, "emp2", "Sales")],
        "id long, name string, department string",
    )
    (tmp_path / "acts").mkdir()
    (tmp_path / "acts" / "a.jsonl").write_text(
        "\n".join(
            json.dumps(d)
            for d in [
                {"activity_id": 10, "employee_id": 1, "activity_type": "login"},
                {"activity_id": 11, "employee_id": 2, "activity_type": "click"},
                {"activity_id": 12, "employee_id": 99, "activity_type": "click"},
            ]
        )
    )
    acts = spark.readStream.schema(
        "activity_id long, employee_id long, activity_type string"
    ).json(str(tmp_path / "acts"))

    enriched = acts.join(
        F.broadcast(static_emps),
        acts.employee_id == static_emps.id,
        "left",
    ).select("activity_id", "activity_type", "name", "department")

    sink = f"stream_static_{uuid.uuid4().hex[:8]}"
    q = (
        enriched.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.activity_id: (r.name, r.department) for r in spark.table(sink).collect()}
    assert got == {
        10: ("emp1", "Engineering"),
        11: ("emp2", "Sales"),
        12: (None, None),  # unmatched FK keeps the activity (left join)
    }


def test_stream_stream_left_outer_join(spark, tmp_path):
    """T9+: watermarked stream-stream LEFT OUTER join — unmatched left
    rows must still emit (with nulls) once the watermark passes the
    join window, which availableNow's final batch forces."""
    import json

    def ev(i, user, ts):
        return json.dumps({"id": i, "user_id": user, "ts": ts})

    (tmp_path / "l").mkdir()
    (tmp_path / "r").mkdir()
    # flush rows at 12:00 push BOTH streams' watermarks (the join uses
    # the min) past the 10-minute window so unmatched-left state is
    # evicted and emitted with nulls; the flush rows themselves stay
    # pending and never emit.
    (tmp_path / "l" / "a.jsonl").write_text(
        "\n".join([
            ev(1, 1, "2024-01-01 10:05:00"),
            ev(2, 9, "2024-01-01 10:06:00"),   # no right-side match
            ev(3, 2, "2024-01-01 10:02:00"),
            ev(99, 97, "2024-01-01 12:00:00"),
        ])
    )
    (tmp_path / "r" / "a.jsonl").write_text(
        "\n".join([
            ev(100, 1, "2024-01-01 10:00:00"),
            ev(200, 2, "2024-01-01 09:59:00"),
            ev(900, 98, "2024-01-01 12:00:00"),
        ])
    )
    schema = "id long, user_id long, ts timestamp"
    left = (
        spark.readStream.schema(schema).json(str(tmp_path / "l"))
        .withWatermark("ts", "10 minutes")
        .select(F.col("id").alias("l_id"), F.col("user_id").alias("l_user"),
                F.col("ts").alias("l_ts"))
    )
    right = (
        spark.readStream.schema(schema).json(str(tmp_path / "r"))
        .withWatermark("ts", "10 minutes")
        .select(F.col("id").alias("r_id"), F.col("user_id").alias("r_user"),
                F.col("ts").alias("r_ts"))
    )
    joined = left.join(
        right,
        (F.col("l_user") == F.col("r_user"))
        & (F.col("r_ts") <= F.col("l_ts"))
        & (F.col("r_ts") >= F.col("l_ts") - F.expr("INTERVAL 10 MINUTES")),
        "leftOuter",
    )
    q = (
        joined.writeStream.format("memory").queryName("ss_left_join")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    got = {(r.l_id, r.r_id) for r in spark.table("ss_left_join").collect()}
    assert got == {(1, 100), (3, 200), (2, None)}


def test_metrics_listener_captures_progress(spark, tmp_path):
    """MetricsListener sees per-batch input rows and state size for a
    named query (engine-native twin of the reference's console/UI
    monitoring)."""
    import json
    import time as _time

    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.streaming.orchestrator import (
        MetricsListener,
    )

    (tmp_path / "in").mkdir()
    (tmp_path / "in" / "a.jsonl").write_text(
        "\n".join(
            json.dumps({"id": i, "ts": f"2024-01-01 10:{i:02d}:00"})
            for i in range(30)
        )
    )
    metrics = MetricsListener().attach(spark)
    try:
        stream = spark.readStream.schema("id long, ts timestamp").json(
            str(tmp_path / "in")
        )
        agg = stream.withWatermark("ts", "1 hour").groupBy(
            F.window("ts", "10 minutes")
        ).count()
        q = (
            agg.writeStream.format("memory")
            .queryName("metrics_probe")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # listener delivery is async; allow it to drain
        for _ in range(50):
            if metrics.totals().get("metrics_probe", 0) >= 30:
                break
            _time.sleep(0.2)
        snaps = metrics.progress("metrics_probe")
        assert sum(p["num_input_rows"] for p in snaps) == 30
        assert any(p["state_rows"] > 0 for p in snaps)
    finally:
        metrics.detach(spark)


def test_cdc_deletes_flow_to_lake_tombstones(spark, tmp_path):
    """End-to-end changelog: CDC inserts then a delete envelope stream
    through decode_cdc(keep_deletes=True) into the upsert lake — the
    tombstone removes its key (the reference silently dropped
    deletes, MSP:119)."""
    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.schemas import (
        EMPLOYEE_SCHEMA,
    )
    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.sources.cdc import (
        decode_cdc,
    )
    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.streaming.lake import (
        LakeTable,
        write_stream_to_lake,
    )

    batch1 = [
        make_envelope(employee_row(1), "c", 1704100000000),
        make_envelope(employee_row(2), "c", 1704100001000),
    ]
    batch2 = [
        make_envelope(None, "d", 1704100002000, before=employee_row(1)),
        make_envelope(employee_row(3), "c", 1704100003000),
    ]
    _write_stream_files(tmp_path / "cdc", [batch1, batch2])

    raw = (
        spark.readStream.option("maxFilesPerTrigger", 1)
        .text(str(tmp_path / "cdc"))
    )
    decoded = (
        decode_cdc(raw, EMPLOYEE_SCHEMA, keep_deletes=True)
        .withColumn("_is_delete", F.col("op") == "d")
        .withColumn("processing_date", F.to_date("processing_timestamp"))
    )
    # precombine on the SOURCE change time (ts_ms → event_timestamp),
    # not arrival time: correct winner even if micro-batches arrive
    # out of order (file-source mtime ties can reorder tiny batches)
    table = LakeTable(
        path=str(tmp_path / "lake_emp"), precombine_field="event_timestamp"
    )
    q = write_stream_to_lake(
        decoded,
        table,
        str(tmp_path / "ckpt_tomb"),
        available_now=True,
        delete_col="_is_delete",
    )
    q.awaitTermination(180)
    assert {r.id for r in table.read(spark).collect()} == {2, 3}


def test_checkpoint_resume_processes_only_new_data(spark, tmp_path):
    """T6 hardening: a restarted query resumes from its checkpoint —
    already-committed input is not reprocessed (upsert counts stay
    exact-once), new files are."""
    import json

    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.streaming.lake import (
        LakeTable,
        write_stream_to_lake,
    )

    indir = tmp_path / "in"
    indir.mkdir()

    def wfile(name, rows):
        (indir / name).write_text(
            "\n".join(
                json.dumps(
                    {
                        "id": i,
                        "val": v,
                        "processing_timestamp": ts,
                        "processing_date": ts[:10],
                    }
                )
                for i, v, ts in rows
            )
        )

    schema = (
        "id int, val string, processing_timestamp timestamp, "
        "processing_date date"
    )
    table = LakeTable(path=str(tmp_path / "lake"))
    ckpt = str(tmp_path / "ckpt")

    wfile("b0.jsonl", [(1, "a", "2024-01-01 10:00:00"), (2, "b", "2024-01-01 10:00:01")])
    stream1 = spark.readStream.schema(schema).json(str(indir))
    q1 = write_stream_to_lake(stream1, table, ckpt, available_now=True)
    q1.awaitTermination(120)
    assert {r.id for r in table.read(spark).collect()} == {1, 2}

    # second run, same checkpoint: only the new file is an input
    wfile("b1.jsonl", [(2, "b2", "2024-01-01 11:00:00"), (3, "c", "2024-01-01 11:00:01")])
    stream2 = spark.readStream.schema(schema).json(str(indir))
    q2 = write_stream_to_lake(stream2, table, ckpt, available_now=True)
    q2.awaitTermination(120)

    got = {r.id: r.val for r in table.read(spark).collect()}
    assert got == {1: "a", 2: "b2", 3: "c"}
    # the resumed run saw exactly one micro-batch (the new file), and
    # the committed sources list b0 only once across both runs
    import glob as _glob

    committed = sorted(_glob.glob(ckpt + "/*/commits/*"))
    assert len(committed) == 2  # one commit per run


def test_observe_counters_surface_in_listener(spark, tmp_path):
    """df.observe quality counters ride each micro-batch for free and
    land in MetricsListener progress entries — no extra scan, no
    second query."""
    import json
    import time as _time

    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.streaming.orchestrator import (
        MetricsListener,
        observe_counters,
    )

    (tmp_path / "in").mkdir()
    rows = [
        {"id": i, "v": (None if i % 5 == 0 else float(i))} for i in range(20)
    ]
    (tmp_path / "in" / "a.jsonl").write_text(
        "\n".join(json.dumps(r) for r in rows)
    )
    metrics = MetricsListener().attach(spark)
    try:
        stream = spark.readStream.schema("id long, v double").json(
            str(tmp_path / "in")
        )
        observed = observe_counters(stream, "quality", "v")
        q = (
            observed.writeStream.format("memory")
            .queryName("obs_sink")
            .option(
                "checkpointLocation", str(tmp_path / "ckpt")
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        # listener delivery is async; poll briefly
        got = None
        for _ in range(40):
            for entry in metrics.progress("obs_sink"):
                if entry["observed"].get("quality"):
                    got = entry["observed"]["quality"]
            if got:
                break
            _time.sleep(0.25)
        assert got is not None, "observed metrics never surfaced"
        assert got["rows"] == 20
        assert got["nulls"] == 4
        assert got["value_sum"] == sum(r["v"] for r in rows if r["v"] is not None)
    finally:
        metrics.detach(spark)


def test_canonical_union_of_cdc_and_cassandra_streams(spark, tmp_path):
    """SURVEY §2.9 extension: the Postgres-CDC and Cassandra activity
    streams union into ONE canonical stream — a single windowed agg
    sees events from both sources (the reference ran them as parallel
    pipelines and never merged them)."""
    import json

    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.streaming.sinks import (
        write_memory,
    )

    cdc_envs = [
        make_envelope(activity_row(1, 1, "login", "2024-01-01 10:05:00", 20), "c", 1704100000000),
        make_envelope(activity_row(2, 1, "login", "2024-01-01 10:25:00", 40), "u", 1704100001000),
        make_envelope(None, "d", 1704100002000, before=activity_row(9)),
    ]
    # Cassandra connector contract: bare row-image JSON, no envelope
    cass_rows = [
        json.dumps(activity_row(101, 1, "login", "2024-01-01 10:45:00", 60)),
        json.dumps(activity_row(102, 2, "click", "2024-01-01 10:50:00", 30, device="tablet")),
    ]
    _write_stream_files(tmp_path / "cdc", [cdc_envs])
    _write_stream_files(tmp_path / "cass", [cass_rows])

    pipe = CdcPipeline(spark, checkpoint_root=str(tmp_path / "ckpt"))
    canonical = pipe.canonical_activities(
        spark.readStream.text(str(tmp_path / "cdc")),
        spark.readStream.text(str(tmp_path / "cass")),
    )
    assert canonical.isStreaming
    q1 = write_memory(canonical, "canonical_acts")
    q2 = write_memory(
        pipe.hourly_aggregation(canonical), "canonical_hourly", output_mode="update"
    )
    q1.awaitTermination(120)
    q2.awaitTermination(120)

    acts = {r.id: r for r in spark.table("canonical_acts").collect()}
    assert set(acts) == {"1", "2", "101", "102"}  # delete dropped, both sources in
    assert acts["1"].data_source == "postgres-cdc"
    assert acts["101"].data_source == "cassandra"
    assert acts["102"].device_category == "Tablet"

    hourly = {
        (r.employee_id, r.activity_type): r
        for r in spark.table("canonical_hourly").collect()
    }
    merged = hourly[(1, "login")]
    assert merged.activity_count == 3  # 2 CDC + 1 Cassandra in the same window
    assert merged.total_duration == 120


def test_single_scan_fanout_one_query_many_sinks(spark, cdc_dirs, tmp_path):
    """One StreamingQuery drives N sinks from one persisted batch:
    all sinks see identical rows, and only one query runs."""
    act_raw = spark.readStream.text(str(cdc_dirs / "act"))
    pipe = CdcPipeline(spark, checkpoint_root=str(tmp_path / "ckpt"))

    sink_a = tmp_path / "sink_a"
    sink_b = tmp_path / "sink_b"
    seen_batches: list[int] = []

    def to_parquet(path):
        def write(batch_df, batch_id):
            batch_df.write.mode("append").parquet(str(path))
        return write

    def record_batch(batch_df, batch_id):
        seen_batches.append((batch_id, batch_df.count()))

    before = len(spark.streams.active)
    q = pipe.start_single_scan_fanout(
        act_raw, [to_parquet(sink_a), to_parquet(sink_b), record_batch]
    )
    assert len(spark.streams.active) == before + 1  # ONE query, not 3
    q.awaitTermination(120)

    a = {r.id for r in spark.read.parquet(str(sink_a)).collect()}
    b = {r.id for r in spark.read.parquet(str(sink_b)).collect()}
    assert a == b == {"1", "2", "3", "4"}  # delete dropped, sinks agree
    assert sum(n for _, n in seen_batches) == 4


def test_stream_stream_full_outer_join(spark, tmp_path):
    """T9+: watermarked stream-stream FULL OUTER join — unmatched rows
    from BOTH sides emit with nulls once the watermark proves no match
    can still arrive (Spark 3.1+ capability the left-outer test covers
    only half of)."""
    import json

    def ev(i, user, ts):
        return json.dumps({"id": i, "user_id": user, "ts": ts})

    (tmp_path / "fl").mkdir()
    (tmp_path / "fr").mkdir()
    (tmp_path / "fl" / "a.jsonl").write_text(
        "\n".join([
            ev(1, 1, "2024-01-01 10:05:00"),
            ev(2, 9, "2024-01-01 10:06:00"),   # left-only
            ev(99, 97, "2024-01-01 12:00:00"),  # watermark flush
        ])
    )
    (tmp_path / "fr" / "a.jsonl").write_text(
        "\n".join([
            ev(100, 1, "2024-01-01 10:00:00"),
            ev(300, 7, "2024-01-01 10:01:00"),  # right-only
            ev(900, 98, "2024-01-01 12:00:00"),  # watermark flush
        ])
    )
    schema = "id long, user_id long, ts timestamp"
    left = (
        spark.readStream.schema(schema).json(str(tmp_path / "fl"))
        .withWatermark("ts", "10 minutes")
        .select(F.col("id").alias("l_id"), F.col("user_id").alias("l_user"),
                F.col("ts").alias("l_ts"))
    )
    right = (
        spark.readStream.schema(schema).json(str(tmp_path / "fr"))
        .withWatermark("ts", "10 minutes")
        .select(F.col("id").alias("r_id"), F.col("user_id").alias("r_user"),
                F.col("ts").alias("r_ts"))
    )
    joined = left.join(
        right,
        (F.col("l_user") == F.col("r_user"))
        & (F.col("r_ts") <= F.col("l_ts"))
        & (F.col("r_ts") >= F.col("l_ts") - F.expr("INTERVAL 10 MINUTES")),
        "fullOuter",
    )
    q = (
        joined.writeStream.format("memory").queryName("ss_full_join")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    got = {(r.l_id, r.r_id) for r in spark.table("ss_full_join").collect()}
    assert got == {(1, 100), (2, None), (None, 300)}


def test_chained_streaming_window_aggregations(spark, tmp_path):
    """Multiple stateful operators in ONE streaming query (Spark 3.4+):
    a 5-minute windowed count re-aggregated into 15-minute windows
    downstream — the rollup-of-rollup shape that previously required
    two queries with an intermediate topic. Append mode: only windows
    the watermark has closed emit; the late flush row closes them."""
    import json

    (tmp_path / "ch").mkdir()
    (tmp_path / "ch" / "a.jsonl").write_text(
        "\n".join(
            [json.dumps({"id": i, "ts": f"2024-01-01 10:{m:02d}:00"})
             for i, m in enumerate([0, 1, 2, 6, 7, 11, 16])]
            + [json.dumps({"id": 99, "ts": "2024-01-01 13:00:00"})]
        )
    )
    stream = (
        spark.readStream.schema("id long, ts timestamp")
        .json(str(tmp_path / "ch"))
        .withWatermark("ts", "5 minutes")
    )
    five = stream.groupBy(F.window("ts", "5 minutes").alias("w5")).agg(
        F.count("*").alias("n5")
    )
    fifteen = (
        five.groupBy(F.window(F.col("w5"), "15 minutes").alias("w15"))
        .agg(F.sum("n5").alias("n15"), F.count("*").alias("n_subwindows"))
        .select(
            F.col("w15.start").alias("start"), "n15", "n_subwindows"
        )
    )
    q = (
        fifteen.writeStream.format("memory").queryName("chained_agg")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    got = {
        (str(r.start), r.n15, r.n_subwindows)
        for r in spark.table("chained_agg").collect()
    }
    # 10:00-10:15 closes with three 5-min subwindows (3+2+1 events);
    # 10:15-10:30 closes too (flush row advances watermark past it)
    assert got == {
        ("2024-01-01 10:00:00", 6, 3),
        ("2024-01-01 10:15:00", 1, 1),
    }


def test_watermark_drops_late_rows_and_listener_reports_them(spark, tmp_path):
    """T3 end-to-end: a row arriving beyond the watermark horizon is
    DROPPED from the windowed aggregate, and the progress listener
    surfaces numRowsDroppedByWatermark for the audit trail."""
    import time as _time

    import pandas as pd
    from pyspark.sql import functions as F

    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.streaming.orchestrator import (
        MetricsListener,
    )

    src = tmp_path / "src"
    src.mkdir()

    def write(i, rows):
        p = src / f"{i}.parquet"
        pd.DataFrame(rows).to_parquet(
            p, coerce_timestamps="us", allow_truncated_timestamps=True
        )
        t = _time.time() + i * 10
        import os as _os

        _os.utime(p, (t, t))

    ts = lambda h, m=0: pd.Timestamp(2024, 1, 1, h, m)  # noqa: E731
    # batch 0: window 09:00 rows; batch 1 advances event time to 13:00
    # (watermark 12:00 applies from batch 2 on); batch 2 runs under
    # that watermark, so its commit EVICTS + emits the 09:00 window;
    # batch 3's 09:45 row then hits evicted state beyond the horizon
    # - the definition of a late row - and must be dropped, not merged
    write(0, {"ts": [ts(9, 5), ts(9, 10)], "v": [1, 2]})
    write(1, {"ts": [ts(13, 0)], "v": [10]})
    write(2, {"ts": [ts(13, 5)], "v": [20]})
    write(3, {"ts": [ts(9, 45)], "v": [100]})

    listener = MetricsListener().attach(spark)
    try:
        stream = (
            spark.readStream.schema("ts timestamp, v bigint")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        agg = (
            stream.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour"))
            .agg(F.sum("v").alias("total"))
            .select(F.col("window.start").alias("ws"), "total")
        )
        name = "late_audit_sink"
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        rows = {r.ws.hour: r.total for r in spark.table(name).collect()}
        # the 09:00 window finalized WITHOUT the late 100
        assert rows.get(9) == 3
        # listener events are delivered asynchronously - poll briefly
        dropped = 0
        for _ in range(40):
            dropped = sum(
                p["late_rows_dropped"] for p in listener.progress(name)
            )
            if dropped >= 1:
                break
            _time.sleep(0.25)
        assert dropped >= 1
    finally:
        listener.detach(spark)
