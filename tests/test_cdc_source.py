"""Custom Python DataSource (cdc_envelope): batch parallel read,
streaming micro-batches, and interop with the standard decode path."""

from __future__ import annotations

import time

import pytest

from pyspark.sql import functions as F

from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.sources.cdc_source import (
    CdcEnvelopeDataSource,
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    spark.dataSource.register(CdcEnvelopeDataSource)


def test_batch_read_is_deterministic_and_parallel(spark):
    df = (
        spark.read.format("cdc_envelope")
        .option("rows", 400)
        .option("numPartitions", 4)
        .load()
    )
    assert df.rdd.getNumPartitions() == 4
    rows = df.orderBy("offset").collect()
    assert len(rows) == 400
    assert [r["offset"] for r in rows] == list(range(400))
    again = (
        spark.read.format("cdc_envelope")
        .option("rows", 400)
        .option("numPartitions", 2)  # partitioning must not change data
        .load()
        .orderBy("offset")
        .collect()
    )
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]


def test_batch_feeds_standard_decode_path(spark):
    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.schemas import (
        EMPLOYEE_SCHEMA,
    )
    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.sources.cdc import (
        decode_cdc,
    )

    raw = (
        spark.read.format("cdc_envelope").option("rows", 400).load()
    )
    decoded = decode_cdc(raw.select("value"), EMPLOYEE_SCHEMA)
    # ops cycle c,u,u,d -> deletes dropped by the default decode
    ops = {r["op"]: r["n"] for r in decoded.groupBy("op").agg(F.count("*").alias("n")).collect()}
    assert ops == {"c": 100, "u": 200}
    assert decoded.filter(F.col("id").isNull()).count() == 0


def test_stream_reads_contiguous_offsets(spark, tmp_path):
    import uuid

    stream = (
        spark.readStream.format("cdc_envelope")
        .option("rowsPerBatch", 50)
        .option("maxRows", 150)
        .load()
    )
    sink = f"cdc_src_{uuid.uuid4().hex[:8]}"
    q = (
        stream.select("offset", "value")
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="1 second")
        .start()
    )
    deadline = time.time() + 60
    while time.time() < deadline:
        if spark.table(sink).count() >= 150:
            break
        time.sleep(1)
    q.stop()
    q.awaitTermination(30)
    offsets = sorted(r["offset"] for r in spark.table(sink).collect())
    n = len(offsets)
    assert n >= 150
    assert offsets == list(range(n))  # contiguous, no gaps or dupes


# ---------------------------------------------------------------------------
# custom sink: two-phase commit JSONL writer (batch + streaming)
# ---------------------------------------------------------------------------

def test_jsonl_sink_batch_publishes_only_on_commit(spark, tmp_path):
    import glob
    import json

    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.sources.cdc_source import (
        JsonlSinkDataSource,
    )

    spark.dataSource.register(JsonlSinkDataSource)
    out = str(tmp_path / "out")
    df = spark.range(100).select(
        F.col("id"), F.concat(F.lit("v"), F.col("id")).alias("name")
    ).repartition(4)
    df.write.format("jsonl_sink").option("path", out).mode("append").save()

    published = sorted(glob.glob(f"{out}/batch-*.jsonl"))
    assert published  # commit renamed staged files into place
    assert not glob.glob(f"{out}/_staging/*")  # nothing left staged
    rows = []
    for p in published:
        rows += [json.loads(l) for l in open(p)]
    assert sorted(r["id"] for r in rows) == list(range(100))


def test_jsonl_sink_streaming_chained_from_custom_source(spark, tmp_path):
    """Full custom-connector loop: cdc_envelope source → decode →
    jsonl_sink stream writer, batch-id-named files, exactly the
    generated records."""
    import glob
    import json
    import time

    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.sources.cdc_source import (
        JsonlSinkDataSource,
    )

    spark.dataSource.register(JsonlSinkDataSource)
    out = str(tmp_path / "sout")
    stream = (
        spark.readStream.format("cdc_envelope")
        .option("rowsPerBatch", 40)
        .option("maxRows", 120)
        .load()
    )
    q = (
        stream.select("offset", "key")
        .writeStream.format("jsonl_sink")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="1 second")
        .start()
    )
    deadline = time.time() + 60
    seen = 0
    while time.time() < deadline:
        seen = sum(
            1 for p in glob.glob(f"{out}/stream-*.jsonl") for _ in open(p)
        )
        if seen >= 120:
            break
        time.sleep(1)
    q.stop()
    q.awaitTermination(30)
    rows = [
        json.loads(l)
        for p in glob.glob(f"{out}/stream-*.jsonl")
        for l in open(p)
    ]
    offsets = sorted(r["offset"] for r in rows)
    assert len(offsets) >= 120
    assert offsets == list(range(len(offsets)))


def test_source_pushes_offset_filters_into_partition_planning(spark):
    # unfiltered: 1000 rows over 4 offset-range partitions
    base = (
        spark.read.format("cdc_envelope")
        .option("rows", 1000)
        .option("numPartitions", 4)
        .load()
    )
    assert base.rdd.getNumPartitions() == 4
    # offset < 200 is CONSUMED by the source (pushFilters clamps the
    # generated range): the optimized plan keeps no residual
    # comparison, so the 200-row result can only come from the
    # source-side pruning
    narrow = base.filter(F.col("offset") < 200)
    plan = narrow._jdf.queryExecution().optimizedPlan().toString()
    assert "200" not in plan
    assert narrow.count() == 200
    # non-offset predicates stay post-scan but results remain exact
    mixed = base.filter((F.col("offset") >= 100) & (F.col("key") == "8"))
    rows = mixed.collect()
    assert all(r["offset"] >= 100 and r["key"] == "8" for r in rows)
    assert mixed.count() == base.filter(
        (F.col("offset") >= 100) & (F.col("key") == "8")
    ).count()


def test_activities_table_variant_feeds_activity_decode(spark):
    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.schemas import (
        ACTIVITY_SCHEMA,
    )
    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.sources.cdc import (
        decode_cdc,
    )

    raw = (
        spark.read.format("cdc_envelope")
        .option("rows", 200)
        .option("table", "activities")
        .load()
    )
    decoded = decode_cdc(raw.select("value"), ACTIVITY_SCHEMA)
    rows = decoded.collect()
    assert len(rows) == 150  # deletes dropped
    assert all(r["activity_type"] is not None for r in rows)
    assert all(r["employee_id"] is not None for r in rows)
