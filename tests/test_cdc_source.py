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
