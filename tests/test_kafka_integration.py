"""Live-broker Kafka round-trip — gated integration test.

The reference actually produces/consumes against a broker
(multi_source_streaming_processor.py:76-96, 242-258; compose stack
docker-compose.yml:40-54). The engine's wrappers are contract-tested
broker-less elsewhere; THIS test exercises the real
``format("kafka")`` path end-to-end — produce CDC envelopes → batch
read → two-stage decode → re-publish via the streaming Kafka sink
(availableNow) → consume the processed topic back — whenever a
broker IS reachable.

Gate: runs only when ``$SPARK_KAFKA_BOOTSTRAP`` is set (e.g.
``localhost:9092``); additionally skips, not fails, when the
spark-sql-kafka connector jar is absent from the session classpath.
Both are expected in the CI sandbox — the test documents the
day-one wiring a real deployment hits.
"""

from __future__ import annotations

import os
import uuid

import pytest
from conftest import employee_row, make_envelope

from pyspark.sql import functions as F

BOOTSTRAP = os.environ.get("SPARK_KAFKA_BOOTSTRAP")

pytestmark = pytest.mark.skipif(
    not BOOTSTRAP,
    reason="SPARK_KAFKA_BOOTSTRAP not set — live-broker Kafka "
    "round-trip needs a reachable broker",
)


def _produce_or_skip(df, topic: str) -> None:
    """Batch-publish (key, value) rows; skip if the kafka data source
    jar is not on the classpath."""
    try:
        (
            df.write.format("kafka")
            .option("kafka.bootstrap.servers", BOOTSTRAP)
            .option("topic", topic)
            .save()
        )
    except Exception as exc:  # noqa: BLE001 - classify, then skip/raise
        msg = str(exc)
        if "Failed to find data source: kafka" in msg or "kafka" in msg.lower() and "source" in msg.lower():
            pytest.skip("spark-sql-kafka connector jar not on classpath")
        raise


def test_kafka_cdc_roundtrip(spark, tmp_path):
    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.schemas import (
        EMPLOYEE_SCHEMA,
    )
    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.sources.cdc import (
        decode_cdc,
    )
    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.sources.kafka import (
        read_kafka_batch,
        read_kafka_stream,
    )
    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.streaming.sinks import (
        write_kafka,
    )

    run = uuid.uuid4().hex[:8]
    topic_in, topic_out = f"sg_in_{run}", f"sg_out_{run}"
    n = 25

    envelopes = [
        (str(i), make_envelope(employee_row(i), "c", 1_700_000_000_000 + i))
        for i in range(n)
    ]
    produced = spark.createDataFrame(envelopes, "key string, value string")
    _produce_or_skip(produced, topic_in)

    # batch consume + two-stage decode: every produced id comes back typed
    raw = read_kafka_batch(spark, BOOTSTRAP, topic_in)
    decoded = decode_cdc(
        raw.select(F.col("value").cast("string").alias("value")),
        EMPLOYEE_SCHEMA,
    )
    got_ids = sorted(r.id for r in decoded.select("id").collect())
    assert got_ids == list(range(n))

    # streaming re-publish: earliest-offset stream -> decode -> Kafka
    # sink (availableNow drains the topic then stops)
    stream = read_kafka_stream(
        spark, BOOTSTRAP, topic_in, starting_offsets="earliest"
    )
    typed = decode_cdc(
        stream.select(F.col("value").cast("string").alias("value")),
        EMPLOYEE_SCHEMA,
    )
    q = write_kafka(
        typed.select("id", "name", "email", "department"),
        BOOTSTRAP,
        topic_out,
        checkpoint_root=str(tmp_path / "ck"),
        key_cols=("id",),
        available_now=True,
    )
    q.awaitTermination(120)

    # consume the processed topic: keys match, payload is the JSON of
    # the projected columns (kafka_payload contract, MSP:245-246)
    back = read_kafka_batch(spark, BOOTSTRAP, topic_out).select(
        F.col("key").cast("string").alias("key"),
        F.col("value").cast("string").alias("value"),
    )
    rows = back.collect()
    assert sorted(int(r.key) for r in rows) == list(range(n))
    parsed = back.select(
        F.get_json_object("value", "$.id").cast("int").alias("id"),
        F.get_json_object("value", "$.department").alias("department"),
    ).collect()
    assert {r.department for r in parsed} == {"Engineering"}
    assert sorted(r.id for r in parsed) == list(range(n))
