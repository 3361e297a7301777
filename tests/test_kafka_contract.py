"""Kafka source/sink contract (SURVEY §2.1 S1/S2, §2.2 K1) — option
builders and the record payload shape, testable without a broker."""

from __future__ import annotations

import json

from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.sources.kafka import (
    kafka_source_options,
)
from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.streaming.sinks import (
    kafka_payload,
)


def test_source_options_reference_parity():
    opts = kafka_source_options("broker:9092", "employee-server.public.employees")
    # MSP:78-85 contract
    assert opts == {
        "kafka.bootstrap.servers": "broker:9092",
        "subscribe": "employee-server.public.employees",
        "startingOffsets": "latest",
        "failOnDataLoss": "false",
    }


def test_source_options_backpressure():
    opts = kafka_source_options(
        "b:9092", "t", starting_offsets="earliest", max_offsets_per_trigger=50000
    )
    assert opts["startingOffsets"] == "earliest"
    assert opts["maxOffsetsPerTrigger"] == "50000"


def test_kafka_payload_key_coalesce_and_json_value(spark):
    df = spark.createDataFrame(
        [(None, 7, "x"), (3, None, "y")], "employee_id int, id int, v string"
    )
    rows = kafka_payload(df, key_cols=("employee_id", "id")).collect()
    got = {r.key: json.loads(r.value) for r in rows}
    # key = coalesce(employee_id, id) cast string (MSP:245)
    assert set(got) == {"7", "3"}
    assert got["3"] == {"employee_id": 3, "v": "y"}
    assert got["7"] == {"id": 7, "v": "x"}  # nulls omitted by to_json
