"""Kafka source wrappers (SURVEY.md §2.1 S1/S2, §2.10 T7).

Thin declarative wrappers over ``spark.readStream.format("kafka")``
with the reference's option contract
(``multi_source_streaming_processor.py:76-96``): latest offsets,
``failOnDataLoss=false`` — both overridable. The Kafka connector jar
is not present in the test container, so these are exercised by unit
tests only through their option-dict builders; the streaming tests
use file/memory sources with the same column contract
(key, value, topic, partition, offset, timestamp).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def kafka_source_options(
    bootstrap_servers: str,
    subscribe: str,
    starting_offsets: str = "latest",
    fail_on_data_loss: bool = False,
    max_offsets_per_trigger: int | None = None,
) -> dict[str, str]:
    """Option dict for the Kafka streaming source (MSP:78-85).

    ``maxOffsetsPerTrigger`` is the backpressure lever the reference
    leaves unset — at scale it bounds micro-batch size so a backlog
    can't produce an unbounded first batch.
    """
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": subscribe,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": str(fail_on_data_loss).lower(),
    }
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    return opts


def read_kafka_stream(
    spark: SparkSession, bootstrap_servers: str, topic: str, **kwargs
) -> DataFrame:
    """``readStream`` over a Kafka topic (MSP:76-96)."""
    reader = spark.readStream.format("kafka")
    for k, v in kafka_source_options(bootstrap_servers, topic, **kwargs).items():
        reader = reader.option(k, v)
    return reader.load()


def read_kafka_batch(
    spark: SparkSession, bootstrap_servers: str, topic: str, **kwargs
) -> DataFrame:
    """Batch read of a topic (offset range resolved once)."""
    opts = kafka_source_options(bootstrap_servers, topic, **kwargs)
    opts["startingOffsets"] = kwargs.get("starting_offsets", "earliest")
    reader = spark.read.format("kafka")
    for k, v in opts.items():
        reader = reader.option(k, v)
    return reader.load()
