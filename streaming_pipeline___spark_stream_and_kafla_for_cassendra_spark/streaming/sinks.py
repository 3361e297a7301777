"""Streaming sinks (SURVEY.md §2.2 K1-K3, §2.10 T4-T6).

Parity with the reference's writers:

* Kafka sink (MSP:242-258): key = coalesce of id columns cast to
  string, value = ``to_json(struct(*))``, per-topic checkpoint dir,
  append/update mode, processing-time trigger.
* Console sink (MSP:294-305): append, truncate off, row cap.
* Memory sink: the deterministic test twin (with
  ``trigger(availableNow=True)``) the reference lacked.

Checkpoint locations default under a caller-supplied root rather than
the reference's hard-coded /tmp paths, so concurrent pipelines and
tests never collide.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def _with_trigger(writer, processing_time: str | None, available_now: bool):
    if available_now:
        return writer.trigger(availableNow=True)
    if processing_time:
        return writer.trigger(processingTime=processing_time)
    return writer


def kafka_payload(df: DataFrame, key_cols: tuple[str, ...] = ("id",)) -> DataFrame:
    """Rows → (key, value) Kafka records: key = first non-null of
    ``key_cols`` cast string (MSP:245), value = JSON of all columns
    (MSP:246)."""
    key = F.coalesce(
        *[F.col(c).cast("string") for c in key_cols], F.lit("null")
    )
    return df.select(
        key.alias("key"), F.to_json(F.struct(*df.columns)).alias("value")
    )


def write_kafka(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint_root: str,
    key_cols: tuple[str, ...] = ("id",),
    output_mode: str = "append",
    processing_time: str | None = "30 seconds",
    available_now: bool = False,
) -> StreamingQuery:
    """Kafka writer (MSP:242-258). 30 s default trigger per reference."""
    payload = kafka_payload(df, key_cols)
    writer = (
        payload.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", os.path.join(checkpoint_root, f"kafka-{topic}"))
        .outputMode(output_mode)
        .queryName(f"kafka-{topic}")
    )
    return _with_trigger(writer, processing_time, available_now).start()


def write_console(
    df: DataFrame,
    name: str,
    output_mode: str = "append",
    num_rows: int = 10,
    processing_time: str | None = "30 seconds",
    available_now: bool = False,
) -> StreamingQuery:
    """Console monitoring sink (MSP:294-305)."""
    writer = (
        df.writeStream.format("console")
        .option("truncate", "false")
        .option("numRows", str(num_rows))
        .outputMode(output_mode)
        .queryName(name)
    )
    return _with_trigger(writer, processing_time, available_now).start()


def write_memory(
    df: DataFrame,
    name: str,
    output_mode: str = "append",
    available_now: bool = True,
) -> StreamingQuery:
    """In-memory sink for deterministic tests; pair with
    ``spark.table(name)`` after ``awaitTermination``."""
    writer = (
        df.writeStream.format("memory").queryName(name).outputMode(output_mode)
    )
    return _with_trigger(writer, None, available_now).start()
