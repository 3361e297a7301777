"""Debezium CDC envelope decoding (SURVEY.md §2.1 S3, §2.3 P1-P3).

The reference's two-stage parse
(``multi_source_streaming_processor.py:103-124`` and ``:150-171``):

1. cast Kafka binary key/value → string, ``from_json`` against the
   envelope schema (``payload.{before, after, op, ts_ms}`` where
   ``after`` is itself a JSON string);
2. ``from_json`` the ``after`` string against the table's payload
   schema, star-expand, keep op ∈ {c, u} (deletes dropped — parity
   with MSP:119/166; pass ``keep_deletes=True`` for changelog
   consumers that want them).

Works identically on batch and streaming DataFrames — the input just
needs ``value`` (string or binary) plus optional ``key``/``topic``/
``timestamp`` columns, i.e. the Kafka source contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ..schemas import DEBEZIUM_ENVELOPE_SCHEMA

UPSERT_OPS = ("c", "u")  # create, update; 'd' = delete, 'r' = snapshot read


def parse_envelope(raw: DataFrame) -> DataFrame:
    """Stage 1: Kafka record → typed envelope columns.

    Output: key, topic, kafka_timestamp, op, ts_ms, before_json,
    after_json.
    """
    cols = [
        F.col("value").cast("string").alias("_value_str"),
    ]
    if "key" in raw.columns:
        cols.append(F.col("key").cast("string").alias("key"))
    if "topic" in raw.columns:
        cols.append(F.col("topic"))
    if "timestamp" in raw.columns:
        cols.append(F.col("timestamp").alias("kafka_timestamp"))

    parsed = raw.select(*cols).withColumn(
        "_envelope", F.from_json(F.col("_value_str"), DEBEZIUM_ENVELOPE_SCHEMA)
    )
    return parsed.select(
        *[c for c in ("key", "topic", "kafka_timestamp") if c in parsed.columns],
        F.col("_envelope.payload.op").alias("op"),
        F.col("_envelope.payload.ts_ms").alias("ts_ms"),
        F.col("_envelope.payload.before").alias("before_json"),
        F.col("_envelope.payload.after").alias("after_json"),
    )


def decode_cdc(
    raw: DataFrame,
    payload_schema: StructType,
    keep_deletes: bool = False,
) -> DataFrame:
    """Full two-stage decode: Kafka record → typed row columns.

    Adds ``op``, epoch-millis ``event_timestamp`` and a
    ``processing_timestamp`` (parity with MSP:122-123). Deletes decode
    their ``before`` image so downstream changelog consumers can
    retract.
    """
    env = parse_envelope(raw)
    if not keep_deletes:
        env = env.filter(F.col("op").isin(list(UPSERT_OPS)))
        image = F.col("after_json")
    else:
        image = F.when(F.col("op") == "d", F.col("before_json")).otherwise(
            F.col("after_json")
        )

    decoded = env.withColumn("row", F.from_json(image, payload_schema))
    meta = [
        F.col("op"),
        F.to_timestamp(F.col("ts_ms") / F.lit(1000.0)).alias("event_timestamp"),
        F.current_timestamp().alias("processing_timestamp"),
    ]
    return decoded.select("row.*", *meta)
