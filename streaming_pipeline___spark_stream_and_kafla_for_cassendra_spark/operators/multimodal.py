"""Multimodal column plumbing (training-data pipeline ops).

Images/audio/video ride as opaque ``binary`` columns with a typed
metadata struct. The Spark-side plumbing — schema, partition-friendly
mapInPandas batching, Arrow transfer shape — is real and tested; the
actual codec work is stubbed (decode libs are not in this container)
behind ``decode_image_stub`` (deterministic fake, used by tests) and
``decode_image`` (raises NotImplementedError until a codec such as
Pillow is provided at deploy time).

Scale notes: binary payloads are the dominant bytes at 100 TB —
mapInPandas keeps them executor-local (no shuffle), and
``maxRecordsPerBatch`` bounds Arrow batch memory when payloads are
large. Feature extraction emits small fixed-size rows, so any
downstream shuffle moves features, not media.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# canonical multimodal record: payload + typed metadata
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("format", StringType()),
                    StructField("n_bytes", LongType()),
                    StructField("source", StringType()),
                ]
            ),
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
        StructField("checksum", StringType()),
    ]
)


def decode_image(payload: bytes) -> tuple[int, int]:
    """Real decoder hook — plug Pillow/libvips here at deploy time."""
    raise NotImplementedError(
        "image codecs are not available in this environment; "
        "use decode_image_stub for tests or inject a decoder"
    )


def decode_image_stub(payload: bytes) -> tuple[int, int]:
    """Deterministic fake decode: derives a (width, height) from the
    payload bytes so tests can assert end-to-end plumbing."""
    if not payload:
        return (0, 0)
    w = 16 + (payload[0] % 64) * 16
    h = 16 + (payload[-1] % 64) * 16
    return (w, h)


def extract_image_features(
    media: DataFrame, use_stub_decoder: bool = True
) -> DataFrame:
    """binary payload → (width, height, bytes, checksum) features via
    Arrow-batched mapInPandas. Narrow (no shuffle); batch size is the
    Arrow batch, so memory stays bounded regardless of payload size.
    """
    # The decoder is re-defined *inside* this function so cloudpickle
    # serializes it by value: Spark's Python workers may not have this
    # package on sys.path (the driver can run from any cwd), and a
    # by-reference pickle of a module-level function would fail to
    # unpickle there with ModuleNotFoundError.
    if use_stub_decoder:
        def decoder(payload: bytes) -> tuple[int, int]:
            if not payload:
                return (0, 0)
            return (16 + (payload[0] % 64) * 16, 16 + (payload[-1] % 64) * 16)
    else:
        def decoder(payload: bytes) -> tuple[int, int]:
            raise NotImplementedError(
                "image codecs are not available in this environment"
            )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            dims = [decoder(p if p is not None else b"") for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "checksum": [
                        hashlib.md5(p if p is not None else b"").hexdigest()
                        for p in pdf["payload"]
                    ],
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        batches, schema=IMAGE_FEATURES_SCHEMA
    )


def synthetic_media_from_documents(docs: DataFrame) -> DataFrame:
    """Build a multimodal table from the documents fixture: the text
    bytes stand in for an encoded image payload. Exercises the exact
    schema/batching path real media would take."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.lit("fake/raw").alias("format"),
            F.length(F.col("text")).cast("bigint").alias("n_bytes"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )
