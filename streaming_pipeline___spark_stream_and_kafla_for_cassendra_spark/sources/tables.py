"""Batch table loading (SURVEY.md §2.1 S6 — batch SQL scans).

The reference's batch surface is Hive SQL over Hudi parquet base
files; ours is ``spark.read.parquet`` over the same logical tables.
Filters and projections written against these DataFrames reach the
parquet scan (PushedFilters / ReadSchema) because loading stays fully
declarative — no ``.cache()``/collect here.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables that are small at ANY scale factor (TPC-H region is
# always 5 rows, nation 25). Safe to hint broadcast unconditionally.
ALWAYS_SMALL = {"region", "nation"}

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        return _load_events(spark, path)
    return spark.read.parquet(path)


def _load_events(spark: SparkSession, path: str) -> DataFrame:
    """The events table's ``ts`` column has shipped in two physical
    encodings across fixture generations: parquet TIMESTAMP(NANOS)
    (which Spark 4 can only read as a raw long via
    ``legacy.parquet.nanosAsLong``) and plain TIMESTAMP(MICROS).
    Adapt to whichever the footer declares and normalize to a
    microsecond ``timestamp_ntz`` — the identical wall-clock value
    DuckDB sees, so oracle comparisons match exactly."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(path)
    from pyspark.sql.types import LongType

    if isinstance(raw.schema["ts"].dataType, LongType):
        # nanos-as-long generation: floor-truncate nanos → micros
        ts = F.timestamp_micros(F.expr("ts div 1000"))
    else:
        ts = F.col("ts")
    return raw.withColumn("ts", ts.cast("timestamp_ntz"))


def load_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-stream twin of ``_load_events``: the same footer-adaptive
    ``ts`` normalization, but over ``readStream`` (which requires the
    schema declared up front, so probe the footer with a batch read
    first). Returns ``ts`` as TIMESTAMP (LTZ; session tz pinned UTC)
    because watermarks and time windows require it."""
    path = os.path.join(sf_dir, "events.parquet")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(path).schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    from pyspark.sql.types import LongType

    if isinstance(schema["ts"].dataType, LongType):
        return stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    return stream.withColumn("ts", F.col("ts").cast("timestamp"))


def load_table_stream(
    spark: SparkSession, sf_dir: str, name: str
) -> DataFrame:
    """File-stream twin of ``load_table`` for any fixture table —
    ``readStream`` needs the schema up front, so probe the footer with
    a batch read first. ``events`` goes through its ts-normalizing
    loader instead."""
    if name == "events":
        return load_events_stream(spark, sf_dir)
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    schema = spark.read.parquet(path).schema
    return (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", f"{name}.parquet")
        .parquet(sf_dir)
    )


def load_tables(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR
) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every table as a temp view so ``spark.sql`` works —
    the engine's equivalent of the reference's Hive-synced tables."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
