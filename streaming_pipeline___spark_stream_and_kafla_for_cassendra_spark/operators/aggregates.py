"""Windowed event-time aggregations (SURVEY.md §2.6 A1-A3, §2.10).

Re-expresses the reference's hourly/daily streaming aggregations
(``multi_source_streaming_processor.py:205-238``) with two deliberate
fixes:

* **watermarks are mandatory** on the streaming path — the reference
  runs update-mode windowed aggs with no ``withWatermark`` (SURVEY
  §2.10 T3, a latent unbounded-state bug). At 100 TB/day of events
  that state store would grow forever; bounded state is the only
  plan that survives.
* streaming ``countDistinct`` is unsupported by Spark, so the daily
  agg uses ``approx_count_distinct`` when streaming and exact
  ``countDistinct`` in batch twins (SURVEY §7 hard-parts).

Aggregation is a single shuffle on the (window, keys) grouping with
map-side partial aggregation — Spark's hash-agg does the partial/
final split automatically, so the shuffle carries pre-aggregated
rows, not raw events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_WATERMARK = "2 hours"


def _flatten_window(df: DataFrame) -> DataFrame:
    # window-struct flatten, MSP:219-221 / :236-238
    return (
        df.withColumn("window_start", F.col("window.start"))
        .withColumn("window_end", F.col("window.end"))
        .drop("window")
    )


def hourly_activity_aggregation(
    df: DataFrame,
    ts_col: str = "activity_timestamp",
    key_cols: tuple[str, ...] = ("employee_id", "activity_type"),
    url_col: str = "page_url",
    duration_col: str = "duration_seconds",
    device_col: str = "device_category",
    watermark: str | None = DEFAULT_WATERMARK,
) -> DataFrame:
    """Hourly tumbling-window agg (MSP:205-221).

    count / sum / avg / collect_set / min-as-primary-device per
    (1-hour window, employee, activity_type). ``min`` replaces the
    reference's ``first`` (MSP:216) because ``first`` is
    order-dependent and non-deterministic under shuffle — a
    correctness fix, not a semantic change the reference relied on.
    """
    ts = F.col(ts_col).cast("timestamp")
    src = df.withColumn("_ts", ts)
    if watermark and src.isStreaming:
        src = src.withWatermark("_ts", watermark)
    agg = src.groupBy(F.window(F.col("_ts"), "1 hour"), *key_cols).agg(
        F.count("*").alias("activity_count"),
        F.sum(duration_col).alias("total_duration"),
        F.avg(duration_col).alias("avg_duration"),
        F.array_sort(F.collect_set(url_col)).alias("unique_pages"),
        F.min(device_col).alias("primary_device"),
    )
    return _flatten_window(agg).withColumn("aggregation_type", F.lit("hourly"))


def daily_activity_aggregation(
    df: DataFrame,
    ts_col: str = "activity_timestamp",
    key_cols: tuple[str, ...] = ("activity_type", "device_category"),
    distinct_col: str = "employee_id",
    duration_col: str = "duration_seconds",
    watermark: str | None = "1 day",
) -> DataFrame:
    """Daily tumbling-window agg (MSP:224-238).

    Streaming uses ``approx_count_distinct`` (HLL sketch merges in the
    partial/final agg — constant state per group); batch twins get the
    exact ``countDistinct``.
    """
    ts = F.col(ts_col).cast("timestamp")
    src = df.withColumn("_ts", ts)
    streaming = src.isStreaming
    if watermark and streaming:
        src = src.withWatermark("_ts", watermark)
    distinct_agg = (
        F.approx_count_distinct(distinct_col)
        if streaming
        else F.countDistinct(distinct_col)
    )
    agg = src.groupBy(F.window(F.col("_ts"), "1 day"), *key_cols).agg(
        F.count("*").alias("activity_count"),
        distinct_agg.alias("unique_employees"),
        F.avg(duration_col).alias("avg_duration"),
    )
    return _flatten_window(agg).withColumn("aggregation_type", F.lit("daily"))
