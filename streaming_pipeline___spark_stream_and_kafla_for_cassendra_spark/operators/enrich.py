"""Enrichment operators (SURVEY.md §2.3 P4, FIXTURES.md §5).

Pure column-expression pipelines — no shuffle, no UDFs; the whole
enrichment collapses into one Project inside whole-stage codegen, so
it costs a single scan at any data size.

Golden-column contracts from the reference:

* employees → ``department_category``, ``employee_level``,
  ``data_source``, ``processing_date`` (MSP:127-141)
* activities → ``activity_hour``, ``activity_date``,
  ``session_duration_category``, ``is_business_hours``,
  ``device_category``, ``data_source``, ``processing_date``
  (MSP:174-197)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.expressions import (
    department_category,
    device_category,
    employee_level,
    is_business_hours,
    session_duration_category,
)


def enrich_employees(df: DataFrame, data_source: str = "postgres-cdc") -> DataFrame:
    return (
        df.withColumn("department_category", department_category("department"))
        .withColumn("employee_level", employee_level("email"))
        .withColumn("data_source", F.lit(data_source))
        .withColumn("processing_date", F.current_date())
    )


def enrich_activities(
    df: DataFrame,
    ts_col: str = "activity_timestamp",
    data_source: str = "postgres-cdc",
) -> DataFrame:
    ts = F.col(ts_col).cast("timestamp")
    return (
        df.withColumn("activity_hour", F.hour(ts))
        .withColumn("activity_date", F.to_date(ts))
        .withColumn(
            "session_duration_category",
            session_duration_category("duration_seconds"),
        )
        .withColumn("is_business_hours", is_business_hours(ts))
        .withColumn("device_category", device_category("device_type"))
        .withColumn("data_source", F.lit(data_source))
        .withColumn("processing_date", F.current_date())
    )
