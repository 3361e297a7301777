"""Enrichment expression library (SURVEY.md §2.5, F1–F13).

Each helper returns a Column built purely from built-in
``pyspark.sql.functions`` — everything stays inside Catalyst /
whole-stage codegen; no Python UDFs. The five CASE-WHEN taxonomies
mirror the reference's enrichment semantics:

* department_category — MSP:129-131
* employee_level — MSP:133-136
* session_duration_category — MSP:180-182 (edges 30 / 300)
* is_business_hours — MSP:184-187 (hours 9–17, weekday not checked,
  parity with reference)
* device_category — MSP:189-192
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TECHNICAL_DEPTS = ("Engineering", "IT")
BUSINESS_DEPTS = ("Sales", "Marketing")


def department_category(department: Column | str) -> Column:
    c = F.col(department) if isinstance(department, str) else department
    return (
        F.when(c.isin(list(TECHNICAL_DEPTS)), F.lit("Technical"))
        .when(c.isin(list(BUSINESS_DEPTS)), F.lit("Business"))
        .otherwise(F.lit("Support"))
    )


def employee_level(email: Column | str) -> Column:
    c = F.col(email) if isinstance(email, str) else email
    return (
        F.when(c.contains("senior"), F.lit("Senior"))
        .when(c.contains("lead"), F.lit("Lead"))
        .otherwise(F.lit("Regular"))
    )


def session_duration_category(duration_seconds: Column | str) -> Column:
    c = (
        F.col(duration_seconds)
        if isinstance(duration_seconds, str)
        else duration_seconds
    )
    return (
        F.when(c < 30, F.lit("short"))
        .when((c >= 30) & (c <= 300), F.lit("medium"))
        .otherwise(F.lit("long"))
    )


def is_business_hours(ts: Column | str) -> Column:
    c = F.col(ts) if isinstance(ts, str) else ts
    h = F.hour(c)
    return (h >= 9) & (h <= 17)


def device_category(device_type: Column | str) -> Column:
    c = F.col(device_type) if isinstance(device_type, str) else device_type
    return (
        F.when(c == "mobile", F.lit("Mobile"))
        .when(c == "tablet", F.lit("Tablet"))
        .otherwise(F.lit("Desktop"))
    )
