"""Data-quality validation — expectation checks in one scan.

Training-data pipelines gate ingestion on data contracts (null
ratios, value ranges, referential counts). This operator evaluates a
set of named boolean rules as conditional counts inside a SINGLE
aggregation pass — one scan, one reduce, no per-rule jobs — then
unpivots to a (rule, violations, total_rows, violation_ratio) report.

Scale notes: each rule compiles to a ``count_if`` expression in the
same hash-aggregate; adding rules adds columns to the partial
aggregate, not passes over the data. The unpivot (``stack``) runs on
the single aggregated row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def validate(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Evaluate ``rules`` (name → boolean Column that is True when the
    row VIOLATES the rule) and return one report row per rule:
    (rule, violations, total_rows, violation_ratio)."""
    if not rules:
        raise ValueError("validate() needs at least one rule")
    aggs = [F.count_if(cond).alias(name) for name, cond in rules.items()] + [
        F.count("*").alias("_total")
    ]
    one_row = df.agg(*aggs)
    stack_expr = ", ".join(f"'{n}', `{n}`" for n in rules)
    return one_row.select(
        F.expr(
            f"stack({len(rules)}, {stack_expr}) AS (rule, violations)"
        ),
        F.col("_total").alias("total_rows"),
    ).select(
        "rule",
        "violations",
        "total_rows",
        F.round(F.col("violations") / F.col("total_rows"), 6).alias(
            "violation_ratio"
        ),
    )
