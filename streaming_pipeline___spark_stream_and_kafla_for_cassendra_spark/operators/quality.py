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


def enforce(
    df: DataFrame, rules: dict[str, Column]
) -> tuple[DataFrame, DataFrame]:
    """Write-time constraint enforcement (Delta CHECK-constraint /
    Hudi pre-commit-validator analogue): split ``df`` into
    ``(clean, quarantine)`` against ``rules`` (name → boolean Column
    that is True when the row VIOLATES the rule).

    ONE shared projection computes the array of violated rule names;
    both returned frames are filters over it, so Spark evaluates the
    predicates once per row and the split never re-scans the source.
    ``quarantine`` carries the full original row plus ``_violated``
    (the rule names that fired) — the dead-letter payload a re-ingest
    pipeline needs. ``clean`` has the source schema exactly.

    Scale: scan-local expressions, zero shuffle; quarantine writes are
    sized by the violation rate, not the table.
    """
    if not rules:
        raise ValueError("enforce() needs at least one rule")
    tagged = df.withColumn(
        "_violated",
        F.filter(
            F.array(
                *[
                    F.when(cond, F.lit(name)).otherwise(F.lit(None))
                    for name, cond in rules.items()
                ]
            ),
            lambda x: x.isNotNull(),
        ),
    )
    clean = tagged.filter(F.size("_violated") == 0).drop("_violated")
    quarantine = tagged.filter(F.size("_violated") > 0)
    return clean, quarantine
