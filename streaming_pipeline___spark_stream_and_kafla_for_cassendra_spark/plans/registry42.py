"""Round-3 registry additions, batch 29 — CHECK-constraint audit and
source freshness monitoring (the dbt-tests layer).

Same contract as ``registry.py``. Imported at the bottom of
``registry.py``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import _register, _t

# ---------------------------------------------------------------------------
# CHECK-constraint audit across the lake tables
# ---------------------------------------------------------------------------

# (rule_id, table, human rule, SQL predicate counting VIOLATIONS)
_CHECKS = (
    ("orders_price_positive", "orders", "o_totalprice > 0",
     "o_totalprice <= 0"),
    ("orders_status_enum", "orders", "o_orderstatus in (O,F,P)",
     "o_orderstatus NOT IN ('O', 'F', 'P')"),
    ("lineitem_qty_range", "lineitem", "1 <= l_quantity <= 50",
     "l_quantity < 1 OR l_quantity > 50"),
    ("lineitem_discount_range", "lineitem", "0 <= l_discount <= 0.1",
     "l_discount < 0 OR l_discount > 0.1"),
    ("lineitem_tax_range", "lineitem", "0 <= l_tax <= 0.08",
     "l_tax < 0 OR l_tax > 0.08"),
    ("customer_acctbal_domain", "customer", "c_acctbal >= -1000",
     "c_acctbal < -1000"),
    ("events_value_nonneg", "events", "value >= 0", "value < 0"),
    ("events_type_enum", "events",
     "event_type in (view,click,purchase,signup,error)",
     "event_type NOT IN ('view','click','purchase','signup','error')"),
    ("part_size_positive", "part", "p_size > 0", "p_size <= 0"),
)


def _check_one_sql(rule_id, table, rule, viol):
    return f"""
    SELECT '{rule_id}' AS rule_id, '{table}' AS table_name,
           '{rule}' AS rule,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN {viol} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violations,
           CAST(sum(CASE WHEN {viol} THEN 1 ELSE 0 END) * 1000000
                // count(*) AS BIGINT) AS violation_ppm
    FROM {table}"""


@_register(
    "check_constraint_audit",
    "\nUNION ALL\n".join(_check_one_sql(*c) for c in _CHECKS),
    "CHECK-constraint audit — the dbt-tests layer every warehouse "
    "runs on schedule: 9 domain rules (value ranges, enum "
    "memberships, sign constraints) across 5 tables, each "
    "reporting exact violation counts and ppm in ONE aggregate "
    "scan per table. Zero violations is the expected steady state "
    "— the value is the regression alarm when an upstream change "
    "ships garbage; the row-level companion to "
    "`referential_integrity_report` (FK edges), "
    "`functional_dependency_audit` (column determinism) and "
    "`contract_quarantine_events` (streaming-side enforcement). "
    "Map-side-combinable conditionals; rules compile into the "
    "scan, no joins.",
    ("quality", "constraints", "lineitem"),
)
def check_constraint_audit(spark, sf_dir):
    out = None
    for rule_id, table, rule, viol in _CHECKS:
        t = _t(spark, sf_dir, table)
        one = t.agg(
            F.count("*").alias("n_rows"),
            F.sum(F.when(F.expr(viol), 1).otherwise(0)).alias(
                "n_violations"
            ),
        ).select(
            F.lit(rule_id).alias("rule_id"),
            F.lit(table).alias("table_name"),
            F.lit(rule).alias("rule"),
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("n_violations").cast("long").alias("n_violations"),
            F.expr("n_violations * 1000000 div n_rows")
            .cast("long")
            .alias("violation_ppm"),
        )
        out = one if out is None else out.unionAll(one)
    return out


# ---------------------------------------------------------------------------
# Source freshness audit (dbt source freshness analogue)
# ---------------------------------------------------------------------------

_FRESH_SOURCES = (
    ("events", "ts"),
    ("orders", "o_orderdate"),
    ("lineitem", "l_shipdate"),
)


def _fresh_one_sql(table, ts_col):
    return f"""
    SELECT '{table}' AS source_table,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(min(CAST({ts_col} AS TIMESTAMP)) AS TIMESTAMP)
             AS oldest_ts,
           CAST(max(CAST({ts_col} AS TIMESTAMP)) AS TIMESTAMP)
             AS newest_ts,
           CAST(sum(CASE WHEN CAST({ts_col} AS TIMESTAMP)
                    >= (SELECT max(CAST({ts_col} AS TIMESTAMP))
                        FROM {table}) - INTERVAL 7 DAY
                    THEN 1 ELSE 0 END) AS BIGINT) AS rows_last_7d
    FROM {table}"""


@_register(
    "source_freshness_audit",
    "\nUNION ALL\n".join(_fresh_one_sql(*s) for s in _FRESH_SOURCES),
    "Source freshness audit (the dbt `source freshness` analogue, "
    "anchored to each table's own max event time so the check is "
    "reproducible on a frozen fixture): per fact source, row "
    "count, oldest/newest timestamps, and rows landed within the "
    "trailing 7 days of its watermark — a collapsed trailing "
    "window is the first symptom of a stalled ingest pipeline, "
    "caught by the monitor rather than the consumer. One "
    "aggregate scan per source; in production the anchor swaps to "
    "wall-clock now() and everything else is unchanged.",
    ("quality", "freshness", "ops", "events"),
)
def source_freshness_audit(spark, sf_dir):
    out = None
    for table, ts_col in _FRESH_SOURCES:
        t = _t(spark, sf_dir, table)
        ts = F.col(ts_col).cast("timestamp")
        mx = t.agg(F.max(ts).alias("mx"))
        one = (
            t.crossJoin(F.broadcast(mx))
            .agg(
                F.count("*").alias("n_rows"),
                F.min(ts).alias("oldest_ts"),
                F.max(ts).alias("newest_ts"),
                F.sum(
                    F.when(
                        ts >= F.col("mx") - F.expr("INTERVAL 7 DAY"), 1
                    ).otherwise(0)
                ).alias("rows_last_7d"),
            )
            .select(
                F.lit(table).alias("source_table"),
                F.col("n_rows").cast("long").alias("n_rows"),
                "oldest_ts",
                "newest_ts",
                F.col("rows_last_7d").cast("long").alias("rows_last_7d"),
            )
        )
        out = one if out is None else out.unionAll(one)
    return out
