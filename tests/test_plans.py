"""Physical-plan invariants for flagship queries — the executable
subset of PLANS.md. A regression that drops a pushed filter, turns a
broadcast join into a shuffle, or adds a Python stage to a relational
query should fail HERE, not at 100 TB."""

from __future__ import annotations

import pytest

from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.plans.registry import (
    REGISTRY,
)

BY_NAME = {q.name: q.builder for q in REGISTRY}
SF = "/root/testdata/sf0.001"


def _formatted(spark, name):
    df = BY_NAME[name](spark, SF)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def _count(plan: str, token: str) -> int:
    """Count plan NODES of a type: the formatted explain prints each
    node once in the tree and once in the detail section — count the
    unambiguous "(N) <Node>" detail headers."""
    import re

    return len(re.findall(rf"\(\d+\) {token}\b", plan))


def test_q01_filter_pushed_and_single_exchange(spark):
    plan = _formatted(spark, "q01_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan or "PushedFilters: [" in plan
    assert "l_shipdate" in plan.split("PushedFilters")[1][:200]
    assert _count(plan, "Exchange") == 1
    assert "Python" not in plan and "ArrowEval" not in plan


def test_q05_dims_broadcast_never_shuffle_fact(spark):
    plan = _formatted(spark, "q05_region_revenue")
    assert _count(plan, "BroadcastHashJoin") >= 4
    assert _count(plan, "SortMergeJoin") == 0
    # single shuffle: the final group-by
    assert _count(plan, "Exchange") <= 1


def test_market_basket_fact_shuffles_once(spark):
    plan = _formatted(spark, "market_basket_pairs")
    # the lineitem-sized shuffle is the order groupBy; everything else
    # operates on pair-counts or broadcast side
    assert _count(plan, "SortMergeJoin") == 0
    assert "FlatMapGroupsInPandas" not in plan


def test_relational_suite_has_no_python_stages(spark):
    for name in [
        "q03_shipping_priority",
        "q18_large_orders",
        "window_rank_top_orders",
        "events_hourly_agg",
        "rollup_region_nation_sales",
        "interval_union_by_user",
        "decimal_exact_revenue",
        "quality_ensemble_documents",
    ]:
        plan = _formatted(spark, name)
        for marker in ("ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas", "BatchEvalPython"):
            assert marker not in plan, f"{name} grew a Python stage"


def test_interval_union_single_partitioning(spark):
    plan = _formatted(spark, "interval_union_by_user")
    # both window passes + both aggregations ride ONE user_id hash partitioning
    assert _count(plan, "Exchange") == 1


def test_events_scans_prune_columns(spark):
    plan = _formatted(spark, "events_hourly_agg")
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "props" not in read, read  # untouched wide column stays unread
