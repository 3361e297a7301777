"""Plan-lint regression gate (VERDICT r4 item #5).

Snapshots the scale-relevant physical-plan markers for the TPC-H-class
headliners and asserts no registry change reintroduces the plan
regressions the audits exist to catch:

* a global-window / single-partition exchange (the r3
  ``supplier_scorecard`` class — one hot partition at 100 TB);
* an unpushed filter or an unpruned scan (reading all columns for a
  narrow projection);
* a new shuffle (every Exchange is a full re-materialization of its
  input at cluster scale);
* a Python stage sneaking into a previously JVM-only plan (Arrow
  stages are the slow path; the baseline pins where they are allowed).

Ceilings, not exact equality, for counts — a BETTER plan (fewer
exchanges, broadcast instead of sort-merge) must not fail the lint.
Baselines captured at sf0.01 with local[4]/8 shuffle partitions; the
markers below are layout-independent (AQE keeps operator identity).
"""

from __future__ import annotations

import contextlib
import io
import re

import pytest

from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.plans.registry import REGISTRY

SF = "/root/testdata/sf0.01"

BY_NAME = {q.name: q for q in REGISTRY}

# name -> (max_exchanges, max_python_stages, max_sortmerge_joins,
#          max_single_partition_exchanges, max_scan_cols, filters_pushed)
BASELINE = {
    "q01_pricing_summary": (1, 0, 0, 0, 7, True),
    "q03_shipping_priority": (1, 0, 0, 0, 4, True),
    "q05_region_revenue": (1, 0, 0, 0, 4, True),
    "q06_forecast_revenue": (1, 0, 0, 0, 4, True),
    "q09_product_profit": (1, 0, 0, 0, 6, True),
    "q18_large_orders": (2, 0, 0, 0, 4, True),
    # dense_ids path: one Arrow pass, NO exchange, never SinglePartition
    "supplier_scorecard": (0, 1, 0, 0, 6, False),
    "left_join_order_counts": (1, 0, 0, 0, 3, True),
    "events_hourly_agg": (1, 0, 0, 0, 4, True),
    "window_rank_top_orders": (1, 0, 0, 0, 3, False),
    # global ORDER BY + LIMIT must stay TakeOrderedAndProject (no
    # single-partition sort exchange)
    "orders_sort_limit": (0, 0, 0, 0, 4, False),
    "dedup_exact_documents": (1, 0, 0, 0, 2, False),
    # r8: +2 deliberate round-robin exchanges (spread_for_compute
    # before each signature pass side — the single-split fixture
    # otherwise serializes the Arrow pass on one core; no-op at scale)
    "minhash_lsh_pairs": (3, 2, 0, 0, 2, False),
    "ann_topk_bruteforce": (1, 1, 0, 0, 2, False),
    "text_quality": (0, 0, 0, 0, 2, False),
    "rollup_region_nation_sales": (1, 0, 0, 0, 3, True),
    "q21_waiting_suppliers": (4, 0, 2, 0, 3, True),
}


def _markers(df) -> dict:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    return {
        "exchanges": len(re.findall(r"\(\d+\) Exchange", plan)),
        "python_stages": len(
            re.findall(
                r"\(\d+\) (?:ArrowEvalPython|BatchEvalPython|MapInPandas|"
                r"FlatMapGroupsInPandas|MapInArrow)",
                plan,
            )
        ),
        "sortmerge_joins": len(re.findall(r"\(\d+\) SortMergeJoin", plan)),
        "single_partition": len(
            re.findall(r"Exchange SinglePartition", plan)
        ),
        "widest_scan_cols": max(
            (
                len(s.split(","))
                for s in re.findall(r"ReadSchema: struct<([^>]*)>", plan)
            ),
            default=0,
        ),
        "pushed": bool(
            [
                p
                for p in re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
                if p.strip()
            ]
        ),
        "plan": plan,
    }


@pytest.mark.parametrize("name", sorted(BASELINE), ids=sorted(BASELINE))
def test_plan_markers_within_baseline(spark, name):
    exch, py, smj, single, cols, pushed = BASELINE[name]
    m = _markers(BY_NAME[name].builder(spark, SF))
    assert m["exchanges"] <= exch, (
        f"{name}: {m['exchanges']} exchanges (baseline {exch}) — a new "
        f"shuffle entered the plan\n{m['plan']}"
    )
    assert m["python_stages"] <= py, (
        f"{name}: {m['python_stages']} Python stages (baseline {py}) — "
        f"a Python stage entered a JVM plan\n{m['plan']}"
    )
    assert m["sortmerge_joins"] <= smj, (
        f"{name}: {m['sortmerge_joins']} SortMergeJoins (baseline {smj})"
        f" — a broadcast join degraded to shuffle\n{m['plan']}"
    )
    assert m["single_partition"] <= single, (
        f"{name}: Exchange SinglePartition in plan — the global-window "
        f"regression class\n{m['plan']}"
    )
    assert m["widest_scan_cols"] <= cols, (
        f"{name}: widest scan reads {m['widest_scan_cols']} cols "
        f"(baseline {cols}) — column pruning regressed\n{m['plan']}"
    )
    if pushed:
        assert m["pushed"], (
            f"{name}: no PushedFilters reached the parquet scan\n"
            f"{m['plan']}"
        )


# ---------------------------------------------------------------------------
# Catalog-wide lint (round 5; extended round 6): the markers that are
# red flags at 100 TB no matter the query — a row-at-a-time Python
# UDF, a non-broadcast CartesianProduct, and (r6) an Exchange
# SinglePartition outside the committed tiny-reduction allowlist.
# The tag sets, regexes, and allowlist are SHARED with
# tools/plan_sweep.py via plans/lint.py (the r5 advice drift fix);
# builders that train/collect at build time (HEAVY_BUILDERS) are
# skipped so the lint stays O(plan), and exec-at-build streaming
# builders are covered by plan_sweep's --streaming mode instead.
# ---------------------------------------------------------------------------

from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.plans.lint import (  # noqa: E402
    EXEC_AT_BUILD_TAGS,
    HEAVY_BUILDERS,
    SINGLE_PARTITION_ALLOWLIST,
    count_markers,
)


def test_catalog_wide_markers(spark):
    bad = {}
    for q in REGISTRY:
        if EXEC_AT_BUILD_TAGS & set(q.tags) or q.name in HEAVY_BUILDERS:
            continue
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            q.builder(spark, SF).explain("formatted")
        m = count_markers(buf.getvalue())
        if q.name in SINGLE_PARTITION_ALLOWLIST:
            m.pop("single_partition")
        if any(m.values()):
            bad[q.name] = {k: v for k, v in m.items() if v}
    assert not bad, (
        "row-at-a-time Python UDFs / non-broadcast cartesian products "
        f"/ unallowlisted SinglePartition exchanges entered the "
        f"catalog: {bad}"
    )


def test_single_partition_allowlist_entries_are_real(spark):
    """Every allowlist entry must still HAVE a SinglePartition in its
    plan — stale entries hide future regressions."""
    stale = []
    for name in SINGLE_PARTITION_ALLOWLIST:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            BY_NAME[name].builder(spark, SF).explain("formatted")
        if not count_markers(buf.getvalue())["single_partition"]:
            stale.append(name)
    assert not stale, f"allowlist entries without SinglePartition: {stale}"


def test_bucketed_join_is_exchange_free(spark):
    """The bucketed_join_exchange_free row's contract: after the
    bucketBy(8, key) writes, the merge join itself requires NO
    exchange on either side — the only shuffle in the whole plan is
    the final per-segment aggregate. A regression (bucket spec lost
    in the catalog round-trip, mismatched bucket counts, join key
    drift) re-introduces a per-side hash exchange."""
    m = _markers(
        BY_NAME["bucketed_join_exchange_free"].builder(spark, SF)
    )
    assert m["exchanges"] <= 1, (
        f"bucketed join shuffled: {m['exchanges']} exchanges\n"
        f"{m['plan']}"
    )
    assert "SortMergeJoin" in m["plan"]
    assert "Exchange hashpartitioning(o_custkey" not in m["plan"]
    assert "Exchange hashpartitioning(c_custkey" not in m["plan"]
    assert m["single_partition"] == 0
