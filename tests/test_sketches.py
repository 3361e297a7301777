"""Apache DataSketches surface: HLL distinct sketches, count-min
frequency sketches, approx_top_k heavy hitters.

The scale rationale: exact distinct/frequency state is O(cardinality)
per group and cannot be merged across executors without a full
re-shuffle; sketches are fixed-size byte arrays that merge
associatively, so 1000 executors aggregate locally and a single
reduce combines the partials. These tests prove (1) accuracy against
exact answers and (2) LOSSLESS mergeability — the partial-union
estimate equals the single-pass estimate bit-for-bit.
"""

from __future__ import annotations

import sys
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.plans.registry import (
    queries,
)
from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.sources.tables import (
    load_table,
)

SF = "/root/testdata/sf0.001"


def test_hll_estimate_within_tolerance(spark):
    e = load_table(spark, SF, "events")
    approx = {
        r["event_type"]: r["approx"]
        for r in e.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("approx"))
        .collect()
    }
    exact = {
        r["event_type"]: r["exact"]
        for r in e.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    assert approx.keys() == exact.keys()
    for k, ex in exact.items():
        assert abs(approx[k] - ex) <= max(2, 0.05 * ex), (k, approx[k], ex)


def test_hll_partial_sketches_merge_losslessly(spark):
    """Union of per-group partial sketches == one global sketch —
    the exact re-aggregation a 1000-executor rollup performs."""
    e = load_table(spark, SF, "events")
    direct = e.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est")
    ).collect()[0]["est"]
    merged = (
        e.groupBy("event_type")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()[0]["est"]
    )
    assert merged == direct


def test_sketch_registry_query_totals_consistent(spark):
    rows = queries()["sketch_distinct_users_by_type"](spark, SF).collect()
    by_type = {r["event_type"]: r for r in rows}
    total = by_type.pop("__total__")
    assert total["n_events"] == sum(r["n_events"] for r in by_type.values())
    # the merged-union distinct cannot exceed the sum of per-type distincts
    assert total["exact_users"] <= sum(r["exact_users"] for r in by_type.values())
    assert total["exact_users"] > 0
    # every HLL estimate (per-type AND the union-merged total) sits
    # inside the 5% envelope the oracle pins
    assert all(r["est_within_5pct"] for r in rows)
    assert total["est_within_5pct"]


def test_count_min_sketch_bounds(spark):
    """CM estimates never undercount and stay within eps*N overcount.

    The sketch is a fixed (depth x width) counter grid regardless of
    key cardinality — the frequency-state analogue of HLL."""
    e = load_table(spark, SF, "events")
    n = e.count()
    eps, conf = 0.001, 0.99
    sketch = e.agg(
        F.count_min_sketch("event_type", F.lit(eps), F.lit(conf), F.lit(42)).alias("cms")
    ).collect()[0]["cms"]
    exact = {
        r["event_type"]: r["cnt"]
        for r in e.groupBy("event_type").agg(F.count("*").alias("cnt")).collect()
    }
    jvm = spark._jvm
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        jvm.java.io.ByteArrayInputStream(bytes(sketch))
    )
    for etype, cnt in exact.items():
        est = cms.estimateCount(etype)
        assert cnt <= est <= cnt + eps * n, (etype, cnt, est)


def test_approx_top_k_matches_exact_on_generous_capacity(spark):
    """With maxItemsTracked >= cardinality the sketch is exact."""
    d = load_table(spark, SF, "documents")
    words = d.select(F.explode(F.split(F.lower("text"), r"\s+")).alias("w")).filter(
        F.col("w") != ""
    )
    top = words.agg(F.expr("approx_top_k(w, 5, 10000)").alias("t")).collect()[0]["t"]
    exact = (
        words.groupBy("w")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "w")
        .limit(5)
        .collect()
    )
    approx_counts = {r["item"]: r["count"] for r in top}
    for r in exact:
        assert approx_counts[r["w"]] == r["cnt"]


def test_approx_top_k_partials_combine(spark):
    """approx_top_k_accumulate per group -> approx_top_k_combine ->
    estimate: the distributed heavy-hitters rollup. With generous
    capacity the combined estimate equals the exact global top-k."""
    d = load_table(spark, SF, "documents")
    words = d.select(
        "lang", F.explode(F.split(F.lower("text"), r"\s+")).alias("w")
    ).filter(F.col("w") != "")
    combined = (
        words.groupBy("lang")
        .agg(F.expr("approx_top_k_accumulate(w, 10000)").alias("st"))
        .agg(F.expr("approx_top_k_estimate(approx_top_k_combine(st, 10000), 5)").alias("t"))
        .collect()[0]["t"]
    )
    exact = (
        words.groupBy("w")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "w")
        .limit(5)
        .collect()
    )
    combined_counts = {r["item"]: r["count"] for r in combined}
    for r in exact:
        assert combined_counts[r["w"]] == r["cnt"]


def test_kll_quantile_sketch_rank_accuracy_and_merge(spark):
    """KLL quantile sketch on events.value: estimated quantiles land
    within rank tolerance of the exact order statistics, and per-group
    partial sketches merge into the same global sketch state."""
    e = load_table(spark, SF, "events")
    n = e.count()
    direct = e.agg(
        F.expr("kll_sketch_agg_double(value, 800)").alias("sk")
    ).select(
        F.expr("kll_sketch_get_quantile_double(sk, array(0.1d, 0.5d, 0.9d))").alias("q")
    ).collect()[0]["q"]
    merged = (
        e.groupBy("event_type")
        .agg(F.expr("kll_sketch_agg_double(value, 800)").alias("sk"))
        .agg(F.expr("kll_merge_agg_double(sk, 800)").alias("sk"))
        .select(
            F.expr("kll_sketch_get_quantile_double(sk, array(0.1d, 0.5d, 0.9d))").alias("q")
        )
        .collect()[0]["q"]
    )
    exact_sorted = [r["value"] for r in e.select("value").orderBy("value").collect()]
    for frac, est in zip((0.1, 0.5, 0.9), direct):
        # rank of the estimate must be within 2% of the target rank
        import bisect

        rank = bisect.bisect_left(exact_sorted, est) / n
        assert abs(rank - frac) < 0.02, (frac, est, rank)
    for frac, est in zip((0.1, 0.5, 0.9), merged):
        import bisect

        rank = bisect.bisect_left(exact_sorted, est) / n
        assert abs(rank - frac) < 0.02, (frac, est, rank)


def test_theta_sketch_set_algebra(spark):
    """Theta sketches support distinct-count SET ALGEBRA (union /
    intersection / difference) on sketch state alone — no raw data
    re-scan. Verified against exact distinct set operations."""
    e = load_table(spark, SF, "events")
    ab = (
        e.filter(F.col("event_type").isin("view", "click"))
        .groupBy("event_type")
        .agg(F.expr("theta_sketch_agg(user_id)").alias("sk"))
    )
    if ab.count() < 2:  # pragma: no cover - data guard
        return
    est = ab.agg(
        F.expr("theta_sketch_estimate(theta_union_agg(sk))").alias("u"),
        F.expr("theta_sketch_estimate(theta_intersection_agg(sk))").alias("i"),
    ).collect()[0]
    a = {r["user_id"] for r in e.filter(F.col("event_type") == "view").select("user_id").distinct().collect()}
    b = {r["user_id"] for r in e.filter(F.col("event_type") == "click").select("user_id").distinct().collect()}
    assert abs(est["u"] - len(a | b)) <= max(2, 0.05 * len(a | b))
    assert abs(est["i"] - len(a & b)) <= max(2, 0.10 * max(1, len(a & b)))
