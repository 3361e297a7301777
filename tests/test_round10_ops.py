"""Round-3 wave-3 operators: semantic invariants (the oracle proves
cross-engine parity; these prove the answers mean what they claim)."""

from __future__ import annotations

from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.plans.registry import (
    REGISTRY,
)

BY = {q.name: q for q in REGISTRY}
SF_SMOKE = "/root/testdata/sf0.001"


def _run(spark, name, sf=SF_SMOKE):
    return BY[name].builder(spark, sf).collect()


def test_window_funnel_depths_partition_users(spark):
    rows = _run(spark, "window_funnel_users")
    assert all(1 <= r["max_stage"] <= 3 for r in rows)
    assert sum(r["n_users"] for r in rows) > 0


def test_streaming_window_funnel_matches_batch_histogram(spark):
    per_user = _run(spark, "streaming_window_funnel")
    from collections import Counter

    hist = Counter(r["max_stage"] for r in per_user)
    batch = {
        r["max_stage"]: r["n_users"]
        for r in _run(spark, "window_funnel_users")
    }
    assert dict(hist) == batch


def test_inventory_policy_accounting(spark):
    r = _run(spark, "inventory_ss_policy_replay")[0]
    assert r["n_parts"] > 0
    assert r["total_reorders"] >= 0
    assert r["parts_with_stockouts"] <= r["n_parts"]


def test_rate_limiter_stream_equals_batch_totals(spark):
    per_user = _run(spark, "streaming_rate_limiter")
    batch = _run(spark, "rate_limiter_token_bucket")[0]
    assert sum(r["accepted"] for r in per_user) == batch["accepted"]
    assert sum(r["rejected"] for r in per_user) == batch["rejected"]


def test_lfu_vs_lru_replay_same_workload(spark):
    lru = {r["segment"]: r for r in _run(spark, "lru_cache_hit_rate")}
    lfu = {r["segment"]: r for r in _run(spark, "lfu_cache_hit_rate")}
    assert set(lru) == set(lfu)
    for seg in lru:
        # identical workload: same denominators, policies differ
        # only in hits
        assert lru[seg]["n_accesses"] == lfu[seg]["n_accesses"]
        assert lru[seg]["n_customers"] == lfu[seg]["n_customers"]


def test_wasserstein_positive_and_bounded(spark):
    r = _run(spark, "wasserstein_price_weekday_weekend")[0]
    assert r["w1_dollars"] >= 0
    assert r["w1_denominator"] == r["n_weekend"] * r["n_weekday"]


def test_soundex_keys_shape(spark):
    rows = _run(spark, "soundex_blocking_parts")
    assert rows
    for r in rows:
        assert len(r["sdx"]) == 4
        assert r["sdx"][0].isalpha() and r["sdx"][0].isupper()
        assert all(c.isdigit() for c in r["sdx"][1:])
        assert r["candidate_pairs"] == r["block_size"] * (
            r["block_size"] - 1
        ) // 2


def test_aa_calibration_false_positive_rate(spark):
    rows = _run(spark, "aa_test_calibration")
    assert len(rows) == 20
    fps = sum(1 for r in rows if r["false_positive"])
    # expected ~1/20; allow generous slack but catch broken variance
    assert fps <= 6


def test_check_constraints_hold_on_fixture(spark):
    rows = _run(spark, "check_constraint_audit")
    assert len(rows) == 9
    # the synthetic fixture should be clean; any violation is a
    # regression in the generator or the rule
    assert all(r["n_violations"] == 0 for r in rows), rows


def test_ewma_grid_has_unique_winner_and_positive_sse(spark):
    rows = _run(spark, "ewma_alpha_grid_search")
    assert len(rows) == 8
    assert sum(1 for r in rows if r["is_best"]) == 1
    assert all(r["sse"] > 0 for r in rows)


def test_stratified_ate_constant_across_rows(spark):
    rows = _run(spark, "stratified_ate_discount_returns")
    ates = {r["ate"] for r in rows}
    assert len(ates) == 1
    for r in rows:
        assert r["n_t"] + r["n_c"] == r["n_s"]


def test_newsvendor_critical_fractile_wins_overall(spark):
    rows = _run(spark, "newsvendor_critical_fractile")
    # theory: with cu=3, co=1 the 0.7/0.8 levels should win most
    # brands; assert they win a plurality (synthetic demand is noisy)
    from collections import Counter

    wins = Counter(
        r["service_level"] for r in rows if r["is_best"]
    )
    assert wins, "every brand must have a winner"
    top = wins.most_common(1)[0][0]
    assert top in (0.6, 0.7, 0.8, 0.9)


def test_percolation_components_grow_when_hubs_leave(spark):
    rows = {r["scenario"]: r for r in _run(spark, "percolation_hub_removal")}
    full, removed = rows["full"], rows["hubs_removed"]
    assert full["largest_component"] <= full["n_nodes"]
    assert removed["n_nodes"] <= full["n_nodes"]
    # removing hubs can only shrink the giant component
    assert removed["largest_component"] <= full["largest_component"]


def test_two_way_effects_reconstruct_cell_means(spark):
    rows = _run(spark, "two_way_effects_decomposition")
    for r in rows:
        recon = (
            r["grand_mean_cents"]
            + r["dow_effect_cents"]
            + r["priority_effect_cents"]
            + r["interaction_cents"]
        )
        assert abs(recon - r["cell_mean_cents"]) < 0.05


def test_binary_segmentation_explains_variance(spark):
    r = _run(spark, "binary_segmentation_daily_revenue")[0]
    assert 0.0 <= r["variance_explained"] <= 1.0
    assert r["sse_best_split"] <= r["sse_no_split"]


def test_hierarchy_top_down_sums_to_region(spark):
    rows = _run(spark, "hierarchical_forecast_reconciliation")
    from collections import defaultdict

    td = defaultdict(float)
    reg = {}
    for r in rows:
        td[r["region"]] += r["top_down_forecast"]
        reg[r["region"]] = r["region_forecast"]
    for k in reg:
        # top-down shares sum to the region forecast (coherent by
        # construction) up to the per-nation cent rounding
        assert abs(td[k] - reg[k]) < 0.3, (k, td[k], reg[k])


def test_lift_matrix_symmetric_inputs(spark):
    rows = _run(spark, "event_type_lift_matrix")
    assert len(rows) == 10  # C(5,2)
    for r in rows:
        assert r["type_a"] < r["type_b"]
        assert r["n_both"] <= min(r["n_a"], r["n_b"])
        assert r["lift"] > 0


def test_dedup_threshold_monotone(spark):
    rows = sorted(
        _run(spark, "dedup_threshold_sensitivity"),
        key=lambda r: r["threshold_ppm"],
    )
    pair_counts = [r["n_pairs"] for r in rows]
    assert pair_counts == sorted(pair_counts, reverse=True)
    drops = [r["docs_dropped"] for r in rows]
    assert drops == sorted(drops, reverse=True)
