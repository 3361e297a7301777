"""Property tests for the round-2 (cont.) operator batches:
trend/entropy/overlap/attribution/linkage/community/eval queries.

Oracle equality is covered by the registry twins; these tests pin the
mathematical invariants the oracles cannot express (bounds,
conservation laws, determinism)."""

from __future__ import annotations

import math

from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.plans.registry import (
    REGISTRY,
)

from conftest import SF_SMOKE

BY = {q.name: q for q in REGISTRY}


def _run(spark, name, sf=SF_SMOKE):
    return BY[name].builder(spark, sf).collect()


def test_behavior_entropy_bounds(spark):
    rows = _run(spark, "behavior_entropy_users")
    for r in rows:
        assert 0.0 <= r["entropy_bits"] <= math.log2(r["n_types"]) + 1e-9
        # single-type users have exactly zero entropy
        if r["n_types"] == 1:
            assert r["entropy_bits"] == 0.0


def test_audience_overlap_bounds(spark):
    rows = _run(spark, "audience_overlap_event_types")
    for r in rows:
        assert r["n_both"] <= min(r["n_a"], r["n_b"])
        union = r["n_a"] + r["n_b"] - r["n_both"]
        assert union > 0 and 0.0 <= r["jaccard"] <= 1.0


def test_attribution_credit_conservation(spark):
    """Every purchase with >=1 touch hands out 1.0 credit up to the
    floor remainder of the middle split (< k micro-units)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.sources.tables import (
        load_table,
    )

    e = load_table(spark, SF_SMOKE, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("puser"),
        F.col("ts").alias("pts"),
    )
    touches = (
        e.filter(F.col("event_type").isin("view", "click"))
        .join(
            purchases,
            (F.col("user_id") == F.col("puser"))
            & (F.col("ts") < F.col("pts"))
            & (F.col("ts") >= F.col("pts") - F.expr("INTERVAL 7 DAYS")),
        )
        .select("pid", "ts", "event_id")
    )
    wpos = Window.partitionBy("pid").orderBy("ts", "event_id")
    wk = Window.partitionBy("pid")
    per_purchase = (
        touches.select(
            "pid",
            F.row_number().over(wpos).alias("pos"),
            F.count("*").over(wk).alias("k"),
        )
        .select(
            "pid",
            "k",
            F.when(F.col("k") == 1, 1000000)
            .when(F.col("k") == 2, 500000)
            .when((F.col("pos") == 1) | (F.col("pos") == F.col("k")), 400000)
            .otherwise(F.floor(F.lit(200000) / (F.col("k") - 2)).cast("long"))
            .alias("micro"),
        )
        .groupBy("pid", "k")
        .agg(F.sum("micro").alias("total"))
        .collect()
    )
    assert per_purchase
    for r in per_purchase:
        assert 1000000 - max(r["k"] - 2, 0) <= r["total"] <= 1000000


def test_label_propagation_labels_are_nodes(spark):
    rows = _run(spark, "label_propagation_nations")
    nodes = {r["nationkey"] for r in rows}
    assert all(r["community"] in nodes for r in rows)
    # deterministic: a second run yields the identical assignment
    again = {
        (r["nationkey"], r["community"])
        for r in _run(spark, "label_propagation_nations")
    }
    assert {(r["nationkey"], r["community"]) for r in rows} == again


def test_reco_precision_within_unit_interval(spark):
    (row,) = _run(spark, "reco_precision_at_k")
    assert 0 <= row["n_hits"] <= row["n_recommended"]
    assert 0.0 <= row["precision_at_k"] <= 1.0


def test_gini_split_screen_bounds(spark):
    rows = _run(spark, "gini_split_screen_documents")
    assert rows
    n_total = rows[0]["n_left"] + rows[0]["n_right"]
    for r in rows:
        assert 0.0 <= r["weighted_gini"] <= 0.5 + 1e-9
        assert r["n_left"] + r["n_right"] == n_total
        assert r["n_left"] > 0 and r["n_right"] > 0


def test_fellegi_sunter_scores_are_consistent(spark):
    rows = _run(spark, "fellegi_sunter_linkage_scores", "/root/testdata/sf0.01")
    assert rows
    for r in rows:
        expect = (
            (25 if r["agree_seg"] else -12)
            + (31 if r["agree_bal"] else -8)
            + (7 if r["agree_digit"] else -3)
        )
        assert r["score_deci"] == expect >= 40
        assert r["id_a"] < r["id_b"]


def test_heaps_curve_monotone(spark):
    rows = sorted(
        _run(spark, "vocab_growth_heaps_documents"), key=lambda r: r["bucket"]
    )
    assert len(rows) == 10
    for a, b in zip(rows, rows[1:]):
        assert b["cum_tokens"] > a["cum_tokens"]
        assert b["cum_vocab"] >= a["cum_vocab"]
    beta = rows[0]["heaps_beta"]
    assert all(r["heaps_beta"] == beta for r in rows)
    # the synthetic corpus's closed vocabulary saturates early, so β
    # can legitimately reach 0 at smoke scale; sub-linear is the law
    assert 0.0 <= beta <= 1.0


def test_mase_and_fano_positive(spark):
    (m,) = _run(spark, "mase_seasonal_naive_daily")
    assert m["mae_naive1_cents"] > 0 and m["mase"] > 0
    for r in _run(spark, "fano_burstiness_by_type"):
        assert r["mean_per_hour"] > 0 and r["fano"] >= 0


def test_kendall_tau_bounds_and_pair_count(spark):
    (r,) = _run(spark, "kendall_tau_daily_metrics")
    assert -1.0 <= r["tau_b"] <= 1.0
    assert r["concordant"] + r["discordant"] <= r["n_pairs"]


def test_g_test_nonnegative(spark):
    (r,) = _run(spark, "g_test_type_daypart")
    assert r["g_stat"] >= 0.0 and r["n_cells"] <= 20


def test_js_divergence_bounded_by_one_bit(spark):
    for r in _run(spark, "js_divergence_source_unigrams"):
        assert 0.0 <= r["js_bits"] <= 1.0 + 1e-9


def test_shrinkage_pulls_toward_pool(spark):
    rows = _run(spark, "shrunken_return_rates_parts")
    assert rows
    # pooled rate is a weighted mean of raw rates; shrinkage moves
    # every estimate strictly toward it (never past it)
    tot_x = sum(r["x"] for r in rows)
    tot_n = sum(r["n"] for r in rows)
    p0 = tot_x / tot_n
    for r in rows:
        lo, hi = sorted((r["raw_rate"], p0))
        assert lo - 1e-6 <= r["shrunk_rate"] <= hi + 1e-6


def test_trimmed_mean_within_group_range(spark):
    rows = _run(spark, "trimmed_mean_price_by_priority")
    for r in rows:
        assert r["n_kept"] <= r["n_total"]
        # two-sided 5% trim keeps at least 90% of the group
        assert r["n_kept"] >= 0.9 * r["n_total"] - 2
        assert r["trimmed_mean_cents"] > 0


def test_mrr_consistent_with_hits(spark):
    (r,) = _run(spark, "reco_mrr_at_k")
    assert 0.0 <= r["mrr"] <= 1.0
    assert r["hits_at_1"] <= r["hits_at_k"] <= r["n_eval_parts"]
    if r["n_eval_parts"]:
        assert r["mrr"] >= r["hits_at_1"] / r["n_eval_parts"] - 1e-6


def test_lift_table_conservation(spark):
    rows = sorted(_run(spark, "lift_table_documents"), key=lambda r: r["decile"])
    assert len(rows) == 10
    assert abs(rows[-1]["cum_gain"] - 1.0) < 1e-6
    # equal-count deciles within integer rounding
    sizes = [r["n_docs"] for r in rows]
    assert max(sizes) - min(sizes) <= 1


def test_mix_shift_effects_sum_to_delta(spark):
    rows = _run(spark, "mix_shift_decomposition_segments")
    assert rows
    # Σ(rate_effect + mix_effect) equals the overall AOV delta
    # reconstructed from the same shares/AOVs (rounding-tolerant)
    delta = sum(
        r["share_cur"] * r["aov_cur_cents"] - r["share_prev"] * r["aov_prev_cents"]
        for r in rows
    )
    effects = sum(r["rate_effect_cents"] + r["mix_effect_cents"] for r in rows)
    assert abs(delta - effects) < 1.0  # cents-scale tolerance from rounding


def test_dau_mau_ratio_bounds(spark):
    for r in _run(spark, "dau_mau_stickiness"):
        assert 0 < r["dau"] <= r["mau"]
        assert 0.0 < r["stickiness"] <= 1.0
