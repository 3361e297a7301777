"""Property tests for the late round-2 operator batches (registries
10-14): CDF monotonicity, heatmap conservation, allocation budgets,
containment vs Jaccard, drift statistics, concentration bounds."""

from __future__ import annotations

from conftest import SF_SMOKE
from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.plans.registry import (
    REGISTRY,
)

BY = {q.name: q for q in REGISTRY}


def _run(spark, name, sf=SF_SMOKE):
    return BY[name].builder(spark, sf).collect()


def test_conversion_cdf_monotone(spark):
    rows = sorted(_run(spark, "conversion_cdf_hours"), key=lambda r: r["within_hours"])
    assert len(rows) == 7
    for a, b in zip(rows, rows[1:]):
        assert b["n_within"] >= a["n_within"]
    for r in rows:
        assert 0 <= r["n_within"] <= r["n_converted"] <= r["n_viewers"]


def test_heatmap_shares_sum_to_one(spark):
    rows = _run(spark, "weekday_hour_heatmap_events")
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-3
    for r in rows:
        assert 1 <= r["dow"] <= 7 and 0 <= r["hod"] <= 23
        assert 0 < r["n_users"] <= r["n"]


def test_neyman_allocation_sums_to_budget(spark):
    rows = _run(spark, "neyman_allocation_events")
    assert sum(r["n_sample"] for r in rows) == 1000
    for r in rows:
        assert r["n_sample"] >= 0 and r["sd_cents"] >= 0


def test_containment_dominates_jaccard(spark):
    """max(containment) >= jaccard for any pair both miners emit."""
    jac = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in _run(spark, "ngram_jaccard_pairs")
    }
    cont = _run(spark, "ngram_containment_pairs")
    assert cont
    for r in cont:
        assert 0.0 <= r["contain_a"] <= 1.0 and 0.0 <= r["contain_b"] <= 1.0
        j = jac.get((r["id_a"], r["id_b"]))
        if j is not None:
            assert max(r["contain_a"], r["contain_b"]) >= j - 1e-6


def test_page_hinkley_nonnegative_and_anchored(spark):
    rows = sorted(_run(spark, "page_hinkley_drift_daily"), key=lambda r: r["t"])
    assert rows[0]["t"] == 1
    for r in rows:
        assert r["ph_t_micro"] >= 0
    # PH at t=1: m_1 == min m so far -> exactly 0
    assert rows[0]["ph_t_micro"] == 0


def test_cramers_v_in_unit_interval(spark):
    (r,) = _run(spark, "cramers_v_type_daypart")
    assert 0.0 <= r["cramers_v"] <= 1.0
    assert r["chi2"] >= 0.0


def test_source_balance_evenness(spark):
    (r,) = _run(spark, "source_balance_entropy")
    assert 0.0 <= r["evenness"] <= 1.0 + 1e-9
    assert r["entropy_bits"] >= 0.0


def test_quartile_dispersion_bounds(spark):
    for r in _run(spark, "quartile_dispersion_by_brand"):
        assert r["q1"] <= r["q3"]
        assert 0.0 <= r["qcd"] < 1.0


def test_theil_and_hhi_bounds(spark):
    (t,) = _run(spark, "theil_between_segments")
    assert t["theil_between"] >= -1e-9  # KL-form: nonnegative
    for r in _run(spark, "hhi_supplier_concentration"):
        assert r["hhi_floor"] - 1e-6 <= r["hhi"] <= 1.0 + 1e-6
