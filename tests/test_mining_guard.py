"""Cost-based pre-flight for the exact n-gram mining family
(VERDICT r5 item #1).

The guard must (a) leave under-budget corpora on the configured plan,
(b) tighten the df cap on heavy-tailed corpora where the tightening
is admissible (small H stratum), (c) detect degenerate
small-vocabulary corpora where NO exact tier is sub-quadratic and
route/flag per policy — and in EVERY case the pair output must be
identical to the uncapped reference miner (losslessness is the whole
contract).
"""

from __future__ import annotations

import pytest

from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.operators import (
    dedup,
)
from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.operators.dedup import (
    ngram_jaccard_pairs,
    plan_exact_mining,
)


def _pairs(df_result):
    return sorted(
        (r["id_a"], r["id_b"], r["jaccard"]) for r in df_result.collect()
    )


def _heavy_tailed_docs(spark):
    """60 docs: every doc shares the same 8-word stop phrase (stop
    grams with df=60) but carries unique filler; docs 2i/2i+1 in the
    first 20 share most filler (true near-dups)."""
    stop = "the quick brown fox jumps over lazy dogs"
    rows = []
    for i in range(60):
        # 40 filler words keep the per-doc frequent-gram fraction
        # (~6/46 = 0.13) BELOW the 0.2 threshold, so the tightened
        # cap's H stratum is empty — the admissible heavy-tail shape
        filler = " ".join(f"w{i}x{j}" for j in range(40))
        if i < 20 and i % 2 == 1:
            filler = " ".join(f"w{i - 1}x{j}" for j in range(39)) + " odd"
        rows.append((i, f"{stop} {filler}"))
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _degenerate_docs(spark):
    """40 docs drawn from a 6-word vocabulary: every gram has high,
    FLAT df — no cap tier can bound the candidate join."""
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
    rows = [
        (i, " ".join(vocab[(i + j) % 6] for j in range(10)))
        for i in range(40)
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_under_budget_keeps_configured_plan(spark):
    d = _heavy_tailed_docs(spark)
    out = ngram_jaccard_pairs(
        d, "text", "doc_id", 3, 0.2, max_gram_df=256,
        candidate_budget=10_000_000,
    )
    ref = ngram_jaccard_pairs(d, "text", "doc_id", 3, 0.2)
    assert _pairs(out) == _pairs(ref)
    plan = dedup.LAST_MINING_PLAN
    assert plan["path"] == "df_capped"
    assert plan["cap"] == 256
    assert not plan["tightened"] and not plan["over_budget"]


def test_heavy_tail_tightens_cap_losslessly(spark):
    d = _heavy_tailed_docs(spark)
    # stop grams have df=60 -> C(60,2)=1770 rows each; a tight budget
    # forces the guard below them. Filler grams have df<=2, so the
    # tightened rare leg is tiny and H is near-empty -> admissible.
    out = ngram_jaccard_pairs(
        d, "text", "doc_id", 3, 0.2, max_gram_df=256,
        candidate_budget=2_000,
    )
    got = _pairs(out)
    plan = dedup.LAST_MINING_PLAN
    assert plan["tightened"] and plan["cap"] < 256
    assert not plan["over_budget"]
    ref = ngram_jaccard_pairs(d, "text", "doc_id", 3, 0.2)
    assert got == _pairs(ref)
    assert got  # the near-dup pairs exist and survived the tightening


def test_degenerate_corpus_flagged_but_lossless(spark):
    d = _degenerate_docs(spark)
    out = ngram_jaccard_pairs(
        d, "text", "doc_id", 3, 0.2, max_gram_df=256, candidate_budget=50
    )
    got = _pairs(out)
    plan = dedup.LAST_MINING_PLAN
    assert plan["over_budget"]
    ref = ngram_jaccard_pairs(d, "text", "doc_id", 3, 0.2)
    assert got == _pairs(ref)


def test_degenerate_high_threshold_routes_to_prefix(spark):
    d = _degenerate_docs(spark)
    out = ngram_jaccard_pairs(
        d, "text", "doc_id", 3, 0.75, max_gram_df=256, candidate_budget=50
    )
    got = _pairs(out)
    plan = dedup.LAST_MINING_PLAN
    # 2*(1-t)^2 = 0.125 < 1 -> the prefix leg is estimated cheaper
    assert plan["over_budget"] and plan["path"] == "prefix"
    ref = ngram_jaccard_pairs(d, "text", "doc_id", 3, 0.75)
    assert got == _pairs(ref)


def test_saturated_cap_h_leg_is_costed(spark):
    """The r6 sf3 probe finding: a rare leg under budget must NOT be
    read as safe when the cap has fired — the frequent-gram H leg is
    costed exactly and flags over_budget (and the run stays
    lossless)."""
    d = _degenerate_docs(spark)
    # cap=2 fires on every gram (flat df ~ 6-7): rare leg ~0, the
    # whole corpus is the H stratum
    out = ngram_jaccard_pairs(
        d, "text", "doc_id", 3, 0.2, max_gram_df=2, candidate_budget=100
    )
    got = _pairs(out)
    plan = dedup.LAST_MINING_PLAN
    assert plan["est_rare_pairs"] <= 100 < plan["est_freq_pairs_ub"]
    assert plan["over_budget"] and plan["est_h_pairs"] > 100
    ref = ngram_jaccard_pairs(d, "text", "doc_id", 3, 0.2)
    assert got == _pairs(ref)


def test_over_budget_error_policy_raises(spark):
    d = _degenerate_docs(spark)
    with pytest.raises(RuntimeError, match="candidate budget"):
        ngram_jaccard_pairs(
            d, "text", "doc_id", 3, 0.2, max_gram_df=256,
            candidate_budget=50, on_over_budget="error",
        ).collect()


def test_preflight_estimate_is_exact_for_rare_leg(spark):
    """The histogram estimate counts the rare-leg join rows EXACTLY:
    cross-check Σ C(df,2) against the materialized join."""
    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.functions.text import (
        shingle_rows,
    )
    from pyspark.sql import functions as F

    d = _heavy_tailed_docs(spark)
    grams = shingle_rows(d, "doc_id", "text", 3)
    plan = plan_exact_mining(grams, 0.2, 10_000, None)
    a, b = grams.alias("a"), grams.alias("b")
    joined = a.join(
        b,
        on=[
            F.col("a.gram") == F.col("b.gram"),
            F.col("a._id") < F.col("b._id"),
        ],
    ).count()
    assert plan["est_rare_pairs"] == joined
