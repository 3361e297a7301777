"""Winnowing fingerprints: the MOSS guarantee, property-tested.

Pure-Python reference implementation cross-checked against the Spark
operator once; the guarantee property runs under hypothesis on the
reference (fast), so hundreds of cases cost no Spark jobs.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.operators.dedup import (
    winnow_fingerprints,
)

K, W = 5, 4


def ref_winnow(text: str, k: int = K, w: int = W) -> set[int]:
    """Straight-line reference mirroring the operator's math."""
    s = text.lower()
    if len(s) < k:
        return set()
    B = np.uint64(1_000_003)
    codes = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    n = len(codes) - k + 1
    h = np.zeros(n, dtype=np.uint64)
    for j in range(k):
        h = h * B + codes[j : j + n]
    if n < w:
        sel = {int(h.argmin())}
    else:
        sel = set()
        for i in range(n - w + 1):
            win = h[i : i + w]
            m = win.min()
            sel.add(i + int(np.nonzero(win == m)[0][-1]))  # rightmost min
    return {int(np.int64(h[i])) for i in sel}


@given(st.text(alphabet="abcdef ", min_size=0, max_size=120))
@settings(max_examples=200, deadline=None)
def test_reference_fingerprints_are_deterministic_and_nonempty(text):
    a, b = ref_winnow(text), ref_winnow(text)
    assert a == b
    if len(text) >= K:
        assert a  # ≥1 fingerprint whenever any k-gram exists


@given(
    st.text(alphabet="abcdef ", min_size=W + K - 1, max_size=60),
    st.text(alphabet="uvwxyz", min_size=0, max_size=40),
    st.text(alphabet="uvwxyz", min_size=0, max_size=40),
)
@settings(max_examples=200, deadline=None)
def test_winnowing_guarantee(shared, pre, post):
    """Any shared substring of length ≥ w+k-1 ⇒ ≥1 shared fingerprint
    (the MOSS guarantee) — here doc2 embeds `shared` verbatim."""
    doc1 = shared
    doc2 = pre + shared + post
    assert ref_winnow(doc1) & ref_winnow(doc2)


def test_spark_operator_matches_reference(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "pack my box with five dozen liquor jugs",
        "sphinx of black quartz judge my vow",
        "ab",  # shorter than k → no fingerprints
        "",
        None,
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    got: dict[int, set[int]] = {}
    for r in winnow_fingerprints(df, "text", "doc_id").collect():
        got.setdefault(r.doc_id, set()).add(r.fingerprint)
    for i, t in enumerate(texts):
        expected = ref_winnow(t) if t else set()
        assert got.get(i, set()) == expected


def test_overlap_pairs_dense_matches_inverted(spark):
    """The adaptive dense (blocked-matmul) strategy must produce
    exactly the inverted-index join's pairs, shared counts, and
    rounded ratios — including cross-block and self-block pairs
    (docs_per_block=2 forces several blocks) and sub-threshold
    exclusions."""
    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.operators.dedup import (
        fingerprint_overlap_pairs,
    )

    rows = []
    # family A: docs 0,1,2 share most fingerprints; doc 3 disjoint;
    # doc 4 overlaps A below threshold; doc 5 tiny subset of doc 0
    sets = {
        0: {10, 11, 12, 13, 14},
        1: {10, 11, 12, 13, 99},
        2: {10, 11, 12, 77, 88},
        3: {50, 51, 52},
        4: {10, 60, 61, 62, 63},
        5: {11, 12},
        6: {50, 51, 52, 53},
    }
    for d, fs in sets.items():
        rows += [(d, f) for f in fs]
    fps = spark.createDataFrame(rows, "doc_id bigint, fingerprint bigint")

    def run(method):
        return sorted(
            (r.id_a, r.id_b, r.shared_fingerprints, r.overlap_ratio)
            for r in fingerprint_overlap_pairs(
                fps,
                id_col="doc_id",
                threshold=0.6,
                docs_per_block=2,
                method=method,
            ).collect()
        )

    inv = run("inverted")
    dense = run("dense")
    assert inv, "fixture must produce pairs"
    assert (0, 5, 2, 1.0) in inv  # containment uses min(|A|,|B|)
    assert all(p[0] != 4 and p[1] != 4 for p in inv)  # below threshold
    assert dense == inv


def test_inverted_noise_cap_drops_ubiquitous_fingerprints(spark):
    """The inverted (scale) tier drops fingerprints whose df exceeds
    inverted_max_df — the MOSS noise threshold (r8): on a natural
    Zipfian corpus head-word fingerprints sit in tens of thousands of
    docs and hold most index rows while attributing no specific
    overlap. The dense tier stays exact (it runs at every
    oracle-checked SF), so the cap is scale-tier-only semantics."""
    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.operators.dedup import (
        fingerprint_overlap_pairs,
    )

    # fp 99 is ubiquitous (in every doc); docs 0/1 share ONLY it,
    # docs 2/3 also share two informative fingerprints.
    rows = [
        (0, 99), (0, 10), (0, 11),
        (1, 99), (1, 20), (1, 21),
        (2, 99), (2, 30), (2, 31),
        (3, 99), (3, 30), (3, 31),
    ]
    fps = spark.createDataFrame(rows, "doc_id bigint, fingerprint bigint")

    def run(**kw):
        return sorted(
            (r.id_a, r.id_b, r.shared_fingerprints)
            for r in fingerprint_overlap_pairs(
                fps, id_col="doc_id", threshold=0.8, method="inverted", **kw
            ).collect()
        )

    capped = run(inverted_max_df=3)  # df(99) = 4 > 3 -> dropped
    # docs 2/3 still pair on their informative fingerprints (2/2 = 1.0);
    # docs 0/1 shared only the ubiquitous one -> no pair
    assert capped == [(2, 3, 2)]
    uncapped = run(inverted_max_df=0)  # 0 disables the cap
    assert (0, 1, 1) not in uncapped  # 1/3 < 0.8 either way
    assert (2, 3, 3) in uncapped  # ubiquitous fp counted when disabled
