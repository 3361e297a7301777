"""Distributed BPE training vs a pure-python reference implementation."""

from __future__ import annotations

from collections import Counter

from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.functions.bpe import (
    bpe_encode,
    bpe_train,
    merges_df,
    word_table,
)


def _ref_bpe(texts, num_merges, min_pair_count=2):
    """Reference BPE on the word-frequency table, identical tie rule
    (count desc, then lexicographically smallest pair)."""
    words = Counter(
        w for t in texts for w in t.lower().split() if w != ""
    )
    table = {tuple(w): c for w, c in words.items()}
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for syms, c in table.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), n = best
        if n < min_pair_count:
            break
        merges.append((l, r, n))
        new_table = {}
        for syms, c in table.items():
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    res.append(l + r)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            new_table[tuple(res)] = new_table.get(tuple(res), 0) + c
        table = new_table
    return merges


CORPUS = [
    "the cat sat on the mat",
    "the cat ate the rat",
    "that cat that sat",
    "rats sat on cats",
    "the theme of the math",
]


def _df(spark, texts=CORPUS):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_bpe_matches_reference_merge_sequence(spark):
    got = bpe_train(_df(spark), "text", num_merges=12)
    want = _ref_bpe(CORPUS, 12)
    assert got == want
    # 'at' (cat/sat/mat/rat/that/ate...) is this corpus's top pair
    assert (got[0][0], got[0][1]) == ("a", "t")


def test_bpe_deterministic_across_partitioning(spark):
    a = bpe_train(_df(spark).repartition(1), "text", num_merges=8)
    b = bpe_train(_df(spark).repartition(5), "text", num_merges=8)
    assert a == b


def test_bpe_early_stop_when_no_repeating_pairs(spark):
    df = _df(spark, ["ab cd ef"])  # every pair occurs once
    assert bpe_train(df, "text", num_merges=10, min_pair_count=2) == []


def test_bpe_encode_counts(spark):
    df = _df(spark)
    merges = bpe_train(df, "text", num_merges=12)
    out = {
        r["doc_id"]: (r["n_bpe_tokens"], r["n_words"])
        for r in bpe_encode(df, merges).collect()
    }
    texts = {i: t for i, t in enumerate(CORPUS)}
    for i, t in texts.items():
        n_bpe, n_words = out[i]
        words = t.split()
        assert n_words == len(words)
        n_chars = sum(len(w) for w in words)
        # merging only ever shrinks; never below one token per word
        assert len(words) <= n_bpe <= n_chars
    # with enough merges frequent words collapse: "the" → 1 token,
    # so doc 0 ("the cat sat on the mat") tokenizes well under char count
    assert out[0][0] < sum(len(w) for w in texts[0].split())


def test_word_table_counts(spark):
    wt = {
        "".join(r["syms"]): r["cnt"]
        for r in word_table(_df(spark), "text").collect()
    }
    assert wt["the"] == 6 and wt["cat"] == 3 and wt["that"] == 2


def test_merges_df_schema(spark):
    m = merges_df(spark, [("t", "h", 9), ("th", "e", 7)])
    rows = [tuple(r) for r in m.collect()]
    assert rows == [(1, "t", "h", 9), (2, "th", "e", 7)]
