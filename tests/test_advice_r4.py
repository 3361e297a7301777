"""Round-4 regression tests for the four ADVICE.md findings:

* ``cascade_plan`` diamond FK DAGs (a child with two cascading
  parents) must union BOTH parents' contributions;
* ``edit_distance_self_join`` must keep true pairs between very
  short strings that share zero q-grams;
* ``cdf_area`` must return the exact numerator past 2^63 (decimal
  recombination, no silent long wrap);
* ``mmr_select`` / ``hard_negatives`` must handle non-numeric
  group/label columns instead of collapsing them to NULL.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_cascade_diamond_unions_both_parents(spark):
    """child has FKs from TWO cascading parents: rows reachable only
    via the second parent must still be erased."""
    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.operators.cascade import (
        cascade_plan,
    )

    root = spark.createDataFrame([(1,), (2,), (99,)], "uid long")
    pa = spark.createDataFrame(
        [(10, 1), (11, 2), (12, 99)], "a_id long, uid long"
    )
    pb = spark.createDataFrame(
        [(20, 1), (21, 2), (22, 99)], "b_id long, uid long"
    )
    # child rows: 100 via A only, 101 via B only, 102 via both,
    # 103 via neither-affected keys
    child = spark.createDataFrame(
        [(100, 10, 22), (101, 12, 20), (102, 11, 21), (103, 12, 22)],
        "c_id long, a_fk long, b_fk long",
    )
    roots = spark.createDataFrame([(1,), (2,)], "uid long")
    plan = cascade_plan(
        {"users": root, "pa": pa, "pb": pb, "child": child},
        [
            ("users", "uid", "pa", "uid"),
            ("users", "uid", "pb", "uid"),
            ("pa", "a_id", "child", "a_fk"),
            ("pb", "b_id", "child", "b_fk"),
        ],
        roots,
        "users",
        "uid",
    )
    assert sorted(r.uid for r in plan["users"].collect()) == [1, 2]
    assert sorted(r.a_id for r in plan["pa"].collect()) == [10, 11]
    assert sorted(r.b_id for r in plan["pb"].collect()) == [20, 21]
    # 100 reachable via A(a_fk=10), 101 ONLY via B(b_fk=20),
    # 102 via both — 103 via neither
    assert sorted(r.c_id for r in plan["child"].collect()) == [100, 101, 102]
    # duplicate child rows must NOT be collapsed by the diamond path
    dup_child = child.union(child.filter("c_id = 101"))
    plan2 = cascade_plan(
        {"users": root, "pa": pa, "pb": pb, "child": dup_child},
        [
            ("users", "uid", "pa", "uid"),
            ("users", "uid", "pb", "uid"),
            ("pa", "a_id", "child", "a_fk"),
            ("pb", "b_id", "child", "b_fk"),
        ],
        roots,
        "users",
        "uid",
    )
    assert sorted(r.c_id for r in plan2["child"].collect()) == [
        100, 101, 101, 102,
    ]


def test_cascade_cycle_raises(spark):
    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.operators.cascade import (
        cascade_plan,
    )

    t = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="acyclic"):
        cascade_plan(
            {"a": t, "b": t},
            [("a", "k", "b", "k"), ("b", "k", "a", "k")],
            t,
            "a",
            "k",
        )


def test_edit_distance_short_strings_zero_shared_grams(spark):
    """'ab' vs 'cd' at q=2, max_dist=2 share ZERO bigrams but are a
    true pair (distance 2) — the short stratum must catch it."""
    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.operators.strings import (
        edit_distance_self_join,
    )

    base = ["ab", "cd", "abc", "xy", "alpha bridge", "alpha brigde", "qq"]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(base)], "pid long, name string"
    )
    got = {
        (r.id_a, r.id_b): r.edit_distance
        for r in edit_distance_self_join(
            df, "name", "pid", max_dist=2, q=2
        ).collect()
    }

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    want = {
        (i, j): lev(base[i], base[j])
        for i in range(len(base))
        for j in range(i + 1, len(base))
        if lev(base[i], base[j]) <= 2
    }
    assert ("ab", "cd") and want[(0, 1)] == 2  # the planted zero-gram pair
    assert got == want


def test_cdf_area_exact_past_int64(spark):
    """numerator 2^93 ≫ 2^63: the decimal recombination must be
    bit-exact where a long SUM would silently wrap."""
    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.operators.scale import (
        cdf_area,
    )

    big = 1 << 31
    df = spark.createDataFrame(
        [(0, big, 0), (big, 0, big)], "v long, c1 long, c2 long"
    )
    row = cdf_area(df, "v", ("c1", "c2"), num_partitions=2).collect()[0]
    # one gap of width 2^31 with |cum1*n2 - cum2*n1| = 2^31 * 2^31
    assert int(row["numerator"]) == (1 << 31) ** 3
    assert row["n1"] == big and row["n2"] == big


def test_mmr_select_string_groups(spark):
    """string group labels must produce k picks PER group, with the
    label passed through at its input type."""
    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.operators.similarity import (
        mmr_select,
    )

    rng = np.random.RandomState(7)
    rows = []
    vid = 0
    for g in ("news", "code"):
        for c in range(3):
            center = rng.randn(8) * 4
            for _ in range(5):
                rows.append(
                    (vid, g, [float(x) for x in center + rng.randn(8) * 0.05])
                )
                vid += 1
    emb = spark.createDataFrame(
        rows, "vec_id bigint, category string, embedding array<float>"
    )
    got = mmr_select(
        emb, k=3, lam=0.5, group_col="category"
    ).collect()
    by_g = {}
    for r in got:
        by_g.setdefault(r.group, []).append(r.pick_rank)
    assert set(by_g) == {"news", "code"}
    assert sorted(by_g["news"]) == [1, 2, 3]
    assert sorted(by_g["code"]) == [1, 2, 3]


def test_hard_negatives_string_labels(spark):
    """string labels: same-label masking must still hold and each
    query must get other-label nearest neighbours."""
    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.operators.similarity import (
        hard_negatives,
    )

    rng = np.random.RandomState(11)
    rows = []
    vid = 0
    for lab in ("en", "fr", "de"):
        center = rng.randn(8) * 3
        for _ in range(6):
            rows.append(
                (vid, lab, [float(x) for x in center + rng.randn(8) * 0.1])
            )
            vid += 1
    emb = spark.createDataFrame(
        rows, "vec_id bigint, label string, embedding array<float>"
    )
    queries = emb.filter(F.col("vec_id") % 6 == 0)
    got = hard_negatives(emb, queries, k=2)
    labels = {r.vec_id: r.label for r in emb.collect()}
    res = got.collect()
    assert res, "string labels must not empty the result"
    seen_q = set()
    for r in res:
        assert labels[r.query_id] != labels[r.neighbor_id]
        seen_q.add(r.query_id)
    assert seen_q == {0, 6, 12}


def test_df_capped_jaccard_identical_to_uncapped(spark):
    """df-capped miner must be LOSSLESS: identical (pair, jaccard)
    output to the uncapped inverted-index join on a corpus engineered
    with stop-grams, near-dups, and stop-gram-only docs — with a tiny
    cap (3) so the rare/H/pair-driven legs all carry weight."""
    import random

    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    rng = random.Random(3)
    boiler = "the quick brown fox jumps over the lazy dog again today"
    rows = []
    for i in range(40):
        words = " ".join(f"w{rng.randrange(500)}" for _ in range(12))
        if i % 3 == 0:
            words = f"{words} {boiler}"
        if i % 7 == 0:
            words = boiler  # stop-gram-ONLY docs (the H stratum)
        rows.append((i, words))
    # planted exact near-dups
    rows.append((100, rows[0][1]))
    rows.append((101, rows[5][1] + " extraz"))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def run(cap):
        return sorted(
            (r.id_a, r.id_b, r.jaccard)
            for r in ngram_jaccard_pairs(
                df, "text", "doc_id", shingle_n=3, threshold=0.2,
                max_gram_df=cap,
            ).collect()
        )

    uncapped = run(None)
    assert uncapped, "corpus must produce qualifying pairs"
    assert run(3) == uncapped
    assert run(1) == uncapped
    assert run(1000) == uncapped


def test_deletion_neighborhood_matches_qgram_path(spark):
    """SymSpell deletes blocking must produce exactly the q-gram
    path's pairs (both lossless), including short strings."""
    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.operators.strings import (
        edit_distance_self_join,
    )

    base = [
        "alpha bridge", "alpha brigde", "alpha bridges", "alpa bridge",
        "beta tunnel", "beta tunel", "ab", "cd", "abc", "",
        "zeta dock", "zeta docks", "zeta rock",
    ]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(base)], "pid long, name string"
    )

    def run(method):
        return sorted(
            (r.id_a, r.id_b, r.edit_distance)
            for r in edit_distance_self_join(
                df, "name", "pid", max_dist=2, method=method
            ).collect()
        )

    got_q = run("qgram")
    got_d = run("deletes")
    assert got_q, "corpus must produce pairs"
    assert got_d == got_q


def test_pack_sequences_ffd_invariants(spark):
    """FFD invariants: every normal bin fits within capacity, every
    oversize doc sits alone in its own bin, and first-fit order is
    respected (deterministic assignment)."""
    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.operators.packing import (
        pack_sequences_ffd,
    )

    rows = [(i, n) for i, n in enumerate(
        [300, 120, 120, 100, 90, 60, 40, 30, 10, 5]
    )]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = pack_sequences_ffd(
        df, count_col="n_tokens", id_col="doc_id",
        capacity=256, n_shards=1,
    ).collect()
    by_bin: dict[int, list] = {}
    for r in out:
        by_bin.setdefault(r.bin_id, []).append(r)
    for b, members in by_bin.items():
        total = sum(m.n_tokens for m in members)
        if any(m.n_tokens > 256 for m in members):
            assert len(members) == 1  # oversize doc is alone
        else:
            assert total <= 256
    # FFD visits 300 first (own bin), then 120+120 share bin 2,
    # 100+90+60 fill bin 3 to 250, 40+30+10+5 open bin 4
    assignment = {r.doc_id: r.bin_in_shard for r in out}
    assert assignment[0] == 1
    assert assignment[1] == 2 and assignment[2] == 2
    assert assignment[3] == 3 and assignment[4] == 3
    assert assignment[5] == 3
    assert assignment[6] == 4


def test_pq_topk_batch_independent(spark):
    """The round-4 redesign makes pq_topk a pure function of the
    data: the global ADC shortlist uses a total order and each batch
    pre-filters with the same order, so output must not change under
    different partitionings (different Arrow batch boundaries)."""
    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.operators.similarity import (
        pq_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter("vec_id % 100 = 0")

    def run(df):
        return sorted(
            (r.query_id, r.neighbor_id, r.cosine_sim, r.rank)
            for r in pq_topk(df, queries, k=5).collect()
        )

    a = run(emb)
    b = run(emb.repartition(13))
    c = run(emb.repartition(1))
    assert a, "must produce results"
    assert a == b == c
