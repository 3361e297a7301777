"""Round-3 operators: BFS shortest paths, EWMA fold, discrete order
statistics, interval union sweep-line — property/equivalence tests
beyond the registry's DuckDB-oracle gate."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.operators.graph import (
    bfs_hops,
)
from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.plans.registry import (
    REGISTRY,
)

BY_NAME = {q.name: q.builder for q in REGISTRY}
SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# bfs_hops: known graphs
# ---------------------------------------------------------------------------

def test_bfs_hops_path_graph(spark):
    # chain 1-2-3-4-5 plus disconnected 8-9: hops from 1
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (8, 9)], ["src", "dst"]
    )
    got = {
        r["node"]: r["hops"]
        for r in bfs_hops(edges, 1, max_hops=10).collect()
    }
    assert got == {1: 0, 2: 1, 3: 2, 4: 3, 5: 4}


def test_bfs_hops_respects_cap_and_min_distance(spark):
    # triangle 1-2-3 plus tail 3-4-5-6; cap at 2 hops
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6)], ["src", "dst"]
    )
    got = {
        r["node"]: r["hops"]
        for r in bfs_hops(edges, 1, max_hops=2).collect()
    }
    # node 3 reachable via 1-2-3 (2 hops) AND directly (1 hop): min wins
    assert got == {1: 0, 2: 1, 3: 1, 4: 2}


# ---------------------------------------------------------------------------
# EWMA fold == sequential python recurrence
# ---------------------------------------------------------------------------

def test_ewma_matches_sequential_recurrence(spark):
    df = BY_NAME["ewma_user_value"](spark, SF)
    got = {r["user_id"]: (r["n_events"], r["ewma_value"]) for r in df.collect()}

    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "user_id", "ts", "event_id", "value"
    )
    rows = ev.collect()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(
            (r["ts"], r["event_id"], r["value"])
        )
    for uid, seq in by_user.items():
        seq.sort()
        acc = seq[0][2]
        for _, _, v in seq[1:]:
            acc = acc * 0.7 + v * 0.3
        n, ewma = got[uid]
        assert n == len(seq)
        assert math.isclose(ewma, round(acc, 6), abs_tol=1e-9)


# ---------------------------------------------------------------------------
# discrete percentiles are actual data points; mode tie-break minimal
# ---------------------------------------------------------------------------

def test_mode_disc_census_values_are_data_points(spark):
    df = BY_NAME["events_mode_disc_census"](spark, SF)
    ev = spark.read.parquet(f"{SF}/events.parquet")
    by_type: dict = {}
    for r in ev.select("event_type", "value").collect():
        by_type.setdefault(r["event_type"], []).append(r["value"])
    for r in df.collect():
        vals = sorted(by_type[r["event_type"]])
        n = len(vals)
        assert r["n_events"] == n
        assert r["p50_disc"] == vals[math.ceil(n * 0.5) - 1]
        assert r["p90_disc"] == vals[math.ceil(n * 0.9) - 1]
        # mode: maximal count, smallest bucket among ties
        from collections import Counter

        cnt = Counter(math.floor(v) for v in vals)
        best = max(cnt.values())
        assert r["mode_bucket"] == min(b for b, c in cnt.items() if c == best)


# ---------------------------------------------------------------------------
# interval union: constructed overlap cases
# ---------------------------------------------------------------------------

def test_interval_union_merges_overlaps(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ev(eid, uid, offset_min, dur_min):
        return (eid, base + dt.timedelta(minutes=offset_min), uid, "e",
                float(dur_min), "{}")

    rows = [
        # user 1: [0,10] + [5,15] overlap -> one island of 15 min;
        # [30,35] separate -> island of 5 min
        ev(1, 1, 0, 10), ev(2, 1, 5, 10), ev(3, 1, 30, 5),
        # user 2: touching endpoints [0,10] + [10,20] merge (s > max_e
        # is strict) -> 20 min
        ev(4, 2, 0, 10), ev(5, 2, 10, 10),
        # user 3: contained interval [0,60] + [10,20] -> 60 min
        ev(6, 3, 0, 60), ev(7, 3, 10, 10),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        out = {
            r["user_id"]: (r["n_islands"], r["covered_us"])
            for r in BY_NAME["interval_union_by_user"](spark, d).collect()
        }
    m_us = 60 * 1_000_000
    assert out[1] == (2, 20 * m_us)
    assert out[2] == (1, 20 * m_us)
    assert out[3] == (1, 60 * m_us)


# ---------------------------------------------------------------------------
# quality ensemble: score bounded, keep consistent with score
# ---------------------------------------------------------------------------

def test_quality_ensemble_bounds_and_keep(spark):
    df = BY_NAME["quality_ensemble_documents"](spark, SF)
    rows = df.collect()
    assert rows
    for r in rows:
        assert 0.0 < r["quality_score"] < 1.0
        assert r["keep"] == (r["quality_score"] >= 0.5)


# ---------------------------------------------------------------------------
# temperature mixture + shard manifest properties
# ---------------------------------------------------------------------------

def test_mixture_temperature_weights_normalized_and_flattened(spark):
    rows = BY_NAME["mixture_temperature_weights"](spark, SF).collect()
    assert rows
    total = sum(r["sample_weight"] for r in rows)
    assert abs(total - 1.0) < 1e-4
    # T=0.5 flattens: every language's share of the sample is closer
    # to uniform than its share of tokens (upsample tail, downsample head)
    tok_total = sum(r["n_tokens"] for r in rows)
    uniform = 1.0 / len(rows)
    for r in rows:
        p = r["n_tokens"] / tok_total
        if abs(p - uniform) > 1e-9:
            assert abs(r["sample_weight"] - uniform) < abs(p - uniform)


def test_shard_manifest_balances_tokens(spark):
    rows = BY_NAME["shard_manifest_documents"](spark, SF).collect()
    assert len(rows) == 8
    totals = [r["total_tokens"] for r in rows]
    counts = [r["n_docs"] for r in rows]
    assert sum(counts) == spark.read.parquet(f"{SF}/documents.parquet").count()
    # snake dealing over size-sorted docs: shard totals stay within
    # one max-document of each other
    max_doc = max(r["max_doc_tokens"] for r in rows)
    assert max(totals) - min(totals) <= max_doc
    assert max(counts) - min(counts) <= 1


# ---------------------------------------------------------------------------
# priority sampling: deterministic, weight-proportional inclusion
# ---------------------------------------------------------------------------

def test_priority_sample_deterministic_and_weight_biased(spark):
    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.operators.sampling import (
        priority_sample,
    )

    # 3 heavy keys (weight 100) among 30 light ones (weight 1)
    rows = [(i, 100.0 if i < 3 else 1.0) for i in range(33)]
    df = spark.createDataFrame(rows, ["k", "w"])

    a = priority_sample(df, "k", "w", k=5, salt="s1").collect()
    b = priority_sample(df, "k", "w", k=5, salt="s1").collect()
    assert sorted(r["k"] for r in a) == sorted(r["k"] for r in b)

    # across salts, heavy keys are picked far more often than light
    heavy_hits = light_hits = 0
    for salt in [f"salt{i}" for i in range(12)]:
        kept = {r["k"] for r in priority_sample(df, "k", "w", k=5, salt=salt).collect()}
        heavy_hits += sum(1 for k in kept if k < 3)
        light_hits += sum(1 for k in kept if k >= 3)
    # 3 heavy keys carry 300/330 of the weight: they should dominate
    assert heavy_hits / (12 * 3) > 0.8          # heavy keys almost always in
    assert light_hits / (12 * 30) < 0.15        # light keys rarely in


# ---------------------------------------------------------------------------
# semantic dedup: planted duplicate clusters collapse to one keeper
# ---------------------------------------------------------------------------

def test_semantic_dedup_collapses_planted_clusters(spark):
    import numpy as np

    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.operators.similarity import (
        semantic_dedup,
    )

    rng = np.random.default_rng(7)
    rows = []
    vid = 0
    # 6 well-separated base directions; 4 near-copies of each
    bases = []
    for g in range(6):
        b = rng.normal(size=24)
        b /= np.linalg.norm(b)
        bases.append(b)
        for _ in range(4):
            v = b + rng.normal(scale=0.01, size=24)
            rows.append((vid, (v / np.linalg.norm(v)).tolist(), g))
            vid += 1
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    out = semantic_dedup(
        df, threshold=0.95, n_lists=4, train_sample=1024, seed=1
    ).collect()

    by_id = {r["vec_id"]: r for r in out}
    assert len(by_id) == 24
    kept = [r for r in out if r["keep"]]
    # every planted group of 4 collapses to exactly one keeper
    # (groups are far apart, copies are 0.999+ similar)
    group_of = {i: i // 4 for i in range(24)}
    kept_groups = [group_of[r["vec_id"]] for r in kept]
    assert sorted(kept_groups) == list(range(6))
    # dropped rows point at a keeper of their OWN group
    for r in out:
        if not r["keep"]:
            assert r["dup_of"] is not None
            assert group_of[r["dup_of"]] == group_of[r["vec_id"]]
            assert by_id[r["dup_of"]]["keep"]
            assert r["dup_of"] < r["vec_id"]  # ascending visit order


# ---------------------------------------------------------------------------
# prefix-filter Jaccard join: lossless vs full inverted index, fewer candidates
# ---------------------------------------------------------------------------

def test_prefix_filter_matches_inverted_index_and_prunes(spark):
    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.operators.dedup import (
        jaccard_prefix_filter_pairs,
        ngram_jaccard_pairs,
    )

    d = spark.read.parquet(f"{SF}/documents.parquet")
    for thr in (0.3, 0.5, 0.7):
        full = {
            (r["id_a"], r["id_b"], r["jaccard"])
            for r in ngram_jaccard_pairs(d, "text", "doc_id", 3, thr).collect()
        }
        pruned = {
            (r["id_a"], r["id_b"], r["jaccard"])
            for r in jaccard_prefix_filter_pairs(
                d, "text", "doc_id", 3, thr
            ).collect()
        }
        assert pruned == full, f"threshold {thr}: lossy pruning"
