"""Round-2 operators: skyline, dense ids, MAD outliers, transitions,
top-p truncation, ER blocking — property/equivalence tests beyond the
registry's DuckDB-oracle gate."""

from __future__ import annotations

import random

import pytest

from pyspark.sql import Window
from pyspark.sql import functions as F

from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.operators.scale import (
    dense_ids,
)
from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.plans.registry import (
    REGISTRY,
)

BY_NAME = {q.name: q.builder for q in REGISTRY}
SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# skyline: two-phase window rewrite == brute-force dominance test
# ---------------------------------------------------------------------------

def _brute_skyline(points):
    out = []
    for p, s in points:
        dominated = any(
            (p2 <= p and s2 >= s and (p2 < p or s2 > s)) for p2, s2 in points
        )
        if not dominated:
            out.append((p, s))
    return sorted(set(out))


def test_skyline_matches_bruteforce_random(spark, tmp_path):
    rng = random.Random(7)
    pts = [(rng.randint(0, 40) / 2.0, rng.randint(1, 30)) for _ in range(300)]
    # force duplicates and an all-dominating corner case
    pts += pts[:17] + [(0.0, 30)]
    df = spark.createDataFrame(pts, ["p_retailprice", "p_size"])
    sf_dir = str(tmp_path)
    df.write.parquet(f"{sf_dir}/part.parquet")
    got = sorted(
        (r["price"], r["size"])
        for r in BY_NAME["skyline_parts_price_size"](spark, sf_dir).collect()
    )
    assert got == _brute_skyline(pts)


def test_skyline_counts_duplicates(spark, tmp_path):
    pts = [(1.0, 5), (1.0, 5), (2.0, 9), (3.0, 1)]
    df = spark.createDataFrame(pts, ["p_retailprice", "p_size"])
    sf_dir = str(tmp_path)
    df.write.parquet(f"{sf_dir}/part.parquet")
    rows = {
        (r["price"], r["size"]): r["n_parts"]
        for r in BY_NAME["skyline_parts_price_size"](spark, sf_dir).collect()
    }
    # (3.0, 1) is dominated by (2.0, 9)?  price 2<3 and size 9>1 -> yes
    assert rows == {(1.0, 5): 2, (2.0, 9): 1}


# ---------------------------------------------------------------------------
# dense_ids: dense, 0-based, order-correct, partition-count invariant
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("parts", [1, 3, 7])
def test_dense_ids_dense_and_ordered(spark, parts):
    n = 1000
    rng = random.Random(3)
    keys = rng.sample(range(100_000), n)
    df = spark.createDataFrame(
        [(k, f"v{k}") for k in keys], ["k", "payload"]
    ).repartition(5)
    out = dense_ids(df, "k", num_partitions=parts).collect()
    assert sorted(r["row_id"] for r in out) == list(range(n))
    by_id = sorted(out, key=lambda r: r["row_id"])
    assert [r["k"] for r in by_id] == sorted(keys)
    # payload column passes through untouched
    assert all(r["payload"] == f"v{r['k']}" for r in out)


def test_dense_ids_requires_order_cols(spark):
    df = spark.range(5)
    with pytest.raises(ValueError):
        dense_ids(df)


# ---------------------------------------------------------------------------
# MAD outliers: constructed outliers detected, median immune
# ---------------------------------------------------------------------------

def test_mad_flags_constructed_outliers(spark, tmp_path):
    base = [("a", float(v)) for v in range(1, 101)]           # 1..100
    spikes = [("a", 100000.0), ("a", -100000.0)]
    df = spark.createDataFrame(
        [(i, "2024-01-01 00:00:00", 1, t, v, "{}") for i, (t, v) in
         enumerate(base + spikes)],
        ["event_id", "ts_s", "user_id", "event_type", "value", "props"],
    ).select(
        "event_id", F.col("ts_s").cast("timestamp").alias("ts"),
        "user_id", "event_type", "value", "props",
    )
    sf_dir = str(tmp_path)
    df.write.parquet(f"{sf_dir}/events.parquet")
    row = BY_NAME["mad_outlier_events"](spark, sf_dir).collect()[0]
    assert row["n_events"] == 102
    assert row["n_outliers"] == 2          # exactly the two spikes
    assert abs(row["med_value"] - 50.5) < 1e-9  # median ignores spikes


# ---------------------------------------------------------------------------
# transition matrix: rows normalize to 1 per source state
# ---------------------------------------------------------------------------

def test_transition_probs_sum_to_one(spark):
    df = BY_NAME["event_type_transitions"](spark, SF)
    sums = (
        df.groupBy("event_type").agg(F.sum("prob").alias("s")).collect()
    )
    assert sums and all(abs(r["s"] - 1.0) < 1e-4 for r in sums)


# ---------------------------------------------------------------------------
# top-p: kept prefix is the MINIMAL set covering p of token mass
# ---------------------------------------------------------------------------

def test_top_p_minimal_cover(spark):
    kept = BY_NAME["top_p_tokens_per_source"](spark, SF)
    d = spark.read.parquet(f"{SF}/documents.parquet")
    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.functions.text import (
        tokens,
    )

    full = (
        d.select("source", F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("source", "token")
        .count()
    )
    tot = {r["source"]: r["t"] for r in
           full.groupBy("source").agg(F.sum("count").alias("t")).collect()}
    kept_rows = kept.collect()
    kept_mass: dict[str, int] = {}
    min_kept_cnt: dict[str, int] = {}
    for r in kept_rows:
        kept_mass[r["source"]] = kept_mass.get(r["source"], 0) + r["token_cnt"]
        min_kept_cnt[r["source"]] = min(
            min_kept_cnt.get(r["source"], 10**9), r["token_cnt"]
        )
    for src, total in tot.items():
        assert kept_mass[src] * 10 >= total * 8            # covers p
        # dropping the smallest kept token falls below p -> minimal
        assert (kept_mass[src] - min_kept_cnt[src]) * 10 < total * 8


# ---------------------------------------------------------------------------
# ER blocking: candidates == all close pairs that share the block key
# ---------------------------------------------------------------------------

def test_blocking_pairs_equal_within_block_bruteforce(spark):
    got = {
        (r["key_a"], r["key_b"])
        for r in BY_NAME["blocking_candidate_pairs"](spark, SF).collect()
    }
    p = spark.read.parquet(f"{SF}/part.parquet").select(
        "p_partkey", "p_name", "p_brand",
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("tok"),
    )
    rows = p.collect()
    want = set()
    for a in rows:
        for b in rows:
            if (
                a["p_partkey"] < b["p_partkey"]
                and a["tok"] == b["tok"]
                and a["p_brand"] == b["p_brand"]
            ):
                # tiny exact Levenshtein
                s, t = a["p_name"], b["p_name"]
                prev = list(range(len(t) + 1))
                for i, cs in enumerate(s, 1):
                    cur = [i]
                    for j, ct in enumerate(t, 1):
                        cur.append(min(
                            prev[j] + 1, cur[j - 1] + 1,
                            prev[j - 1] + (cs != ct),
                        ))
                    prev = cur
                if prev[-1] <= 2:
                    want.add((a["p_partkey"], b["p_partkey"]))
    assert got == want


# ---------------------------------------------------------------------------
# PQ ANN: planted-cluster recall vs exact brute force
# ---------------------------------------------------------------------------

def test_pq_topk_recall_on_clustered_vectors(spark):
    """Product quantization with m=8 sub-spaces / 32 codes: same
    planted-cluster fixture as the LSH/IVF tests; ADC scoring must
    recover >=80% of top-1 neighbors."""
    import numpy as np

    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.operators.similarity import (
        brute_force_topk,
        pq_topk,
    )

    rng = np.random.default_rng(7)
    centers = rng.standard_normal((20, 64))
    rows = []
    vid = 0
    for c in centers:
        for _ in range(10):
            v = c + 0.05 * rng.standard_normal(64)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    queries = emb.filter(F.col("vec_id") % 40 == 0)

    exact = brute_force_topk(emb, queries, k=5).collect()
    approx = pq_topk(emb, queries, k=5, m=8, n_codes=32).collect()
    exact_at1 = {r.query_id: r.neighbor_id for r in exact if r.rank == 1}
    approx_sets: dict[int, set[int]] = {}
    for r in approx:
        approx_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(
        1 for q, nn in exact_at1.items() if nn in approx_sets.get(q, set())
    )
    assert hits >= int(0.8 * len(exact_at1))


def test_pq_rejects_indivisible_dim(spark):
    import pytest as _pytest

    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.operators.similarity import (
        pq_topk,
    )

    emb = spark.createDataFrame(
        [(0, [0.1] * 10), (1, [0.2] * 10)],
        "vec_id bigint, embedding array<float>",
    )
    with _pytest.raises(ValueError):
        pq_topk(emb, emb, m=3)


# ---------------------------------------------------------------------------
# k-core peeling on known graphs
# ---------------------------------------------------------------------------

def test_kcore_known_graph(spark):
    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.operators.graph import (
        kcore,
    )

    # K4 on {1,2,3,4} + a tail 4-5-6: the 3-core is exactly the K4
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    edges = spark.createDataFrame(
        k4 + [(4, 5), (5, 6)], ["src", "dst"]
    )
    got = {
        r["node"]: r["core_degree"]
        for r in kcore(edges, k=3, rounds=8).collect()
    }
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_kcore_empty_when_graph_too_sparse(spark):
    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.operators.graph import (
        kcore,
    )

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 8)], ["src", "dst"]
    )
    assert kcore(chain, k=3, rounds=8).count() == 0
