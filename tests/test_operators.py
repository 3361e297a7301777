"""Operator unit tests: as-of join, dedup family, similarity, text."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.operators.dedup import (
    dedup_exact,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_fingerprints,
    simhash_near_dup_pairs,
)
from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.operators.joins import (
    asof_join,
)
from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.operators.similarity import (
    brute_force_topk,
    lsh_topk,
)
from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.functions.text import (
    lang_id_heuristic,
    quality_bucket,
    token_count,
)

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- as-of join

def test_asof_join_backward_inclusive(spark):
    left = spark.createDataFrame(
        [(1, 10, "p1"), (1, 20, "p2"), (2, 5, "p3")], "k int, ts int, pid string"
    )
    right = spark.createDataFrame(
        [(1, 8, "v1"), (1, 10, "v2"), (1, 15, "v3"), (2, 9, "v4")],
        "k int, ts int, vid string",
    )
    out = {
        r.pid: r.vid_right
        for r in asof_join(left, right, on="k", left_ts="ts", right_ts="ts").collect()
    }
    # p1@10 matches v2@10 (inclusive), p2@20 matches v3@15, p3@5 has no
    # prior right row → null
    assert out == {"p1": "v2", "p2": "v3", "p3": None}


# ------------------------------------------------------------------- dedup

@pytest.fixture(scope="module")
def doc_df(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away today"
    near = base.replace("today", "tonight")
    other = "completely different words describing spark catalyst optimizer internals"
    rows = [
        (1, base),
        (2, base),  # exact dup of 1
        (3, near),  # near dup of 1
        (4, other),
        (5, "  THE quick   brown fox jumps over the lazy dog and runs far away today "),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_dedup_exact_normalizes(spark, doc_df):
    kept = {r.doc_id: r.dup_count for r in dedup_exact(doc_df, "text", "doc_id").collect()}
    # 1, 2 and 5 collapse (case/whitespace normalization); 3, 4 unique
    assert kept == {1: 3, 3: 1, 4: 1}


def test_ngram_jaccard_finds_near_dup(spark, doc_df):
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(doc_df, "text", "doc_id", threshold=0.2).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs and 0.5 < pairs[(1, 3)] < 1.0
    assert not any(4 in p for p in pairs)


def test_minhash_recall_against_exact_jaccard(spark):
    """Every exact-Jaccard≥0.5 pair in the sf0.001 documents corpus is
    recovered by the MinHash-LSH candidates (16 bands × 4 rows ⇒
    recall >0.99 at j=0.5)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    exact = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.5).collect()
    }
    assert exact, "fixture corpus should contain planted near-dups"
    mh = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(docs, "text", "doc_id", threshold=0.35).collect()
    }
    missed = exact - mh
    assert not missed, f"LSH missed {missed}"


def test_simhash_identical_and_near(spark, doc_df):
    fp = {r.doc_id: r.simhash for r in simhash_fingerprints(doc_df, "text", "doc_id").collect()}
    assert fp[1] == fp[2]  # identical token multiset → identical simhash
    pairs = {
        (r.id_a, r.id_b): r.hamming_distance
        for r in simhash_near_dup_pairs(doc_df, "text", "doc_id").collect()
    }
    assert pairs[(1, 2)] == 0
    if (1, 3) in pairs:
        assert pairs[(1, 3)] <= 16


# --------------------------------------------------------------- similarity

def test_brute_force_topk_matches_numpy(spark):
    import numpy as np

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    got = brute_force_topk(emb, queries, k=3).collect()

    rows = emb.collect()
    ids = np.array([r.vec_id for r in rows])
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    by_id = {int(i): mat[j] for j, i in enumerate(ids)}

    for q in {r.query_id for r in got}:
        sims = mat @ by_id[q]
        order = sorted(
            [(s, int(i)) for s, i in zip(sims, ids) if i != q],
            key=lambda t: (-t[0], t[1]),
        )
        expected = [i for _, i in order[:3]]
        mine = [r.neighbor_id for r in sorted(got, key=lambda r: r.rank) if r.query_id == q]
        assert mine == expected


def test_lsh_topk_recall_on_clustered_vectors(spark):
    """Sign-LSH recall is only meaningful when near neighbors are
    actually close (the sf fixture embeddings are near-orthogonal,
    max cos ≈ 0.5 — no LSH family helps there). Plant 20 tight
    clusters and require ≥80% top-1 recall."""
    import numpy as np

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
    approx = lsh_topk(emb, queries, k=5, n_bands=8, band_bits=8).collect()
    exact_at1 = {r.query_id: r.neighbor_id for r in exact if r.rank == 1}
    approx_sets: dict[int, set[int]] = {}
    for r in approx:
        approx_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(1 for q, nn in exact_at1.items() if nn in approx_sets.get(q, set()))
    assert hits >= int(0.8 * len(exact_at1))


# --------------------------------------------------------------------- text

def test_text_functions(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat is on the mat and it is flat"),
            (2, "word"),
            (3, "el perro y el gato se ven en la casa y no es un problema"),
            (4, "der Hund und die Katze sind in den Garten mit dem Ball"),
        ],
        "doc_id bigint, text string",
    )
    out = {
        r.doc_id: (r.n, r.q, r.lang)
        for r in df.select(
            "doc_id",
            token_count("text").alias("n"),
            quality_bucket("text").alias("q"),
            lang_id_heuristic("text").alias("lang"),
        ).collect()
    }
    assert out[1] == (10, "boilerplate", "en")  # stop-ratio 0.5+ → boilerplate
    assert out[2][0] == 1 and out[2][1] == "too_short"
    assert out[3][2] == "es"
    assert out[4][2] == "de"


def test_word_ngrams_ansi_safe_on_short_docs(spark):
    """Docs shorter than n tokens yield [] instead of an ANSI
    element_at index error (Spark 4 defaults ansi=true)."""
    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.functions.text import (
        word_ngrams,
    )

    df = spark.createDataFrame(
        [(1, "one two"), (2, ""), (3, None), (4, "a b c")],
        "id int, text string",
    )
    got = {r.id: r.g for r in df.select("id", word_ngrams("text", 3).alias("g")).collect()}
    assert got[1] == [] and got[2] == [] and got[3] == []
    assert got[4] == ["a b c"]


def test_ivf_topk_recall_on_clustered_vectors(spark):
    """IVF with spherical k-means lists: same planted-cluster fixture
    as the LSH test; probing 4 of 8 lists must recover ≥80% of top-1
    neighbors (cluster members land in the same list by construction)."""
    import numpy as np

    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.operators.similarity import (
        ivf_topk,
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
    approx = ivf_topk(emb, queries, k=5, n_lists=8, n_probe=4).collect()
    exact_at1 = {r.query_id: r.neighbor_id for r in exact if r.rank == 1}
    approx_sets: dict[int, set[int]] = {}
    for r in approx:
        approx_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(1 for q, nn in exact_at1.items() if nn in approx_sets.get(q, set()))
    assert hits >= int(0.8 * len(exact_at1))


def test_deterministic_sampling_and_split(spark):
    """Hash-based sampling: reproducible across runs, fraction within
    tolerance, split is a partition, fraction=1.0 keeps everything."""
    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.operators.sampling import (
        deterministic_sample,
        stratified_sample,
        train_test_split,
    )

    df = spark.range(0, 5000).withColumnRenamed("id", "k")
    a = deterministic_sample(df, "k", 0.2)
    assert a.count() == deterministic_sample(df, "k", 0.2).count()  # stable
    assert abs(a.count() / 5000 - 0.2) < 0.03
    assert deterministic_sample(df, "k", 1.0).count() == 5000
    assert deterministic_sample(df, "k", 0.0).count() == 0

    split = train_test_split(df, "k", test_fraction=0.25)
    counts = {r.split: r["count"] for r in split.groupBy("split").count().collect()}
    assert counts["test"] + counts["train"] == 5000
    assert abs(counts["test"] / 5000 - 0.25) < 0.03

    strat = spark.createDataFrame(
        [(i, "a" if i % 2 else "b") for i in range(2000)], "k long, s string"
    )
    got = {
        r.s: r["count"]
        for r in stratified_sample(strat, "s", {"a": 1.0, "b": 0.1}, "k")
        .groupBy("s")
        .count()
        .collect()
    }
    assert got["a"] == 1000 and abs(got.get("b", 0) / 1000 - 0.1) < 0.05


def test_connected_components_known_graphs(spark):
    """Triangle + chain + isolated edge resolve to min-id components;
    a 9-node chain forces multiple propagation rounds (pointer
    jumping keeps it within the iteration budget)."""
    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.operators.dedup import (
        connected_components,
    )

    edges = [(1, 2), (2, 3), (3, 1), (10, 11), (20, 21), (21, 22)]
    # 9-node chain 30-31-...-38: diameter 8
    edges += [(i, i + 1) for i in range(30, 38)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.node: r.comp for r in connected_components(df, "src", "dst").collect()
    }
    assert got == {
        **{n: 1 for n in (1, 2, 3)},
        **{n: 10 for n in (10, 11)},
        **{n: 20 for n in (20, 21, 22)},
        **{n: 30 for n in range(30, 39)},
    }


def test_connected_components_direction_insensitive(spark):
    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.operators.dedup import (
        connected_components,
    )

    fwd = spark.createDataFrame([(5, 1), (1, 9), (9, 2)], "src long, dst long")
    got = {r.node: r.comp for r in connected_components(fwd, "src", "dst").collect()}
    assert set(got.values()) == {1}


def test_range_join_matches_naive_between(spark):
    """Bucketized range join ≡ naive BETWEEN join (inclusive bounds),
    including intervals that span several buckets and points exactly
    on interval edges; no duplicate pairs."""
    import datetime as dt

    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.operators.joins import (
        range_join,
    )

    base = dt.datetime(2024, 1, 1)
    pts = spark.createDataFrame(
        [(i, base + dt.timedelta(minutes=7 * i)) for i in range(200)],
        "pid long, ts timestamp",
    )
    ivs = spark.createDataFrame(
        [
            (j, base + dt.timedelta(minutes=60 * j), base + dt.timedelta(minutes=60 * j + 150))
            for j in range(20)
        ],
        "iid long, s timestamp, e timestamp",
    )
    got = sorted(
        (r.pid, r.iid)
        for r in range_join(pts, ivs, "ts", "s", "e", bucket_seconds=1800).collect()
    )
    naive = sorted(
        (r.pid, r.iid)
        for r in pts.join(
            ivs, (F.col("ts") >= F.col("s")) & (F.col("ts") <= F.col("e"))
        ).collect()
    )
    assert got == naive and len(got) == len(set(got))


def test_pagerank_uniform_cycle_and_sink(spark):
    """On a 3-cycle with equal weights every node's rank stays 1.0;
    a pure sink fed by one node settles above its feeder."""
    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.operators.graph import (
        pagerank,
    )

    cyc = spark.createDataFrame(
        [("a", "b", 1.0), ("b", "c", 1.0), ("c", "a", 1.0)],
        "src string, dst string, w double",
    )
    got = {r.node: r["rank"] for r in pagerank(cyc, weight="w").collect()}
    assert all(abs(v - 1.0) < 1e-9 for v in got.values())

    star = spark.createDataFrame(
        [("h", "x", 3.0), ("u1", "h", 1.0), ("u2", "h", 1.0)],
        "src string, dst string, w double",
    )
    got = {r.node: r["rank"] for r in pagerank(star, weight="w").collect()}
    # u1/u2 have no in-edges -> 0.15; h collects both; x collects h
    assert abs(got["u1"] - 0.15) < 1e-9 and abs(got["u2"] - 0.15) < 1e-9
    assert got["h"] > got["u1"] and got["x"] > got["u1"]


def test_approx_sketches_within_tolerance(spark):
    """Sketch aggregates are the scale path for distincts/quantiles
    (exact countDistinct is illegal in streaming; exact percentile
    holds all values). Bound their error against exact answers."""
    df = spark.range(0, 50_000).select(
        (F.col("id") % 9973).alias("k"), (F.col("id") * 17 % 10007).alias("v")
    )
    exact_d = df.select(F.countDistinct("k")).first()[0]
    approx_d = df.select(F.approx_count_distinct("k", rsd=0.02)).first()[0]
    assert abs(approx_d - exact_d) / exact_d < 0.05

    exact_p = df.select(F.percentile("v", F.lit(0.5))).first()[0]
    approx_p = df.select(
        F.percentile_approx("v", F.lit(0.5), F.lit(10_000))
    ).first()[0]
    assert abs(approx_p - exact_p) / max(exact_p, 1) < 0.01


def test_asof_join_matches_pandas_merge_asof_randomized(spark):
    """asof_join ≡ pandas.merge_asof (backward, inclusive) over five
    seeded random datasets with duplicate keys, unmatched keys, and
    exact-timestamp ties."""
    import numpy as np
    import pandas as pd

    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.operators.joins import (
        asof_join,
    )

    for seed in range(5):
        rng = np.random.default_rng(seed)
        n_l, n_r = 80, 60
        left_pd = pd.DataFrame(
            {
                "k": rng.integers(0, 6, n_l),
                "lts": pd.to_datetime(
                    rng.integers(0, 10_000, n_l), unit="s"
                ),
                "lid": np.arange(n_l),
            }
        )
        right_pd = pd.DataFrame(
            {
                "k": rng.integers(0, 8, n_r),  # some keys never match
                "rts": pd.to_datetime(
                    rng.integers(0, 10_000, n_r), unit="s"
                ),
                "rval": rng.normal(size=n_r).round(6),
            }
        )
        # merge_asof needs per-key unique ordering for determinism:
        # collapse right duplicates to the greatest rval per (k, rts)
        right_pd = (
            right_pd.groupby(["k", "rts"], as_index=False)["rval"].max()
        )
        expected = pd.merge_asof(
            left_pd.sort_values("lts", kind="stable"),
            right_pd.sort_values("rts", kind="stable"),
            left_on="lts",
            right_on="rts",
            by="k",
            direction="backward",
            allow_exact_matches=True,
        )
        exp = {
            int(r.lid): (None if pd.isna(r.rval) else round(float(r.rval), 6))
            for r in expected.itertuples()
        }

        left = spark.createDataFrame(left_pd.rename(columns={"lts": "ts"}))
        right = spark.createDataFrame(right_pd.rename(columns={"rts": "ts"}))
        got_rows = asof_join(
            left, right, on="k", left_ts="ts", right_ts="ts",
            right_cols=["rval"],
        ).collect()
        got = {
            int(r.lid): (
                None if r.rval_right is None else round(float(r.rval_right), 6)
            )
            for r in got_rows
        }
        assert got == exp, f"seed {seed} mismatch"


def test_connected_components_star_matches_label_prop(spark):
    """Two-phase star contraction agrees with min-label propagation on
    a random graph with a giant component, chains, and singleton
    clusters — and handles the giant case in O(log n) rounds."""
    import random

    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    rng = random.Random(11)
    edges = [(rng.randrange(500), rng.randrange(500)) for _ in range(700)]
    edges += [(1000 + i, 1001 + i) for i in range(30)]  # long chain
    edges += [(2000, 2001), (3000, 3001)]
    df = spark.createDataFrame(
        [e for e in edges if e[0] != e[1]], "src long, dst long"
    )
    a = {r.node: r.comp for r in connected_components(df, max_iter=60).collect()}
    b = {r.node: r.comp for r in connected_components_star(df).collect()}
    assert a == b


def test_mixture_reweight_uniform_hits_min_stratum(spark):
    """Uniform target mixture downsamples every stratum toward the
    smallest one: expected kept ≈ min_n per stratum, and membership is
    deterministic (rerun-identical)."""
    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.operators.sampling import (
        mixture_reweight,
    )

    rows = (
        [(i, "big") for i in range(2000)]
        + [(10_000 + i, "mid") for i in range(800)]
        + [(20_000 + i, "small") for i in range(400)]
    )
    df = spark.createDataFrame(rows, ["k", "src"])
    kept = mixture_reweight(df, "src", "k")
    counts = {r["src"]: r["n"] for r in kept.groupBy("src").agg(F.count("*").alias("n")).collect()}
    # the binding stratum survives intact; others land near 400 (hash noise)
    assert counts["small"] == 400
    for s in ("big", "mid"):
        assert abs(counts[s] - 400) < 80, counts
    again = {r["src"]: r["n"] for r in mixture_reweight(df, "src", "k").groupBy("src").agg(F.count("*").alias("n")).collect()}
    assert counts == again


def test_mixture_reweight_explicit_weights(spark):
    """Explicit 3:1 target: kept counts track the requested mixture and
    strata with zero weight are dropped entirely."""
    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.operators.sampling import (
        mixture_reweight,
    )

    rows = (
        [(i, "a") for i in range(3000)]
        + [(10_000 + i, "b") for i in range(3000)]
        + [(20_000 + i, "junk") for i in range(500)]
    )
    df = spark.createDataFrame(rows, ["k", "src"])
    kept = mixture_reweight(df, "src", "k", target_weights={"a": 3.0, "b": 1.0})
    counts = {r["src"]: r["n"] for r in kept.groupBy("src").agg(F.count("*").alias("n")).collect()}
    assert "junk" not in counts
    # T = min(3000/0.75, 3000/0.25) = 4000 → kept a=3000, b≈1000
    assert counts["a"] == 3000
    assert abs(counts["b"] - 1000) < 120, counts


def test_pii_scrub_patterns(spark):
    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.functions.text import (
        pii_scrub,
    )

    df = spark.createDataFrame(
        [
            ("mail jane.doe+x@corp.example.org now",),
            ("call 415-555-123-4567 today",),
            ("host 192.168.0.1 responded",),
            ("version 1.2 costs 3.50 at row 12",),
        ],
        ["text"],
    )
    out = [r[0] for r in df.select(pii_scrub("text")).collect()]
    assert out[0] == "mail <EMAIL> now"
    assert out[1] == "call <PHONE> today"
    assert out[2] == "host <IP> responded"
    # conservative: bare decimals / small numbers untouched
    assert out[3] == "version 1.2 costs 3.50 at row 12"
