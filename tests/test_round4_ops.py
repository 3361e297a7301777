"""Round-4 operators: snapshot diff, distributed PCA, delta-join IVM."""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.operators.diff import (
    snapshot_diff,
)
from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.operators.linalg import (
    pca_fit,
    pca_fit_project,
    pca_project,
)
from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.streaming.ivm import (
    JoinView,
    write_streams_to_join_view,
)


# ---------------------------------------------------------------------------
# snapshot diff
# ---------------------------------------------------------------------------

def test_snapshot_diff_classifies_cud(spark):
    old = spark.createDataFrame(
        [(1, 10.0, "A"), (2, 20.0, "B"), (3, 30.0, "C"), (4, None, "D")],
        "k int, price double, status string",
    )
    new = spark.createDataFrame(
        [(2, 25.0, "B"), (3, 30.0, "C"), (4, 40.0, "D"), (5, 50.0, "E")],
        "k int, price double, status string",
    )
    out = {
        r["k"]: r.asDict()
        for r in snapshot_diff(
            old, new, keys=["k"], tracked=["price", "status"]
        ).collect()
    }
    # 1: deleted; 2: price changed; 3: identical (absent); 4: null→value
    # update; 5: created
    assert set(out) == {1, 2, 4, 5}
    assert out[1]["op"] == "d" and out[1]["old_price"] == 10.0
    assert out[1]["new_price"] is None
    assert out[2]["op"] == "u" and out[2]["new_price"] == 25.0
    assert out[4]["op"] == "u" and out[4]["old_price"] is None
    assert out[5]["op"] == "c" and out[5]["old_status"] is None


def test_snapshot_diff_composite_key_and_no_changes(spark):
    old = spark.createDataFrame(
        [(1, "x", 5), (1, "y", 6)], "a int, b string, v int"
    )
    same = snapshot_diff(old, old, keys=["a", "b"], tracked=["v"])
    assert same.count() == 0


# ---------------------------------------------------------------------------
# PCA
# ---------------------------------------------------------------------------

def _numpy_pca(x: np.ndarray, k: int):
    mean = x.mean(axis=0)
    cov = np.cov(x, rowvar=False, ddof=1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T
    for i in range(k):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps, evals[order]


def _planted(seed=7, n=400, d=16):
    rng = np.random.default_rng(seed)
    # anisotropic: two dominant directions
    base = rng.normal(size=(n, d)) * 0.1
    base[:, 0] += rng.normal(size=n) * 3.0
    base[:, 3] += rng.normal(size=n) * 1.5
    return base


def test_pca_matches_numpy(spark):
    x = _planted()
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<double>",
    )
    model = pca_fit(df, "embedding", k=3)
    mean, comps, evals = _numpy_pca(x, 3)
    assert np.allclose(model["mean"], mean, atol=1e-9)
    assert np.allclose(model["explained_variance"], evals, rtol=1e-8)
    assert np.allclose(model["components"], comps, atol=1e-8)
    # components orthonormal
    g = model["components"] @ model["components"].T
    assert np.allclose(g, np.eye(3), atol=1e-9)
    # projection matches numpy GEMM
    proj = {
        r["vec_id"]: r["pc"]
        for r in pca_project(df, model, "vec_id", "embedding").collect()
    }
    want = (x - mean) @ comps.T
    got = np.array([proj[i] for i in range(len(x))])
    assert np.allclose(got, want, atol=1e-8)
    # variance along pc1 >= pc2 >= pc3
    v = got.var(axis=0, ddof=1)
    assert v[0] >= v[1] >= v[2]


def test_pca_partition_invariant(spark):
    x = _planted(seed=11)
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<double>",
    )
    a = pca_fit(df.repartition(1), "embedding", k=2)
    b = pca_fit(df.repartition(7), "embedding", k=2)
    assert np.allclose(a["components"], b["components"], atol=1e-9)
    assert np.allclose(a["explained_variance"], b["explained_variance"])


def test_pca_fit_project_shape(spark):
    x = _planted(seed=3, n=50, d=8)
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<double>",
    )
    out = pca_fit_project(df, k=2)
    assert out.columns == ["vec_id", "pc1", "pc2"]
    assert out.count() == 50


# ---------------------------------------------------------------------------
# delta-join IVM
# ---------------------------------------------------------------------------

def _full_join_rows(spark, view):
    return sorted(
        tuple(r) for r in view.read(spark).collect()
    )


def test_ivm_apply_batches_equals_full_join(spark, tmp_path):
    view = JoinView(path=str(tmp_path / "v"), on=("k",))
    mk = lambda rows, side: spark.createDataFrame(
        rows, f"k int, {side} string"
    )
    # batch 0: left {1,2}, right {2,3}
    view.apply_batch(
        mk([(1, "l1"), (2, "l2")], "lv"), mk([(2, "r2"), (3, "r3")], "rv"),
        spark, 0,
    )
    assert _full_join_rows(spark, view) == [(2, "l2", "r2")]
    # batch 1: left {3}, right {1,2b}
    view.apply_batch(
        mk([(3, "l3")], "lv"), mk([(1, "r1"), (2, "r2b")], "rv"), spark, 1
    )
    got = _full_join_rows(spark, view)
    # full join of L={1,2,3} R={2,3,1,2b}
    assert got == sorted(
        [(2, "l2", "r2"), (3, "l3", "r3"), (1, "l1", "r1"), (2, "l2", "r2b")]
    )
    # replay batch 1 → committed marker makes it a no-op
    view.apply_batch(
        mk([(3, "l3")], "lv"), mk([(1, "r1"), (2, "r2b")], "rv"), spark, 1
    )
    assert _full_join_rows(spark, view) == got


def test_ivm_crash_replay_is_idempotent(spark, tmp_path):
    """A batch that wrote its state/view dirs but died before the
    commit marker must replay to the same result."""
    view = JoinView(path=str(tmp_path / "v"), on=("k",))
    mk = lambda rows, side: spark.createDataFrame(
        rows, f"k int, {side} string"
    )
    view.apply_batch(mk([(1, "l1")], "lv"), mk([(1, "r1")], "rv"), spark, 0)
    # simulate crash: run batch 1 fully, then delete ONLY its marker
    view.apply_batch(mk([(2, "l2")], "lv"), mk([(2, "r2")], "rv"), spark, 1)
    os.remove(view._marker(1))
    view.apply_batch(mk([(2, "l2")], "lv"), mk([(2, "r2")], "rv"), spark, 1)
    assert _full_join_rows(spark, view) == [(1, "l1", "r1"), (2, "l2", "r2")]


def test_ivm_streaming_multi_batch_equals_batch_join(spark, tmp_path):
    import pandas as pd

    ldir, rdir = tmp_path / "left", tmp_path / "right"
    ldir.mkdir(), rdir.mkdir()
    # two files per side → with maxFilesPerTrigger=1 the union source
    # produces several micro-batches with interleaved side deltas
    pd.DataFrame({"k": [1, 2], "lv": ["a", "b"]}).to_parquet(ldir / "0.parquet")
    pd.DataFrame({"k": [2, 3], "lv": ["c", "d"]}).to_parquet(ldir / "1.parquet")
    pd.DataFrame({"k": [2], "rv": ["x"]}).to_parquet(rdir / "0.parquet")
    pd.DataFrame({"k": [1, 3], "rv": ["y", "z"]}).to_parquet(rdir / "1.parquet")

    schema_l = "k bigint, lv string"
    schema_r = "k bigint, rv string"
    left = (
        spark.readStream.schema(schema_l)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(ldir))
    )
    right = (
        spark.readStream.schema(schema_r)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(rdir))
    )
    view = JoinView(path=str(tmp_path / "v"), on=("k",))
    q = write_streams_to_join_view(
        left, right, view,
        checkpoint_root=str(tmp_path / "ck"),
        available_now=True,
    )
    assert q.awaitTermination(120)

    got = sorted(tuple(r) for r in view.read(spark).collect())
    lb = spark.read.schema(schema_l).parquet(str(ldir))
    rb = spark.read.schema(schema_r).parquet(str(rdir))
    want = sorted(tuple(r) for r in lb.join(rb, on="k").collect())
    assert got == want
    # the run really was incremental (more than one committed batch)
    ledger = os.path.join(view.path, "_ivm_commits")
    assert len(os.listdir(ledger)) >= 2
