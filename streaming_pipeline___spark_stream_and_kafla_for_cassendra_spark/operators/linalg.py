"""Distributed linear algebra over embedding columns — PCA.

Why the engine needs it: a training-data pipeline reduces embedding
dimensionality before clustering / dedup / visualization (SemDeDup
and friends all run on whitened or reduced vectors). Spark ML's PCA
exists but drags in the mllib Vector UDT; this implementation stays
on plain ``array<float>`` columns (the engine's embedding contract,
`/root/testdata/*/embeddings.parquet`) and Arrow batches.

Scale design (the classic one-pass covariance factorization):

* Executors stream Arrow batches and emit ONLY ``(n, Σx, ΣxᵀX)``
  partials — O(d²) floats per partition, independent of row count.
  For d=64 that is 4 KB + 32 KB per partition; at 100 TB the driver
  reduce is over #partitions tiny matrices, never over rows.
* The d×d eigensolve is driver-side numpy — O(d³) on a 64×64 matrix
  is microseconds; no distributed eigensolver is warranted below
  d≈10⁴ (papers: Halko et al. randomized SVD is the scale-out path).
* Projection broadcasts the (d×k) component matrix and maps each
  Arrow batch with one GEMM — embarrassingly parallel, zero shuffle.
* Eigenvector SIGN is pinned deterministically (largest-|entry|
  coordinate made positive, first index on ties) so reruns,
  partition-count changes, and test oracles all see identical
  components.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

_PARTIAL_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("s", ArrayType(DoubleType())),
        StructField("g", ArrayType(DoubleType())),
    ]
)


def gram_partials(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-partition ``(row count, column sums, flattened XᵀX)``.

    One Arrow pass, no shuffle; the result is #partitions rows of
    O(d²) doubles — the sufficient statistics for mean + covariance.
    """

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s = None
        g = None
        for pdf in batches:
            x = np.asarray(list(pdf[vec_col]), dtype=np.float64)
            if x.size == 0:
                continue
            n += x.shape[0]
            if s is None:
                s = x.sum(axis=0)
                g = x.T @ x
            else:
                s += x.sum(axis=0)
                g += x.T @ x
        if n:
            yield pd.DataFrame({"n": [n], "s": [s], "g": [g.ravel()]})

    return df.select(vec_col).mapInPandas(fold, schema=_PARTIAL_SCHEMA)


def pca_fit(
    df: DataFrame, vec_col: str = "embedding", k: int = 2
) -> dict:
    """Fit PCA from the distributed gram pass.

    Returns ``{"mean": (d,), "components": (k, d), "explained_variance":
    (k,), "n": int}`` as numpy arrays with deterministically signed
    components (descending eigenvalue order).
    """
    parts = gram_partials(df, vec_col).collect()
    if not parts:
        raise ValueError("pca_fit: empty input")
    n = sum(p["n"] for p in parts)
    s = np.sum([np.asarray(p["s"]) for p in parts], axis=0)
    d = s.shape[0]
    g = np.sum([np.asarray(p["g"]).reshape(d, d) for p in parts], axis=0)
    mean = s / n
    cov = (g - n * np.outer(mean, mean)) / max(n - 1, 1)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T
    # pin sign: the largest-|entry| coordinate of each component is
    # made positive; np.argmax takes the FIRST max index on ties.
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return {
        "mean": mean,
        "components": comps,
        "explained_variance": evals[order],
        "n": int(n),
    }


def pca_project(
    df: DataFrame,
    model: dict,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "pc",
) -> DataFrame:
    """Project each vector onto the fitted components (one GEMM per
    Arrow batch, zero shuffle). Output: ``id_col``, ``out_col``
    (array<double> of length k)."""
    spark = df.sparkSession
    b_mean = spark.sparkContext.broadcast(model["mean"])
    b_comp = spark.sparkContext.broadcast(model["components"])
    out_schema = StructType(
        [df.schema[id_col], StructField(out_col, ArrayType(DoubleType()))]
    )

    def project(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        mean, comps = b_mean.value, b_comp.value
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.asarray(list(pdf[vec_col]), dtype=np.float64) - mean
            yield pd.DataFrame(
                {id_col: pdf[id_col], out_col: list(x @ comps.T)}
            )

    return df.select(id_col, vec_col).mapInPandas(project, schema=out_schema)


def pca_fit_project(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 2,
    round_to: int | None = 4,
) -> DataFrame:
    """Fit + project in one call; flattens components to ``pc1..pck``."""
    model = pca_fit(df, vec_col, k)
    proj = pca_project(df, model, id_col, vec_col)
    cols = [F.col(id_col)] + [
        (
            F.round(F.col("pc")[i], round_to)
            if round_to is not None
            else F.col("pc")[i]
        ).alias(f"pc{i + 1}")
        for i in range(k)
    ]
    return proj.select(*cols)
