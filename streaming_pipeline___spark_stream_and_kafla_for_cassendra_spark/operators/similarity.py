"""Similarity search over embedding columns (array<float>).

Two tiers:

* brute-force cosine top-k — exact baseline. The query set is
  broadcast (it is small by construction); the candidate table never
  shuffles: plan = scan candidates → broadcast-nested-loop with the
  queries → per-query top-k. Dot products run JVM-side via
  higher-order functions (zip_with/aggregate) in double precision.
* random-hyperplane LSH top-k — the scale path. Deterministic seeded
  hyperplanes (literal arrays baked into the plan, no driver collect
  at runtime), sign-bit band buckets, candidates joined within
  buckets only, then exact cosine re-rank of the candidate set.

At 100 TB of vectors the brute-force tier is only for small query
batches; the LSH tier bounds work to bucket-local comparisons.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_double(col: Column) -> Column:
    return col.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    ad, bd = _as_double(a), _as_double(b)
    return dot(ad, bd) / (norm(ad) * norm(bd))


def brute_force_topk(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k for each query vector.

    Returns (query_id, neighbor_id, cosine_sim, rank); self-matches
    excluded; ties broken by neighbor id for determinism.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qvec")
    )
    c = candidates.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cvec")
    )
    scored = (
        c.join(F.broadcast(q), on=F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine_sim", cosine(F.col("_qvec"), F.col("_cvec")))
        .drop("_qvec", "_cvec")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cosine_sim", 4).alias("cosine_sim"),
            "rank",
        )
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = random.Random(seed)
    return [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
    ]


def lsh_bucket_col(
    vec: Column, planes: list[list[float]], band: int, band_bits: int
) -> Column:
    """Sign-bit bucket id for one band of hyperplanes."""
    bits = []
    for i in range(band * band_bits, (band + 1) * band_bits):
        plane = F.array(*[F.lit(v) for v in planes[i]])
        bits.append((dot(_as_double(vec), plane) > 0).cast("int"))
    bucket = F.lit(0)
    for j, bit in enumerate(bits):
        bucket = bucket + bit * F.lit(1 << j)
    return bucket


def lsh_topk(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_bands: int = 8,
    band_bits: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k: random-hyperplane LSH blocking +
    exact re-rank inside buckets.

    A query only compares against candidates sharing ≥1 of its
    ``n_bands`` sign-bit buckets — at scale the bucket join is an
    equi-join Catalyst shuffles by (band, bucket) instead of a full
    cross product. Recall is tunable via bands × bits.
    """
    planes = _hyperplanes(dim, n_bands * band_bits, seed)

    def banded(df: DataFrame, idname: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(idname),
            F.col(vec_col).alias(f"_{idname}_vec"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            lsh_bucket_col(F.col(vec_col), planes, b, band_bits)
                            .alias("bucket"),
                        )
                        for b in range(n_bands)
                    ]
                )
            ).alias("bb"),
        ).select(idname, f"_{idname}_vec", "bb.band", "bb.bucket")

    qb = banded(queries, "query_id")
    cb = banded(candidates, "neighbor_id")
    cand = (
        qb.join(cb, on=["band", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn(
            "cosine_sim", cosine(F.col("_query_id_vec"), F.col("_neighbor_id_vec"))
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cosine_sim", 4).alias("cosine_sim"),
            "rank",
        )
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine ≥ threshold (id_a < id_b).

    Exact self-join baseline; for 100 TB use :func:`lsh_topk`-style
    blocking first. Kept exact here because it is the oracle-checked
    variant.
    """
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    return (
        a.join(b, on=F.col("id_a") < F.col("id_b"))
        .withColumn("cosine_sim", cosine(F.col("_va"), F.col("_vb")))
        .filter(F.col("cosine_sim") >= threshold)
        .select("id_a", "id_b", F.round("cosine_sim", 4).alias("cosine_sim"))
    )


def label_centroids(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-label centroid, long form: (label, pos, centroid_val).

    posexplode + (label, pos) aggregate: fully distributed with
    map-side partial sums; never materializes a per-label dense
    vector on the driver.
    """
    exploded = df.select(
        F.col(label_col).alias("label"),
        F.posexplode(_as_double(F.col(vec_col))).alias("pos", "val"),
    )
    return (
        exploded.groupBy("label", "pos")
        .agg(
            F.count("*").cast("bigint").alias("n_vectors"),
            F.round(F.avg("val"), 6).alias("centroid_val"),
        )
        .select("label", F.col("pos").cast("int").alias("pos"), "n_vectors", "centroid_val")
    )
