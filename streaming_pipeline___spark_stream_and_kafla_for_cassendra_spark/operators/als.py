"""Distributed ALS matrix factorization (collaborative filtering).

Alternating least squares over a sparse (user, item, rating) matrix —
the classical recommender trainer, built scale-first:

* Each half-step solves ``x_u = (Σ_{i∈I_u} p_i p_iᵀ + λI)⁻¹ Σ r_ui p_i``
  per user (symmetrically per item). The normal-equation terms are
  assembled DISTRIBUTEDLY: ratings join the opposite side's factors
  (one hash join keyed on the opposite id), every row emits its k·k
  outer-product contributions, and a position-exploded grouped SUM
  reduces them — map-side combinable, shuffle size #entities × k²
  rows, never #ratings. No factor matrix is ever broadcast or
  collected; both sides may be arbitrarily large.
* The per-entity k×k solve is a single Arrow ``mapInPandas`` pass
  over the assembled rows (a dense solve of a k×k system per row,
  k=8 → trivial CPU), emitting the new factor vector.
* Initialization is deterministic (xxhash64-derived), item lists are
  processed in sorted order, and every float path is fixed-order, so
  retraining reproduces factors bit-for-bit.
* ``localCheckpoint`` after each half-step truncates the lineage the
  alternation would otherwise double per iteration (same discipline
  as the iterative graph operators).

At 100 TB the same plan holds: the join keys on the rating's entity
ids, AQE handles skewed power-users, and k² stays a constant factor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, DoubleType, LongType, StructField, StructType


def _init_factors(df: DataFrame, id_col: str, rank: int, seed: int) -> DataFrame:
    """Deterministic small factors in [-0.05, 0.05): hash(id, j, seed)."""
    return df.select(
        F.col(id_col),
        F.transform(
            F.sequence(F.lit(0), F.lit(rank - 1)),
            lambda j: (
                F.pmod(F.xxhash64(F.col(id_col), j, F.lit(seed)), F.lit(1000))
                / 10000.0
                - 0.05
            ),
        ).alias("factors"),
    )


def _solve_side(
    ratings: DataFrame,
    fixed: DataFrame,
    solve_col: str,
    fixed_col: str,
    rating_col: str,
    rank: int,
    reg: float,
) -> DataFrame:
    """One ALS half-step: re-solve ``solve_col``'s factors with
    ``fixed_col``'s held constant. Returns (solve_col, factors)."""
    k = rank
    joined = ratings.join(
        fixed.withColumnRenamed("factors", "_p"),
        ratings[fixed_col] == fixed[fixed_col],
    ).select(ratings[solve_col].alias("_e"), F.col(rating_col).alias("_r"), "_p")

    # per-row contributions: k² outer-product terms + k rhs terms,
    # position-encoded so ONE grouped sum reduces everything.
    # pos < k² → A[pos//k, pos%k] += p[pos//k]*p[pos%k]
    # pos >= k² → b[pos-k²] += r*p[pos-k²]
    p = F.col("_p")
    contrib = joined.select(
        "_e",
        F.explode(
            F.concat(
                F.transform(
                    F.sequence(F.lit(0), F.lit(k * k - 1)),
                    lambda pos: F.struct(
                        pos.alias("pos"),
                        (
                            F.element_at(p, (pos / k).cast("int") + 1)
                            * F.element_at(p, pos % k + 1)
                        ).alias("val"),
                    ),
                ),
                F.transform(
                    F.sequence(F.lit(k * k), F.lit(k * k + k - 1)),
                    lambda pos: F.struct(
                        pos.alias("pos"),
                        (
                            F.col("_r") * F.element_at(p, pos - k * k + 1)
                        ).alias("val"),
                    ),
                ),
            )
        ).alias("c"),
    )
    summed = contrib.groupBy("_e", F.col("c.pos").alias("pos")).agg(
        F.sum("c.val").alias("val")
    )
    assembled = summed.groupBy("_e").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "val"))),
            lambda s: s["val"],
        ).alias("ab")
    )

    out_schema = StructType(
        [
            StructField(solve_col, LongType()),
            StructField("factors", ArrayType(DoubleType())),
        ]
    )
    lam = float(reg)

    def solve(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, facs = [], []
            for e, ab in zip(pdf["_e"], pdf["ab"]):
                ab = np.asarray(ab, dtype=np.float64)
                A = ab[: k * k].reshape(k, k) + lam * np.eye(k)
                b = ab[k * k :]
                facs.append(np.linalg.solve(A, b).tolist())
                ids.append(int(e))
            yield pd.DataFrame({solve_col: ids, "factors": facs})

    return assembled.mapInPandas(solve, out_schema)


def als_train(
    ratings: DataFrame,
    user_col: str = "user_id",
    item_col: str = "item_id",
    rating_col: str = "rating",
    rank: int = 8,
    reg: float = 0.1,
    iterations: int = 3,
    seed: int = 7,
) -> tuple[DataFrame, DataFrame]:
    """Train ALS; returns (user_factors, item_factors), each
    ``(id, factors: array<double>)``, deterministically reproducible."""
    users = ratings.select(user_col).distinct()
    items = ratings.select(item_col).distinct()
    item_f = _init_factors(items, item_col, rank, seed).localCheckpoint()
    user_f = _init_factors(users, user_col, rank, seed + 1).localCheckpoint()
    for _ in range(iterations):
        user_f = _solve_side(
            ratings, item_f, user_col, item_col, rating_col, rank, reg
        ).localCheckpoint()
        item_f = _solve_side(
            ratings, user_f, item_col, user_col, rating_col, rank, reg
        ).localCheckpoint()
    return user_f, item_f


def als_rmse(
    ratings: DataFrame,
    user_f: DataFrame,
    item_f: DataFrame,
    user_col: str = "user_id",
    item_col: str = "item_id",
    rating_col: str = "rating",
) -> float:
    """Root-mean-square reconstruction error over observed entries —
    one join pipeline, dot product via ``zip_with``+``aggregate``
    (JVM-side), a single global aggregate out."""
    j = (
        ratings.join(
            user_f.withColumnRenamed("factors", "_u"), on=user_col
        )
        .join(item_f.withColumnRenamed("factors", "_i"), on=item_col)
    )
    pred = F.aggregate(
        F.zip_with("_u", "_i", lambda a, b: a * b), F.lit(0.0), lambda a, x: a + x
    )
    err = (F.col(rating_col) - pred)
    row = j.agg(F.sqrt(F.avg(err * err)).alias("rmse")).first()
    return float(row["rmse"])


def als_recommend(
    user_f: DataFrame,
    item_f: DataFrame,
    seen: DataFrame,
    user_col: str = "user_id",
    item_col: str = "item_id",
    k: int = 3,
) -> DataFrame:
    """Top-k unseen items per user by factor dot product.

    Scores users × items through a join; at full scale restrict the
    user side (batch of users to serve) or pre-bucket by an ANN
    index over item factors — the scoring math is the same. ``seen``
    pairs are anti-joined out BEFORE ranking so every recommendation
    is novel. Deterministic tie order (score desc, item id)."""
    from pyspark.sql import Window

    # Broadcast the item-factor side explicitly: it is k floats per
    # item (tiny next to the user side), and without the hint Spark
    # plans a CartesianProduct — a full shuffle-and-pair of both
    # sides — instead of BroadcastNestedLoopJoin.
    scored = (
        user_f.withColumnRenamed("factors", "_u")
        .crossJoin(F.broadcast(item_f.withColumnRenamed("factors", "_i")))
        .select(
            user_col,
            item_col,
            F.aggregate(
                F.zip_with("_u", "_i", lambda a, b: a * b),
                F.lit(0.0),
                lambda a, x: a + x,
            ).alias("score"),
        )
        .join(seen, [user_col, item_col], "left_anti")
    )
    w = Window.partitionBy(user_col).orderBy(
        F.col("score").desc(), F.col(item_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(user_col, item_col, F.round("score", 4).alias("score"), "rank")
    )
