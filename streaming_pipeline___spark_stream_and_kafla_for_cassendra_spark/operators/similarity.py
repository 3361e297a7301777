"""Similarity search over embedding columns (array<float>).

Two tiers:

* brute-force cosine top-k — exact baseline. The query set (small by
  construction) is broadcast as a numpy matrix; candidates stream
  through Arrow-batched ``mapInPandas`` and each batch is scored with
  one BLAS matmul — ~100× faster than per-element expression
  evaluation, and the big side never shuffles.
* random-hyperplane LSH top-k — the scale path. Deterministic seeded
  hyperplanes, sign-bit band buckets (one matmul per batch), band
  equi-join for candidates, exact cosine re-rank of candidates only.

At 100 TB of vectors the brute-force tier is only for small query
batches (its broadcast side must fit in executor memory — guarded);
the LSH tier bounds work to bucket-local comparisons.

All pandas closures are self-contained (no module-level references)
so cloudpickle ships them by value — Spark's Python workers may not
have this package on sys.path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# refuse to broadcast more than this many vectors (≈1 GB at 64 dims);
# past it, callers must use the LSH tier
MAX_BROADCAST_VECTORS = 2_000_000


def _as_double(col: Column) -> Column:
    return col.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Expression-level dot product (JVM HOFs). Fine for one-off pairs;
    use the mapInPandas paths for bulk scoring."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    ad, bd = _as_double(a), _as_double(b)
    return dot(ad, bd) / (norm(ad) * norm(bd))


def _broadcast_matrix(df: DataFrame, id_col: str, vec_col: str):
    """Collect a SMALL vector set into a broadcast (ids, unit-matrix).

    This is the same cost class as a broadcast-join build side; the
    guard keeps it from being misused on a big table.
    """
    import numpy as np

    n = df.count()
    if n > MAX_BROADCAST_VECTORS:
        raise ValueError(
            f"{n} vectors exceed the broadcast guard "
            f"({MAX_BROADCAST_VECTORS}); use the LSH tier"
        )
    rows = df.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-300)
    sc = df.sparkSession.sparkContext
    return sc.broadcast((ids, mat))


def brute_force_topk(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k for each query vector.

    Queries are broadcast; candidates are scored batch-at-a-time with
    one matmul per Arrow batch, and each batch emits only its LOCAL
    top-(k+1) per query (exact, ties broken by neighbor id — the +1
    survives self-match removal); the final window reduces the
    per-batch winners to the global top-k. The shuffle therefore
    carries #batches × #queries × (k+1) rows, never #candidates ×
    #queries — the map-side-combine shape that keeps a 100 TB corpus
    scan's shuffle k-sized. Returns (query_id, neighbor_id,
    cosine_sim, rank); self-matches excluded; ties broken by
    neighbor id.
    """
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    bvar = _broadcast_matrix(queries, id_col, vec_col)

    out_schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField("neighbor_id", LongType()),
            StructField("cosine_sim", DoubleType()),
        ]
    )

    def score(batches):
        import numpy as np
        import pandas as pd

        q_ids, q_mat = bvar.value  # (nq,), (nq, d) unit rows
        keep = k + 1  # +1 absorbs the later self-match removal
        for pdf in batches:
            if len(pdf) == 0:
                continue
            c_ids = pdf["_id"].to_numpy(dtype=np.int64)
            c_mat = np.stack(pdf["_vec"].to_numpy()).astype(np.float64)
            c_mat /= np.maximum(
                np.linalg.norm(c_mat, axis=1, keepdims=True), 1e-300
            )
            sims = c_mat @ q_mat.T  # (nc, nq)
            nc, nq = sims.shape
            take = min(keep, nc)
            qcol, ncol, scol = [], [], []
            for j in range(nq):
                s = sims[:, j]
                # exact local top-`take` under the GLOBAL order
                # (sim desc, id asc): lexsort's last key is primary,
                # so tied sims keep the lowest ids — identical-vector
                # duplicates cannot shuffle the boundary.
                idx = np.lexsort((c_ids, -s))[:take]
                qcol.append(np.full(take, q_ids[j], dtype=np.int64))
                ncol.append(c_ids[idx])
                scol.append(s[idx])
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(qcol),
                    "neighbor_id": np.concatenate(ncol),
                    "cosine_sim": np.concatenate(scol),
                }
            )

    scored = (
        candidates.select(
            F.col(id_col).alias("_id"), F.col(vec_col).alias("_vec")
        )
        .mapInPandas(score, out_schema)
        .filter(F.col("query_id") != F.col("neighbor_id"))
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


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine ≥ threshold (id_a < id_b).

    Exact self-comparison: one side broadcast as a unit matrix, the
    other streamed through mapInPandas with a matmul per Arrow batch;
    only pairs over the threshold are emitted, so the output (not the
    n² score matrix) is what flows on. For vector sets past the
    broadcast guard, block with :func:`lsh_topk`-style banding first.
    """
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    bvar = _broadcast_matrix(df, id_col, vec_col)
    thr = float(threshold)

    out_schema = StructType(
        [
            StructField("id_a", LongType()),
            StructField("id_b", LongType()),
            StructField("cosine_sim", DoubleType()),
        ]
    )

    def score(batches):
        import numpy as np
        import pandas as pd

        all_ids, all_mat = bvar.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            a_ids = pdf["_id"].to_numpy(dtype=np.int64)
            a_mat = np.stack(pdf["_vec"].to_numpy()).astype(np.float64)
            a_mat /= np.maximum(
                np.linalg.norm(a_mat, axis=1, keepdims=True), 1e-300
            )
            sims = a_mat @ all_mat.T  # (na, n)
            keep = (sims >= thr) & (a_ids[:, None] < all_ids[None, :])
            ai, bi = np.nonzero(keep)
            yield pd.DataFrame(
                {
                    "id_a": a_ids[ai],
                    "id_b": all_ids[bi],
                    "cosine_sim": sims[ai, bi],
                }
            )

    return (
        df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_vec"))
        .mapInPandas(score, out_schema)
        .select("id_a", "id_b", F.round("cosine_sim", 4).alias("cosine_sim"))
    )


def _band_signatures(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    n_bands: int,
    band_bits: int,
    seed: int,
) -> DataFrame:
    """(id, band, bucket) sign-bit LSH signatures — one matmul per
    Arrow batch against the seeded hyperplane matrix."""
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    n_planes, d, s = n_bands * band_bits, dim, seed
    nb, bb = n_bands, band_bits

    out_schema = StructType(
        [
            StructField("_sid", LongType()),
            StructField("band", IntegerType()),
            StructField("bucket", LongType()),
        ]
    )

    def sign_buckets(batches):
        import numpy as np
        import pandas as pd

        rng = np.random.default_rng(s)
        planes = rng.standard_normal((n_planes, d))
        weights = (1 << np.arange(bb, dtype=np.int64))
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf["_id"].to_numpy(dtype=np.int64)
            mat = np.stack(pdf["_vec"].to_numpy()).astype(np.float64)
            bits = (mat @ planes.T) > 0  # (n, n_planes)
            bits = bits.reshape(len(ids), nb, bb)
            buckets = (bits * weights[None, None, :]).sum(axis=2)  # (n, nb)
            yield pd.DataFrame(
                {
                    "_sid": np.repeat(ids, nb),
                    "band": np.tile(np.arange(nb, dtype=np.int32), len(ids)),
                    "bucket": buckets.ravel(),
                }
            )

    return df.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_vec")
    ).mapInPandas(sign_buckets, out_schema)


def cosine_pairs_pandas(a_vec: str, b_vec: str) -> Column:
    """Vectorized exact cosine for already-joined pair rows."""
    from pyspark.sql.types import DoubleType

    @F.pandas_udf(DoubleType())
    def _cos(a, b):
        import numpy as np
        import pandas as pd

        am = np.stack(a.to_numpy()).astype(np.float64)
        bm = np.stack(b.to_numpy()).astype(np.float64)
        num = (am * bm).sum(axis=1)
        den = np.linalg.norm(am, axis=1) * np.linalg.norm(bm, axis=1)
        return pd.Series(num / np.maximum(den, 1e-300))

    return _cos(F.col(a_vec), F.col(b_vec))


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
    ``n_bands`` sign-bit buckets: the bucket match is an equi-join
    Catalyst shuffles by (band, bucket) — never a cross product.
    Candidate pairs (small) are re-ranked with a vectorized pandas
    cosine. Recall is tunable via bands × bits.
    """
    qs = _band_signatures(queries, id_col, vec_col, dim, n_bands, band_bits, seed)
    cs = _band_signatures(candidates, id_col, vec_col, dim, n_bands, band_bits, seed)

    cand_pairs = (
        qs.withColumnRenamed("_sid", "query_id")
        .join(cs.withColumnRenamed("_sid", "neighbor_id"), on=["band", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    q_vecs = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("_qv")
    )
    c_vecs = candidates.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("_cv"),
    )
    rescored = (
        cand_pairs.join(F.broadcast(q_vecs), on="query_id")
        .join(c_vecs, on="neighbor_id")
        .withColumn("cosine_sim", cosine_pairs_pandas("_qv", "_cv"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cosine_sim", 4).alias("cosine_sim"),
            "rank",
        )
    )


def _train_spherical_quantizer(
    candidates: DataFrame,
    vec_col: str,
    n_lists: int,
    train_sample: int,
    seed: int,
    id_col: str = "vec_id",
):
    """Spherical k-means on a bounded sample (driver numpy — the only
    driver-side work in the IVF family). Returns the unit-norm
    centroid matrix.

    FULLY REPLAYABLE (round 4): the sample is the ``train_sample``
    LOWEST ids (an unordered ``limit`` depends on partition order —
    nondeterministic on a real cluster) and the init is the first
    ``n_lists`` sample rows rather than a seeded ``rng.choice`` draw
    (whose indices depend on the runtime sample size, so no static
    oracle could embed them). Ten fixed Lloyd iterations; ``np.argmax``
    breaks assignment ties toward the lower centroid id. ``seed`` is
    kept for API stability but no longer used."""
    import numpy as np

    sample = [
        r[1]
        for r in candidates.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(train_sample)
        .collect()
    ]
    train = np.asarray(sample, dtype=np.float64)
    train /= np.maximum(np.linalg.norm(train, axis=1, keepdims=True), 1e-300)
    n_lists = min(n_lists, len(train))
    cent = train[:n_lists].copy()
    for _ in range(10):  # fixed Lloyd iterations, deterministic
        assign = np.argmax(train @ cent.T, axis=1)
        for j in range(n_lists):
            members = train[assign == j]
            if len(members):
                c = members.sum(axis=0)
                cent[j] = c / max(np.linalg.norm(c), 1e-300)
    return cent


def semantic_dedup(
    candidates: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.92,
    n_lists: int = 16,
    train_sample: int = 4096,
    seed: int = 42,
) -> DataFrame:
    """SemDeDup-style semantic deduplication over an embedding column.

    1. the corpus is partitioned by the IVF coarse quantizer (shared
       :func:`_train_spherical_quantizer` — spherical k-means lists);
    2. within each list, ids are visited ASCENDING and a vector is
       dropped iff its cosine to an already-KEPT vector reaches
       ``threshold`` — the greedy ε-net rule, deterministic because
       the visit order is the id order, vectorized as one list-local
       matmul per Arrow group.

    Returns (id, list_id, keep, dup_of) where ``dup_of`` is the kept
    representative that absorbed a dropped row (null for keepers).

    Scale notes: candidate pairs exist only WITHIN a quantizer list
    (the SemDeDup observation: semantic duplicates collide in
    embedding-cluster space), so the O(m²) similarity check is
    per-list, executor-local BLAS, never a corpus cross-join; the
    shuffle carries each vector once, keyed by list. Near-boundary
    pairs split across lists are the (documented) recall loss —
    tighten with more Lloyd iterations or multi-probe assignment.
    """
    import numpy as np
    from pyspark.sql.types import (
        ArrayType,
        BooleanType,
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    cent = _train_spherical_quantizer(
        candidates, vec_col, n_lists, train_sample, seed
    )
    b_cent = candidates.sparkSession.sparkContext.broadcast(cent)
    thr = float(threshold)

    assigned_schema = StructType(
        [
            StructField("list_id", LongType()),
            StructField("_id", LongType()),
            StructField("_vec", ArrayType(DoubleType())),
        ]
    )

    def assign_lists(batches):
        import numpy as np
        import pandas as pd

        C = b_cent.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack(pdf["_vec"].to_numpy()).astype(np.float64)
            mat /= np.maximum(
                np.linalg.norm(mat, axis=1, keepdims=True), 1e-300
            )
            yield pd.DataFrame(
                {
                    "list_id": np.argmax(mat @ C.T, axis=1).astype(np.int64),
                    "_id": pdf["_id"].to_numpy(dtype=np.int64),
                    "_vec": list(mat),
                }
            )

    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("list_id", LongType()),
            StructField("keep", BooleanType()),
            StructField("dup_of", LongType()),
        ]
    )

    def dedup_list(pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values("_id").reset_index(drop=True)
        mat = np.stack(pdf["_vec"].to_numpy())
        sims = mat @ mat.T
        m = len(pdf)
        keep = np.ones(m, dtype=bool)
        dup_of = np.full(m, -1, dtype=np.int64)
        kept: list[int] = []
        for i in range(m):
            if kept:
                s = sims[i, kept]
                j = int(np.argmax(s))
                if s[j] >= thr:
                    keep[i] = False
                    dup_of[i] = kept[j]
                    continue
            kept.append(i)
        ids = pdf["_id"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                id_col: ids,
                "list_id": pdf["list_id"].to_numpy(dtype=np.int64),
                "keep": keep,
                "dup_of": pd.array(
                    [int(ids[d]) if d >= 0 else None for d in dup_of],
                    dtype="Int64",
                ),
            }
        )

    assigned = (
        candidates.select(
            F.col(id_col).cast("long").alias("_id"),
            _as_double(F.col(vec_col)).alias("_vec"),
        )
        .mapInPandas(assign_lists, schema=assigned_schema)
    )
    return assigned.groupBy("list_id").applyInPandas(dedup_list, out_schema)


def ivf_topk(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_sample: int = 4096,
    seed: int = 42,
) -> DataFrame:
    """IVF (inverted-file) approximate cosine top-k — the second
    scale path beside sign-LSH.

    1. a bounded sample trains a spherical k-means coarse quantizer
       (deterministic seeded Lloyd iterations, driver-side numpy on
       ≤``train_sample`` vectors — the only driver work);
    2. centroids broadcast; candidates map to their nearest-centroid
       list, queries to their ``n_probe`` nearest lists (one matmul
       per Arrow batch each);
    3. a cogroup on list id runs one BLAS matmul per (list, query
       probe) group and emits only the per-list top-k — the shuffle
       carries (list_id, id, vec) once per side and the final global
       window sees ≤ queries × n_probe × k rows, never the full
       bucket cross-product.

    At 100 TB: lists partition the corpus ~uniformly (k-means on the
    unit sphere), per-list matmuls are executor-local, and recall is
    tunable with ``n_probe`` without re-indexing.
    """
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    # --- 1. train the coarse quantizer on a bounded sample ---------
    cent = _train_spherical_quantizer(
        candidates, vec_col, n_lists, train_sample, seed
    )
    n_lists = len(cent)
    b_cent = candidates.sparkSession.sparkContext.broadcast(cent)
    n_probe = min(n_probe, n_lists)

    side_schema = StructType(
        [
            StructField("list_id", LongType()),
            StructField("_id", LongType()),
            StructField("_vec", ArrayType(DoubleType())),
        ]
    )

    def make_assigner(probes: int):
        def assign_lists(batches):
            import numpy as np
            import pandas as pd

            C = b_cent.value
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                mat = np.stack(pdf["_vec"].to_numpy()).astype(np.float64)
                mat /= np.maximum(
                    np.linalg.norm(mat, axis=1, keepdims=True), 1e-300
                )
                sims = mat @ C.T  # (n, n_lists)
                if probes == 1:
                    lists = np.argmax(sims, axis=1)[:, None]
                else:
                    lists = np.argpartition(-sims, probes - 1, axis=1)[
                        :, :probes
                    ]
                n = len(pdf)
                yield pd.DataFrame(
                    {
                        "list_id": lists.ravel().astype(np.int64),
                        "_id": np.repeat(
                            pdf["_id"].to_numpy(dtype=np.int64), probes
                        ),
                        "_vec": [
                            row
                            for row in np.repeat(
                                mat, probes, axis=0
                            ).tolist()
                        ],
                    }
                )

        return assign_lists

    cand_side = candidates.select(
        F.col(id_col).alias("_id"), _as_double(F.col(vec_col)).alias("_vec")
    ).mapInPandas(make_assigner(1), side_schema)
    query_side = queries.select(
        F.col(id_col).alias("_id"), _as_double(F.col(vec_col)).alias("_vec")
    ).mapInPandas(make_assigner(n_probe), side_schema)

    out_schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField("neighbor_id", LongType()),
            StructField("cosine_sim", DoubleType()),
        ]
    )
    per_list_k = k

    def per_list_topk(cand_pdf, query_pdf):
        import numpy as np
        import pandas as pd

        if len(cand_pdf) == 0 or len(query_pdf) == 0:
            return pd.DataFrame(
                {"query_id": [], "neighbor_id": [], "cosine_sim": []}
            )
        c_ids = cand_pdf["_id"].to_numpy(dtype=np.int64)
        c_mat = np.stack(cand_pdf["_vec"].to_numpy())  # already unit
        q_ids = query_pdf["_id"].to_numpy(dtype=np.int64)
        q_mat = np.stack(query_pdf["_vec"].to_numpy())
        sims = c_mat @ q_mat.T  # (nc, nq)
        out_q, out_n, out_s = [], [], []
        kk = min(per_list_k + 1, len(c_ids))  # +1 absorbs self-match
        for qi in range(len(q_ids)):
            col = sims[:, qi]
            top = np.argpartition(-col, kk - 1)[:kk]
            for ci in top:
                if c_ids[ci] == q_ids[qi]:
                    continue
                out_q.append(q_ids[qi])
                out_n.append(c_ids[ci])
                out_s.append(float(col[ci]))
        return pd.DataFrame(
            {"query_id": out_q, "neighbor_id": out_n, "cosine_sim": out_s}
        )

    scored = (
        cand_side.groupBy("list_id")
        .cogroup(query_side.groupBy("list_id"))
        .applyInPandas(per_list_topk, out_schema)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    # no dedup needed: each candidate lives in exactly one list, so a
    # (query, neighbor) pair can only arise once across probes
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


def quantize_int8(
    df: DataFrame,
    vec_col: str = "embedding",
    qvec_col: str = "qvec",
    scale_col: str = "qscale",
    keep_norm_col: str | None = None,
) -> DataFrame:
    """Symmetric per-vector int8 quantization of unit-normalized
    embeddings — the memory/bandwidth scale path for vector search.

    Each vector is L2-normalized, then mapped to ``round(x/scale)``
    with ``scale = max|x|/127``: 1 byte per dimension instead of 4–8,
    so a 100 TB float corpus shrinks ~4–8× before it ever shuffles or
    broadcasts, and int8 GEMM scores it. Entirely JVM-side codegen
    (array HOFs) — no Python in the quantization scan. Rounding is
    ``floor(x/scale + 0.5)`` (half-up), which evaluates identically
    on any IEEE engine, so the DuckDB oracle reproduces the codes
    bit-for-bit.

    Adds ``qvec_col`` (array<tinyint>) and ``scale_col`` (double);
    dot(q_a, q_b) * scale_a * scale_b ≈ cosine(a, b) with error
    bounded by the quantization step (≤ 1/254 per axis).
    """
    # One fold computes BOTH per-row scalars (Σx² and max|x|) as a
    # struct. The naive chain (alias _nrm → transform(_unit) → …)
    # gets project-collapsed by Catalyst, and a non-trivial alias
    # referenced inside an HOF lambda is re-evaluated PER ELEMENT:
    # the O(d) norm fold inlined into a d-element lambda is O(d²)
    # per row — measured 24 s at sf1 (20.6× sf0.1) for what is a
    # linear scan. The struct alias is referenced multiple times
    # below, so CollapseProject keeps its projection boundary and
    # every scalar is computed once per row; the lambdas only touch
    # row-level fields. max|x|/nrm ≡ max|x/nrm| (IEEE division is
    # monotone and exact under abs), and codes keep the exact
    # (e / nrm) / scale operand order, so the DuckDB twin that
    # replays the unit-vector formulation still matches bit-for-bit.
    xd = F.col(vec_col).cast("array<double>")
    stats = F.aggregate(
        xd,
        F.struct(F.lit(0.0).alias("ss"), F.lit(0.0).alias("ma")),
        lambda acc, x: F.struct(
            (acc.ss + x * x).alias("ss"),
            F.greatest(acc.ma, F.abs(x)).alias("ma"),
        ),
    )
    return (
        df.withColumn("_qst", stats)
        .withColumn(
            "_nrm",
            F.greatest(F.sqrt(F.col("_qst.ss")), F.lit(1e-300)),
        )
        .withColumn(
            scale_col,
            F.greatest(
                F.col("_qst.ma") / F.col("_nrm") / F.lit(127.0),
                F.lit(1e-30),
            ),
        )
        .withColumn(
            qvec_col,
            F.transform(
                xd,
                lambda x: F.floor(
                    x / F.col("_nrm") / F.col(scale_col) + F.lit(0.5)
                ).cast("tinyint"),
            ),
        )
        .withColumnsRenamed(
            {"_nrm": keep_norm_col} if keep_norm_col else {}
        )
        .drop("_qst", *([] if keep_norm_col else ["_nrm"]))
    )


def quantized_topk(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k over int8-quantized vectors.

    Same shape as :func:`brute_force_topk` — queries broadcast,
    candidates streamed through one matmul per Arrow batch — but both
    sides carry 1-byte codes: the broadcast is 4–8× smaller (the
    guard therefore admits 4–8× more queries) and scan I/O drops
    4–8× when candidates are scored from STORED codes — pass a
    DataFrame that already has ``qvec``/``qscale`` columns (the
    :func:`quantize_int8` output persisted at ingest) and the float
    vectors are never read at all. Without those columns, candidates
    are quantized on the fly (one-time cost a real deployment pays at
    ingest, not per query). Scores are rescaled per-pair with the two
    quantization scales; ranking error vs exact cosine is bounded by
    the per-axis step and asserted (recall) in tests.
    """
    import numpy as np

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    q = quantize_int8(queries, vec_col=vec_col)
    n = q.count()
    if n > MAX_BROADCAST_VECTORS * 4:
        raise ValueError(
            f"{n} query vectors exceed the int8 broadcast guard; "
            "block with lsh_topk/ivf_topk first"
        )
    rows = q.select(id_col, "qvec", "qscale").collect()
    q_ids = np.array([r[0] for r in rows], dtype=np.int64)
    q_mat = np.array([r[1] for r in rows], dtype=np.int8)
    q_scale = np.array([r[2] for r in rows], dtype=np.float64)
    bvar = candidates.sparkSession.sparkContext.broadcast(
        (q_ids, q_mat, q_scale)
    )

    out_schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField("neighbor_id", LongType()),
            StructField("cosine_sim", DoubleType()),
        ]
    )

    def score(batches):
        import numpy as np
        import pandas as pd

        ids_q, mat_q, sc_q = bvar.value  # (nq,), (nq, d) int8, (nq,)
        # codes are ints ≤127; a 64-dim dot is ≤ 64·127² < 2^24, exact
        # in float32 — so sgemm (BLAS) computes the integer dot
        # bit-exactly while numpy's integer matmul (no BLAS path)
        # would be ~10× slower
        mat_qf = mat_q.astype(np.float32)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            c_ids = pdf["_id"].to_numpy(dtype=np.int64)
            c_mat = np.stack(pdf["_q"].to_numpy()).astype(np.float32)
            c_scale = pdf["_s"].to_numpy(dtype=np.float64)
            dots = (c_mat @ mat_qf.T).astype(np.float64)  # exact ints
            sims = dots * (c_scale[:, None] * sc_q[None, :])
            nc, nq = sims.shape
            # local exact top-(k+1) per query under the global order
            # (sim desc, id asc) — the shuffle carries #batches × nq ×
            # (k+1) rows, not nc × nq (see brute_force_topk)
            take = min(k + 1, nc)
            qcol, ncol, scol = [], [], []
            for j in range(nq):
                s = sims[:, j]
                idx = np.lexsort((c_ids, -s))[:take]
                qcol.append(np.full(take, ids_q[j], dtype=np.int64))
                ncol.append(c_ids[idx])
                scol.append(s[idx])
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(qcol),
                    "neighbor_id": np.concatenate(ncol),
                    "cosine_sim": np.concatenate(scol),
                }
            )

    cand_q = (
        candidates
        if "qvec" in candidates.columns and "qscale" in candidates.columns
        else quantize_int8(candidates, vec_col=vec_col)
    )
    scored = (
        cand_q
        .select(
            F.col(id_col).alias("_id"),
            F.col("qvec").alias("_q"),
            F.col("qscale").alias("_s"),
        )
        .mapInPandas(score, out_schema)
        .filter(F.col("query_id") != F.col("neighbor_id"))
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
        .select(
            "label", F.col("pos").cast("int").alias("pos"), "n_vectors", "centroid_val"
        )
    )


def pq_topk(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 8,
    n_codes: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_sample: int = 4096,
    seed: int = 42,
    rerank_factor: int = 4,
) -> DataFrame:
    """Product-quantization cosine top-k (FAISS-style ADC + re-rank)
    — the compression scale path beside LSH / IVF / int8.

    1. a bounded driver-side sample trains ``m`` independent
       sub-space codebooks (``n_codes`` centroids each, seeded Lloyd
       iterations on dim/m-sized slices of unit vectors);
    2. candidates encode to ``m`` uint8 codes per vector — m bytes
       instead of 8·dim, a dim·8/m× compression (64× at dim=64, m=8),
       which is what lets a 100 TB float corpus fit a per-executor
       page of codes;
    3. scoring is ASYMMETRIC (ADC): queries stay exact; each Arrow
       batch builds per-query lookup tables (query-subvector ·
       codebook, m×n_codes dots) and scores every candidate with m
       table lookups + adds — no decompression, no float matmul over
       the corpus;
    4. the classic PQ deployment re-rank: the GLOBAL ADC shortlist —
       top ``rerank_factor``·k per query under the total order
       (adc desc, id asc) — is re-scored with exact dots, so reported
       similarities are EXACT cosine and in-cluster orderings survive
       quantization noise. Each batch emits only its local top-S
       under the SAME total order (a safe prefilter of the global
       cut), keeping the shuffle S-sized per query per batch AND
       making the output a pure function of the data — independent
       of Arrow batch boundaries, hence exactly oracle-able
       (round 4; it previously cut the shortlist per batch).

    Recall is tunable with ``m``/``n_codes``/``rerank_factor``
    without touching the scan. Training follows the REPLAYABLE
    recipe (lowest-id sample, first-n_codes init, 10 fixed Lloyd
    rounds); ``seed`` kept for API stability, unused.
    """
    import numpy as np

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    sample = [
        r[1]
        for r in candidates.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(train_sample)
        .collect()
    ]
    train = np.asarray(sample, dtype=np.float64)
    train /= np.maximum(np.linalg.norm(train, axis=1, keepdims=True), 1e-300)
    dim = train.shape[1]
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    n_codes = min(n_codes, len(train))
    books = np.empty((m, n_codes, dsub), dtype=np.float64)
    for j in range(m):
        # REPLAYABLE training recipe (see _train_spherical_quantizer):
        # lowest-id sample, first-n_codes init, 10 fixed Lloyd rounds
        sub = train[:, j * dsub : (j + 1) * dsub]
        cent = sub[:n_codes].copy()
        for _ in range(10):  # fixed Lloyd iterations, deterministic
            d2 = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(n_codes):
                members = sub[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        books[j] = cent
    b_books = candidates.sparkSession.sparkContext.broadcast(books)
    b_queries = _broadcast_matrix(queries, id_col, vec_col)

    out_schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField("neighbor_id", LongType()),
            StructField("cosine_sim", DoubleType()),
        ]
    )

    shortlist_size = rerank_factor * k

    def score(batches):
        import numpy as np
        import pandas as pd

        B = b_books.value  # (m, n_codes, dsub)
        q_ids, q_mat = b_queries.value  # (nq,), (nq, dim) unit rows
        mm, nc_, ds = B.shape
        # per-query ADC tables: T[qi, j, c] = q_sub · codebook entry
        tables = np.einsum("qjd,jcd->qjc", q_mat.reshape(len(q_ids), mm, ds), B)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            c_ids = pdf["_id"].to_numpy(dtype=np.int64)
            c_mat = np.stack(pdf["_vec"].to_numpy()).astype(np.float64)
            c_mat /= np.maximum(
                np.linalg.norm(c_mat, axis=1, keepdims=True), 1e-300
            )
            # encode: nearest codebook entry per subspace
            codes = np.empty((len(c_ids), mm), dtype=np.int64)
            for j in range(mm):
                sub = c_mat[:, j * ds : (j + 1) * ds]
                d2 = ((sub[:, None, :] - B[j][None, :, :]) ** 2).sum(axis=2)
                codes[:, j] = np.argmin(d2, axis=1)
            # ADC: sims[i, qi] = sum_j tables[qi, j, codes[i, j]]
            nc = len(c_ids)
            sims = np.zeros((nc, len(q_ids)), dtype=np.float64)
            for j in range(mm):
                sims += tables[:, j, codes[:, j]].T  # (nc, nq)
            qcol, ncol, acol, ecol = [], [], [], []
            for qi in range(len(q_ids)):
                mask = c_ids != q_ids[qi]
                s = sims[mask, qi]
                ids_m = c_ids[mask]
                # batch-local ADC top-S under the SAME total order
                # (adc desc, id asc) the global cut uses — a safe
                # prefilter, so the final result is a pure function
                # of the data, independent of Arrow batch boundaries
                take = min(shortlist_size, len(ids_m))
                idx = np.lexsort((ids_m, -s))[:take]
                exact = c_mat[mask][idx] @ q_mat[qi]
                qcol.append(np.full(take, q_ids[qi], dtype=np.int64))
                ncol.append(ids_m[idx])
                acol.append(s[idx])
                ecol.append(exact)
            if qcol:
                yield pd.DataFrame(
                    {
                        "query_id": np.concatenate(qcol),
                        "neighbor_id": np.concatenate(ncol),
                        "adc_sim": np.concatenate(acol),
                        "cosine_sim": np.concatenate(ecol),
                    }
                )

    from pyspark.sql.types import DoubleType as _D

    out_schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField("neighbor_id", LongType()),
            StructField("adc_sim", _D()),
            StructField("cosine_sim", _D()),
        ]
    )
    scored = candidates.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_vec")
    ).mapInPandas(score, out_schema)
    # global ADC shortlist (total order: adc desc, id asc), THEN the
    # exact re-rank — deterministic two-stage, batch-independent
    w_adc = Window.partitionBy("query_id").orderBy(
        F.col("adc_sim").desc(), F.col("neighbor_id").asc()
    )
    scored = (
        scored.withColumn("_adc_rn", F.row_number().over(w_adc))
        .filter(F.col("_adc_rn") <= shortlist_size)
        .drop("_adc_rn", "adc_sim")
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


def kmeans_assign(
    candidates: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    train_sample: int = 2000,
    seed: int = 13,
) -> DataFrame:
    """Spherical k-means clustering exposed as a first-class operator
    (the same coarse quantizer the IVF index and SemDeDup use):
    centroids train on a bounded sample driver-side (deterministic
    seeded Lloyd), broadcast, and every vector is assigned to its
    nearest centroid in one Arrow pass — no shuffle at all; the
    assignment is a scan-local map at any corpus size.

    Returns (id, cluster_id, centroid_sim). Downstream: cluster-size
    audits, per-cluster sampling, IVF list construction, semantic
    dedup grouping.
    """
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    cent = _train_spherical_quantizer(candidates, vec_col, n_clusters, train_sample, seed)
    b_cent = candidates.sparkSession.sparkContext.broadcast(cent)
    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("cluster_id", LongType()),
            StructField("centroid_sim", DoubleType()),
        ]
    )

    def assign(batches):
        import numpy as np
        import pandas as pd

        C = b_cent.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-300)
            sims = mat @ C.T
            best = np.argmax(sims, axis=1)
            top = sims[np.arange(len(pdf)), best]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "cluster_id": best.astype("int64"),
                    # floor(x*1e6+0.5)/1e6 — the same formula the
                    # DuckDB twin applies, so 6-dp values hash-match
                    "centroid_sim": np.floor(top * 1e6 + 0.5) / 1e6,
                }
            )

    # No spread (r9 interleaved A/B): the broadcast-centroid matmul is
    # microseconds per batch at the embeddings fixture's row counts,
    # so the round-robin pre-exchange only added shuffle + 32 Python
    # task spin-ups (kmeans_embedding_clusters 0.67 s without vs
    # 1.12 s with). On any real wide scan the assignment is already
    # parallel — the exchange bought nothing at either scale.
    return candidates.select(id_col, vec_col).mapInPandas(assign, schema)


def hard_negatives(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining for contrastive/retrieval training: for
    each query, the top-k most-similar candidates with a DIFFERENT
    label — the near-misses that teach an encoder the boundary.

    Same scale shape as :func:`brute_force_topk` (queries broadcast
    with their labels, candidates streamed batch-at-a-time, per-batch
    local top-k so the shuffle stays k-sized), but the similarity
    matrix is masked where labels match BEFORE the local top-k — a
    per-query predicate no candidate pre-filter can express.

    ``id_col`` must be integral (the engine-wide int64-id contract).
    ``label_col`` may be any type: non-integral labels are mapped to
    int64 via ``xxhash64`` on BOTH sides before the equality mask —
    exact for equal labels; a cross-label hash collision (~2^-64)
    would merely mask one extra candidate.
    """
    import numpy as np

    from pyspark.sql.types import (
        ByteType,
        DoubleType,
        IntegerType,
        LongType,
        ShortType,
        StructField,
        StructType,
    )

    _integral = (ByteType, ShortType, IntegerType, LongType)
    hash_labels = not (
        isinstance(candidates.schema[label_col].dataType, _integral)
        and isinstance(queries.schema[label_col].dataType, _integral)
    )
    lab_expr = (
        F.xxhash64(F.col(label_col)) if hash_labels else F.col(label_col)
    )

    n = queries.count()
    if n > MAX_BROADCAST_VECTORS:
        raise ValueError(
            f"{n} query vectors exceed the broadcast guard "
            f"({MAX_BROADCAST_VECTORS}); shard the query set"
        )
    rows = queries.select(
        F.col(id_col), F.col(vec_col), lab_expr.alias(label_col)
    ).collect()
    q_ids = np.array([r[0] for r in rows], dtype=np.int64)
    q_mat = np.array([r[1] for r in rows], dtype=np.float64)
    q_mat /= np.maximum(np.linalg.norm(q_mat, axis=1, keepdims=True), 1e-300)
    q_lab = np.array([r[2] for r in rows], dtype=np.int64)
    bvar = queries.sparkSession.sparkContext.broadcast((q_ids, q_mat, q_lab))

    out_schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField("neighbor_id", LongType()),
            StructField("cosine_sim", DoubleType()),
        ]
    )
    keep = k  # no self-match risk: same-label (incl. self) is masked

    def score(batches):
        import numpy as np
        import pandas as pd

        q_ids, q_mat, q_lab = bvar.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            c_ids = pdf["_id"].to_numpy(dtype=np.int64)
            c_lab = pdf["_lab"].to_numpy(dtype=np.int64)
            c_mat = np.stack(pdf["_vec"].to_numpy()).astype(np.float64)
            c_mat /= np.maximum(
                np.linalg.norm(c_mat, axis=1, keepdims=True), 1e-300
            )
            sims = c_mat @ q_mat.T  # (nc, nq)
            sims[c_lab[:, None] == q_lab[None, :]] = -np.inf
            nc, nq = sims.shape
            take = min(keep, nc)
            qcol, ncol, scol = [], [], []
            for j in range(nq):
                s = sims[:, j]
                idx = np.lexsort((c_ids, -s))[:take]
                idx = idx[np.isfinite(s[idx])]
                if not len(idx):
                    continue
                qcol.append(np.full(len(idx), q_ids[j], dtype=np.int64))
                ncol.append(c_ids[idx])
                scol.append(s[idx])
            if not qcol:
                continue
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(qcol),
                    "neighbor_id": np.concatenate(ncol),
                    "cosine_sim": np.concatenate(scol),
                }
            )

    scored = candidates.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_vec"),
        lab_expr.alias("_lab"),
    ).mapInPandas(score, out_schema)
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


def mmr_select(
    df: DataFrame,
    k: int = 5,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    group_col: str = "label",
) -> DataFrame:
    """Maximal-Marginal-Relevance diverse selection per group: greedily
    pick ``k`` representatives maximizing ``lam·relevance −
    (1−lam)·max-sim-to-already-selected``, where relevance is cosine
    to the group centroid. The data-selection primitive for building
    small-but-diverse eval/finetune pools from a large corpus.

    Deterministic: ties break on ascending id; the greedy recurrence
    is sequential per group, so it runs as one grouped
    ``applyInPandas`` pass (one shuffle on the group key; group pools
    must fit an Arrow batch — pre-filter to a bounded candidate pool
    per group, e.g. top-N by quality, before calling).

    ``group_col`` may be ANY type — grouping uses the column as-is
    and the output ``group`` column keeps its input dataType (a
    string category stays a string; no silent cast-to-NULL collapse).
    ``id_col`` must be integral (int64 ids are the engine-wide
    contract for vector tables).
    """
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("group", df.schema[group_col].dataType),
            StructField(id_col, LongType()),
            StructField("pick_rank", IntegerType()),
            StructField("mmr_score", DoubleType()),
        ]
    )
    kk, ll = int(k), float(lam)
    idc, vcc = id_col, vec_col

    def pick(pdf):
        import numpy as np
        import pandas as pd

        ids = pdf[idc].to_numpy(dtype=np.int64)
        order = np.argsort(ids)  # id-order: deterministic regardless of arrival
        ids = ids[order]
        mat = np.stack(pdf[vcc].to_numpy()).astype(np.float64)[order]
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-300)
        cent = mat.mean(axis=0)
        cent /= max(np.linalg.norm(cent), 1e-300)
        rel = mat @ cent
        sims = mat @ mat.T
        g = pdf["_grp"].iloc[0]  # passed through at its input type
        selected: list[int] = []
        scores: list[float] = []
        max_to_sel = np.full(len(ids), -np.inf)
        for _ in range(min(kk, len(ids))):
            if selected:
                mmr = ll * rel - (1.0 - ll) * max_to_sel
            else:
                mmr = ll * rel
            mmr[selected] = -np.inf
            # argmax with ascending-id tie-break: stable argmax on
            # id-sorted arrays is exactly that
            best = int(np.argmax(np.round(mmr, 12)))
            selected.append(best)
            scores.append(float(mmr[best]))
            max_to_sel = np.maximum(max_to_sel, sims[:, best])
        return pd.DataFrame(
            {
                "group": pd.Series([g] * len(selected)),
                idc: ids[selected],
                "pick_rank": np.arange(1, len(selected) + 1, dtype=np.int32),
                "mmr_score": scores,
            }
        )

    return (
        df.select(
            F.col(group_col).alias("_grp"),
            F.col(id_col),
            F.col(vec_col),
        )
        .groupBy("_grp")
        .applyInPandas(pick, out_schema)
    )
