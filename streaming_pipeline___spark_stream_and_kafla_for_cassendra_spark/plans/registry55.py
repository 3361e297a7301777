"""Round-4 registry additions, batch 42 — approximation-quality
gates for the remaining sketch/blocking tiers.

Same contract as ``registry.py``. Imported at the bottom of
``registry.py``.

Driver-visible floors in the ``registry54`` style (Spark computes
the quality invariant, the DuckDB oracle pins the SQL-derivable
counts plus TRUE booleans). Besides the three below, the file also
carries ``ann_ivf_indexed_recall_floor`` (recall@5 of the PERSISTENT
partition-pruned IVF index vs brute force ≥ 0.5 — covers the frozen-
quantizer layout and pruned-read path the in-memory ivf floor
cannot) and ``phash_determinism_gate`` (pHash re-hashed under
shifted ids + different repartition must agree hash-for-hash —
catches batch-boundary/carry-state bugs in the Arrow pipeline):

* ``approx_quantile_rank_floor`` — Spark's ``percentile_approx``
  (Greenwald-Khanna style sketch, the 100 TB percentile path: one
  mergeable sketch per partition instead of a global sort) carries a
  rank-error guarantee of n/accuracy; the gate recomputes each
  estimate's TRUE rank interval against the exact data and asserts
  the guarantee holds at p50/p90/p99.
* ``lsh_blocking_quality`` — the MinHash-LSH blocker
  (``banded_signatures``: 16 bands x 4 rows, seeded) is graded
  against the EXACT 3-gram-Jaccard truth: pair completeness (share
  of true >=0.7 pairs surfaced as candidates; theory
  1-(1-j^4)^16 >= 0.988 at j=0.7) and reduction ratio (share of the
  n(n-1)/2 pair space pruned). The production dedup argument —
  "LSH first, exact verify survivors" — as one checked row.
* ``hll_type_error_bound`` — companion gate for the rows-only
  ``sketch_distinct_users_by_type``: per-type DataSketches HLL
  estimates and the union-merged total must sit within the lgK=12
  relative-error envelope of the exact distinct counts, both
  computed in-Spark.

Floors measured on the sf0.001/sf0.01 fixtures this round; see each
description.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import _register, _t


@_register(
    "approx_quantile_rank_floor",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(10000 AS INTEGER) AS accuracy,
           CAST(3 AS INTEGER) AS n_percentiles,
           TRUE AS rank_bound_met
    FROM lineitem
    """,
    "Driver-visible guarantee check for the sketch percentile path "
    "(percentile_approx, the mergeable per-partition alternative to "
    "a global sort at 100 TB): estimates at p50/p90/p99 of "
    "l_extendedprice with accuracy=10000 must each have true rank "
    "within n/accuracy (+1 tie slack) of the target rank p*n — the "
    "Greenwald-Khanna bound the operator advertises. The check "
    "joins the three estimates back against the exact column "
    "(count < est, count <= est) in one conditional aggregate; a "
    "sketch regression lands an estimate outside its rank interval "
    "and flips the boolean. Oracle pins n + TRUE (the sketch "
    "internals are engine-specific; the BOUND is the contract)",
    ("sketch", "percentile", "evaluation", "lineitem"),
)
def approx_quantile_rank_floor(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    ps = [0.5, 0.9, 0.99]
    est = li.agg(
        F.percentile_approx(
            "l_extendedprice", ps, 10000
        ).alias("est"),
        F.count("*").alias("n"),
    ).collect()[0]
    n, ests = est["n"], est["est"]
    slack = n / 10000.0 + 1.0
    checks = []
    for p, e in zip(ps, ests):
        lo = F.sum((F.col("l_extendedprice") < F.lit(e)).cast("long"))
        hi = F.sum((F.col("l_extendedprice") <= F.lit(e)).cast("long"))
        # true rank interval [lo+1, hi] must intersect
        # [p*n - slack, p*n + slack]
        checks.append(
            (lo + 1 <= F.lit(p * n + slack))
            & (hi >= F.lit(p * n - slack))
        )
    met = checks[0] & checks[1] & checks[2]
    return li.agg(
        F.count("*").cast("long").alias("n_rows"),
        F.lit(10000).cast("int").alias("accuracy"),
        F.lit(3).cast("int").alias("n_percentiles"),
        met.alias("rank_bound_met"),
    )


@_register(
    "lsh_blocking_quality",
    """
    WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS w
                  FROM documents),
    grams AS (
      SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
      FROM (SELECT doc_id, w,
                   unnest(generate_series(1, greatest(len(w) - 2, 0))) AS i
            FROM toks)
    ),
    cnt AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY 1),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    truth AS (
      SELECT id_a, id_b FROM inter
      JOIN cnt ca ON ca.doc_id = id_a
      JOIN cnt cb ON cb.doc_id = id_b
      WHERE i * 1.0 / (ca.n + cb.n - i) >= 0.7
    )
    SELECT CAST((SELECT count(*) FROM documents) AS BIGINT) AS n_docs,
           CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_true_pairs,
           CAST(0.9 AS DOUBLE) AS pc_floor,
           CAST(0.95 AS DOUBLE) AS rr_floor,
           TRUE AS pc_floor_met,
           TRUE AS rr_floor_met
    """,
    "Blocking-quality scorecard for the MinHash-LSH near-dup tier "
    "(banded_signatures, 16 bands x 4 rows, seeded constants): pair "
    "completeness — the share of EXACT 3-gram-Jaccard >= 0.7 pairs "
    "(the oracle states this truth set) that appear among the "
    "band-bucket candidates — must clear 0.9 (theory: candidate "
    "probability 1-(1-j^4)^16 = 0.988 at j=0.7, higher above), and "
    "the reduction ratio — the share of the n(n-1)/2 pair space the "
    "blocker prunes — must clear 0.95. This is the measured "
    "justification for the repo-wide posture that exact pair miners "
    "run LSH-first at corpus scale; a seed/banding regression drops "
    "completeness, a bucket-key regression floods candidates and "
    "drops the reduction ratio",
    ("dedup", "lsh", "evaluation", "documents"),
)
def lsh_blocking_quality(spark, sf_dir):
    from ..operators.dedup import banded_signatures, ngram_jaccard_pairs

    d = _t(spark, sf_dir, "documents")
    banded = banded_signatures(
        d, "text", "doc_id", num_hashes=64, bands=16, shingle_n=3
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.bucket") == F.col("b.bucket"),
                F.col("a.doc_id") < F.col("b.doc_id"),
            ],
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    truth = ngram_jaccard_pairs(
        d, "text", "doc_id", shingle_n=3, threshold=0.7, max_gram_df=256
    ).select("id_a", "id_b")

    n_docs = d.count()
    n_truth = truth.count()
    n_cand = cand.count()
    n_found = truth.join(cand, ["id_a", "id_b"], "left_semi").count()
    pc = n_found / n_truth if n_truth else 1.0
    rr = 1.0 - n_cand / (n_docs * (n_docs - 1) / 2.0)
    return d.sparkSession.createDataFrame(
        [(n_docs, n_truth, 0.9, 0.95, pc >= 0.9, rr >= 0.95)],
        "n_docs long, n_true_pairs long, pc_floor double, "
        "rr_floor double, pc_floor_met boolean, rr_floor_met boolean",
    )


@_register(
    "hll_type_error_bound",
    """
    SELECT CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_total_users,
           CAST(0.05 AS DOUBLE) AS rel_err_bound,
           TRUE AS bound_met
    FROM events
    """,
    "Companion gate for the rows-only sketch_distinct_users_by_type "
    "(DataSketches HLL images are engine-specific, so that row "
    "cannot hash-match an oracle): every per-type hll_sketch_agg "
    "estimate AND the hll_union_agg-merged grand total must sit "
    "within 5% relative error of the exact distinct counts — both "
    "sides computed in-Spark in one pass each, the exact total "
    "cross-checked by the oracle. lgK=12 theory gives ~1.6% standard "
    "error; 5% is the driver-visible envelope. A sketch/merge "
    "regression (lossy union, wrong lgK, truncated estimate) breaks "
    "the bound and flips the boolean",
    ("sketch", "agg", "evaluation", "events"),
)
def hll_type_error_bound(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    per_type = e.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sketch"),
        F.count_distinct("user_id").alias("exact"),
    )
    typed = per_type.select(
        F.hll_sketch_estimate("sketch").alias("est"),
        F.col("exact").cast("double").alias("exact"),
    )
    total = per_type.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est")
    )
    exact_total = e.agg(
        F.count_distinct("user_id").alias("exact_total"),
        F.count_distinct("event_type").alias("n_types"),
    )
    rel = typed.select(
        (F.abs(F.col("est") - F.col("exact")) / F.col("exact")).alias(
            "rel_err"
        )
    ).agg(F.max("rel_err").alias("max_typed_err"))
    return (
        exact_total.crossJoin(total)
        .crossJoin(rel)
        .select(
            F.col("n_types").cast("long").alias("n_types"),
            F.col("exact_total").cast("long").alias("exact_total_users"),
            F.lit(0.05).cast("double").alias("rel_err_bound"),
            (
                (F.col("max_typed_err") <= 0.05)
                & (
                    F.abs(F.col("est") - F.col("exact_total"))
                    / F.col("exact_total")
                    <= 0.05
                )
            ).alias("bound_met"),
        )
    )


@_register(
    "ann_ivf_indexed_recall_floor",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_queries,
           CAST(5 AS INTEGER) AS k,
           CAST(0.5 AS DOUBLE) AS recall_floor,
           TRUE AS floor_met
    FROM embeddings WHERE vec_id % 100 = 0
    """,
    "Driver-visible quality gate for the PERSISTENT IVF index tier "
    "(ann_topk_ivf_indexed, the index-at-rest deployment): recall@5 "
    "of a search against a freshly stream-ingested partitioned index "
    "(quantizer frozen from the first batch, n_probe=4) vs the exact "
    "brute-force top-5 must clear the pinned 0.5 floor. Covers what "
    "the in-memory ivf floor cannot: the partition layout, the "
    "frozen-quantizer assignment path, and partition-pruned reads "
    "all sit between this query and its floor — a broken index "
    "layout scores ~0.001. Oracle pins the expectation (k-means "
    "training makes an exact twin impractical)",
    ("streaming", "similarity", "ann", "ivf", "evaluation",
     "embeddings"),
)
def ann_ivf_indexed_recall_floor(spark, sf_dir):
    import os
    import tempfile

    from ..streaming.ann_index import (
        IvfVectorIndex,
        write_stream_to_ivf_index,
    )
    from .registry import _await_stream, _recall_floor_frame

    path = os.path.join(sf_dir, "embeddings.parquet")
    schema = spark.read.parquet(path).schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "embeddings.parquet")
        .parquet(sf_dir)
    )
    base = tempfile.mkdtemp(prefix="ivf_floor_")
    index = IvfVectorIndex(path=os.path.join(base, "idx"), n_lists=16)
    q = write_stream_to_ivf_index(
        stream,
        index,
        checkpoint_root=os.path.join(base, "ck"),
        available_now=True,
    )
    _await_stream(q, 300)
    return _recall_floor_frame(
        spark,
        sf_dir,
        lambda emb, qs: index.search(spark, qs, k=5, n_probe=4),
        floor=0.5,
    )


@_register(
    "phash_determinism_gate",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(0 AS BIGINT) AS n_mismatches,
           TRUE AS deterministic
    FROM documents WHERE text IS NOT NULL
    """,
    "Companion gate for the rows-only multimodal_phash_images (float "
    "DCT thresholds are not SQL-expressible): pHash must be a pure "
    "function of the payload bytes, independent of partitioning and "
    "Arrow batch boundaries — the corpus is hashed TWICE, the second "
    "pass under shifted ids and a different repartition (different "
    "batch shapes through mapInPandas), and every pair of hashes for "
    "the same payload must agree. Catches carry-state bugs, batch-"
    "boundary effects, and nondeterministic numpy paths; the DCT "
    "algebra itself is property-tested in tests/test_multimodal.py",
    ("multimodal", "phash", "evaluation", "documents"),
)
def phash_determinism_gate(spark, sf_dir):
    from ..operators.multimodal import (
        phash_images,
        synthetic_media_from_documents,
    )

    d = _t(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    offset = 10_000_000
    ph1 = phash_images(synthetic_media_from_documents(d))
    ph2 = (
        phash_images(
            synthetic_media_from_documents(
                d.withColumn(
                    "doc_id", F.col("doc_id") + F.lit(offset)
                ).repartition(7)
            )
        )
        .withColumn("media_id", F.col("media_id") - F.lit(offset))
        .withColumnRenamed("phash", "phash2")
    )
    cmp = ph1.join(ph2, "media_id")
    return cmp.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(
            (F.col("phash") != F.col("phash2")).cast("long")
        ).cast("long").alias("n_mismatches"),
        (
            F.sum((F.col("phash") != F.col("phash2")).cast("long")) == 0
        ).alias("deterministic"),
    )


@_register(
    "pack_sequences_ffd",
    """
    WITH RECURSIVE docs2 AS (
      SELECT doc_id,
             CAST(coalesce(len(list_filter(
               string_split_regex(lower(text), '\\s+'),
               x -> x <> '')), 0) AS BIGINT) AS n,
             doc_id % 8 AS shard
      FROM documents
    ),
    ordered AS (
      SELECT *, row_number() OVER (PARTITION BY shard
                 ORDER BY n DESC, doc_id ASC) AS rnk
      FROM docs2
    ),
    rec(shard, rnk, rems, doc_id, n, bin_in_shard) AS (
      SELECT shard, 0, []::BIGINT[], NULL::BIGINT, NULL::BIGINT,
             NULL::BIGINT
      FROM (SELECT DISTINCT shard FROM ordered)
      UNION ALL
      SELECT o.shard, o.rnk,
        CASE WHEN s.idx IS NULL THEN list_append(r.rems, 256 - o.n)
             ELSE list_transform(r.rems,
                    (x, j) -> CASE WHEN j = s.idx THEN x - o.n
                              ELSE x END) END,
        o.doc_id, o.n,
        coalesce(s.idx, len(r.rems) + 1)
      FROM rec r
      JOIN ordered o ON o.shard = r.shard AND o.rnk = r.rnk + 1,
      LATERAL (SELECT nullif(list_position(
                 list_transform(r.rems, x -> x >= o.n), true), 0)
                 AS idx) s
    )
    SELECT doc_id, n AS n_tokens, shard, bin_in_shard,
           shard * 1000000 + bin_in_shard AS bin_id
    FROM rec WHERE rnk >= 1
    """,
    "Sequence packing (first-fit-decreasing) — the step between a "
    "tokenized corpus and a training dataloader: documents pack into "
    "capacity-256 context bins, visited (token count desc, id asc), "
    "each into the FIRST bin that fits, else a new bin; oversize "
    "docs get their own over-full bin nothing else joins. Exact "
    "global FFD is inherently sequential, so the operator "
    "(operators/packing.py) shards by doc_id % 8 and runs exact FFD "
    "inside each shard as one Arrow-local pass — the bounded-"
    "sequential-work discipline; quality loss vs global FFD is the "
    "usual < 1-bin-per-shard tail. The DuckDB oracle replays each "
    "shard's scan with a recursive CTE carrying the remaining-"
    "capacity list (first-fit = list_position of the first fitting "
    "bin) and every assignment must match",
    ("text", "packing", "training", "documents"),
)
def pack_sequences_ffd(spark, sf_dir):
    from ..functions.text import token_count
    from ..operators.packing import pack_sequences_ffd as pack

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.coalesce(token_count(F.col("text")).cast("long"), F.lit(0))
        .alias("n_tokens"),
    )
    return pack(
        d, count_col="n_tokens", id_col="doc_id",
        capacity=256, n_shards=8,
    )
