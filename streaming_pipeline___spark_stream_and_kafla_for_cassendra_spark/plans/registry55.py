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

from pyspark.sql import Window
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


#: Pair-completeness truth mining is graded on a deterministic
#: stratum of at most ~this many documents (seeded multiplicative
#: hash on doc_id, engine-portable) so the gate's own cost stays
#: O(stratum²) — bounded-constant — while the corpus grows without
#: bound. The reduction-ratio side stays full-corpus (the LSH
#: bucket join is the linear production path being graded).
LSH_QUALITY_STRATUM = 10_000
_KNUTH = 2_654_435_761  # Knuth multiplicative hash constant (2^32 / phi)


@_register(
    "lsh_blocking_quality",
    f"""
    WITH n AS (SELECT count(*) AS n_docs FROM documents),
    stride AS (
      SELECT greatest(
               1, CAST(ceil(n_docs / {LSH_QUALITY_STRATUM}.0) AS BIGINT)
             ) AS s
      FROM n
    ),
    strat AS (
      SELECT doc_id, text FROM documents
      WHERE ((doc_id * {_KNUTH}) % 4294967296)
            % (SELECT s FROM stride) = 0
    ),
    toks AS (SELECT doc_id, string_split(lower(text), ' ') AS w
             FROM strat),
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
    SELECT CAST((SELECT n_docs FROM n) AS BIGINT) AS n_docs,
           CAST((SELECT count(*) FROM strat) AS BIGINT) AS n_stratum,
           CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_true_pairs,
           CAST(0.9 AS DOUBLE) AS pc_floor,
           CAST(0.95 AS DOUBLE) AS rr_floor,
           TRUE AS pc_floor_met,
           TRUE AS rr_floor_met
    """,
    "Blocking-quality scorecard for the MinHash-LSH near-dup tier "
    "(banded_signatures, 16 bands x 4 rows, seeded constants): pair "
    "completeness — the share of EXACT 3-gram-Jaccard >= 0.7 pairs "
    "that appear among the band-bucket candidates — must clear 0.9 "
    "(theory: candidate probability 1-(1-j^4)^16 = 0.988 at j=0.7, "
    "higher above), and the reduction ratio — the share of the "
    "n(n-1)/2 pair space the blocker prunes — must clear 0.95. "
    "Scale-safe truth mining (r5): the exact-Jaccard truth set is "
    "mined only on a deterministic ~10k-doc stratum (Knuth "
    "multiplicative hash of doc_id mod a corpus-size-derived "
    "stride — engine-portable, the oracle states the same stratum), "
    "so the gate's own cost is bounded-constant O(stratum²) while "
    "the blocker it grades stays full-corpus: the reduction ratio "
    "is still measured on ALL candidates from the production LSH "
    "bucket join. Per-pair co-bucketing is independent of other "
    "docs, so stratum pair completeness is an unbiased estimate of "
    "corpus pair completeness. At sf<=0.1 the stride is 1 and the "
    "stratum IS the corpus (bit-identical to the r4 gate); a seed/"
    "banding regression drops completeness, a bucket-key regression "
    "floods candidates and drops the reduction ratio",
    ("dedup", "lsh", "evaluation", "documents"),
)
def lsh_blocking_quality(spark, sf_dir):
    import math

    from ..operators.dedup import banded_signatures, ngram_jaccard_pairs

    d = _t(spark, sf_dir, "documents")
    n_docs = d.count()
    stride = max(1, math.ceil(n_docs / LSH_QUALITY_STRATUM))
    strat = d.filter(
        ((F.col("doc_id") * F.lit(_KNUTH)) % F.lit(4_294_967_296))
        % F.lit(stride)
        == 0
    )
    # Reduction ratio: FULL-corpus candidates — this is the linear
    # production path (band + bucket equi-join), never all-pairs.
    # Checkpoint the signature leg so the band self-join and the two
    # downstream count actions evaluate the Arrow signature pass once
    # (it used to run once per action — guide §5 caching: reused AND
    # expensive to recompute); the candidate set is counted twice
    # (reduction ratio + completeness semi-join), so checkpoint it too.
    banded = banded_signatures(
        d, "text", "doc_id", num_hashes=64, bands=16, shingle_n=3
    ).localCheckpoint(eager=False)
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
        .localCheckpoint(eager=False)
    )
    # Pair completeness: exact truth mined ONLY within the stratum
    # (O(stratum²) bounded), graded against the same candidate set.
    truth = (
        ngram_jaccard_pairs(
            strat,
            "text",
            "doc_id",
            shingle_n=3,
            threshold=0.7,
            max_gram_df=256,
            candidate_budget=50_000_000,
        )
        .select("id_a", "id_b")
        .localCheckpoint(eager=False)
    )

    n_stratum = strat.count()
    n_cand = cand.count()
    # one action for truth size + completeness hits (was two): a
    # left join against the checkpointed candidate set, counting
    # rows and matches in the same aggregate
    tr = truth.join(
        cand.withColumn("_hit", F.lit(1)), ["id_a", "id_b"], "left"
    ).agg(
        F.count("*").alias("nt"),
        F.coalesce(F.sum("_hit"), F.lit(0)).alias("nf"),
    ).collect()[0]
    n_truth, n_found = tr["nt"], tr["nf"]
    pc = n_found / n_truth if n_truth else 1.0
    rr = 1.0 - n_cand / (n_docs * (n_docs - 1) / 2.0)
    return d.sparkSession.createDataFrame(
        [(n_docs, n_stratum, n_truth, 0.9, 0.95, pc >= 0.9, rr >= 0.95)],
        "n_docs long, n_stratum long, n_true_pairs long, "
        "pc_floor double, rr_floor double, pc_floor_met boolean, "
        "rr_floor_met boolean",
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
    "Second witness for sketch_distinct_users_by_type (rows-only "
    "through r4; converted to a full oracle row in r5 by grading "
    "each estimate against the in-query exact rewrite): every "
    "per-type hll_sketch_agg "
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


def _fertility_oracle() -> str:
    from .registry import _BPE_ROUNDS, _bpe_chain_ctes

    return f"""
    WITH {_bpe_chain_ctes(_BPE_ROUNDS)},
    final_len AS (SELECT w, len(syms) AS n FROM wt{_BPE_ROUNDS}),
    docw AS (
      SELECT doc_id,
             unnest(list_filter(
               string_split_regex(lower(text), '\\s+'),
               x -> x <> '')) AS w
      FROM documents
    ),
    perdoc AS (
      SELECT d.doc_id, f.n FROM docw d JOIN final_len f USING (w)
    ),
    langs AS (
      SELECT dd.lang, dd.doc_id,
             coalesce(sum(p.n), 0) AS bpe, count(p.n) AS words
      FROM documents dd LEFT JOIN perdoc p ON p.doc_id = dd.doc_id
      GROUP BY 1, 2
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(words) AS BIGINT) AS n_words,
           CAST(sum(bpe) AS BIGINT) AS n_bpe_tokens,
           floor(sum(bpe) / CAST(sum(words) AS DOUBLE) * 10000 + 0.5)
             / 10000.0 AS fertility
    FROM langs GROUP BY 1
    """


@_register(
    "tokenizer_fertility_by_lang",
    _fertility_oracle(),
    "Tokenizer fertility by language — BPE pieces per whitespace "
    "word, the standard multilingual-tokenizer health metric (a "
    "language with fertility far above the corpus mean is being "
    "shredded into characters and will train poorly): trains the "
    "corpus BPE (25 merges), encodes every document, and reports "
    "per-language doc/word/piece totals and the fertility ratio. "
    "Oracle: the same generated CTE chain that checks "
    "bpe_token_counts_documents, aggregated per language with exact "
    "integer sums and one floor-rounded division. Costed like the "
    "other BPE queries (re-trains the merge table) — excluded from "
    "the default bench, fully oracle-checked for correctness",
    ("text", "bpe", "tokenizer", "multilingual", "documents"),
)
def tokenizer_fertility_by_lang(spark, sf_dir):
    from ..functions.bpe import bpe_encode
    from .registry import _bpe_merges_list

    d = _t(spark, sf_dir, "documents")
    merges = _bpe_merges_list(spark, sf_dir)
    enc = bpe_encode(d, merges, id_col="doc_id", text_col="text")
    return (
        enc.join(d.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_words").cast("long").alias("n_words"),
            F.sum("n_bpe_tokens").cast("long").alias("n_bpe_tokens"),
            (
                F.floor(
                    F.sum("n_bpe_tokens")
                    / F.sum("n_words").cast("double")
                    * 10000
                    + F.lit(0.5)
                )
                / F.lit(10000.0)
            ).alias("fertility"),
        )
    )


@_register(
    "dedup_survivorship_audit",
    """
    WITH RECURSIVE
    toks AS (SELECT doc_id, string_split(lower(text), ' ') AS w
             FROM documents),
    grams AS (
      SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
      FROM (SELECT doc_id, w,
                   unnest(generate_series(1, greatest(len(w) - 2, 0))) AS i
            FROM toks)
    ),
    cnt AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY 1),
    pairs AS (
      SELECT id_a, id_b FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
        FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
        GROUP BY 1, 2
      ) inter
      JOIN cnt ca ON ca.doc_id = id_a
      JOIN cnt cb ON cb.doc_id = id_b
      WHERE i * 1.0 / (ca.n + cb.n - i) >= 0.2
    ),
    edges AS (SELECT id_a AS a, id_b AS b FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
    reach(node, r) AS (
      SELECT a, a FROM (SELECT DISTINCT a FROM edges) base
      UNION
      SELECT e.a, reach.r FROM edges e JOIN reach ON reach.node = e.b
    ),
    clusters AS (SELECT node AS doc_id, min(r) AS cluster_id
                 FROM reach GROUP BY node),
    sel AS (
      SELECT c.cluster_id, d.doc_id, d.n_chars,
             row_number() OVER (PARTITION BY c.cluster_id
                                ORDER BY d.n_chars DESC, d.doc_id)
               AS rk
      FROM clusters c JOIN documents d USING (doc_id)
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS chars_total
            FROM documents),
    absorbed AS (
      SELECT CAST(count(*) AS BIGINT) AS n_absorbed,
             CAST(coalesce(sum(n_chars), 0) AS BIGINT) AS chars_absorbed
      FROM sel WHERE rk > 1
    ),
    cl AS (SELECT CAST(count(*) AS BIGINT) AS n_clustered,
                  CAST(count(DISTINCT cluster_id) AS BIGINT)
                    AS n_canonical
           FROM sel)
    SELECT t.n_docs, cl.n_clustered, cl.n_canonical, a.n_absorbed,
           t.chars_total,
           t.chars_total - a.chars_absorbed AS chars_retained,
           CAST(floor((t.chars_total - a.chars_absorbed) * 1000000.0
                      / t.chars_total) AS BIGINT) AS retention_ppm
    FROM tot t, absorbed a, cl
    """,
    "Dedup survivorship audit — the 'what did dedup cost me' report "
    "every pipeline run should ship: after near-dup clustering "
    "(3-gram Jaccard >= 0.2, connected components) and longest-text "
    "canonical election, one row states corpus docs/chars, clustered "
    "and canonical counts, absorbed (deleted) docs, retained chars "
    "and the char-retention ppm — the number that goes on the run "
    "dashboard next to the dedup threshold. Reuses the exact pair "
    "graph + components + election of near_dup_canonical_docs — the "
    "pair graph comes from the materialized shared mining leg "
    "(_ngram_pair_leg); all integer arithmetic, exact oracle",
    ("dedup", "survivorship", "audit", "documents"),
)
def dedup_survivorship_audit(spark, sf_dir):
    from ..operators.dedup import connected_components
    from .registry import _ngram_pair_leg

    d = _t(spark, sf_dir, "documents")
    pairs = _ngram_pair_leg(spark, sf_dir)
    labels = connected_components(pairs, "id_a", "id_b").select(
        F.col("node").alias("doc_id"), F.col("comp").alias("cluster_id")
    )
    sel = labels.join(d.select("doc_id", "n_chars"), "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    ranked = sel.withColumn("rk", F.row_number().over(w))
    tot = d.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("chars_total"),
    )
    cl = ranked.agg(
        F.count("*").cast("long").alias("n_clustered"),
        F.countDistinct("cluster_id").cast("long").alias("n_canonical"),
        F.coalesce(
            F.sum(F.when(F.col("rk") > 1, F.col("n_chars"))), F.lit(0)
        ).cast("long").alias("chars_absorbed"),
        F.sum((F.col("rk") > 1).cast("long")).cast("long").alias(
            "n_absorbed"
        ),
    )
    return tot.crossJoin(cl).select(
        "n_docs",
        "n_clustered",
        "n_canonical",
        "n_absorbed",
        "chars_total",
        (F.col("chars_total") - F.col("chars_absorbed")).alias(
            "chars_retained"
        ),
        F.floor(
            (F.col("chars_total") - F.col("chars_absorbed"))
            * F.lit(1000000.0)
            / F.col("chars_total")
        ).cast("long").alias("retention_ppm"),
    )


@_register(
    "compression_ratio_floor",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           TRUE AS bounds_met,
           TRUE AS deterministic,
           TRUE AS mean_ceiling_met
    FROM documents
    WHERE text IS NOT NULL AND strlen(text) >= 50
    """,
    "Companion gate for the rows-only compression_ratio_documents "
    "(DEFLATE is not SQL-expressible): over every document of >= 50 "
    "chars, the zlib ratio must (a) sit in (0, 1.2] with "
    "ratio == compressed_bytes/n_chars to 1e-6 (the operator rounds "
    "to 6 dp) — a broken pass emits zeros, inflated sizes, or "
    "mismatched columns; (b) be "
    "IDENTICAL when the corpus is re-hashed under a different "
    "repartition (scan-local purity, the phash-gate discipline); and "
    "(c) average at most 0.9 — natural-language text compresses far "
    "below that, so a no-op 'compressor' fails the ceiling. Oracle "
    "pins the eligible-doc count + the three booleans",
    ("text", "quality", "compression", "evaluation", "documents"),
)
def compression_ratio_floor(spark, sf_dir):
    from ..functions.text import compression_ratio

    d = _t(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & (F.length("text") >= 50)
    )
    r1 = compression_ratio(d, "text", "doc_id")
    r2 = (
        compression_ratio(d.repartition(7), "text", "doc_id")
        .withColumnRenamed("compression_ratio", "ratio2")
        .select("doc_id", "ratio2")
    )
    joined = r1.join(r2, "doc_id")
    return joined.agg(
        F.count("*").cast("long").alias("n_docs"),
        (
            F.sum(
                (
                    (F.col("compression_ratio") <= 0.0)
                    | (F.col("compression_ratio") > 1.2)
                    | (
                        F.abs(
                            F.col("compression_ratio")
                            - F.col("compressed_bytes")
                            / F.col("n_chars").cast("double")
                        )
                        > 1e-6
                    )
                ).cast("long")
            )
            == 0
        ).alias("bounds_met"),
        (
            F.sum(
                (
                    F.col("compression_ratio") != F.col("ratio2")
                ).cast("long")
            )
            == 0
        ).alias("deterministic"),
        (F.avg("compression_ratio") <= 0.9).alias("mean_ceiling_met"),
    )
