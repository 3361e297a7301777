"""Round-3 registry additions, batch 2 — the data-selection /
curation layer a training-data pipeline runs after dedup: canonical
survivor election inside near-dup clusters, hard-negative mining for
contrastive training, MMR diverse representatives, a count-min
heavy-hitter sketch, sequence-length padding economics, and Cohen's
kappa for the language-ID agreement loop.

Same contract as ``registry.py``. Imported at the bottom of
``registry.py``.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions.text import tokens
from .registry import _langid_oracle, _register, _t


def _r6(col):
    return F.floor(col * 1000000 + F.lit(0.5)) / F.lit(1000000.0)


# ---------------------------------------------------------------------------
# Canonical survivor per near-duplicate cluster (keep-best dedup output)
# ---------------------------------------------------------------------------

@_register(
    "near_dup_canonical_docs",
    """
    WITH RECURSIVE
    toks AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
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
    )
    SELECT cluster_id,
           CAST(count(*) AS BIGINT) AS n_members,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           max(CASE WHEN rk = 1 THEN doc_id END) AS canonical_doc_id
    FROM sel GROUP BY 1
    """,
    "Survivorship after near-dup clustering — the step that turns "
    "cluster labels into an output corpus: within each 3-gram-"
    "Jaccard connected component, elect the canonical document "
    "(longest text, doc_id tie-break) and report member/char totals "
    "per cluster. Same pair graph + pointer-jumping components as "
    "near_dup_clusters; the election is a cluster-keyed window over "
    "cluster-sized groups (never a global sort). The dedup'd corpus "
    "is then 'canonical docs + every unclustered doc'. Pair graph "
    "served from the materialized shared mining leg (_ngram_pair_leg)",
    ("dedup", "clustering", "survivorship", "documents"),
)
def near_dup_canonical_docs(spark, sf_dir):
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
    return (
        sel.withColumn("rk", F.row_number().over(w))
        .groupBy("cluster_id")
        .agg(
            F.count("*").alias("n_members"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.max(F.when(F.col("rk") == 1, F.col("doc_id"))).alias(
                "canonical_doc_id"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Hard-negative mining (contrastive / retrieval training pairs)
# ---------------------------------------------------------------------------

@_register(
    "hard_negative_mining",
    """
    WITH q AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
               FROM embeddings WHERE vec_id % 100 = 0),
    c AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
          FROM embeddings),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_cosine_similarity(q.emb, c.emb) AS sim
      FROM q JOIN c ON c.label <> q.label
    )
    SELECT query_id, neighbor_id, round(sim, 4) AS cosine_sim,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY sim DESC, neighbor_id)
                AS INTEGER) AS rank
    FROM scored
    QUALIFY rank <= 5
    """,
    "Hard-negative mining for contrastive/retrieval training: each "
    "query's top-5 most-similar OTHER-label vectors — the near-miss "
    "examples that teach an encoder the decision boundary. The "
    "same-label mask is a per-query predicate (no candidate "
    "pre-filter expresses it), applied to the similarity matrix "
    "before the per-batch local top-k, so the shuffle stays k-sized "
    "exactly like ann_topk_bruteforce",
    ("similarity", "ann", "training", "embeddings"),
)
def hard_negative_mining(spark, sf_dir):
    from ..operators.similarity import hard_negatives

    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") % 100 == 0)
    return hard_negatives(emb, queries_df, k=5)


# ---------------------------------------------------------------------------
# MMR diverse representatives (oracle: unrolled greedy rounds)
# ---------------------------------------------------------------------------


def _mmr_oracle(k: int = 5, lam: float = 0.7) -> str:
    """DuckDB twin of ``mmr_select`` via UNROLLED greedy rounds: the
    per-group recurrence is deterministic (argmax on scores rounded
    to 12 dp, ascending-id tie-break — exactly what the numpy side
    computes), so round r is one CTE that anti-joins the picks so
    far, takes max-similarity-to-picked, and window-selects the
    arg-max. Cross-engine float freedom is limited to dot-product
    summation order (~1e-16), absorbed by the 12-dp argmax rounding
    and the 4-dp output rounding."""
    om = repr(1.0 - lam)  # bit-exact same constant as numpy
    rounds = []
    for r in range(2, k + 1):
        prev = " UNION ALL ".join(
            f"SELECT label, vec_id, v FROM p{i}" for i in range(1, r)
        )
        rounds.append(f"""
    sel{r} AS ({prev}),
    ms{r} AS (
      SELECT r.label, r.vec_id, max(list_dot_product(r.v, s.v)) AS ms
      FROM rel r JOIN sel{r} s ON s.label = r.label
      GROUP BY 1, 2
    ),
    p{r} AS (
      SELECT r.label, r.vec_id, r.v,
             {lam} * r.rel - {om} * m.ms AS score
      FROM rel r
      JOIN ms{r} m ON m.label = r.label AND m.vec_id = r.vec_id
      LEFT JOIN sel{r} x ON x.label = r.label AND x.vec_id = r.vec_id
      WHERE x.vec_id IS NULL
      QUALIFY row_number() OVER (
        PARTITION BY r.label
        ORDER BY round({lam} * r.rel - {om} * m.ms,
                       12) DESC,
                 r.vec_id) = 1
    )""")
    finals = " UNION ALL ".join(
        f"SELECT label, vec_id, {i} AS pick_rank, score FROM p{i}"
        for i in range(1, k + 1)
    )
    return f"""
    WITH pool AS (
      SELECT label, vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS raw
      FROM embeddings WHERE vec_id % 4 = 0
    ),
    e AS (
      SELECT label, vec_id,
             list_transform(
               raw,
               x -> x / greatest(sqrt(list_dot_product(raw, raw)),
                                 1e-300)) AS v
      FROM pool
    ),
    dims AS (
      SELECT label, vec_id, unnest(v) AS x,
             unnest(generate_series(1, len(v))) AS d
      FROM e
    ),
    cent AS (
      SELECT label, list(c ORDER BY d) AS c
      FROM (SELECT label, d, avg(x) AS c FROM dims GROUP BY 1, 2)
      GROUP BY 1
    ),
    centn AS (
      SELECT label,
             list_transform(
               c,
               x -> x / greatest(sqrt(list_dot_product(c, c)),
                                 1e-300)) AS c
      FROM cent
    ),
    rel AS (
      SELECT e.label, e.vec_id, e.v,
             list_dot_product(e.v, cn.c) AS rel
      FROM e JOIN centn cn ON cn.label = e.label
    ),
    p1 AS (
      SELECT label, vec_id, v, {lam} * rel AS score
      FROM rel
      QUALIFY row_number() OVER (
        PARTITION BY label
        ORDER BY round({lam} * rel, 12) DESC, vec_id) = 1
    ),{",".join(rounds)}
    SELECT label AS "group", vec_id,
           CAST(pick_rank AS INTEGER) AS pick_rank,
           floor(score * 10000 + 0.5) / 10000.0 AS mmr_score
    FROM ({finals})
    """


@_register(
    "mmr_diverse_representatives",
    _mmr_oracle(k=5, lam=0.7),
    "Maximal-Marginal-Relevance selection of 5 diverse "
    "representatives per embedding label (λ=0.7 relevance-to-"
    "centroid vs similarity-to-already-picked): the data-selection "
    "primitive for building small-but-diverse eval/finetune pools. "
    "Sequential greedy recurrence per group → one grouped "
    "applyInPandas pass over a BOUNDED candidate pool (quarter "
    "sample here; top-N-by-quality in production), one shuffle on "
    "the group key. ORACLE (new in r4, was rows-only): the greedy is "
    "deterministic — argmax on 12-dp-rounded scores with ascending-"
    "id tie-break — so the DuckDB twin unrolls the 5 rounds as "
    "chained CTEs (anti-join picks, max-sim-to-picked, windowed "
    "argmax) and every pick, rank, and 4-dp score must match",
    ("similarity", "selection", "diversity", "embeddings"),
)
def mmr_diverse_representatives(spark, sf_dir):
    from ..operators.similarity import mmr_select

    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 4 == 0)
    out = mmr_select(emb, k=5, lam=0.7, group_col="label")
    return out.select(
        "group",
        "vec_id",
        "pick_rank",
        (F.floor(F.col("mmr_score") * 10000 + F.lit(0.5)) / F.lit(10000.0))
        .alias("mmr_score"),
    )


# ---------------------------------------------------------------------------
# Count-min sketch heavy hitters (mergeable integer state, exact twin)
# ---------------------------------------------------------------------------

_CMS_DEPTH = 3
_CMS_WIDTH = 256


@_register(
    "cms_token_counts",
    f"""
    WITH tok AS (
      SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                    x -> x <> '')) AS token
      FROM documents
    ),
    tc AS (SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY 1),
    ds AS (SELECT unnest(generate_series(0, {_CMS_DEPTH - 1})) AS d),
    hashed AS (
      SELECT t.token, t.cnt, ds.d,
             ('0x' || substr(md5(CAST(ds.d AS VARCHAR) || ':' || t.token),
                             1, 8))::BIGINT % {_CMS_WIDTH} AS bucket
      FROM tc t CROSS JOIN ds
    ),
    cms AS (SELECT d, bucket, CAST(sum(cnt) AS BIGINT) AS c
            FROM hashed GROUP BY 1, 2),
    top AS (SELECT token, cnt FROM tc
            ORDER BY cnt DESC, token ASC LIMIT 20),
    est AS (
      SELECT tp.token, tp.cnt, min(cm.c) AS est
      FROM top tp
      JOIN hashed h ON h.token = tp.token
      JOIN cms cm ON cm.d = h.d AND cm.bucket = h.bucket
      GROUP BY 1, 2
    )
    SELECT token, cnt AS exact_count, CAST(est AS BIGINT) AS cms_estimate,
           CAST(est - cnt AS BIGINT) AS overestimate
    FROM est
    """,
    "Count-min sketch over the corpus token stream (depth 3 × width "
    "256, md5-derived row hashes): point estimates for the top-20 "
    "exact heavy hitters alongside their true counts and the "
    "sketch's (always ≥ 0) overestimate. The sketch state is "
    f"{_CMS_DEPTH}×{_CMS_WIDTH} mergeable integers — map-side "
    "combinable, broadcast-able, and O(1) regardless of vocabulary, "
    "the streaming heavy-hitter companion to the exact/HLL/theta "
    "distinct family. Hashing is engine-replicated md5 arithmetic, "
    "so the DuckDB twin reproduces the sketch bit-for-bit; the "
    "top-20 selection is a lossless two-stage top-k",
    ("sketch", "heavy-hitters", "text", "documents"),
)
def cms_token_counts(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    tok = d.select(F.explode(tokens(F.col("text"))).alias("token"))
    tc = tok.groupBy("token").agg(F.count("*").alias("cnt"))

    def bucket_for(depth_col):
        h = F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        depth_col.cast("string"), F.lit(":"), F.col("token")
                    ).cast("binary")
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        return h % _CMS_WIDTH

    hashed = tc.select(
        "token",
        "cnt",
        F.explode(
            F.array(*[F.lit(i) for i in range(_CMS_DEPTH)])
        ).alias("d"),
    ).withColumn("bucket", bucket_for(F.col("d")))
    cms = hashed.groupBy("d", "bucket").agg(F.sum("cnt").alias("c"))

    # lossless two-stage top-20 (per-partition prune, then merge)
    pw = Window.partitionBy("_pid").orderBy(F.desc("cnt"), F.asc("token"))
    gw = Window.orderBy(F.desc("cnt"), F.asc("token"))
    top = (
        tc.withColumn("_pid", F.spark_partition_id())
        .withColumn("_prk", F.row_number().over(pw))
        .filter(F.col("_prk") <= 20)
        .drop("_pid", "_prk")
        .withColumn("_rk", F.row_number().over(gw))
        .filter(F.col("_rk") <= 20)
        .drop("_rk")
    )
    est = (
        top.join(hashed.select("token", "d", "bucket"), "token")
        .join(cms, ["d", "bucket"])
        .groupBy("token", "cnt")
        .agg(F.min("c").alias("est"))
    )
    return est.select(
        "token",
        F.col("cnt").alias("exact_count"),
        F.col("est").cast("long").alias("cms_estimate"),
        (F.col("est") - F.col("cnt")).cast("long").alias("overestimate"),
    )


# ---------------------------------------------------------------------------
# Sequence-length bucketing / padding economics
# ---------------------------------------------------------------------------

_SEQ_STEP = 16
_SEQ_CAP = 64


@_register(
    "padding_waste_buckets",
    f"""
    WITH t AS (
      SELECT len(list_filter(string_split_regex(lower(text), '\\s+'),
                 x -> x <> '')) AS n_tok
      FROM documents
    ),
    b AS (
      SELECT CASE WHEN n_tok >= {_SEQ_CAP} THEN {_SEQ_CAP}
                  ELSE CAST(ceil(n_tok / {_SEQ_STEP}.0) * {_SEQ_STEP}
                       AS BIGINT) END AS bucket,
             CASE WHEN n_tok >= {_SEQ_CAP} THEN {_SEQ_CAP}
                  ELSE n_tok END AS kept,
             CASE WHEN n_tok > {_SEQ_CAP} THEN n_tok - {_SEQ_CAP}
                  ELSE 0 END AS truncated
      FROM t WHERE n_tok > 0
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(kept) AS BIGINT) AS kept_tokens,
           CAST(sum(bucket - kept) AS BIGINT) AS pad_tokens,
           CAST(sum(truncated) AS BIGINT) AS truncated_tokens,
           floor(sum(bucket - kept) / CAST(sum(bucket) AS DOUBLE)
                 * 1000000 + 0.5) / 1000000.0 AS pad_fraction
    FROM b GROUP BY 1
    """,
    "Sequence-length bucketing economics for batched "
    "training/inference: documents land in step-16 length buckets "
    "(capped at 64 with truncation accounting — the fixture's 99-"
    "token max makes the cap bind), and each bucket reports docs, "
    "kept vs padding vs truncated tokens, and the padding fraction "
    "— the report that chooses bucket boundaries to minimize wasted "
    "FLOPs. Pure integer arithmetic in one map-side-combined "
    "aggregate; zero joins, zero windows",
    ("text", "packing", "efficiency", "documents"),
)
def padding_waste_buckets(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    n_tok = F.size(tokens(F.col("text")))
    t = d.select(n_tok.alias("n_tok")).filter(F.col("n_tok") > 0)
    bucket = F.when(F.col("n_tok") >= _SEQ_CAP, F.lit(_SEQ_CAP)).otherwise(
        (F.ceil(F.col("n_tok") / float(_SEQ_STEP)) * _SEQ_STEP).cast("long")
    )
    kept = F.when(F.col("n_tok") >= _SEQ_CAP, F.lit(_SEQ_CAP)).otherwise(
        F.col("n_tok")
    )
    truncated = F.when(
        F.col("n_tok") > _SEQ_CAP, F.col("n_tok") - _SEQ_CAP
    ).otherwise(F.lit(0))
    b = t.select(
        bucket.cast("long").alias("bucket"),
        kept.cast("long").alias("kept"),
        truncated.cast("long").alias("truncated"),
    )
    return b.groupBy("bucket").agg(
        F.count("*").alias("n_docs"),
        F.sum("kept").alias("kept_tokens"),
        F.sum(F.col("bucket") - F.col("kept")).alias("pad_tokens"),
        F.sum("truncated").alias("truncated_tokens"),
        _r6(
            F.sum(F.col("bucket") - F.col("kept"))
            / F.sum("bucket").cast("double")
        ).alias("pad_fraction"),
    )


# ---------------------------------------------------------------------------
# Cohen's kappa: language-ID heuristic vs labels (chance-corrected)
# ---------------------------------------------------------------------------

@_register(
    "cohens_kappa_langid",
    f"""
    WITH preds AS ({_langid_oracle()}),
    cells AS (
      SELECT labeled_lang, guessed_lang, CAST(count(*) AS BIGINT) AS n
      FROM preds GROUP BY 1, 2
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS n FROM cells),
    diag AS (SELECT CAST(coalesce(sum(n), 0) AS BIGINT) AS agree
             FROM cells WHERE labeled_lang = guessed_lang),
    rt AS (SELECT labeled_lang AS lang, CAST(sum(n) AS BIGINT) AS r
           FROM cells GROUP BY 1),
    ct AS (SELECT guessed_lang AS lang, CAST(sum(n) AS BIGINT) AS c
           FROM cells GROUP BY 1),
    pe_num AS (
      SELECT CAST(coalesce(sum(rt.r * ct.c), 0) AS BIGINT) AS rc
      FROM rt JOIN ct USING (lang)
    )
    SELECT t.n AS n_docs,
           floor(d.agree / CAST(t.n AS DOUBLE) * 1000000 + 0.5)
             / 1000000.0 AS po,
           floor(p.rc / CAST(t.n AS DOUBLE) / t.n * 1000000 + 0.5)
             / 1000000.0 AS pe,
           floor((d.agree / CAST(t.n AS DOUBLE)
                  - p.rc / CAST(t.n AS DOUBLE) / t.n)
                 / (1 - p.rc / CAST(t.n AS DOUBLE) / t.n)
                 * 1000000 + 0.5) / 1000000.0 AS kappa
    FROM tot t CROSS JOIN diag d CROSS JOIN pe_num p
    """,
    "Cohen's kappa between the engine's language-ID heuristic and "
    "the labeled lang column — chance-corrected agreement, the "
    "metric that exposes a detector that merely predicts the "
    "majority class (closing the loop on langid_confusion_metrics). "
    "po and pe derive from exact integer confusion cells and "
    "marginal products (the inner join over shared langs is "
    "equivalent to the full-with-zeros sum); kappa is the same IEEE "
    "expression in both engines, floor-pinned at 1e-6. Cells-sized "
    "arithmetic after one prediction scan",
    ("ml", "evaluation", "agreement", "langid", "documents"),
)
def cohens_kappa_langid(spark, sf_dir):
    from ..functions.text import lang_id_heuristic

    from ..operators.scale import spread_for_compute

    d = _t(spark, sf_dir, "documents")
    preds = spread_for_compute(d.select("lang", "text")).select(
        F.col("lang").alias("labeled_lang"),
        lang_id_heuristic(F.col("text")).alias("guessed_lang"),
    )
    # the confusion matrix feeds four aggregates below — checkpoint
    # so the stopword-vote scan evaluates once, not once per branch
    cells = preds.groupBy("labeled_lang", "guessed_lang").agg(
        F.count("*").alias("n")
    ).localCheckpoint(eager=False)
    tot = cells.agg(F.sum("n").alias("n"))
    diag = cells.filter(
        F.col("labeled_lang") == F.col("guessed_lang")
    ).agg(F.coalesce(F.sum("n"), F.lit(0)).alias("agree"))
    rt = cells.groupBy(F.col("labeled_lang").alias("lang")).agg(
        F.sum("n").alias("r")
    )
    ct = cells.groupBy(F.col("guessed_lang").alias("lang")).agg(
        F.sum("n").alias("c")
    )
    pe_num = (
        rt.join(ct, "lang")
        .agg(
            F.coalesce(
                F.sum(F.col("r").cast("decimal(20,0)") * F.col("c")),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("rc")
        )
    )
    n_d = F.col("n").cast("double")
    po = F.col("agree") / n_d
    pe = F.col("rc") / n_d / F.col("n")
    return (
        tot.crossJoin(F.broadcast(diag))
        .crossJoin(F.broadcast(pe_num))
        .select(
            F.col("n").cast("long").alias("n_docs"),
            _r6(po).alias("po"),
            _r6(pe).alias("pe"),
            _r6((po - pe) / (F.lit(1) - pe)).alias("kappa"),
        )
    )
