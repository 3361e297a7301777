"""Round-6 registry additions, batch 45 — data-selection surface:
DSIR hashed-n-gram importance resampling.

Same contract as ``registry.py``. Imported at the bottom of
``registry.py``.

DSIR (Data Selection with Importance Resampling, Xie et al. 2023,
public NeurIPS paper) is the standard cheap alternative to
classifier-based quality filtering for pretraining corpora: featurize
every document as a bag of HASHED n-grams (a fixed-width integer
histogram, so the "vocabulary" never grows), fit two smoothed
categorical distributions — one on a small trusted TARGET corpus, one
on the RAW pool — and keep the documents whose importance weight
p_target/p_raw is highest.  The whole method is two linear scans plus
a bucket-width (here 512-row) broadcast: nothing about it is
quadratic, which is why it runs at 100 TB where pairwise methods
need LSH.  The reference engine
(multi_source_streaming_processor.py) has no data-selection surface
at all; this row extends the engine's training-data library
(SURVEY.md "beyond the reference" mandate) alongside the surprisal
and repetition gates.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.text import tokens
from .registry import _register, _t

# Fixed feature width. 512 keeps the two distribution vectors a
# trivially-broadcastable 512-row table at ANY corpus size — the
# whole point of hashing the n-gram space.
_DSIR_BUCKETS = 512


def _bucket_spark(col):
    """md5-top-32-bit hash of a bigram string -> bucket id, exactly
    reproducible in DuckDB as CAST('0x'||substr(md5(x),1,8) AS
    UBIGINT) % B (the catalog's established cross-engine hash)."""
    return (
        F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")
        % _DSIR_BUCKETS
    )


@_register(
    "dsir_importance_selection",
    f"""
    WITH toks AS (
      SELECT doc_id, lang, source,
             list_filter(string_split_regex(lower(text), '\\s+'),
                         x -> x <> '') AS w
      FROM documents
    ),
    bg AS (
      SELECT doc_id,
             CAST(CAST('0x' || substr(md5(w[i] || ' ' || w[i+1]), 1, 8)
                       AS UBIGINT) % {_DSIR_BUCKETS} AS BIGINT) AS b
      FROM (SELECT doc_id, w,
                   unnest(generate_series(1, len(w) - 1)) AS i
            FROM toks WHERE len(w) >= 2)
    ),
    is_target AS (
      SELECT doc_id FROM documents WHERE lang = 'en'
    ),
    raw_counts AS (
      SELECT b, CAST(count(*) AS BIGINT) AS cr FROM bg GROUP BY 1
    ),
    tgt_counts AS (
      SELECT b, CAST(count(*) AS BIGINT) AS ct
      FROM bg JOIN is_target USING (doc_id) GROUP BY 1
    ),
    tot AS (
      SELECT (SELECT sum(cr) FROM raw_counts) AS nr,
             (SELECT coalesce(sum(ct), 0) FROM tgt_counts) AS nt
    ),
    bucket_scores AS (
      -- per-bucket log-ratio quantized to integer MICRO-units in the
      -- 512-row table (ADVICE r6): the per-doc aggregate below then
      -- sums BIGINTs, which is accumulation-order-free — a float sum
      -- would let Spark's partial-agg order vs DuckDB's flip the
      -- rounded selection/sort key on boundary-straddling docs
      SELECT r.b,
             CAST(round((log2(coalesce(t.ct, 0) + 1.0) - log2(r.cr + 1.0)
                   + log2(tot.nr + {_DSIR_BUCKETS})
                   - log2(tot.nt + {_DSIR_BUCKETS})) * 1000000.0)
                  AS BIGINT) AS s_u
      FROM raw_counts r
      LEFT JOIN tgt_counts t USING (b)
      CROSS JOIN tot
    ),
    per_doc AS (
      -- micro-units -> 4-decimal weight in INTEGER space
      -- (floor((x+50)/100) = half-up to 0.0001 units), then one exact
      -- integer/double division — no double round() anywhere, so both
      -- engines emit the bit-identical weight
      SELECT s.doc_id,
             CAST(count(*) AS BIGINT) AS n_bigrams,
             CAST(floor((sum(s.s_u) + 50) / 100.0) AS BIGINT)
               / 10000.0 AS dsir_log2_weight
      FROM (SELECT bg.doc_id, bs.s_u
            FROM bg JOIN bucket_scores bs USING (b)) s
      GROUP BY 1
    )
    SELECT p.doc_id, d.lang, d.source, p.n_bigrams, p.dsir_log2_weight
    FROM per_doc p JOIN documents d USING (doc_id)
    ORDER BY p.dsir_log2_weight DESC, p.doc_id
    LIMIT 100
    """,
    "DSIR importance resampling (hashed-bigram variant of Xie et al. "
    "2023): every document becomes a bag of md5-hashed bigrams in a "
    "FIXED 512-bucket feature space; add-one-smoothed bucket "
    "distributions are fit on the trusted target stratum (lang='en') "
    "and on the raw pool; each document's importance weight is its "
    "bigram-likelihood ratio log2[p_target/p_raw], and the top-100 "
    "weights are the keep-set. Scale shape: two linear scans of the "
    "token stream, the two distributions are 512-row broadcasts "
    "joined back bucket-wise, and selection is a TakeOrdered top-k — "
    "no self-join anywhere, which is exactly why DSIR is the "
    "data-selection method that survives 100 TB",
    ("ml-prep", "sampling", "training-data", "quality", "documents"),
)
def dsir_importance_selection(spark, sf_dir):
    # Left alone after an r9 A/B: spreading (and/or checkpointing) the
    # bigram leg re-timed SLOWER solo (1.93-2.15 s corrected vs the
    # 1.35 s floor) — the three narrow single-task consumers evaluate
    # concurrently as independent stages, so the round-robin exchange
    # only added shuffle + scheduling.
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", tokens(F.col("text")).alias("w")
    ).filter(F.size("w") >= 2)
    # Bigrams are built IN-ROW (transform over the token array — no
    # shuffle), then hashed straight to their bucket id; the original
    # strings never leave the row.
    bg = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(w) - 1),"
                " i -> concat(w[i-1], ' ', w[i]))"
            )
        ).alias("bgram"),
    ).select("doc_id", _bucket_spark(F.col("bgram")).alias("b"))
    is_target = d.filter(F.col("lang") == "en").select("doc_id")
    raw_counts = bg.groupBy("b").agg(F.count("*").alias("cr"))
    tgt_counts = (
        bg.join(is_target, "doc_id").groupBy("b").agg(
            F.count("*").alias("ct")
        )
    )
    tot = raw_counts.agg(F.sum("cr").alias("nr")).crossJoin(
        tgt_counts.agg(F.coalesce(F.sum("ct"), F.lit(0)).alias("nt"))
    )
    # Per-bucket log-ratio quantized to integer MICRO-units inside the
    # 512-row broadcast (ADVICE r6): the per-doc sum below aggregates
    # BIGINTs, which is accumulation-order-free — Spark partial-agg
    # order can never flip the selection/sort key vs the oracle.
    bucket_scores = (
        raw_counts.join(tgt_counts, "b", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "b",
            F.round(
                (
                    F.log2(F.coalesce(F.col("ct"), F.lit(0)) + 1.0)
                    - F.log2(F.col("cr") + 1.0)
                    + F.log2(F.col("nr") + F.lit(_DSIR_BUCKETS))
                    - F.log2(F.col("nt") + F.lit(_DSIR_BUCKETS))
                )
                * 1000000.0
            )
            .cast("long")
            .alias("s_u"),
        )
    )
    scored = bg.join(F.broadcast(bucket_scores), "b").select("doc_id", "s_u")
    # micro-units -> 4-decimal weight in INTEGER space (floor((x+50)/
    # 100) = half-up to 0.0001 units), then one exact integer/double
    # division — no double round() anywhere, bit-identical cross-engine
    per_doc = scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        (
            F.floor((F.sum("s_u") + F.lit(50)) / F.lit(100.0)).cast("long")
            / F.lit(10000.0)
        ).alias("dsir_log2_weight"),
    )
    return (
        per_doc.join(d.select("doc_id", "lang", "source"), "doc_id")
        .select(
            "doc_id", "lang", "source", "n_bigrams", "dsir_log2_weight"
        )
        .orderBy(F.desc("dsir_log2_weight"), F.asc("doc_id"))
        .limit(100)
    )
