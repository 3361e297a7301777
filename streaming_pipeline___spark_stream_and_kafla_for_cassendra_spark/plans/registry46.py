"""Round-3 registry additions, batch 33 — cross-source near-dup
contamination matrix and embedding drift between cohorts.

Same contract as ``registry.py``. Imported at the bottom of
``registry.py``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import _register, _t

# ---------------------------------------------------------------------------
# Cross-source contamination: near-dup pairs that straddle sources
# ---------------------------------------------------------------------------

_XC_JACCARD_PPM = 600000  # 3-gram Jaccard >= 0.6


@_register(
    "cross_source_contamination_matrix",
    f"""
    WITH toks AS (
      SELECT doc_id, source,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS l
      FROM documents
    ),
    grams AS (
      SELECT DISTINCT doc_id, g FROM (
        SELECT doc_id,
               unnest(list_transform(
                 generate_series(1, greatest(len(l) - 2, 0)),
                 i -> array_to_string(l[i:i + 2], ' '))) AS g
        FROM toks
      )
    ),
    sizes AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM grams GROUP BY 1
    ),
    pairs AS (
      SELECT a.doc_id AS da, b.doc_id AS db,
             CAST(count(*) AS BIGINT) AS inter
      FROM grams a JOIN grams b
        ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    nd AS (
      SELECT p.da, p.db
      FROM pairs p
      JOIN sizes sa ON sa.doc_id = p.da
      JOIN sizes sb ON sb.doc_id = p.db
      WHERE p.inter * 1000000
            >= {_XC_JACCARD_PPM} * (sa.sz + sb.sz - p.inter)
    ),
    srcs AS (SELECT doc_id, source FROM toks)
    SELECT least(s1.source, s2.source) AS source_a,
           greatest(s1.source, s2.source) AS source_b,
           CAST(count(*) AS BIGINT) AS near_dup_pairs,
           s1.source <> s2.source AS cross_source
    FROM nd
    JOIN srcs s1 ON s1.doc_id = nd.da
    JOIN srcs s2 ON s2.doc_id = nd.db
    GROUP BY 1, 2, 4
    """,
    "Cross-source contamination matrix: 3-gram-Jaccard near-dup "
    "pairs (>= 0.6, the `ngram_jaccard_pairs` inverted-index "
    "machinery) attributed to their SOURCE pair — the matrix that "
    "answers the question dedup counts can't: is duplication "
    "WITHIN sources (mirrors, harmless) or ACROSS them "
    "(train/eval contamination, syndication, scraping loops — the "
    "pairs a benchmark-hygiene pass must break). Gram join "
    "quadratic only within shared-gram buckets; the source "
    "attribution is two broadcast-scale joins on the pair list.",
    ("text-quality", "dedup", "contamination", "documents"),
)
def cross_source_contamination_matrix(spark, sf_dir):
    # NOT spread (r9 interleaved A/B: 2.02 s with a round-robin
    # pre-exchange vs 1.85 s without — the checkpointed tokenize leg
    # is cheap enough that the exchange never repays itself here)
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "source",
        F.filter(
            F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda x: x != ""
        ).alias("l"),
    ).localCheckpoint(eager=False)
    idx = F.sequence(F.lit(1), F.greatest(F.size("l") - 2, F.lit(0)))
    grams = (
        toks.select(
            "doc_id",
            F.explode(
                F.transform(
                    idx,
                    lambda i: F.array_join(F.slice(F.col("l"), i, 3), " "),
                )
            ).alias("g"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    sizes = grams.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = grams.select(F.col("doc_id").alias("da"), "g")
    b = grams.select(F.col("doc_id").alias("db"), F.col("g").alias("g2"))
    pairs = (
        a.join(b, (F.col("g") == F.col("g2")) & (F.col("da") < F.col("db")))
        .groupBy("da", "db")
        .agg(F.count("*").alias("inter"))
    )
    nd = (
        pairs.join(
            sizes.select(F.col("doc_id").alias("da"), F.col("sz").alias("sza")),
            "da",
        )
        .join(
            sizes.select(F.col("doc_id").alias("db"), F.col("sz").alias("szb")),
            "db",
        )
        .filter(
            F.col("inter") * 1000000
            >= _XC_JACCARD_PPM
            * (F.col("sza") + F.col("szb") - F.col("inter"))
        )
        .select("da", "db")
    )
    srcs = toks.select("doc_id", "source")
    out = (
        nd.join(
            srcs.select(F.col("doc_id").alias("da"), F.col("source").alias("s1")),
            "da",
        )
        .join(
            srcs.select(F.col("doc_id").alias("db"), F.col("source").alias("s2")),
            "db",
        )
        .groupBy(
            F.least("s1", "s2").alias("source_a"),
            F.greatest("s1", "s2").alias("source_b"),
            (F.col("s1") != F.col("s2")).alias("cross_source"),
        )
        .agg(F.count("*").alias("near_dup_pairs"))
    )
    return out.select(
        "source_a",
        "source_b",
        F.col("near_dup_pairs").cast("long").alias("near_dup_pairs"),
        "cross_source",
    )


# ---------------------------------------------------------------------------
# Embedding drift: centroid shift between the two vec_id cohorts
# ---------------------------------------------------------------------------


@_register(
    "embedding_drift_centroids",
    """
    WITH halves AS (
      SELECT label, vec_id % 2 = 0 AS early,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    sums AS (
      -- per (label, half): 64 micro-quantized integer dimension
      -- sums (order-free), generated as explicit columns
      SELECT label, early,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(floor(v[1] * 1000000) AS BIGINT)) AS BIGINT) AS s1,
             CAST(sum(CAST(floor(v[2] * 1000000) AS BIGINT)) AS BIGINT) AS s2,
             CAST(sum(CAST(floor(v[3] * 1000000) AS BIGINT)) AS BIGINT) AS s3,
             CAST(sum(CAST(floor(v[4] * 1000000) AS BIGINT)) AS BIGINT) AS s4,
             CAST(sum(CAST(floor(v[5] * 1000000) AS BIGINT)) AS BIGINT) AS s5,
             CAST(sum(CAST(floor(v[6] * 1000000) AS BIGINT)) AS BIGINT) AS s6,
             CAST(sum(CAST(floor(v[7] * 1000000) AS BIGINT)) AS BIGINT) AS s7,
             CAST(sum(CAST(floor(v[8] * 1000000) AS BIGINT)) AS BIGINT) AS s8,
             CAST(sum(CAST(floor(v[9] * 1000000) AS BIGINT)) AS BIGINT) AS s9,
             CAST(sum(CAST(floor(v[10] * 1000000) AS BIGINT)) AS BIGINT) AS s10,
             CAST(sum(CAST(floor(v[11] * 1000000) AS BIGINT)) AS BIGINT) AS s11,
             CAST(sum(CAST(floor(v[12] * 1000000) AS BIGINT)) AS BIGINT) AS s12,
             CAST(sum(CAST(floor(v[13] * 1000000) AS BIGINT)) AS BIGINT) AS s13,
             CAST(sum(CAST(floor(v[14] * 1000000) AS BIGINT)) AS BIGINT) AS s14,
             CAST(sum(CAST(floor(v[15] * 1000000) AS BIGINT)) AS BIGINT) AS s15,
             CAST(sum(CAST(floor(v[16] * 1000000) AS BIGINT)) AS BIGINT) AS s16,
             CAST(sum(CAST(floor(v[17] * 1000000) AS BIGINT)) AS BIGINT) AS s17,
             CAST(sum(CAST(floor(v[18] * 1000000) AS BIGINT)) AS BIGINT) AS s18,
             CAST(sum(CAST(floor(v[19] * 1000000) AS BIGINT)) AS BIGINT) AS s19,
             CAST(sum(CAST(floor(v[20] * 1000000) AS BIGINT)) AS BIGINT) AS s20,
             CAST(sum(CAST(floor(v[21] * 1000000) AS BIGINT)) AS BIGINT) AS s21,
             CAST(sum(CAST(floor(v[22] * 1000000) AS BIGINT)) AS BIGINT) AS s22,
             CAST(sum(CAST(floor(v[23] * 1000000) AS BIGINT)) AS BIGINT) AS s23,
             CAST(sum(CAST(floor(v[24] * 1000000) AS BIGINT)) AS BIGINT) AS s24,
             CAST(sum(CAST(floor(v[25] * 1000000) AS BIGINT)) AS BIGINT) AS s25,
             CAST(sum(CAST(floor(v[26] * 1000000) AS BIGINT)) AS BIGINT) AS s26,
             CAST(sum(CAST(floor(v[27] * 1000000) AS BIGINT)) AS BIGINT) AS s27,
             CAST(sum(CAST(floor(v[28] * 1000000) AS BIGINT)) AS BIGINT) AS s28,
             CAST(sum(CAST(floor(v[29] * 1000000) AS BIGINT)) AS BIGINT) AS s29,
             CAST(sum(CAST(floor(v[30] * 1000000) AS BIGINT)) AS BIGINT) AS s30,
             CAST(sum(CAST(floor(v[31] * 1000000) AS BIGINT)) AS BIGINT) AS s31,
             CAST(sum(CAST(floor(v[32] * 1000000) AS BIGINT)) AS BIGINT) AS s32,
             CAST(sum(CAST(floor(v[33] * 1000000) AS BIGINT)) AS BIGINT) AS s33,
             CAST(sum(CAST(floor(v[34] * 1000000) AS BIGINT)) AS BIGINT) AS s34,
             CAST(sum(CAST(floor(v[35] * 1000000) AS BIGINT)) AS BIGINT) AS s35,
             CAST(sum(CAST(floor(v[36] * 1000000) AS BIGINT)) AS BIGINT) AS s36,
             CAST(sum(CAST(floor(v[37] * 1000000) AS BIGINT)) AS BIGINT) AS s37,
             CAST(sum(CAST(floor(v[38] * 1000000) AS BIGINT)) AS BIGINT) AS s38,
             CAST(sum(CAST(floor(v[39] * 1000000) AS BIGINT)) AS BIGINT) AS s39,
             CAST(sum(CAST(floor(v[40] * 1000000) AS BIGINT)) AS BIGINT) AS s40,
             CAST(sum(CAST(floor(v[41] * 1000000) AS BIGINT)) AS BIGINT) AS s41,
             CAST(sum(CAST(floor(v[42] * 1000000) AS BIGINT)) AS BIGINT) AS s42,
             CAST(sum(CAST(floor(v[43] * 1000000) AS BIGINT)) AS BIGINT) AS s43,
             CAST(sum(CAST(floor(v[44] * 1000000) AS BIGINT)) AS BIGINT) AS s44,
             CAST(sum(CAST(floor(v[45] * 1000000) AS BIGINT)) AS BIGINT) AS s45,
             CAST(sum(CAST(floor(v[46] * 1000000) AS BIGINT)) AS BIGINT) AS s46,
             CAST(sum(CAST(floor(v[47] * 1000000) AS BIGINT)) AS BIGINT) AS s47,
             CAST(sum(CAST(floor(v[48] * 1000000) AS BIGINT)) AS BIGINT) AS s48,
             CAST(sum(CAST(floor(v[49] * 1000000) AS BIGINT)) AS BIGINT) AS s49,
             CAST(sum(CAST(floor(v[50] * 1000000) AS BIGINT)) AS BIGINT) AS s50,
             CAST(sum(CAST(floor(v[51] * 1000000) AS BIGINT)) AS BIGINT) AS s51,
             CAST(sum(CAST(floor(v[52] * 1000000) AS BIGINT)) AS BIGINT) AS s52,
             CAST(sum(CAST(floor(v[53] * 1000000) AS BIGINT)) AS BIGINT) AS s53,
             CAST(sum(CAST(floor(v[54] * 1000000) AS BIGINT)) AS BIGINT) AS s54,
             CAST(sum(CAST(floor(v[55] * 1000000) AS BIGINT)) AS BIGINT) AS s55,
             CAST(sum(CAST(floor(v[56] * 1000000) AS BIGINT)) AS BIGINT) AS s56,
             CAST(sum(CAST(floor(v[57] * 1000000) AS BIGINT)) AS BIGINT) AS s57,
             CAST(sum(CAST(floor(v[58] * 1000000) AS BIGINT)) AS BIGINT) AS s58,
             CAST(sum(CAST(floor(v[59] * 1000000) AS BIGINT)) AS BIGINT) AS s59,
             CAST(sum(CAST(floor(v[60] * 1000000) AS BIGINT)) AS BIGINT) AS s60,
             CAST(sum(CAST(floor(v[61] * 1000000) AS BIGINT)) AS BIGINT) AS s61,
             CAST(sum(CAST(floor(v[62] * 1000000) AS BIGINT)) AS BIGINT) AS s62,
             CAST(sum(CAST(floor(v[63] * 1000000) AS BIGINT)) AS BIGINT) AS s63,
             CAST(sum(CAST(floor(v[64] * 1000000) AS BIGINT)) AS BIGINT) AS s64
      FROM halves GROUP BY 1, 2
    ),
    paired AS (
      -- squared centroid shift as a generated fixed-order sum, the
      -- same left-associated order as the Spark zip_with fold
      SELECT a.label, a.n AS n_early, b.n AS n_late,
             (a.s1 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s1 / CAST(b.n AS DOUBLE) / 1000000.0) * (a.s1 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s1 / CAST(b.n AS DOUBLE) / 1000000.0)
               + (a.s2 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s2 / CAST(b.n AS DOUBLE) / 1000000.0) * (a.s2 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s2 / CAST(b.n AS DOUBLE) / 1000000.0)
               + (a.s3 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s3 / CAST(b.n AS DOUBLE) / 1000000.0) * (a.s3 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s3 / CAST(b.n AS DOUBLE) / 1000000.0)
               + (a.s4 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s4 / CAST(b.n AS DOUBLE) / 1000000.0) * (a.s4 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s4 / CAST(b.n AS DOUBLE) / 1000000.0)
               + (a.s5 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s5 / CAST(b.n AS DOUBLE) / 1000000.0) * (a.s5 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s5 / CAST(b.n AS DOUBLE) / 1000000.0)
               + (a.s6 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s6 / CAST(b.n AS DOUBLE) / 1000000.0) * (a.s6 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s6 / CAST(b.n AS DOUBLE) / 1000000.0)
               + (a.s7 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s7 / CAST(b.n AS DOUBLE) / 1000000.0) * (a.s7 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s7 / CAST(b.n AS DOUBLE) / 1000000.0)
               + (a.s8 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s8 / CAST(b.n AS DOUBLE) / 1000000.0) * (a.s8 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s8 / CAST(b.n AS DOUBLE) / 1000000.0)
               + (a.s9 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s9 / CAST(b.n AS DOUBLE) / 1000000.0) * (a.s9 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s9 / CAST(b.n AS DOUBLE) / 1000000.0)
               + (a.s10 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s10 / CAST(b.n AS DOUBLE) / 1000000.0) * (a.s10 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s10 / CAST(b.n AS DOUBLE) / 1000000.0)
               + (a.s11 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s11 / CAST(b.n AS DOUBLE) / 1000000.0) * (a.s11 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s11 / CAST(b.n AS DOUBLE) / 1000000.0)
               + (a.s12 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s12 / CAST(b.n AS DOUBLE) / 1000000.0) * (a.s12 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s12 / CAST(b.n AS DOUBLE) / 1000000.0)
               + (a.s13 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s13 / CAST(b.n AS DOUBLE) / 1000000.0) * (a.s13 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s13 / CAST(b.n AS DOUBLE) / 1000000.0)
               + (a.s14 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s14 / CAST(b.n AS DOUBLE) / 1000000.0) * (a.s14 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s14 / CAST(b.n AS DOUBLE) / 1000000.0)
               + (a.s15 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s15 / CAST(b.n AS DOUBLE) / 1000000.0) * (a.s15 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s15 / CAST(b.n AS DOUBLE) / 1000000.0)
               + (a.s16 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s16 / CAST(b.n AS DOUBLE) / 1000000.0) * (a.s16 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s16 / CAST(b.n AS DOUBLE) / 1000000.0)
               + (a.s17 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s17 / CAST(b.n AS DOUBLE) / 1000000.0) * (a.s17 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s17 / CAST(b.n AS DOUBLE) / 1000000.0)
               + (a.s18 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s18 / CAST(b.n AS DOUBLE) / 1000000.0) * (a.s18 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s18 / CAST(b.n AS DOUBLE) / 1000000.0)
               + (a.s19 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s19 / CAST(b.n AS DOUBLE) / 1000000.0) * (a.s19 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s19 / CAST(b.n AS DOUBLE) / 1000000.0)
               + (a.s20 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s20 / CAST(b.n AS DOUBLE) / 1000000.0) * (a.s20 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s20 / CAST(b.n AS DOUBLE) / 1000000.0)
               + (a.s21 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s21 / CAST(b.n AS DOUBLE) / 1000000.0) * (a.s21 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s21 / CAST(b.n AS DOUBLE) / 1000000.0)
               + (a.s22 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s22 / CAST(b.n AS DOUBLE) / 1000000.0) * (a.s22 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s22 / CAST(b.n AS DOUBLE) / 1000000.0)
               + (a.s23 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s23 / CAST(b.n AS DOUBLE) / 1000000.0) * (a.s23 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s23 / CAST(b.n AS DOUBLE) / 1000000.0)
               + (a.s24 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s24 / CAST(b.n AS DOUBLE) / 1000000.0) * (a.s24 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s24 / CAST(b.n AS DOUBLE) / 1000000.0)
               + (a.s25 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s25 / CAST(b.n AS DOUBLE) / 1000000.0) * (a.s25 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s25 / CAST(b.n AS DOUBLE) / 1000000.0)
               + (a.s26 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s26 / CAST(b.n AS DOUBLE) / 1000000.0) * (a.s26 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s26 / CAST(b.n AS DOUBLE) / 1000000.0)
               + (a.s27 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s27 / CAST(b.n AS DOUBLE) / 1000000.0) * (a.s27 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s27 / CAST(b.n AS DOUBLE) / 1000000.0)
               + (a.s28 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s28 / CAST(b.n AS DOUBLE) / 1000000.0) * (a.s28 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s28 / CAST(b.n AS DOUBLE) / 1000000.0)
               + (a.s29 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s29 / CAST(b.n AS DOUBLE) / 1000000.0) * (a.s29 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s29 / CAST(b.n AS DOUBLE) / 1000000.0)
               + (a.s30 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s30 / CAST(b.n AS DOUBLE) / 1000000.0) * (a.s30 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s30 / CAST(b.n AS DOUBLE) / 1000000.0)
               + (a.s31 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s31 / CAST(b.n AS DOUBLE) / 1000000.0) * (a.s31 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s31 / CAST(b.n AS DOUBLE) / 1000000.0)
               + (a.s32 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s32 / CAST(b.n AS DOUBLE) / 1000000.0) * (a.s32 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s32 / CAST(b.n AS DOUBLE) / 1000000.0)
               + (a.s33 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s33 / CAST(b.n AS DOUBLE) / 1000000.0) * (a.s33 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s33 / CAST(b.n AS DOUBLE) / 1000000.0)
               + (a.s34 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s34 / CAST(b.n AS DOUBLE) / 1000000.0) * (a.s34 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s34 / CAST(b.n AS DOUBLE) / 1000000.0)
               + (a.s35 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s35 / CAST(b.n AS DOUBLE) / 1000000.0) * (a.s35 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s35 / CAST(b.n AS DOUBLE) / 1000000.0)
               + (a.s36 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s36 / CAST(b.n AS DOUBLE) / 1000000.0) * (a.s36 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s36 / CAST(b.n AS DOUBLE) / 1000000.0)
               + (a.s37 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s37 / CAST(b.n AS DOUBLE) / 1000000.0) * (a.s37 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s37 / CAST(b.n AS DOUBLE) / 1000000.0)
               + (a.s38 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s38 / CAST(b.n AS DOUBLE) / 1000000.0) * (a.s38 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s38 / CAST(b.n AS DOUBLE) / 1000000.0)
               + (a.s39 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s39 / CAST(b.n AS DOUBLE) / 1000000.0) * (a.s39 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s39 / CAST(b.n AS DOUBLE) / 1000000.0)
               + (a.s40 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s40 / CAST(b.n AS DOUBLE) / 1000000.0) * (a.s40 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s40 / CAST(b.n AS DOUBLE) / 1000000.0)
               + (a.s41 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s41 / CAST(b.n AS DOUBLE) / 1000000.0) * (a.s41 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s41 / CAST(b.n AS DOUBLE) / 1000000.0)
               + (a.s42 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s42 / CAST(b.n AS DOUBLE) / 1000000.0) * (a.s42 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s42 / CAST(b.n AS DOUBLE) / 1000000.0)
               + (a.s43 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s43 / CAST(b.n AS DOUBLE) / 1000000.0) * (a.s43 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s43 / CAST(b.n AS DOUBLE) / 1000000.0)
               + (a.s44 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s44 / CAST(b.n AS DOUBLE) / 1000000.0) * (a.s44 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s44 / CAST(b.n AS DOUBLE) / 1000000.0)
               + (a.s45 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s45 / CAST(b.n AS DOUBLE) / 1000000.0) * (a.s45 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s45 / CAST(b.n AS DOUBLE) / 1000000.0)
               + (a.s46 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s46 / CAST(b.n AS DOUBLE) / 1000000.0) * (a.s46 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s46 / CAST(b.n AS DOUBLE) / 1000000.0)
               + (a.s47 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s47 / CAST(b.n AS DOUBLE) / 1000000.0) * (a.s47 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s47 / CAST(b.n AS DOUBLE) / 1000000.0)
               + (a.s48 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s48 / CAST(b.n AS DOUBLE) / 1000000.0) * (a.s48 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s48 / CAST(b.n AS DOUBLE) / 1000000.0)
               + (a.s49 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s49 / CAST(b.n AS DOUBLE) / 1000000.0) * (a.s49 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s49 / CAST(b.n AS DOUBLE) / 1000000.0)
               + (a.s50 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s50 / CAST(b.n AS DOUBLE) / 1000000.0) * (a.s50 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s50 / CAST(b.n AS DOUBLE) / 1000000.0)
               + (a.s51 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s51 / CAST(b.n AS DOUBLE) / 1000000.0) * (a.s51 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s51 / CAST(b.n AS DOUBLE) / 1000000.0)
               + (a.s52 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s52 / CAST(b.n AS DOUBLE) / 1000000.0) * (a.s52 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s52 / CAST(b.n AS DOUBLE) / 1000000.0)
               + (a.s53 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s53 / CAST(b.n AS DOUBLE) / 1000000.0) * (a.s53 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s53 / CAST(b.n AS DOUBLE) / 1000000.0)
               + (a.s54 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s54 / CAST(b.n AS DOUBLE) / 1000000.0) * (a.s54 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s54 / CAST(b.n AS DOUBLE) / 1000000.0)
               + (a.s55 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s55 / CAST(b.n AS DOUBLE) / 1000000.0) * (a.s55 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s55 / CAST(b.n AS DOUBLE) / 1000000.0)
               + (a.s56 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s56 / CAST(b.n AS DOUBLE) / 1000000.0) * (a.s56 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s56 / CAST(b.n AS DOUBLE) / 1000000.0)
               + (a.s57 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s57 / CAST(b.n AS DOUBLE) / 1000000.0) * (a.s57 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s57 / CAST(b.n AS DOUBLE) / 1000000.0)
               + (a.s58 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s58 / CAST(b.n AS DOUBLE) / 1000000.0) * (a.s58 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s58 / CAST(b.n AS DOUBLE) / 1000000.0)
               + (a.s59 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s59 / CAST(b.n AS DOUBLE) / 1000000.0) * (a.s59 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s59 / CAST(b.n AS DOUBLE) / 1000000.0)
               + (a.s60 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s60 / CAST(b.n AS DOUBLE) / 1000000.0) * (a.s60 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s60 / CAST(b.n AS DOUBLE) / 1000000.0)
               + (a.s61 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s61 / CAST(b.n AS DOUBLE) / 1000000.0) * (a.s61 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s61 / CAST(b.n AS DOUBLE) / 1000000.0)
               + (a.s62 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s62 / CAST(b.n AS DOUBLE) / 1000000.0) * (a.s62 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s62 / CAST(b.n AS DOUBLE) / 1000000.0)
               + (a.s63 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s63 / CAST(b.n AS DOUBLE) / 1000000.0) * (a.s63 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s63 / CAST(b.n AS DOUBLE) / 1000000.0)
               + (a.s64 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s64 / CAST(b.n AS DOUBLE) / 1000000.0) * (a.s64 / CAST(a.n AS DOUBLE) / 1000000.0 - b.s64 / CAST(b.n AS DOUBLE) / 1000000.0) AS shift_sq
      FROM sums a JOIN sums b
        ON a.label = b.label AND a.early AND NOT b.early
    )
    SELECT label, n_early, n_late,
           floor(sqrt(shift_sq) * 1000000 + 0.5) / 1000000.0
             AS centroid_shift_l2
    FROM paired
    """,
    "Embedding drift detector: per label, the L2 distance between "
    "the centroid of the even-id and odd-id cohorts (the "
    "time-proxy split every reprocessing pipeline has) — centroids "
    "are computed from MICRO-QUANTIZED integer sums per dimension "
    "(order-free, so the drift column is bit-identical at any "
    "parallelism), and the 64-dim shift folds in dimension order. "
    "A moving centroid flags encoder-version skew or upstream "
    "distribution change BEFORE the ANN recall floors "
    "(`ann_ivf_recall_floor`) silently decay — the vector-space "
    "member of the drift family (PSI prices, Page-Hinkley "
    "revenue, CUSUM changepoints). One grouped aggregate, "
    "label-grid sized.",
    ("ml-data", "drift", "embeddings"),
)
def embedding_drift_centroids(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    halves = emb.select(
        "label",
        (F.col("vec_id") % 2 == 0).alias("early"),
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias(
            "v"
        ),
    )
    dim = 64
    sums = halves.groupBy("label", "early").agg(
        F.count("*").alias("n"),
        *[
            F.sum(
                F.floor(F.element_at(F.col("v"), i) * 1000000).cast("long")
            ).alias(f"s{i}")
            for i in range(1, dim + 1)
        ],
    )
    cents = sums.select(
        "label",
        "early",
        "n",
        F.array(
            *[
                (F.col(f"s{i}").cast("double") / F.col("n") / 1000000.0)
                for i in range(1, dim + 1)
            ]
        ).alias("c"),
    )
    a = cents.filter(F.col("early")).select(
        "label", F.col("n").alias("n_early"), F.col("c").alias("ca")
    )
    b = cents.filter(~F.col("early")).select(
        "label", F.col("n").alias("n_late"), F.col("c").alias("cb")
    )
    shift_sq = F.aggregate(
        F.zip_with(
            F.col("ca"), F.col("cb"), lambda x, y: (x - y) * (x - y)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return a.join(b, "label").select(
        "label",
        F.col("n_early").cast("long").alias("n_early"),
        F.col("n_late").cast("long").alias("n_late"),
        (
            F.floor(F.sqrt(shift_sq) * 1000000 + F.lit(0.5)) / 1000000.0
        ).alias("centroid_shift_l2"),
    )
