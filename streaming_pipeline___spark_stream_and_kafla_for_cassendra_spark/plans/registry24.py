"""Round-3 registry additions, batch 11 — word2vec-style negative
sampling via deterministic inverse-CDF lookup, and a k-anonymity
suppression report.

Same contract as ``registry.py``. Imported at the bottom of
``registry.py``.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import _register, _t


def _r6(col):
    return F.floor(col * 1000000 + F.lit(0.5)) / F.lit(1000000.0)


# ---------------------------------------------------------------------------
# Negative sampling for (doc, token) training pairs — unigram^0.75 CDF
# ---------------------------------------------------------------------------

_NEG_VOCAB = 500
_NEG_SLOTS = 2
_NEG_POSITIONS = (1, 11, 21)
_NEG_SPACE = float(2 ** 60)


@_register(
    "negative_sampling_pairs",
    f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS l
      FROM documents
    ),
    flat AS (SELECT unnest(l) AS tok FROM toks),
    vocab AS MATERIALIZED (
      SELECT tok, cnt, pow(CAST(cnt AS DOUBLE), 0.75) AS w,
             rk
      FROM (
        SELECT tok, CAST(count(*) AS BIGINT) AS cnt,
               row_number() OVER (ORDER BY count(*) DESC, tok ASC) AS rk
        FROM flat GROUP BY tok
      ) WHERE rk <= {_NEG_VOCAB}
    ),
    cdf AS MATERIALIZED (
      SELECT tok, rk,
             sum(w) OVER (ORDER BY rk
                          ROWS UNBOUNDED PRECEDING) - w AS lo,
             sum(w) OVER (ORDER BY rk ROWS UNBOUNDED PRECEDING) AS hi
      FROM vocab
    ),
    tw AS (SELECT max(hi) AS totw FROM cdf),
    pos AS (
      SELECT doc_id, p AS pos_idx, l[p] AS pos_token
      FROM toks, (SELECT unnest([{", ".join(str(p) for p in _NEG_POSITIONS)}])
                  AS p)
      WHERE len(l) >= p
    ),
    draws AS (
      SELECT doc_id, pos_idx, pos_token, s.slot,
             CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':'
                        || CAST(pos_idx AS VARCHAR) || ':'
                        || CAST(s.slot AS VARCHAR)), 1, 15)) AS UBIGINT)
                  AS DOUBLE) / {_NEG_SPACE!r} * tw.totw AS t
      FROM pos
      CROSS JOIN (SELECT unnest(generate_series(0, {_NEG_SLOTS - 1}))
                  AS slot) s
      CROSS JOIN tw
    )
    SELECT d.doc_id, CAST(d.pos_idx AS INTEGER) AS pos_idx, d.pos_token,
           CAST(d.slot AS INTEGER) AS slot, c.tok AS neg_token,
           d.pos_token = c.tok AS collision
    FROM draws d
    JOIN cdf c
      ON (d.t >= c.lo AND d.t < c.hi)
         OR (c.rk = {_NEG_VOCAB} AND d.t >= c.hi)
    """,
    "word2vec-style negative sampling — the training-pair generator "
    "of every embedding pipeline: the corpus top-500 vocabulary "
    "carries unigram^0.75 weights (Mikolov's smoothing), their "
    "running sum forms an inverse-CDF interval table, and for each "
    "(doc, anchor-position, slot) a 60-bit md5 draw maps through "
    "the CDF to a negative token — fully deterministic and "
    "rerun-stable, no RNG state anywhere, so both engines emit the "
    "identical sample. The CDF windows run over the 500-row vocab; "
    "Spark matches draws to intervals with a BUCKETED equi-join "
    "(interval exploded to the 64 hash-space buckets it spans, "
    "draws bucketed by floor(t/totw*64)) so the lookup stays an "
    "equi-shuffle at any corpus size — the oracle states the same "
    "match as a plain range join. Collisions with the anchor are "
    "flagged, not resampled (deterministic either way).",
    ("text", "sampling", "training-data", "documents"),
)
def negative_sampling_pairs(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.filter(
            F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda x: x != ""
        ).alias("l"),
    ).localCheckpoint(eager=False)
    flat = toks.select(F.explode("l").alias("tok"))
    counts = flat.groupBy("tok").agg(F.count("*").alias("cnt"))
    vocab = (
        counts.orderBy(F.col("cnt").desc(), F.col("tok").asc())
        .limit(_NEG_VOCAB)
        .select(
            "tok",
            "cnt",
            F.pow(F.col("cnt").cast("double"), 0.75).alias("w"),
            F.row_number()
            .over(Window.orderBy(F.col("cnt").desc(), F.col("tok").asc()))
            .alias("rk"),
        )
    )
    wcum = Window.orderBy("rk").rowsBetween(Window.unboundedPreceding, 0)
    cdf = vocab.select(
        "tok",
        "rk",
        (F.sum("w").over(wcum) - F.col("w")).alias("lo"),
        F.sum("w").over(wcum).alias("hi"),
    ).localCheckpoint(eager=False)
    tw = cdf.agg(F.max("hi").alias("totw"))
    posidx = F.array(*[F.lit(p) for p in _NEG_POSITIONS])
    pos = (
        toks.select(
            "doc_id", "l", F.explode(posidx).alias("pos_idx")
        )
        .filter(F.size("l") >= F.col("pos_idx"))
        .select(
            "doc_id",
            "pos_idx",
            F.element_at(F.col("l"), F.col("pos_idx")).alias("pos_token"),
        )
    )
    slots = F.array(*[F.lit(s) for s in range(_NEG_SLOTS)])
    draw_h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("doc_id").cast("string"),
                    F.lit(":"),
                    F.col("pos_idx").cast("string"),
                    F.lit(":"),
                    F.col("slot").cast("string"),
                ).cast("binary")
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("double")
    draws = (
        pos.select("doc_id", "pos_idx", "pos_token", F.explode(slots).alias("slot"))
        .crossJoin(F.broadcast(tw))
        .select(
            "doc_id",
            "pos_idx",
            "pos_token",
            "slot",
            (draw_h / F.lit(_NEG_SPACE) * F.col("totw")).alias("t"),
            "totw",
        )
    )
    # bucketed equi-join: interval -> covered buckets, draw -> bucket
    nb = 64
    cdf_b = cdf.crossJoin(F.broadcast(tw)).select(
        "tok",
        "rk",
        "lo",
        "hi",
        F.explode(
            F.sequence(
                F.least(
                    F.floor(F.col("lo") / F.col("totw") * nb).cast("int"),
                    F.lit(nb - 1),
                ),
                F.least(
                    F.floor(F.col("hi") / F.col("totw") * nb).cast("int"),
                    F.lit(nb - 1),
                ),
            )
        ).alias("bucket"),
    )
    draws_b = draws.select(
        "doc_id",
        "pos_idx",
        "pos_token",
        "slot",
        "t",
        F.least(
            F.floor(F.col("t") / F.col("totw") * nb).cast("int"),
            F.lit(nb - 1),
        ).alias("bucket"),
    )
    matched = draws_b.join(F.broadcast(cdf_b), "bucket").filter(
        ((F.col("t") >= F.col("lo")) & (F.col("t") < F.col("hi")))
        | ((F.col("rk") == _NEG_VOCAB) & (F.col("t") >= F.col("hi")))
    )
    return matched.select(
        "doc_id",
        F.col("pos_idx").cast("int").alias("pos_idx"),
        "pos_token",
        F.col("slot").cast("int").alias("slot"),
        F.col("tok").alias("neg_token"),
        (F.col("pos_token") == F.col("tok")).alias("collision"),
    )


# ---------------------------------------------------------------------------
# k-anonymity suppression report over the (nation, segment) quasi-identifier
# ---------------------------------------------------------------------------

_KANON_K = 5


@_register(
    "k_anonymity_report",
    f"""
    WITH cells AS (
      SELECT n.n_name AS nation, c.c_mktsegment AS segment,
             CAST(count(*) AS BIGINT) AS n
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1, 2
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS total,
                   CAST(count(*) AS BIGINT) AS n_cells FROM cells)
    SELECT cells.nation, cells.segment,
           CASE WHEN cells.n >= {_KANON_K} THEN cells.n
                ELSE CAST(NULL AS BIGINT) END AS released_count,
           cells.n < {_KANON_K} AS suppressed,
           tot.n_cells,
           CAST((SELECT coalesce(sum(n), 0) FROM cells c2
                 WHERE c2.n < {_KANON_K}) AS BIGINT)
             AS suppressed_individuals,
           floor((SELECT coalesce(sum(n), 0) FROM cells c2
                  WHERE c2.n < {_KANON_K})
                 / CAST(tot.total AS DOUBLE) * 1000000 + 0.5)
             / 1000000.0 AS suppressed_share
    FROM cells CROSS JOIN tot
    """,
    f"k-anonymity release gate (k={_KANON_K}) over the (nation, "
    "market-segment) quasi-identifier: every cell below k is "
    "suppressed (NULL) rather than released, and the report carries "
    "the global suppression audit — individuals hidden and their "
    "corpus share — the aggregate-release companion to "
    "`pii_redaction_customers` (field-level masking) and "
    "`gdpr_cascade_counts` (erasure planning). One fact-sized "
    "aggregate to a 125-cell grid; the audit is grid arithmetic.",
    ("privacy", "quality", "customer"),
)
def k_anonymity_report(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    cells = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.col("c_mktsegment").alias("segment"),
        )
        .agg(F.count("*").alias("n"))
        .localCheckpoint(eager=False)
    )
    tot = cells.agg(
        F.sum("n").alias("total"),
        F.count("*").alias("n_cells"),
        F.sum(F.when(F.col("n") < _KANON_K, F.col("n")).otherwise(0)).alias(
            "supp"
        ),
    )
    return cells.crossJoin(F.broadcast(tot)).select(
        "nation",
        "segment",
        F.when(F.col("n") >= _KANON_K, F.col("n"))
        .cast("long")
        .alias("released_count"),
        (F.col("n") < _KANON_K).alias("suppressed"),
        F.col("n_cells").cast("long").alias("n_cells"),
        F.col("supp").cast("long").alias("suppressed_individuals"),
        _r6(F.col("supp") / F.col("total").cast("double")).alias(
            "suppressed_share"
        ),
    )
