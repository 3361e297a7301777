"""Round-3 registry additions, batch 17 — cross-document repeated-
substring span extraction, and a Merkle-chain integrity digest over
the event lake partitions.

Same contract as ``registry.py``. Imported at the bottom of
``registry.py``.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import _register, _t

_DUP_N = 8  # n-gram width for the repeated-substring scan


@_register(
    "dup_span_extraction_documents",
    f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS l
      FROM documents
    ),
    grams AS (
      SELECT doc_id,
             unnest(generate_series(1, greatest(len(l) - {_DUP_N - 1}, 0)))
               AS pos,
             unnest(list_transform(
               generate_series(1, greatest(len(l) - {_DUP_N - 1}, 0)),
               i -> array_to_string(l[i:i + {_DUP_N - 1}], ' '))) AS gram
      FROM toks
    ),
    freq AS (
      SELECT gram, CAST(count(*) AS BIGINT) AS f FROM grams GROUP BY 1
    ),
    duppos AS (
      SELECT g.doc_id, g.pos
      FROM grams g JOIN freq ON freq.gram = g.gram
      WHERE freq.f >= 2
    ),
    flagged AS (
      SELECT doc_id, pos,
             CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id
                                            ORDER BY pos) <= {_DUP_N - 1}
                  THEN 0 ELSE 1 END AS newspan
      FROM duppos
    ),
    islands AS (
      SELECT doc_id, pos,
             sum(newspan) OVER (PARTITION BY doc_id ORDER BY pos
                                ROWS UNBOUNDED PRECEDING) AS span_id
      FROM flagged
    ),
    spans AS (
      SELECT doc_id, span_id,
             CAST(min(pos) AS BIGINT) AS s,
             CAST(max(pos) + {_DUP_N - 1} AS BIGINT) AS e
      FROM islands GROUP BY 1, 2
    ),
    per_doc AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_spans,
             CAST(sum(e - s + 1) AS BIGINT) AS dup_tokens
      FROM spans GROUP BY 1
    )
    SELECT t.doc_id, CAST(len(t.l) AS BIGINT) AS n_tokens,
           coalesce(p.n_spans, 0) AS n_spans,
           coalesce(p.dup_tokens, 0) AS dup_tokens,
           CAST(coalesce(p.dup_tokens, 0) * 1000000
                // greatest(len(t.l), 1) AS BIGINT) AS dup_ppm
    FROM toks t LEFT JOIN per_doc p ON p.doc_id = t.doc_id
    WHERE len(t.l) >= {_DUP_N}
    """,
    "Cross-document repeated-substring span extraction — the exact-"
    "substring dedup mechanic (find every maximal span made of "
    f"{_DUP_N}-grams that occur >= 2 times anywhere in the corpus, "
    "the 'memorized boilerplate' a pretraining pipeline strips "
    "BEFORE training instead of after memorization): windowed "
    f"{_DUP_N}-grams with positions, corpus-frequency join, then "
    "gaps-and-islands over duplicated positions (a gap > n-1 "
    "starts a new span, so overlapping gram hits merge into "
    "maximal spans without double-counting tokens). Per doc: span "
    "count, tokens inside duplicated spans, and the duplicated "
    "fraction in ppm. The span-level complement of "
    "`dup_ngram_fraction_documents` (gram-level ratio) and "
    "`dedup_paragraphs_documents` (paragraph granularity); shuffle "
    "keyed on gram then doc, windows per doc.",
    ("text-quality", "dedup", "documents"),
)
def dup_span_extraction_documents(spark, sf_dir):
    from ..operators.scale import spread_for_compute

    d = _t(spark, sf_dir, "documents")
    toks = spread_for_compute(d.select("doc_id", "text")).select(
        "doc_id",
        F.filter(
            F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda x: x != ""
        ).alias("l"),
    ).localCheckpoint(eager=False)
    idx = F.sequence(
        F.lit(1), F.greatest(F.size("l") - (_DUP_N - 1), F.lit(0))
    )
    grams = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                idx,
                lambda i: F.struct(
                    i.alias("pos"),
                    F.array_join(
                        F.slice(F.col("l"), i, _DUP_N), " "
                    ).alias("gram"),
                ),
            )
        ).alias("g"),
    ).select("doc_id", F.col("g.pos").alias("pos"), F.col("g.gram").alias("gram"))
    freq = grams.groupBy("gram").agg(F.count("*").alias("f"))
    duppos = grams.join(
        freq.filter(F.col("f") >= 2).select("gram"), "gram"
    ).select("doc_id", "pos")
    wlag = Window.partitionBy("doc_id").orderBy("pos")
    flagged = duppos.select(
        "doc_id",
        "pos",
        F.when(
            F.col("pos") - F.lag("pos").over(wlag) <= _DUP_N - 1, 0
        )
        .otherwise(1)
        .alias("newspan"),
    )
    wcum = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    islands = flagged.select(
        "doc_id", "pos", F.sum("newspan").over(wcum).alias("span_id")
    )
    spans = islands.groupBy("doc_id", "span_id").agg(
        F.min("pos").alias("s"), (F.max("pos") + (_DUP_N - 1)).alias("e")
    )
    per_doc = spans.groupBy("doc_id").agg(
        F.count("*").alias("n_spans"),
        F.sum(F.col("e") - F.col("s") + 1).alias("dup_tokens"),
    )
    return (
        toks.filter(F.size("l") >= _DUP_N)
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.size("l").cast("long").alias("n_tokens"),
            F.coalesce(F.col("n_spans"), F.lit(0))
            .cast("long")
            .alias("n_spans"),
            F.coalesce(F.col("dup_tokens"), F.lit(0))
            .cast("long")
            .alias("dup_tokens"),
            F.expr(
                "CAST(coalesce(dup_tokens, 0) * 1000000 div "
                "greatest(size(l), 1) AS BIGINT)"
            ).alias("dup_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Merkle-chain integrity digest of the event lake (hour -> day -> root)
# ---------------------------------------------------------------------------

@_register(
    "merkle_chain_events_daily",
    """
    WITH leaves AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(hour(ts) AS INTEGER) AS hr,
             event_id,
             md5(CAST(event_id AS VARCHAR) || '|'
                 || CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS VARCHAR) || '|'
                 || CAST(user_id AS VARCHAR) || '|' || event_type || '|'
                 || CAST(CAST(floor(value * 10000) AS BIGINT) AS VARCHAR)
                 || '|' || coalesce(props, '')) AS rh
      FROM events
    ),
    hours AS (
      SELECT day, hr, CAST(count(*) AS BIGINT) AS n_rows,
             list_reduce(list_prepend('', list(rh ORDER BY event_id)),
                         (a, b) -> md5(a || b)) AS digest
      FROM leaves GROUP BY 1, 2
    ),
    days AS (
      SELECT day, CAST(sum(n_rows) AS BIGINT) AS n_rows,
             list_reduce(list_prepend('', list(digest ORDER BY hr)),
                         (a, b) -> md5(a || b)) AS digest
      FROM hours GROUP BY 1
    ),
    root AS (
      SELECT CAST(NULL AS DATE) AS day,
             CAST(sum(n_rows) AS BIGINT) AS n_rows,
             list_reduce(list_prepend('', list(digest ORDER BY day)),
                         (a, b) -> md5(a || b)) AS digest
      FROM days
    )
    SELECT day, n_rows, digest FROM days
    UNION ALL
    SELECT day, n_rows, digest FROM root
    """,
    "Merkle-chain integrity digest of the event lake — the tamper-"
    "evidence / replication-verification primitive (compare "
    "digests, not data, across replicas or before/after a "
    "migration): every row hashes its full field tuple, hour "
    "partitions chain row hashes in event-id order, day digests "
    "chain the 24 hour digests, and a corpus root chains the days "
    "— any flipped bit anywhere changes its whole path to the "
    "root, and two clusters can verify a 100 TB table by "
    "exchanging one row per partition. Leaf chains are the per-"
    "partition sequential scan any digest requires; the two upper "
    "levels are constant-sized. Bit-exact across engines because "
    "md5 of identical strings is identical.",
    ("quality", "integrity", "lake", "events"),
)
def merkle_chain_events_daily(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    rh = F.md5(
        F.concat_ws(
            "|",
            F.col("event_id").cast("string"),
            F.unix_micros(F.col("ts").cast("timestamp")).cast("string"),
            F.col("user_id").cast("string"),
            F.col("event_type"),
            F.floor(F.col("value") * 10000).cast("long").cast("string"),
            F.coalesce(F.col("props"), F.lit("")),
        ).cast("binary")
    )
    leaves = e.select(
        F.col("ts").cast("date").alias("day"),
        F.hour("ts").cast("int").alias("hr"),
        "event_id",
        rh.alias("rh"),
    )
    hours = leaves.groupBy("day", "hr").agg(
        F.count("*").alias("n_rows"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("event_id", "rh"))),
            F.lit(""),
            lambda a, x: F.md5(F.concat(a, x["rh"]).cast("binary")),
        ).alias("digest"),
    )
    days = hours.groupBy("day").agg(
        F.sum("n_rows").alias("n_rows"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("hr", "digest"))),
            F.lit(""),
            lambda a, x: F.md5(F.concat(a, x["digest"]).cast("binary")),
        ).alias("digest"),
    ).localCheckpoint(eager=False)
    root = days.agg(
        F.sum("n_rows").alias("n_rows"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("day", "digest"))),
            F.lit(""),
            lambda a, x: F.md5(F.concat(a, x["digest"]).cast("binary")),
        ).alias("digest"),
    ).select(
        F.lit(None).cast("date").alias("day"),
        F.col("n_rows").cast("long").alias("n_rows"),
        "digest",
    )
    return days.select(
        "day", F.col("n_rows").cast("long").alias("n_rows"), "digest"
    ).unionAll(root)
