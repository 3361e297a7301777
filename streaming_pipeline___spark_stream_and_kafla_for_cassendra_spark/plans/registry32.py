"""Round-3 registry additions, batch 19 — columnar encoding size
estimation per row group, and an AND-query posting-list execution
audit.

Same contract as ``registry.py``. Imported at the bottom of
``registry.py``.
"""

from __future__ import annotations

import math

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import _register, _t

_ENC_RG = 1000  # row-group size in orderkeys
_ENC_COLS = (
    ("l_returnflag", 1),
    ("l_linestatus", 1),
    ("l_suppkey", 8),
    ("l_partkey", 8),
)


def _enc_one_sql(col: str, width: int) -> str:
    return f"""
    SELECT '{col}' AS column_name,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT v) AS BIGINT) AS ndv,
           CAST(sum(chg) AS BIGINT) AS n_runs,
           CAST(count(*) * {width} AS BIGINT) AS plain_bytes,
           CAST(count(*)
                * ((CAST(ceil(ln(CAST(greatest(count(DISTINCT v), 2)
                                     AS DOUBLE)) / ln(2.0)) AS BIGINT)
                    + 7) // 8)
                + count(DISTINCT v) * {width} AS BIGINT) AS dict_bytes,
           CAST(sum(chg) * ({width} + 4) AS BIGINT) AS rle_bytes
    FROM (
      SELECT v,
             CASE WHEN v = lag(v) OVER (PARTITION BY rg
                                        ORDER BY l_orderkey, l_linenumber,
                                                 l_partkey, l_suppkey)
                  THEN 0 ELSE 1 END AS chg
      FROM (
        SELECT CAST({col} AS VARCHAR) AS v,
               l_orderkey // {_ENC_RG} AS rg,
               l_orderkey, l_linenumber, l_partkey, l_suppkey
        FROM lineitem
      )
    )
    """


@_register(
    "encoding_size_estimator_lineitem",
    "\nUNION ALL\n".join(_enc_one_sql(c, w) for c, w in _ENC_COLS),
    "Columnar encoding size estimator — the storage-format design "
    "audit behind every parquet writer decision: per column, exact "
    "row/NDV/run counts feed the three textbook encodings (plain = "
    "n x width; dictionary = n x packed-index bits + dictionary; "
    "RLE = runs x (width + run-length header)), with runs counted "
    f"ROW-GROUP-LOCALLY (groups of {_ENC_RG} orderkeys) exactly as "
    "a columnar writer would — the change-detection window "
    "partitions by row group, so no global sort exists at any "
    "scale. Low-cardinality flags should pick dictionary/RLE and "
    "high-cardinality keys plain, and the numbers say by how much "
    "— the physical-layout companion to `zorder_pruning_audit` "
    "(row order) and `compaction_bin_packing_plan` (file sizes).",
    ("layout", "encoding", "storage", "lineitem"),
)
def encoding_size_estimator_lineitem(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").localCheckpoint(eager=False)
    out = None
    for col, width in _ENC_COLS:
        base = li.select(
            F.col(col).cast("string").alias("v"),
            F.expr(f"l_orderkey div {_ENC_RG}").alias("rg"),
            "l_orderkey",
            "l_linenumber",
            "l_partkey",
            "l_suppkey",
        )
        w = Window.partitionBy("rg").orderBy(
            "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"
        )
        chg = F.when(F.col("v") == F.lag("v").over(w), 0).otherwise(1)
        stats = base.select("v", chg.alias("chg")).agg(
            F.count("*").alias("n"),
            F.countDistinct("v").alias("ndv"),
            F.sum("chg").alias("runs"),
        )
        idx_bytes = (
            (
                F.ceil(
                    F.log(F.greatest(F.col("ndv"), F.lit(2)).cast("double"))
                    / math.log(2.0)
                ).cast("long")
                + 7
            )
            / 8
        ).cast("long")
        one = stats.select(
            F.lit(col).alias("column_name"),
            F.col("n").cast("long").alias("n_rows"),
            F.col("ndv").cast("long").alias("ndv"),
            F.col("runs").cast("long").alias("n_runs"),
            (F.col("n") * width).cast("long").alias("plain_bytes"),
            (F.col("n") * idx_bytes + F.col("ndv") * width)
            .cast("long")
            .alias("dict_bytes"),
            (F.col("runs") * (width + 4)).cast("long").alias("rle_bytes"),
        )
        out = one if out is None else out.unionAll(one)
    return out


# ---------------------------------------------------------------------------
# AND-query posting-list execution audit over the token inverted index
# ---------------------------------------------------------------------------

_AND_QUERIES = (
    ("q0", "spark", "batch"),
    ("q1", "merge", "slow"),
    ("q2", "hash", "spark"),
    ("q3", "batch", "merge"),
    ("q4", "slow", "hash"),
)


def _and_query_sql() -> str:
    rows = " UNION ALL ".join(
        f"SELECT '{qid}' AS qid, '{t1}' AS t1, '{t2}' AS t2"
        for qid, t1, t2 in _AND_QUERIES
    )
    return f"""
    WITH postings AS (
      SELECT tok, doc_id FROM (
        SELECT DISTINCT doc_id,
               unnest(list_filter(string_split_regex(lower(text),
                                                     '[^a-z0-9]+'),
                                  x -> x <> '')) AS tok
        FROM documents
      )
    ),
    queries AS ({rows}),
    lens AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS df FROM postings GROUP BY 1
    ),
    inter AS (
      SELECT q.qid, CAST(count(*) AS BIGINT) AS n_hits
      FROM queries q
      JOIN postings p1 ON p1.tok = q.t1
      JOIN postings p2 ON p2.tok = q.t2 AND p2.doc_id = p1.doc_id
      GROUP BY 1
    ),
    tot AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
            FROM postings)
    SELECT q.qid, q.t1, q.t2,
           coalesce(l1.df, 0) AS df1, coalesce(l2.df, 0) AS df2,
           coalesce(i.n_hits, 0) AS n_hits,
           least(coalesce(l1.df, 0), coalesce(l2.df, 0)) AS probe_cost,
           t.n_docs AS scan_cost,
           CAST((t.n_docs - least(coalesce(l1.df, 0), coalesce(l2.df, 0)))
                * 1000000 // t.n_docs AS BIGINT) AS saved_ppm
    FROM queries q
    LEFT JOIN lens l1 ON l1.tok = q.t1
    LEFT JOIN lens l2 ON l2.tok = q.t2
    LEFT JOIN inter i ON i.qid = q.qid
    CROSS JOIN tot t
    """


@_register(
    "boolean_and_query_postings",
    _and_query_sql(),
    "AND-query execution audit over the token inverted index — "
    "search-engine conjunctive retrieval economics: for 5 fixed "
    "two-term queries, the posting lengths (document frequencies), "
    "the exact intersection size (doc-keyed posting join — the "
    "distributed equivalent of a merge intersection), and the "
    "driving cost comparison: probing the SHORTER posting list vs "
    "scanning the corpus, with the saving in ppm. This is the "
    "query-side companion to `inverted_index_tokens` (which builds "
    "the index) and `bm25_search_documents` (ranked retrieval); "
    "the smallest-list-first rule here is the same selectivity "
    "ordering a CBO applies to conjunctive predicates. Postings "
    "shuffle once on token; the intersection joins on doc_id.",
    ("search", "index", "documents"),
)
def boolean_and_query_postings(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    postings = (
        d.select(
            "doc_id",
            F.explode(
                F.filter(
                    F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
                    lambda x: x != "",
                )
            ).alias("tok"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    queries = spark.createDataFrame(
        list(_AND_QUERIES), "qid string, t1 string, t2 string"
    )
    lens = postings.groupBy("tok").agg(F.count("*").alias("df"))
    p1 = postings.select(F.col("tok").alias("t1"), F.col("doc_id").alias("d1"))
    p2 = postings.select(F.col("tok").alias("pt2"), F.col("doc_id").alias("d2"))
    inter = (
        F.broadcast(queries)
        .join(p1, "t1")
        .join(
            p2,
            (F.col("pt2") == F.col("t2")) & (F.col("d2") == F.col("d1")),
        )
        .groupBy("qid")
        .agg(F.count("*").alias("n_hits"))
    )
    tot = postings.agg(F.countDistinct("doc_id").alias("n_docs"))
    l1 = lens.select(F.col("tok").alias("t1"), F.col("df").alias("df1"))
    l2 = lens.select(F.col("tok").alias("t2"), F.col("df").alias("df2"))
    probe = F.least(
        F.coalesce(F.col("df1"), F.lit(0)), F.coalesce(F.col("df2"), F.lit(0))
    )
    return (
        queries.join(F.broadcast(l1), "t1", "left")
        .join(F.broadcast(l2), "t2", "left")
        .join(F.broadcast(inter), "qid", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "qid",
            "t1",
            "t2",
            F.coalesce(F.col("df1"), F.lit(0)).cast("long").alias("df1"),
            F.coalesce(F.col("df2"), F.lit(0)).cast("long").alias("df2"),
            F.coalesce(F.col("n_hits"), F.lit(0))
            .cast("long")
            .alias("n_hits"),
            probe.cast("long").alias("probe_cost"),
            F.col("n_docs").cast("long").alias("scan_cost"),
            F.expr(
                "CAST((n_docs - least(coalesce(df1, 0), coalesce(df2, 0))) "
                "* 1000000 div n_docs AS BIGINT)"
            ).alias("saved_ppm"),
        )
    )
