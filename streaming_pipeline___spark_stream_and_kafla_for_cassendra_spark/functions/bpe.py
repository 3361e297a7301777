"""Distributed BPE (byte-pair-encoding) vocabulary induction.

The engine's token statistics so far (``token_count``,
``bpe_ish_token_count``) ESTIMATE subword counts with a regex; a real
training-data pipeline LEARNS its tokenizer from the corpus (Sennrich
et al. 2016). This module trains actual BPE merge rules with Spark
doing the counting.

Scale design — the standard factorization that makes BPE tractable:

* Merge learning never touches the raw corpus after ONE distributed
  pass that reduces it to the **word-frequency table** (distinct
  word → count). Pair statistics over words weighted by count are
  identical to pair statistics over the corpus, and the word table
  is vocabulary-sized (Heaps' law: ~√corpus), not corpus-sized.
* Each merge iteration is (a) an in-row adjacent-pair explode +
  weighted groupBy-sum (one #distinct-pairs-sized shuffle), and
  (b) an Arrow-batched merge application over the word table —
  zero shuffle. Lineage is truncated per iteration with
  ``localCheckpoint`` so iteration k never recomputes merges 1..k-1.
* Tie-breaking is total and deterministic: max (count, then
  lexicographically smallest (left, right)) — reruns and partition
  layouts cannot reorder the merge sequence.
* ``bpe_encode`` applies the learned merges corpus-wide in one
  broadcast + mapInPandas pass.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .text import tokens

_WORD_SCHEMA = StructType(
    [
        StructField("syms", ArrayType(StringType())),
        StructField("cnt", LongType()),
    ]
)


def _make_merge_applier(left: str, right: str):
    """Left-to-right single-rule merge over symbol lists.

    Returned as a self-contained closure (pickled BY VALUE) — a
    module-level helper would pickle by reference and fail on
    executors whose interpreter can't import this package (driver
    launched from a foreign cwd)."""
    merged = left + right

    def apply_all(syms_list):
        out = []
        for syms in syms_list:
            res = []
            i, n = 0, len(syms)
            while i < n:
                if i + 1 < n and syms[i] == left and syms[i + 1] == right:
                    res.append(merged)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            out.append(res)
        return out

    return apply_all


def word_table(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One corpus pass → (symbol array = chars, word count)."""
    words = df.select(F.explode(tokens(F.col(text_col))).alias("w"))
    return (
        words.groupBy("w")
        .agg(F.count("*").cast("long").alias("cnt"))
        .select(
            F.expr(
                "transform(sequence(1, length(w)),"
                " i -> substring(w, i, 1))"
            ).alias("syms"),
            "cnt",
        )
    )


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 30,
    min_pair_count: int = 2,
) -> list[tuple[str, str, int]]:
    """Learn up to ``num_merges`` BPE merges; returns
    ``[(left, right, weighted_pair_count), ...]`` in learned order.
    Stops early when no adjacent pair reaches ``min_pair_count``.
    """
    spark = df.sparkSession
    wt = word_table(df, text_col).localCheckpoint(eager=False)
    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        pairs = (
            wt.filter(F.size("syms") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(syms) - 1),"
                        " i -> struct(syms[i-1] AS l, syms[i] AS r))"
                    )
                ).alias("p"),
                "cnt",
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("cnt").alias("n"))
        )
        best = (
            pairs.orderBy(F.desc("n"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["n"] < min_pair_count:
            break
        left, right, n = best[0]["l"], best[0]["r"], int(best[0]["n"])
        merges.append((left, right, n))

        applier = _make_merge_applier(left, right)

        def apply(batches: Iterator[pd.DataFrame], _ap=applier):
            for pdf in batches:
                if len(pdf):
                    pdf = pdf.assign(syms=_ap(list(pdf["syms"])))
                yield pdf

        wt = wt.mapInPandas(apply, schema=_WORD_SCHEMA).localCheckpoint(
            eager=False
        )
    return merges


def merges_df(spark: SparkSession, merges) -> DataFrame:
    return spark.createDataFrame(
        [
            (i + 1, l, r, n)
            for i, (l, r, n) in enumerate(merges)
        ],
        StructType(
            [
                StructField("merge_rank", IntegerType()),
                StructField("left", StringType()),
                StructField("right", StringType()),
                StructField("pair_count", LongType()),
            ]
        ),
    )


def bpe_encode(
    df: DataFrame,
    merges,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenize the corpus with the learned merges (broadcast rules,
    one Arrow pass, zero shuffle). Returns (id, n_bpe_tokens,
    n_words)."""
    spark = df.sparkSession
    b_merges = spark.sparkContext.broadcast([(l, r) for l, r, _ in merges])
    out_schema = StructType(
        [
            df.schema[id_col],
            StructField("n_bpe_tokens", IntegerType()),
            StructField("n_words", IntegerType()),
        ]
    )
    toked = df.select(id_col, tokens(F.col(text_col)).alias("_w"))

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rules = b_merges.value
        # rank lookup lets each word apply only applicable merges in
        # learned order (the reference greedy-by-rank algorithm)
        rank = {pair: i for i, pair in enumerate(rules)}
        def enc_word(w: str) -> int:
            syms = list(w)
            while len(syms) >= 2:
                cand = [
                    rank[p] for p in zip(syms, syms[1:]) if p in rank
                ]
                if not cand:
                    break
                l, r = rules[min(cand)]
                res, i = [], 0
                while i < len(syms):
                    if (
                        i + 1 < len(syms)
                        and syms[i] == l
                        and syms[i + 1] == r
                    ):
                        res.append(l + r)
                        i += 2
                    else:
                        res.append(syms[i])
                        i += 1
                syms = res
            return len(syms)

        for pdf in batches:
            if not len(pdf):
                continue
            n_bpe = [
                sum(enc_word(w) for w in ws) for ws in pdf["_w"]
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bpe_tokens": pd.array(n_bpe, dtype="int32"),
                    "n_words": pd.array(
                        [len(ws) for ws in pdf["_w"]], dtype="int32"
                    ),
                }
            )

    return toked.mapInPandas(encode, schema=out_schema)
