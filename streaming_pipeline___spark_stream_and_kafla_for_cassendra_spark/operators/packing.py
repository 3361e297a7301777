"""Sequence packing — the step between a tokenized corpus and a
training dataloader: pack variable-length documents into fixed-
capacity bins (context windows) so padding waste is bounded.

Exact global first-fit-decreasing is inherently sequential, so the
distributed design shards first: documents hash into bounded shards
(``doc_id % n_shards`` — trivially reproducible, unlike a salted
hash) and exact FFD runs INSIDE each shard as one Arrow-local
sequential pass (the same bounded-sequential-work discipline as the
SemDeDup ε-net). Packing quality loss vs global FFD is the usual
bin-packing tail (< 1 bin per shard); at 100 TB shards bound both
the driver-free sequential scan and the state each task holds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_sequences_ffd(
    df: DataFrame,
    count_col: str,
    id_col: str,
    capacity: int = 256,
    n_shards: int = 8,
) -> DataFrame:
    """First-fit-decreasing bin packing per shard.

    Within a shard, documents are visited by (token count DESC,
    id ASC) and each goes into the FIRST bin whose remaining
    capacity fits it, else opens a new bin; a document larger than
    ``capacity`` opens its own (over-full) bin, which nothing else
    can join. Deterministic: the visit order and first-fit rule are
    total orders, so the DuckDB oracle replays the scan with a
    recursive CTE carrying the per-shard remaining-capacity list.

    Returns (id, n_tokens, shard, bin_in_shard, bin_id) with
    ``bin_id = shard * 1_000_000 + bin_in_shard``.
    """
    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("n_tokens", LongType()),
            StructField("shard", LongType()),
            StructField("bin_in_shard", LongType()),
            StructField("bin_id", LongType()),
        ]
    )
    cap, idc, cc = int(capacity), id_col, count_col

    def pack(pdf):
        import pandas as pd

        pdf = pdf.sort_values(
            [cc, idc], ascending=[False, True]
        ).reset_index(drop=True)
        shard = int(pdf["_shard"].iloc[0])
        rems: list[int] = []
        bins: list[int] = []
        for n in pdf[cc].astype(int):
            placed = None
            for j, r in enumerate(rems):
                if r >= n:
                    placed = j
                    break
            if placed is None:
                rems.append(cap - n)
                placed = len(rems) - 1
            else:
                rems[placed] -= n
            bins.append(placed + 1)  # 1-based, matching the oracle
        return pd.DataFrame(
            {
                idc: pdf[idc].astype("int64"),
                "n_tokens": pdf[cc].astype("int64"),
                "shard": shard,
                "bin_in_shard": bins,
                "bin_id": [shard * 1_000_000 + b for b in bins],
            }
        )

    base = df.select(
        F.col(id_col).alias(idc),
        F.col(count_col).cast("long").alias(cc),
        F.pmod(F.col(id_col), F.lit(int(n_shards))).alias("_shard"),
    )
    return base.groupBy("_shard").applyInPandas(pack, out_schema)
