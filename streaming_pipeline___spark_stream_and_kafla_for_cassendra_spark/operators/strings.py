"""String-similarity self-join: edit distance ≤ k without the cross
product.

The record-linkage workhorse (typo-tolerant matching of names, SKUs,
addresses) that neither an equi-join nor the set-similarity family
(Jaccard/containment over token sets) expresses: Levenshtein distance
is positional. The scalable shape is the classic q-gram count
filter:

* one edit operation changes at most ``q`` of a string's distinct
  q-grams, so strings within distance ``k`` must share at least
  ``max(|G(a)|, |G(b)|) − k·q`` distinct q-grams;
* candidates therefore come from an inverted-index equi-join on
  q-grams (shuffle keyed on gram, quadratic only within a gram's
  posting list) plus that shared-gram COUNT filter and a length
  filter — all lossless;
* only surviving candidates pay the O(len²) Levenshtein verify,
  which runs as JVM codegen (``F.levenshtein``), never Python.

At corpus scale, stop-gram pruning (drop the most frequent grams
from the index the way the Jaccard miner prunes common shingles)
bounds posting lists; the count threshold must then be relaxed by
the number of dropped grams per string.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_qgrams(df: DataFrame, text_col: str, q: int = 2) -> DataFrame:
    """Adds ``_grams`` (distinct q-grams) and ``_ng`` (gram count) —
    pure codegen: sequence → transform(substring) → array_distinct."""
    return df.withColumn(
        "_grams",
        F.expr(
            f"array_distinct(transform("
            f"sequence(1, greatest(length({text_col}) - {q} + 1, 1)),"
            f" i -> substring({text_col}, i, {q})))"
        ),
    ).withColumn("_ng", F.size("_grams"))


def deletion_neighborhood_self_join(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_dist: int = 2,
) -> DataFrame:
    """All pairs (id_a < id_b) with Levenshtein ≤ ``max_dist`` via
    SYMMETRIC-DELETE (SymSpell) blocking — the scalable path when the
    corpus is built from a SMALL vocabulary (product names, SKUs,
    addresses from street dictionaries), where q-gram posting lists
    collapse into huge buckets and the count-filter join goes
    quadratic (the `edit_distance_pairs_parts` lesson: 305 s at
    sf0.1 on the q-gram path, seconds here).

    SymSpell lemma: ed(a, b) ≤ k ⟹ the ≤k-deletion neighborhoods
    D_k(a) and D_k(b) intersect (delete-distance never exceeds edit
    distance) — so joining on 64-bit hashes of deletion variants is
    a LOSSLESS candidate generator, including degenerate short
    strings (both reach the empty-string variant), with no count
    filter and no short-string stratum needed. Each string emits
    O(n^k) variants (k=2, n=30 → ~466 hashed longs); bucket width
    tracks TRUE near-duplicate density, not vocabulary collision.
    Candidates verify with one codegen ``F.levenshtein``.
    """
    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        [StructField("_id", LongType()), StructField("_h", LongType())]
    )
    k = int(max_dist)
    txt, idc = text_col, id_col

    def gen(batches):
        import hashlib

        import pandas as pd

        def h64(s: str) -> int:
            return int.from_bytes(
                hashlib.md5(s.encode()).digest()[:8], "big", signed=True
            )

        for pdf in batches:
            ids, hs = [], []
            for rid, s in zip(pdf[idc], pdf[txt]):
                s = s or ""
                frontier = {s}
                variants = {s}
                for _ in range(k):
                    nxt = set()
                    for v in frontier:
                        for i in range(len(v)):
                            nxt.add(v[:i] + v[i + 1 :])
                    nxt -= variants
                    variants |= nxt
                    frontier = nxt
                for v in variants:
                    ids.append(rid)
                    hs.append(h64(v))
            yield pd.DataFrame({"_id": ids, "_h": hs})

    base = df.select(
        F.col(id_col).alias(idc), F.col(text_col).alias(txt)
    )
    var = base.mapInPandas(gen, out_schema).localCheckpoint(eager=False)
    cand = (
        var.alias("va")
        .join(
            var.alias("vb"),
            on=[
                F.col("va._h") == F.col("vb._h"),
                F.col("va._id") < F.col("vb._id"),
            ],
        )
        .select(F.col("va._id").alias("id_a"), F.col("vb._id").alias("id_b"))
        .distinct()
    )
    names = base.select(F.col(idc).alias("_nid"), F.col(txt).alias("_ntxt"))
    return (
        cand.join(
            names.select(
                F.col("_nid").alias("id_a"), F.col("_ntxt").alias("ta")
            ),
            "id_a",
        )
        .join(
            names.select(
                F.col("_nid").alias("id_b"), F.col("_ntxt").alias("tb")
            ),
            "id_b",
        )
        .withColumn("edit_distance", F.levenshtein("ta", "tb"))
        .filter(F.col("edit_distance") <= max_dist)
        .select(
            "id_a",
            "id_b",
            F.col("edit_distance").cast("int").alias("edit_distance"),
        )
    )


def edit_distance_self_join(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_dist: int = 2,
    q: int = 2,
    method: str = "qgram",
) -> DataFrame:
    """All pairs (id_a < id_b) with Levenshtein(text_a, text_b) ≤
    ``max_dist``, via length + q-gram count pruning and a codegen
    verify. Returns (id_a, id_b, edit_distance).

    Losslessness needs one carve-out the count filter alone cannot
    give: when BOTH strings have ≤ ``max_dist·q`` distinct grams
    (very short strings — e.g. 'ab' vs 'cd' at q=2, k=2), a true
    pair may share ZERO grams and never reach the inverted index.
    Those rows form a bounded "short stratum" (length ≲ q·(k+1)),
    which is paired exhaustively (length-filtered nested-loop —
    the stratum is tiny by construction: there are only |Σ|^len
    such strings) and unioned with the pruned path, which keeps
    every pair where at least one side is long (threshold ≥ 1 gram
    shared, guaranteed by the q-gram lemma). The two legs are
    disjoint (the pruned leg drops short–short pairs), so no
    dedup shuffle is added.

    ``method="deletes"`` dispatches to
    :func:`deletion_neighborhood_self_join` (SymSpell blocking) —
    same output, the right choice for low-diversity vocabularies
    where gram buckets collide."""
    if method == "deletes":
        return deletion_neighborhood_self_join(
            df, text_col, id_col, max_dist
        )
    if method != "qgram":
        raise ValueError(f"unknown method {method!r}")
    base = with_qgrams(
        df.select(
            F.col(id_col).alias("_id"),
            F.col(text_col).alias("_txt"),
            F.length(text_col).alias("_len"),
        ),
        "_txt",
        q,
    )
    inv = base.select("_id", "_len", "_ng", F.explode("_grams").alias("_g"))
    a = inv.select(
        F.col("_id").alias("id_a"),
        F.col("_len").alias("la"),
        F.col("_ng").alias("na"),
        "_g",
    )
    b = inv.select(
        F.col("_id").alias("id_b"),
        F.col("_len").alias("lb"),
        F.col("_ng").alias("nb"),
        "_g",
    )
    short_thresh = max_dist * q
    pruned = (
        a.join(b, "_g")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(F.abs(F.col("la") - F.col("lb")) <= max_dist)
        # short–short pairs are handled exhaustively below; dropping
        # them here keeps the union disjoint (no distinct needed)
        .filter(
            (F.col("na") > short_thresh) | (F.col("nb") > short_thresh)
        )
        .groupBy("id_a", "id_b", "na", "nb")
        .agg(F.count("*").alias("_shared"))
        .filter(
            F.col("_shared")
            >= F.greatest(F.col("na"), F.col("nb")) - short_thresh
        )
        .select("id_a", "id_b")
    )
    shorts = base.filter(F.col("_ng") <= short_thresh)
    sa = shorts.select(
        F.col("_id").alias("id_a"), F.col("_len").alias("la")
    )
    sb = shorts.select(
        F.col("_id").alias("id_b"), F.col("_len").alias("lb")
    )
    short_pairs = sa.join(
        sb,
        (F.col("id_a") < F.col("id_b"))
        & (F.abs(F.col("la") - F.col("lb")) <= max_dist),
    ).select("id_a", "id_b")
    candidates = pruned.unionByName(short_pairs)
    names = base.select("_id", "_txt")
    return (
        candidates.join(
            names.select(F.col("_id").alias("id_a"), F.col("_txt").alias("ta")),
            "id_a",
        )
        .join(
            names.select(F.col("_id").alias("id_b"), F.col("_txt").alias("tb")),
            "id_b",
        )
        .withColumn("edit_distance", F.levenshtein("ta", "tb"))
        .filter(F.col("edit_distance") <= max_dist)
        .select(
            "id_a",
            "id_b",
            F.col("edit_distance").cast("int").alias("edit_distance"),
        )
    )
