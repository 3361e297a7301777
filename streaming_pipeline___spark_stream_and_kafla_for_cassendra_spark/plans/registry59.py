"""Round-8 queries: scale-tier demonstrations.

`blocking_scaled_key_pairs` is the 100 TB tier of the entity-
resolution blocking family. `blocking_candidate_pairs` documents the
contract ("the block key is the difference between O(n²) and
O(Σ blk²)") but its key — first name token × brand — has FIXED
entropy, so block sizes grow linearly with the table and per-block
quadratic cost grows with them (the r8 quadratic probe measured its
candidate space quadratic even though the true answer is linear).
This query is the same pipeline with a key whose entropy scales with
the name space (first TWO tokens × brand): block sizes stay bounded
as the table grows, so candidate cost is O(n) per fixed universe —
the plan you'd actually run at 100 TB, alongside the loose-key tier
kept for recall audits.

Reference parity: the reference engine has no entity-resolution
surface (its executable core is one streaming job,
spark-streaming/multi_source_streaming_processor.py); this family is
an engine addition for training-data pipelines (SURVEY.md §2
additions table).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import _register, _t


@_register(
    "blocking_scaled_key_pairs",
    """
    WITH b AS (
      SELECT p_partkey, p_name,
             split_part(p_name, ' ', 1) AS tok1,
             split_part(p_name, ' ', 2) AS tok2,
             p_brand
      FROM part
    )
    SELECT a.p_partkey AS key_a, c.p_partkey AS key_b,
           CAST(levenshtein(a.p_name, c.p_name) AS INTEGER) AS edit_dist
    FROM b a JOIN b c
      ON a.tok1 = c.tok1 AND a.tok2 = c.tok2 AND a.p_brand = c.p_brand
     AND a.p_partkey < c.p_partkey
    WHERE levenshtein(a.p_name, c.p_name) <= 2
    """,
    "Entity-resolution blocking, scalable-key tier: candidates come "
    "from an equi-join on (first token, second token, brand) — key "
    "entropy grows with the name space, so block sizes stay BOUNDED "
    "as the table scales and the per-block quadratic verifier cost "
    "stays O(n)·avg_blk instead of O(n²/blocks). Trades recall (ed≤2 "
    "edits inside the first two tokens move a record out of its "
    "block) for a plan that survives 100 TB; run beside the loose-"
    "key tier (blocking_candidate_pairs) when auditing recall. Same "
    "shuffle shape: one hash partition by composite key, no "
    "cross product.",
    ("join", "text", "similarity", "dedup"),
)
def blocking_scaled_key_pairs(spark, sf_dir):
    p = _t(spark, sf_dir, "part").select(
        "p_partkey",
        "p_name",
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("tok1"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)).alias("tok2"),
        "p_brand",
    )
    a = p.select(
        F.col("p_partkey").alias("key_a"),
        F.col("p_name").alias("name_a"),
        "tok1",
        "tok2",
        "p_brand",
    )
    c = p.select(
        F.col("p_partkey").alias("key_b"),
        F.col("p_name").alias("name_b"),
        "tok1",
        "tok2",
        "p_brand",
    )
    return (
        a.join(c, ["tok1", "tok2", "p_brand"])
        .filter(F.col("key_a") < F.col("key_b"))
        .withColumn(
            "edit_dist", F.levenshtein("name_a", "name_b").cast("int")
        )
        .filter(F.col("edit_dist") <= 2)
        .select("key_a", "key_b", "edit_dist")
    )
