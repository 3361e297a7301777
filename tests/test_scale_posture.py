"""Executable scale-posture evidence: the two cluster-side join
strategies the registry docstrings lean on, demonstrated against the
real planner rather than asserted in prose.

* Bucketed tables co-locate their join: two tables bucketed on the
  same key into the same bucket count sort-merge-join with ZERO
  exchanges — the 100 TB fact-to-fact pattern.
* AQE splits a skewed join partition at runtime — the safety net the
  salting-free queries rely on for moderately skewed keys.
"""

from __future__ import annotations

import uuid

import pytest

from pyspark.sql import functions as F


def _executed_plan(df):
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def conf_guard(spark):
    keys = [
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.enabled",
        "spark.sql.adaptive.skewJoin.enabled",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.coalescePartitions.enabled",
    ]
    saved = {}
    for k in keys:
        try:
            saved[k] = spark.conf.get(k)
        except Exception:  # noqa: BLE001
            saved[k] = None
    yield spark
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_bucketed_tables_join_without_exchange(conf_guard):
    spark = conf_guard
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    a = f"bkt_a_{uuid.uuid4().hex[:8]}"
    b = f"bkt_b_{uuid.uuid4().hex[:8]}"
    try:
        left = spark.range(0, 10000).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("va")
        )
        right = spark.range(0, 10000).select(
            F.col("id").alias("k"), (F.col("id") % 11).alias("vb")
        )
        for name, df in ((a, left), (b, right)):
            (
                df.write.format("parquet")
                .bucketBy(8, "k")
                .sortBy("k")
                .mode("overwrite")
                .saveAsTable(name)
            )
        joined = spark.table(a).join(spark.table(b), "k")
        plan = _executed_plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, (
            "bucketed co-located join must not shuffle either side:\n"
            + plan
        )
        assert joined.count() == 10000
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {a}")
        spark.sql(f"DROP TABLE IF EXISTS {b}")


def test_unbucketed_twin_does_shuffle(conf_guard):
    """Control: the identical join WITHOUT bucketing exchanges both
    sides — proving the bucketed test above measured the layout, not
    the planner's mood."""
    spark = conf_guard
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    left = spark.range(0, 10000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("va")
    )
    right = spark.range(0, 10000).select(
        F.col("id").alias("k"), (F.col("id") % 11).alias("vb")
    )
    plan = _executed_plan(left.join(right, "k"))
    assert "Exchange" in plan


def test_aqe_splits_skewed_join_partition(conf_guard):
    spark = conf_guard
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB"
    )
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB"
    )
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    # one pathological key holding ~95% of the left side
    skewed = spark.range(0, 40000).select(
        F.when(F.col("id") % 20 != 0, F.lit(7))
        .otherwise(F.col("id"))
        .alias("k"),
        F.sha2(F.col("id").cast("string"), 256).alias("pad"),
    )
    dim = spark.range(0, 40000).select(
        F.col("id").alias("k"),
        F.sha2((F.col("id") + 1).cast("string"), 256).alias("pad2"),
    )
    joined = skewed.join(dim, "k")
    plan = _executed_plan(joined)
    assert "skew=true" in plan, (
        "AQE should mark the sort-merge join skew-handled:\n" + plan
    )


# ---------------------------------------------------------------------------
# round 8: spread_for_compute — parallelize single-split compute
# passes locally, provably a no-op on an already-wide input
# ---------------------------------------------------------------------------


def test_spread_for_compute_widens_narrow_input(spark):
    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.operators.scale import (
        spread_for_compute,
    )

    narrow = spark.range(0, 1000).coalesce(1)
    assert narrow.rdd.getNumPartitions() == 1
    spread = spread_for_compute(narrow)
    assert (
        spread.rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )
    # row-preserving: same ids, nothing dropped or duplicated
    assert sorted(r["id"] for r in spread.collect()) == list(range(1000))


def test_spread_for_compute_noop_when_wide(spark):
    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.operators.scale import (
        spread_for_compute,
    )

    par = spark.sparkContext.defaultParallelism
    wide = spark.range(0, 1000, numPartitions=par + 4)
    out = spread_for_compute(wide)
    # already at/above target parallelism: the SAME plan comes back —
    # no exchange is added (the 100 TB posture)
    assert out is wide


def test_winnow_dense_tier_fills_cluster(spark):
    """The dense-tier block count floors at the smallest B with
    B(B+1)/2 >= defaultParallelism, so the matmul stage has at least
    one block-pair task per core on small corpora."""
    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.operators.dedup import (
        fingerprint_overlap_pairs,
    )

    rows = [(i, h) for i in range(60) for h in (i % 7, i % 5, 40 + i % 3)]
    fps = spark.createDataFrame(rows, "doc_id long, fingerprint long")
    out = fingerprint_overlap_pairs(fps, id_col="doc_id", threshold=0.5)
    # correctness unchanged by the extra blocks: symmetric, exact
    got = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert all(a < b for a, b in got)
    assert got, "dense tier should still find overlapping docs"
