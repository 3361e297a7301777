"""Bucketed co-located joins and salted skew joins — the plan-level
proof that the scale techniques do what PLANS.md claims."""

from __future__ import annotations

import contextlib
import io

import pytest

from pyspark.sql import functions as F

from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.operators.scale import (
    salted_join,
    save_bucketed,
)


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    left = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a")
    )
    right = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("b")
    )
    save_bucketed(left, "t_left_bkt", "k", 4, path=str(tmp_path / "l"))
    save_bucketed(right, "t_right_bkt", "k", 4, path=str(tmp_path / "r"))
    try:
        l, r = spark.table("t_left_bkt"), spark.table("t_right_bkt")
        # force a sort-merge join so the bucket co-location is what
        # removes the exchanges (not a broadcast)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = l.join(r, "k")
            plan = _plan(joined)
            assert "SortMergeJoin" in plan
            assert "(Exchange" not in plan and ") Exchange" not in plan.replace(
                "ReusedExchange", ""
            )
            assert joined.count() == 10_000
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64MB")
    finally:
        spark.sql("DROP TABLE IF EXISTS t_left_bkt")
        spark.sql("DROP TABLE IF EXISTS t_right_bkt")


def test_salted_join_matches_plain_join(spark):
    # skew: key 7 carries 5000 rows; dim has one row per key
    big = spark.createDataFrame(
        [(7 if i % 2 else i % 50, i) for i in range(10_000)], "k int, v int"
    )
    small = spark.createDataFrame(
        [(i, f"dim{i}") for i in range(50)], "k int, name string"
    )
    plain = big.join(small, "k").groupBy("k").count()
    salted = salted_join(big, small, "k").groupBy("k").count()
    assert {(r.k, r["count"]) for r in salted.collect()} == {
        (r.k, r["count"]) for r in plain.collect()
    }


def test_salted_left_join_keeps_unmatched(spark):
    big = spark.createDataFrame([(1, "x"), (2, "y")], "k int, v string")
    small = spark.createDataFrame([(1, "dim1")], "k int, name string")
    got = {
        r.k: r.name for r in salted_join(big, small, "k", how="left").collect()
    }
    assert got == {1: "dim1", 2: None}


def test_salted_join_rejects_right_joins(spark):
    df = spark.createDataFrame([(1, 1)], "k int, v int")
    with pytest.raises(ValueError):
        salted_join(df, df, "k", how="full")


def test_zorder_layout_shrinks_bounding_boxes_on_both_dims(spark, tmp_path):
    """Z-order clustering vs single-column sort: per-file (x,y)
    bounding-box area must shrink dramatically, enabling footer-based
    skipping for predicates on EITHER dimension."""
    import glob

    import duckdb

    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.operators.scale import (
        zorder_value,
    )

    grid = (
        spark.range(256 * 256)
        .select(
            (F.col("id") % 256).alias("x"),
            (F.col("id") / 256).cast("long").alias("y"),
        )
    )

    def avg_spans(path):
        xs, ys = [], []
        for f in glob.glob(path + "/*.parquet"):
            xmin, xmax, ymin, ymax = duckdb.sql(
                f"SELECT min(x), max(x), min(y), max(y) FROM read_parquet('{f}')"
            ).fetchone()
            xs.append(xmax - xmin + 1)
            ys.append(ymax - ymin + 1)
        return sum(xs) / len(xs), sum(ys) / len(ys)

    xsort = str(tmp_path / "xsort")
    (
        grid.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.parquet(xsort)
    )
    zsort = str(tmp_path / "zsort")
    (
        grid.withColumn("_z", zorder_value(F.col("x"), F.col("y")))
        .repartitionByRange(16, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.parquet(zsort)
    )
    # x-sorted files are tight on x but span the FULL y domain in
    # every file — a y-predicate can never skip. Z-ordered files keep
    # BOTH spans well below the domain (≈ square-ish tiles), so
    # selective predicates on either column skip files.
    x_span_xsort, y_span_xsort = avg_spans(xsort)
    x_span_z, y_span_z = avg_spans(zsort)
    assert y_span_xsort == 256          # the degenerate dimension
    assert y_span_z < 0.6 * 256
    assert x_span_z < 0.6 * 256


# ---------------------------------------------------------------------------
# file-level min/max skipping (lakehouse manifest-stats emulation)
# ---------------------------------------------------------------------------

def test_file_stats_pruned_read_skips_files_and_matches_full_scan(spark, tmp_path):
    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.operators.scale import (
        collect_file_stats,
        pruned_read,
    )

    path = str(tmp_path / "facts")
    df = spark.range(0, 100_000).withColumn("v", (F.col("id") * 7) % 100_000)
    # range-layout on v so per-file [min,max] boxes are tight
    df.repartitionByRange(10, "v").write.parquet(path)

    stats = collect_file_stats(spark, path, ["v"]).localCheckpoint()
    n_files = stats.count()
    assert n_files == 10

    lo, hi = 20_000, 29_999
    pruned = pruned_read(spark, path, stats, "v", lo, hi)
    full = spark.read.parquet(path).where((F.col("v") >= lo) & (F.col("v") <= hi))

    # opens a strict subset of files...
    assert 0 < len(pruned.inputFiles()) < n_files
    # ...and never changes the answer
    assert pruned.count() == full.count() == 10_000
    assert pruned.agg(F.sum("v")).first()[0] == full.agg(F.sum("v")).first()[0]


def test_pruned_read_empty_range_keeps_schema(spark, tmp_path):
    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.operators.scale import (
        collect_file_stats,
        pruned_read,
    )

    path = str(tmp_path / "facts2")
    spark.range(0, 1000).withColumn("v", F.col("id")).write.parquet(path)
    stats = collect_file_stats(spark, path, ["v"])
    out = pruned_read(spark, path, stats, "v", 10_000, 20_000)
    assert out.count() == 0
    assert set(out.columns) == {"id", "v"}


# ---------------------------------------------------------------------------
# runtime bloom-filter join injection (Catalyst runtime filtering)
# ---------------------------------------------------------------------------

def test_runtime_bloom_filter_injected_on_selective_join(spark, tmp_path):
    fact_path = str(tmp_path / "bloom_fact")
    dim_path = str(tmp_path / "bloom_dim")
    spark.range(0, 200_000).withColumn("k", F.col("id") % 1000).write.parquet(
        fact_path
    )
    spark.range(0, 1000).withColumn(
        "cat", F.when(F.col("id") < 10, "hot").otherwise("cold")
    ).write.parquet(dim_path)

    confs = {
        # force the shuffle-join path (broadcast joins use DPP/reuse
        # instead) and drop the size gates so the tiny test tables
        # qualify for injection
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        fact = spark.read.parquet(fact_path)
        dim = spark.read.parquet(dim_path).where(F.col("cat") == "hot")
        joined = fact.join(dim, fact["k"] == dim["id"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan.lower(), plan[:2000]
        # the filter is an optimization only: result stays exact
        assert joined.count() == 200_000 // 1000 * 10
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


# ---------------------------------------------------------------------------
# dynamic partition pruning on a date-partitioned lake layout
# ---------------------------------------------------------------------------

def test_dynamic_partition_pruning_on_partitioned_fact(spark, tmp_path):
    fact_path = str(tmp_path / "dpp_fact")
    (
        spark.range(0, 50_000)
        .withColumn("d", (F.col("id") % 20).cast("int"))
        .withColumn("v", F.col("id") * 2)
        .write.partitionBy("d")
        .parquet(fact_path)
    )
    dim = spark.createDataFrame(
        [(i, "keep" if i < 2 else "drop") for i in range(20)], ["dk", "flag"]
    )

    fact = spark.read.parquet(fact_path)
    sel = dim.where(F.col("flag") == "keep")
    joined = fact.join(sel, fact["d"] == sel["dk"])
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    # pruning is plan-level only; the answer equals the static filter
    assert joined.count() == fact.where(F.col("d") < 2).count()


# ---------------------------------------------------------------------------
# AQE skew-join split: the runtime half of the skew story
# ---------------------------------------------------------------------------

def test_aqe_splits_skewed_join_partitions(spark, tmp_path):
    """PLANS.md claims AQE's skew split complements salted_join —
    assert it actually fires: a hot-key sort-merge join with lowered
    skew thresholds must show skew=true in the final adaptive plan."""
    fact_path = str(tmp_path / "skew_fact")
    # 150k rows on ONE key + uniform tail over 1000 keys
    (
        spark.range(0, 200_000)
        .withColumn(
            "k",
            F.when(F.col("id") < 150_000, F.lit(7)).otherwise(
                F.col("id") % 1000
            ),
        )
        .withColumn("payload", F.concat(F.lit("x" * 64), F.col("id")))
        .write.parquet(fact_path)
    )
    dim_path = str(tmp_path / "skew_dim")
    spark.range(0, 1000).withColumn("d", F.col("id") % 7).write.parquet(dim_path)

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        fact = spark.read.parquet(fact_path)
        dim = spark.read.parquet(dim_path)
        joined = fact.join(dim, fact["k"] == dim["id"])
        # execute THIS DataFrame's plan (count() would spawn its own
        # query execution and leave this one un-finalized)
        assert len(joined.collect()) == 200_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan, plan[:500]
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_prefix_sums_matches_global_window(spark):
    """Distributed running totals == the single-partition window sum,
    including across range-partition boundaries and empty batches."""
    from pyspark.sql import Window

    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.operators.scale import (
        prefix_sums,
    )

    df = (
        spark.range(10_000)
        .withColumn("k", (F.col("id") * 2654435761) % 1_000_003)
        .withColumn("n", F.col("id") % 7)
        .withColumn("x", (F.col("id") % 11).cast("double") / 4)
    )
    got = prefix_sums(df, ["k", "id"], ["n", "x"], num_partitions=13)
    w = Window.orderBy("k", "id").rowsBetween(Window.unboundedPreceding, 0)
    want = df.select(
        "id",
        F.sum("n").over(w).alias("cum_n"),
        F.sum("x").over(w).alias("cum_x"),
    )
    j = (
        got.select("id", "cum_n", "cum_x")
        .join(want.withColumnRenamed("cum_n", "w_n").withColumnRenamed("cum_x", "w_x"), "id")
    )
    bad = j.filter(
        (F.col("cum_n") != F.col("w_n"))
        | (F.abs(F.col("cum_x") - F.col("w_x")) > 1e-9)
    ).count()
    assert bad == 0
    assert got.schema["cum_n"].dataType.simpleString() == "bigint"
    assert got.schema["cum_x"].dataType.simpleString() == "double"


def test_runtime_in_filter_pushes_predicate_and_falls_back(spark, tmp_path):
    """Small key set -> literal In predicate inside the fact scan (no
    join in the filtered frame's plan); big key set -> broadcast semi
    join; both produce identical rows."""
    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.operators.scale import (
        runtime_in_filter,
    )

    fp = str(tmp_path / "fact")
    spark.range(10_000).withColumn("k", F.col("id") % 100).write.parquet(fp)
    fact = spark.read.parquet(fp)
    dim = spark.range(7).select((F.col("id") * 3).alias("k"))

    pushed = runtime_in_filter(fact, dim, "k")
    plan = pushed._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # literal predicate, not a join
    semi = runtime_in_filter(fact, dim, "k", max_keys=2)
    plan_semi = semi._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan_semi or "Join" in plan_semi
    a = sorted(r.id for r in pushed.collect())
    b = sorted(r.id for r in semi.collect())
    want = sorted(
        r.id for r in fact.filter(F.col("k").isin([0, 3, 6, 9, 12, 15, 18])).collect()
    )
    assert a == b == want


def test_cdf_area_matches_window_twin(spark):
    """cdf_area (range-partitioned carry-ins) equals the
    single-partition window formulation on the same support."""
    from pyspark.sql import Window

    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.operators.scale import (
        cdf_area,
    )

    rows = [(v, (v * 7) % 5, (v * 3) % 4) for v in range(0, 500, 3)]
    df = spark.createDataFrame(rows, "v long, c1 long, c2 long")
    got = cdf_area(df.filter("c1 + c2 > 0"), "v", ("c1", "c2"),
                   num_partitions=7).collect()[0]
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    from pyspark.sql import functions as F

    src = df.filter("c1 + c2 > 0")
    n1 = src.agg(F.sum("c1")).collect()[0][0]
    n2 = src.agg(F.sum("c2")).collect()[0][0]
    cum = src.select(
        "v",
        F.lead("v").over(Window.orderBy("v")).alias("nv"),
        F.sum("c1").over(w).alias("k1"),
        F.sum("c2").over(w).alias("k2"),
    ).filter(F.col("nv").isNotNull())
    expect = cum.select(
        F.sum(
            (F.col("nv") - F.col("v"))
            * F.abs(F.col("k1") * F.lit(n2) - F.col("k2") * F.lit(n1))
        ).alias("num")
    ).collect()[0]["num"]
    assert got["n1"] == n1 and got["n2"] == n2
    assert got["numerator"] == expect
