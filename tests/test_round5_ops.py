"""Round-5 operator tests: forward as-of join and the interval ×
interval overlap join (bucketized theta-join rewrite)."""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import functions as F

from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.operators.joins import (
    asof_join,
    interval_overlap_join,
)


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_join_forward_inclusive(spark):
    left = spark.createDataFrame(
        [("a", _ts("2024-01-01 10:00:00")), ("a", _ts("2024-01-01 12:00:00")),
         ("b", _ts("2024-01-01 09:00:00"))],
        "k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("a", _ts("2024-01-01 10:00:00"), 1.0),   # equal ts → inclusive match
         ("a", _ts("2024-01-01 11:00:00"), 2.0),
         ("b", _ts("2024-01-01 08:00:00"), 3.0)],  # before left → no forward match
        "k string, ts timestamp, v double",
    )
    rows = {
        (r["k"], r["ts"]): (r["ts_right"], r["v_right"])
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="ts", direction="forward"
        ).collect()
    }
    assert rows[("a", _ts("2024-01-01 10:00:00"))] == (_ts("2024-01-01 10:00:00"), 1.0)
    assert rows[("a", _ts("2024-01-01 12:00:00"))] == (None, None)
    assert rows[("b", _ts("2024-01-01 09:00:00"))] == (None, None)


def test_asof_forward_matches_naive_min_over_candidates(spark):
    rng = random.Random(7)
    base = dt.datetime(2024, 3, 1)
    left = [
        (f"k{rng.randrange(5)}", base + dt.timedelta(seconds=rng.randrange(10000)))
        for _ in range(300)
    ]
    right = [
        (f"k{rng.randrange(5)}", base + dt.timedelta(seconds=rng.randrange(10000)),
         float(i))
        for i in range(200)
    ]
    ldf = spark.createDataFrame(left, "k string, ts timestamp").withColumn(
        "lid", F.monotonically_increasing_id()
    )
    rdf = spark.createDataFrame(right, "k string, ts timestamp, v double")
    got = {
        r["lid"]: r["ts_right"]
        for r in asof_join(
            ldf, rdf, on="k", left_ts="ts", right_ts="ts", direction="forward"
        ).collect()
    }
    naive = (
        ldf.join(rdf.withColumnRenamed("ts", "rts"), "k")
        .filter(F.col("rts") >= F.col("ts"))
        .groupBy("lid")
        .agg(F.min("rts").alias("want"))
        .collect()
    )
    want = {r["lid"]: r["want"] for r in naive}
    for r in ldf.collect():
        assert got[r["lid"]] == want.get(r["lid"]), r["lid"]


def test_interval_overlap_join_matches_naive_theta(spark):
    rng = random.Random(11)
    base = dt.datetime(2024, 5, 1)

    def mk_intervals(n, max_width):
        out = []
        for i in range(n):
            s = base + dt.timedelta(seconds=rng.randrange(200000))
            e = s + dt.timedelta(seconds=rng.randrange(max_width))
            out.append((i, s, e))
        return out

    left = spark.createDataFrame(
        mk_intervals(250, 20000), "lid int, ls timestamp, le timestamp"
    )
    right = spark.createDataFrame(
        mk_intervals(180, 8000), "rid int, rs timestamp, re timestamp"
    )
    got = sorted(
        (r["lid"], r["rid"])
        for r in interval_overlap_join(
            left, right, "ls", "le", "rs", "re", bucket_seconds=3600
        ).collect()
    )
    want = sorted(
        (r["lid"], r["rid"])
        for r in left.join(
            right,
            (F.col("ls") <= F.col("re")) & (F.col("rs") <= F.col("le")),
        ).collect()
    )
    assert got == want and len(got) > 0
    # exactly-once emission: no duplicates even though overlapping pairs
    # share many hour buckets
    assert len(got) == len(set(got))


def test_interval_overlap_join_touching_endpoints_inclusive(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), _ts("2024-01-01 11:00:00"))],
        "lid int, ls timestamp, le timestamp",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 11:00:00"), _ts("2024-01-01 12:00:00")),   # touches end
         (2, _ts("2024-01-01 09:00:00"), _ts("2024-01-01 10:00:00")),   # touches start
         (3, _ts("2024-01-01 12:00:01"), _ts("2024-01-01 13:00:00"))],  # disjoint
        "rid int, rs timestamp, re timestamp",
    )
    got = sorted(
        r["rid"]
        for r in interval_overlap_join(
            left, right, "ls", "le", "rs", "re", bucket_seconds=1800
        ).collect()
    )
    assert got == [1, 2]


# ---------------------------------------------------------------------------
# Bloom-filter file index (equality-lookup data skipping)
# ---------------------------------------------------------------------------

def test_bloom_file_index_point_lookup_skips_files_and_matches_full_scan(
    spark, tmp_path
):
    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.operators.scale import (
        bloom_lookup_read,
        build_bloom_file_index,
    )

    path = str(tmp_path / "bloomfacts")
    # key clustered into files (hash-partitioned writes cluster keys
    # naturally); every file spans the FULL numeric range, so min/max
    # stats cannot skip anything — exactly the case blooms exist for
    df = spark.range(0, 50_000).withColumn("key", F.concat(F.lit("u"), F.col("id")))
    df.repartition(10, "key").write.parquet(path)

    idx = build_bloom_file_index(spark, path, "key").localCheckpoint()
    n_files = len(spark.read.parquet(path).inputFiles())
    assert n_files == 10

    for probe in ["u123", "u40000", "u7"]:
        got = bloom_lookup_read(spark, path, idx, "key", probe)
        # the key lives in exactly one file; a few false-positive
        # files are allowed, but far fewer than the full table
        assert 0 < len(got.inputFiles()) < n_files
        rows = got.collect()
        assert len(rows) == 1 and rows[0]["key"] == probe

    # absent key: no false negatives possible, result must be empty
    missing = bloom_lookup_read(spark, path, idx, "key", "u99999999")
    assert missing.count() == 0
    assert set(missing.columns) == {"id", "key"}


# ---------------------------------------------------------------------------
# Compression-ratio quality signal
# ---------------------------------------------------------------------------

def test_compression_ratio_separates_repetitive_from_random_text(spark):
    import random as _r

    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.functions.text import (
        compression_ratio,
    )

    rng = _r.Random(3)
    rand_text = " ".join(
        "".join(rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(8))
        for _ in range(200)
    )
    rep_text = "the same boilerplate line repeats here " * 50
    df = spark.createDataFrame(
        [(1, rep_text), (2, rand_text)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in compression_ratio(df).collect()}
    assert got[1]["compression_ratio"] < 0.1          # repetition crushes
    assert got[2]["compression_ratio"] > 0.5          # random barely compresses
    assert got[1]["n_chars"] == len(rep_text)
    # deterministic across runs (pinned zlib level)
    again = {r["doc_id"]: r for r in compression_ratio(df).collect()}
    assert got[1]["compressed_bytes"] == again[1]["compressed_bytes"]
    assert got[2]["compression_ratio"] == again[2]["compression_ratio"]


# ---------------------------------------------------------------------------
# Sliding 7-day distinct: HLL sketch path vs exact rewrite
# ---------------------------------------------------------------------------

def test_sliding_hll_matches_exact_within_hll_error(spark):
    import datetime as dt

    # 40 days × up to 30k users/day with heavy cross-day overlap —
    # enough cardinality that the sketch actually estimates
    base = dt.date(2024, 1, 1)
    df = spark.range(400_000).select(
        F.date_add(F.lit(base), (F.col("id") % 40).cast("int")).alias("day"),
        F.pmod(F.xxhash64("id"), F.lit(30_000)).alias("user_id"),
    )
    exact = (
        df.distinct()
        .join(
            F.broadcast(
                df.select("day").distinct().withColumnRenamed("day", "anchor")
            ),
            (F.col("anchor") >= F.col("day"))
            & (F.col("anchor") <= F.date_add(F.col("day"), 6)),
        )
        .groupBy(F.col("anchor"))
        .agg(F.countDistinct("user_id").alias("n"))
    )
    daily = df.groupBy("day").agg(F.expr("hll_sketch_agg(user_id, 12)").alias("sk"))
    from pyspark.sql import Window as W

    rolled = daily.select(
        "day",
        F.collect_list("sk")
        .over(W.orderBy("day").rowsBetween(-6, W.currentRow))
        .alias("sks"),
    )
    est = rolled.select(
        "day",
        F.expr(
            "hll_sketch_estimate(aggregate(slice(sks, 2, size(sks) - 1), sks[0],"
            " (a, x) -> hll_union(a, x)))"
        ).alias("e"),
    )
    ex = {r["anchor"]: r["n"] for r in exact.collect()}
    for r in est.collect():
        assert abs(r["e"] - ex[r["day"]]) / ex[r["day"]] < 0.05


# ---------------------------------------------------------------------------
# ALS matrix factorization
# ---------------------------------------------------------------------------

def test_als_recovers_planted_low_rank_and_is_deterministic(spark):
    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.operators.als import (
        als_recommend,
        als_rmse,
        als_train,
    )

    n_u, n_i, rank_true = 200, 80, 4
    uf = spark.range(n_u).select(
        F.col("id").alias("user_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(rank_true - 1)),
            lambda j: F.pmod(F.xxhash64("id", j), F.lit(100)) / 50.0 - 1.0,
        ).alias("tu"),
    )
    itf = spark.range(n_i).select(
        F.col("id").alias("item_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(rank_true - 1)),
            lambda j: F.pmod(F.xxhash64("id", j, F.lit(9)), F.lit(100)) / 50.0 - 1.0,
        ).alias("ti"),
    )
    pairs = uf.crossJoin(itf).filter(
        F.pmod(F.xxhash64("user_id", "item_id"), F.lit(10)) < 3
    )
    ratings = pairs.select(
        "user_id",
        "item_id",
        F.aggregate(
            F.zip_with("tu", "ti", lambda a, b: a * b), F.lit(0.0), lambda a, x: a + x
        ).alias("rating"),
    ).cache()

    u1, i1 = als_train(ratings, rank=8, iterations=1)
    u3, i3 = als_train(ratings, rank=8, iterations=3)
    rmse1 = als_rmse(ratings, u1, i1)
    rmse3 = als_rmse(ratings, u3, i3)
    # more alternations strictly improve the planted-structure fit,
    # and 3 iterations essentially recover the rank-4 matrix
    assert rmse3 < rmse1
    assert rmse3 < 0.05

    # bit-deterministic retrain
    u3b, _ = als_train(ratings, rank=8, iterations=3)
    a = sorted((r["user_id"], tuple(r["factors"])) for r in u3.collect())
    b = sorted((r["user_id"], tuple(r["factors"])) for r in u3b.collect())
    assert a == b

    recs = als_recommend(u3, i3, ratings.select("user_id", "item_id"), k=3)
    got = recs.collect()
    assert len(got) == n_u * 3
    # recommendations never repeat an observed pair
    seen = {(r["user_id"], r["item_id"]) for r in ratings.collect()}
    assert all((r["user_id"], r["item_id"]) not in seen for r in got)


# ---------------------------------------------------------------------------
# Materialized bitmap index (exact distinct over arbitrary date ranges)
# ---------------------------------------------------------------------------

def test_bitmap_index_range_queries_match_direct_distinct(spark, tmp_path):
    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.operators.bitmap_index import (
        BitmapDistinctIndex,
    )
    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.sources.tables import (
        load_table,
    )

    e = load_table(spark, "/root/testdata/sf0.001", "events")
    idx = BitmapDistinctIndex(path=str(tmp_path / "bmidx"))
    idx.build(e)

    import datetime as dt

    lo, hi = dt.date(2024, 1, 5), dt.date(2024, 1, 12)
    got = {
        r["event_type"]: (r["distinct_ids"], r["n_rows"])
        for r in idx.distinct_over(spark, lo, hi).collect()
    }
    direct = e.filter(
        (F.to_date("ts") >= F.lit(str(lo))) & (F.to_date("ts") <= F.lit(str(hi)))
    )
    want = {
        r["event_type"]: (r["d"], r["n"])
        for r in direct.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("d"), F.count("*").alias("n"))
        .collect()
    }
    assert got == want and len(got) > 0

    # overall (key-free) merge also exact
    overall = idx.distinct_over(spark, lo, hi, by_keys=False).collect()[0]
    assert overall["distinct_ids"] == direct.select("user_id").distinct().count()

    # partition pruning: the range predicate compiles to partition
    # filters on the scan (only in-range index partitions are read)
    pruned = idx.read(spark).filter(
        (F.col("index_date") >= F.lit(str(lo)).cast("date"))
        & (F.col("index_date") <= F.lit(str(hi)).cast("date"))
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "index_date" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0]


def test_bitmap_index_day_refresh_is_idempotent(spark, tmp_path):
    import datetime as dt

    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.operators.bitmap_index import (
        BitmapDistinctIndex,
    )
    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.sources.tables import (
        load_table,
    )

    e = load_table(spark, "/root/testdata/sf0.001", "events")
    idx = BitmapDistinctIndex(path=str(tmp_path / "bmidx2"))
    idx.build(e)
    day = dt.date(2024, 1, 7)
    before = sorted(
        (r["event_type"], r["distinct_ids"])
        for r in idx.distinct_over(spark, day, day).collect()
    )
    idx.refresh_day(e, spark, day)  # replay the same day
    after = sorted(
        (r["event_type"], r["distinct_ids"])
        for r in idx.distinct_over(spark, day, day).collect()
    )
    assert before == after


def test_bitmap_index_streaming_maintenance_matches_batch_build(spark, tmp_path):
    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.operators.bitmap_index import (
        BitmapDistinctIndex,
        write_stream_to_bitmap_index,
    )
    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.sources.tables import (
        load_events_stream,
        load_table,
    )

    sf = "/root/testdata/sf0.001"
    stream = load_events_stream(spark, sf)
    idx = BitmapDistinctIndex(path=str(tmp_path / "bm_stream"))
    q = write_stream_to_bitmap_index(
        stream, idx, checkpoint_root=str(tmp_path / "ck"), available_now=True
    )
    assert q.awaitTermination(120)

    e = load_table(spark, sf, "events")
    batch_idx = BitmapDistinctIndex(path=str(tmp_path / "bm_batch"))
    batch_idx.build(e)

    import datetime as dt

    lo, hi = dt.date(2024, 1, 1), dt.date(2024, 2, 28)
    got = sorted(
        (r["event_type"], r["distinct_ids"], r["n_rows"])
        for r in idx.distinct_over(spark, lo, hi).collect()
    )
    want = sorted(
        (r["event_type"], r["distinct_ids"], r["n_rows"])
        for r in batch_idx.distinct_over(spark, lo, hi).collect()
    )
    assert got == want and len(got) > 0

    # replayed batch is a no-op (ledger): merge batch 0 again by hand
    idx.merge_batch(e, spark, batch_id=0)
    again = sorted(
        (r["event_type"], r["distinct_ids"], r["n_rows"])
        for r in idx.distinct_over(spark, lo, hi).collect()
    )
    assert again == got


# ---------------------------------------------------------------------------
# Cost-based optimizer: ANALYZE statistics drive the join strategy
# ---------------------------------------------------------------------------

def test_analyze_statistics_enable_broadcast_decision(spark, tmp_path):
    """CBO integration: without stats Spark falls back to file-size
    estimates; with ANALYZE'd row/size stats a genuinely-small table
    joins as BroadcastHashJoin under a threshold that its raw file
    size alone would not clear. Statistics are the 100 TB lever that
    keeps dim-fact joins broadcast when directory sizes mislead."""
    db = "cbo_test_db"
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
    spark.sql(
        f"CREATE DATABASE {db} LOCATION '{tmp_path / 'warehouse'}'"
    )
    try:
        spark.range(200).selectExpr(
            "id AS k", "concat('dim_', id) AS name"
        ).write.saveAsTable(f"{db}.dim")
        spark.range(200_000).selectExpr(
            "id % 200 AS k", "id AS v"
        ).write.saveAsTable(f"{db}.fact")

        spark.sql(f"ANALYZE TABLE {db}.dim COMPUTE STATISTICS")
        spark.sql(f"ANALYZE TABLE {db}.fact COMPUTE STATISTICS")

        stats = spark.sql(f"DESCRIBE EXTENDED {db}.dim").collect()
        stat_row = [r for r in stats if r["col_name"] == "Statistics"]
        assert stat_row and "rows" in stat_row[0]["data_type"]

        joined = spark.sql(
            f"SELECT /*+ BROADCAST(d) */ count(*) FROM {db}.fact f "
            f"JOIN {db}.dim d ON f.k = d.k"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan

        # and WITHOUT any hint, the analyzed 200-row dim still
        # broadcasts because its stats-based size is tiny
        no_hint = spark.sql(
            f"SELECT count(*) FROM {db}.fact f JOIN {db}.dim d ON f.k = d.k"
        )
        plan2 = no_hint._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan2
        assert no_hint.first()[0] == 200_000
    finally:
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")


def test_enforce_splits_clean_and_quarantine(spark, tmp_path):
    from pyspark.sql import functions as F

    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.operators.quality import (
        enforce,
    )
    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.streaming.lake import (
        LakeTable,
    )

    df = spark.createDataFrame(
        [
            (1, "a@x.com", 10.0, "2024-01-01"),
            (2, None, 5.0, "2024-01-01"),      # null email
            (3, "c@x.com", -2.0, "2024-01-02"),  # negative amount
            (4, None, -1.0, "2024-01-02"),       # both
        ],
        "id bigint, email string, amount double, processing_date string",
    )
    clean, quarantine = enforce(
        df,
        {
            "email_not_null": F.col("email").isNull(),
            "amount_non_negative": F.col("amount") < 0,
        },
    )
    assert sorted(r.id for r in clean.collect()) == [1]
    q = {r.id: sorted(r._violated) for r in quarantine.collect()}
    assert q == {
        2: ["email_not_null"],
        3: ["amount_non_negative"],
        4: ["amount_non_negative", "email_not_null"],
    }
    # clean keeps the source schema exactly -> upserts into the lake
    assert clean.columns == df.columns
    lake = LakeTable(path=str(tmp_path / "t"), record_key="id",
                     precombine_field="amount")
    lake.upsert_batch(clean.withColumn("amount", F.col("amount")), spark)
    assert lake.read(spark).count() == 1
    # quarantine is the dead-letter payload: full row + fired rules
    quarantine.write.mode("overwrite").parquet(str(tmp_path / "dlq"))
    assert spark.read.parquet(str(tmp_path / "dlq")).count() == 3
