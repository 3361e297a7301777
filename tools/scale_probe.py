"""Scale headroom probe — the engine's heavy paths at 100× bench rows.

sf0.1 bench data is ~600k lineitem rows; this generates 50M fact rows
(range source, no disk) and drives the operator classes that dominate
at cluster scale: a fact⋈dim shuffle join with aggregation, a salted
hot-key join, a partitioned analytic window, and a high-cardinality
distinct sketch. Prints one JSON line of wall seconds.

Usage: python tools/scale_probe.py [n_facts]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window
from pyspark.sql import functions as F

from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark import get_session
from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.operators.scale import (
    salted_join,
)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000_000
    n_dim = max(n // 10, 1)
    spark = get_session("scale-probe")
    timings: dict[str, float] = {}

    def run(name, df):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 2)

    facts = spark.range(n).select(
        (F.col("id") % n_dim).alias("k"),
        (F.col("id") % 97).cast("double").alias("v"),
        # hot key: 2% of rows share key 0 on top of the uniform load
        F.when(F.col("id") % 50 == 0, F.lit(0))
        .otherwise(F.col("id") % n_dim)
        .alias("skewed_k"),
    )
    dims = spark.range(n_dim).select(
        F.col("id").alias("k"), (F.col("id") % 1000).alias("grp")
    )

    # 1. fact⋈dim shuffle join + grouped agg (merge hint pins the
    # canonical two-exchange sort-merge plan a cluster-scale dim
    # forces, so the probe times shuffles rather than a broadcast)
    run(
        "shuffle_join_agg",
        facts.join(dims.hint("merge"), "k").groupBy("grp").agg(
            F.count("*").alias("n"), F.sum("v").alias("sv")
        ),
    )

    # 2. salted join against the hot key (2% of 50M on one key would
    # stall one task; the salt spreads it)
    run(
        "salted_hot_join",
        salted_join(
            facts.select(F.col("skewed_k").alias("k"), "v"),
            dims,
            key="k",
            parts=16,
        ).groupBy("grp").agg(F.count("*").alias("n")),
    )

    # 3. partitioned analytic window over every fact row
    w = Window.partitionBy(F.col("k") % 100_000).orderBy("v")
    run(
        "analytic_window",
        facts.withColumn("rn", F.row_number().over(w)).filter(
            F.col("rn") <= 3
        ),
    )

    # 4. high-cardinality distinct: HLL sketch vs the full shuffle an
    # exact distinct would need
    run(
        "approx_distinct",
        facts.groupBy(F.col("k") % 1000).agg(
            F.approx_count_distinct("k", rsd=0.02).alias("nd")
        ),
    )

    # 5. iterative connected components on the near-dup cluster shape
    # (200k chains of 10 nodes — worst small-diameter layout): the
    # whole loop, convergence counts included
    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.operators.dedup import (
        connected_components,
    )

    n_nodes = min(n // 25, 2_000_000)
    chains = spark.range(n_nodes - 1).filter(
        F.col("id") % 10 != 9
    ).select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
    t0 = time.perf_counter()
    labels = connected_components(chains, "src", "dst")
    n_comp = labels.select("comp").distinct().count()
    timings["connected_components"] = round(time.perf_counter() - t0, 2)
    assert n_comp == n_nodes // 10, n_comp

    # 6. giant-component stress: a 1M-node sparse random graph
    # (diameter ~log n) via two-phase star contraction — the shape
    # that label propagation cannot finish in bounded rounds
    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.operators.dedup import (
        connected_components_star,
    )

    n_g = min(n // 50, 1_000_000)
    giant = spark.range(2 * n_g).select(
        (F.col("id") % n_g).alias("src"),
        ((F.col("id") * 31 + 7) % n_g).alias("dst"),
    )
    t0 = time.perf_counter()
    star_labels = connected_components_star(giant)
    star_labels.select("comp").distinct().count()
    timings["connected_components_star_giant"] = round(
        time.perf_counter() - t0, 2
    )

    # 7. vector scoring tiers at 1M candidates: float64 BLAS brute
    # force from float parquet vs int8 GEMM from STORED codes — the
    # deployment shape (quantize once at ingest, score many times).
    # Also records the on-disk footprint of each representation.
    import shutil
    import subprocess

    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.operators.similarity import (
        brute_force_topk,
        quantize_int8,
        quantized_topk,
    )

    n_vec = min(n // 50, 1_000_000)
    dim = 64
    fdir = "/tmp/scale_probe_vec_float"
    qdir = "/tmp/scale_probe_vec_int8"
    vecs = spark.range(n_vec).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: F.sin(F.col("id") * 0.7 + i * 1.3),
        ).cast("array<float>").alias("embedding"),
    )
    vecs.write.mode("overwrite").parquet(fdir)
    t0 = time.perf_counter()
    quantize_int8(vecs).select("vec_id", "qvec", "qscale").write.mode(
        "overwrite"
    ).parquet(qdir)
    timings["ann_quantize_ingest_once"] = round(time.perf_counter() - t0, 2)

    def du_mb(path):
        out = subprocess.run(
            ["du", "-sm", path], capture_output=True, text=True
        ).stdout
        return int(out.split()[0])

    cand_f = spark.read.parquet(fdir)
    cand_q = spark.read.parquet(qdir)
    qset = cand_f.filter(F.col("vec_id") % 10_000 == 0)
    run("ann_score_float64_stored", brute_force_topk(cand_f, qset, k=5))
    run("ann_score_int8_stored", quantized_topk(cand_q, qset, k=5))
    timings["ann_float_parquet_mb"] = du_mb(fdir)
    timings["ann_int8_parquet_mb"] = du_mb(qdir)
    shutil.rmtree(fdir, ignore_errors=True)
    shutil.rmtree(qdir, ignore_errors=True)

    # 8. dense global id assignment over every fact row — the
    # anti-pattern it replaces (row_number over a global ORDER BY)
    # funnels all rows through one task; this must stay parallel.
    # Sanity: ids are dense 0..n-1 (checked via sum identity).
    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.operators.scale import (
        dense_ids,
    )

    n_ids = min(n, 20_000_000)
    id_src = spark.range(n_ids).select(
        ((F.col("id") * 2654435761) % 4_000_000_000).alias("key"),
        F.col("id").alias("payload"),
    ).where(F.lit(True))
    t0 = time.perf_counter()
    ids = dense_ids(id_src, "key", "payload", id_col="row_id")
    got = ids.agg(
        F.sum("row_id").alias("s"), F.count("*").alias("c")
    ).collect()[0]
    timings["dense_ids_20m"] = round(time.perf_counter() - t0, 2)
    assert got["c"] == n_ids and got["s"] == n_ids * (n_ids - 1) // 2, got

    # 9. sweep-line interval union over every fact row: two window
    # passes sharing ONE hash partitioning on the key (running-max
    # island marking, island numbering), then two grouped aggs —
    # the pattern must not re-exchange between passes.
    n_iv = min(n, 50_000_000)
    n_users = max(n_iv // 50, 1)
    iv = spark.range(n_iv).select(
        (F.col("id") % n_users).alias("u"),
        (F.col("id") * 7919 % 1_000_000_000).alias("s"),
    ).withColumn("e", F.col("s") + 5000 + (F.col("s") % 7000))
    wo = Window.partitionBy("u").orderBy("s", "e")
    prev_max = F.max("e").over(wo.rowsBetween(Window.unboundedPreceding, -1))
    marked = iv.withColumn(
        "ni", F.when(prev_max.isNull() | (F.col("s") > prev_max), 1).otherwise(0)
    )
    islands = marked.withColumn(
        "isl", F.sum("ni").over(wo.rowsBetween(Window.unboundedPreceding, 0))
    )
    run(
        "interval_union_sweep",
        islands.groupBy("u", "isl")
        .agg((F.max("e") - F.min("s")).alias("cov"))
        .groupBy("u")
        .agg(F.sum("cov").alias("covered"), F.count("*").alias("n_islands")),
    )

    # 10. in-row EWMA fold: 50 events per key collected into a sorted
    # array and folded JVM-side — the sequential-recurrence pattern at
    # scale (one shuffle, no Python, state inside the row).
    ew = spark.range(n_iv).select(
        (F.col("id") % n_users).alias("u"),
        F.col("id").alias("seq"),
        ((F.col("id") % 211) * 1.5).alias("v"),
    )
    grouped = ew.groupBy("u").agg(
        F.array_sort(F.collect_list(F.struct("seq", "v"))).alias("arr")
    )
    rest = F.slice(F.col("arr"), 2, F.greatest(F.size("arr") - 1, F.lit(0)))
    fold = F.aggregate(
        rest,
        F.element_at(F.col("arr"), 1)["v"],
        lambda acc, x: acc * F.lit(0.7) + x["v"] * F.lit(0.3),
    )
    run("ewma_inrow_fold", grouped.select("u", fold.alias("ewma")))

    # 13. interval × interval overlap join: 10M user-activity intervals
    # (≤2 h wide) × 100k incident windows (≤1 h) over a 1-year span via
    # the bucketized equi-join — the plan a bare theta join would turn
    # into an O(|L|·|R|) nested loop
    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.operators.joins import (
        interval_overlap_join,
    )

    n_l = min(n // 5, 10_000_000)
    year = 365 * 24 * 3600
    l_start = F.lit(1704067200) + F.pmod(F.xxhash64("id"), year)
    left_iv = spark.range(n_l).select(
        F.col("id").alias("lid"),
        F.timestamp_seconds(l_start).alias("ls"),
        F.timestamp_seconds(
            l_start + F.pmod(F.xxhash64("id", F.lit(1)), 7200)
        ).alias("le"),
    )
    r_start = F.lit(1704067200) + F.pmod(F.xxhash64("id", F.lit(2)), year)
    right_iv = spark.range(100_000).select(
        F.col("id").alias("rid"),
        F.timestamp_seconds(r_start).alias("rs"),
        F.timestamp_seconds(
            r_start + F.pmod(F.xxhash64("id", F.lit(3)), 3600)
        ).alias("rv_end"),
    )
    run(
        "interval_overlap_10m_x_100k",
        interval_overlap_join(left_iv, right_iv, "ls", "le", "rs", "rv_end"),
    )

    # 14. bloom file index: build over 5M clustered string keys in 32
    # files, then a point lookup that opens only bloom-matching files
    import tempfile

    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.operators.scale import (
        bloom_lookup_read,
        build_bloom_file_index,
    )

    bdir = tempfile.mkdtemp(prefix="probe_bloom_")
    n_keys = min(n // 10, 5_000_000)
    spark.range(n_keys).select(
        F.concat(F.lit("user_"), F.col("id")).alias("key"),
        (F.col("id") % 97).alias("v"),
    ).repartition(32, "key").write.mode("overwrite").parquet(bdir)
    t0 = time.perf_counter()
    bidx = build_bloom_file_index(spark, bdir, "key", bits=1 << 20).localCheckpoint()
    timings["bloom_index_build_5m"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    hit = bloom_lookup_read(spark, bdir, bidx, "key", "user_12345", bits=1 << 20)
    n_hit_files = len(hit.inputFiles())
    assert hit.count() == 1
    timings["bloom_point_lookup"] = round(time.perf_counter() - t0, 2)
    timings["bloom_files_opened_of_32"] = n_hit_files

    print(
        json.dumps(
            {
                "metric": "scale_probe_wall_seconds",
                "n_facts": n,
                "value": round(sum(timings.values()), 2),
                "unit": "sec",
                "stages": timings,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
