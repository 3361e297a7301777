"""Streaming throughput probe vs the reference's trigger envelope.

BASELINE.md's only quantitative envelope is operational: a micro-batch
must complete within its trigger (reference: 30 s Kafka sinks, 10-15 s
documented cadence, single-partition topics). This drives the rate
source at a configurable rows/sec through the engine's watermarked
tumbling-window aggregation with 5 s triggers and reports, via
``MetricsListener``, whether batch durations stay inside the trigger
and what sustained rows/sec the pipeline absorbed.

Usage: python tools/stream_probe.py [rows_per_sec] [seconds]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark import get_session
from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.streaming.orchestrator import (
    MetricsListener,
)


def main() -> None:
    rate = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    seconds = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    spark = get_session("stream-probe")
    metrics = MetricsListener().attach(spark)

    stream = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", rate * 5)  # 5 s triggers
        .option("numPartitions", 8)
        .load()
        .withColumn("user_id", F.col("value") % 100_000)
        .withColumn("event_type", F.concat(F.lit("t"), (F.col("value") % 5)))
    )
    agg = (
        stream.withWatermark("timestamp", "30 seconds")
        .groupBy(F.window("timestamp", "10 seconds"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.approx_count_distinct("user_id").alias("nu"),
        )
    )
    q = (
        agg.writeStream.format("noop")
        .queryName("probe_agg")
        .outputMode("update")
        .option("checkpointLocation", "/tmp/stream_probe_ckpt_" + str(int(time.time())))
        .trigger(processingTime="5 seconds")
        .start()
    )
    time.sleep(seconds)
    q.stop()
    q.awaitTermination(60)

    snaps = metrics.progress("probe_agg")
    # ignore the warm-up batch (codegen + state store init)
    steady = snaps[1:] if len(snaps) > 1 else snaps
    total_rows = sum(p["num_input_rows"] for p in steady)
    total_ms = sum(p["batch_duration_ms"] for p in steady)
    max_ms = max((p["batch_duration_ms"] for p in steady), default=0)
    print(
        json.dumps(
            {
                "metric": "stream_probe",
                "offered_rows_per_sec": rate,
                "batches": len(steady),
                "sustained_rows_per_sec": (
                    round(total_rows / (total_ms / 1000.0), 1)
                    if total_ms
                    else None
                ),
                "max_batch_ms": max_ms,
                "trigger_ms": 5000,
                "within_trigger": bool(max_ms and max_ms <= 5000),
                "reference_trigger_ms": 30000,
            }
        )
    )
    # --- LSH dedup-sink throughput: docs/sec through the full
    # signature → index-probe → verify → append path (the ingest-dedup
    # tier), measured as multi-batch micro-batches over generated docs
    import shutil
    import tempfile

    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.streaming.dedup import (
        LshDedupSink,
        write_stream_dedup_lsh,
    )

    base = tempfile.mkdtemp(prefix="stream_probe_dedup_")
    src = f"{base}/src"
    n_docs, n_batches = 20_000, 4
    words = F.array(*[F.concat(F.lit(f"w{w}"), (F.col("id") * (w + 7)) % 9973) for w in range(30)])
    for b in range(n_batches):
        (
            spark.range(b * n_docs, (b + 1) * n_docs)
            .select(
                F.col("id").alias("doc_id"),
                F.concat_ws(" ", words).alias("text"),
            )
            .coalesce(2)
            .write.mode("append")
            .parquet(src)
        )
    sink = LshDedupSink(out_path=f"{base}/out", index_path=f"{base}/idx")
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", "2")
        .parquet(src)
    )
    t0 = time.perf_counter()
    dq = write_stream_dedup_lsh(
        stream, sink, checkpoint_root=f"{base}/ck", available_now=True
    )
    dq.awaitTermination(600)
    dedup_wall = time.perf_counter() - t0
    survivors = sink.read_survivors(spark).count()
    dedup_stats = {
        "metric": "stream_dedup_probe",
        "docs": n_docs * n_batches,
        "batches": n_batches,
        "survivors": survivors,
        "wall_sec": round(dedup_wall, 2),
        "docs_per_sec": round(n_docs * n_batches / dedup_wall, 1),
    }
    shutil.rmtree(base, ignore_errors=True)
    print(json.dumps(dedup_stats))

    metrics.detach(spark)
    spark.stop()


if __name__ == "__main__":
    main()
