"""A/B harness for streaming-family configs (optimization round 9).

Times a fixed set of streaming queries (min-of-N, noop-free: streaming
builders execute inside the builder; the returned sink table is tiny)
under ONE session configured via CLI flags, so different invocations
compare state-store / partition configs on the same protocol as
bench.py.

    python tools/stream_ab.py --label base
    python tools/stream_ab.py --label rocksdb --conf spark.sql.streaming.stateStore.providerClass=org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider
    SPARK_GRAFT_SHUFFLE_PARTITIONS=16 python tools/stream_ab.py --label py16
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark import (
    get_session,
)
from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.plans.registry import (
    REGISTRY,
)

DEFAULT_SET = [
    "streaming_sessionize_events",
    "streaming_debounce_events",
    "streaming_interval_join_events",
    "streaming_abandoned_views",
    "streaming_rate_limiter",
    "streaming_ewma_users",
    "streaming_window_funnel",
    "streaming_dedup_lsh_documents",
    "streaming_dedup_vectors_embeddings",
    "streaming_anomaly_alerts",
    "streaming_join_view_orders",
    "streaming_rollup_events",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--label", required=True)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--conf", action="append", default=[])
    ap.add_argument("--queries", default=",".join(DEFAULT_SET))
    args = ap.parse_args()

    extra = {}
    for kv in args.conf:
        k, v = kv.split("=", 1)
        extra[k] = v
    spark = get_session(f"stream-ab-{args.label}", extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")
    by_name = {q.name: q for q in REGISTRY}
    # same JVM warm-up as bench.py
    for _ in range(3):
        by_name["q01_pricing_summary"].builder(spark, args.sf).write.format(
            "noop"
        ).mode("overwrite").save()
    t0 = time.perf_counter()
    by_name["q01_pricing_summary"].builder(spark, args.sf).write.format(
        "noop"
    ).mode("overwrite").save()
    sentinel = round(time.perf_counter() - t0, 3)
    out = {}
    for name in args.queries.split(","):
        qd = by_name[name]
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            df = qd.builder(spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)
    print(
        json.dumps(
            {
                "label": args.label,
                "sentinel_s": sentinel,
                "total": round(sum(out.values()), 3),
                "queries": out,
                "conf": extra,
                "env_shuffle": os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS"),
                "env_stream_shuffle": os.environ.get("SPARK_GRAFT_STREAM_SHUFFLE"),
            }
        )
    )
    for s in spark.streams.active:
        s.stop()
    spark.stop()


if __name__ == "__main__":
    main()
