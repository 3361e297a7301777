"""Time registry queries at sf0.1 vs the TRUE sf1 fixture.

Companion to tools/heavy_tail_probe.py (10× replication, output-
inflating) — this one runs against the statistically-scaled fixture
from tools/make_sf1.py, separating input-growth from output-growth
effects (VERDICT r3 item #8).

Usage: python tools/sf1_probe.py [sf1_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark import get_session
from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.plans.registry import (
    REGISTRY,
)

BASE = "/root/testdata/sf0.1"

# the 10 slowest round-3 bench headlines
DEFAULT_QUERIES = [
    "max_coverage_doc_selection",
    "reco_precision_at_k",
    "reco_ndcg_at_k",
    "near_dup_canonical_docs",
    "percolation_hub_removal",
    "near_dup_clusters",
    "betweenness_centrality_nations",
    "part_copurchase_kcore",
    "textrank_keywords_documents",
    "dedup_threshold_sensitivity",
]


def main() -> None:
    sf1 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_true"
    names = sys.argv[2:] or DEFAULT_QUERIES
    if not os.path.isdir(sf1):
        raise SystemExit(f"run tools/make_sf1.py first ({sf1} missing)")
    by_name = {q.name: q for q in REGISTRY}
    spark = get_session("sf1-probe")
    spark.sparkContext.setLogLevel("ERROR")

    def run(name, d):
        t0 = time.perf_counter()
        df = by_name[name].builder(spark, d)
        if df.isStreaming:
            df.count()
        else:
            df.write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 2)

    results = {}
    for name in names:
        base = min(run(name, BASE) for _ in range(2))
        scaled = min(run(name, sf1) for _ in range(2))
        results[name] = {
            "base_s": base,
            "sf1_s": scaled,
            "ratio": round(scaled / base, 2) if base else None,
        }
        print(name, results[name])
    print(json.dumps({"sf1_dir": sf1, "results": results}))
    spark.stop()


if __name__ == "__main__":
    main()
