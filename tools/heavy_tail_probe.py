"""Heavy-tail scale probe: the slowest headline queries at ~10× rows.

VERDICT r2 #8: before a driver bench surfaces a super-linear blowup,
measure the growth curve ourselves. There is no sf1 fixture, so this
builds one: each fact table from sf0.1 is replicated REPLICAS× with
key-space shifts that preserve join structure (orders↔lineitem keys
shift together; customers/suppliers shift with their FKs; document
text gets a per-replica suffix so replicas are near- but not exact
duplicates — the realistic dedup load). Dimension tables (region,
nation, part) stay 1× like a real scale-up.

Usage: python tools/heavy_tail_probe.py [replicas] [query ...]
Writes the scaled tables to /tmp/sf_probe_<replicas>x once (reused),
then times each query at sf0.1 and at the scaled dir, printing one
JSON line with per-query (base_s, scaled_s, ratio).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark import get_session
from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.plans.registry import (
    REGISTRY,
)

BASE = "/root/testdata/sf0.1"

DEFAULT_QUERIES = [
    "reco_precision_at_k",
    "near_dup_clusters",
    "part_copurchase_kcore",
    "ngram_jaccard_pairs",
    "ngram_containment_pairs",
    "minhash_lsh_pairs",
    "label_propagation_nations",
    "market_basket_pairs",
    "tfidf_top_terms",
    "bfs_nation_hops",
]

# key columns shifted per replica so each replica is a disjoint,
# join-consistent copy; (table, {col: keyspace})
SHIFTS = {
    "orders": {"o_orderkey": "ok", "o_custkey": "ck"},
    "lineitem": {"l_orderkey": "ok", "l_suppkey": "sk"},
    "customer": {"c_custkey": "ck"},
    "supplier": {"s_suppkey": "sk"},
    "events": {"event_id": "ek", "user_id": "uk"},
    "documents": {"doc_id": "dk"},
    "embeddings": {"vec_id": "vk"},
}
STATIC = ("region", "nation", "part")


def build(spark, replicas: int) -> str:
    out = f"/tmp/sf_probe_{replicas}x"
    marker = os.path.join(out, "_built")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    spaces = {
        "ok": 10_000_000, "ck": 1_000_000, "sk": 100_000,
        "ek": 10_000_000, "uk": 1_000_000, "dk": 1_000_000,
        "vk": 1_000_000,
    }
    for t in STATIC:
        spark.read.parquet(f"{BASE}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{out}/{t}.parquet")
    for t, cols in SHIFTS.items():
        df = spark.read.parquet(f"{BASE}/{t}.parquet")
        parts = []
        for i in range(replicas):
            p = df
            for c, space in cols.items():
                p = p.withColumn(c, F.col(c) + F.lit(i * spaces[space]))
            if t == "documents" and i > 0:
                # near-duplicate replicas, not byte-identical ones
                p = p.withColumn(
                    "text", F.concat(F.col("text"), F.lit(f" zz{i}"))
                )
            parts.append(p)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.write.mode("overwrite").parquet(f"{out}/{t}.parquet")
    open(marker, "w").close()
    return out


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    names = sys.argv[2:] or DEFAULT_QUERIES
    by_name = {q.name: q for q in REGISTRY}
    spark = get_session("heavy-tail-probe")
    spark.sparkContext.setLogLevel("ERROR")
    scaled_dir = build(spark, replicas)

    results = {}
    for name in names:
        qd = by_name[name]
        row = {}
        for label, d in (("base", BASE), ("scaled", scaled_dir)):
            t0 = time.perf_counter()
            try:
                qd.builder(spark, d).write.format("noop").mode(
                    "overwrite"
                ).save()
                row[label] = round(time.perf_counter() - t0, 2)
            except Exception as exc:  # noqa: BLE001
                row[label] = None
                row[f"{label}_err"] = f"{type(exc).__name__}: {exc}"[:200]
        if row.get("base") and row.get("scaled"):
            row["ratio"] = round(row["scaled"] / row["base"], 2)
        results[name] = row
        print(name, row, flush=True)
    print(json.dumps({"replicas": replicas, "results": results}))
    spark.stop()


if __name__ == "__main__":
    main()
