"""Exact n-gram mining cost-curve probe (VERDICT r5 item #1).

Measures the df-cap saturation claim with data instead of argument:
generates DOCUMENTS-ONLY fixtures at multiple scales with the same
bootstrap+word-shuffle method as tools/make_sf1.py (seed 777), then
for each scale records

* the gram-df histogram summary (distinct grams, max df, postings),
* the pre-flight's exact candidate decomposition: rare-leg rows at
  cap 256 (Σ_{df≤256} C(df,2)), the exact H-leg rows, and the
  guard's routing decision at the registry budget (50M),
* measured wall time and output rows of ``ngram_jaccard_pairs``
  (t=0.2, cap 256, guarded).

Saturation prediction: once per-gram df crosses 256 (≈ sf3 on this
fixture), the rare leg freezes, and the surviving cost driver is the
H leg — the probe shows whichever curve is real.

Usage: python tools/ngram_scale_probe.py [scales-csv] [out_json]
       (default scales 1,10,30 = sf0.1, sf1, sf3)
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1/documents.parquet"


def make_documents(scale: int, out_dir: str) -> str:
    os.makedirs(out_dir, exist_ok=True)
    path = f"{out_dir}/documents.parquet"
    if os.path.exists(path):
        return path
    if scale == 1:
        return SRC
    py_rng = random.Random(777)
    d = pq.read_table(SRC).to_pydict()
    n_src = len(d["doc_id"])
    n_out = n_src * scale
    texts, langs, sources, n_chars = [], [], [], []
    for _ in range(n_out):
        j = py_rng.randrange(n_src)
        words = d["text"][j].split()
        py_rng.shuffle(words)
        t = " ".join(words)
        texts.append(t)
        langs.append(d["lang"][py_rng.randrange(n_src)])
        sources.append(d["source"][py_rng.randrange(n_src)])
        n_chars.append(len(t))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n_out), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(langs),
                "source": pa.array(sources),
                "n_chars": pa.array(n_chars, pa.int64()),
            }
        ),
        path,
    )
    return path


def main() -> None:
    scales = [
        int(s)
        for s in (sys.argv[1] if len(sys.argv) > 1 else "1,10,30").split(",")
    ]
    out_json = sys.argv[2] if len(sys.argv) > 2 else "/tmp/ngram_scale_probe.json"

    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark import (
        get_session,
    )
    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.functions.text import (
        shingle_rows,
    )
    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.operators import (
        dedup,
    )

    spark = get_session("ngram-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for scale in scales:
        path = make_documents(scale, f"/tmp/ngram_probe_x{scale}")
        docs = spark.read.parquet(path)
        grams = shingle_rows(docs, "doc_id", "text", 3).localCheckpoint()
        t_pf = time.perf_counter()
        plan = dedup.plan_exact_mining(grams, 0.2, 256, 50_000_000)
        preflight_s = round(time.perf_counter() - t_pf, 2)
        # measure the over-budget runs too (that IS the cost curve) —
        # but let the guard refuse anything whose EXACT candidate
        # total exceeds a hard ceiling this box cannot aggregate
        # (the first sf3 attempt OOMed after 37 min at ~630M rows)
        est_total = plan["est_rare_pairs"] + plan.get("est_h_pairs", 0)
        policy = "proceed" if est_total <= 400_000_000 else "error"
        t0 = time.perf_counter()
        try:
            out = dedup.ngram_jaccard_pairs(
                docs,
                "text",
                "doc_id",
                shingle_n=3,
                threshold=0.2,
                max_gram_df=256,
                candidate_budget=50_000_000,
                on_over_budget=policy,
            )
            n_pairs = out.count()
            err = None
        except RuntimeError as exc:
            n_pairs = None
            err = f"guard refused (policy={policy}): {exc}"[:300]
        except Exception as exc:  # noqa: BLE001 - a scale failure IS a result
            n_pairs = None
            err = f"{type(exc).__name__}: {exc}"[:300]
        wall = time.perf_counter() - t0
        row = {
            "scale_x_sf0p1": scale,
            "n_docs": docs.count(),
            "preflight_s": preflight_s,
            "wall_s": round(wall, 2),
            "out_pairs": n_pairs,
            "error": err,
            "plan": {
                k: v for k, v in plan.items() if k != "budget"
            },
        }
        rows.append(row)
        print(json.dumps(row))
    with open(out_json, "w") as fh:
        json.dump({"probe": "ngram_scale", "rows": rows}, fh, indent=1)
    print("wrote", out_json)


if __name__ == "__main__":
    main()
