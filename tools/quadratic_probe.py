"""Quadratic-risk family scale probe (VERDICT r6 item #5).

The r6 sf1 triage classified `blocking_candidate_pairs`,
`fellegi_sunter_linkage_scores` and `spatial_radius_join_customers`
as OUTPUT-BOUND (true result grows faster than input on the scaled
fixture, runtime tracks output). The n-gram probe taught us that
such classifications must be verified past the comfortable scale —
at sf3 the mining family's "saturation" claim turned out to be
false. This probe re-measures the three families (plus
`embedding_near_dup_pairs`, whose r6 209× output growth was a
FIXTURE artifact fixed in make_sf1 r7) at scale 1 / 10 / 30 and
checks the classification: output-bound holds iff

    time_ratio  <=  slack * max(input_ratio, output_ratio)

Each (query, scale) cell runs in its own subprocess with a hard
timeout, so a wrong classification (a true super-output-bound blowup)
records as `timeout` instead of wedging the probe — the same
fail-visible posture as the mining guard.

Usage: python tools/quadratic_probe.py [scales-csv] [out_json]
       (default scales 1,10,30; fixtures via tools/make_sf1.py into
        /tmp/sf{N}_true, regenerated when the generator changed)
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

QUERIES = [
    "blocking_candidate_pairs",
    "fellegi_sunter_linkage_scores",
    "spatial_radius_join_customers",
    "embedding_near_dup_pairs",
]
CELL_TIMEOUT_S = 2400
SLACK = 3.0  # time may exceed growth by cold-IO / constant factors

_CELL_SNIPPET = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark import get_session
from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.plans.registry import REGISTRY
q = next(x for x in REGISTRY if x.name == {name!r})
spark = get_session("quadratic-probe")
spark.sparkContext.setLogLevel("ERROR")
t0 = time.perf_counter()
n = q.builder(spark, {sf_dir!r}).count()
dt = time.perf_counter() - t0
print("CELL_RESULT " + json.dumps({{"rows": n, "seconds": round(dt, 2)}}))
spark.stop()
"""


def _fixture(scale: int) -> str:
    if scale == 1:
        return "/root/testdata/sf0.1"
    # same naming as the sweep fixtures: scale 10 = sf1, 30 = sf3
    out = f"/tmp/sf{scale // 10 if scale % 10 == 0 else scale}_true"
    gen = os.path.join(REPO, "tools", "make_sf1.py")
    with open(gen, "rb") as fh:
        gen_hash = hashlib.md5(fh.read()).hexdigest()
    marker = os.path.join(out, f"_generator-{gen_hash}")
    if os.path.exists(marker):
        return out
    print(f"[probe] generating scale-{scale} fixture at {out}", flush=True)
    subprocess.run(
        [sys.executable, gen, out, str(scale)], check=True, cwd=REPO
    )
    open(marker, "w").close()
    return out


def _cell(name: str, sf_dir: str) -> dict:
    code = _CELL_SNIPPET.format(repo=REPO, name=name, sf_dir=sf_dir)
    t0 = time.perf_counter()
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True,
            text=True,
            timeout=CELL_TIMEOUT_S,
            cwd=REPO,
        )
    except subprocess.TimeoutExpired:
        return {"status": "timeout", "seconds": CELL_TIMEOUT_S}
    for line in proc.stdout.splitlines():
        if line.startswith("CELL_RESULT "):
            res = json.loads(line[len("CELL_RESULT "):])
            res["status"] = "ok"
            return res
    return {
        "status": "error",
        "seconds": round(time.perf_counter() - t0, 2),
        "tail": (proc.stderr or proc.stdout)[-400:],
    }


def main() -> None:
    scales = [
        int(s)
        for s in (sys.argv[1] if len(sys.argv) > 1 else "1,10,30").split(",")
    ]
    out_json = (
        sys.argv[2] if len(sys.argv) > 2 else "/tmp/quadratic_probe.json"
    )
    fixtures = {s: _fixture(s) for s in scales}
    report: dict = {"scales": scales, "cell_timeout_s": CELL_TIMEOUT_S,
                    "slack": SLACK, "queries": {}}
    for name in QUERIES:
        rows = {}
        for s in scales:
            print(f"[probe] {name} @ scale {s}", flush=True)
            rows[s] = _cell(name, fixtures[s])
            print(f"[probe]   -> {rows[s]}", flush=True)
        entry: dict = {"cells": {str(s): rows[s] for s in scales}}
        base = rows.get(scales[0], {})
        top = rows.get(scales[-1], {})
        if base.get("status") == "ok" and top.get("status") == "ok":
            in_ratio = scales[-1] / scales[0]
            out_ratio = (top["rows"] or 1) / max(base["rows"] or 1, 1)
            t_ratio = top["seconds"] / max(base["seconds"], 0.05)
            bound = SLACK * max(in_ratio, out_ratio)
            entry.update(
                input_ratio=round(in_ratio, 2),
                output_ratio=round(out_ratio, 2),
                time_ratio=round(t_ratio, 2),
                output_bound_holds=bool(t_ratio <= bound),
            )
        else:
            entry["output_bound_holds"] = False
            entry["reason"] = top.get("status", "missing")
        report["queries"][name] = entry
    with open(out_json, "w") as fh:
        json.dump(report, fh, indent=1, sort_keys=True)
    print(json.dumps({k: v.get("output_bound_holds")
                      for k, v in report["queries"].items()}))
    print(f"report: {out_json}")


if __name__ == "__main__":
    main()
