"""Catalog-wide physical-plan sweep (round 5).

Builds EVERY batch query's DataFrame at the given SF and records the
two markers that are red flags at 100 TB no matter the query:

* ``BatchEvalPython`` — a row-at-a-time Python UDF entered a plan
  (the catalog's contract is Arrow-vectorized-or-JVM only);
* ``CartesianProduct`` — a non-broadcast cross join materialized
  (the broadcast variant shows up as BroadcastNestedLoopJoin and is
  fine for tiny build sides).

Queries whose BUILDER executes work (streaming availableNow runs,
lake/SCD2/snapshot writers, persistent index builds, IVM views) are
skipped here — their cost is execution, not plan shape, and they are
audited individually in PLANS.md. The committed skip list lives in
``tests/test_plan_lint.py::EXEC_AT_BUILD`` and this sweep validates
it stays exhaustive: building any non-listed query must be fast and
side-effect-free.

Usage:  python tools/plan_sweep.py [sf_dir] [out_json]
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark import get_session
from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.plans.registry import (
    REGISTRY,
)

# Tags whose builders execute (stream runs, lake writes, index builds)
EXEC_AT_BUILD_TAGS = {
    "streaming",
    "lake",
    "ivm",
    "materialized-view",
    "index",
    "scd2",
    "time-travel",
    "kappa",
    "backfill",
    "bucketed-write",
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/plan_sweep.json"
    spark = get_session("plan-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    rows = {}
    skipped = []
    for q in REGISTRY:
        if EXEC_AT_BUILD_TAGS & set(q.tags):
            skipped.append(q.name)
            continue
        t0 = time.perf_counter()
        try:
            df = q.builder(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
            rows[q.name] = {
                "build_s": round(time.perf_counter() - t0, 3),
                "row_udf": len(re.findall(r"BatchEvalPython", plan)),
                "cartesian": len(re.findall(r"CartesianProduct", plan)),
            }
        except Exception as exc:  # noqa: BLE001
            rows[q.name] = {
                "build_s": round(time.perf_counter() - t0, 3),
                "error": f"{type(exc).__name__}: {exc}"[:200],
            }
    bad = {
        k: v
        for k, v in rows.items()
        if v.get("row_udf") or v.get("cartesian") or "error" in v
    }
    slow = {
        k: v["build_s"] for k, v in rows.items() if v["build_s"] > 5.0
    }
    report = {
        "sf_dir": sf_dir,
        "n_checked": len(rows),
        "n_skipped_exec_at_build": len(skipped),
        "skipped": skipped,
        "violations": bad,
        "slow_builders": slow,
        "queries": rows,
    }
    with open(out, "w") as fh:
        json.dump(report, fh, indent=1, sort_keys=True)
    print(
        json.dumps(
            {
                "checked": len(rows),
                "skipped": len(skipped),
                "violations": len(bad),
                "slow_builders": slow,
            }
        )
    )


if __name__ == "__main__":
    main()
