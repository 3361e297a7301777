"""Per-query wall-time profiler (optimization round 8).

Runs one or more registry queries solo under a UI-enabled session
(same master/shuffle config as bench.py) and, for each, dumps where
the wall time went: per-job durations + descriptions and per-SQL-
execution durations from the UI REST API, plus build-vs-execute
split measured on the driver.

    python tools/profile_query.py <name> [name ...] [--sf DIR] [--reps N]

The report prints per query:
  build_s      driver time spent in the builder call (collects,
               driver-side training, stream runs land here)
  exec_s       noop materialization of the returned DataFrame
  jobs         every Spark job with duration, sorted slowest-first
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark import (
    get_session,
)
from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.plans.registry import (
    REGISTRY,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=1)
    args = ap.parse_args()

    by_name = {q.name: q for q in REGISTRY}
    spark = get_session(
        "profile-query",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedJobs": "100000",
            "spark.sql.ui.retainedExecutions": "100000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    # JVM/codegen warm-up (same protocol as bench.py)
    for _ in range(3):
        by_name["q01_pricing_summary"].builder(spark, args.sf).write.format(
            "noop"
        ).mode("overwrite").save()

    def jobs_snapshot():
        return json.load(
            urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app_id}/jobs?length=100000"
            )
        )

    for name in args.names:
        q = by_name[name]
        for rep in range(args.reps):
            before_ids = {j["jobId"] for j in jobs_snapshot()}
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.perf_counter()
            df = q.builder(spark, args.sf)
            t1 = time.perf_counter()
            if df.isStreaming:
                df.count()
            else:
                df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            spark.sparkContext.setJobDescription(None)
            jobs = [
                j for j in jobs_snapshot() if j["jobId"] not in before_ids
            ]
            for j in jobs:
                st = j.get("submissionTime")
                ct = j.get("completionTime")
                j["_dur"] = None
                if st and ct:
                    from datetime import datetime

                    fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                    try:
                        d = (
                            datetime.strptime(ct, fmt)
                            - datetime.strptime(st, fmt)
                        ).total_seconds()
                        j["_dur"] = round(d, 3)
                    except ValueError:
                        pass
            jobs.sort(key=lambda j: -(j["_dur"] or 0))
            print(
                f"=== {name} rep{rep}: build={t1 - t0:.3f}s "
                f"exec={t2 - t1:.3f}s total={t2 - t0:.3f}s "
                f"n_jobs={len(jobs)}"
            )
            for j in jobs[:25]:
                print(
                    f"  job {j['jobId']:>5} {j['_dur'] if j['_dur'] is not None else '?':>8}s "
                    f"stages={len(j.get('stageIds', []))} "
                    f"tasks={j.get('numTasks')} "
                    f"{(j.get('description') or j.get('name') or '')[:110]}"
                )
        for s in spark.streams.active:
            s.stop()
    spark.stop()


if __name__ == "__main__":
    main()
