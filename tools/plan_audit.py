"""Physical-plan audit: the 100 TB readiness check.

For each (or selected) registry query, prints the formatted plan and
grades scale-relevant markers:

* PushedFilters reach the parquet scan (no full-scan-then-filter);
* ReadSchema is pruned (scan reads only referenced columns);
* small dims join as BroadcastHashJoin (no shuffle of the fact side
  against a 25-row nation table);
* exchanges counted (every one is a full shuffle of its input);
* WholeStageCodegen coverage (JVM-side execution, no row-at-a-time
  Python in the hot path).

Usage: python tools/plan_audit.py [sf_dir] [name ...]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark import get_session
from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.plans.registry import (
    REGISTRY,
)

SKIP_TAGS = {"streaming"}  # streaming queries execute on build


def audit(df, name: str) -> dict:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    scans = re.findall(r"Scan parquet[^\n]*\n(?:[^\n]*\n)*?(?=\(\d+\)|\Z)", plan)
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    read_schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    # "(N) Op" detail headers count each physical node exactly once
    n_exchange = len(re.findall(r"\(\d+\) Exchange", plan))
    n_bhj = len(re.findall(r"\(\d+\) BroadcastHashJoin", plan))
    n_smj = len(re.findall(r"\(\d+\) SortMergeJoin", plan))
    n_python = len(
        re.findall(
            r"\(\d+\) (?:ArrowEvalPython|BatchEvalPython|MapInPandas|"
            r"FlatMapGroupsInPandas|MapInArrow)",
            plan,
        )
    )
    widest = max((len(s.split(",")) for s in read_schemas), default=0)
    return {
        "pushed_filters": [p for p in pushed if p.strip()],
        "widest_scan_cols": widest,
        "exchanges": n_exchange,
        "broadcast_joins": n_bhj,
        "sortmerge_joins": n_smj,
        "python_stages": n_python,
        "plan": plan,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = set(sys.argv[2:])
    spark = get_session("plan-audit", master="local[4]", shuffle_partitions=8)
    verbose = bool(names)
    for q in REGISTRY:
        if names and q.name not in names:
            continue
        if not names and (set(q.tags) & SKIP_TAGS or q.oracle is None):
            continue
        try:
            df = q.builder(spark, sf_dir)
        except Exception as e:  # noqa: BLE001
            print(f"{q.name}: BUILD ERROR {e}")
            continue
        a = audit(df, q.name)
        print(
            f"{q.name}: exch={a['exchanges']} bhj={a['broadcast_joins']} "
            f"smj={a['sortmerge_joins']} py={a['python_stages']} "
            f"maxScanCols={a['widest_scan_cols']} "
            f"pushed={'yes' if a['pushed_filters'] else 'none'}"
        )
        if verbose:
            print(a["plan"])


if __name__ == "__main__":
    main()
