"""Dump explain("formatted") for named queries to plans/r09/ (override: $SPARK_GRAFT_PLAN_ROUND).

    python tools/dump_explains.py before|after <name> [name ...]

Exec-at-build queries (streaming runs, lake writers) execute their
builder side effects; the captured plan is the final returned frame.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark import (
    get_session,
)
from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.plans.registry import (
    REGISTRY,
)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r09"))


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    by_name = {q.name: q for q in REGISTRY}
    spark = get_session("dump-explains")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT, exist_ok=True)
    for name in names:
        q = by_name[name]
        try:
            df = q.builder(spark, SF)
            buf = io.StringIO()
            if df.isStreaming:
                buf.write("(streaming DataFrame; logical plan)\n")
                buf.write(df._jdf.queryExecution().toString())
            else:
                with contextlib.redirect_stdout(buf):
                    df.explain("formatted")
            path = os.path.join(OUT, f"{name}_{tag}.txt")
            with open(path, "w") as fh:
                fh.write(buf.getvalue())
            print("wrote", path)
        except Exception as exc:  # noqa: BLE001
            print(f"ERROR {name}: {type(exc).__name__}: {exc}"[:300])
        for s in spark.streams.active:
            s.stop()
    spark.stop()


if __name__ == "__main__":
    main()
