"""Storage-codec probe — the at-rest lever a 100 TB lake tunes first.

Writes the sf tables (one numeric-heavy fact, one text-heavy corpus)
under each parquet codec and records size + write/scan wall seconds.
Prints one JSON line. Usage:

    python tools/storage_probe.py [sf_dir]
"""

from __future__ import annotations

import json
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark import get_session

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
CODECS = ["snappy", "zstd", "gzip"]


def du_mb(path: str) -> float:
    out = subprocess.run(["du", "-sk", path], capture_output=True, text=True).stdout
    return round(int(out.split()[0]) / 1024, 2)


def main() -> None:
    spark = get_session("storage-probe")
    results: dict[str, dict] = {}
    with tempfile.TemporaryDirectory() as tmp:
        for table, agg in {
            "lineitem": lambda d: d.agg(F.sum("l_extendedprice")),
            "documents": lambda d: d.agg(F.sum(F.length("text"))),
        }.items():
            src = spark.read.parquet(f"{SF_DIR}/{table}.parquet")
            src = src.localCheckpoint()  # exclude source-read from write timing
            per_codec = {}
            for codec in CODECS:
                dst = f"{tmp}/{table}_{codec}"
                t0 = time.perf_counter()
                src.write.option("compression", codec).parquet(dst)
                w = time.perf_counter() - t0
                t0 = time.perf_counter()
                agg(spark.read.parquet(dst)).collect()
                r = time.perf_counter() - t0
                per_codec[codec] = {
                    "mb": du_mb(dst),
                    "write_s": round(w, 2),
                    "scan_s": round(r, 2),
                }
                shutil.rmtree(dst, ignore_errors=True)
            results[table] = per_codec
    print(json.dumps({"metric": "storage_probe", "sf_dir": SF_DIR, "tables": results}))
    spark.stop()


if __name__ == "__main__":
    main()
