"""Rank sf1/sf0.1 cost ratios from two bench JSONs (round 5).

A statistically-scaled 10x input (tools/make_sf1.py) should cost
~10x wall on a fixed-size machine, plus fixed overheads — ratios far
above that flag either superlinear cost curves (the thing the sweep
exists to catch) or contention during the run (re-time the query
alone before believing it).

Usage: python tools/sf1_triage.py BENCH_SF1_r5.json BENCH_LOCAL_r5.json [min_base_s]
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    sf1 = json.load(open(sys.argv[1]))
    base = json.load(open(sys.argv[2]))
    min_base = float(sys.argv[3]) if len(sys.argv) > 3 else 0.15
    q1, q0 = sf1["queries"], base["queries"]
    rows = sorted(
        (
            (v / q0[k], v, q0[k], k)
            for k, v in q1.items()
            if q0.get(k, 0) > min_base
        ),
        reverse=True,
    )
    print(f"{'ratio':>7} {'sf1_s':>9} {'base_s':>8}  query")
    for r, v, b, k in rows[:40]:
        print(f"{r:6.1f}x {v:9.2f} {b:8.2f}  {k}")
    over = [k for r, _, _, k in rows if r > 15]
    print(f"\n>15x: {len(over)} queries: {over}")


if __name__ == "__main__":
    main()
