"""Stop-gram blowup probe: the case the df-cap exists for.

The 10×-replication heavy-tail probe grows TRUE pair output 45×, so
every exact miner is output-bound there and the frequent-gram cap
cannot help (and must not hurt). The quadratic failure mode the cap
targets is different: a BOILERPLATE gram shared by a constant
fraction of the corpus (cookie banners, license headers, template
frames). There the uncapped inverted index pays |posting|²/2 rows on
grams that cannot by themselves push any pair over the threshold,
while the capped miner's rare-leg skips them and its H-leg only
joins the (empty, here) stop-gram-heavy stratum.

Builds a synthetic corpus: ``n_docs`` documents of ~60 random words
(unique grams), where ``frac`` of them append the SAME 12-word
boilerplate sentence (10 shared 3-grams with df = frac·n_docs).
True qualifying pairs at t=0.2: none (shared grams are ~10 of ~58
per doc → max J ≈ 0.1). Times ngram_jaccard_pairs uncapped vs
max_gram_df=256 and prints one JSON line.

Usage: python tools/stopgram_probe.py [n_docs] [frac]
"""

from __future__ import annotations

import json
import random
import sys
import time

sys.path.insert(0, "/root/repo")

from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark import get_session
from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.operators.dedup import (
    ngram_jaccard_pairs,
)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.3
    rng = random.Random(7)
    boiler = " ".join(f"boiler{i}" for i in range(12))
    rows = []
    for i in range(n_docs):
        words = " ".join(
            f"w{rng.randrange(10_000_000)}" for _ in range(60)
        )
        text = f"{words} {boiler}" if rng.random() < frac else words
        rows.append((i, text))

    spark = get_session("stopgram-probe")
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.createDataFrame(rows, "doc_id long, text string").cache()
    df.count()

    out = {"n_docs": n_docs, "frac": frac}
    for label, cap in (("uncapped", None), ("capped_256", 256)):
        t0 = time.perf_counter()
        n = ngram_jaccard_pairs(
            df, "text", "doc_id", shingle_n=3, threshold=0.2,
            max_gram_df=cap,
        ).count()
        out[label] = {
            "seconds": round(time.perf_counter() - t0, 2),
            "pairs": n,
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
