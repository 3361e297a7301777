"""JVM parity pin for the pure-Python xxhash64 port
(functions/xxh64.py) — the ALS oracle generator replays
hash-seeded factor init with it, so a silent divergence would
corrupt the als_recommend_parts oracle rather than fail loudly."""

from __future__ import annotations

from pyspark.sql import functions as F

from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.functions.xxh64 import (
    xxhash64,
)


def test_xxhash64_matches_spark(spark):
    vals = [
        (-(2**62),),
        (-5,),
        (0,),
        (1,),
        (7,),
        (999,),
        (123456789012345,),
        (2**62,),
    ]
    df = spark.createDataFrame(vals, ["id"])
    rows = df.select(
        "id",
        *[
            F.xxhash64(F.col("id"), F.lit(j), F.lit(s)).alias(f"h{j}_{s}")
            for j in range(4)
            for s in (7, 8)
        ],
    ).collect()
    for r in rows:
        for j in range(4):
            for s in (7, 8):
                assert (
                    xxhash64(("long", r["id"]), ("int", j), ("int", s))
                    == r[f"h{j}_{s}"]
                ), (r["id"], j, s)


def test_init_factors_replay(spark):
    """The exact expression _init_factors builds, replayed: pmod of
    the ported hash, /1e4 − 0.05."""
    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.operators.als import (
        _init_factors,
    )

    ids = spark.createDataFrame([(3,), (17,), (450,)], ["item_id"])
    got = {
        r["item_id"]: list(r["factors"])
        for r in _init_factors(ids, "item_id", 4, 7).collect()
    }
    for i in (3, 17, 450):
        exp = [
            (xxhash64(("long", i), ("int", j), ("int", 7)) % 1000) / 10000.0
            - 0.05
            for j in range(4)
        ]
        assert got[i] == exp
