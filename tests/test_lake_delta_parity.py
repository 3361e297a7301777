"""LakeTable ↔ real-lake-format parity — gated integration test
(SURVEY §7-M3's "swap in real Hudi/Delta" promise).

``streaming/lake.py`` emulates Hudi-COW upsert semantics (precombine
latest-wins, CDC tombstones, partition-scoped rewrites). THIS test
proves the emulation matches a real transactional lake format on a
golden operation sequence: the same inserts / out-of-order upserts /
tombstone deletes applied to a Delta table via ``MERGE`` must leave
byte-identical live state.

Gate: requires the ``delta-spark`` package AND its jars on the
session classpath (``pytest.importorskip`` + a session-build guard).
Neither ships in the CI sandbox, so the test skips cleanly there; on
a real deployment it runs and pins the parity contract. Hudi, where
its bundle is present instead, satisfies the same sequence — the
assertions only touch (key, value) state.
"""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

delta = pytest.importorskip(
    "delta", reason="delta-spark not installed — lake parity runs only "
    "where a real lake format is available"
)


@pytest.fixture(scope="module")
def delta_spark():
    """A session with the Delta extensions; skip if the jars are
    missing (import alone doesn't prove the classpath)."""
    from pyspark.sql import SparkSession

    try:
        builder = (
            SparkSession.builder.master("local[4]")
            .appName("lake-delta-parity")
            .config(
                "spark.sql.extensions",
                "io.delta.sql.DeltaSparkSessionExtension",
            )
            .config(
                "spark.sql.catalog.spark_catalog",
                "org.apache.spark.sql.delta.catalog.DeltaCatalog",
            )
        )
        spark = delta.configure_spark_with_delta_pip(builder).getOrCreate()
        # force a Delta code path so a jar-less classpath fails HERE
        spark.range(1).write.format("delta").mode("overwrite").save(
            "/tmp/_delta_probe"
        )
    except Exception as exc:  # noqa: BLE001
        pytest.skip(f"Delta jars unavailable on classpath: {exc}")
    yield spark
    spark.stop()


D = dt.date(2024, 1, 1)
T = [dt.datetime(2024, 1, 1, 10 + h) for h in range(4)]

# golden sequence: insert, newer upsert, OUT-OF-ORDER older upsert
# (must lose), tombstone delete, fresh insert of a new key, and a
# NEWER re-insert of the deleted key (must win the key back in both
# systems — delete-then-newer-insert parity)
BATCHES = [
    ([(1, "a0", T[0], D), (2, "b0", T[0], D)], None),
    ([(1, "a1", T[2], D)], None),
    ([(1, "stale", T[1], D)], None),  # older than a1 -> ignored
    ([(2, "b-del", T[2], D)], {2}),  # tombstone for key 2
    ([(3, "c0", T[1], D)], None),
    ([(2, "b1", T[3], D)], None),  # newer than the tombstone
]


def _df(spark, rows, deletes):
    df = spark.createDataFrame(
        rows,
        "id int, val string, processing_timestamp timestamp, "
        "processing_date date",
    )
    return df.withColumn(
        "is_delete",
        F.col("id").isin(list(deletes)) if deletes else F.lit(False),
    )


def test_golden_sequence_matches_delta_merge(delta_spark, tmp_path):
    from delta.tables import DeltaTable

    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.streaming.lake import (
        LakeTable,
    )

    spark = delta_spark

    # --- engine side: the Hudi-COW emulation
    emu = LakeTable(path=str(tmp_path / "emu"))
    for rows, deletes in BATCHES:
        emu.upsert_batch(_df(spark, rows, deletes), spark, delete_col="is_delete")

    # --- reference side: Delta MERGE with precombine guard
    dpath = str(tmp_path / "delta")
    first, *rest = BATCHES
    _df(spark, *first).drop("is_delete").write.format("delta").partitionBy(
        "processing_date"
    ).save(dpath)
    for rows, deletes in rest:
        src = _df(spark, rows, deletes)
        tgt = DeltaTable.forPath(spark, dpath)
        (
            tgt.alias("t")
            .merge(src.alias("s"), "t.id = s.id")
            .whenMatchedDelete(
                "s.is_delete AND s.processing_timestamp >= t.processing_timestamp"
            )
            .whenMatchedUpdate(
                "NOT s.is_delete AND s.processing_timestamp >= t.processing_timestamp",
                {
                    "val": "s.val",
                    "processing_timestamp": "s.processing_timestamp",
                    "processing_date": "s.processing_date",
                },
            )
            .whenNotMatchedInsert(
                "NOT s.is_delete",
                {
                    "id": "s.id",
                    "val": "s.val",
                    "processing_timestamp": "s.processing_timestamp",
                    "processing_date": "s.processing_date",
                },
            )
            .execute()
        )

    got = sorted(
        (r.id, r.val) for r in emu.read(spark).select("id", "val").collect()
    )
    want = sorted(
        (r.id, r.val)
        for r in spark.read.format("delta").load(dpath).select("id", "val").collect()
    )
    assert got == want == [(1, "a1"), (2, "b1"), (3, "c0")]
