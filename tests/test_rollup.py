"""Incrementally-maintained streaming rollup (continuous aggregate).

The mergeable-partials invariant under test: folding micro-batches one
at a time into the stored rollup must equal a single batch aggregation
over the union of all input — including late rows landing in old
partitions — and replayed batch ids must be no-ops.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.streaming.rollup import (
    RollupTable,
    write_stream_to_rollup,
)


def _rows(spark, data):
    return spark.createDataFrame(
        data, "ts timestamp, event_type string, value double"
    )


def _expected(all_rows_df):
    return {
        (r.window_start, r.event_type): (r.cnt, r.sum_value, r.min_value, r.max_value)
        for r in all_rows_df.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        )
        .agg(
            F.count("*").alias("cnt"),
            F.sum("value").alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "cnt",
                "sum_value", "min_value", "max_value")
        .collect()
    }


def _got(table, spark):
    return {
        (r.window_start, r.event_type): (r.cnt, r.sum_value, r.min_value, r.max_value)
        for r in table.read(spark).collect()
    }


BATCH1 = [
    (dt.datetime(2024, 1, 1, 10, 5), "view", 1.0),
    (dt.datetime(2024, 1, 1, 10, 40), "view", 3.0),
    (dt.datetime(2024, 1, 1, 11, 10), "click", 2.0),
]
BATCH2 = [
    (dt.datetime(2024, 1, 1, 11, 20), "click", 8.0),
    (dt.datetime(2024, 1, 2, 9, 0), "view", 5.0),
]
# late row: lands in BATCH1's (old) window and partition day
BATCH3 = [(dt.datetime(2024, 1, 1, 10, 55), "view", 10.0)]


def test_incremental_merge_equals_batch_aggregate(spark, tmp_path):
    table = RollupTable(path=str(tmp_path / "r"))
    for i, batch in enumerate((BATCH1, BATCH2, BATCH3)):
        table.merge_batch(_rows(spark, batch), spark, batch_id=i)
    expected = _expected(_rows(spark, BATCH1 + BATCH2 + BATCH3))
    assert _got(table, spark) == expected
    # derived measure computed from mergeable state at read time
    avg = {
        (r.window_start, r.event_type): r.avg_value
        for r in table.read(spark).collect()
    }
    key = (dt.datetime(2024, 1, 1, 10, 0), "view")
    assert avg[key] == (1.0 + 3.0 + 10.0) / 3


def test_replayed_batch_id_is_noop(spark, tmp_path):
    table = RollupTable(path=str(tmp_path / "r2"))
    table.merge_batch(_rows(spark, BATCH1), spark, batch_id=0)
    table.merge_batch(_rows(spark, BATCH1), spark, batch_id=0)  # retry
    assert _got(table, spark) == _expected(_rows(spark, BATCH1))


def test_streaming_rollup_availablenow(spark, tmp_path):
    src = tmp_path / "src"
    _rows(spark, BATCH1).write.parquet(str(src / "a"))
    _rows(spark, BATCH2).write.parquet(str(src / "b"))
    table = RollupTable(path=str(tmp_path / "r3"))
    stream = (
        spark.readStream.schema("ts timestamp, event_type string, value double")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    q = write_stream_to_rollup(
        stream, table, checkpoint_root=str(tmp_path / "ck"), available_now=True
    )
    q.awaitTermination(120)
    expected = _expected(_rows(spark, BATCH1 + BATCH2))
    assert _got(table, spark) == expected

    # restart with the same checkpoint: only the new file is processed,
    # and the result still matches the full-input batch aggregate
    _rows(spark, BATCH3).write.parquet(str(src / "c"))
    q2 = write_stream_to_rollup(
        stream, table, checkpoint_root=str(tmp_path / "ck"), available_now=True
    )
    q2.awaitTermination(120)
    expected = _expected(_rows(spark, BATCH1 + BATCH2 + BATCH3))
    assert _got(table, spark) == expected


def test_backfill_then_stream_equals_one_shot_and_is_replay_safe(spark, tmp_path):
    """Kappa handoff: history(<cutover) as a ledgered batch + stream
    (>=cutover) must equal the one-shot batch rollup, straddling
    windows included; re-running the backfill is a no-op."""
    import datetime as dt

    from pyspark.sql import functions as F

    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.sources.tables import (
        load_events_stream,
        load_table,
    )
    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.streaming.rollup import (
        RollupTable,
        backfill_then_stream,
    )

    sf = "/root/testdata/sf0.001"
    batch = load_table(spark, sf, "events")
    table = RollupTable(path=str(tmp_path / "t"), keys=("event_type",))
    cutover = dt.datetime(2024, 1, 16, 0, 30)  # deliberately mid-window
    q = backfill_then_stream(
        table,
        history=batch,
        stream=load_events_stream(spark, sf),
        cutover=cutover,
        checkpoint_root=str(tmp_path / "ck"),
        available_now=True,
    )
    q.awaitTermination(300)

    got = {
        (r.window_start, r.event_type): (r.cnt, round(r.sum_value, 4))
        for r in table.read(spark).collect()
    }
    want = {
        (r.ws, r.event_type): (r.cnt, round(r.sv, 4))
        for r in batch.groupBy(
            F.date_trunc("hour", "ts").alias("ws"), "event_type"
        )
        .agg(F.count("*").alias("cnt"), F.sum("value").alias("sv"))
        .collect()
    }
    assert {(k[0].replace(tzinfo=None), k[1]): v for k, v in got.items()} == {
        (k[0].replace(tzinfo=None) if hasattr(k[0], "replace") else k[0], k[1]): v
        for k, v in want.items()
    }

    # replayed backfill: ledgered batch_id=-1 makes it a no-op
    before = sorted(got.items())
    table.merge_batch(
        batch.filter(F.col("ts") < F.lit(cutover)), spark, batch_id=-1
    )
    after = sorted(
        (
            (r.window_start, r.event_type),
            (r.cnt, round(r.sum_value, 4)),
        )
        for r in table.read(spark).collect()
    )
    assert after == before
