"""Streaming as-of enrichment with a persistent latest-state store.

Spark's built-in stream-stream join cannot express "attach the most
recent prior reading" (the per-left-row MAX over matches is not an
append-mode-safe aggregate), yet it is THE enrichment shape of real
pipelines: purchases ⟕ latest prior page view, orders ⟕ latest quote,
sensor alerts ⟕ last calibration. This module maintains it with one
``foreachBatch`` over a tagged union of both streams:

per micro-batch cut (ΔL facts, ΔR state updates):

1. ``candidates = latest_state ∪ ΔR``
2. ``enriched  = asof_join(ΔL, candidates)``   (the batch operator —
   union + one partition-sorted window pass, never a range blowup)
3. append ``enriched`` to the output lake (batch-id-named dir)
4. ``latest_state ← latest-per-key(candidates)``  (compacted: the
   state table holds ONE row per key, not history)

Exactness contract: when micro-batches respect event-time order
(every fact in batch N has ``left_ts`` ≥ any ``right_ts`` arriving
after batch N — guaranteed by an ordered replay, a watermarked
upstream, or CDC topics keyed to the same clock), the concatenated
output EQUALS the global batch as-of join, verified by the DuckDB
``ASOF LEFT JOIN`` oracle. Under arbitrary disorder the result is the
standard processing-time semantics: each fact sees the state known
when its batch ran.

Scale design:

* The state table is keys-sized (one row per key), read and rewritten
  once per batch — at 1000 executors both sides hash-partition on the
  key, and the as-of join itself is the single-shuffle union+window
  plan from ``operators/joins.py``.
* Idempotence follows the lake/rollup/IVM discipline: every batch
  writes ``batch=N`` dirs with overwrite mode and a commit marker
  LAST, so at-least-once replays cannot double-append (the replay
  overwrites the same files and re-reads the same pre-batch state —
  markers gate which state generation is visible).
* (key, right_ts) pairs are assumed unique (true for event streams
  with unique event ids); ties would make "latest" ambiguous in any
  engine.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.joins import asof_join
from .ivm import tag_sides, _TAG
from .lake import path_has_data


@dataclass
class AsofEnrichView:
    """Lake-materialized as-of enrichment of a fact stream."""

    path: str
    on: tuple[str, ...]
    left_ts: str
    right_ts: str

    @property
    def _out(self) -> str:
        return os.path.join(self.path, "out")

    @property
    def _state(self) -> str:
        return os.path.join(self.path, "state")

    def _marker(self, batch_id: int) -> str:
        return os.path.join(self.path, "_asof_commits", str(batch_id))

    def _committed(self, batch_id: int) -> bool:
        return os.path.exists(self._marker(batch_id))

    def _commit(self, batch_id: int) -> None:
        os.makedirs(os.path.dirname(self._marker(batch_id)), exist_ok=True)
        with open(self._marker(batch_id), "w", encoding="utf-8"):
            pass

    def _latest_state(
        self, spark: SparkSession, before_batch: int
    ) -> DataFrame | None:
        """Most recent COMMITTED state generation strictly before
        ``before_batch`` (state is compacted, so one dir suffices; an
        uncommitted crash leftover is skipped by the marker check)."""
        if not os.path.isdir(self._state):
            return None
        gens = sorted(
            (
                int(d.split("=", 1)[1])
                for d in os.listdir(self._state)
                if d.startswith("batch=")
            ),
            reverse=True,
        )
        for g in gens:
            if g < before_batch and self._committed(g):
                p = os.path.join(self._state, f"batch={g}")
                if path_has_data(spark, p):
                    return spark.read.parquet(p)
        return None

    def apply_batch(
        self,
        fact_delta: DataFrame,
        state_delta: DataFrame,
        spark: SparkSession,
        batch_id: int,
    ) -> None:
        if self._committed(batch_id):
            return
        keys = list(self.on)
        prev = self._latest_state(spark, batch_id)
        candidates = (
            state_delta
            if prev is None
            else prev.unionByName(state_delta.select(prev.columns))
        )
        enriched = asof_join(
            fact_delta,
            candidates,
            on=keys,
            left_ts=self.left_ts,
            right_ts=self.right_ts,
        )
        sub = f"batch={batch_id}"
        enriched.write.mode("overwrite").parquet(os.path.join(self._out, sub))
        w = Window.partitionBy(*keys).orderBy(F.col(self.right_ts).desc())
        compacted = (
            candidates.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        compacted.write.mode("overwrite").parquet(
            os.path.join(self._state, sub)
        )
        self._commit(batch_id)

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.option("recursiveFileLookup", "true").parquet(
            self._out
        )


def write_streams_to_asof_enrich(
    facts: DataFrame,
    state_updates: DataFrame,
    view: AsofEnrichView,
    checkpoint_root: str,
    processing_time: str | None = "30 seconds",
    available_now: bool = False,
) -> StreamingQuery:
    """Maintain ``view`` from the two input streams via ONE
    foreachBatch (a single tagged union keeps the (ΔL, ΔR) cut
    consistent — two racing queries would let a fact miss a state row
    that `arrived` before it)."""
    f_cols = list(facts.columns)
    s_cols = list(state_updates.columns)
    tagged = tag_sides(facts, state_updates)
    spark = tagged.sparkSession

    def sink(batch: DataFrame, batch_id: int) -> None:
        batch.persist()
        try:
            fd = batch.filter(F.col(_TAG) == "l").select(*f_cols)
            sd = batch.filter(F.col(_TAG) == "r").select(*s_cols)
            view.apply_batch(fd, sd, spark, batch_id)
        finally:
            batch.unpersist()

    writer = (
        tagged.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_root)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()
