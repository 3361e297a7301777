"""Incrementally-maintained materialized JOIN view (delta-join IVM).

The reference reads two CDC streams but never joins them (SURVEY
§2.4: the employees↔activities FK exists only in the DDL). Spark's
built-in stream-stream join holds both sides in the state store and
needs watermark-bounded time conditions; an analyst's "current join
of everything seen so far" — the classic materialized view — is not
expressible there. This module maintains it in the lake with the
textbook delta-join rule: for micro-batch deltas ΔL, ΔR against
accumulated sides L, R::

    Δ(L ⋈ R) = ΔL ⋈ R  ∪  L ⋈ ΔR  ∪  ΔL ⋈ ΔR

so the view after every batch equals the full batch join of
everything ingested — without ever recomputing it.

Scale design:

* Per batch, only the DELTAS scan both full sides — and the join is
  keyed, so at 1000 executors each is one shuffle (or zero with
  bucketed state dirs); the view itself is never rewritten, only
  appended (each batch writes its own ``batch=N`` directory).
* Writes are made idempotent the same way the rollup/lake sinks are:
  every batch's view/state output goes to a batch-id-named directory
  with overwrite mode, and a commit marker is written LAST — a
  replayed foreachBatch overwrites the same files and cannot
  double-append (effectively-once on at-least-once delivery).
* Both input streams are packed into ONE tagged union so a single
  foreachBatch sees a consistent (ΔL, ΔR) cut — two independent
  queries racing on shared state would lose the ΔL ⋈ ΔR term.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from .lake import path_has_data


@dataclass
class JoinView:
    """A lake-materialized inner equi-join of two streamed relations."""

    path: str
    on: tuple[str, ...]  # equi-join key column name(s), present on both sides

    @property
    def _view(self) -> str:
        return os.path.join(self.path, "view")

    def _side(self, which: str) -> str:
        return os.path.join(self.path, f"state_{which}")

    def _marker(self, batch_id: int) -> str:
        return os.path.join(self.path, "_ivm_commits", str(batch_id))

    def _committed(self, batch_id: int) -> bool:
        return os.path.exists(self._marker(batch_id))

    def _commit(self, batch_id: int) -> None:
        os.makedirs(os.path.dirname(self._marker(batch_id)), exist_ok=True)
        with open(self._marker(batch_id), "w", encoding="utf-8"):
            pass

    @staticmethod
    def _read_state(
        spark: SparkSession, root: str, before_batch: int
    ) -> DataFrame | None:
        """State accumulated by batches STRICTLY BEFORE ``before_batch``.

        A crashed batch may have written its ``batch=N`` state subdir
        without committing; replaying N must not see those rows (it
        would double-count ΔL ⋈ ΔR), so subdirs are filtered by id,
        not just globbed.
        """
        if not os.path.isdir(root):
            return None
        parts = [
            os.path.join(root, d)
            for d in os.listdir(root)
            if d.startswith("batch=") and int(d.split("=", 1)[1]) < before_batch
        ]
        parts = [p for p in parts if path_has_data(spark, p)]
        if not parts:
            return None
        return spark.read.option("recursiveFileLookup", "true").parquet(*parts)

    def apply_batch(
        self,
        left_delta: DataFrame,
        right_delta: DataFrame,
        spark: SparkSession,
        batch_id: int,
    ) -> None:
        """Fold one (ΔL, ΔR) micro-batch cut into the view."""
        if self._committed(batch_id):
            return
        on = list(self.on)
        l_state = self._read_state(spark, self._side("left"), batch_id)
        r_state = self._read_state(spark, self._side("right"), batch_id)

        pieces = [left_delta.join(right_delta, on=on, how="inner")]
        if r_state is not None:
            pieces.append(left_delta.join(r_state, on=on, how="inner"))
        if l_state is not None:
            pieces.append(l_state.join(right_delta, on=on, how="inner"))
        delta_view = pieces[0]
        for p in pieces[1:]:
            delta_view = delta_view.unionByName(p)

        sub = f"batch={batch_id}"
        delta_view.write.mode("overwrite").parquet(
            os.path.join(self._view, sub)
        )
        left_delta.write.mode("overwrite").parquet(
            os.path.join(self._side("left"), sub)
        )
        right_delta.write.mode("overwrite").parquet(
            os.path.join(self._side("right"), sub)
        )
        self._commit(batch_id)

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.option("recursiveFileLookup", "true").parquet(
            self._view
        )


_TAG = "_ivm_side"


def tag_sides(left: DataFrame, right: DataFrame) -> DataFrame:
    """Pack two (possibly streaming) relations into one tagged union.

    Non-key columns must be disjoint between the sides; each side's
    missing columns ride as nulls.
    """
    l_cols = set(left.columns)
    r_cols = set(right.columns)
    l_tagged = left.withColumn(_TAG, F.lit("l"))
    for c, t in right.dtypes:
        if c not in l_cols:
            l_tagged = l_tagged.withColumn(c, F.lit(None).cast(t))
    r_tagged = right.withColumn(_TAG, F.lit("r"))
    for c, t in left.dtypes:
        if c not in r_cols:
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(t))
    return l_tagged.unionByName(r_tagged.select(l_tagged.columns))


def write_streams_to_join_view(
    left: DataFrame,
    right: DataFrame,
    view: JoinView,
    checkpoint_root: str,
    processing_time: str | None = "30 seconds",
    available_now: bool = False,
) -> StreamingQuery:
    """Maintain ``view`` from two input streams via one foreachBatch."""
    l_cols = list(left.columns)
    r_cols = list(right.columns)
    tagged = tag_sides(left, right)
    spark = tagged.sparkSession

    def sink(batch: DataFrame, batch_id: int) -> None:
        batch.persist()
        try:
            ld = batch.filter(F.col(_TAG) == "l").select(*l_cols)
            rd = batch.filter(F.col(_TAG) == "r").select(*r_cols)
            view.apply_batch(ld, rd, spark, batch_id)
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
