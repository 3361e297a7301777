"""Materialized summary tables with automatic query rewrite.

The reference's lake path materializes *enriched rows* (Hudi tables,
`multi_source_streaming_processor.py:260-292`) and leaves every
aggregate to be recomputed per query via Hive. This module adds the
missing acceleration layer every production deployment grows: a
**summary table** of mergeable partial aggregates at a fine time
grain, plus a rewrite step that answers coarser-grain queries from
the summary instead of the fact table.

Why this shape survives 100 TB:

* The summary stores **mergeable partials** (count / sum / min /
  max) per (time bucket, key...) — the Druid/Timescale invariant: a
  coarser grain or a key-subset rollup re-aggregates partials,
  never source rows. A year of hourly × type partials is ~10⁵ rows
  regardless of fact size.
* ``try_rewrite`` is *sound by refusal*: it answers ONLY when the
  request's grain is exactly expressible by truncating stored
  buckets AND the requested keys/measures are derivable from stored
  partials; anything else returns ``None`` and the caller falls
  back to the fact table. A rewrite can therefore change cost,
  never results.
* Derived measures (avg) come from sum/count at read time, so the
  summary never stores non-mergeable state.
* The summary is date-partitioned like the lake tables, so
  incremental refresh (see ``streaming/rollup.py::RollupTable`` for
  the streaming twin of this maintenance loop) rewrites only the
  days a batch touches, and reads prune by partition.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# calendar grains answerable by date_trunc over a finer bucket start;
# ordered fine → coarse. Truncating an HOUR bucket start to any
# coarser calendar grain maps every bucket into exactly one output
# bucket (hours nest into days/weeks/months/years).
_GRAIN_ORDER = ("minute", "hour", "day", "week", "month", "year")

MEASURES = ("n_rows", "sum_value", "min_value", "max_value", "avg_value")


@dataclass(frozen=True)
class AggRequest:
    """A rollup question: grain + grouping keys + measures."""

    grain: str
    keys: tuple[str, ...] = ()
    measures: tuple[str, ...] = ("n_rows", "sum_value")


@dataclass(frozen=True)
class SummaryTable:
    """Date-partitioned mergeable-partial summary of one fact table."""

    path: str
    time_col: str = "ts"
    value_col: str = "value"
    keys: tuple[str, ...] = ("event_type",)
    grain: str = "hour"

    # -- build / refresh ----------------------------------------------

    def build(self, base: DataFrame) -> None:
        """Full (re)build: one map-side-combinable aggregation of the
        fact table into per-(bucket, keys) partials. For incremental
        maintenance from a stream, feed the same partial shape
        through ``RollupTable`` — the storage contract matches."""
        v = F.col(self.value_col)
        partials = (
            base.groupBy(
                F.date_trunc(self.grain, F.col(self.time_col)).alias("bucket"),
                *self.keys,
            )
            .agg(
                F.count("*").alias("cnt"),
                F.sum(v).alias("sum_v"),
                F.min(v).alias("min_v"),
                F.max(v).alias("max_v"),
            )
            .withColumn("summary_date", F.to_date("bucket"))
        )
        partials.write.mode("overwrite").partitionBy("summary_date").parquet(
            self.path
        )

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.path)

    # -- rewrite ------------------------------------------------------

    def can_answer(self, req: AggRequest) -> bool:
        if req.grain not in _GRAIN_ORDER or self.grain not in _GRAIN_ORDER:
            return False
        if _GRAIN_ORDER.index(req.grain) < _GRAIN_ORDER.index(self.grain):
            return False  # finer than stored — partials can't split
        if not set(req.keys) <= set(self.keys):
            return False  # grouping key the summary never kept
        return set(req.measures) <= set(MEASURES)

    def try_rewrite(
        self, spark: SparkSession, req: AggRequest
    ) -> DataFrame | None:
        """Answer ``req`` from stored partials, or ``None`` if the
        request is not soundly answerable (caller falls back to the
        fact table). Output columns: bucket, *req.keys,
        *req.measures."""
        if not self.can_answer(req):
            return None
        s = self.read(spark)
        grouped = s.groupBy(
            F.date_trunc(req.grain, F.col("bucket")).alias("bucket"),
            *req.keys,
        ).agg(
            F.sum("cnt").alias("_n"),
            F.sum("sum_v").alias("_s"),
            F.min("min_v").alias("_min"),
            F.max("max_v").alias("_max"),
        )
        out_cols = [F.col("bucket"), *[F.col(k) for k in req.keys]]
        derive = {
            "n_rows": F.col("_n").alias("n_rows"),
            "sum_value": F.col("_s").alias("sum_value"),
            "min_value": F.col("_min").alias("min_value"),
            "max_value": F.col("_max").alias("max_value"),
            "avg_value": (F.col("_s") / F.col("_n")).alias("avg_value"),
        }
        out_cols += [derive[m] for m in req.measures]
        return grouped.select(*out_cols)


def answer_or_fallback(
    spark: SparkSession,
    summary: SummaryTable,
    base: DataFrame,
    req: AggRequest,
) -> DataFrame:
    """The full acceleration contract: rewrite against the summary
    when sound, otherwise compute from the fact table — identical
    output schema either way."""
    hit = summary.try_rewrite(spark, req)
    if hit is not None:
        return hit
    v = F.col(summary.value_col)
    derive = {
        "n_rows": F.count("*").alias("n_rows"),
        "sum_value": F.sum(v).alias("sum_value"),
        "min_value": F.min(v).alias("min_value"),
        "max_value": F.max(v).alias("max_value"),
        "avg_value": F.avg(v).alias("avg_value"),
    }
    return base.groupBy(
        F.date_trunc(req.grain, F.col(summary.time_col)).alias("bucket"),
        *req.keys,
    ).agg(*[derive[m] for m in req.measures])
