"""End-to-end CDC streaming pipeline — the engine's equivalent of the
reference's ``main()`` (``multi_source_streaming_processor.py:307-398``).

Source-agnostic: anything presenting the Kafka record contract
(``value`` string/binary, optional key/topic/timestamp) works — the
real Kafka source in production, a file/rate/memory source in tests.

Differences from the reference, by design (SURVEY.md §7):

* watermarks are mandatory on the windowed aggregations (fixes the
  unbounded-state bug T3);
* the parse/enrich prefix is built once per source and shared by all
  sinks (the reference re-reads the source for each of its 9 queries);
* streaming countDistinct → approx_count_distinct (T-digest-free HLL
  state, streaming-legal).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.aggregates import (
    daily_activity_aggregation,
    hourly_activity_aggregation,
)
from ..operators.enrich import enrich_activities, enrich_employees
from ..schemas import ACTIVITY_SCHEMA, EMPLOYEE_SCHEMA
from ..sources.cdc import decode_cdc
from .lake import LakeTable, write_stream_to_lake
from .orchestrator import StreamOrchestrator
from .sinks import write_memory


@dataclass
class CdcPipeline:
    """Employee/activity CDC pipeline over two record streams."""

    spark: SparkSession
    checkpoint_root: str
    orchestrator: StreamOrchestrator = field(default_factory=StreamOrchestrator)

    # -- transformation graph (lazy, shared prefix) ---------------------

    def employees(self, raw: DataFrame) -> DataFrame:
        """Kafka records → decoded + enriched employee rows
        (MSP:98-141 parity)."""
        return enrich_employees(decode_cdc(raw, EMPLOYEE_SCHEMA))

    def activities(self, raw: DataFrame) -> DataFrame:
        """Kafka records → decoded + enriched activity rows
        (MSP:143-197 parity)."""
        return enrich_activities(decode_cdc(raw, ACTIVITY_SCHEMA))

    def cassandra_activities(self, raw: DataFrame) -> DataFrame:
        """Cassandra-topic records → enriched activity rows.

        S4 contract (``cassandra-connector.json:4-16``): the DataStax
        source connector emits schemaless plain-JSON row images with
        no Debezium envelope, so decoding is a single ``from_json``
        against the same ACTIVITY_SCHEMA. ``op`` is synthesized as
        'c' (row images, not change deltas) and event time comes from
        the row's own ``activity_timestamp``.
        """
        rows = raw.select(
            F.from_json(F.col("value").cast("string"), ACTIVITY_SCHEMA).alias("row")
        ).select(
            "row.*",
            F.lit("c").alias("op"),
            F.to_timestamp(F.col("row.activity_timestamp")).alias("event_timestamp"),
            F.current_timestamp().alias("processing_timestamp"),
        )
        return enrich_activities(rows, data_source="cassandra")

    def canonical_activities(
        self, cdc_raw: DataFrame, cassandra_raw: DataFrame
    ) -> DataFrame:
        """One canonical activity stream from both sources (SURVEY
        §2.9 extension: the reference processes the Postgres-CDC and
        Cassandra streams in parallel, MSP:313-321, and never unions
        them). ``unionByName`` so decoder column order can't mis-bind;
        ``data_source`` disambiguates lineage downstream. Everything
        below the union (windowed aggs, sinks, lake) sees a single
        stream — one state store, one set of sinks, half the queries.
        """
        return self.activities(cdc_raw).unionByName(
            self.cassandra_activities(cassandra_raw)
        )

    def hourly_aggregation(self, activities: DataFrame) -> DataFrame:
        return hourly_activity_aggregation(activities)

    def daily_aggregation(self, activities: DataFrame) -> DataFrame:
        return daily_activity_aggregation(activities)

    # -- fan-out --------------------------------------------------------

    def start_memory_fanout(
        self,
        employee_raw: DataFrame,
        activity_raw: DataFrame,
        lake_root: str | None = None,
        available_now: bool = True,
    ) -> StreamOrchestrator:
        """The reference's 9-query fan-out, testable: enriched streams
        and both aggregations to memory sinks, optionally the enriched
        employee stream to the upsert lake (MSP:324-366 shape)."""
        emp = self.employees(employee_raw)
        act = self.activities(activity_raw)

        self.orchestrator.register(
            "employees_enriched",
            write_memory(emp, "employees_enriched", available_now=available_now),
        )
        self.orchestrator.register(
            "activities_enriched",
            write_memory(act, "activities_enriched", available_now=available_now),
        )
        # update mode for the aggregations — reference parity (MSP:338,343)
        self.orchestrator.register(
            "hourly_agg",
            write_memory(
                self.hourly_aggregation(act),
                "hourly_agg",
                output_mode="update",
                available_now=available_now,
            ),
        )
        self.orchestrator.register(
            "daily_agg",
            write_memory(
                self.daily_aggregation(act),
                "daily_agg",
                output_mode="update",
                available_now=available_now,
            ),
        )
        if lake_root is not None:
            table = LakeTable(path=f"{lake_root}/employees")
            self.orchestrator.register(
                "employees_lake",
                write_stream_to_lake(
                    emp,
                    table,
                    checkpoint_root=self.checkpoint_root,
                    available_now=available_now,
                ),
            )
        return self.orchestrator

    def start_single_scan_fanout(
        self,
        activity_raw: DataFrame,
        batch_sinks: list,
        available_now: bool = True,
        name: str = "shared_fanout",
    ):
        """ONE StreamingQuery, N sinks, one source scan per trigger.

        The reference starts 9 independent queries from 2 sources
        (MSP:324-366); every ``start()`` re-reads its Kafka topic and
        re-runs the two-stage JSON parse per trigger — the source is
        fetched and decoded up to 4× per micro-batch interval. Here
        the decoded/enriched micro-batch is persisted once inside
        ``foreachBatch`` and every sink writes from the cache: source
        I/O and parse CPU are paid once regardless of sink count, and
        all sinks observe the *same* batch (no cross-sink offset
        skew). At 100 TB/day of CDC traffic this is the difference
        between 1× and sink-count× broker egress.

        ``batch_sinks``: callables ``(batch_df, batch_id) -> None``
        executed sequentially per micro-batch (exactly-once per sink
        is the sink's job — e.g. ``LakeTable.upsert_batch`` is
        idempotent on replay). Stateful windowed aggregations keep
        their own queries: their state lives in the streaming engine,
        which ``foreachBatch`` bodies cannot host.
        """
        act = self.activities(activity_raw)

        def fan_out(batch_df: DataFrame, batch_id: int) -> None:
            batch_df.persist()
            try:
                for sink in batch_sinks:
                    sink(batch_df, batch_id)
            finally:
                batch_df.unpersist()

        writer = (
            act.writeStream.queryName(name)
            .foreachBatch(fan_out)
            .option(
                "checkpointLocation", f"{self.checkpoint_root}/{name}"
            )
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        query = writer.start()
        self.orchestrator.register(name, query)
        return query
