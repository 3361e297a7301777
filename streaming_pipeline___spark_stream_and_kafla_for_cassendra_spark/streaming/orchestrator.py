"""Multi-query orchestration (SURVEY.md §2.2 K4).

The reference runs 9 concurrent StreamingQuery handles from 2 sources
on one SparkSession and blocks forever in an awaitTermination loop
(``multi_source_streaming_processor.py:307-381``). This manager keeps
the same fan-out model but is non-blocking and failure-aware:
queries are registered by name, progress/exception state is
inspectable, and shutdown is graceful (stop all, await each).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql.streaming import StreamingQuery


@dataclass
class StreamOrchestrator:
    queries: dict[str, StreamingQuery] = field(default_factory=dict)

    def register(self, name: str, query: StreamingQuery) -> StreamingQuery:
        if name in self.queries:
            raise ValueError(f"query {name!r} already registered")
        self.queries[name] = query
        return query

    def status(self) -> dict[str, dict]:
        out = {}
        for name, q in self.queries.items():
            out[name] = {
                "id": str(q.id),
                "active": q.isActive,
                "exception": str(q.exception()) if q.exception() else None,
            }
        return out

    def failed(self) -> dict[str, str]:
        return {
            n: str(q.exception())
            for n, q in self.queries.items()
            if q.exception() is not None
        }

    def await_all(self, timeout: float | None = None) -> bool:
        """Wait until every query terminates (or the timeout lapses).
        Returns True if all terminated. Unlike the reference's
        blocking loop (MSP:372-374), a failed query raises with its
        cause instead of being silently swallowed."""
        deadline = None if timeout is None else time.monotonic() + timeout
        for name, q in self.queries.items():
            remaining = None if deadline is None else max(deadline - time.monotonic(), 0)
            if remaining is None:
                q.awaitTermination()
            elif not q.awaitTermination(remaining):
                return False
            if q.exception() is not None:
                raise RuntimeError(f"streaming query {name!r} failed") from q.exception()
        return True

    def stop_all(self, timeout: float = 60.0) -> None:
        for q in self.queries.values():
            if q.isActive:
                q.stop()
        deadline = time.monotonic() + timeout
        for q in self.queries.values():
            q.awaitTermination(max(deadline - time.monotonic(), 0))


class MetricsListener:
    """Engine-native observability for the fan-out (the reference
    monitored via console sinks and Kafka UI lag inspection,
    README.md:98-118; this captures the same signals in-process).

    Wraps ``StreamingQueryListener``: per query name keeps a bounded
    history of progress snapshots (input rows, rows/sec, batch
    duration, state rows) plus terminal status. Attach once per
    session; all orchestrated queries report through it.
    """

    def __init__(self, history: int = 100):
        from collections import defaultdict, deque

        self.history = history
        self._progress = defaultdict(lambda: deque(maxlen=history))
        self._terminated = {}
        self._listener = None

    def attach(self, spark) -> "MetricsListener":
        from pyspark.sql.streaming import StreamingQueryListener

        outer = self

        class _L(StreamingQueryListener):
            def onQueryStarted(self, event):
                pass

            def onQueryProgress(self, event):
                p = event.progress
                state_rows = sum(
                    s.numRowsTotal for s in (p.stateOperators or [])
                )
                late_dropped = sum(
                    getattr(s, "numRowsDroppedByWatermark", 0) or 0
                    for s in (p.stateOperators or [])
                )
                observed = {}
                try:
                    for obs_name, row in (p.observedMetrics or {}).items():
                        observed[obs_name] = row.asDict()
                except Exception:  # defensive: shape varies across versions
                    observed = {}
                outer._progress[p.name or str(p.id)].append(
                    {
                        "batch_id": p.batchId,
                        "num_input_rows": p.numInputRows,
                        "input_rows_per_second": p.inputRowsPerSecond,
                        "batch_duration_ms": p.batchDuration,
                        "state_rows": state_rows,
                        "late_rows_dropped": late_dropped,
                        "observed": observed,
                    }
                )

            def onQueryTerminated(self, event):
                outer._terminated[str(event.id)] = event.exception

            def onQueryIdle(self, event):
                pass

        self._listener = _L()
        spark.streams.addListener(self._listener)
        return self

    def detach(self, spark) -> None:
        if self._listener is not None:
            spark.streams.removeListener(self._listener)
            self._listener = None

    def progress(self, name: str) -> list[dict]:
        return list(self._progress.get(name, []))

    def totals(self) -> dict[str, int]:
        return {
            name: sum(p["num_input_rows"] for p in snaps)
            for name, snaps in self._progress.items()
        }


def observe_counters(df, name: str, value_col: str | None = None):
    """Attach in-plan observation metrics to a (streaming or batch)
    DataFrame: row count, plus null count and sum when ``value_col``
    is given.

    ``df.observe`` piggybacks accumulator-style aggregates on the
    batches the query already executes — data-quality counters with
    ZERO extra scans or shuffles, at any scale. Per micro-batch
    results surface through :class:`MetricsListener` progress entries
    under ``observed[name]`` (batch queries: via the listener's batch
    twin, ``DataFrame.observe`` docs).
    """
    from pyspark.sql import functions as F

    aggs = [F.count(F.lit(1)).alias("rows")]
    if value_col is not None:
        aggs.append(
            F.sum(F.col(value_col).isNull().cast("long")).alias("nulls")
        )
        aggs.append(F.sum(value_col).alias("value_sum"))
    return df.observe(name, *aggs)
