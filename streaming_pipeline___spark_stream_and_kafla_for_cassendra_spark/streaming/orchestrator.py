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
