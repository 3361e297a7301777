"""Custom Python DataSource (Spark 4 DataSource API) emitting the
reference's CDC record contract — a pluggable, broker-less stand-in
for the Kafka+Debezium feed.

The reference's source is a Kafka topic of Debezium envelopes
(``multi_source_streaming_processor.py:76-96`` reads it;
``PROJECT_DOCUMENTATION.md:479-497`` documents the envelope). Tests
and demos need that contract WITHOUT a broker; this module registers
``cdc_envelope`` as a first-class Spark source:

    spark.dataSource.register(CdcEnvelopeDataSource)
    df = (spark.read.format("cdc_envelope")
          .option("rows", 1000).option("numPartitions", 4).load())
    stream = (spark.readStream.format("cdc_envelope")
              .option("rowsPerBatch", 100).load())

Rows carry the Kafka record shape (key, value, topic, partition,
offset, timestamp) with ``value`` = the Debezium envelope JSON, so
the SAME two-stage ``decode_cdc`` path consumes this source, the
file-source twins, and a real Kafka topic interchangeably.

Everything is DETERMINISTIC in (seed, offset): employee id cycles a
bounded population, op cycles c/u/u/d, ts_ms advances 1 s per offset
from a fixed epoch — so batch reads, stream replays, and
cross-engine assertions all reproduce bit-identical envelopes. The
batch reader parallelizes via ``numPartitions`` input partitions
(offset ranges, no driver materialization); the stream reader is a
``SimpleDataSourceStreamReader`` whose offset is just the next row
number (``readBetweenOffsets`` makes micro-batch replay exact).
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
)

SCHEMA_DDL = (
    "key string, value string, topic string, "
    "partition int, offset bigint, timestamp timestamp"
)

_EPOCH_MS = 1704067200000  # 2024-01-01T00:00:00Z — fixed, deterministic
_OPS = ("c", "u", "u", "d")
_DEPTS = ("Engineering", "Marketing", "Sales", "HR")


_ACTIVITIES = ("login", "page_view", "purchase", "logout", "search")
_DEVICES = ("mobile", "desktop", "tablet")


def _payload(i: int, table: str):
    emp_id = (i * 7) % 499 + 1  # odd population, coprime to the op cycle
    if table == "activities":
        ts_s = (_EPOCH_MS + i * 1000) // 1000
        import datetime as _dt

        iso = _dt.datetime.fromtimestamp(
            ts_s, tz=_dt.timezone.utc
        ).strftime("%Y-%m-%d %H:%M:%S")
        return emp_id, {
            "id": str(i),
            "employee_id": emp_id,
            "activity_type": _ACTIVITIES[i % len(_ACTIVITIES)],
            "page_url": f"/page/{i % 37}",
            "duration_seconds": (i * 13) % 600 + 5,
            "ip_address": f"10.0.{emp_id % 256}.{i % 256}",
            "user_agent": "demo",
            "activity_timestamp": iso,
            "session_id": f"s{emp_id}-{i // 50}",
            "device_type": _DEVICES[i % len(_DEVICES)],
            "browser": "firefox",
            "created_at": iso,
        }
    return emp_id, {
        "id": emp_id,
        "name": f"emp{emp_id}",
        "email": f"emp{emp_id}@corp.test",
        "department": _DEPTS[emp_id % len(_DEPTS)],
        "created_at": "2024-01-01T08:00:00",
    }


def _envelope_row(i: int, topic: str, table: str = "employees"):
    """Deterministic Kafka-shaped record #i (shared by batch+stream)."""
    import datetime

    op = _OPS[i % len(_OPS)]
    ts_ms = _EPOCH_MS + i * 1000
    emp_id, payload = _payload(i, table)
    after = None if op == "d" else json.dumps(payload)
    before = (
        json.dumps({"id": payload["id"]}) if op in ("u", "d") else None
    )
    value = json.dumps(
        {"payload": {"before": before, "after": after, "op": op, "ts_ms": ts_ms}}
    )
    ts = datetime.datetime.fromtimestamp(
        ts_ms / 1000.0, tz=datetime.timezone.utc
    ).replace(tzinfo=None)
    return (str(emp_id), value, topic, 0, i, ts)


@dataclass
class _Range(InputPartition):
    start: int
    end: int


class _BatchReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("rows", 1000))
        self.parts = int(options.get("numPartitions", 4))
        self.topic = options.get("topic", "employee-server.public.employees")
        self.table = options.get("table", "employees")
        self.lo = 0       # pushed offset bounds narrow the generated
        self.hi = self.n  # range BEFORE partition planning

    def pushFilters(self, filters):
        """Source-side predicate pushdown (the Python DataSource
        twin of parquet's PushedFilters): offset range comparisons
        clamp the generated range, so partitions() plans over the
        SELECTED rows only — filters on other columns are returned
        as unsupported and Spark re-applies them post-scan."""
        for f in filters:
            col = f.attribute[0] if hasattr(f, "attribute") else None
            if col == "offset" and isinstance(
                f, (GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual)
            ):
                v = int(f.value)
                if isinstance(f, GreaterThan):
                    self.lo = max(self.lo, v + 1)
                elif isinstance(f, GreaterThanOrEqual):
                    self.lo = max(self.lo, v)
                elif isinstance(f, LessThan):
                    self.hi = min(self.hi, v)
                else:
                    self.hi = min(self.hi, v + 1)
            else:
                yield f  # unsupported -> Spark evaluates it post-scan

    def partitions(self):
        lo, hi = self.lo, max(self.lo, self.hi)
        total = hi - lo
        if total == 0:
            return [_Range(lo, lo)]
        step = max(1, -(-total // self.parts))
        return [
            _Range(s, min(s + step, hi)) for s in range(lo, hi, step)
        ]

    def read(self, partition):
        for i in range(partition.start, partition.end):
            yield _envelope_row(i, self.topic, self.table)


class _StreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.per_batch = int(options.get("rowsPerBatch", 100))
        self.topic = options.get("topic", "employee-server.public.employees")
        self.table = options.get("table", "employees")
        self.max_rows = int(options.get("maxRows", 0))  # 0 = unbounded

    def initialOffset(self):
        return {"offset": 0}

    def read(self, start):
        s = start["offset"]
        e = s + self.per_batch
        if self.max_rows:
            e = min(e, self.max_rows)
        rows = [_envelope_row(i, self.topic, self.table) for i in range(s, e)]
        return iter(rows), {"offset": e}

    def readBetweenOffsets(self, start, end):
        return iter(
            _envelope_row(i, self.topic, self.table)
            for i in range(start["offset"], end["offset"])
        )


class CdcEnvelopeDataSource(DataSource):
    """``cdc_envelope`` — batch + streaming Debezium-contract source."""

    @classmethod
    def name(cls):
        return "cdc_envelope"

    def schema(self):
        return SCHEMA_DDL

    def reader(self, schema):
        return _BatchReader(self.options)

    def simpleStreamReader(self, schema):
        return _StreamReader(self.options)


# ---------------------------------------------------------------------------
# the write side: a JSONL sink with two-phase commit (task attempts
# stage to uniquely-named temp files; the DRIVER's commit() publishes
# them by rename, abort() discards) — the writer half of the pluggable
# connector story, mirroring how the Kafka sink's transactional
# producer publishes only on commit.
# ---------------------------------------------------------------------------

from dataclasses import dataclass as _dc

from pyspark.sql.datasource import (  # noqa: E402 (grouped with use site)
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)


@_dc
class _Staged(WriterCommitMessage):
    staged_path: str
    rows: int


class _JsonlWriter(DataSourceWriter):
    def __init__(self, options):
        self.path = options["path"]
        self.prefix = "batch"

    def write(self, iterator):
        """Runs on EXECUTORS, once per partition attempt: stage to a
        unique temp file; speculative/retried attempts stage separate
        files and only the committed attempt gets published."""
        import json as _json
        import os as _os
        import uuid as _uuid

        staging_dir = _os.path.join(self.path, "_staging")
        _os.makedirs(staging_dir, exist_ok=True)
        staged = _os.path.join(staging_dir, f"{_uuid.uuid4().hex}.jsonl")
        n = 0
        with open(staged, "w") as fh:
            for row in iterator:
                fh.write(_json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return _Staged(staged_path=staged, rows=n)

    def commit(self, messages):
        """Driver-side publish: rename staged files into place. Until
        this runs, readers of ``path`` see none of the job's output."""
        import os as _os

        for i, m in enumerate(messages):
            if m is None or m.rows == 0:
                if m is not None and _os.path.exists(m.staged_path):
                    _os.remove(m.staged_path)
                continue
            final = _os.path.join(self.path, f"{self.prefix}-{i:05d}.jsonl")
            _os.replace(m.staged_path, final)

    def abort(self, messages):
        import os as _os

        for m in messages:
            if m is not None and _os.path.exists(m.staged_path):
                _os.remove(m.staged_path)


class _JsonlStreamWriter(DataSourceStreamWriter):
    def __init__(self, options):
        self.path = options["path"]

    def write(self, iterator):
        return _JsonlWriter({"path": self.path}).write(iterator)

    def commit(self, messages, batchId):
        import os as _os

        for i, m in enumerate(messages):
            if m is None or m.rows == 0:
                if m is not None and _os.path.exists(m.staged_path):
                    _os.remove(m.staged_path)
                continue
            final = _os.path.join(
                self.path, f"stream-{batchId:08d}-{i:05d}.jsonl"
            )
            # replayed batch ids overwrite their own files → idempotent
            _os.replace(m.staged_path, final)

    def abort(self, messages, batchId):
        import os as _os

        for m in messages:
            if m is not None and _os.path.exists(m.staged_path):
                _os.remove(m.staged_path)


class JsonlSinkDataSource(DataSource):
    """``jsonl_sink`` — batch + streaming two-phase-commit JSONL sink."""

    @classmethod
    def name(cls):
        return "jsonl_sink"

    def writer(self, schema, overwrite):
        return _JsonlWriter(self.options)

    def streamWriter(self, schema, overwrite):
        return _JsonlStreamWriter(self.options)
