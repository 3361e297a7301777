from __future__ import annotations

import json
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark import get_session

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_session(
        "engine-tests",
        master="local[4]",
        shuffle_partitions=4,
    )
    yield s


def make_envelope(after: dict | None, op: str, ts_ms: int, before: dict | None = None) -> str:
    """Debezium envelope JSON exactly shaped like
    PROJECT_DOCUMENTATION.md:479-497 (after/before as JSON strings)."""
    return json.dumps(
        {
            "payload": {
                "before": json.dumps(before) if before is not None else None,
                "after": json.dumps(after) if after is not None else None,
                "op": op,
                "ts_ms": ts_ms,
            }
        }
    )


def employee_row(i: int, dept: str = "Engineering", email: str | None = None) -> dict:
    return {
        "id": i,
        "name": f"emp{i}",
        "email": email or f"emp{i}@corp.test",
        "department": dept,
        "created_at": "2024-01-01T08:00:00",
    }


def activity_row(
    i: int,
    employee_id: int = 1,
    activity_type: str = "login",
    ts: str = "2024-01-01 10:15:00",
    duration: int = 120,
    device: str = "mobile",
    page: str = "/home",
) -> dict:
    return {
        "id": str(i),
        "employee_id": employee_id,
        "activity_type": activity_type,
        "page_url": page,
        "duration_seconds": duration,
        "ip_address": "10.0.0.1",
        "user_agent": "pytest",
        "activity_timestamp": ts,
        "session_id": f"s{i}",
        "device_type": device,
        "browser": "firefox",
        "created_at": ts,
    }
