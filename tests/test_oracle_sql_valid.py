"""Every registered oracle must at least PLAN in DuckDB against the
sf0.001 views — a seconds-fast net that catches SQL typos and
generator regressions (the full value comparison lives in
tools/oracle_compare.py / the driver's correctness gate)."""

from __future__ import annotations

import duckdb
import pytest

from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.plans import (
    REGISTRY,
)
from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.plans.registry import (
    resolve_oracle,
)

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return c


def test_every_oracle_plans(con):
    failures = []
    for q in REGISTRY:
        oracle = resolve_oracle(q) if q.oracle is not None else None
        if oracle is None:
            continue
        try:
            con.execute(f"EXPLAIN {oracle}")
        except Exception as exc:  # noqa: BLE001 - collect all
            failures.append(f"{q.name}: {type(exc).__name__}: {exc}")
    assert not failures, "\n".join(failures[:10])


def test_rows_only_set_is_empty():
    # r6 converted the last three holdouts: multimodal_phash_images
    # (frozen integer DCT, bit-exact twin), pca_project_embeddings
    # (independent numpy refit embedded as per-fixture literals) and
    # als_recommend_parts (numpy trainer replay via the xxhash64
    # port + SQL serve join) — every registered query now has an
    # oracle. Lazy oracles (callables) count as present; they may
    # return None only when NO fixture is readable.
    no_oracle = sorted(q.name for q in REGISTRY if q.oracle is None)
    assert no_oracle == []
