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
        if q.oracle is None:
            continue
        try:
            con.execute(f"EXPLAIN {q.oracle}")
        except Exception as exc:  # noqa: BLE001 - collect all
            failures.append(f"{q.name}: {type(exc).__name__}: {exc}")
    assert not failures, "\n".join(failures[:10])


def test_rows_only_set_is_exactly_the_documented_four():
    # r5 converted sliding_distinct_users_7d_hll (per-day exact +
    # 5%-envelope booleans), compression_ratio_documents (pinned
    # DEFLATE calibration literals) and sketch_distinct_users_by_type
    # (per-type exact rewrite + 5%-envelope booleans) to full oracle
    # rows; the three below are the documented engine-internal
    # holdouts, each with a driver-visible companion gate
    # (als_rmse_floor, phash_determinism_gate,
    # pca_variance_match_floor).
    no_oracle = sorted(q.name for q in REGISTRY if q.oracle is None)
    assert no_oracle == [
        "als_recommend_parts",
        "multimodal_phash_images",
        "pca_project_embeddings",
    ]
