"""Golden end-to-end gate: every registry query vs its DuckDB oracle
at sf0.001 (the driver runs the same comparison at sf0.01)."""

from __future__ import annotations

import math

import duckdb
import pytest

from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.plans.registry import (
    REGISTRY,
    resolve_oracle,
)
from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.sources.tables import (
    TABLES,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


def _norm(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        return "nan" if math.isnan(v) else f"{v:.6g}"
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def _canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("qd", REGISTRY, ids=[q.name for q in REGISTRY])
def test_query_matches_oracle(spark, duck, qd):
    sdf = qd.builder(spark, SF)
    srows = [tuple(r) for r in sdf.collect()]
    oracle = resolve_oracle(qd) if qd.oracle is not None else None
    if oracle is None:
        assert len(srows) > 0, f"{qd.name}: rows-only query returned nothing"
        return
    res = duck.execute(oracle)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert sorted(sdf.columns) == sorted(ocols), f"{qd.name}: column names differ"
    assert len(srows) == len(orows), f"{qd.name}: row counts differ"
    assert _canon(sdf.columns, srows) == _canon(ocols, orows), (
        f"{qd.name}: values differ"
    )
