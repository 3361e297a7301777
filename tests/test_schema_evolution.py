"""Schema evolution — the reference's admitted future-work gap
(README.md:159), implemented as additive/widening merges + alignment."""

from __future__ import annotations

import pytest
from conftest import make_envelope

from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.schemas import (
    EMPLOYEE_SCHEMA,
)
from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.sources.cdc import (
    decode_cdc,
)
from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.sources.evolution import (
    SchemaEvolutionError,
    align_to_schema,
    evolve_payload_schema,
    merge_struct_types,
)


def _st(*fields):
    return StructType([StructField(n, t) for n, t in fields])


def test_merge_adds_new_nullable_columns():
    old = _st(("id", IntegerType()), ("name", StringType()))
    new = _st(("id", IntegerType()), ("name", StringType()), ("badge", StringType()))
    merged = merge_struct_types(old, new)
    assert [f.name for f in merged.fields] == ["id", "name", "badge"]
    assert merged["badge"].nullable


def test_merge_widens_and_keeps_dropped_columns():
    old = _st(("id", IntegerType()), ("score", IntegerType()), ("legacy", StringType()))
    new = _st(("id", LongType()), ("score", DoubleType()))
    merged = merge_struct_types(old, new)
    assert merged["id"].dataType == LongType()
    assert merged["score"].dataType == DoubleType()
    assert merged["legacy"].dataType == StringType() and merged["legacy"].nullable


def test_merge_recurses_into_structs_and_arrays():
    old = _st(("meta", _st(("a", IntegerType()))), ("tags", ArrayType(IntegerType())))
    new = _st(
        ("meta", _st(("a", LongType()), ("b", StringType()))),
        ("tags", ArrayType(LongType())),
    )
    merged = merge_struct_types(old, new)
    assert merged["meta"].dataType == _st(("a", LongType()), ("b", StringType()))
    assert merged["tags"].dataType.elementType == LongType()


def test_merge_rejects_type_flip():
    with pytest.raises(SchemaEvolutionError):
        merge_struct_types(_st(("x", StringType())), _st(("x", IntegerType())))


def test_align_unions_across_generations(spark):
    v1 = spark.createDataFrame([(1, "a")], "id int, name string")
    v2 = spark.createDataFrame(
        [(2, "b", "eng")], "id bigint, name string, team string"
    )
    target = merge_struct_types(v1.schema, v2.schema)
    unioned = align_to_schema(v1, target).unionByName(align_to_schema(v2, target))
    rows = {r.id: (r.name, r.team) for r in unioned.collect()}
    assert rows == {1: ("a", None), 2: ("b", "eng")}
    assert dict(unioned.dtypes)["id"] == "bigint"


def test_cdc_decode_picks_up_evolved_payload(spark):
    """A column Debezium starts emitting mid-stream (badge_id) is
    invisible to the declared schema; evolve_payload_schema recovers
    it from the payloads themselves and decode_cdc surfaces it."""
    base = {
        "id": 1, "name": "emp1", "email": "e@c.t",
        "department": "Engineering", "created_at": "2024-01-01T08:00:00",
    }
    evolved = dict(base, id=2, name="emp2", badge_id="B-77")
    lines = [
        make_envelope(base, "c", 1704100000000),
        make_envelope(evolved, "u", 1704100001000),
    ]
    raw = spark.createDataFrame([(v,) for v in lines], "value string")

    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.sources.cdc import (
        parse_envelope,
    )

    declared = EMPLOYEE_SCHEMA
    assert "badge_id" not in declared.fieldNames()
    schema = evolve_payload_schema(
        declared, parse_envelope(raw), "after_json", sample=10
    )
    assert "badge_id" in schema.fieldNames()

    decoded = decode_cdc(raw, schema)
    got = {r.id: r.badge_id for r in decoded.select("id", "badge_id").collect()}
    assert got == {1: None, 2: "B-77"}


def test_compatibility_classification():
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.sources.evolution import (
        compatibility,
    )

    base = StructType(
        [
            StructField("id", LongType(), False),
            StructField("name", StringType(), True),
        ]
    )
    # add a nullable column: new reads old (null-fill) AND old reads new
    # (projection) -> FULL
    added = StructType(
        base.fields + [StructField("email", StringType(), True)]
    )
    assert compatibility(base, added) == "FULL"
    # add a REQUIRED column: new reader cannot read old data -> FORWARD only
    added_req = StructType(
        base.fields + [StructField("tenant", StringType(), False)]
    )
    assert compatibility(base, added_req) == "FORWARD"
    # widen int->long: new reader reads old (widening) -> BACKWARD;
    # old reader (int) cannot read new long data
    narrow = StructType(
        [StructField("id", LongType(), False), StructField("n", IntegerType(), True)]
    )
    widened = StructType(
        [StructField("id", LongType(), False), StructField("n", LongType(), True)]
    )
    assert compatibility(narrow, widened) == "BACKWARD"
    # type flip: NONE
    flipped = StructType(
        [StructField("id", LongType(), False), StructField("n", StringType(), True)]
    )
    assert compatibility(narrow, flipped) == "NONE"
    # dropping a column: the NEW reader projects old data fine, but the
    # old reader still requires id -> BACKWARD only
    dropped = StructType([StructField("name", StringType(), True)])
    assert compatibility(base, dropped) == "BACKWARD"


def test_compatibility_flags_nullability_tightening():
    """writer-nullable -> reader-required is NOT a safe read: writer
    data may carry nulls the reader declares impossible."""
    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.sources.evolution import (
        _reader_can_read,
        compatibility,
    )

    loose = _st(("id", LongType()))  # nullable (default)
    tight = StructType([StructField("id", LongType(), False)])
    problems = _reader_can_read(tight, loose)
    assert problems and "non-null" in problems[0]
    # tightening breaks the backward direction but old readers still
    # read new (non-null is a subset of nullable) -> FORWARD only
    assert compatibility(loose, tight) == "FORWARD"
    assert compatibility(tight, loose) == "BACKWARD"
