"""CDC envelope decode + enrichment (SURVEY §2.1 S3, §2.3, FIXTURES §5)."""

from __future__ import annotations

from conftest import activity_row, employee_row, make_envelope

from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.operators.enrich import (
    enrich_activities,
    enrich_employees,
)
from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.schemas import (
    ACTIVITY_SCHEMA,
    EMPLOYEE_SCHEMA,
)
from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.sources.cdc import (
    decode_cdc,
    parse_envelope,
)


def _raw_df(spark, envelopes):
    return spark.createDataFrame([(e,) for e in envelopes], ["value"])


def test_two_stage_parse_keeps_inserts_and_updates(spark):
    envs = [
        make_envelope(employee_row(1), "c", 1704100000000),
        make_envelope(employee_row(2, dept="Sales"), "u", 1704100001000),
        make_envelope(None, "d", 1704100002000, before=employee_row(3)),
    ]
    out = decode_cdc(_raw_df(spark, envs), EMPLOYEE_SCHEMA).collect()
    assert {r.op for r in out} == {"c", "u"}
    assert {r.id for r in out} == {1, 2}  # delete dropped (MSP:119 parity)
    assert all(r.event_timestamp is not None for r in out)


def test_keep_deletes_decodes_before_image(spark):
    envs = [make_envelope(None, "d", 1704100002000, before=employee_row(9))]
    out = decode_cdc(_raw_df(spark, envs), EMPLOYEE_SCHEMA, keep_deletes=True).collect()
    assert len(out) == 1 and out[0].op == "d" and out[0].id == 9


def test_parse_envelope_exposes_metadata(spark):
    env = make_envelope(employee_row(1), "c", 1704100000000)
    row = parse_envelope(_raw_df(spark, [env])).collect()[0]
    assert row.op == "c" and row.ts_ms == 1704100000000
    assert row.after_json and row.before_json is None


def test_employee_enrichment_taxonomies(spark):
    rows = [
        employee_row(1, dept="Engineering", email="a.senior@corp.test"),
        employee_row(2, dept="Sales", email="b.lead@corp.test"),
        employee_row(3, dept="HR", email="c@corp.test"),
    ]
    df = enrich_employees(spark.createDataFrame(rows, EMPLOYEE_SCHEMA))
    got = {r.id: (r.department_category, r.employee_level) for r in df.collect()}
    assert got == {
        1: ("Technical", "Senior"),
        2: ("Business", "Lead"),
        3: ("Support", "Regular"),
    }


def test_activity_enrichment_golden_columns(spark):
    rows = [
        activity_row(1, ts="2024-01-01 10:15:00", duration=10, device="mobile"),
        activity_row(2, ts="2024-01-01 20:30:00", duration=100, device="tablet"),
        activity_row(3, ts="2024-01-01 08:59:00", duration=999, device="desktop"),
    ]
    df = enrich_activities(spark.createDataFrame(rows, ACTIVITY_SCHEMA))
    got = {
        r.id: (
            r.activity_hour,
            r.session_duration_category,
            r.is_business_hours,
            r.device_category,
            str(r.activity_date),
        )
        for r in df.collect()
    }
    assert got == {
        "1": (10, "short", True, "Mobile", "2024-01-01"),
        "2": (20, "medium", False, "Tablet", "2024-01-01"),
        "3": (8, "long", False, "Desktop", "2024-01-01"),
    }


def test_orders_cdc_decimal_payload(spark):
    """S5: earlier-iteration orders schema decodes DECIMAL prices."""
    from decimal import Decimal

    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.schemas import (
        ORDERS_CDC_SCHEMA,
    )

    order = {
        "id": 1, "user_id": 7, "product_name": "widget", "quantity": 2,
        "price": "19.99", "order_date": "2024-01-01", "status": "NEW",
    }
    env = make_envelope(order, "c", 1704100000000)
    out = decode_cdc(_raw_df(spark, [env]), ORDERS_CDC_SCHEMA).collect()
    assert len(out) == 1
    assert out[0].price == Decimal("19.99")
    assert dict(decode_cdc(_raw_df(spark, [env]), ORDERS_CDC_SCHEMA).dtypes)[
        "price"
    ] == "decimal(10,2)"


def test_decode_tolerates_malformed_envelopes(spark):
    """PERMISSIVE parse: corrupt JSON, missing payload, and non-JSON
    after-images become nulls and are filtered with the op gate
    instead of failing the batch (poison-pill safety)."""
    from conftest import employee_row, make_envelope

    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.schemas import (
        EMPLOYEE_SCHEMA,
    )
    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.sources.cdc import (
        decode_cdc,
    )

    lines = [
        make_envelope(employee_row(1), "c", 1704100000000),  # good
        "{not json at all",                                   # corrupt
        "{}",                                                 # no payload
        '{"payload": {"op": "c", "after": "not-json", "ts_ms": 1}}',
    ]
    raw = spark.createDataFrame([(v,) for v in lines], "value string")
    decoded = decode_cdc(raw, EMPLOYEE_SCHEMA)
    rows = decoded.select("id", "op").collect()
    good = [r for r in rows if r.id is not None]
    assert len(good) == 1 and good[0].id == 1
    # the non-JSON after-image decodes to a null row, not an error
    assert all(r.op in ("c", "u") for r in rows)


def test_jsonl_and_csv_readers_quarantine_corrupt(spark, tmp_path):
    """Declared-schema file ingestion: well-formed rows parse, corrupt
    lines go to the quarantine column (or drop), no inference pass."""
    from pyspark.sql.types import (
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.sources.files import (
        read_csv,
        read_jsonl,
    )

    schema = StructType(
        [StructField("id", IntegerType()), StructField("name", StringType())]
    )
    jl = tmp_path / "d.jsonl"
    jl.write_text('{"id": 1, "name": "a"}\nnot-json\n{"id": 2, "name": "b"}\n')
    good = read_jsonl(spark, str(jl), schema)
    assert {(r.id, r.name) for r in good.collect()} == {(1, "a"), (2, "b")}
    kept = read_jsonl(spark, str(jl), schema, keep_corrupt=True)
    corrupt = kept.filter(kept["_corrupt_record"].isNotNull()).collect()
    assert len(corrupt) == 1 and corrupt[0]["_corrupt_record"] == "not-json"

    cv = tmp_path / "d.csv"
    cv.write_text("id,name\n1,a\nbad-int,b\n2,c\n")
    good_csv = read_csv(spark, str(cv), schema)
    assert {(r.id, r.name) for r in good_csv.collect()} == {(1, "a"), (2, "c")}
