"""Schema evolution (the reference's admitted gap — README.md:159
"Implement schema evolution handling" under future work; SURVEY §1.2
notes its schemas are fixed and hand-declared).

Policy — additive and widening only, the safe subset for a CDC
pipeline whose upstream is a relational database:

* new nullable columns may appear (``ALTER TABLE ADD COLUMN``);
* integral types may widen (int → bigint → double), matching what a
  JSON re-parse of a widened column would produce;
* nested structs evolve recursively;
* anything else (dropped columns, narrowing, type flips) raises —
  silent data loss is worse than a restart.

Three pieces:

* :func:`merge_struct_types` — the schema lattice join;
* :func:`align_to_schema` — make an old-schema DataFrame readable
  under the evolved schema (missing columns → typed nulls, widened
  columns → cast), so unions across schema generations line up;
* :func:`observed_payload_schema` / :func:`evolve_payload_schema` —
  sample the JSON payloads actually on the topic, infer their schema,
  and join it with the declared one. A restarting pipeline calls this
  to pick up columns Debezium started emitting mid-stream.

Scale note: inference samples a bounded number of payloads and runs
``schema_of_json`` on the driver over that sample only — no full
scan; alignment itself is pure Catalyst (select/cast), zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DataType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StructField,
    StructType,
)


class SchemaEvolutionError(ValueError):
    """Incompatible evolution (narrowing / type flip / struct-vs-atom)."""


_WIDENING_ORDER = [ShortType(), IntegerType(), LongType(), FloatType(), DoubleType()]


def _widen(a: DataType, b: DataType, path: str) -> DataType:
    if a == b:
        return a
    if isinstance(a, StructType) and isinstance(b, StructType):
        return merge_struct_types(a, b, _path=path)
    if isinstance(a, ArrayType) and isinstance(b, ArrayType):
        return ArrayType(
            _widen(a.elementType, b.elementType, f"{path}[]"),
            a.containsNull or b.containsNull,
        )
    if a in _WIDENING_ORDER and b in _WIDENING_ORDER:
        return _WIDENING_ORDER[
            max(_WIDENING_ORDER.index(a), _WIDENING_ORDER.index(b))
        ]
    raise SchemaEvolutionError(
        f"cannot evolve {path}: {a.simpleString()} -> {b.simpleString()}"
    )


def merge_struct_types(
    old: StructType, new: StructType, _path: str = ""
) -> StructType:
    """Join of two schemas: old field order first, new fields appended
    nullable; shared fields get the widened type."""
    new_by_name = {f.name: f for f in new.fields}
    out: list[StructField] = []
    for f in old.fields:
        if f.name in new_by_name:
            nf = new_by_name.pop(f.name)
            out.append(
                StructField(
                    f.name,
                    _widen(f.dataType, nf.dataType, f"{_path}.{f.name}" or f.name),
                    f.nullable or nf.nullable,
                )
            )
        else:
            # column absent from the new generation: keep it (old data
            # still carries it) but it must be nullable now
            out.append(StructField(f.name, f.dataType, True))
    for f in new.fields:  # genuinely new columns, in new-schema order
        if f.name in new_by_name:
            out.append(StructField(f.name, f.dataType, True))
    return StructType(out)


def align_to_schema(df: DataFrame, target: StructType) -> DataFrame:
    """Project ``df`` onto ``target``: missing columns become typed
    nulls, present columns are cast to the target type, order follows
    the target. Catalyst-only — safe to union across generations."""
    cols = []
    have = {f.name for f in df.schema.fields}
    for f in target.fields:
        if f.name in have:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)


def observed_payload_schema(
    raw_payloads: DataFrame, json_col: str, sample: int = 200
) -> StructType:
    """Schema actually present in a JSON payload column, inferred from
    a bounded sample (driver-side, no full scan)."""
    rows = (
        raw_payloads.select(F.col(json_col).alias("j"))
        .filter(F.col("j").isNotNull())
        .limit(sample)
        .collect()
    )
    if not rows:
        return StructType([])
    spark = raw_payloads.sparkSession
    # one job: Spark's JSON reader infers AND merges the schema across
    # the whole sample (columns appearing mid-sample included)
    inferred = spark.read.json(
        spark.sparkContext.parallelize([r.j for r in rows], 1)
    ).schema
    return StructType(
        [f for f in inferred.fields if not f.name.startswith("_corrupt")]
    )


def evolve_payload_schema(
    declared: StructType, raw_payloads: DataFrame, json_col: str, sample: int = 200
) -> StructType:
    """Declared schema ∪ whatever the topic actually carries now."""
    observed = observed_payload_schema(raw_payloads, json_col, sample)
    return merge_struct_types(declared, observed)


def _reader_can_read(reader: StructType, writer: StructType) -> list[str]:
    """Reasons ``reader`` CANNOT read data written under ``writer``
    (empty list = compatible). Schema-registry semantics for a
    nullable-columns world:

    * a reader field absent from the writer is fine only if nullable
      (it fills with nulls);
    * a writer field absent from the reader is fine (projection drops
      it);
    * shared fields must be identical or widenable writer→reader
      (int → bigint → double); narrowing or type flips are breaks;
    * nested structs recurse.
    """
    problems: list[str] = []

    def walk(r: StructType, w: StructType, prefix: str) -> None:
        w_by = {f.name: f for f in w.fields}
        for rf in r.fields:
            path = f"{prefix}{rf.name}"
            wf = w_by.get(rf.name)
            if wf is None:
                if not rf.nullable:
                    problems.append(f"{path}: required by reader, absent in writer")
                continue
            if wf.nullable and not rf.nullable:
                problems.append(
                    f"{path}: writer nullable but reader requires non-null"
                )
            rt, wt = rf.dataType, wf.dataType
            if isinstance(rt, StructType) and isinstance(wt, StructType):
                walk(rt, wt, f"{path}.")
            elif rt == wt:
                pass
            elif (
                wt in _WIDENING_ORDER
                and rt in _WIDENING_ORDER
                and _WIDENING_ORDER.index(wt) <= _WIDENING_ORDER.index(rt)
            ):
                pass  # writer narrower than reader: widening read is safe
            else:
                problems.append(f"{path}: writer {wt.simpleString()} "
                                f"!= reader {rt.simpleString()}")

    walk(reader, writer, "")
    return problems


def compatibility(old: StructType, new: StructType) -> str:
    """Classify an evolution step with Confluent-schema-registry
    semantics: BACKWARD (new readers read old data), FORWARD (old
    readers read new data), FULL (both), NONE (neither). CDC
    pipelines that replay history need at least BACKWARD; pipelines
    with lagging consumers need FORWARD. Pure driver-side metadata —
    never touches data."""
    backward = not _reader_can_read(new, old)
    forward = not _reader_can_read(old, new)
    if backward and forward:
        return "FULL"
    if backward:
        return "BACKWARD"
    if forward:
        return "FORWARD"
    return "NONE"
