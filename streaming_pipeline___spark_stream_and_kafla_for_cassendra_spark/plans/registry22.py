"""Round-3 registry additions, batch 9 — data-LAYOUT operators: a
Z-order vs linear clustering pruning audit, and a small-file
compaction (bin-packing) planner.

Same contract as ``registry.py``. Imported at the bottom of
``registry.py``.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import _register, _t


# ---------------------------------------------------------------------------
# Z-order (Morton) vs linear clustering: file-skipping audit
# ---------------------------------------------------------------------------

_Z_BITS = 8          # each dim quantized to [0, 256)
_Z_FILES = 64
_Z_PROBES = [
    # (probe_id, plo, phi, slo, shi) — 32x32 rectangles scattered
    (0, 0, 31, 0, 31),
    (1, 32, 63, 96, 127),
    (2, 64, 95, 192, 223),
    (3, 96, 127, 32, 63),
    (4, 128, 159, 128, 159),
    (5, 160, 191, 224, 255),
    (6, 192, 223, 64, 95),
    (7, 224, 255, 160, 191),
]


def _morton_sql(div: str) -> str:
    """Bit-interleave (pb, sb) into a 16-bit Morton code with pure
    arithmetic (generated identically for both engines; only the
    integer-division operator differs)."""
    terms = []
    for i in range(_Z_BITS):
        terms.append(f"((pb {div} {2 ** i}) % 2) * {4 ** i}")
        terms.append(f"((sb {div} {2 ** i}) % 2) * {2 * 4 ** i}")
    return " + ".join(terms)


def _z_probe_sql(alias: str) -> str:
    rows = []
    for pid, plo, phi, slo, shi in _Z_PROBES:
        rows.append(
            f"SELECT {pid} AS probe_id, {plo} AS plo, {phi} AS phi, "
            f"{slo} AS slo, {shi} AS shi"
        )
    return " UNION ALL ".join(rows)


@_register(
    "zorder_pruning_audit",
    f"""
    WITH base AS (
      SELECT (l_partkey * 53) % 256 AS pb, (l_suppkey * 37) % 256 AS sb
      FROM lineitem
    ),
    coded AS (
      SELECT pb, sb,
             ({_morton_sql("//")}) // {65536 // _Z_FILES} AS fid_z,
             pb // {256 // _Z_FILES} AS fid_lin
      FROM base
    ),
    files AS (
      SELECT 'zorder' AS layout, fid_z AS fid,
             CAST(min(pb) AS BIGINT) AS minp, CAST(max(pb) AS BIGINT) AS maxp,
             CAST(min(sb) AS BIGINT) AS mins, CAST(max(sb) AS BIGINT) AS maxs,
             CAST(count(*) AS BIGINT) AS rows_in_file
      FROM coded GROUP BY 2
      UNION ALL
      SELECT 'linear', fid_lin,
             CAST(min(pb) AS BIGINT), CAST(max(pb) AS BIGINT),
             CAST(min(sb) AS BIGINT), CAST(max(sb) AS BIGINT),
             CAST(count(*) AS BIGINT)
      FROM coded GROUP BY 2
    ),
    probes AS ({_z_probe_sql("p")}),
    touched AS (
      SELECT f.layout, p.probe_id,
             CAST(count(*) AS BIGINT) AS files_touched,
             CAST(sum(f.rows_in_file) AS BIGINT) AS rows_scanned
      FROM files f JOIN probes p
        ON NOT (f.maxp < p.plo OR f.minp > p.phi
                OR f.maxs < p.slo OR f.mins > p.shi)
      GROUP BY 1, 2
    ),
    actual AS (
      SELECT p.probe_id, CAST(count(*) AS BIGINT) AS rows_actual
      FROM base b JOIN probes p
        ON b.pb BETWEEN p.plo AND p.phi AND b.sb BETWEEN p.slo AND p.shi
      GROUP BY 1
    )
    SELECT t.layout, t.probe_id, t.files_touched, t.rows_scanned,
           coalesce(a.rows_actual, 0) AS rows_actual,
           CAST({_Z_FILES} AS BIGINT) AS total_files
    FROM touched t LEFT JOIN actual a ON a.probe_id = t.probe_id
    """,
    "Z-order clustering audit — the data-LAYOUT optimization that "
    "makes multi-dimensional pruning work at 100 TB (Delta "
    "OPTIMIZE ZORDER / Hudi clustering): lineitem rows are bucketed "
    "on two dims ((partkey*53)%256, (suppkey*37)%256 — multipliers "
    "spread sparse key ranges across the grid at any SF), assigned "
    "to 64 "
    "synthetic files either by 16-bit Morton interleave (bit "
    "arithmetic generated identically for both engines) or by "
    "linear partkey ranges, and 8 fixed 32x32 probe rectangles are "
    "evaluated against each file's min/max zone map. The audit "
    "reports files touched and rows scanned per layout vs the true "
    "matching rows — Z-order touches ~sqrt the files linear "
    "clustering does on 2-D probes, which IS the parquet row-group "
    "skipping win. Pure integer min/max aggregates; the probe join "
    "is 64 x 8 literals.",
    ("layout", "pruning", "lineitem"),
)
def zorder_pruning_audit(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    base = li.select(
        ((F.col("l_partkey") * 53) % 256).alias("pb"),
        ((F.col("l_suppkey") * 37) % 256).alias("sb"),
    ).localCheckpoint(eager=False)
    coded = base.select(
        "pb",
        "sb",
        F.expr(
            f"({_morton_sql('div')}) div {65536 // _Z_FILES}"
        ).alias("fid_z"),
        F.expr(f"pb div {256 // _Z_FILES}").alias("fid_lin"),
    )
    def files_of(fid_col, layout):
        return (
            coded.groupBy(F.col(fid_col).alias("fid"))
            .agg(
                F.min("pb").alias("minp"),
                F.max("pb").alias("maxp"),
                F.min("sb").alias("mins"),
                F.max("sb").alias("maxs"),
                F.count("*").alias("rows_in_file"),
            )
            .select(
                F.lit(layout).alias("layout"),
                "fid",
                F.col("minp").cast("long").alias("minp"),
                F.col("maxp").cast("long").alias("maxp"),
                F.col("mins").cast("long").alias("mins"),
                F.col("maxs").cast("long").alias("maxs"),
                F.col("rows_in_file").cast("long").alias("rows_in_file"),
            )
        )

    files = files_of("fid_z", "zorder").unionAll(files_of("fid_lin", "linear"))
    probes = spark.createDataFrame(
        _Z_PROBES, "probe_id int, plo int, phi int, slo int, shi int"
    )
    touched = (
        files.join(
            F.broadcast(probes),
            ~(
                (F.col("maxp") < F.col("plo"))
                | (F.col("minp") > F.col("phi"))
                | (F.col("maxs") < F.col("slo"))
                | (F.col("mins") > F.col("shi"))
            ),
        )
        .groupBy("layout", "probe_id")
        .agg(
            F.count("*").alias("files_touched"),
            F.sum("rows_in_file").alias("rows_scanned"),
        )
    )
    actual = (
        base.join(
            F.broadcast(probes),
            F.col("pb").between(F.col("plo"), F.col("phi"))
            & F.col("sb").between(F.col("slo"), F.col("shi")),
        )
        .groupBy("probe_id")
        .agg(F.count("*").alias("rows_actual"))
    )
    return (
        touched.join(F.broadcast(actual), "probe_id", "left")
        .select(
            "layout",
            "probe_id",
            F.col("files_touched").cast("long").alias("files_touched"),
            F.col("rows_scanned").cast("long").alias("rows_scanned"),
            F.coalesce(F.col("rows_actual"), F.lit(0))
            .cast("long")
            .alias("rows_actual"),
            F.lit(_Z_FILES).cast("long").alias("total_files"),
        )
    )


# ---------------------------------------------------------------------------
# Small-file compaction planner (greedy size-based bin packing)
# ---------------------------------------------------------------------------

_COMPACT_ROW_BYTES = 200
_COMPACT_TARGET = 256 * 1024      # bin target bytes
_COMPACT_SMALL = 128 * 1024       # "small file" threshold


@_register(
    "compaction_bin_packing_plan",
    f"""
    WITH manifest AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(hour(ts) AS INTEGER) AS hr,
             CAST(count(*) * {_COMPACT_ROW_BYTES} AS BIGINT) AS bytes
      FROM events GROUP BY 1, 2
    ),
    binned AS (
      SELECT day, hr, bytes,
             CAST((sum(bytes) OVER (PARTITION BY day ORDER BY hr
                                    ROWS UNBOUNDED PRECEDING) - bytes)
                  // {_COMPACT_TARGET} AS BIGINT) AS bin
      FROM manifest
    )
    SELECT day,
           CAST(count(*) AS BIGINT) AS n_files,
           CAST(sum(bytes) AS BIGINT) AS total_bytes,
           CAST(count(DISTINCT bin) AS BIGINT) AS n_bins,
           CAST(sum(CASE WHEN bytes < {_COMPACT_SMALL} THEN 1 ELSE 0 END)
                AS BIGINT) AS small_files,
           CAST((count(*) - count(DISTINCT bin)) * 1000000 // count(*)
                AS BIGINT) AS reduction_ppm
    FROM binned GROUP BY 1
    """,
    "Small-file compaction planner — the lake-maintenance operation "
    "every streaming sink needs (micro-batches write hour-grained "
    "small files; readers want ~256 KB+ units): a per-(day,hour) "
    "file manifest is derived from events (bytes = rows x 200), and "
    "files pack greedily into target-size bins via a running-sum "
    "window — bin = exclusive-prefix-bytes // target, the "
    "deterministic one-pass equivalent of first-fit on an ordered "
    "manifest. Reports per partition the file count, small-file "
    "count, planned bin count and the file-count reduction in ppm. "
    "The window orders <=24 files per day partition; at 100 TB this "
    "is the metadata-sized query it is here — the plan never "
    "touches data bytes, only the manifest.",
    ("layout", "compaction", "lake", "events"),
)
def compaction_bin_packing_plan(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    manifest = e.groupBy(
        F.col("ts").cast("date").alias("day"),
        F.hour("ts").cast("int").alias("hr"),
    ).agg((F.count("*") * _COMPACT_ROW_BYTES).cast("long").alias("bytes"))
    w = (
        Window.partitionBy("day")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    binned = manifest.select(
        "day",
        "bytes",
        (F.sum("bytes").over(w) - F.col("bytes")).alias("cum_before"),
    ).select(
        "day",
        "bytes",
        F.expr(f"cum_before div {_COMPACT_TARGET}").alias("bin"),
    )
    return binned.groupBy("day").agg(
        F.count("*").alias("n_files"),
        F.sum("bytes").cast("long").alias("total_bytes"),
        F.countDistinct("bin").alias("n_bins"),
        F.sum(
            F.when(F.col("bytes") < _COMPACT_SMALL, 1).otherwise(0)
        ).cast("long").alias("small_files"),
        F.expr(
            "CAST((count(*) - count(DISTINCT bin)) * 1000000 div count(*) "
            "AS BIGINT)"
        ).alias("reduction_ppm"),
    )
