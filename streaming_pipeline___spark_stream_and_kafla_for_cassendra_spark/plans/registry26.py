"""Round-3 registry additions, batch 13 — k-center (Gonzalez
farthest-point) coreset selection over integer-quantized embeddings.

Same contract as ``registry.py``. Imported at the bottom of
``registry.py``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import _register, _t

_KC_K = 8
_KC_MOD = 50  # candidate sample: vec_id % 50 == 0


def _kcenter_oracle(k: int = _KC_K) -> str:
    """Unrolled Gonzalez farthest-point traversal: one CTE pair per
    selection round. Distances are exact integers on milli-quantized
    coordinates, so argmax/tie-break is bit-deterministic."""
    head = f"""
    WITH pts AS MATERIALIZED (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
      FROM embeddings WHERE vec_id % {_KC_MOD} = 0
    ),
    c1 AS (
      SELECT vec_id AS cid, q AS cq FROM pts ORDER BY vec_id LIMIT 1
    ),
    m1 AS MATERIALIZED (
      SELECT p.vec_id, p.q,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(generate_series(1, len(p.q)),
                 i -> (p.q[i] - c.cq[i]) * (p.q[i] - c.cq[i]))),
               (a, b) -> a + b) AS md
      FROM pts p CROSS JOIN c1 c
    )"""
    layers = []
    for r in range(2, k + 1):
        layers.append(f"""
    c{r} AS (
      SELECT vec_id AS cid, q AS cq, md AS radius
      FROM m{r - 1} ORDER BY md DESC, vec_id ASC LIMIT 1
    ),
    m{r} AS MATERIALIZED (
      SELECT p.vec_id, p.q,
             least(p.md, list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(generate_series(1, len(p.q)),
                 i -> (p.q[i] - c.cq[i]) * (p.q[i] - c.cq[i]))),
               (a, b) -> a + b)) AS md
      FROM m{r - 1} p CROSS JOIN c{r} c
    )""")
    finals = ["SELECT 1 AS round, (SELECT cid FROM c1) AS center_vec_id, "
              "CAST(0 AS BIGINT) AS radius_sq"]
    for r in range(2, k + 1):
        finals.append(
            f"SELECT {r} AS round, cid, CAST(radius AS BIGINT) "
            f"FROM c{r}"
        )
    cover = (
        f"SELECT 0 AS round, CAST(count(*) AS BIGINT) AS center_vec_id, "
        f"CAST(max(md) AS BIGINT) AS radius_sq FROM m{k}"
    )
    return (
        head
        + ","
        + ",".join(layers)
        + "\n    "
        + "\nUNION ALL\n".join(finals + [cover])
    )


@_register(
    "kcenter_coreset_embeddings",
    _kcenter_oracle(),
    f"Gonzalez k-center farthest-point coreset (k={_KC_K}) over a "
    f"deterministic 1/{_KC_MOD} embedding sample — the max-coverage "
    "diverse-subset selector with the classic 2-approximation "
    "guarantee, used to seed IVF/k-means lists and to pick "
    "maximally-different exemplars for labeling: start from the "
    "lowest vec_id, repeatedly take the point FARTHEST from the "
    "chosen set (its distance is the covering radius at that "
    "round, monotonically non-increasing), k-1 rounds of one "
    "broadcast (the single new center) + one running-min update. "
    "Coordinates are milli-quantized so every distance is an exact "
    "integer and the argmax/tie-break (min vec_id) is bit-"
    "deterministic — this makes a GREEDY ITERATIVE selection fully "
    "oracle-checkable, where the float cousin (`mmr_diverse_"
    "representatives`) is rows-only. Row 0 reports the final "
    "coverage: candidate count and the max residual radius.",
    ("ml-data", "coreset", "iterative", "embeddings"),
)
def kcenter_coreset_embeddings(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    pts = (
        emb.filter(F.col("vec_id") % _KC_MOD == 0)
        .select(
            "vec_id",
            F.transform(
                F.col("embedding"),
                lambda x: F.floor(x.cast("double") * 1000).cast("long"),
            ).alias("q"),
        )
        .localCheckpoint(eager=False)
    )

    def dist_to(center_q):
        return F.aggregate(
            F.zip_with(
                F.col("q"), center_q, lambda a, b: (a - b) * (a - b)
            ),
            F.lit(0).cast("long"),
            lambda a, b: a + b,
        )

    c1 = pts.orderBy("vec_id").limit(1).select(
        F.col("vec_id").alias("cid"), F.col("q").alias("cq")
    )
    m = (
        pts.crossJoin(F.broadcast(c1))
        .select("vec_id", "q", dist_to(F.col("cq")).alias("md"))
        .localCheckpoint(eager=False)
    )
    out_rows = [
        c1.select(
            F.lit(1).alias("round"),
            F.col("cid").alias("center_vec_id"),
            F.lit(0).cast("long").alias("radius_sq"),
        )
    ]
    for r in range(2, _KC_K + 1):
        c = m.orderBy(F.col("md").desc(), F.col("vec_id").asc()).limit(
            1
        ).select(
            F.col("vec_id").alias("cid"),
            F.col("q").alias("cq"),
            F.col("md").alias("radius"),
        ).localCheckpoint(eager=False)
        out_rows.append(
            c.select(
                F.lit(r).alias("round"),
                F.col("cid").alias("center_vec_id"),
                F.col("radius").cast("long").alias("radius_sq"),
            )
        )
        m = (
            m.crossJoin(F.broadcast(c.select("cq")))
            .select(
                "vec_id",
                "q",
                F.least(F.col("md"), dist_to(F.col("cq"))).alias("md"),
            )
            .localCheckpoint(eager=False)
        )
    cover = m.agg(
        F.count("*").alias("npts"), F.max("md").alias("maxmd")
    ).select(
        F.lit(0).alias("round"),
        F.col("npts").cast("long").alias("center_vec_id"),
        F.col("maxmd").cast("long").alias("radius_sq"),
    )
    out = out_rows[0]
    for df in out_rows[1:]:
        out = out.unionAll(df)
    return out.unionAll(cover)
