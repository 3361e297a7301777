"""Round-2 (cont.) registry additions — inequality / market-
concentration indices.

Same contract as ``registry.py``. Imported at the bottom of
``registry.py``.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import _register, _t


def _r6(col):
    return F.floor(col * 1000000 + F.lit(0.5)) / F.lit(1000000.0)


# ---------------------------------------------------------------------------
# Between-group Theil inequality index across market segments
# ---------------------------------------------------------------------------

@_register(
    "theil_between_segments",
    """
    WITH seg AS (
      SELECT c.c_mktsegment AS segment,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(floor(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS y
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt, CAST(sum(y) AS BIGINT) AS yt
            FROM seg),
    terms AS (
      SELECT segment, n, y,
             (y / CAST(t.yt AS DOUBLE))
               * ln((y / CAST(t.yt AS DOUBLE)) / (n / CAST(t.nt AS DOUBLE)))
               AS term,
             y / CAST(t.yt AS DOUBLE) AS rev_share,
             n / CAST(t.nt AS DOUBLE) AS pop_share
      FROM seg CROSS JOIN tot t
    )
    SELECT CAST(count(*) AS INTEGER) AS n_segments,
           floor(list_reduce(list_prepend(0.0, list(term ORDER BY segment)),
                             (a, x) -> a + x) * 1000000000 + 0.5)
             / 1000000000.0 AS theil_between,
           floor(max(rev_share) * 1000000 + 0.5) / 1000000.0
             AS max_rev_share,
           floor(max(pop_share) * 1000000 + 0.5) / 1000000.0
             AS max_pop_share
    FROM terms
    """,
    "Between-group Theil inequality index across market segments: "
    "T_b = Σ s_g·ln(s_g/p_g) with s_g the segment's revenue share "
    "and p_g its order share — zero when revenue is distributed "
    "proportionally to activity, growing as segments capture "
    "disproportionate value; the decomposable-inequality companion "
    "to the Gini/Pareto operators (Theil splits exactly into "
    "between+within; this is the between layer). Segment terms fold "
    "in segment order; one fact-sized rollup, then 5-row arithmetic.",
    ("stats", "inequality", "orders"),
)
def theil_between_segments(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    seg = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias("y"),
        )
    )
    tot = seg.agg(F.sum("n").alias("nt"), F.sum("y").alias("yt"))
    s = F.col("y") / F.col("yt").cast("double")
    p = F.col("n") / F.col("nt").cast("double")
    terms = seg.crossJoin(F.broadcast(tot)).select(
        "segment",
        (s * F.log(s / p)).alias("term"),
        s.alias("rev_share"),
        p.alias("pop_share"),
    )
    r9 = lambda c_: F.floor(c_ * 1000000000 + F.lit(0.5)) / F.lit(  # noqa: E731
        1000000000.0
    )
    return terms.agg(
        F.count("*").cast("int").alias("n_segments"),
        r9(
            F.aggregate(
                F.array_sort(
                    F.collect_list(
                        F.struct(F.col("segment"), F.col("term").alias("v"))
                    )
                ),
                F.lit(0.0),
                lambda a, x: a + x["v"],
            )
        ).alias("theil_between"),
        _r6(F.max("rev_share")).alias("max_rev_share"),
        _r6(F.max("pop_share")).alias("max_pop_share"),
    )


# ---------------------------------------------------------------------------
# Herfindahl–Hirschman supplier concentration per nation
# ---------------------------------------------------------------------------

@_register(
    "hhi_supplier_concentration",
    """
    WITH rev AS (
      SELECT s.s_nationkey AS nation, l.l_suppkey AS supp,
             CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS y
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY 1, 2
    ),
    tot AS (
      SELECT nation, CAST(sum(y) AS BIGINT) AS yt,
             CAST(count(*) AS BIGINT) AS n_supp
      FROM rev GROUP BY 1
    ),
    terms AS (
      SELECT r.nation, r.supp, t.n_supp,
             (r.y / CAST(t.yt AS DOUBLE)) * (r.y / CAST(t.yt AS DOUBLE))
               AS sq
      FROM rev r JOIN tot t USING (nation)
    )
    SELECT CAST(nation AS INTEGER) AS nation,
           CAST(max(n_supp) AS BIGINT) AS n_suppliers,
           floor(list_reduce(list_prepend(0.0, list(sq ORDER BY supp)),
                             (a, x) -> a + x) * 1000000 + 0.5) / 1000000.0
             AS hhi,
           floor(1.0 / max(n_supp) * 1000000 + 0.5) / 1000000.0 AS hhi_floor
    FROM terms GROUP BY nation
    """,
    "Herfindahl–Hirschman supplier-concentration index per nation: "
    "Σ share² over each nation's suppliers' revenue shares (1/n = "
    "perfectly even, 1.0 = monopoly; the 1/n floor rides along for "
    "context) — the antitrust-style concentration gauge that "
    "complements Gini (which measures inequality, not market power). "
    "Per-(nation,supplier) revenue shuffles once (map-side "
    "combined); shares square against broadcast nation totals and "
    "fold in supplier order so both engines sum identical doubles "
    "identically.",
    ("stats", "concentration", "lineitem"),
)
def hhi_supplier_concentration(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").select("l_suppkey", "l_extendedprice")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    rev = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy(
            F.col("s_nationkey").alias("nation"), F.col("l_suppkey").alias("supp")
        )
        .agg(
            F.sum(F.floor(F.col("l_extendedprice") * 100).cast("long")).alias("y")
        )
    )
    tot = rev.groupBy("nation").agg(
        F.sum("y").alias("yt"), F.count("*").alias("n_supp")
    )
    share = F.col("y") / F.col("yt").cast("double")
    terms = rev.join(F.broadcast(tot), "nation").select(
        "nation", "supp", "n_supp", (share * share).alias("sq")
    )
    return (
        terms.groupBy("nation")
        .agg(
            F.max("n_supp").alias("n_supp"),
            F.aggregate(
                F.array_sort(
                    F.collect_list(F.struct(F.col("supp"), F.col("sq").alias("v")))
                ),
                F.lit(0.0),
                lambda a, x: a + x["v"],
            ).alias("hhi_raw"),
        )
        .select(
            F.col("nation").cast("int").alias("nation"),
            F.col("n_supp").cast("long").alias("n_suppliers"),
            _r6(F.col("hhi_raw")).alias("hhi"),
            _r6(F.lit(1.0) / F.col("n_supp")).alias("hhi_floor"),
        )
    )
