"""Round-3 registry additions, batch 40 — supplier scorecard.

Same contract as ``registry.py``. Imported at the bottom of
``registry.py``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import _register, _t


@_register(
    "supplier_scorecard",
    """
    WITH per_supp AS (
      SELECT l.l_suppkey,
             CAST(count(*) AS BIGINT) AS n_lines,
             CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS revenue_cents,
             CAST(sum(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_returns,
             CAST(sum(CASE WHEN date_diff('day',
                    CAST(o.o_orderdate AS DATE),
                    CAST(l.l_shipdate AS DATE)) <= 30
                  THEN 1 ELSE 0 END) AS BIGINT) AS on_time_lines
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      GROUP BY 1
    ),
    scored AS (
      SELECT s.s_suppkey, s.s_name,
             p.n_lines, p.revenue_cents,
             CAST(p.n_returns * 1000000 // p.n_lines AS BIGINT)
               AS return_ppm,
             CAST(p.on_time_lines * 1000000 // p.n_lines AS BIGINT)
               AS on_time_ppm,
             -- composite: on-time share minus return share, in ppm
             CAST(p.on_time_lines * 1000000 // p.n_lines
                  - p.n_returns * 1000000 // p.n_lines AS BIGINT)
               AS score_ppm
      FROM per_supp p JOIN supplier s ON s.s_suppkey = p.l_suppkey
    )
    SELECT s_suppkey, s_name, n_lines, revenue_cents,
           return_ppm, on_time_ppm, score_ppm,
           CAST(row_number() OVER (ORDER BY score_ppm DESC,
                                   revenue_cents DESC, s_suppkey ASC)
                AS INTEGER) AS rank
    FROM scored
    """,
    "Supplier scorecard — the procurement-review composite: per "
    "supplier, line volume, exact revenue cents, return rate and "
    "30-day on-time-ship rate (both integer ppm), a transparent "
    "composite score (on-time minus returns) and a fully "
    "tie-broken rank. Deliberately integer end to end so the "
    "ranking is bit-deterministic and auditable — composites with "
    "float weights invite 'why did my rank change' tickets. One "
    "fact join keyed on suppkey; the oracle states the rank with a "
    "global row_number, the ENGINE ranks the supplier grid with "
    "operators/scale.py::dense_ids (range-partitioned parallel "
    "sort + partition-offset ids — same total order, no "
    "single-partition Exchange). Draws together the quality "
    "(`shrunken_return_rates_parts`), latency "
    "(`fulfillment_latency_by_priority`) and concentration "
    "(`hhi_supplier_concentration`) threads into one operational "
    "artifact.",
    ("bi", "scorecard", "lineitem"),
)
def supplier_scorecard(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    per_supp = (
        li.join(o, o.o_orderkey == li.l_orderkey)
        .groupBy("l_suppkey")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(
                F.floor(F.col("l_extendedprice") * 100).cast("long")
            ).alias("revenue_cents"),
            F.sum(
                F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
            ).alias("n_returns"),
            F.sum(
                F.when(
                    F.datediff(
                        F.col("l_shipdate").cast("date"),
                        F.col("o_orderdate").cast("date"),
                    )
                    <= 30,
                    1,
                ).otherwise(0)
            ).alias("on_time_lines"),
        )
    )
    scored = per_supp.join(
        F.broadcast(s), s.s_suppkey == per_supp.l_suppkey
    ).select(
        "s_suppkey",
        "s_name",
        F.col("n_lines").cast("long").alias("n_lines"),
        F.col("revenue_cents").cast("long").alias("revenue_cents"),
        F.expr("n_returns * 1000000 div n_lines")
        .cast("long")
        .alias("return_ppm"),
        F.expr("on_time_lines * 1000000 div n_lines")
        .cast("long")
        .alias("on_time_ppm"),
        F.expr(
            "on_time_lines * 1000000 div n_lines"
            " - n_returns * 1000000 div n_lines"
        )
        .cast("long")
        .alias("score_ppm"),
    )
    # Rank WITHOUT a global single-partition window: the supplier
    # grid is SF×10k rows (~1B at the 100 TB regime), so
    # row_number() OVER (ORDER BY ...) would funnel it through one
    # task. dense_ids orders ascending — negate the DESC keys;
    # (score_ppm, revenue_cents, s_suppkey) is a unique key so the
    # total order (and therefore rank) is identical to the oracle's.
    from ..operators.scale import dense_ids

    ranked = dense_ids(
        scored.withColumn("_neg_score", -F.col("score_ppm")).withColumn(
            "_neg_rev", -F.col("revenue_cents")
        ),
        "_neg_score",
        "_neg_rev",
        "s_suppkey",
        id_col="_r",
    )
    return ranked.select(
        "s_suppkey",
        "s_name",
        "n_lines",
        "revenue_cents",
        "return_ppm",
        "on_time_ppm",
        "score_ppm",
        (F.col("_r") + 1).cast("int").alias("rank"),
    )
