"""Round-2 (cont.) registry additions — association effect size,
corpus balance entropy, and robust dispersion.

Same contract as ``registry.py``. Imported at the bottom of
``registry.py``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import _register, _t


def _r6(col):
    return F.floor(col * 1000000 + F.lit(0.5)) / F.lit(1000000.0)


# ---------------------------------------------------------------------------
# Cramér's V effect size for event_type × daypart
# ---------------------------------------------------------------------------

@_register(
    "cramers_v_type_daypart",
    """
    WITH cells AS (
      SELECT event_type,
             CASE WHEN hour(ts) BETWEEN 6 AND 11 THEN 'morning'
                  WHEN hour(ts) BETWEEN 12 AND 17 THEN 'afternoon'
                  WHEN hour(ts) BETWEEN 18 AND 23 THEN 'evening'
                  ELSE 'night' END AS daypart,
             CAST(count(*) AS BIGINT) AS o
      FROM events GROUP BY 1, 2
    ),
    rows_ AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS rt
              FROM cells GROUP BY 1),
    cols_ AS (SELECT daypart, CAST(sum(o) AS BIGINT) AS ct
              FROM cells GROUP BY 1),
    n_ AS (SELECT CAST(sum(o) AS BIGINT) AS n,
                  CAST((SELECT count(*) FROM rows_) AS BIGINT) AS r,
                  CAST((SELECT count(*) FROM cols_) AS BIGINT) AS c
           FROM cells),
    terms AS (
      SELECT c.event_type, c.daypart,
             (c.o - r.rt * (col.ct / CAST(x.n AS DOUBLE)))
             * (c.o - r.rt * (col.ct / CAST(x.n AS DOUBLE)))
             / (r.rt * (col.ct / CAST(x.n AS DOUBLE))) AS term
      FROM cells c
      JOIN rows_ r USING (event_type)
      JOIN cols_ col USING (daypart)
      CROSS JOIN n_ x
    ),
    chi AS (
      SELECT list_reduce(list_prepend(0.0,
               list(term ORDER BY event_type, daypart)), (a, x) -> a + x)
               AS chi2
      FROM terms
    )
    SELECT x.n AS n_events, x.r AS n_rows, x.c AS n_cols,
           floor(chi2 * 10000 + 0.5) / 10000.0 AS chi2,
           floor(sqrt(chi2 / (x.n * (least(x.r, x.c) - 1)))
                 * 1000000 + 0.5) / 1000000.0 AS cramers_v
    FROM chi CROSS JOIN n_ x
    """,
    "Cramér's V effect size for the event_type × daypart "
    "association: χ² from cell-ordered folds over exact-integer-"
    "derived terms (same contingency as the chi-square and G-test "
    "operators), normalized by n·(min(r,c)−1) so the strength is "
    "comparable across tables of any shape — the 'is it LARGE, not "
    "just significant' companion the pure test statistics lack. One "
    "map-side-combined scan; cells-sized arithmetic after.",
    ("stats", "independence", "events"),
)
def cramers_v_type_daypart(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    h = F.hour(F.col("ts"))
    daypart = (
        F.when(h.between(6, 11), "morning")
        .when(h.between(12, 17), "afternoon")
        .when(h.between(18, 23), "evening")
        .otherwise("night")
    )
    cells = e.groupBy("event_type", daypart.alias("daypart")).agg(
        F.count("*").alias("o")
    )
    rows_ = cells.groupBy("event_type").agg(F.sum("o").alias("rt"))
    cols_ = cells.groupBy("daypart").agg(F.sum("o").alias("ct"))
    n_ = cells.agg(F.sum("o").alias("n")).crossJoin(
        rows_.agg(F.count("*").alias("r"))
    ).crossJoin(cols_.agg(F.count("*").alias("c")))
    exp = F.col("rt") * (F.col("ct") / F.col("n").cast("double"))
    term = (F.col("o") - exp) * (F.col("o") - exp) / exp
    terms = (
        cells.join(F.broadcast(rows_), "event_type")
        .join(F.broadcast(cols_), "daypart")
        .crossJoin(F.broadcast(n_))
        .withColumn("term", term)
    )
    chi = terms.agg(
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("event_type"),
                        F.col("daypart"),
                        F.col("term").alias("v"),
                    )
                )
            ),
            F.lit(0.0),
            lambda a, x: a + x["v"],
        ).alias("chi2")
    )
    r4 = lambda c: F.floor(c * 10000 + F.lit(0.5)) / F.lit(10000.0)  # noqa: E731
    v = F.sqrt(
        F.col("chi2")
        / (F.col("n") * (F.least(F.col("r"), F.col("c")) - 1))
    )
    return chi.crossJoin(F.broadcast(n_)).select(
        F.col("n").cast("long").alias("n_events"),
        F.col("r").cast("long").alias("n_rows"),
        F.col("c").cast("long").alias("n_cols"),
        r4(F.col("chi2")).alias("chi2"),
        _r6(v).alias("cramers_v"),
    )


# ---------------------------------------------------------------------------
# Corpus source-balance entropy (evenness index)
# ---------------------------------------------------------------------------

@_register(
    "source_balance_entropy",
    """
    WITH c AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY 1
    ),
    t AS (SELECT CAST(sum(n) AS BIGINT) AS nt, CAST(count(*) AS BIGINT) AS k
          FROM c),
    terms AS (
      SELECT source,
             -(n / CAST(t.nt AS DOUBLE)) * log2(n / CAST(t.nt AS DOUBLE))
               AS term
      FROM c CROSS JOIN t
    )
    SELECT t.k AS n_sources, t.nt AS n_docs,
           floor(h * 1000000 + 0.5) / 1000000.0 AS entropy_bits,
           floor(h / log2(CAST(t.k AS DOUBLE)) * 1000000 + 0.5) / 1000000.0
             AS evenness
    FROM (SELECT list_reduce(list_prepend(0.0, list(term ORDER BY source)),
                             (a, x) -> a + x) AS h
          FROM terms) CROSS JOIN t
    """,
    "Corpus source-balance index: Shannon entropy of the document-"
    "count distribution over sources plus Pielou evenness "
    "(H / log₂ k, 1.0 = perfectly balanced) — the one-number answer "
    "to 'is this corpus dominated by a few domains?' that the "
    "per-source drift divergences don't summarize. Source-ordered "
    "fold keeps the float sum identical cross-engine; one tiny "
    "aggregate over the sources-sized count table.",
    ("text-quality", "corpus", "documents"),
)
def source_balance_entropy(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    c = d.groupBy("source").agg(F.count("*").alias("n"))
    t = c.agg(F.sum("n").alias("nt"), F.count("*").alias("k"))
    p = F.col("n") / F.col("nt").cast("double")
    terms = c.crossJoin(F.broadcast(t)).withColumn(
        "term", -(p) * F.log2(p)
    )
    folded = terms.agg(
        F.aggregate(
            F.array_sort(
                F.collect_list(F.struct(F.col("source"), F.col("term").alias("v")))
            ),
            F.lit(0.0),
            lambda a, x: a + x["v"],
        ).alias("h")
    )
    return folded.crossJoin(F.broadcast(t)).select(
        F.col("k").cast("long").alias("n_sources"),
        F.col("nt").cast("long").alias("n_docs"),
        _r6(F.col("h")).alias("entropy_bits"),
        _r6(F.col("h") / F.log2(F.col("k").cast("double"))).alias("evenness"),
    )


# ---------------------------------------------------------------------------
# Quartile coefficient of dispersion per brand
# ---------------------------------------------------------------------------

@_register(
    "quartile_dispersion_by_brand",
    """
    SELECT p.p_brand AS brand,
           CAST(count(*) AS BIGINT) AS n,
           round(quantile_cont(l.l_extendedprice, 0.25), 4) + 0.0 AS q1,
           round(quantile_cont(l.l_extendedprice, 0.75), 4) + 0.0 AS q3,
           floor((quantile_cont(l.l_extendedprice, 0.75)
                  - quantile_cont(l.l_extendedprice, 0.25))
                 / (quantile_cont(l.l_extendedprice, 0.75)
                    + quantile_cont(l.l_extendedprice, 0.25))
                 * 1000000 + 0.5) / 1000000.0 AS qcd
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY 1
    """,
    "Quartile coefficient of dispersion (Q3−Q1)/(Q3+Q1) of line "
    "price per brand: the scale-free robust spread measure that "
    "lets brands with very different price levels be compared on "
    "one axis (unlike raw IQR) and shrugs off outliers (unlike "
    "CV = σ/μ). Exact linear-interpolation quartiles — Spark "
    "percentile() ≡ DuckDB quantile_cont(), the parity the "
    "percentile operators established — in ONE grouped aggregate "
    "over the brand-keyed join.",
    ("stats", "robust", "percentile", "lineitem"),
)
def quartile_dispersion_by_brand(spark, sf_dir):
    from ..operators.scale import spread_for_compute

    # exact percentile's partial aggregate collects the full value
    # buffer per group in the SCAN stage — a single-row-group fixture
    # file serializes that onto one core (guide §2.6/§6); spreading
    # the 2-column projection first builds the buffers on all cores.
    # No-op on any multi-split real scan.
    li = spread_for_compute(
        _t(spark, sf_dir, "lineitem").select("l_partkey", "l_extendedprice")
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    j = li.join(p, li.l_partkey == p.p_partkey)
    q1 = F.expr("percentile(l_extendedprice, 0.25)")
    q3 = F.expr("percentile(l_extendedprice, 0.75)")
    return j.groupBy(F.col("p_brand").alias("brand")).agg(
        F.count("*").alias("n"),
        (F.round(q1, 4) + F.lit(0.0)).alias("q1"),
        (F.round(q3, 4) + F.lit(0.0)).alias("q3"),
        _r6((q3 - q1) / (q3 + q1)).alias("qcd"),
    )
