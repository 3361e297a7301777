"""Round-2 (cont.) registry additions — containment-similarity dedup
and Page–Hinkley sequential drift detection.

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
# Containment (one-way Jaccard) pairs — subset-duplicate detection
# ---------------------------------------------------------------------------

_CONTAIN_T = 0.8


@_register(
    "ngram_containment_pairs",
    f"""
    WITH toks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
    ),
    grams AS (
      SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
      FROM (SELECT doc_id, w,
                   unnest(generate_series(1, greatest(len(w) - 2, 0))) AS i
            FROM toks)
    ),
    cnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM grams
            GROUP BY 1),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(count(*) AS BIGINT) AS i
      FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           floor(i / CAST(ca.n AS DOUBLE) * 1000000 + 0.5) / 1000000.0
             AS contain_a,
           floor(i / CAST(cb.n AS DOUBLE) * 1000000 + 0.5) / 1000000.0
             AS contain_b
    FROM inter
    JOIN cnt ca ON ca.doc_id = id_a
    JOIN cnt cb ON cb.doc_id = id_b
    WHERE i / CAST(ca.n AS DOUBLE) >= {_CONTAIN_T}
       OR i / CAST(cb.n AS DOUBLE) >= {_CONTAIN_T}
    """,
    "Containment-similarity pairs (one-way Jaccard, Broder's "
    "containment): |A∩B|/|A| per direction over distinct 3-gram "
    "sets, keeping pairs where EITHER direction reaches 0.8 — the "
    "subset-duplicate detector that symmetric Jaccard structurally "
    "misses (a short doc fully embedded in a long one has tiny "
    "J = |∩|/|∪| but containment ≈ 1). Same inverted-index plan as "
    "`ngram_jaccard_pairs`: gram-bucket equi-join (quadratic only "
    "within a gram's posting list), per-doc gram counts joined back; "
    "counts exact, each containment one pinned division. The "
    "whitespace split (vs the tokenizer split) matches the Jaccard "
    "miner so the two operators' gram spaces are identical.",
    ("dedup", "similarity", "documents"),
)
def ngram_containment_pairs(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    w = F.split(F.lower(F.col("text")), " ")
    # docs with <3 whitespace tokens have no 3-grams (DuckDB's
    # generate_series(1,0) is empty; Spark sequence(1,0) DESCENDS, so
    # filter them out before the explode)
    base = d.select("doc_id", w.alias("w")).filter(F.size("w") >= 3)
    grams = (
        base.select(
            "doc_id",
            F.explode(F.sequence(F.lit(1), F.size("w") - 2)).alias("i"),
            "w",
        )
        .select(
            "doc_id",
            F.concat_ws(
                " ",
                F.element_at("w", F.col("i")),
                F.element_at("w", F.col("i") + 1),
                F.element_at("w", F.col("i") + 2),
            ).alias("g"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    cnt = grams.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = grams.select(F.col("doc_id").alias("id_a"), "g")
    b = grams.select(F.col("doc_id").alias("id_b"), "g")
    inter = (
        a.join(b, "g")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("i"))
    )
    ca = cnt.select(F.col("doc_id").alias("id_a"), F.col("n").alias("na"))
    cb = cnt.select(F.col("doc_id").alias("id_b"), F.col("n").alias("nb"))
    contain_a = F.col("i") / F.col("na").cast("double")
    contain_b = F.col("i") / F.col("nb").cast("double")
    return (
        inter.join(ca, "id_a")
        .join(cb, "id_b")
        .filter((contain_a >= _CONTAIN_T) | (contain_b >= _CONTAIN_T))
        .select(
            "id_a",
            "id_b",
            _r6(contain_a).alias("contain_a"),
            _r6(contain_b).alias("contain_b"),
        )
    )


# ---------------------------------------------------------------------------
# Page–Hinkley sequential drift detection on the daily mean order value
# ---------------------------------------------------------------------------

_PH_DELTA_MICRO = 50_000_000  # tolerance: 50 cents, in micro-cents


@_register(
    "page_hinkley_drift_daily",
    f"""
    WITH daily AS (
      SELECT o_orderdate AS day,
             CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS s,
             CAST(count(*) AS BIGINT) AS n
      FROM orders GROUP BY 1
    ),
    x AS (
      SELECT day, CAST((s * 1000000) // n AS BIGINT) AS xq,
             row_number() OVER (ORDER BY day) AS t
      FROM daily
    ),
    run AS (
      SELECT day, xq, t,
             CAST(sum(xq) OVER (ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) // t
                  AS BIGINT) AS xbar_q
      FROM x
    ),
    m AS (
      SELECT day, t,
             CAST(sum(xq - xbar_q - {_PH_DELTA_MICRO}) OVER (ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS mt
      FROM run
    )
    SELECT day,
           CAST(t AS BIGINT) AS t,
           mt AS m_t_micro,
           CAST(mt - min(mt) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS ph_t_micro
    FROM m
    """,
    "Page–Hinkley sequential changepoint statistic on the daily mean "
    "order value: m_t = Σ(x_i − x̄_i − δ) with x̄_i the running mean "
    "and PH_t = m_t − min m — the classic streaming drift detector "
    "(an upward mean shift sends PH_t past its alarm threshold), "
    "complementing the retrospective CUSUM operator. Every quantity "
    "lives in INTEGER micro-cents — per-day means and running means "
    "are floor divisions, the cumulative sums are integer window "
    "folds — so the result is exact regardless of either engine's "
    "window-aggregation tree order (DuckDB's segment-tree float "
    "summation would otherwise be a cross-engine hazard). Facts "
    "collapse once; everything after is days-sized.",
    ("timeseries", "drift", "orders"),
)
def page_hinkley_drift_daily(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100).cast("long")
    daily = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(cents).alias("s"), F.count("*").alias("n")
    )
    # micro-cent staging in decimal: s (daily cents) reaches ~9e13 at
    # sf100k, so s*1e6 would wrap int64; the div-n quotient itself is
    # per-order-scale and fits long comfortably
    x = daily.select(
        "day",
        F.floor(
            F.col("s").cast("decimal(25,0)")
            * F.lit(1000000).cast("decimal(7,0)")
            / F.col("n")
        )
        .cast("long")
        .alias("xq"),
        F.row_number().over(Window.orderBy("day")).alias("t"),
    )
    cum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    run = x.select(
        "day",
        "xq",
        "t",
        F.expr(
            "sum(xq) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING"
            " AND CURRENT ROW) div t"
        ).alias("xbar_q"),
    )
    m = run.select(
        "day",
        "t",
        F.sum(F.col("xq") - F.col("xbar_q") - F.lit(_PH_DELTA_MICRO))
        .over(cum)
        .alias("mt"),
    )
    return m.select(
        "day",
        F.col("t").cast("long").alias("t"),
        F.col("mt").cast("long").alias("m_t_micro"),
        (F.col("mt") - F.min("mt").over(cum)).cast("long").alias("ph_t_micro"),
    )
