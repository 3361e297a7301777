"""Round-2 (cont.) registry additions — recommender MRR, decile lift
tables, metric mix-shift decomposition, and DAU/MAU stickiness.

Same contract as ``registry.py``. Imported at the bottom of
``registry.py``.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import _register, _t
from .registry6 import _RECO_K, _RECO_SALT


def _r6(col):
    return F.floor(col * 1000000 + F.lit(0.5)) / F.lit(1000000.0)


# ---------------------------------------------------------------------------
# Recommender MRR — exact from first-hit-rank counts
# ---------------------------------------------------------------------------

@_register(
    "reco_mrr_at_k",
    f"""
    WITH split AS (
      SELECT l_orderkey, l_partkey,
             substr(md5('{_RECO_SALT}' || CAST(l_orderkey AS VARCHAR)), 1, 1)
               IN ('0','1','2','3','4','5','6','7','8','9','a','b') AS is_train
      FROM lineitem
    ),
    train AS (SELECT DISTINCT l_orderkey, l_partkey FROM split WHERE is_train),
    test  AS (SELECT DISTINCT l_orderkey, l_partkey FROM split
              WHERE NOT is_train),
    co AS (
      SELECT a.l_partkey AS p, b.l_partkey AS q,
             CAST(count(*) AS BIGINT) AS w
      FROM train a JOIN train b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
      GROUP BY 1, 2
    ),
    recs AS (
      SELECT p, q, rk FROM (
        SELECT p, q,
               row_number() OVER (PARTITION BY p ORDER BY w DESC, q ASC) AS rk
        FROM co
      ) WHERE rk <= {_RECO_K}
    ),
    actual AS (
      SELECT DISTINCT a.l_partkey AS p, b.l_partkey AS q
      FROM test a JOIN test b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
    ),
    eval_items AS (
      SELECT p FROM actual GROUP BY p
    ),
    evald AS (SELECT e.p FROM eval_items e
              JOIN (SELECT DISTINCT p FROM recs) r USING (p)),
    first_hit AS (
      SELECT r.p, CAST(min(r.rk) AS INTEGER) AS minrk
      FROM recs r JOIN actual a ON a.p = r.p AND a.q = r.q
      GROUP BY 1
    ),
    rankdist AS (
      SELECT coalesce(h.minrk, 0) AS minrk, CAST(count(*) AS BIGINT) AS cnt
      FROM evald e LEFT JOIN first_hit h USING (p)
      GROUP BY 1
    )
    SELECT CAST(sum(cnt) AS BIGINT) AS n_eval_parts,
           CAST(sum(CASE WHEN minrk = 1 THEN cnt ELSE 0 END) AS BIGINT)
             AS hits_at_1,
           CAST(sum(CASE WHEN minrk > 0 THEN cnt ELSE 0 END) AS BIGINT)
             AS hits_at_k,
           floor((sum(CASE WHEN minrk = 1 THEN cnt ELSE 0 END) / 1.0
                + sum(CASE WHEN minrk = 2 THEN cnt ELSE 0 END) / 2.0
                + sum(CASE WHEN minrk = 3 THEN cnt ELSE 0 END) / 3.0
                + sum(CASE WHEN minrk = 4 THEN cnt ELSE 0 END) / 4.0
                + sum(CASE WHEN minrk = 5 THEN cnt ELSE 0 END) / 5.0)
                 / sum(cnt) * 1000000 + 0.5) / 1000000.0 AS mrr
    FROM rankdist
    """,
    "Mean reciprocal rank of the co-purchase recommender on the same "
    "md5 holdout as `reco_precision_at_k`: per evaluated part, the "
    "rank of the FIRST recommendation that appears in an actual test "
    "co-basket. Because ranks are bounded by k=5, MRR is computed "
    "EXACTLY from the integer first-hit-rank histogram — "
    "Σ count_r·(1/r) / n over five cells — eliminating the float-"
    "summation-order hazard a naive mean-of-reciprocals would have "
    "at cluster parallelism (the repo's determinism discipline, "
    "applied to ranking metrics). Recs/actual come from the "
    "materialized shared legs (_reco_eval_legs) — score once, "
    "evaluate many; the extra work is one 5-row histogram.",
    ("ml-eval", "recommendation", "lineitem"),
)
def reco_mrr_at_k(spark, sf_dir):
    from .registry6 import _reco_eval_legs

    recs, actual = _reco_eval_legs(spark, sf_dir)
    evald = actual.select("p").distinct().join(recs.select("p").distinct(), "p")
    first_hit = (
        recs.join(actual, ["p", "q"])
        .groupBy("p")
        .agg(F.min("rk").cast("int").alias("minrk"))
    )
    rankdist = (
        evald.join(first_hit, "p", "left")
        .select(F.coalesce(F.col("minrk"), F.lit(0)).alias("minrk"))
        .groupBy("minrk")
        .agg(F.count("*").alias("cnt"))
    )

    def at(r):
        return F.sum(F.when(F.col("minrk") == r, F.col("cnt")).otherwise(0))

    hits_at_k = F.sum(F.when(F.col("minrk") > 0, F.col("cnt")).otherwise(0))
    mrr = (
        at(1) / F.lit(1.0)
        + at(2) / F.lit(2.0)
        + at(3) / F.lit(3.0)
        + at(4) / F.lit(4.0)
        + at(5) / F.lit(5.0)
    ) / F.sum("cnt")
    return rankdist.agg(
        F.sum("cnt").cast("long").alias("n_eval_parts"),
        at(1).cast("long").alias("hits_at_1"),
        hits_at_k.cast("long").alias("hits_at_k"),
        _r6(mrr).alias("mrr"),
    )


# ---------------------------------------------------------------------------
# Decile lift table for a score (n_chars predicting lang='en')
# ---------------------------------------------------------------------------

@_register(
    "lift_table_documents",
    """
    WITH base AS (
      SELECT doc_id, n_chars,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      FROM documents
    ),
    ranked AS (
      SELECT y,
             row_number() OVER (ORDER BY n_chars DESC, doc_id ASC) AS rk,
             count(*) OVER () AS n
      FROM base
    ),
    dec AS (
      SELECT CAST((rk - 1) * 10 // n AS INTEGER) AS decile, y, n FROM ranked
    ),
    cells AS (
      SELECT decile,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(y) AS BIGINT) AS n_pos
      FROM dec GROUP BY 1
    ),
    tot AS (
      SELECT CAST(sum(n_docs) AS BIGINT) AS nt, CAST(sum(n_pos) AS BIGINT)
               AS pt
      FROM cells
    )
    SELECT c.decile, c.n_docs, c.n_pos,
           floor(c.n_pos / CAST(c.n_docs AS DOUBLE) * 1000000 + 0.5)
             / 1000000.0 AS rate,
           floor((c.n_pos / CAST(c.n_docs AS DOUBLE))
                 / (t.pt / CAST(t.nt AS DOUBLE)) * 1000000 + 0.5) / 1000000.0
             AS lift,
           floor(sum(c.n_pos) OVER (ORDER BY c.decile)
                 / CAST(t.pt AS DOUBLE) * 1000000 + 0.5) / 1000000.0
             AS cum_gain
    FROM cells c CROSS JOIN tot t
    """,
    "Decile lift / cumulative-gains table for a ranking score "
    "(n_chars scoring the lang='en' target): documents rank "
    "deterministically (score desc, doc_id asc) into ten equal-count "
    "deciles by integer arithmetic, and each decile reports capture "
    "rate, lift over the base rate, and cumulative gain — the model-"
    "evaluation table every targeting/quality classifier ships with, "
    "the tabular twin of `auc_chars_predict_english`. One global "
    "rank is the oracle's formulation; the ENGINE ranks via "
    "scale.py::dense_ids — range-partitioned parallel sort + "
    "partition-offset ids, same total order, no single-task sort — "
    "then "
    "deciles-sized arithmetic over exact integer cells.",
    ("ml-eval", "stats", "documents"),
)
def lift_table_documents(spark, sf_dir):
    from ..operators.scale import dense_ids

    d = _t(spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        "n_chars",
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    )
    # rank (n_chars DESC, doc_id ASC) WITHOUT a single-partition
    # window: negate the score and let dense_ids assign 0-based ids
    # via range-partitioned parallel sort + partition offsets
    ranked = dense_ids(
        base.withColumn("_neg", -F.col("n_chars")), "_neg", "doc_id",
        id_col="rk0",
    )
    tot_n = base.agg(F.count("*").alias("n"))
    dec = ranked.crossJoin(F.broadcast(tot_n)).select(
        F.floor(F.col("rk0") * 10 / F.col("n")).cast("int").alias("decile"),
        "y",
    )
    cells = dec.groupBy("decile").agg(
        F.count("*").alias("n_docs"), F.sum("y").alias("n_pos")
    )
    tot = cells.agg(F.sum("n_docs").alias("nt"), F.sum("n_pos").alias("pt"))
    rate = F.col("n_pos") / F.col("n_docs").cast("double")
    base_rate = F.col("pt") / F.col("nt").cast("double")
    wc = Window.orderBy("decile")
    return cells.crossJoin(F.broadcast(tot)).select(
        "decile",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_pos").cast("long").alias("n_pos"),
        _r6(rate).alias("rate"),
        _r6(rate / base_rate).alias("lift"),
        _r6(F.sum("n_pos").over(wc) / F.col("pt").cast("double")).alias(
            "cum_gain"
        ),
    )


# ---------------------------------------------------------------------------
# Mix-shift decomposition of average order value, 1995 → 1996
# ---------------------------------------------------------------------------

@_register(
    "mix_shift_decomposition_segments",
    """
    WITH cells AS (
      SELECT c.c_mktsegment AS segment,
             CAST(year(o.o_orderdate) AS INTEGER) AS yr,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(floor(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS s
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE year(o.o_orderdate) IN (1995, 1996)
      GROUP BY 1, 2
    ),
    tot AS (
      SELECT yr, CAST(sum(n) AS BIGINT) AS nt FROM cells GROUP BY 1
    ),
    w AS (
      SELECT c.segment,
             max(CASE WHEN c.yr = 1995 THEN c.n END) AS n_p,
             max(CASE WHEN c.yr = 1996 THEN c.n END) AS n_c,
             max(CASE WHEN c.yr = 1995 THEN c.s END) AS s_p,
             max(CASE WHEN c.yr = 1996 THEN c.s END) AS s_c,
             max(CASE WHEN t.yr = 1995 THEN t.nt END) AS nt_p,
             max(CASE WHEN t.yr = 1996 THEN t.nt END) AS nt_c
      FROM cells c CROSS JOIN tot t
      GROUP BY 1
    )
    SELECT segment,
           floor(n_p / CAST(nt_p AS DOUBLE) * 1000000 + 0.5) / 1000000.0
             AS share_prev,
           floor(n_c / CAST(nt_c AS DOUBLE) * 1000000 + 0.5) / 1000000.0
             AS share_cur,
           floor(s_p / CAST(n_p AS DOUBLE) * 10000 + 0.5) / 10000.0
             AS aov_prev_cents,
           floor(s_c / CAST(n_c AS DOUBLE) * 10000 + 0.5) / 10000.0
             AS aov_cur_cents,
           floor((n_p / CAST(nt_p AS DOUBLE))
                 * (s_c / CAST(n_c AS DOUBLE) - s_p / CAST(n_p AS DOUBLE))
                 * 10000 + 0.5) / 10000.0 AS rate_effect_cents,
           floor((n_c / CAST(nt_c AS DOUBLE) - n_p / CAST(nt_p AS DOUBLE))
                 * (s_c / CAST(n_c AS DOUBLE))
                 * 10000 + 0.5) / 10000.0 AS mix_effect_cents
    FROM w
    """,
    "Mix-shift decomposition of the year-over-year change in average "
    "order value (1995 → 1996) across customer segments: per "
    "segment, Δ splits into a RATE effect (prev share × AOV change) "
    "and a MIX effect (share change × current AOV), which together "
    "sum exactly to the overall AOV delta — the 'why did the metric "
    "move' answer every metrics review asks for. One partition-"
    "pruned scan → 2×5 integer cells; all shares/AOVs/effects are "
    "pinned IEEE expressions over exact integer-cent sums.",
    ("analytics", "decomposition", "orders"),
)
def mix_shift_decomposition_segments(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    yr = F.year(F.col("o_orderdate"))
    cells = (
        o.filter(yr.isin(1995, 1996))
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"), yr.cast("int").alias("yr")
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias("s"),
        )
    )
    tot = cells.groupBy("yr").agg(F.sum("n").alias("nt"))

    def pick(col, y):
        return F.max(F.when(F.col("yr2") == y, F.col(col)))

    w = (
        cells.crossJoin(F.broadcast(tot.select(F.col("yr").alias("yr2"), "nt")))
        .groupBy("segment")
        .agg(
            F.max(F.when(F.col("yr") == 1995, F.col("n"))).alias("n_p"),
            F.max(F.when(F.col("yr") == 1996, F.col("n"))).alias("n_c"),
            F.max(F.when(F.col("yr") == 1995, F.col("s"))).alias("s_p"),
            F.max(F.when(F.col("yr") == 1996, F.col("s"))).alias("s_c"),
            pick("nt", 1995).alias("nt_p"),
            pick("nt", 1996).alias("nt_c"),
        )
    )
    share_p = F.col("n_p") / F.col("nt_p").cast("double")
    share_c = F.col("n_c") / F.col("nt_c").cast("double")
    aov_p = F.col("s_p") / F.col("n_p").cast("double")
    aov_c = F.col("s_c") / F.col("n_c").cast("double")
    r4 = lambda c_: F.floor(c_ * 10000 + F.lit(0.5)) / F.lit(10000.0)  # noqa: E731
    return w.select(
        "segment",
        _r6(share_p).alias("share_prev"),
        _r6(share_c).alias("share_cur"),
        r4(aov_p).alias("aov_prev_cents"),
        r4(aov_c).alias("aov_cur_cents"),
        r4(share_p * (aov_c - aov_p)).alias("rate_effect_cents"),
        r4((share_c - share_p) * aov_c).alias("mix_effect_cents"),
    )


# ---------------------------------------------------------------------------
# DAU / MAU stickiness per day
# ---------------------------------------------------------------------------

@_register(
    "dau_mau_stickiness",
    """
    WITH du AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau FROM du GROUP BY 1),
    mu AS (
      SELECT DISTINCT CAST(date_trunc('month', CAST(ts AS DATE)) AS DATE)
               AS month, user_id
      FROM events
    ),
    mau AS (SELECT month, CAST(count(*) AS BIGINT) AS mau FROM mu GROUP BY 1)
    SELECT d.day, d.dau, m.mau,
           floor(d.dau / CAST(m.mau AS DOUBLE) * 1000000 + 0.5) / 1000000.0
             AS stickiness
    FROM dau d
    JOIN mau m ON m.month = CAST(date_trunc('month', d.day) AS DATE)
    """,
    "DAU/MAU stickiness per day: exact distinct users at the daily "
    "and calendar-month grains, joined so each day reports its "
    "month's stickiness ratio — the engagement-health metric next to "
    "`daily_new_vs_returning_users` and the sliding-7-day distinct "
    "operators. Both distinct layers are single user-keyed shuffles "
    "(at 100 TB: partial distinct map-side, or swap the MAU layer "
    "for the mergeable HLL/bitmap operators this repo ships); the "
    "month join is months-sized broadcast.",
    ("analytics", "distinct", "events"),
)
def dau_mau_stickiness(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    du = e.select(
        F.col("ts").cast("date").alias("day"), "user_id"
    ).distinct()
    dau = du.groupBy("day").agg(F.count("*").alias("dau"))
    mu = e.select(
        F.trunc(F.col("ts").cast("date"), "month").alias("month"), "user_id"
    ).distinct()
    mau = mu.groupBy("month").agg(F.count("*").alias("mau"))
    return (
        dau.join(
            F.broadcast(mau),
            F.trunc(F.col("day"), "month") == F.col("month"),
        )
        .select(
            "day",
            F.col("dau").cast("long").alias("dau"),
            F.col("mau").cast("long").alias("mau"),
            _r6(F.col("dau") / F.col("mau").cast("double")).alias("stickiness"),
        )
    )
