"""Round-2 (cont.) registry additions — trend/forecast-error tests,
behavioral entropy, corpus drift, policy screening, fold assignment,
audience overlap, record linkage, and network-address profiling.

Same contract as ``registry.py``: DataFrame builder + DuckDB oracle,
column names/types aligned, floats pinned by identical expression
order over exact integers (ordered folds where summation order
matters). Imported at the bottom of ``registry.py``.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import _register, _t


def _r6(col):
    return F.floor(col * 1000000 + F.lit(0.5)) / F.lit(1000000.0)


def _r4(col):
    return F.floor(col * 10000 + F.lit(0.5)) / F.lit(10000.0)


# ---------------------------------------------------------------------------
# Mann–Kendall trend test over daily revenue
# ---------------------------------------------------------------------------

@_register(
    "mann_kendall_trend_daily",
    """
    WITH daily AS (
      SELECT o_orderdate AS day,
             CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev
      FROM orders GROUP BY 1
    ),
    s AS (
      SELECT CAST(sum(CASE WHEN b.rev > a.rev THEN 1
                           WHEN b.rev < a.rev THEN -1 ELSE 0 END) AS BIGINT)
               AS s_stat
      FROM daily a JOIN daily b ON a.day < b.day
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM daily),
    ties AS (
      SELECT CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)
               AS tie_term
      FROM (SELECT CAST(count(*) AS BIGINT) AS t FROM daily GROUP BY rev)
      WHERE t > 1
    )
    SELECT n_days, s_stat,
           floor((n_days * (n_days - 1) * (2 * n_days + 5) - tie_term) / 18.0
                 * 10000 + 0.5) / 10000.0 AS var_s,
           floor(CASE WHEN s_stat > 0 THEN (s_stat - 1)
                        / sqrt((n_days * (n_days - 1) * (2 * n_days + 5)
                                - tie_term) / 18.0)
                      WHEN s_stat < 0 THEN (s_stat + 1)
                        / sqrt((n_days * (n_days - 1) * (2 * n_days + 5)
                                - tie_term) / 18.0)
                      ELSE 0.0 END * 1000000 + 0.5) / 1000000.0 AS z_stat
    FROM s CROSS JOIN n CROSS JOIN ties
    """,
    "Mann–Kendall non-parametric trend test on the daily revenue "
    "series: S = Σ sign(x_j − x_i) over all i<j day pairs, "
    "tie-corrected variance n(n−1)(2n+5)/18 − Σt(t−1)(2t+5)/18, and "
    "the continuity-corrected z score. One fact-sized rollup to the "
    "days-sized series; the O(days²) pair join and the tie census run "
    "on days, never facts (2,400 days → 5.8M integer sign pairs, a "
    "sub-second join at any fact scale). S and the tie term are exact "
    "integer sums, so z is a single pinned IEEE expression.",
    ("stats", "timeseries", "trend", "orders"),
)
def mann_kendall_trend_daily(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100).cast("long")
    daily = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(cents).alias("rev")
    )
    a = daily.select(F.col("day").alias("da"), F.col("rev").alias("ra"))
    b = daily.select(F.col("day").alias("db"), F.col("rev").alias("rb"))
    s = (
        a.join(b, F.col("da") < F.col("db"))
        .agg(
            F.sum(
                F.when(F.col("rb") > F.col("ra"), 1)
                .when(F.col("rb") < F.col("ra"), -1)
                .otherwise(0)
            ).alias("s_stat")
        )
    )
    n = daily.agg(F.count("*").alias("n_days"))
    ties = (
        daily.groupBy("rev")
        .agg(F.count("*").alias("t"))
        .filter(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)),
                F.lit(0),
            ).alias("tie_term")
        )
    )
    var_s = (
        F.col("n_days") * (F.col("n_days") - 1) * (2 * F.col("n_days") + 5)
        - F.col("tie_term")
    ) / F.lit(18.0)
    z = (
        F.when(F.col("s_stat") > 0, (F.col("s_stat") - 1) / F.sqrt(var_s))
        .when(F.col("s_stat") < 0, (F.col("s_stat") + 1) / F.sqrt(var_s))
        .otherwise(F.lit(0.0))
    )
    return (
        s.crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(ties))
        .select(
            F.col("n_days").cast("long").alias("n_days"),
            F.col("s_stat").cast("long").alias("s_stat"),
            _r4(var_s).alias("var_s"),
            _r6(z).alias("z_stat"),
        )
    )


# ---------------------------------------------------------------------------
# Seasonal-naive forecast error (MAE / MASE) on daily revenue
# ---------------------------------------------------------------------------

@_register(
    "mase_seasonal_naive_daily",
    """
    WITH daily AS (
      SELECT o_orderdate AS day,
             CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev
      FROM orders GROUP BY 1
    ),
    lagged AS (
      SELECT rev,
             lag(rev, 1) OVER (ORDER BY day) AS l1,
             lag(rev, 7) OVER (ORDER BY day) AS l7
      FROM daily
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_days,
             CAST(count(l7) AS BIGINT) AS n_eval7,
             CAST(sum(abs(rev - l1)) AS BIGINT) AS s1,
             CAST(count(l1) AS BIGINT) AS c1,
             CAST(sum(abs(rev - l7)) AS BIGINT) AS s7
      FROM lagged
    )
    SELECT n_days, n_eval7,
           floor(s1 / c1 * 10000 + 0.5) / 10000.0 AS mae_naive1_cents,
           floor(s7 / n_eval7 * 10000 + 0.5) / 10000.0 AS mae_seasonal7_cents,
           floor((s7 / n_eval7) / (s1 / c1) * 1000000 + 0.5) / 1000000.0
             AS mase
    FROM agg
    """,
    "Seasonal-naive forecast-error report: the lag-7 (weekly) naive "
    "forecast's MAE over the daily revenue series, scaled by the "
    "lag-1 naive MAE → MASE, the standard scale-free forecast "
    "baseline every model must beat. Lags are row-lags over the "
    "day-ordered days-sized series (single tiny window partition "
    "AFTER the fact-sized rollup); absolute errors are exact integer "
    "cents, so both ratios are pinned IEEE divisions of integers.",
    ("timeseries", "forecast", "orders"),
)
def mase_seasonal_naive_daily(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100).cast("long")
    daily = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(cents).alias("rev")
    )
    w = Window.orderBy("day")
    lagged = daily.select(
        "rev",
        F.lag("rev", 1).over(w).alias("l1"),
        F.lag("rev", 7).over(w).alias("l7"),
    )
    agg = lagged.agg(
        F.count("*").alias("n_days"),
        F.count("l7").alias("n_eval7"),
        F.sum(F.abs(F.col("rev") - F.col("l1"))).alias("s1"),
        F.count("l1").alias("c1"),
        F.sum(F.abs(F.col("rev") - F.col("l7"))).alias("s7"),
    )
    mae1 = F.col("s1") / F.col("c1")
    mae7 = F.col("s7") / F.col("n_eval7")
    return agg.select(
        F.col("n_days").cast("long").alias("n_days"),
        F.col("n_eval7").cast("long").alias("n_eval7"),
        _r4(mae1).alias("mae_naive1_cents"),
        _r4(mae7).alias("mae_seasonal7_cents"),
        _r6(mae7 / mae1).alias("mase"),
    )


# ---------------------------------------------------------------------------
# Behavioral entropy per user (event-type distribution)
# ---------------------------------------------------------------------------

@_register(
    "behavior_entropy_users",
    """
    WITH c AS (
      SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2
    ),
    n AS (
      SELECT user_id, CAST(sum(cnt) AS BIGINT) AS n_events FROM c GROUP BY 1
    ),
    t AS (
      SELECT c.user_id, c.event_type, c.cnt,
             -(c.cnt / CAST(n.n_events AS DOUBLE))
               * log2(c.cnt / CAST(n.n_events AS DOUBLE)) AS term
      FROM c JOIN n USING (user_id)
    ),
    u AS (
      SELECT user_id,
             CAST(sum(cnt) AS BIGINT) AS n_events,
             CAST(count(*) AS INTEGER) AS n_types,
             list_reduce(list_prepend(0.0, list(term ORDER BY event_type)),
                         (a, x) -> a + x) AS h
      FROM t GROUP BY user_id
    )
    SELECT user_id, n_events, n_types,
           floor(h * 1000000 + 0.5) / 1000000.0 AS entropy_bits
    FROM u
    """,
    "Behavioral entropy per user: Shannon entropy (bits) of the "
    "user's event-type distribution, the classic bot/engagement "
    "diversity signal. Per-(user,type) integer counts come from one "
    "map-side-combined aggregate; the ≤5 per-user terms "
    "-(c/n)·log₂(c/n) fold LEFT-TO-RIGHT in event_type order on both "
    "engines (the repo-standard discipline for order-sensitive float "
    "sums), so the doubles are bit-identical. Everything after the "
    "first aggregate is users-sized.",
    ("stats", "entropy", "events"),
)
def behavior_entropy_users(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    c = e.groupBy("user_id", "event_type").agg(F.count("*").alias("cnt"))
    n = F.sum("cnt").over(Window.partitionBy("user_id"))
    p = F.col("cnt") / n.cast("double")
    term = -(p) * F.log2(p)
    g = (
        c.withColumn("term", term)
        .groupBy("user_id")
        .agg(
            F.sum("cnt").alias("n_events"),
            F.count("*").cast("int").alias("n_types"),
            F.aggregate(
                F.array_sort(
                    F.collect_list(
                        F.struct(F.col("event_type"), F.col("term").alias("v"))
                    )
                ),
                F.lit(0.0),
                lambda a, x: a + x["v"],
            ).alias("h"),
        )
    )
    return g.select(
        "user_id",
        F.col("n_events").cast("long").alias("n_events"),
        "n_types",
        _r6(F.col("h")).alias("entropy_bits"),
    )


# ---------------------------------------------------------------------------
# Corpus drift: per-source KL divergence of unigram distributions
# ---------------------------------------------------------------------------

@_register(
    "kl_divergence_source_unigrams",
    """
    WITH tok AS (
      SELECT source,
             unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                t -> t <> '')) AS token
      FROM documents
    ),
    sc AS (
      SELECT source, token, CAST(count(*) AS BIGINT) AS c
      FROM tok GROUP BY 1, 2
    ),
    cc AS (SELECT token, CAST(sum(c) AS BIGINT) AS ct FROM sc GROUP BY 1),
    tot AS (SELECT CAST(sum(ct) AS BIGINT) AS big_n FROM cc),
    terms AS (
      SELECT s.source, s.token,
             s.c,
             (s.c / CAST(sum(s.c) OVER (PARTITION BY s.source) AS DOUBLE))
               * log2((s.c / CAST(sum(s.c) OVER (PARTITION BY s.source)
                                  AS DOUBLE))
                      / (c2.ct / CAST(t.big_n AS DOUBLE))) AS term
      FROM sc s JOIN cc c2 USING (token) CROSS JOIN tot t
    )
    SELECT source,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           CAST(count(*) AS INTEGER) AS vocab_size,
           floor(list_reduce(list_prepend(0.0, list(term ORDER BY token)),
                             (a, x) -> a + x) * 1000000 + 0.5) / 1000000.0
             AS kl_bits
    FROM terms GROUP BY source
    """,
    "Corpus-drift screen: KL(source ‖ corpus) in bits between each "
    "source's unigram distribution and the pooled corpus distribution "
    "— the domain-shift signal used to spot an over/under-represented "
    "slice before training. Per-(source,token) counts shuffle once "
    "(map-side combined); the vocabulary-sized corpus table joins "
    "back broadcast; per-source terms p_s·log₂(p_s/p_c) fold in "
    "token order so both engines add identical doubles in identical "
    "order. The source's support is a subset of the corpus's, so "
    "every term is finite.",
    ("text-quality", "drift", "documents"),
)
def kl_divergence_source_unigrams(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    tok = d.select(
        "source",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda t: t != ""
            )
        ).alias("token"),
    )
    sc = tok.groupBy("source", "token").agg(F.count("*").alias("c"))
    cc = sc.groupBy("token").agg(F.sum("c").alias("ct"))
    tot = cc.agg(F.sum("ct").alias("big_n"))
    ns = F.sum("c").over(Window.partitionBy("source"))
    ps = F.col("c") / ns.cast("double")
    pc = F.col("ct") / F.col("big_n").cast("double")
    terms = (
        sc.join(F.broadcast(cc), "token")
        .crossJoin(F.broadcast(tot))
        .withColumn("term", ps * F.log2(ps / pc))
    )
    return (
        terms.groupBy("source")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count("*").cast("int").alias("vocab_size"),
            F.aggregate(
                F.array_sort(
                    F.collect_list(
                        F.struct(F.col("token"), F.col("term").alias("v"))
                    )
                ),
                F.lit(0.0),
                lambda a, x: a + x["v"],
            ).alias("kl"),
        )
        .select(
            "source",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            "vocab_size",
            _r6(F.col("kl")).alias("kl_bits"),
        )
    )


# ---------------------------------------------------------------------------
# Blocklist / policy screening with severity weights
# ---------------------------------------------------------------------------

# term -> deci-weight (integer tenths so severity sums stay exact)
BLOCKLIST_WEIGHTS = {
    "hash": 30,
    "merge": 25,
    "slow": 20,
    "spark": 10,
    "batch": 10,
}
_BLOCK_FLAG_DECI = 100


def _blocklist_sql() -> str:
    """DuckDB twin generated from the SAME weight table."""
    hits = " + ".join(
        f"len(list_filter(toks, x -> x = '{t}'))"
        for t in sorted(BLOCKLIST_WEIGHTS)
    )
    distinct_hit = " + ".join(
        f"CASE WHEN list_contains(toks, '{t}') THEN 1 ELSE 0 END"
        for t in sorted(BLOCKLIST_WEIGHTS)
    )
    sev = " + ".join(
        f"len(list_filter(toks, x -> x = '{t}')) * {w}"
        for t, w in sorted(BLOCKLIST_WEIGHTS.items())
    )
    return f"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS toks
      FROM documents
    )
    SELECT doc_id,
           CAST(len(toks) AS INTEGER) AS n_tokens,
           CAST({hits} AS INTEGER) AS hits_total,
           CAST({distinct_hit} AS INTEGER) AS distinct_terms_hit,
           CAST({sev} AS BIGINT) AS severity_deci,
           ({sev}) >= {_BLOCK_FLAG_DECI} AS flagged
    FROM t
    """


@_register(
    "blocklist_screen_documents",
    _blocklist_sql(),
    "Policy / blocklist screening: per-document hit counts against a "
    "weighted term list (weights in integer tenths so the severity "
    "score is an exact integer), with a flag at severity ≥ 10.0 — the "
    "content-filter gate of a training-data pipeline. Token-exact "
    "matching (split + in-row filters), zero shuffle, and the oracle "
    "SQL is GENERATED from the same weight table so the two engines "
    "cannot drift. At 100 TB this is a pure scan-local map; the term "
    "list compiles into the row expression, no join.",
    ("text-quality", "policy", "documents"),
)
def blocklist_screen_documents(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda x: x != ""
    )
    base = d.select("doc_id", toks.alias("toks"))
    def _match(term):
        return lambda x: x == F.lit(term)

    per_term = {
        t: F.size(F.filter(F.col("toks"), _match(t)))
        for t in sorted(BLOCKLIST_WEIGHTS)
    }
    hits_total = sum(per_term.values(), F.lit(0))
    distinct_hit = sum(
        (F.when(per_term[t] > 0, 1).otherwise(0) for t in sorted(BLOCKLIST_WEIGHTS)),
        F.lit(0),
    )
    severity = sum(
        (per_term[t] * F.lit(w) for t, w in sorted(BLOCKLIST_WEIGHTS.items())),
        F.lit(0),
    )
    return base.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        hits_total.cast("int").alias("hits_total"),
        distinct_hit.cast("int").alias("distinct_terms_hit"),
        severity.cast("long").alias("severity_deci"),
        (severity >= _BLOCK_FLAG_DECI).alias("flagged"),
    )


# ---------------------------------------------------------------------------
# Stratified k-fold assignment (deterministic, rerun-stable)
# ---------------------------------------------------------------------------

_KFOLD_SALT = "fold-v1"
_KFOLDS = 5


@_register(
    "stratified_kfold_documents",
    f"""
    WITH assigned AS (
      SELECT lang,
             CAST(CAST(('0x' || substr(md5('{_KFOLD_SALT}'
                         || CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT)
                  % {_KFOLDS} AS INTEGER) AS fold,
             CAST(len(list_filter(string_split_regex(lower(text),
                                                     '[^a-z0-9]+'),
                                  x -> x <> '')) AS BIGINT) AS n_tok
      FROM documents
    )
    SELECT lang, fold,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens
    FROM assigned GROUP BY 1, 2
    """,
    "Stratified k-fold assignment for cross-validation: every "
    "document lands in fold md5(salt‖doc_id)[0:8] mod 5 — a pure "
    "function of the key, so folds are rerun-stable, join-free, and "
    "identical on any engine or cluster size (no rand(), no global "
    "sort). Emitted as the per-(stratum=lang, fold) doc/token census "
    "that validates balance. Scan-local assignment; one small "
    "aggregate.",
    ("ml-prep", "sampling", "documents"),
)
def stratified_kfold_documents(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    fold = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(_KFOLD_SALT), F.col("doc_id").cast("string")
                    ).cast("binary")
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % _KFOLDS
    ).cast("int")
    n_tok = F.size(
        F.filter(F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda x: x != "")
    ).cast("long")
    return (
        d.select("lang", fold.alias("fold"), n_tok.alias("n_tok"))
        .groupBy("lang", "fold")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# Audience overlap between event types (exact pairwise co-usage)
# ---------------------------------------------------------------------------

@_register(
    "audience_overlap_event_types",
    """
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
    tot AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM ut GROUP BY 1
    ),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(count(*) AS BIGINT) AS n_both
      FROM ut a JOIN ut b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT type_a, type_b, ta.n AS n_a, tb.n AS n_b, n_both,
           floor(n_both / CAST(ta.n + tb.n - n_both AS DOUBLE)
                 * 1000000 + 0.5) / 1000000.0 AS jaccard
    FROM pairs
    JOIN tot ta ON ta.event_type = type_a
    JOIN tot tb ON tb.event_type = type_b
    """,
    "Exact audience-overlap matrix between event types: |A∩B|, per-"
    "type totals and Jaccard for every type pair — the segment-"
    "overlap question behind campaign planning. The distinct "
    "(user,type) layer is ONE users-keyed shuffle; the pair self-join "
    "is co-partitioned on user_id with a bounded ≤C(5,2) fan-out per "
    "user, so the plan is users-sized at any fact scale; the "
    "types-sized totals broadcast back. All counts are exact "
    "integers; Jaccard is one pinned division.",
    ("agg", "overlap", "events"),
)
def audience_overlap_event_types(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    ut = e.select("user_id", "event_type").distinct()
    tot = ut.groupBy("event_type").agg(F.count("*").alias("n"))
    a = ut.select("user_id", F.col("event_type").alias("type_a"))
    b = ut.select("user_id", F.col("event_type").alias("type_b"))
    pairs = (
        a.join(b, ["user_id"])
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("n_both"))
    )
    ta = tot.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    tb = tot.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    uni = (F.col("n_a") + F.col("n_b") - F.col("n_both")).cast("double")
    return (
        pairs.join(F.broadcast(ta), "type_a")
        .join(F.broadcast(tb), "type_b")
        .select(
            "type_a",
            "type_b",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.col("n_both").cast("long").alias("n_both"),
            _r6(F.col("n_both") / uni).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# Fellegi–Sunter record-linkage scoring on blocked customer pairs
# ---------------------------------------------------------------------------

# (agree_deci, disagree_deci) per comparison field — log2(m/u)-style
# weights in integer tenths so pair scores are exact integers.
_FS_WEIGHTS = {"segment": (25, -12), "balance": (31, -8), "digit": (7, -3)}
_FS_BAL_TOL_CENTS = 5000
_FS_THRESHOLD_DECI = 40


@_register(
    "fellegi_sunter_linkage_scores",
    f"""
    WITH c AS (
      SELECT c_custkey AS id, c_nationkey AS nat, c_mktsegment AS seg,
             CAST(floor(c_acctbal * 100) AS BIGINT) AS bal_cents,
             CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_bucket
      FROM customer
    ),
    pairs AS (
      SELECT a.id AS id_a, b.id AS id_b,
             a.seg = b.seg AS agree_seg,
             abs(a.bal_cents - b.bal_cents) <= {_FS_BAL_TOL_CENTS}
               AS agree_bal,
             a.id % 10 = b.id % 10 AS agree_digit
      FROM c a JOIN c b
        ON a.nat = b.nat AND a.bal_bucket = b.bal_bucket AND a.id < b.id
    )
    SELECT id_a, id_b, agree_seg, agree_bal, agree_digit,
           CAST(CASE WHEN agree_seg THEN {_FS_WEIGHTS["segment"][0]}
                     ELSE {_FS_WEIGHTS["segment"][1]} END
              + CASE WHEN agree_bal THEN {_FS_WEIGHTS["balance"][0]}
                     ELSE {_FS_WEIGHTS["balance"][1]} END
              + CASE WHEN agree_digit THEN {_FS_WEIGHTS["digit"][0]}
                     ELSE {_FS_WEIGHTS["digit"][1]} END AS BIGINT)
             AS score_deci
    FROM pairs
    WHERE CASE WHEN agree_seg THEN {_FS_WEIGHTS["segment"][0]}
               ELSE {_FS_WEIGHTS["segment"][1]} END
        + CASE WHEN agree_bal THEN {_FS_WEIGHTS["balance"][0]}
               ELSE {_FS_WEIGHTS["balance"][1]} END
        + CASE WHEN agree_digit THEN {_FS_WEIGHTS["digit"][0]}
               ELSE {_FS_WEIGHTS["digit"][1]} END >= {_FS_THRESHOLD_DECI}
    """,
    "Fellegi–Sunter probabilistic record linkage over the customer "
    "table: candidate pairs come from a (nation, balance-bucket) "
    "blocking equi-join — never a cross product — then each pair is "
    "scored by per-field agreement weights (log₂(m/u)-style, stored "
    "as integer tenths so scores are exact), keeping pairs above the "
    "match threshold. The field-comparison vector rides along so "
    "clerical review can see WHY a pair matched. At 100 TB the "
    "blocking key bounds pair fan-out; skewed blocks would use the "
    "salted-join lever.",
    ("linkage", "join", "dedup", "customer"),
)
def fellegi_sunter_linkage_scores(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        F.col("c_nationkey").alias("nat"),
        F.col("c_mktsegment").alias("seg"),
        F.floor(F.col("c_acctbal") * 100).cast("long").alias("bal_cents"),
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_bucket"),
    )
    a = c.select(*(F.col(x).alias(f"{x}_a") for x in c.columns))
    b = c.select(*(F.col(x).alias(f"{x}_b") for x in c.columns))
    pairs = a.join(
        b,
        (F.col("nat_a") == F.col("nat_b"))
        & (F.col("bal_bucket_a") == F.col("bal_bucket_b"))
        & (F.col("id_a") < F.col("id_b")),
    )
    agree_seg = F.col("seg_a") == F.col("seg_b")
    agree_bal = (
        F.abs(F.col("bal_cents_a") - F.col("bal_cents_b")) <= _FS_BAL_TOL_CENTS
    )
    agree_digit = (F.col("id_a") % 10) == (F.col("id_b") % 10)
    score = (
        F.when(agree_seg, _FS_WEIGHTS["segment"][0]).otherwise(
            _FS_WEIGHTS["segment"][1]
        )
        + F.when(agree_bal, _FS_WEIGHTS["balance"][0]).otherwise(
            _FS_WEIGHTS["balance"][1]
        )
        + F.when(agree_digit, _FS_WEIGHTS["digit"][0]).otherwise(
            _FS_WEIGHTS["digit"][1]
        )
    )
    return (
        pairs.select(
            "id_a",
            "id_b",
            agree_seg.alias("agree_seg"),
            agree_bal.alias("agree_bal"),
            agree_digit.alias("agree_digit"),
            score.cast("long").alias("score_deci"),
        )
        .filter(F.col("score_deci") >= _FS_THRESHOLD_DECI)
    )


# ---------------------------------------------------------------------------
# Network-address profiling: synthesized IPv4 → octets, class, CIDR
# ---------------------------------------------------------------------------

@_register(
    "ip_cidr_census",
    """
    WITH ips AS (
      SELECT DISTINCT user_id,
             (user_id * 2654435761) % 4294967296 AS ip
      FROM events
    ),
    oct AS (
      SELECT user_id,
             CAST(ip // 16777216 AS INTEGER) AS o1,
             CAST((ip // 65536) % 256 AS INTEGER) AS o2,
             CAST(ip // 65536 AS BIGINT) AS slash16
      FROM ips
    )
    SELECT CASE WHEN o1 < 128 THEN 'A' WHEN o1 < 192 THEN 'B'
                WHEN o1 < 224 THEN 'C' ELSE 'D/E' END AS ip_class,
           (o1 = 10) OR (o1 = 172 AND o2 BETWEEN 16 AND 31)
             OR (o1 = 192 AND o2 = 168) AS is_private,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(count(DISTINCT slash16) AS BIGINT) AS n_slash16
    FROM oct GROUP BY 1, 2
    """,
    "Network-address profiling (the reference's INET ip_address "
    "column — PROJECT_DOCUMENTATION.md:162 — carried as a plain "
    "integer/string): per-user IPv4 synthesized by a deterministic "
    "Knuth multiplicative mix so both engines see identical "
    "addresses, then octet extraction, classful A/B/C bucketing, "
    "RFC-1918 private-range detection, and /16 CIDR cardinality per "
    "bucket — all pure integer arithmetic after one distinct-user "
    "pass. The shape of a bot/abuse network census at any scale.",
    ("functions", "network", "events"),
)
def ip_cidr_census(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    ips = e.select("user_id").distinct().select(
        "user_id",
        ((F.col("user_id") * F.lit(2654435761)) % F.lit(4294967296)).alias("ip"),
    )
    oct_ = ips.select(
        "user_id",
        F.floor(F.col("ip") / 16777216).cast("int").alias("o1"),
        (F.floor(F.col("ip") / 65536) % 256).cast("int").alias("o2"),
        F.floor(F.col("ip") / 65536).cast("long").alias("slash16"),
    )
    ip_class = (
        F.when(F.col("o1") < 128, "A")
        .when(F.col("o1") < 192, "B")
        .when(F.col("o1") < 224, "C")
        .otherwise("D/E")
    )
    is_private = (
        (F.col("o1") == 10)
        | ((F.col("o1") == 172) & F.col("o2").between(16, 31))
        | ((F.col("o1") == 192) & (F.col("o2") == 168))
    )
    return (
        oct_.select(ip_class.alias("ip_class"), is_private.alias("is_private"), "slash16")
        .groupBy("ip_class", "is_private")
        .agg(
            F.count("*").alias("n_users"),
            F.countDistinct("slash16").alias("n_slash16"),
        )
    )
