"""Round-2 (cont.) registry additions — community detection, corpus
growth laws, burstiness, multi-touch attribution, and decision-tree
split screening.

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
# Label propagation communities on the nation trade graph
# ---------------------------------------------------------------------------

_LPA_ROUNDS = 4


def _lpa_oracle(tail: str | None = None) -> str:
    """Unrolled synchronous label-propagation CTE chain (same shape as
    the pagerank oracle): each round every node adopts the label with
    the greatest incident edge weight among its neighbors' current
    labels (tie → smallest label), starting from label = own id.
    ``tail`` replaces the final SELECT (it sees lab{N} and sym) so
    derived metrics (modularity) can reuse the identical chain."""
    sql = """
    WITH edges_raw AS (
      SELECT c.c_nationkey AS u, s.s_nationkey AS v,
             CAST(count(*) AS BIGINT) AS w
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE c.c_nationkey <> s.s_nationkey
      GROUP BY 1, 2
    ),
    edges AS (
      SELECT u, v, w FROM edges_raw
      UNION ALL
      SELECT v, u, w FROM edges_raw
    ),
    sym AS MATERIALIZED (
      SELECT u, v, CAST(sum(w) AS BIGINT) AS w FROM edges GROUP BY 1, 2
    ),
    lab0 AS (SELECT DISTINCT u AS node, u AS label FROM sym)
    """
    for r in range(1, _LPA_ROUNDS + 1):
        sql += f""",
    vote{r} AS (
      SELECT s.u AS node, l.label,
             CAST(sum(s.w) AS BIGINT) AS wt
      FROM sym s JOIN lab{r - 1} l ON l.node = s.v
      GROUP BY 1, 2
    ),
    lab{r} AS MATERIALIZED (
      SELECT node, label FROM (
        SELECT node, label,
               row_number() OVER (PARTITION BY node
                                  ORDER BY wt DESC, label ASC) AS rk
        FROM vote{r}
      ) WHERE rk = 1
    )
    """
    if tail is not None:
        return sql + tail
    sql += f"""
    SELECT CAST(node AS INTEGER) AS nationkey,
           CAST(label AS INTEGER) AS community
    FROM lab{_LPA_ROUNDS}
    """
    return sql


@_register(
    "label_propagation_nations",
    _lpa_oracle(),
    "Community detection by synchronous label propagation on the "
    "weighted nation-to-nation trade graph (customer nation ↔ "
    "supplier nation, edge weight = shared lineitems): 4 fixed "
    "rounds, every node adopting the neighbor label with the largest "
    "incident weight (tie → smallest label) — fully deterministic, "
    "unlike the async random-order LPA. Each round is one edges-keyed "
    "join + one (node,label) aggregate + one argmax window, the same "
    "bounded-round pattern as the pagerank/k-core operators; the "
    "oracle unrolls the identical recurrence as a CTE chain. Edge "
    "weights and votes are exact integers, so every round is "
    "bit-deterministic at any parallelism.",
    ("graph", "community", "lineitem"),
)
def label_propagation_nations(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    raw = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, F.col("o_custkey") == c.c_custkey)
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .groupBy(
            F.col("c_nationkey").alias("u"), F.col("s_nationkey").alias("v")
        )
        .agg(F.count("*").alias("w"))
    )
    sym = (
        raw.select("u", "v", "w")
        .unionAll(raw.select(F.col("v").alias("u"), F.col("u").alias("v"), "w"))
        .groupBy("u", "v")
        .agg(F.sum("w").alias("w"))
    )
    # 25 nodes / ~600 integer-weighted edges after one fact scan: the
    # 4 fixed LPA rounds ran distributed (broadcast join + window per
    # round — a dozen tiny stage-jobs of scheduling at any input
    # size, measured round 8). All-integer votes with a total-order
    # tie-break (weight desc, label asc) make the driver loop
    # bit-exact by construction.
    adj: dict[int, list[tuple[int, int]]] = {}
    for row in sym.collect():
        adj.setdefault(row["u"], []).append((row["v"], row["w"]))
    labels = {u: u for u in adj}
    for _ in range(_LPA_ROUNDS):
        nxt = {}
        for u, nbrs in adj.items():
            wt: dict[int, int] = {}
            for v, w in nbrs:
                lbl = labels[v]
                wt[lbl] = wt.get(lbl, 0) + w
            nxt[u] = min(wt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        labels = nxt
    return spark.createDataFrame(
        sorted(labels.items()), "nationkey int, community int"
    )


# ---------------------------------------------------------------------------
# Vocabulary growth curve + Heaps'-law slope
# ---------------------------------------------------------------------------

_HEAPS_BUCKETS = 10


@_register(
    "vocab_growth_heaps_documents",
    f"""
    WITH tok AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                t -> t <> '')) AS token
      FROM documents
    ),
    bounds AS (
      SELECT min(doc_id) AS lo, max(doc_id) + 1 AS hi FROM tok
    ),
    bucketed AS (
      SELECT CAST(least(floor(({_HEAPS_BUCKETS} * (doc_id - lo))
                              / (hi - lo)),
                        {_HEAPS_BUCKETS - 1}) AS INTEGER) AS bucket,
             token
      FROM tok CROSS JOIN bounds
    ),
    per_bucket AS (
      SELECT bucket, CAST(count(*) AS BIGINT) AS n_tok FROM bucketed GROUP BY 1
    ),
    first_seen AS (
      SELECT min(bucket) AS bucket, token FROM bucketed GROUP BY token
    ),
    new_vocab AS (
      SELECT bucket, CAST(count(*) AS BIGINT) AS n_new
      FROM first_seen GROUP BY 1
    ),
    cum AS (
      SELECT p.bucket,
             CAST(sum(p.n_tok) OVER (ORDER BY p.bucket) AS BIGINT) AS cum_tokens,
             CAST(sum(coalesce(v.n_new, 0)) OVER (ORDER BY p.bucket) AS BIGINT)
               AS cum_vocab
      FROM per_bucket p LEFT JOIN new_vocab v USING (bucket)
    ),
    pts AS (
      SELECT bucket, cum_tokens, cum_vocab,
             log2(CAST(cum_tokens AS DOUBLE)) AS x,
             log2(CAST(cum_vocab AS DOUBLE)) AS y
      FROM cum
    ),
    folds AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             list_reduce(list_prepend(0.0, list(x ORDER BY bucket)),
                         (a, e) -> a + e) AS sx,
             list_reduce(list_prepend(0.0, list(y ORDER BY bucket)),
                         (a, e) -> a + e) AS sy,
             list_reduce(list_prepend(0.0, list(x * x ORDER BY bucket)),
                         (a, e) -> a + e) AS sxx,
             list_reduce(list_prepend(0.0, list(x * y ORDER BY bucket)),
                         (a, e) -> a + e) AS sxy
      FROM pts
    )
    SELECT p.bucket, p.cum_tokens, p.cum_vocab,
           floor(p.x * 1000000 + 0.5) / 1000000.0 AS log2_tokens,
           floor(p.y * 1000000 + 0.5) / 1000000.0 AS log2_vocab,
           floor((f.sxy - f.sx * (f.sy / f.k))
                 / (f.sxx - f.sx * (f.sx / f.k)) * 1000000 + 0.5) / 1000000.0
             AS heaps_beta
    FROM pts p CROSS JOIN folds f
    """,
    "Vocabulary growth curve + Heaps'-law exponent: documents split "
    "into 10 doc_id-range buckets, per-bucket cumulative token and "
    "distinct-vocabulary counts (a token's bucket of FIRST appearance "
    "via min-bucket — one vocab-sized aggregate, no rescans), then "
    "the Heaps β as the log-log regression slope computed from "
    "bucket-ordered left-to-right folds so both engines sum the same "
    "10 doubles in the same order. Sub-linear β (≈0.4–0.6 for natural "
    "text) is the corpus-health / dedup-sanity signal; a β near 1 "
    "flags synthetic or ID-riddled text. Facts shuffle once "
    "(token-keyed); everything after is buckets-sized.",
    ("text-quality", "corpus", "documents"),
)
def vocab_growth_heaps_documents(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda t: t != ""
            )
        ).alias("token"),
    )
    bounds = tok.agg(
        F.min("doc_id").alias("lo"), (F.max("doc_id") + 1).alias("hi")
    )
    bucketed = tok.crossJoin(F.broadcast(bounds)).select(
        F.least(
            F.floor(
                (F.lit(_HEAPS_BUCKETS) * (F.col("doc_id") - F.col("lo")))
                / (F.col("hi") - F.col("lo"))
            ),
            F.lit(_HEAPS_BUCKETS - 1).cast("long"),
        )
        .cast("int")
        .alias("bucket"),
        "token",
    )
    per_bucket = bucketed.groupBy("bucket").agg(F.count("*").alias("n_tok"))
    first_seen = bucketed.groupBy("token").agg(F.min("bucket").alias("bucket"))
    new_vocab = first_seen.groupBy("bucket").agg(F.count("*").alias("n_new"))
    w = Window.orderBy("bucket")
    cum = (
        per_bucket.join(new_vocab, "bucket", "left")
        .select(
            "bucket",
            F.sum("n_tok").over(w).alias("cum_tokens"),
            F.sum(F.coalesce(F.col("n_new"), F.lit(0))).over(w).alias("cum_vocab"),
        )
    )
    pts = cum.select(
        "bucket",
        "cum_tokens",
        "cum_vocab",
        F.log2(F.col("cum_tokens").cast("double")).alias("x"),
        F.log2(F.col("cum_vocab").cast("double")).alias("y"),
    )

    def _fold(expr_col):
        return F.aggregate(
            F.array_sort(
                F.collect_list(F.struct(F.col("bucket"), expr_col.alias("v")))
            ),
            F.lit(0.0),
            lambda a, x: a + x["v"],
        )

    folds = pts.agg(
        F.count("*").alias("k"),
        _fold(F.col("x")).alias("sx"),
        _fold(F.col("y")).alias("sy"),
        _fold(F.col("x") * F.col("x")).alias("sxx"),
        _fold(F.col("x") * F.col("y")).alias("sxy"),
    )
    beta = (F.col("sxy") - F.col("sx") * (F.col("sy") / F.col("k"))) / (
        F.col("sxx") - F.col("sx") * (F.col("sx") / F.col("k"))
    )
    return pts.crossJoin(F.broadcast(folds)).select(
        "bucket",
        F.col("cum_tokens").cast("long").alias("cum_tokens"),
        F.col("cum_vocab").cast("long").alias("cum_vocab"),
        _r6(F.col("x")).alias("log2_tokens"),
        _r6(F.col("y")).alias("log2_vocab"),
        _r6(beta).alias("heaps_beta"),
    )


# ---------------------------------------------------------------------------
# Burstiness (Fano factor) of hourly arrivals per event type
# ---------------------------------------------------------------------------

@_register(
    "fano_burstiness_by_type",
    """
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    m AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_hours,
             CAST(sum(c) AS BIGINT) AS s1,
             CAST(sum(c * c) AS BIGINT) AS s2
      FROM hourly GROUP BY 1
    )
    SELECT event_type, n_hours,
           s1 AS n_events,
           floor(s1 / n_hours * 10000 + 0.5) / 10000.0 AS mean_per_hour,
           floor((s2 - s1 * (s1 / n_hours)) / (n_hours - 1) * 10000 + 0.5)
             / 10000.0 AS var_per_hour,
           floor(((s2 - s1 * (s1 / n_hours)) / (n_hours - 1))
                 / (s1 / n_hours) * 1000000 + 0.5) / 1000000.0 AS fano
    FROM m WHERE n_hours > 1
    """,
    "Burstiness screen: the Fano factor (index of dispersion, "
    "variance/mean of hourly arrival counts) per event type over its "
    "OBSERVED hours — ≈1 for Poisson traffic, ≫1 for bursty/bot "
    "traffic, <1 for rate-limited flows. Two map-side-combined "
    "aggregates (facts → hourly cells → per-type exact integer "
    "moments n, Σc, Σc²); every emitted double is one pinned IEEE "
    "expression over those integers.",
    ("stats", "timeseries", "events"),
)
def fano_burstiness_by_type(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.count("*").alias("c"))
    m = (
        hourly.groupBy("event_type")
        .agg(
            F.count("*").alias("n_hours"),
            F.sum("c").alias("s1"),
            F.sum(F.col("c").cast("decimal(20,0)") * F.col("c")).alias("s2"),
        )
        .filter(F.col("n_hours") > 1)
    )
    mean = F.col("s1") / F.col("n_hours")
    var = (F.col("s2") - F.col("s1") * (F.col("s1") / F.col("n_hours"))) / (
        F.col("n_hours") - 1
    )
    r4 = lambda c: F.floor(c * 10000 + F.lit(0.5)) / F.lit(10000.0)  # noqa: E731
    return m.select(
        "event_type",
        F.col("n_hours").cast("long").alias("n_hours"),
        F.col("s1").cast("long").alias("n_events"),
        r4(mean).alias("mean_per_hour"),
        r4(var).alias("var_per_hour"),
        _r6(var / mean).alias("fano"),
    )


# ---------------------------------------------------------------------------
# U-shaped (position-based) multi-touch attribution
# ---------------------------------------------------------------------------

_ATTR_WINDOW_DAYS = 7
_ATTR_EDGE_MICRO = 400000  # first and last touch: 40% each
_ATTR_MID_MICRO = 200000  # middle touches split the remaining 20%


@_register(
    "attribution_position_based",
    f"""
    WITH purchases AS (
      SELECT event_id AS pid, user_id, ts AS pts
      FROM events WHERE event_type = 'purchase'
    ),
    touches AS (
      SELECT p.pid, e.event_type AS channel, e.ts, e.event_id,
             row_number() OVER (PARTITION BY p.pid
                                ORDER BY e.ts, e.event_id) AS pos,
             count(*) OVER (PARTITION BY p.pid) AS k
      FROM purchases p
      JOIN events e
        ON e.user_id = p.user_id
       AND e.event_type IN ('view', 'click')
       AND e.ts < p.pts
       AND e.ts >= p.pts - INTERVAL {_ATTR_WINDOW_DAYS} DAY
    ),
    credited AS (
      SELECT channel,
             CASE WHEN k = 1 THEN 1000000
                  WHEN k = 2 THEN 500000
                  WHEN pos = 1 OR pos = k THEN {_ATTR_EDGE_MICRO}
                  ELSE CAST({_ATTR_MID_MICRO} // (k - 2) AS BIGINT)
             END AS micro
      FROM touches
    )
    SELECT channel,
           CAST(count(*) AS BIGINT) AS n_touches,
           CAST(sum(micro) AS BIGINT) AS credit_micro
    FROM credited GROUP BY channel
    """,
    "U-shaped (position-based) multi-touch attribution: every "
    "purchase distributes 1.0 of credit over its view/click touches "
    "in the prior 7 days — 40% to the first touch, 40% to the last, "
    "the middle 20% split evenly (k=1 → 100%, k=2 → 50/50). Credits "
    "are INTEGER micro-units (floor-divided for middles) so per-"
    "channel totals are exact integer sums — no float-order hazard at "
    "any parallelism. The touch join is user-keyed with a 7-day time "
    "bound (co-partitioned, never a cross product); position/k come "
    "from one per-purchase window. Complements the last-touch "
    "operator (`attribution_last_touch`).",
    ("attribution", "window", "events"),
)
def attribution_position_based(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("puser"),
        F.col("ts").alias("pts"),
    )
    touches = (
        e.filter(F.col("event_type").isin("view", "click"))
        .join(
            purchases,
            (F.col("user_id") == F.col("puser"))
            & (F.col("ts") < F.col("pts"))
            & (
                F.col("ts")
                >= F.col("pts") - F.expr(f"INTERVAL {_ATTR_WINDOW_DAYS} DAYS")
            ),
        )
        .select(
            "pid", F.col("event_type").alias("channel"), "ts", "event_id"
        )
    )
    wpos = Window.partitionBy("pid").orderBy("ts", "event_id")
    wk = Window.partitionBy("pid")
    credited = touches.select(
        "channel",
        F.row_number().over(wpos).alias("pos"),
        F.count("*").over(wk).alias("k"),
    ).select(
        "channel",
        F.when(F.col("k") == 1, 1000000)
        .when(F.col("k") == 2, 500000)
        .when(
            (F.col("pos") == 1) | (F.col("pos") == F.col("k")), _ATTR_EDGE_MICRO
        )
        .otherwise(
            F.floor(F.lit(_ATTR_MID_MICRO) / (F.col("k") - 2)).cast("long")
        )
        .alias("micro"),
    )
    return credited.groupBy("channel").agg(
        F.count("*").alias("n_touches"),
        F.sum("micro").cast("long").alias("credit_micro"),
    )


# ---------------------------------------------------------------------------
# Decision-tree split screening: Gini impurity over decile thresholds
# ---------------------------------------------------------------------------

@_register(
    "gini_split_screen_documents",
    """
    WITH base AS (
      SELECT n_chars,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      FROM documents
    ),
    arr AS (
      SELECT list(n_chars ORDER BY n_chars) AS xs,
             CAST(count(*) AS BIGINT) AS n
      FROM base
    ),
    cand AS (
      SELECT DISTINCT xs[CAST(greatest(1, (i * n) // 10) AS BIGINT)] AS thr
      FROM arr CROSS JOIN (SELECT unnest(range(1, 10)) AS i)
    ),
    split AS (
      SELECT c.thr,
             CAST(count(*) FILTER (WHERE b.n_chars <= c.thr) AS BIGINT) AS nl,
             CAST(sum(b.y) FILTER (WHERE b.n_chars <= c.thr) AS BIGINT) AS yl,
             CAST(count(*) FILTER (WHERE b.n_chars > c.thr) AS BIGINT) AS nr,
             CAST(sum(b.y) FILTER (WHERE b.n_chars > c.thr) AS BIGINT) AS yr,
             CAST(count(*) AS BIGINT) AS n
      FROM base b CROSS JOIN cand c
      GROUP BY c.thr
    )
    SELECT CAST(thr AS BIGINT) AS threshold, nl AS n_left, nr AS n_right,
           floor(((nl / CAST(n AS DOUBLE))
                  * (1 - (yl / CAST(nl AS DOUBLE)) * (yl / CAST(nl AS DOUBLE))
                       - ((nl - yl) / CAST(nl AS DOUBLE))
                         * ((nl - yl) / CAST(nl AS DOUBLE)))
                + (nr / CAST(n AS DOUBLE))
                  * (1 - (yr / CAST(nr AS DOUBLE)) * (yr / CAST(nr AS DOUBLE))
                       - ((nr - yr) / CAST(nr AS DOUBLE))
                         * ((nr - yr) / CAST(nr AS DOUBLE))))
                 * 1000000 + 0.5) / 1000000.0 AS weighted_gini
    FROM split
    WHERE nl > 0 AND nr > 0
    """,
    "Decision-tree split screening: candidate thresholds = the 9 "
    "deciles of n_chars (exact order statistics by sorted-array "
    "indexing, the repo-standard percentile_disc idiom), each scored "
    "by the weighted Gini impurity of the (lang='en') target it "
    "induces. The candidate grid broadcasts against ONE scan of the "
    "base table (9 conditional-count cells per row, map-side "
    "combined) — the inner loop of distributed tree training "
    "expressed as a single multi-aggregate pass. All cells are exact "
    "integers; the impurity is one pinned IEEE expression.",
    ("ml-prep", "stats", "documents"),
)
def gini_split_screen_documents(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    base = d.select(
        "n_chars", F.when(F.col("lang") == "en", 1).otherwise(0).alias("y")
    )
    arr = base.agg(
        F.array_sort(F.collect_list("n_chars")).alias("xs"),
        F.count("*").alias("n"),
    )
    idx = F.explode(F.sequence(F.lit(1), F.lit(9))).alias("i")
    cand = (
        arr.select("xs", "n", idx)
        .select(
            F.element_at(
                F.col("xs"),
                F.greatest(
                    F.lit(1), F.floor(F.col("i") * F.col("n") / 10)
                ).cast("int"),
            ).alias("thr")
        )
        .distinct()
    )
    split = (
        base.crossJoin(F.broadcast(cand))
        .groupBy("thr")
        .agg(
            F.sum(F.when(F.col("n_chars") <= F.col("thr"), 1).otherwise(0)).alias(
                "nl"
            ),
            F.sum(F.when(F.col("n_chars") <= F.col("thr"), F.col("y")).otherwise(0))
            .alias("yl"),
            F.sum(F.when(F.col("n_chars") > F.col("thr"), 1).otherwise(0)).alias(
                "nr"
            ),
            F.sum(F.when(F.col("n_chars") > F.col("thr"), F.col("y")).otherwise(0))
            .alias("yr"),
            F.count("*").alias("n"),
        )
        .filter((F.col("nl") > 0) & (F.col("nr") > 0))
    )
    nd = F.col("n").cast("double")
    nld = F.col("nl").cast("double")
    nrd = F.col("nr").cast("double")
    pl = F.col("yl") / nld
    ql = (F.col("nl") - F.col("yl")) / nld
    pr = F.col("yr") / nrd
    qr = (F.col("nr") - F.col("yr")) / nrd
    gini = (F.col("nl") / nd) * (1 - pl * pl - ql * ql) + (F.col("nr") / nd) * (
        1 - pr * pr - qr * qr
    )
    return split.select(
        F.col("thr").cast("long").alias("threshold"),
        F.col("nl").cast("long").alias("n_left"),
        F.col("nr").cast("long").alias("n_right"),
        _r6(gini).alias("weighted_gini"),
    )
