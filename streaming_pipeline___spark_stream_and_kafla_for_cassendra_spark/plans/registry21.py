"""Round-3 registry additions, batch 8 — KMV (k-minimum-values)
distinct sketch with set-operation estimates, and the Hurst R/S
long-range-dependence exponent.

Same contract as ``registry.py``. Imported at the bottom of
``registry.py``.
"""

from __future__ import annotations

import math

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import _register, _t


def _r6(col):
    return F.floor(col * 1000000 + F.lit(0.5)) / F.lit(1000000.0)


# ---------------------------------------------------------------------------
# KMV distinct sketch: per-type estimates + union/intersection of two types
# ---------------------------------------------------------------------------

_KMV_K = 256
_KMV_SPACE = float(2 ** 60)  # 15 hex chars of md5 → [0, 2^60)
_KMV_PAIR = ("view", "click")


@_register(
    "kmv_distinct_union_events",
    f"""
    WITH du AS (
      SELECT DISTINCT event_type, user_id FROM events
    ),
    hashed AS (
      SELECT event_type,
             CAST(CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                       AS UBIGINT) AS BIGINT) AS h
      FROM du
    ),
    sketch AS (
      SELECT event_type, h FROM (
        SELECT event_type, h,
               row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
        FROM hashed
      ) WHERE rn <= {_KMV_K}
    ),
    per_type AS (
      SELECT event_type AS key,
             CAST(count(*) AS BIGINT) AS n_sketch,
             CAST(max(h) AS BIGINT) AS h_k,
             CASE WHEN count(*) < {_KMV_K}
                  THEN CAST(count(*) AS DOUBLE)
                  ELSE ({_KMV_K} - 1) * {_KMV_SPACE!r} / max(h)
             END AS est
      FROM sketch GROUP BY 1
    ),
    exact AS (
      SELECT event_type AS key, CAST(count(*) AS BIGINT) AS exact_distinct
      FROM du GROUP BY 1
    ),
    mergedsk AS (
      SELECT h, CAST(count(*) AS BIGINT) AS in_both FROM (
        SELECT DISTINCT event_type, h FROM sketch
        WHERE event_type IN ('{_KMV_PAIR[0]}', '{_KMV_PAIR[1]}')
      ) GROUP BY h
    ),
    mergedk AS (
      SELECT h, in_both FROM (
        SELECT h, in_both, row_number() OVER (ORDER BY h) AS rn
        FROM mergedsk
      ) WHERE rn <= {_KMV_K}
    ),
    union_est AS (
      SELECT CAST(count(*) AS BIGINT) AS n_sketch,
             CAST(max(h) AS BIGINT) AS h_k,
             CASE WHEN count(*) < {_KMV_K}
                  THEN CAST(count(*) AS DOUBLE)
                  ELSE ({_KMV_K} - 1) * {_KMV_SPACE!r} / max(h)
             END AS est,
             CAST(sum(CASE WHEN in_both = 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS k_in_both
      FROM mergedk
    ),
    union_exact AS (
      SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
      FROM events
      WHERE event_type IN ('{_KMV_PAIR[0]}', '{_KMV_PAIR[1]}')
    ),
    inter_exact AS (
      SELECT CAST(count(*) AS BIGINT) AS exact_distinct FROM (
        SELECT user_id FROM du
        WHERE event_type IN ('{_KMV_PAIR[0]}', '{_KMV_PAIR[1]}')
        GROUP BY user_id HAVING count(*) = 2
      )
    )
    SELECT p.key, p.n_sketch, p.h_k,
           floor(p.est * 100 + 0.5) / 100.0 AS est_distinct,
           e.exact_distinct
    FROM per_type p JOIN exact e ON e.key = p.key
    UNION ALL
    SELECT '{_KMV_PAIR[0]} UNION {_KMV_PAIR[1]}', u.n_sketch, u.h_k,
           floor(u.est * 100 + 0.5) / 100.0, x.exact_distinct
    FROM union_est u CROSS JOIN union_exact x
    UNION ALL
    SELECT '{_KMV_PAIR[0]} INTERSECT {_KMV_PAIR[1]}', u.k_in_both, u.h_k,
           floor(CAST(u.k_in_both AS DOUBLE) / u.n_sketch * u.est * 100
                 + 0.5) / 100.0,
           i.exact_distinct
    FROM union_est u CROSS JOIN inter_exact i
    """,
    "KMV (k-minimum-values / theta-sketch) distinct counting with "
    "SET OPERATIONS — the mergeable-sketch capability HLL lacks: "
    "per event type keep the k=256 smallest 60-bit md5 hashes of "
    "user_id (exact integers, so the sketch is bit-identical in "
    "both engines), estimate distinct as (k-1)*2^60/h_k (exact "
    "count when the type has fewer than k users); merging two "
    "sketches and re-truncating to k gives the union estimate, and "
    "the fraction of merged minima present in BOTH sketches gives "
    "Jaccard -> intersection, with exact distincts alongside for "
    "error audit. Two-stage top-k per type (per-partition minima, "
    "then merge) — the sketch is k-sized per type, the union pass "
    "touches 2k rows; nothing global ever sorts the fact table.",
    ("sketch", "distinct", "set-ops", "events"),
)
def kmv_distinct_union_events(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    du = e.select("event_type", "user_id").distinct().localCheckpoint(
        eager=False
    )
    h = (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string").cast("binary")), 1, 15),
            16,
            10,
        ).cast("long")
    )
    hashed = du.select("event_type", h.alias("h"))
    wk = Window.partitionBy("event_type").orderBy("h")
    sketch = (
        hashed.select("event_type", "h", F.row_number().over(wk).alias("rn"))
        .filter(F.col("rn") <= _KMV_K)
        .drop("rn")
        .localCheckpoint(eager=False)
    )
    est_expr = F.when(
        F.count("*") < _KMV_K, F.count("*").cast("double")
    ).otherwise(F.lit(float(_KMV_K - 1)) * F.lit(_KMV_SPACE) / F.max("h"))
    per_type = sketch.groupBy(F.col("event_type").alias("key")).agg(
        F.count("*").alias("n_sketch"),
        F.max("h").cast("long").alias("h_k"),
        est_expr.alias("est"),
    )
    exact = du.groupBy(F.col("event_type").alias("key")).agg(
        F.count("*").alias("exact_distinct")
    )
    r2 = lambda c: F.floor(c * 100 + F.lit(0.5)) / F.lit(100.0)  # noqa: E731
    typed = per_type.join(exact, "key").select(
        "key",
        F.col("n_sketch").cast("long").alias("n_sketch"),
        "h_k",
        r2(F.col("est")).alias("est_distinct"),
        F.col("exact_distinct").cast("long").alias("exact_distinct"),
    )
    pair = sketch.filter(F.col("event_type").isin(*_KMV_PAIR))
    mergedsk = (
        pair.select("event_type", "h")
        .distinct()
        .groupBy("h")
        .agg(F.count("*").alias("in_both"))
    )
    wm = Window.orderBy("h")
    mergedk = (
        mergedsk.select("h", "in_both", F.row_number().over(wm).alias("rn"))
        .filter(F.col("rn") <= _KMV_K)
    )
    union_est = mergedk.agg(
        F.count("*").alias("n_sketch"),
        F.max("h").cast("long").alias("h_k"),
        est_expr.alias("est"),
        F.sum(F.when(F.col("in_both") == 2, 1).otherwise(0)).alias(
            "k_in_both"
        ),
    )
    union_exact = (
        e.filter(F.col("event_type").isin(*_KMV_PAIR))
        .agg(F.countDistinct("user_id").alias("exact_distinct"))
    )
    inter_exact = (
        du.filter(F.col("event_type").isin(*_KMV_PAIR))
        .groupBy("user_id")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") == 2)
        .agg(F.count("*").alias("exact_distinct"))
    )
    urow = union_est.crossJoin(union_exact).select(
        F.lit(f"{_KMV_PAIR[0]} UNION {_KMV_PAIR[1]}").alias("key"),
        F.col("n_sketch").cast("long").alias("n_sketch"),
        "h_k",
        r2(F.col("est")).alias("est_distinct"),
        F.col("exact_distinct").cast("long").alias("exact_distinct"),
    )
    irow = union_est.crossJoin(inter_exact).select(
        F.lit(f"{_KMV_PAIR[0]} INTERSECT {_KMV_PAIR[1]}").alias("key"),
        F.col("k_in_both").cast("long").alias("n_sketch"),
        "h_k",
        r2(
            F.col("k_in_both").cast("double")
            / F.col("n_sketch")
            * F.col("est")
        ).alias("est_distinct"),
        F.col("exact_distinct").cast("long").alias("exact_distinct"),
    )
    return typed.unionAll(urow).unionAll(irow)


# ---------------------------------------------------------------------------
# Hurst exponent via rescaled-range (R/S) analysis of daily revenue
# ---------------------------------------------------------------------------

_HURST_NS = (16, 32, 64, 128, 256)
_HURST_LN_N = {n: math.log(float(n)) for n in _HURST_NS}


def _hurst_block_sql(n):
    return f"""
    SELECT {n} AS block_n, blk,
           CAST(count(*) AS BIGINT) AS cnt,
           CAST(sum(kd) AS BIGINT) AS s,
           CAST(sum(kd * kd) AS BIGINT) AS q,
           CAST(max({n} * cums - idx * tot) AS BIGINT) AS devmax,
           CAST(min({n} * cums - idx * tot) AS BIGINT) AS devmin
    FROM (
      SELECT blk, kd, idx,
             sum(kd) OVER (PARTITION BY blk ORDER BY idx
                           ROWS UNBOUNDED PRECEDING) AS cums,
             sum(kd) OVER (PARTITION BY blk) AS tot
      FROM (
        SELECT (i - 1) // {n} AS blk, ((i - 1) % {n}) + 1 AS idx, kd
        FROM series
      )
    ) GROUP BY 1, 2 HAVING count(*) = {n}
    """


@_register(
    "hurst_rs_daily_revenue",
    f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(floor(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                        / 100000) AS BIGINT) AS kd
      FROM orders GROUP BY 1
    ),
    series AS (
      SELECT row_number() OVER (ORDER BY day) AS i, kd FROM daily
    ),
    blocks AS (
      {" UNION ALL ".join(_hurst_block_sql(n) for n in _HURST_NS)}
    ),
    rs AS (
      SELECT block_n,
             CAST(count(*) AS BIGINT) AS n_blocks,
             CAST(sum(CAST(floor(
               CAST(devmax - devmin AS DOUBLE)
               / sqrt(CAST(block_n * q - s * s AS DOUBLE))
               * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS sum_rs_micro
      FROM blocks
      WHERE block_n * q - s * s > 0
      GROUP BY 1
    ),
    pivoted AS (
      SELECT {", ".join(
          f"max(CASE WHEN block_n = {n} THEN "
          f"ln(CAST(sum_rs_micro AS DOUBLE) / (CAST(n_blocks AS DOUBLE)"
          f" * 1000000.0)) END) AS y{n}"
          for n in _HURST_NS)}
      FROM rs
    ),
    fit AS (
      SELECT ({len(_HURST_NS)}.0 * ({" + ".join(
                f"{_HURST_LN_N[n]!r} * y{n}" for n in _HURST_NS)})
              - ({" + ".join(f"{_HURST_LN_N[n]!r}" for n in _HURST_NS)})
                * ({" + ".join(f"y{n}" for n in _HURST_NS)}))
             / ({len(_HURST_NS)}.0 * ({" + ".join(
                  f"{_HURST_LN_N[n]!r} * {_HURST_LN_N[n]!r}"
                  for n in _HURST_NS)})
                - ({" + ".join(f"{_HURST_LN_N[n]!r}" for n in _HURST_NS)})
                  * ({" + ".join(
                      f"{_HURST_LN_N[n]!r}" for n in _HURST_NS)}))
             AS hurst
      FROM pivoted
    )
    SELECT r.block_n, r.n_blocks,
           floor(CAST(r.sum_rs_micro AS DOUBLE)
                 / (CAST(r.n_blocks AS DOUBLE) * 1000000.0)
                 * 1000000 + 0.5) / 1000000.0 AS mean_rs,
           floor(f.hurst * 1000000 + 0.5) / 1000000.0 AS hurst
    FROM rs r CROSS JOIN fit f
    """,
    "Hurst exponent via rescaled-range (R/S) analysis of the daily "
    "revenue series — the long-range-dependence / self-similarity "
    "diagnostic (H=0.5 random walk, H>0.5 persistent): for block "
    "sizes 16..256, per complete block the range of n-SCALED "
    "cumulative deviations (n*cumsum - k*total stays a pure "
    "integer — no float mean subtraction) over sqrt(n*sumsq - "
    "sum^2), i.e. R/S = integer / sqrt(integer), bit-identical "
    "across engines; per-block R/S is quantized to micro units so "
    "per-n means are order-free integer sums, and H is the 5-point "
    "OLS slope of ln(R/S) vs ln(n) with the ln(n) terms as compile-"
    "time literals in one fixed-order expression. Series units are "
    "kilodollars so sum-of-squares stays in int64 at any SF. All "
    "windows run on the days-sized rollup.",
    ("stats", "timeseries", "fractal", "orders"),
)
def hurst_rs_daily_revenue(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.floor(
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")) / 100000
        )
        .cast("long")
        .alias("kd")
    )
    series = daily.select(
        F.row_number().over(Window.orderBy("day")).alias("i"), "kd"
    ).localCheckpoint(eager=False)
    blocks = None
    for n in _HURST_NS:
        base = series.select(
            F.expr(f"(i - 1) div {n}").alias("blk"),
            (((F.col("i") - 1) % n) + 1).alias("idx"),
            "kd",
        )
        wcum = (
            Window.partitionBy("blk")
            .orderBy("idx")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        wtot = Window.partitionBy("blk")
        dev = n * F.sum("kd").over(wcum) - F.col("idx") * F.sum("kd").over(
            wtot
        )
        withdev = base.select(
            "blk", "kd", dev.alias("dev")
        )
        one = (
            withdev.groupBy("blk")
            .agg(
                F.count("*").alias("cnt"),
                F.sum("kd").alias("s"),
                F.sum(F.col("kd").cast("decimal(20,0)") * F.col("kd")).alias("q"),
                F.max("dev").alias("devmax"),
                F.min("dev").alias("devmin"),
            )
            .filter(F.col("cnt") == n)
            .select(
                F.lit(n).alias("block_n"),
                F.col("s").cast("long").alias("s"),
                F.col("q").cast("long").alias("q"),
                F.col("devmax").cast("long").alias("devmax"),
                F.col("devmin").cast("long").alias("devmin"),
            )
        )
        blocks = one if blocks is None else blocks.unionAll(one)
    rs_micro = F.floor(
        (F.col("devmax") - F.col("devmin")).cast("double")
        / F.sqrt((F.col("block_n") * F.col("q") - F.col("s") * F.col("s")).cast("double"))
        * 1000000
        + F.lit(0.5)
    ).cast("long")
    rs = (
        blocks.filter(
            F.col("block_n") * F.col("q") - F.col("s") * F.col("s") > 0
        )
        .select("block_n", rs_micro.alias("rsm"))
        .groupBy("block_n")
        .agg(
            F.count("*").alias("n_blocks"),
            F.sum("rsm").cast("long").alias("sum_rs_micro"),
        )
        .localCheckpoint(eager=False)
    )
    lnrs = {
        n: F.max(
            F.when(
                F.col("block_n") == n,
                F.log(
                    F.col("sum_rs_micro").cast("double")
                    / (F.col("n_blocks").cast("double") * 1000000.0)
                ),
            )
        )
        for n in _HURST_NS
    }
    piv = rs.agg(*[lnrs[n].alias(f"y{n}") for n in _HURST_NS])
    k = float(len(_HURST_NS))
    sxy = sum(
        (F.lit(_HURST_LN_N[n]) * F.col(f"y{n}") for n in _HURST_NS[1:]),
        F.lit(_HURST_LN_N[_HURST_NS[0]]) * F.col(f"y{_HURST_NS[0]}"),
    )
    sx = sum(_HURST_LN_N[n] for n in _HURST_NS)
    sy = sum(
        (F.col(f"y{n}") for n in _HURST_NS[1:]),
        F.col(f"y{_HURST_NS[0]}"),
    )
    sxx = sum(_HURST_LN_N[n] * _HURST_LN_N[n] for n in _HURST_NS)
    fit = piv.select(
        (
            (F.lit(k) * sxy - F.lit(sx) * sy)
            / (F.lit(k) * F.lit(sxx) - F.lit(sx) * F.lit(sx))
        ).alias("hurst")
    )
    return rs.crossJoin(fit).select(
        "block_n",
        F.col("n_blocks").cast("long").alias("n_blocks"),
        _r6(
            F.col("sum_rs_micro").cast("double")
            / (F.col("n_blocks").cast("double") * 1000000.0)
        ).alias("mean_rs"),
        _r6(F.col("hurst")).alias("hurst"),
    )


# ---------------------------------------------------------------------------
# TextRank keyword extraction over the token co-occurrence graph
# ---------------------------------------------------------------------------

_TR_ITERS = 8
_TR_VOCAB = 200
_TR_TOP = 30


def _textrank_oracle(iters: int = _TR_ITERS) -> str:
    """Unrolled TextRank twin (same discipline as the PageRank
    oracle: MATERIALIZED edge CTE, src-ordered list_reduce folds,
    DOUBLE-cast literals, one CTE layer per iteration)."""
    head = f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS l
      FROM documents
    ),
    flat AS (SELECT unnest(l) AS tok FROM toks),
    vocab AS MATERIALIZED (
      SELECT tok FROM (
        SELECT tok,
               row_number() OVER (ORDER BY count(*) DESC, tok ASC) AS rn
        FROM flat GROUP BY tok
      ) WHERE rn <= {_TR_VOCAB}
    ),
    pairs AS (
      SELECT unnest(list_transform(generate_series(1,
                      greatest(len(l) - 1, 0)), i -> l[i])) AS a,
             unnest(list_transform(generate_series(1,
                      greatest(len(l) - 1, 0)), i -> l[i + 1])) AS b
      FROM toks
    ),
    e AS MATERIALIZED (
      SELECT least(a, b) AS src, greatest(a, b) AS dst,
             CAST(count(*) AS BIGINT) AS w
      FROM pairs
      JOIN vocab va ON va.tok = a
      JOIN vocab vb ON vb.tok = b
      WHERE a <> b
      GROUP BY 1, 2
    ),
    adj AS MATERIALIZED (
      SELECT src AS u, dst AS v, w FROM e
      UNION ALL
      SELECT dst AS u, src AS v, w FROM e
    ),
    outw AS (SELECT u, CAST(sum(w) AS BIGINT) AS ow FROM adj GROUP BY 1),
    nodes AS (SELECT DISTINCT u AS node FROM adj),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
    r0 AS (SELECT node, CAST(1.0 AS DOUBLE) / nn.n AS r
           FROM nodes CROSS JOIN nn)"""
    layers = []
    for i in range(iters):
        layers.append(f"""
    r{i + 1} AS (
      SELECT nd.node,
             CAST(0.15 AS DOUBLE) / nn.n
               + CAST(0.85 AS DOUBLE) * coalesce(f.inc, 0.0) AS r
      FROM nodes nd CROSS JOIN nn
      LEFT JOIN (
        SELECT adj.v AS node,
               list_reduce(list_prepend(0.0,
                 list(p.r * adj.w / ow.ow ORDER BY adj.u)),
                 (x, y) -> x + y) AS inc
        FROM adj
        JOIN r{i} p ON p.node = adj.u
        JOIN outw ow ON ow.u = adj.u
        GROUP BY adj.v
      ) f ON f.node = nd.node
    )""")
    return (
        head
        + ","
        + ",".join(layers)
        + f""",
    degs AS (SELECT u, CAST(count(*) AS BIGINT) AS degree FROM adj
             GROUP BY 1)
    SELECT node AS token,
           floor(r{iters}.r * 1000000 + 0.5) / 1000000.0 AS textrank,
           d.degree, ow.ow AS cooc_weight
    FROM (
      SELECT node, r,
             row_number() OVER (ORDER BY r DESC, node ASC) AS rk
      FROM r{iters}
    ) r{iters}
    JOIN degs d ON d.u = r{iters}.node
    JOIN outw ow ON ow.u = r{iters}.node
    WHERE rk <= {_TR_TOP}
    """
    )


@_register(
    "textrank_keywords_documents",
    _textrank_oracle(),
    "TextRank keyword extraction (Mihalcea & Tarau): PageRank with "
    f"damping 0.85 / {_TR_ITERS} fixed iterations over the "
    "UNDIRECTED co-occurrence graph of adjacent tokens, restricted "
    f"to the corpus top-{_TR_VOCAB} vocabulary (count desc / token "
    "asc — selected via TakeOrdered partial top-k in Spark, never a "
    "global sort of the vocabulary), emitting the top "
    f"{_TR_TOP} keywords with score, degree and co-occurrence "
    "weight. Per-iteration plan is one adj⋈rank join + one v-keyed "
    "aggregate on a <=200-node graph (the fact-sized work is the "
    "single adjacency-pair scan, done once); incoming contributions "
    "fold in neighbor order so every double matches the unrolled-"
    "CTE DuckDB twin bit-for-bit. The graph-ranking companion to "
    "frequency-based `documents_top_tokens` / `tfidf_top_terms`.",
    ("graph", "text", "keywords", "iterative", "documents"),
)
def textrank_keywords_documents(spark, sf_dir):
    from ..operators.scale import spread_for_compute

    d = _t(spark, sf_dir, "documents")
    toks = spread_for_compute(d.select("text")).select(
        F.filter(
            F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda x: x != ""
        ).alias("l")
    ).localCheckpoint(eager=False)
    flat = toks.select(F.explode("l").alias("tok"))
    vocab = (
        flat.groupBy("tok")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("tok").asc())
        .limit(_TR_VOCAB)
        .select("tok")
        .localCheckpoint(eager=False)
    )
    idx = F.sequence(F.lit(1), F.greatest(F.size("l") - 1, F.lit(0)))
    pairs = toks.select(
        F.explode(
            F.arrays_zip(
                F.transform(idx, lambda i: F.element_at(F.col("l"), i)).alias(
                    "a"
                ),
                F.transform(
                    idx, lambda i: F.element_at(F.col("l"), i + 1)
                ).alias("b"),
            )
        ).alias("p")
    ).select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    e = (
        pairs.join(F.broadcast(vocab.select(F.col("tok").alias("a"))), "a")
        .join(F.broadcast(vocab.select(F.col("tok").alias("b"))), "b")
        .filter(F.col("a") != F.col("b"))
        .groupBy(
            F.least("a", "b").alias("src"), F.greatest("a", "b").alias("dst")
        )
        .agg(F.count("*").alias("w"))
        .localCheckpoint(eager=False)
    )
    # The co-occurrence graph is bounded by the top-_TR_VOCAB
    # vocabulary — ≤ vocab² integer edge weights, never corpus-sized.
    # The corpus-scale work (tokenize, pair explode, vocab top-k,
    # edge aggregate) stays in Spark above; the PageRank iterations
    # over the bounded graph used to run distributed (~50 tiny AQE
    # stage-jobs of scheduling overhead at any input size — measured
    # round 8) and are now a driver loop with the identical
    # u-sorted contribution fold, so every double is bit-identical
    # to the distributed form and the unrolled-CTE oracle.
    import math

    edges = [(r["src"], r["dst"], r["w"]) for r in e.collect()]
    adj_list: list[tuple[str, str, int]] = []
    for s_, d_, w_ in edges:
        adj_list.append((s_, d_, w_))
        adj_list.append((d_, s_, w_))
    outw: dict[str, int] = {}
    degs: dict[str, int] = {}
    incoming: dict[str, list[tuple[str, int]]] = {}
    for u, v, w_ in adj_list:
        outw[u] = outw.get(u, 0) + w_
        degs[u] = degs.get(u, 0) + 1
        incoming.setdefault(v, []).append((u, w_))
    nodes_l = sorted(outw)
    n_nodes = len(nodes_l)
    nf = float(n_nodes)
    rank = {u: 1.0 / nf for u in nodes_l}
    for _ in range(_TR_ITERS):
        nxt = {}
        for node in nodes_l:
            inc = 0.0
            for u, w_ in sorted(incoming.get(node, [])):
                inc = inc + rank[u] * w_ / outw[u]
            nxt[node] = 0.15 / nf + 0.85 * inc
        rank = nxt
    top = sorted(nodes_l, key=lambda u: (-rank[u], u))[:_TR_TOP]
    rows = [
        (
            u,
            math.floor(rank[u] * 1000000 + 0.5) / 1000000.0,
            degs[u],
            outw[u],
        )
        for u in top
    ]
    return spark.createDataFrame(
        rows,
        "token string, textrank double, degree long, cooc_weight long",
    )
