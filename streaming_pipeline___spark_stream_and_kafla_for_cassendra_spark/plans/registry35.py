"""Round-3 registry additions, batch 22 — LFU cache simulation (the
LRU comparison), rolling percentile rank of daily revenue, and a
KWIC concordance extraction.

Same contract as ``registry.py``. Imported at the bottom of
``registry.py``.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import _register, _t
from .registry4 import BLOCKLIST_WEIGHTS

# ---------------------------------------------------------------------------
# LFU cache hit-rate simulation (size 4) per customer segment
# ---------------------------------------------------------------------------

# acc = [p1, f1, p2, f2, p3, f3, p4, f4, hits]; -1 = empty slot.
# Hit: bump that slot's frequency. Miss: replace the slot with the
# minimum frequency (ties -> LOWEST slot index, which is also the
# longest-resident under this update rule) with (p, 1).
_LFU_HITPOS = (
    "(CASE WHEN acc[1] = x[1] THEN 1 WHEN acc[3] = x[1] THEN 2 "
    "WHEN acc[5] = x[1] THEN 3 WHEN acc[7] = x[1] THEN 4 ELSE 0 END)"
)
# victim slot on miss: first slot holding min(f1..f4); empty slots
# carry f = -1 so they are always chosen first
_LFU_MINF = "least(acc[2], acc[4], acc[6], acc[8])"
_LFU_VICTIM = (
    f"(CASE WHEN acc[2] = {_LFU_MINF} THEN 1 "
    f"WHEN acc[4] = {_LFU_MINF} THEN 2 "
    f"WHEN acc[6] = {_LFU_MINF} THEN 3 ELSE 4 END)"
)


def _lfu_slot_sql(s: int) -> str:
    p, f = 2 * s - 1, 2 * s
    return f"""
                 CASE WHEN {_LFU_HITPOS} = {s} THEN acc[{p}]
                      WHEN {_LFU_HITPOS} = 0 AND {_LFU_VICTIM} = {s}
                      THEN x[1] ELSE acc[{p}] END,
                 CASE WHEN {_LFU_HITPOS} = {s} THEN acc[{f}] + 1
                      WHEN {_LFU_HITPOS} = 0 AND {_LFU_VICTIM} = {s}
                      THEN 1 ELSE acc[{f}] END"""


@_register(
    "lfu_cache_hit_rate",
    f"""
    WITH acc_seq AS (
      SELECT o.o_custkey,
             list(l.l_partkey ORDER BY o.o_orderdate, o.o_orderkey,
                  l.l_linenumber, l.l_partkey) AS parts
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY 1
      HAVING count(*) >= 2
    ),
    folded AS (
      SELECT o_custkey, len(parts) AS n_acc,
             list_reduce(
               list_prepend([CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
                             CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
                             CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
                             CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
                             CAST(0 AS BIGINT)],
                 list_transform(parts, p -> [p, CAST(0 AS BIGINT),
                   CAST(0 AS BIGINT), CAST(0 AS BIGINT),
                   CAST(0 AS BIGINT), CAST(0 AS BIGINT),
                   CAST(0 AS BIGINT), CAST(0 AS BIGINT),
                   CAST(0 AS BIGINT)])),
               (acc, x) -> [
                 {",".join(_lfu_slot_sql(s) for s in (1, 2, 3, 4))},
                 acc[9] + CASE WHEN {_LFU_HITPOS} >= 1 THEN 1 ELSE 0 END
               ]) AS st
      FROM acc_seq
    ),
    seg AS (
      SELECT c.c_mktsegment AS segment,
             CAST(count(*) AS BIGINT) AS n_customers,
             CAST(sum(f.n_acc) AS BIGINT) AS n_accesses,
             CAST(sum(f.st[9]) AS BIGINT) AS n_hits
      FROM folded f JOIN customer c ON c.c_custkey = f.o_custkey
      GROUP BY 1
    )
    SELECT segment, n_customers, n_accesses, n_hits,
           CAST(n_hits * 1000000 // n_accesses AS BIGINT) AS hit_ppm
    FROM seg
    """,
    "LFU cache simulation over the identical per-customer access "
    "sequences as `lru_cache_hit_rate` — the policy A/B every cache "
    "tier ends up running: 4 slots carrying (item, frequency) "
    "pairs, hits bump the slot frequency, misses evict the minimum-"
    "frequency slot (empty slots carry f=-1 so they fill first; "
    "ties break to the lowest slot index — fully pinned, pure "
    "integers). Recency-favoring workloads beat LFU with LRU and "
    "frequency-skewed ones invert it, and because both policies "
    "replay the same sequences the ppm columns are directly "
    "comparable. Same custkey shuffle and segment rollup.",
    ("systems", "cache", "recurrence", "lineitem"),
)
def lfu_cache_hit_rate(spark, sf_dir):
    # NOT spread (r9 interleaved A/B: ~0.2-0.4 s slower with a round-
    # robin pre-exchange on the lineitem side — the collect_list
    # partials already parallelize after the join's keyed exchange)
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    c = _t(spark, sf_dir, "customer")
    seq = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_custkey")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        "o_orderdate", "o_orderkey", "l_linenumber",
                        "l_partkey",
                    )
                )
            ).alias("seq"),
            F.count("*").alias("n_acc"),
        )
        .filter(F.col("n_acc") >= 2)
    )
    parts = F.transform(F.col("seq"), lambda x: x["l_partkey"])
    init = F.struct(
        *[
            col
            for s in (1, 2, 3, 4)
            for col in (
                F.lit(-1).cast("long").alias(f"p{s}"),
                F.lit(-1).cast("long").alias(f"f{s}"),
            )
        ],
        F.lit(0).cast("long").alias("hits"),
    )

    def step(acc, p):
        hitpos = (
            F.when(acc["p1"] == p, 1)
            .when(acc["p2"] == p, 2)
            .when(acc["p3"] == p, 3)
            .when(acc["p4"] == p, 4)
            .otherwise(0)
        )
        minf = F.least(acc["f1"], acc["f2"], acc["f3"], acc["f4"])
        victim = (
            F.when(acc["f1"] == minf, 1)
            .when(acc["f2"] == minf, 2)
            .when(acc["f3"] == minf, 3)
            .otherwise(4)
        )
        fields = []
        for s in (1, 2, 3, 4):
            fields.append(
                F.when(hitpos == s, acc[f"p{s}"])
                .when((hitpos == 0) & (victim == s), p)
                .otherwise(acc[f"p{s}"])
                .alias(f"p{s}")
            )
            fields.append(
                F.when(hitpos == s, acc[f"f{s}"] + 1)
                .when((hitpos == 0) & (victim == s), F.lit(1).cast("long"))
                .otherwise(acc[f"f{s}"])
                .alias(f"f{s}")
            )
        fields.append(
            (acc["hits"] + F.when(hitpos >= 1, 1).otherwise(0)).alias("hits")
        )
        return F.struct(*fields)

    folded = seq.select(
        "o_custkey",
        "n_acc",
        F.aggregate(parts, init, step)["hits"].alias("hits"),
    )
    segd = (
        folded.join(c, folded.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").alias("n_customers"),
            F.sum("n_acc").alias("n_accesses"),
            F.sum("hits").alias("n_hits"),
        )
    )
    return segd.select(
        "segment",
        F.col("n_customers").cast("long").alias("n_customers"),
        F.col("n_accesses").cast("long").alias("n_accesses"),
        F.col("n_hits").cast("long").alias("n_hits"),
        F.expr("n_hits * 1000000 div n_accesses").cast("long").alias(
            "hit_ppm"
        ),
    )


# ---------------------------------------------------------------------------
# Rolling percentile rank of daily revenue vs the trailing 90 days
# ---------------------------------------------------------------------------

_RPR_WINDOW = 90


@_register(
    "rolling_percentile_rank_daily",
    f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev
      FROM orders GROUP BY 1
    ),
    idx AS (
      SELECT day, rev, row_number() OVER (ORDER BY day) AS i FROM daily
    ),
    ranked AS (
      SELECT a.day, a.rev,
             CAST(count(*) AS BIGINT) AS window_n,
             CAST(sum(CASE WHEN b.rev <= a.rev THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_below_eq
      FROM idx a JOIN idx b
        ON b.i BETWEEN a.i - {_RPR_WINDOW - 1} AND a.i
      GROUP BY 1, 2
      HAVING count(*) = {_RPR_WINDOW}
    )
    SELECT day, rev, window_n, n_below_eq,
           CAST(n_below_eq * 1000000 // window_n AS BIGINT)
             AS percentile_ppm,
           n_below_eq = window_n AS is_window_max
    FROM ranked
    """,
    f"Rolling empirical percentile rank: each day's revenue scored "
    f"against its trailing {_RPR_WINDOW} observed days (count of "
    "window days at-or-below, in ppm — exact integers, no "
    "interpolation) with a window-maximum flag. This is the "
    "'unusually high vs the trailing quarter' detector dashboards "
    "actually want — percentile-calibrated, unlike "
    "`mad_outlier_events`' fixed-threshold z-scores; the banded "
    "self-join on row index is days x 90 at any fact scale. "
    "Partial leading windows are excluded (exactly 90-day windows "
    "only) so every percentile has the same denominator.",
    ("timeseries", "anomaly", "window", "orders"),
)
def rolling_percentile_rank_daily(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias("rev")
    )
    idx = daily.select(
        "day", "rev", F.row_number().over(Window.orderBy("day")).alias("i")
    ).localCheckpoint(eager=False)
    a = idx.select(
        F.col("day").alias("day"), F.col("rev").alias("rev"), F.col("i").alias("ia")
    )
    b = idx.select(F.col("rev").alias("rb"), F.col("i").alias("ib"))
    ranked = (
        a.join(
            b,
            F.col("ib").between(F.col("ia") - (_RPR_WINDOW - 1), F.col("ia")),
        )
        .groupBy("day", "rev")
        .agg(
            F.count("*").alias("window_n"),
            F.sum(
                F.when(F.col("rb") <= F.col("rev"), 1).otherwise(0)
            ).alias("n_below_eq"),
        )
        .filter(F.col("window_n") == _RPR_WINDOW)
    )
    return ranked.select(
        "day",
        "rev",
        F.col("window_n").cast("long").alias("window_n"),
        F.col("n_below_eq").cast("long").alias("n_below_eq"),
        F.expr("n_below_eq * 1000000 div window_n").cast("long").alias(
            "percentile_ppm"
        ),
        (F.col("n_below_eq") == F.col("window_n")).alias("is_window_max"),
    )


# ---------------------------------------------------------------------------
# KWIC concordance extraction for the policy terms
# ---------------------------------------------------------------------------

_KWIC_CTX = 3
_KWIC_TERMS_SQL = ", ".join(f"'{t}'" for t in sorted(BLOCKLIST_WEIGHTS))


@_register(
    "kwic_concordance_documents",
    f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS l
      FROM documents
    ),
    hits AS (
      SELECT doc_id, l,
             unnest(generate_series(1, len(l))) AS pos,
             unnest(l) AS tok
      FROM toks
    )
    SELECT doc_id, CAST(pos AS INTEGER) AS pos, tok AS term,
           coalesce(array_to_string(
               l[greatest(pos - {_KWIC_CTX}, 1):pos - 1], ' '), '')
             AS left_ctx,
           coalesce(array_to_string(
               l[pos + 1:least(pos + {_KWIC_CTX},
                               CAST(len(l) AS BIGINT))], ' '), '')
             AS right_ctx
    FROM hits
    WHERE tok IN ({_KWIC_TERMS_SQL})
    """,
    "KWIC (keyword-in-context) concordance for the policy terms: "
    f"every hit of the blocklist vocabulary with {_KWIC_CTX} tokens "
    "of left/right context — the human-review surface behind every "
    "moderation queue (reviewers adjudicate contexts, not bare "
    "counts; `blocklist_screen_documents` scores, this SHOWS). "
    "Pure scan-local array slicing per document, zero joins — at "
    "100 TB the term filter makes it a sparse extraction whose "
    "output is hits-sized, not corpus-sized.",
    ("text", "extraction", "policy", "documents"),
)
def kwic_concordance_documents(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.filter(
            F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda x: x != ""
        ).alias("l"),
    )
    hits = toks.select(
        "doc_id",
        "l",
        F.posexplode("l").alias("pos0", "tok"),
    ).select(
        "doc_id", "l", (F.col("pos0") + 1).alias("pos"), "tok"
    )
    terms = sorted(BLOCKLIST_WEIGHTS)
    left = F.array_join(
        F.slice(
            F.col("l"),
            F.greatest(F.col("pos") - _KWIC_CTX, F.lit(1)),
            F.greatest(
                F.least(F.col("pos") - 1, F.lit(_KWIC_CTX)), F.lit(0)
            ),
        ),
        " ",
    )
    right = F.array_join(
        F.slice(
            F.col("l"),
            F.col("pos") + 1,
            F.greatest(
                F.least(
                    F.size("l") - F.col("pos"), F.lit(_KWIC_CTX)
                ),
                F.lit(0),
            ),
        ),
        " ",
    )
    return hits.filter(F.col("tok").isin(*terms)).select(
        "doc_id",
        F.col("pos").cast("int").alias("pos"),
        F.col("tok").alias("term"),
        left.alias("left_ctx"),
        right.alias("right_ctx"),
    )
