"""Round-3 registry additions, batch 12 — consistent-hashing shard
map with an elastic-rebalance audit, and an equi-width-histogram
selectivity estimation audit.

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
# Consistent-hashing ring: shard map + keys moved when scaling 8 -> 9
# ---------------------------------------------------------------------------

_CH_VNODES = 64
_CH_SPACE = 2 ** 60


def _ring_sql(n_servers: int, name: str) -> str:
    """Build the vnode ring + successor intervals for n servers.
    Positions are 60-bit md5 integers of 'ring:sK#vnJ' — identical
    strings hash identically in both engines. The interval table is
    (lo, hi] per vnode via lag, plus a wraparound sentinel owned by
    the first vnode."""
    return f"""
    {name}_vn AS (
      SELECT 's' || CAST(i // {_CH_VNODES} AS VARCHAR) AS server,
             CAST(CAST(('0x' || substr(md5('ring:s'
                 || CAST(i // {_CH_VNODES} AS VARCHAR) || '#vn'
                 || CAST(i % {_CH_VNODES} AS VARCHAR)), 1, 15))
               AS UBIGINT) AS BIGINT) AS pos
      FROM (SELECT unnest(generate_series(0,
                   {n_servers * _CH_VNODES - 1})) AS i)
    ),
    {name}_iv AS (
      SELECT server,
             coalesce(lag(pos) OVER (ORDER BY pos), -1) AS lo,
             pos AS hi
      FROM {name}_vn
      UNION ALL
      SELECT first(server ORDER BY pos) AS server,
             max(pos) AS lo, {_CH_SPACE} AS hi
      FROM {name}_vn
    )"""


@_register(
    "consistent_hash_rebalance",
    f"""
    WITH keys AS (
      SELECT user_id,
             CAST(CAST(('0x' || substr(md5('key:'
                 || CAST(user_id AS VARCHAR)), 1, 15)) AS UBIGINT)
               AS BIGINT) AS k
      FROM (SELECT DISTINCT user_id FROM events)
    ),
    {_ring_sql(8, "r8")},
    {_ring_sql(9, "r9")},
    o8 AS (
      SELECT k.user_id, iv.server AS owner8
      FROM keys k JOIN r8_iv iv ON k.k > iv.lo AND k.k <= iv.hi
    ),
    o9 AS (
      SELECT k.user_id, iv.server AS owner9
      FROM keys k JOIN r9_iv iv ON k.k > iv.lo AND k.k <= iv.hi
    ),
    assigned AS (
      SELECT o8.user_id, o8.owner8, o9.owner9
      FROM o8 JOIN o9 ON o8.user_id = o9.user_id
    ),
    servers AS (SELECT 's' || CAST(unnest(generate_series(0, 8)) AS VARCHAR)
                  AS server)
    SELECT s.server,
           CAST(coalesce(sum(CASE WHEN b.owner8 = s.server
                                  THEN 1 ELSE 0 END), 0) AS BIGINT)
             AS keys_8_servers,
           CAST(coalesce(sum(CASE WHEN b.owner9 = s.server
                                  THEN 1 ELSE 0 END), 0) AS BIGINT)
             AS keys_9_servers,
           CAST(coalesce(sum(CASE WHEN b.owner9 = s.server
                                  AND b.owner8 <> s.server
                                  THEN 1 ELSE 0 END), 0) AS BIGINT)
             AS gained,
           CAST(coalesce(sum(CASE WHEN b.owner8 = s.server
                                  AND b.owner9 <> s.server
                                  THEN 1 ELSE 0 END), 0) AS BIGINT)
             AS lost
    FROM servers s LEFT JOIN assigned b ON TRUE
    GROUP BY 1
    """,
    "Consistent-hashing shard map with an elastic-scaling audit — "
    "the partitioning discipline behind every distributed KV/cache "
    f"tier: a 60-bit md5 ring with {_CH_VNODES} virtual nodes per "
    "server (vnode positions derived in-engine from literal seed "
    "strings, so both engines build the identical ring), keys own "
    "their successor vnode via a (lo, hi] interval table built with "
    "one lag window over the 512-row ring plus a wraparound "
    "sentinel. The report: per-server key counts under 8 and 9 "
    "servers and the gained/lost flows — consistent hashing moves "
    "only ~1/9 of keys where mod-N would reshuffle ~8/9, which IS "
    "the reason this operator exists. Spark matches keys to "
    "intervals with a broadcast of the 513-row table; a bucketed "
    "equi-join (negative_sampling_pairs pattern) is the stated "
    "path if the ring ever outgrew a broadcast.",
    ("systems", "partitioning", "sharding", "events"),
)
def consistent_hash_rebalance(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    khash = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit("key:"), F.col("user_id").cast("string")
                ).cast("binary")
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    keys = (
        e.select("user_id").distinct().select("user_id", khash.alias("k"))
    ).localCheckpoint(eager=False)

    def ring(n_servers):
        vn = spark.range(n_servers * _CH_VNODES).select(
            F.concat(
                F.lit("s"), F.expr(f"id div {_CH_VNODES}").cast("string")
            ).alias("server"),
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("ring:s"),
                            F.expr(f"id div {_CH_VNODES}").cast("string"),
                            F.lit("#vn"),
                            (F.col("id") % _CH_VNODES).cast("string"),
                        ).cast("binary")
                    ),
                    1,
                    15,
                ),
                16,
                10,
            )
            .cast("long")
            .alias("pos"),
        )
        w = Window.orderBy("pos")
        iv = vn.select(
            "server",
            F.coalesce(F.lag("pos").over(w), F.lit(-1)).alias("lo"),
            F.col("pos").alias("hi"),
        )
        wrap = vn.orderBy("pos").limit(1).crossJoin(
            vn.agg(F.max("pos").alias("mx"))
        ).select(
            "server", F.col("mx").alias("lo"), F.lit(_CH_SPACE).alias("hi")
        )
        return iv.unionAll(wrap)

    def owners(ring_iv, alias):
        return keys.join(
            F.broadcast(ring_iv),
            (F.col("k") > F.col("lo")) & (F.col("k") <= F.col("hi")),
        ).select("user_id", F.col("server").alias(alias))

    both = owners(ring(8), "owner8").join(owners(ring(9), "owner9"), "user_id")
    servers = spark.range(9).select(
        F.concat(F.lit("s"), F.col("id").cast("string")).alias("server")
    )
    joined = F.broadcast(servers).crossJoin(both)
    return joined.groupBy("server").agg(
        F.coalesce(
            F.sum(F.when(F.col("owner8") == F.col("server"), 1).otherwise(0)),
            F.lit(0),
        )
        .cast("long")
        .alias("keys_8_servers"),
        F.coalesce(
            F.sum(F.when(F.col("owner9") == F.col("server"), 1).otherwise(0)),
            F.lit(0),
        )
        .cast("long")
        .alias("keys_9_servers"),
        F.coalesce(
            F.sum(
                F.when(
                    (F.col("owner9") == F.col("server"))
                    & (F.col("owner8") != F.col("server")),
                    1,
                ).otherwise(0)
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("gained"),
        F.coalesce(
            F.sum(
                F.when(
                    (F.col("owner8") == F.col("server"))
                    & (F.col("owner9") != F.col("server")),
                    1,
                ).otherwise(0)
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("lost"),
    )


# ---------------------------------------------------------------------------
# Histogram selectivity audit: equi-width estimates vs actual cardinality
# ---------------------------------------------------------------------------

_HIST_BINS = 32
_HIST_PREDS = [
    # (pred_id, lo_dollars, hi_dollars) ranges over o_totalprice
    (0, 0, 50000),
    (1, 50000, 100000),
    (2, 100000, 150000),
    (3, 150000, 200000),
    (4, 0, 25000),
    (5, 225000, 600000),
    (6, 90000, 110000),
    (7, 140000, 360000),
]


def _hist_pred_sql() -> str:
    return " UNION ALL ".join(
        f"SELECT {pid} AS pred_id, {lo}.0 AS plo, {hi}.0 AS phi"
        for pid, lo, hi in _HIST_PREDS
    )


@_register(
    "histogram_selectivity_audit",
    f"""
    WITH stats AS (
      SELECT min(o_totalprice) AS mn, max(o_totalprice) AS mx,
             CAST(count(*) AS BIGINT) AS total
      FROM orders
    ),
    binned AS (
      SELECT least(CAST(floor((o_totalprice - s.mn) / (s.mx - s.mn)
                               * {_HIST_BINS}) AS INTEGER),
                   {_HIST_BINS - 1}) AS bin,
             CAST(count(*) AS BIGINT) AS n
      FROM orders CROSS JOIN stats s
      GROUP BY 1
    ),
    preds AS ({_hist_pred_sql()}),
    terms AS (
      SELECT p.pred_id, b.bin,
             b.n * greatest(0.0::DOUBLE, least(
               (s.mn + (b.bin + 1) * (s.mx - s.mn) / {_HIST_BINS}), p.phi)
               - greatest(
               (s.mn + b.bin * (s.mx - s.mn) / {_HIST_BINS}), p.plo))
             / ((s.mx - s.mn) / {_HIST_BINS}) AS term
      FROM preds p
      CROSS JOIN stats s
      JOIN binned b ON TRUE
    ),
    est AS (
      SELECT pred_id,
             floor(list_reduce(list_prepend(0.0::DOUBLE,
                     list(term ORDER BY bin)), (a, b) -> a + b)
                   + 0.5) AS est_rows
      FROM terms GROUP BY 1
    ),
    actual AS (
      SELECT p.pred_id, CAST(count(o.o_totalprice) AS BIGINT) AS actual_rows
      FROM preds p LEFT JOIN orders o
        ON o.o_totalprice >= p.plo AND o.o_totalprice < p.phi
      GROUP BY 1
    )
    SELECT e.pred_id,
           CAST(e.est_rows AS BIGINT) AS est_rows,
           a.actual_rows,
           CASE WHEN a.actual_rows > 0 THEN
             floor(CAST(e.est_rows AS DOUBLE) / a.actual_rows
                   * 1000000 + 0.5) / 1000000.0
           END AS q_error
    FROM est e JOIN actual a ON a.pred_id = e.pred_id
    """,
    f"Histogram selectivity audit — the CBO calibration loop: a "
    f"{_HIST_BINS}-bin equi-width histogram over order totals "
    "estimates the cardinality of 8 literal range predicates by "
    "fractional bin overlap (uniform-within-bin assumption, the "
    "textbook System-R estimator), and each estimate is scored "
    "against the true count as an estimate/actual ratio. The "
    "row-count companion to `join_cardinality_estimates` (join "
    "output sizes) and `equi_depth_histogram_events` (the better "
    "binning this audit motivates: equi-width under-performs "
    "exactly where the data skews). One fact aggregate builds the "
    "histogram; estimation is 32x8 literal arithmetic. NOTE the "
    "overlap fold sums bin terms in bin order in both engines.",
    ("cbo", "histogram", "estimation", "orders"),
)
def histogram_selectivity_audit(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    stats = o.agg(
        F.min("o_totalprice").alias("mn"),
        F.max("o_totalprice").alias("mx"),
        F.count("*").alias("total"),
    )
    binned = (
        o.crossJoin(F.broadcast(stats))
        .groupBy(
            F.least(
                F.floor(
                    (F.col("o_totalprice") - F.col("mn"))
                    / (F.col("mx") - F.col("mn"))
                    * _HIST_BINS
                ).cast("int"),
                F.lit(_HIST_BINS - 1),
            ).alias("bin")
        )
        .agg(F.count("*").alias("n"))
        .localCheckpoint(eager=False)
    )
    preds = spark.createDataFrame(
        [(pid, float(lo), float(hi)) for pid, lo, hi in _HIST_PREDS],
        "pred_id int, plo double, phi double",
    )
    width = (F.col("mx") - F.col("mn")) / _HIST_BINS
    bin_lo = F.col("mn") + F.col("bin") * width
    bin_hi = F.col("mn") + (F.col("bin") + 1) * width
    overlap = F.greatest(
        F.lit(0.0),
        F.least(bin_hi, F.col("phi")) - F.greatest(bin_lo, F.col("plo")),
    )
    est = (
        F.broadcast(preds)
        .crossJoin(F.broadcast(stats))
        .crossJoin(binned)
        .select("pred_id", "bin", (F.col("n") * overlap / width).alias("term"))
        .groupBy("pred_id")
        .agg(
            F.floor(
                F.aggregate(
                    F.array_sort(F.collect_list(F.struct("bin", "term"))),
                    F.lit(0.0),
                    lambda a, x: a + x["term"],
                )
                + F.lit(0.5)
            ).alias("est_rows")
        )
    )
    actual = (
        F.broadcast(preds)
        .join(
            o,
            (F.col("o_totalprice") >= F.col("plo"))
            & (F.col("o_totalprice") < F.col("phi")),
            "left",
        )
        .groupBy("pred_id")
        .agg(F.count("o_totalprice").alias("actual_rows"))
    )
    return est.join(actual, "pred_id").select(
        "pred_id",
        F.col("est_rows").cast("long").alias("est_rows"),
        F.col("actual_rows").cast("long").alias("actual_rows"),
        F.when(
            F.col("actual_rows") > 0,
            _r6(F.col("est_rows").cast("double") / F.col("actual_rows")),
        ).alias("q_error"),
    )
