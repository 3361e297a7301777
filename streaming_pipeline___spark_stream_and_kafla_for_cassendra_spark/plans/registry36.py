"""Round-3 registry additions, batch 23 — modularity score of the
label-propagation communities, and a calibrated-noise (Laplace
mechanism) release audit.

Same contract as ``registry.py``. Imported at the bottom of
``registry.py``.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import _register, _t
from .registry5 import _LPA_ROUNDS, _lpa_oracle

# ---------------------------------------------------------------------------
# Modularity Q of the label-propagation partition
# ---------------------------------------------------------------------------

_MOD_TAIL = f""",
    twom AS (SELECT CAST(sum(w) AS BIGINT) AS m2 FROM sym),
    nodedeg AS (
      SELECT u AS node, CAST(sum(w) AS BIGINT) AS deg FROM sym GROUP BY 1
    ),
    comm AS (
      SELECT l.label AS community,
             CAST(count(*) AS BIGINT) AS n_nodes,
             CAST(sum(nd.deg) AS BIGINT) AS degree_w
      FROM lab{_LPA_ROUNDS} l JOIN nodedeg nd ON nd.node = l.node
      GROUP BY 1
    ),
    internal AS (
      SELECT lu.label AS community, CAST(sum(s.w) AS BIGINT) AS internal_w
      FROM sym s
      JOIN lab{_LPA_ROUNDS} lu ON lu.node = s.u
      JOIN lab{_LPA_ROUNDS} lv ON lv.node = s.v
      WHERE lu.label = lv.label
      GROUP BY 1
    ),
    scored AS (
      SELECT c.community, c.n_nodes, c.degree_w,
             coalesce(i.internal_w, 0) AS internal_w,
             coalesce(i.internal_w, 0) / CAST(t.m2 AS DOUBLE)
               - (c.degree_w / CAST(t.m2 AS DOUBLE))
                 * (c.degree_w / CAST(t.m2 AS DOUBLE)) AS q_contrib
      FROM comm c
      LEFT JOIN internal i ON i.community = c.community
      CROSS JOIN twom t
    )
    SELECT CAST(community AS INTEGER) AS community,
           n_nodes, internal_w, degree_w,
           floor(q_contrib * 1000000 + 0.5) / 1000000.0 AS q_contrib
    FROM scored
    UNION ALL
    SELECT -1, CAST(count(*) AS BIGINT), CAST(sum(internal_w) AS BIGINT),
           CAST(sum(degree_w) AS BIGINT),
           floor(list_reduce(list_prepend(0.0::DOUBLE,
                   list(q_contrib ORDER BY community)), (a, b) -> a + b)
                 * 1000000 + 0.5) / 1000000.0
    FROM scored
    """


@_register(
    "modularity_communities_nations",
    _lpa_oracle(tail=_MOD_TAIL),
    "Newman modularity Q of the label-propagation partition — the "
    "number that says whether the detected communities are real: "
    "per community, internal edge weight over 2m minus the squared "
    "degree fraction (all from exact integer sums over the SAME "
    "symmetric weighted graph and the SAME 4-round LPA chain as "
    "`label_propagation_nations` — the oracle literally reuses "
    "that query's generated CTEs), plus a summary row (-1) folding "
    "the contributions in community order for the total Q. "
    "Q near 0 means the trade graph is too dense to partition — "
    "itself a finding. Graph-bounded arithmetic after one fact "
    "scan; the quality metric completing the community family.",
    ("graph", "community", "quality", "lineitem"),
)
def modularity_communities_nations(spark, sf_dir):
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
        .unionAll(
            raw.select(F.col("v").alias("u"), F.col("u").alias("v"), "w")
        )
        .groupBy("u", "v")
        .agg(F.sum("w").alias("w"))
    )
    # One fact scan builds the ≤ nation² integer edge list; the LPA
    # rounds and the modularity decomposition over it are bounded
    # driver work (all-integer votes with total-order tie-breaks;
    # q_contrib derives from integer sums, folded in community order
    # — the same IEEE ops in the same order as the distributed form
    # and the oracle). Replaces ~40 tiny stage-jobs of scheduling
    # (measured round 8).
    import math

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
    m2 = sum(w for nbrs in adj.values() for _, w in nbrs)
    m2d = float(m2)
    nodedeg = {u: sum(w for _, w in nbrs) for u, nbrs in adj.items()}
    comm_nodes: dict[int, int] = {}
    comm_deg: dict[int, int] = {}
    for u, lbl in labels.items():
        comm_nodes[lbl] = comm_nodes.get(lbl, 0) + 1
        comm_deg[lbl] = comm_deg.get(lbl, 0) + nodedeg[u]
    internal: dict[int, int] = {}
    for u, nbrs in adj.items():
        for v, w in nbrs:
            if labels[u] == labels[v]:
                internal[labels[u]] = internal.get(labels[u], 0) + w

    def r6(x: float) -> float:
        return math.floor(x * 1000000 + 0.5) / 1000000.0

    rows = []
    q_parts = []
    for lbl in comm_nodes:
        iw = internal.get(lbl, 0)
        dw = comm_deg[lbl]
        q = iw / m2d - (dw / m2d) * (dw / m2d)
        q_parts.append((lbl, q))
        rows.append((lbl, comm_nodes[lbl], iw, dw, r6(q)))
    acc = 0.0
    for _, q in sorted(q_parts):
        acc = acc + q
    rows.sort()
    rows.append(
        (
            -1,
            len(comm_nodes),
            sum(internal.get(lbl, 0) for lbl in comm_nodes),
            sum(comm_deg.values()),
            r6(acc),
        )
    )
    return spark.createDataFrame(
        rows,
        "community int, n_nodes long, internal_w long, "
        "degree_w long, q_contrib double",
    )


# ---------------------------------------------------------------------------
# Calibrated-noise (Laplace-mechanism) release audit
# ---------------------------------------------------------------------------

_DP_EPS = 0.5
_DP_B = 1.0 / _DP_EPS


@_register(
    "calibrated_noise_release_audit",
    f"""
    WITH cells AS (
      SELECT n.n_name AS nation, c.c_mktsegment AS segment,
             CAST(count(*) AS BIGINT) AS true_count
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1, 2
    ),
    noised AS (
      SELECT nation, segment, true_count,
             CAST(CAST(('0x' || substr(md5('dp:' || nation || '|'
                        || segment), 1, 15)) AS UBIGINT) AS DOUBLE)
               / {float(2 ** 60)!r} AS u
      FROM cells
    ),
    released AS (
      SELECT nation, segment, true_count,
             CASE WHEN u >= 0.5
                  THEN -{_DP_B!r} * ln(1.0 - 2.0 * (u - 0.5))
                  ELSE {_DP_B!r} * ln(1.0 - 2.0 * (0.5 - u)) END AS noise
      FROM noised
    )
    SELECT nation, segment, true_count,
           greatest(CAST(floor(true_count + noise + 0.5) AS BIGINT), 0)
             AS released_count,
           abs(greatest(CAST(floor(true_count + noise + 0.5) AS BIGINT), 0)
               - true_count) AS abs_error
    FROM released
    """,
    "Laplace-mechanism release audit (epsilon=0.5, scale b=2): "
    "every (nation, segment) count is released with inverse-CDF "
    "Laplace noise driven by a SEEDED md5 uniform — deterministic "
    "on purpose, so the utility cost (per-cell absolute error of "
    "the integer-rounded, non-negative release) is reproducible "
    "and oracle-checkable; a production deployment swaps the seed "
    "for a real RNG and keeps every other line. The noise-"
    "calibration companion to `k_anonymity_report` (suppression: "
    "lose whole cells; noise: keep all cells, pay per-cell error) "
    "— the two classic disclosure-control tradeoffs side by side. "
    "One fact aggregate; noise is scan-local arithmetic.",
    ("privacy", "noise", "customer"),
)
def calibrated_noise_release_audit(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    cells = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.col("c_mktsegment").alias("segment"),
        )
        .agg(F.count("*").alias("true_count"))
    )
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("dp:"),
                        F.col("nation"),
                        F.lit("|"),
                        F.col("segment"),
                    ).cast("binary")
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(float(2 ** 60))
    )
    noise = F.when(
        u >= 0.5, F.lit(-_DP_B) * F.log(1.0 - 2.0 * (u - F.lit(0.5)))
    ).otherwise(F.lit(_DP_B) * F.log(1.0 - 2.0 * (F.lit(0.5) - u)))
    released = F.greatest(
        F.floor(F.col("true_count") + noise + F.lit(0.5)).cast("long"),
        F.lit(0).cast("long"),
    )
    return cells.select(
        "nation",
        "segment",
        F.col("true_count").cast("long").alias("true_count"),
        released.alias("released_count"),
        F.abs(released - F.col("true_count")).alias("abs_error"),
    )
