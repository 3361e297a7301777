"""Round-3 registry additions, batch 27 — a one-split decision
stump learner and post-click next-action analysis.

Same contract as ``registry.py``. Imported at the bottom of
``registry.py``.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import _register, _t

# ---------------------------------------------------------------------------
# Decision stump: best single price split predicting the return flag
# ---------------------------------------------------------------------------

_STUMP_BINS = 32


@_register(
    "decision_stump_returnflag",
    f"""
    WITH stats AS (
      SELECT min(l_extendedprice) AS mn, max(l_extendedprice) AS mx,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                  AS BIGINT) AS pos
      FROM lineitem
    ),
    binned AS (
      SELECT least(CAST(floor((l_extendedprice - s.mn) / (s.mx - s.mn)
                               * {_STUMP_BINS}) AS INTEGER),
                   {_STUMP_BINS - 1}) AS bin,
             CAST(count(*) AS BIGINT) AS cnt,
             CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                  AS BIGINT) AS cpos
      FROM lineitem CROSS JOIN stats s
      GROUP BY 1
    ),
    cum AS (
      SELECT bin,
             CAST(sum(cnt) OVER (ORDER BY bin
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS ln,
             CAST(sum(cpos) OVER (ORDER BY bin
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS lpos
      FROM binned
    ),
    scored AS (
      -- weighted Gini after splitting at the bin's upper edge:
      -- left impurity * ln/n + right impurity * rn/n, all from
      -- exact integer counts with pinned divisions
      SELECT c.bin, c.ln AS n_left, s.n - c.ln AS n_right,
             c.lpos AS pos_left, s.pos - c.lpos AS pos_right,
             (2.0 * c.lpos * (c.ln - c.lpos)
              / (CAST(c.ln AS DOUBLE) * c.ln)) * (c.ln / CAST(s.n AS DOUBLE))
             + (2.0 * (s.pos - c.lpos)
                * ((s.n - c.ln) - (s.pos - c.lpos))
                / (CAST(s.n - c.ln AS DOUBLE) * (s.n - c.ln)))
               * ((s.n - c.ln) / CAST(s.n AS DOUBLE)) AS gini
      FROM cum c CROSS JOIN stats s
      WHERE c.ln > 0 AND c.ln < s.n
    ),
    best AS (
      SELECT bin FROM scored ORDER BY gini ASC, bin ASC LIMIT 1
    )
    SELECT sc.bin AS split_bin, sc.n_left, sc.n_right,
           sc.pos_left, sc.pos_right,
           floor(sc.gini * 1000000 + 0.5) / 1000000.0 AS weighted_gini,
           sc.bin = (SELECT bin FROM best) AS is_best_split
    FROM scored sc
    """,
    "Decision-stump learner: the best single split of extended "
    f"price predicting the return flag, evaluated at {_STUMP_BINS} "
    "equi-width candidate thresholds by weighted GINI impurity — "
    "chosen over entropy precisely because Gini is RATIONAL in the "
    "integer class counts (2*p*(n-p)/n^2), so every candidate's "
    "score is exact pinned arithmetic and the argmin is "
    "bit-deterministic. Emits the full candidate curve with the "
    "winner flagged — the shape (flat = no signal, V = real "
    "threshold) is the feature-usefulness diagnostic. The third "
    "learner beside `perceptron_daily_revenue` (online) and "
    "`huber_location_daily_revenue` (robust IRLS): one histogram "
    "pass, one 32-row scan — the classic distributed-tree "
    "building block (this is exactly how XGBoost-style histogram "
    "split finding works per node).",
    ("ml", "tree", "lineitem"),
)
def decision_stump_returnflag(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    pos_flag = F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
    stats = li.agg(
        F.min("l_extendedprice").alias("mn"),
        F.max("l_extendedprice").alias("mx"),
        F.count("*").alias("n"),
        F.sum(pos_flag).alias("pos"),
    )
    binned = (
        li.crossJoin(F.broadcast(stats))
        .groupBy(
            F.least(
                F.floor(
                    (F.col("l_extendedprice") - F.col("mn"))
                    / (F.col("mx") - F.col("mn"))
                    * _STUMP_BINS
                ).cast("int"),
                F.lit(_STUMP_BINS - 1),
            ).alias("bin")
        )
        .agg(
            F.count("*").alias("cnt"), F.sum(pos_flag).alias("cpos")
        )
    )
    wc = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = binned.select(
        "bin",
        F.sum("cnt").over(wc).alias("ln"),
        F.sum("cpos").over(wc).alias("lpos"),
    )
    ln = F.col("ln")
    lpos = F.col("lpos")
    rn = F.col("n") - ln
    rpos = F.col("pos") - lpos
    gini = (
        2.0 * lpos * (ln - lpos) / (ln.cast("double") * ln)
    ) * (ln / F.col("n").cast("double")) + (
        2.0 * rpos * (rn - rpos) / (rn.cast("double") * rn)
    ) * (
        rn / F.col("n").cast("double")
    )
    scored = (
        cum.crossJoin(F.broadcast(stats))
        .filter((ln > 0) & (ln < F.col("n")))
        .select(
            F.col("bin").alias("split_bin"),
            ln.cast("long").alias("n_left"),
            rn.cast("long").alias("n_right"),
            lpos.cast("long").alias("pos_left"),
            rpos.cast("long").alias("pos_right"),
            gini.alias("gini"),
        )
        .localCheckpoint(eager=False)
    )
    best = (
        scored.orderBy(F.col("gini").asc(), F.col("split_bin").asc())
        .limit(1)
        .select(F.col("split_bin").alias("best_bin"))
    )
    return scored.crossJoin(F.broadcast(best)).select(
        "split_bin",
        "n_left",
        "n_right",
        "pos_left",
        "pos_right",
        (F.floor(F.col("gini") * 1000000 + F.lit(0.5)) / 1000000.0).alias(
            "weighted_gini"
        ),
        (F.col("split_bin") == F.col("best_bin")).alias("is_best_split"),
    )


# ---------------------------------------------------------------------------
# Post-click next action: what users do instead of purchasing
# ---------------------------------------------------------------------------

_PC_TIMEOUT_US = 3600 * 1_000_000  # next action within 1 hour


@_register(
    "post_click_next_action",
    f"""
    WITH ordered AS (
      SELECT user_id, event_type,
             CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS us,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type,
             lead(CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT))
               OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS next_us
      FROM events
    ),
    clicks AS (
      SELECT CASE
               WHEN next_type IS NULL THEN 'session_end'
               WHEN next_us - us > {_PC_TIMEOUT_US} THEN 'timeout'
               ELSE next_type END AS next_action
      FROM ordered WHERE event_type = 'click'
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM clicks)
    SELECT c.next_action,
           CAST(count(*) AS BIGINT) AS n_clicks,
           CAST(count(*) * 1000000 // t.n AS BIGINT) AS share_ppm
    FROM clicks c CROSS JOIN tot t
    GROUP BY 1, t.n
    """,
    "Post-click next action — the funnel drop-off FORENSICS the "
    "stage counts can't answer: for every click, the user's very "
    "next event (within 1 hour; later -> 'timeout', none -> "
    "'session_end'), distributed over action types in exact ppm. "
    "A high click->view share means users bounce back to browsing "
    "(ranking problem); click->error flags a checkout defect; "
    "timeout/session_end is lost intent — each bucket points at a "
    "different owner, which is why this readout, not the funnel "
    "rate, drives the fix. One per-user lead window, one "
    "grid-sized aggregate.",
    ("sequence", "funnel", "events"),
)
def post_click_next_action(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    ordered = e.select(
        "event_type",
        us.alias("us"),
        F.lead("event_type").over(w).alias("next_type"),
        F.lead(us).over(w).alias("next_us"),
    )
    clicks = ordered.filter(F.col("event_type") == "click").select(
        F.when(F.col("next_type").isNull(), "session_end")
        .when(
            F.col("next_us") - F.col("us") > _PC_TIMEOUT_US, "timeout"
        )
        .otherwise(F.col("next_type"))
        .alias("next_action")
    )
    tot = clicks.agg(F.count("*").alias("n"))
    return (
        clicks.groupBy("next_action")
        .agg(F.count("*").alias("n_clicks"))
        .crossJoin(F.broadcast(tot))
        .select(
            "next_action",
            F.col("n_clicks").cast("long").alias("n_clicks"),
            F.expr("n_clicks * 1000000 div n").cast("long").alias(
                "share_ppm"
            ),
        )
    )
