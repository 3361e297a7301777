"""Round-3 registry additions, batch 21 — ClickHouse-style
windowFunnel and an (s,S) inventory-policy replay.

Same contract as ``registry.py``. Imported at the bottom of
``registry.py``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import _register, _t

# ---------------------------------------------------------------------------
# windowFunnel: max funnel stage completed inside a sliding 24h window
# ---------------------------------------------------------------------------

_WF_WINDOW_US = 24 * 3600 * 1_000_000
_WF_STAGES = ("view", "click", "purchase")
_WF_CODE = {t: i + 1 for i, t in enumerate(_WF_STAGES)}  # 1-based

_WF_CASE = (
    "CASE event_type "
    + " ".join(f"WHEN '{t}' THEN {c}" for t, c in _WF_CODE.items())
    + " ELSE 0 END"
)


@_register(
    "window_funnel_users",
    f"""
    WITH coded AS (
      SELECT user_id,
             list([CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT),
                   CAST({_WF_CASE} AS BIGINT)]
                  ORDER BY ts, event_id) AS xs
      FROM events
      WHERE {_WF_CASE} > 0
      GROUP BY user_id
    ),
    folded AS (
      -- acc = [stage, funnel_start_us, best]; the funnel restarts on
      -- every stage-1 event (ClickHouse windowFunnel semantics),
      -- advances only on the NEXT stage inside the window, and
      -- remembers the best depth ever reached
      SELECT user_id,
             list_reduce(
               list_prepend([CAST(0 AS BIGINT), CAST(0 AS BIGINT),
                             CAST(0 AS BIGINT)], xs),
               (acc, x) -> [
                 CASE WHEN x[2] = 1 THEN 1
                      WHEN x[2] = acc[1] + 1
                           AND acc[1] >= 1
                           AND x[1] - acc[2] <= {_WF_WINDOW_US}
                      THEN acc[1] + 1
                      ELSE acc[1] END,
                 CASE WHEN x[2] = 1 THEN x[1] ELSE acc[2] END,
                 greatest(acc[3],
                   CASE WHEN x[2] = 1 THEN 1
                        WHEN x[2] = acc[1] + 1
                             AND acc[1] >= 1
                             AND x[1] - acc[2] <= {_WF_WINDOW_US}
                        THEN acc[1] + 1
                        ELSE acc[1] END)
               ]) AS st
      FROM coded
    )
    SELECT CAST(st[3] AS INTEGER) AS max_stage,
           CAST(count(*) AS BIGINT) AS n_users
    FROM folded GROUP BY 1
    """,
    "windowFunnel (the ClickHouse sequence primitive): per user, "
    "the deepest view->click->purchase chain completed with every "
    "step inside 24h OF THE FUNNEL START, folding the coded event "
    "sequence with a [stage, start, best] integer state — restart "
    "on every stage-1 event, advance only on the exact next stage "
    "in-window, remember the best depth (so a later full funnel "
    "beats an early partial one). Pure integer microsecond "
    "arithmetic, bit-identical across engines. The time-constrained "
    "strictly-ordered cousin of `funnel_view_click_purchase` "
    "(lifetime stage counts) and `match_recognize_funnel_users` "
    "(pattern syntax): three operators, three funnel semantics, "
    "all exact. One shuffle on user_id.",
    ("sequence", "funnel", "recurrence", "events"),
)
def window_funnel_users(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    code = F.when(F.col("event_type") == _WF_STAGES[0], 1)
    for i, t in enumerate(_WF_STAGES[1:], start=2):
        code = code.when(F.col("event_type") == t, i)
    code = code.otherwise(0)
    coded = (
        e.select(
            "user_id",
            "event_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
            code.cast("long").alias("stage"),
        )
        .filter(F.col("stage") > 0)
        .groupBy("user_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("us", "event_id", "stage"))
            ).alias("xs")
        )
    )
    init = F.struct(
        F.lit(0).cast("long").alias("stage"),
        F.lit(0).cast("long").alias("start"),
        F.lit(0).cast("long").alias("best"),
    )

    def step(acc, x):
        advanced = (
            (x["stage"] == acc["stage"] + 1)
            & (acc["stage"] >= 1)
            & (x["us"] - acc["start"] <= _WF_WINDOW_US)
        )
        new_stage = (
            F.when(x["stage"] == 1, F.lit(1).cast("long"))
            .when(advanced, acc["stage"] + 1)
            .otherwise(acc["stage"])
        )
        return F.struct(
            new_stage.alias("stage"),
            F.when(x["stage"] == 1, x["us"])
            .otherwise(acc["start"])
            .alias("start"),
            F.greatest(acc["best"], new_stage).alias("best"),
        )

    folded = coded.select(
        F.aggregate(F.col("xs"), init, step)["best"].alias("max_stage")
    )
    return folded.groupBy(F.col("max_stage").cast("int").alias("max_stage")).agg(
        F.count("*").alias("n_users")
    )


# ---------------------------------------------------------------------------
# (s,S) inventory policy replay over per-part daily demand
# ---------------------------------------------------------------------------

_INV_LITTLE_S = 20
_INV_BIG_S = 100


@_register(
    "inventory_ss_policy_replay",
    f"""
    WITH demand AS (
      SELECT l_partkey,
             CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT)
               AS day,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
      FROM lineitem GROUP BY 1, 2
    ),
    seq AS (
      SELECT l_partkey, list([day, qty] ORDER BY day) AS xs,
             CAST(count(*) AS BIGINT) AS n_days
      FROM demand GROUP BY 1
      HAVING count(*) >= 5
    ),
    folded AS (
      -- acc = [on_hand, reorders, stockout_units]; start full at S;
      -- demand draws down, unmet demand is lost (counted), and any
      -- position < s triggers an order-up-to-S (zero lead time,
      -- applied after the day's demand)
      SELECT l_partkey, n_days,
             list_reduce(
               list_prepend([CAST({_INV_BIG_S} AS BIGINT),
                             CAST(0 AS BIGINT), CAST(0 AS BIGINT)],
                 xs),
               (acc, x) -> [
                 CASE WHEN greatest(acc[1] - x[2], 0) < {_INV_LITTLE_S}
                      THEN {_INV_BIG_S}
                      ELSE greatest(acc[1] - x[2], 0) END,
                 acc[2] + CASE WHEN greatest(acc[1] - x[2], 0)
                                    < {_INV_LITTLE_S}
                               THEN 1 ELSE 0 END,
                 acc[3] + greatest(x[2] - acc[1], 0)
               ]) AS st
      FROM seq
    )
    SELECT CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(n_days) AS BIGINT) AS n_demand_days,
           CAST(sum(st[2]) AS BIGINT) AS total_reorders,
           CAST(sum(st[3]) AS BIGINT) AS total_stockout_units,
           CAST(sum(CASE WHEN st[3] > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS parts_with_stockouts
    FROM folded
    """,
    f"(s,S) inventory policy replay (s={_INV_LITTLE_S}, "
    f"S={_INV_BIG_S}, zero lead time, lost sales): each part's "
    "daily demand sequence folds through the classic min-max "
    "restock rule — draw down, count unmet units, reorder up to S "
    "whenever the position crosses s — in pure integers, so the "
    "corpus report (reorder events, stockout units, parts that "
    "ever stocked out) is bit-exact. The policy-evaluation "
    "companion to `croston_intermittent_demand`: Croston FORECASTS "
    "the sparse demand, this measures what a concrete stocking "
    "rule would have done against the realized demand. One shuffle "
    "on partkey; per-part arrays bounded by the date range.",
    ("supply-chain", "simulation", "recurrence", "lineitem"),
)
def inventory_ss_policy_replay(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    demand = li.groupBy(
        "l_partkey",
        F.datediff(F.col("l_shipdate").cast("date"), F.lit("1970-01-01"))
        .cast("long")
        .alias("day"),
    ).agg(F.sum(F.col("l_quantity").cast("long")).alias("qty"))
    seq = (
        demand.groupBy("l_partkey")
        .agg(
            F.array_sort(F.collect_list(F.struct("day", "qty"))).alias("xs"),
            F.count("*").alias("n_days"),
        )
        .filter(F.col("n_days") >= 5)
    )
    init = F.struct(
        F.lit(_INV_BIG_S).cast("long").alias("oh"),
        F.lit(0).cast("long").alias("ro"),
        F.lit(0).cast("long").alias("so"),
    )

    def step(acc, x):
        after = F.greatest(acc["oh"] - x["qty"], F.lit(0).cast("long"))
        trigger = after < _INV_LITTLE_S
        return F.struct(
            F.when(trigger, F.lit(_INV_BIG_S).cast("long"))
            .otherwise(after)
            .alias("oh"),
            (acc["ro"] + F.when(trigger, 1).otherwise(0)).alias("ro"),
            (
                acc["so"]
                + F.greatest(x["qty"] - acc["oh"], F.lit(0).cast("long"))
            ).alias("so"),
        )

    folded = seq.select(
        "n_days",
        F.aggregate(F.col("xs"), init, step).alias("st"),
    )
    return folded.agg(
        F.count("*").cast("long").alias("n_parts"),
        F.sum("n_days").cast("long").alias("n_demand_days"),
        F.sum(F.col("st.ro")).cast("long").alias("total_reorders"),
        F.sum(F.col("st.so")).cast("long").alias("total_stockout_units"),
        F.sum(F.when(F.col("st.so") > 0, 1).otherwise(0))
        .cast("long")
        .alias("parts_with_stockouts"),
    )
