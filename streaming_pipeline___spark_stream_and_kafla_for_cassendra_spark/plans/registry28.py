"""Round-3 registry additions, batch 15 — exact Shapley-value
channel attribution and an integer online perceptron.

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
# Exact Shapley-value attribution over the 3-channel coalition lattice
# ---------------------------------------------------------------------------

# channel -> mask bit
_SHAP_CHANNELS = (("view", 1), ("click", 2), ("signup", 4))
# phi_i pairs: (without-i mask, with-i mask, weight expressed as
# divisor 3 or 6); generated so both engines state the identical
# fixed-order formula
_SHAP_PAIRS = {
    "view": [(0, 1, 3), (2, 3, 6), (4, 5, 6), (6, 7, 3)],
    "click": [(0, 2, 3), (1, 3, 6), (4, 6, 6), (5, 7, 3)],
    "signup": [(0, 4, 3), (1, 5, 6), (2, 6, 6), (3, 7, 3)],
}


def _phi_sql(ch: str) -> str:
    return " + ".join(
        f"(v{w} - v{wo}) / {d}.0" for wo, w, d in _SHAP_PAIRS[ch]
    )


@_register(
    "shapley_attribution_channels",
    f"""
    WITH fp AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS tp
      FROM events GROUP BY 1
    ),
    u AS (
      -- the touch set is PRE-first-purchase (all history for
      -- non-converters) — post-purchase touches carry no causal
      -- credit, and this is what makes the coalition cells vary
      SELECT e.user_id,
             max(CASE WHEN e.event_type = 'view'
                      AND (fp.tp IS NULL OR e.ts < fp.tp)
                 THEN 1 ELSE 0 END)
               + 2 * max(CASE WHEN e.event_type = 'click'
                             AND (fp.tp IS NULL OR e.ts < fp.tp)
                        THEN 1 ELSE 0 END)
               + 4 * max(CASE WHEN e.event_type = 'signup'
                             AND (fp.tp IS NULL OR e.ts < fp.tp)
                        THEN 1 ELSE 0 END) AS mask,
             max(CASE WHEN e.event_type = 'purchase' THEN 1 ELSE 0 END)
               AS conv
      FROM events e JOIN fp ON fp.user_id = e.user_id
      GROUP BY 1
    ),
    cells AS (
      SELECT mask, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(conv) AS BIGINT) AS k
      FROM u GROUP BY 1
    ),
    piv AS (
      SELECT {", ".join(
          f"coalesce(max(CASE WHEN mask = {m} THEN "
          f"k / CAST(n AS DOUBLE) END), 0.0) AS v{m}"
          for m in range(8))}
      FROM cells
    )
    SELECT 'coalition_' || CAST(mask AS VARCHAR) AS key,
           n AS n_users, k AS n_conv,
           floor(k / CAST(n AS DOUBLE) * 1000000 + 0.5) / 1000000.0
             AS value
    FROM cells
    {"".join(
        f'''UNION ALL
    SELECT 'phi_{ch}', CAST(0 AS BIGINT), CAST(0 AS BIGINT),
           floor(({_phi_sql(ch)}) * 1000000 + 0.5) / 1000000.0
    FROM piv
    ''' for ch, _ in _SHAP_CHANNELS)}
    """,
    "EXACT Shapley-value channel attribution — the game-theoretic "
    "gold standard the heuristic attribution family (last-touch / "
    "linear / position-based) approximates: users partition into "
    "the 8 coalitions of channels {view, click, signup} touched "
    "BEFORE their first purchase (full history for non-converters), each coalition's conversion rate is the "
    "characteristic function (exact count ratio, empty cells "
    "contribute 0), and each channel's phi is the closed-form "
    "3-player Shapley sum of weighted marginal contributions — a "
    "FIXED 4-term formula per channel stated identically in both "
    "engines, so axioms (efficiency: sum phi = v(full) - v(empty)) "
    "hold to rounding. One user rollup, one 8-cell aggregate; the "
    "lattice arithmetic is constant-sized at any scale.",
    ("attribution", "game-theory", "events"),
)
def shapley_attribution_channels(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    fp = e.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("tp")
    )
    pre = F.col("tp").isNull() | (F.col("ts") < F.col("tp"))

    def touch(t, mult):
        return mult * F.max(
            F.when((F.col("event_type") == t) & pre, 1).otherwise(0)
        )

    u = (
        e.join(fp, "user_id")
        .groupBy("user_id")
        .agg(
            (touch("view", 1) + touch("click", 2) + touch("signup", 4)).alias(
                "mask"
            ),
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("conv"),
        )
    )
    cells = u.groupBy("mask").agg(
        F.count("*").alias("n"), F.sum("conv").alias("k")
    ).localCheckpoint(eager=False)
    piv = cells.agg(
        *[
            F.coalesce(
                F.max(
                    F.when(
                        F.col("mask") == m,
                        F.col("k") / F.col("n").cast("double"),
                    )
                ),
                F.lit(0.0),
            ).alias(f"v{m}")
            for m in range(8)
        ]
    )
    coal = cells.select(
        F.concat(F.lit("coalition_"), F.col("mask").cast("string")).alias(
            "key"
        ),
        F.col("n").cast("long").alias("n_users"),
        F.col("k").cast("long").alias("n_conv"),
        _r6(F.col("k") / F.col("n").cast("double")).alias("value"),
    )
    out = coal
    for ch, _bit in _SHAP_CHANNELS:
        terms = _SHAP_PAIRS[ch]
        phi = sum(
            (
                (F.col(f"v{w}") - F.col(f"v{wo}")) / float(d)
                for wo, w, d in terms[1:]
            ),
            (F.col(f"v{terms[0][1]}") - F.col(f"v{terms[0][0]}"))
            / float(terms[0][2]),
        )
        out = out.unionAll(
            piv.select(
                F.lit(f"phi_{ch}").alias("key"),
                F.lit(0).cast("long").alias("n_users"),
                F.lit(0).cast("long").alias("n_conv"),
                _r6(phi).alias("value"),
            )
        )
    return out


# ---------------------------------------------------------------------------
# Integer online perceptron: does yesterday's momentum predict tomorrow?
# ---------------------------------------------------------------------------

@_register(
    "perceptron_daily_revenue",
    """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(floor(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                        / 100000) AS BIGINT) AS kd
      FROM orders GROUP BY 1
    ),
    lagged AS (
      SELECT day, kd,
             lag(kd) OVER (ORDER BY day) AS prev,
             lead(kd) OVER (ORDER BY day) AS nxt,
             CAST((CAST(day - DATE '1970-01-01' AS BIGINT) + 4) % 7
                  AS BIGINT) AS wd
      FROM daily
    ),
    examples AS (
      SELECT day,
             CASE WHEN kd > prev THEN 1 WHEN kd < prev THEN -1
                  ELSE 0 END AS x2,
             wd - 3 AS x3,
             CASE WHEN nxt > kd THEN 1 ELSE -1 END AS y
      FROM lagged WHERE prev IS NOT NULL AND nxt IS NOT NULL
    ),
    seq AS (
      SELECT list([CAST(1 AS BIGINT), x2, x3, y] ORDER BY day) AS xs,
             CAST(count(*) AS BIGINT) AS n
      FROM examples
    ),
    folded AS (
      -- acc = [w1, w2, w3, correct]; freeze-free scalar updates only
      SELECT n,
             list_reduce(
               list_prepend([CAST(0 AS BIGINT), CAST(0 AS BIGINT),
                             CAST(0 AS BIGINT), CAST(0 AS BIGINT)],
                 list_transform(xs, x -> [x[1], x[2], x[3], x[4]])),
               (acc, x) -> [
                 CASE WHEN (CASE WHEN acc[1] * x[1] + acc[2] * x[2]
                                      + acc[3] * x[3] > 0
                            THEN 1 ELSE -1 END) <> x[4]
                      THEN acc[1] + x[4] * x[1] ELSE acc[1] END,
                 CASE WHEN (CASE WHEN acc[1] * x[1] + acc[2] * x[2]
                                      + acc[3] * x[3] > 0
                            THEN 1 ELSE -1 END) <> x[4]
                      THEN acc[2] + x[4] * x[2] ELSE acc[2] END,
                 CASE WHEN (CASE WHEN acc[1] * x[1] + acc[2] * x[2]
                                      + acc[3] * x[3] > 0
                            THEN 1 ELSE -1 END) <> x[4]
                      THEN acc[3] + x[4] * x[3] ELSE acc[3] END,
                 acc[4] + CASE WHEN (CASE WHEN acc[1] * x[1]
                                        + acc[2] * x[2]
                                        + acc[3] * x[3] > 0
                                     THEN 1 ELSE -1 END) = x[4]
                               THEN 1 ELSE 0 END
               ]) AS st
      FROM seq
    )
    SELECT n AS n_examples,
           CAST(st[1] AS BIGINT) AS w_bias,
           CAST(st[2] AS BIGINT) AS w_momentum,
           CAST(st[3] AS BIGINT) AS w_weekday,
           CAST(st[4] AS BIGINT) AS n_correct,
           floor(st[4] / CAST(n AS DOUBLE) * 1000000 + 0.5) / 1000000.0
             AS online_accuracy
    FROM folded
    """,
    "Integer online perceptron — an actual TRAINING LOOP run as a "
    "pure in-row fold, bit-exact by construction because weights, "
    "features and updates are all integers: predict whether "
    "tomorrow's revenue rises from [bias, yesterday's momentum "
    "sign, centered weekday], classic Rosenblatt update w += y*x "
    "on mistakes, prediction sign(w.x) with sign(0) pinned to -1, "
    "one pass in day order tracking online (progressive-"
    "validation) accuracy. The learning-algorithms companion to "
    "the closed-form estimators (OLS `price_quantity_slope_by_"
    "brand`, IRLS `huber_location_daily_revenue`): sequential, "
    "state-carrying, and still fully oracle-checkable. Days-sized "
    "rollup; zero shuffle beyond the daily aggregate.",
    ("ml", "online-learning", "recurrence", "orders"),
)
def perceptron_daily_revenue(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.floor(
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")) / 100000
        )
        .cast("long")
        .alias("kd")
    )
    w = Window.orderBy("day")
    lagged = daily.select(
        "day",
        "kd",
        F.lag("kd").over(w).alias("prev"),
        F.lead("kd").over(w).alias("nxt"),
        (
            (F.datediff(F.col("day"), F.lit("1970-01-01")).cast("long") + 4)
            % 7
        ).alias("wd"),
    )
    examples = lagged.filter(
        F.col("prev").isNotNull() & F.col("nxt").isNotNull()
    ).select(
        "day",
        F.when(F.col("kd") > F.col("prev"), 1)
        .when(F.col("kd") < F.col("prev"), -1)
        .otherwise(0)
        .cast("long")
        .alias("x2"),
        (F.col("wd") - 3).cast("long").alias("x3"),
        F.when(F.col("nxt") > F.col("kd"), 1)
        .otherwise(-1)
        .cast("long")
        .alias("y"),
    )
    seq = examples.agg(
        F.array_sort(
            F.collect_list(F.struct("day", "x2", "x3", "y"))
        ).alias("xs"),
        F.count("*").alias("n"),
    )
    init = F.struct(
        F.lit(0).cast("long").alias("w1"),
        F.lit(0).cast("long").alias("w2"),
        F.lit(0).cast("long").alias("w3"),
        F.lit(0).cast("long").alias("c"),
    )

    def step(acc, x):
        score = (
            acc["w1"] * 1 + acc["w2"] * x["x2"] + acc["w3"] * x["x3"]
        )
        pred = F.when(score > 0, F.lit(1)).otherwise(F.lit(-1))
        wrong = pred != x["y"]
        return F.struct(
            F.when(wrong, acc["w1"] + x["y"] * 1)
            .otherwise(acc["w1"])
            .alias("w1"),
            F.when(wrong, acc["w2"] + x["y"] * x["x2"])
            .otherwise(acc["w2"])
            .alias("w2"),
            F.when(wrong, acc["w3"] + x["y"] * x["x3"])
            .otherwise(acc["w3"])
            .alias("w3"),
            (acc["c"] + F.when(~wrong, 1).otherwise(0)).alias("c"),
        )

    st = F.aggregate(F.col("xs"), init, step)
    return seq.select(
        F.col("n").cast("long").alias("n_examples"),
        st["w1"].cast("long").alias("w_bias"),
        st["w2"].cast("long").alias("w_momentum"),
        st["w3"].cast("long").alias("w_weekday"),
        st["c"].cast("long").alias("n_correct"),
        _r6(st["c"] / F.col("n").cast("double")).alias("online_accuracy"),
    )
