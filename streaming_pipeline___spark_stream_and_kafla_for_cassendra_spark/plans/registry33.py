"""Round-3 registry additions, batch 20 — behavioral edit distance
between user event sequences, and a token-bucket rate-limiter
simulation.

Same contract as ``registry.py``. Imported at the bottom of
``registry.py``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import _await_stream, _register, _t

# event_type -> one char (sorted by type name for determinism)
_SESS_CODE = {
    "click": "c",
    "error": "e",
    "purchase": "p",
    "signup": "s",
    "view": "v",
}
_SESS_CASE = (
    "CASE event_type "
    + " ".join(f"WHEN '{t}' THEN '{c}'" for t, c in sorted(_SESS_CODE.items()))
    + " ELSE '?' END"
)
_SESS_CAP = 64


@_register(
    "session_edit_distance_pairs",
    f"""
    WITH seqs AS (
      SELECT user_id,
             substr(string_agg({_SESS_CASE}, '' ORDER BY ts, event_id),
                    1, {_SESS_CAP}) AS s
      FROM events GROUP BY user_id
    )
    SELECT a.user_id AS user_a, b.user_id AS user_b,
           CAST(length(a.s) AS INTEGER) AS len_a,
           CAST(length(b.s) AS INTEGER) AS len_b,
           CAST(levenshtein(a.s, b.s) AS INTEGER) AS edit_distance,
           floor(levenshtein(a.s, b.s)
                 / CAST(greatest(length(a.s), length(b.s)) AS DOUBLE)
                 * 1000000 + 0.5) / 1000000.0 AS normalized_distance
    FROM seqs a JOIN seqs b ON b.user_id = a.user_id + 1
    """,
    "Behavioral edit distance between user event sequences: each "
    "user's chronological event types encode to a compact string "
    "(one deterministic char per type, capped at "
    f"{_SESS_CAP} events), and consecutive-id user pairs score "
    "with Levenshtein — both engines run their native DP "
    "implementation of the SAME metric, so the integers match "
    "without any fold gymnastics (the trick "
    "`edit_distance_pairs_parts` proved on part names, here lifted "
    "to SEQUENCES: alignment distance over behavior, the "
    "session-similarity primitive behind journey clustering and "
    "bot detection). One user rollup with an in-group sort bounded "
    "per user; the pair join is an equi-join on adjacent ids.",
    ("sequence", "similarity", "events"),
)
def session_edit_distance_pairs(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    code = F.when(F.col("event_type") == "click", "c")
    for t, c in sorted(_SESS_CODE.items()):
        if t != "click":
            code = code.when(F.col("event_type") == t, c)
    code = code.otherwise("?")
    seqs = (
        e.groupBy("user_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", code.alias("ch")))
            ).alias("seq")
        )
        .select(
            "user_id",
            F.substring(
                F.array_join(
                    F.transform(F.col("seq"), lambda x: x["ch"]), ""
                ),
                1,
                _SESS_CAP,
            ).alias("s"),
        )
        .localCheckpoint(eager=False)
    )
    a = seqs.select(F.col("user_id").alias("user_a"), F.col("s").alias("sa"))
    b = seqs.select(
        (F.col("user_id") - 1).alias("user_a"),
        F.col("user_id").alias("user_b"),
        F.col("s").alias("sb"),
    )
    lev = F.levenshtein(F.col("sa"), F.col("sb"))
    return a.join(b, "user_a").select(
        "user_a",
        "user_b",
        F.length("sa").cast("int").alias("len_a"),
        F.length("sb").cast("int").alias("len_b"),
        lev.cast("int").alias("edit_distance"),
        (
            F.floor(
                lev
                / F.greatest(F.length("sa"), F.length("sb")).cast("double")
                * 1000000
                + F.lit(0.5)
            )
            / 1000000.0
        ).alias("normalized_distance"),
    )


# ---------------------------------------------------------------------------
# Token-bucket rate limiter simulation over per-user event arrivals
# ---------------------------------------------------------------------------

_TB_CAP = 5           # bucket capacity, tokens
_TB_TOKEN_US = 60_000_000  # one token refills per minute


@_register(
    "rate_limiter_token_bucket",
    f"""
    WITH arrivals AS (
      SELECT user_id,
             list(epoch_us(CAST(ts AS TIMESTAMP))
                  ORDER BY ts, event_id) AS ts_us
      FROM events GROUP BY user_id
    ),
    folded AS (
      -- acc = [balance_us, prev_ts, accepted, rejected]; balance is
      -- token credit in MICROSECONDS (1 token = {_TB_TOKEN_US} us,
      -- cap {_TB_CAP} tokens) so the whole simulation is integer
      SELECT user_id, len(ts_us) AS n,
             list_reduce(
               list_prepend([CAST({_TB_CAP * _TB_TOKEN_US} AS BIGINT),
                             ts_us[1], CAST(0 AS BIGINT),
                             CAST(0 AS BIGINT)],
                 list_transform(ts_us, t -> [t, CAST(0 AS BIGINT),
                                             CAST(0 AS BIGINT),
                                             CAST(0 AS BIGINT)])),
               (acc, x) -> [
                 CASE WHEN least(acc[1] + (x[1] - acc[2]),
                                 {_TB_CAP * _TB_TOKEN_US})
                           >= {_TB_TOKEN_US}
                      THEN least(acc[1] + (x[1] - acc[2]),
                                 {_TB_CAP * _TB_TOKEN_US})
                           - {_TB_TOKEN_US}
                      ELSE least(acc[1] + (x[1] - acc[2]),
                                 {_TB_CAP * _TB_TOKEN_US}) END,
                 x[1],
                 acc[3] + CASE WHEN least(acc[1] + (x[1] - acc[2]),
                                          {_TB_CAP * _TB_TOKEN_US})
                                    >= {_TB_TOKEN_US}
                               THEN 1 ELSE 0 END,
                 acc[4] + CASE WHEN least(acc[1] + (x[1] - acc[2]),
                                          {_TB_CAP * _TB_TOKEN_US})
                                    >= {_TB_TOKEN_US}
                               THEN 0 ELSE 1 END
               ]) AS st
      FROM arrivals
    )
    SELECT CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(n) AS BIGINT) AS n_events,
           CAST(sum(st[3]) AS BIGINT) AS accepted,
           CAST(sum(st[4]) AS BIGINT) AS rejected,
           CAST(sum(st[4]) * 1000000 // sum(n) AS BIGINT)
             AS rejected_ppm,
           CAST(sum(CASE WHEN st[4] > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS users_throttled
    FROM folded
    """,
    f"Token-bucket rate limiter simulation (capacity {_TB_CAP} "
    "tokens, one token per minute, per-user buckets) replayed over "
    "the real event arrivals — the capacity-planning question 'how "
    "many requests would this policy have throttled' answered "
    "exactly before the gateway config ships: balances are token-"
    "credit in integer MICROSECONDS (refill = elapsed time, spend "
    "= one token's worth), the whole fold is integer min/compare "
    "arithmetic, bit-identical across engines. First event "
    "initializes a full bucket with prev = its own timestamp "
    "(zero elapsed). One shuffle on user_id; the burst-tolerance "
    "companion to `watermark_delay_audit_events` (which sizes "
    "lateness tolerance the same replay way).",
    ("systems", "rate-limit", "recurrence", "events"),
)
def rate_limiter_token_bucket(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    arrivals = e.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    "ts",
                    "event_id",
                    F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
                )
            )
        ).alias("seq")
    )
    ts_us = F.transform(F.col("seq"), lambda x: x["us"])
    cap = _TB_CAP * _TB_TOKEN_US
    init = F.struct(
        F.lit(cap).cast("long").alias("bal"),
        F.element_at(ts_us, 1).alias("prev"),
        F.lit(0).cast("long").alias("acc_n"),
        F.lit(0).cast("long").alias("rej_n"),
    )

    def step(acc, t):
        refilled = F.least(
            acc["bal"] + (t - acc["prev"]), F.lit(cap).cast("long")
        )
        ok = refilled >= _TB_TOKEN_US
        return F.struct(
            F.when(ok, refilled - _TB_TOKEN_US)
            .otherwise(refilled)
            .alias("bal"),
            t.alias("prev"),
            (acc["acc_n"] + F.when(ok, 1).otherwise(0)).alias("acc_n"),
            (acc["rej_n"] + F.when(ok, 0).otherwise(1)).alias("rej_n"),
        )

    st = F.aggregate(ts_us, init, step)
    folded = arrivals.select(
        F.size("seq").alias("n"),
        st["acc_n"].alias("acc_n"),
        st["rej_n"].alias("rej_n"),
    )
    return folded.agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum("n").cast("long").alias("n_events"),
        F.sum("acc_n").cast("long").alias("accepted"),
        F.sum("rej_n").cast("long").alias("rejected"),
        F.expr("CAST(sum(rej_n) * 1000000 div sum(n) AS BIGINT)").alias(
            "rejected_ppm"
        ),
        F.sum(F.when(F.col("rej_n") > 0, 1).otherwise(0))
        .cast("long")
        .alias("users_throttled"),
    )


# ---------------------------------------------------------------------------
# Streaming twin: token-bucket limiter as a live stateful operator
# ---------------------------------------------------------------------------

@_register(
    "streaming_rate_limiter",
    f"""
    WITH arrivals AS (
      SELECT user_id,
             list(epoch_us(CAST(ts AS TIMESTAMP))
                  ORDER BY ts, event_id) AS ts_us
      FROM events GROUP BY user_id
    ),
    folded AS (
      SELECT user_id, CAST(len(ts_us) AS BIGINT) AS n_events,
             list_reduce(
               list_prepend([CAST({_TB_CAP * _TB_TOKEN_US} AS BIGINT),
                             ts_us[1], CAST(0 AS BIGINT),
                             CAST(0 AS BIGINT)],
                 list_transform(ts_us, t -> [t, CAST(0 AS BIGINT),
                                             CAST(0 AS BIGINT),
                                             CAST(0 AS BIGINT)])),
               (acc, x) -> [
                 CASE WHEN least(acc[1] + (x[1] - acc[2]),
                                 {_TB_CAP * _TB_TOKEN_US})
                           >= {_TB_TOKEN_US}
                      THEN least(acc[1] + (x[1] - acc[2]),
                                 {_TB_CAP * _TB_TOKEN_US})
                           - {_TB_TOKEN_US}
                      ELSE least(acc[1] + (x[1] - acc[2]),
                                 {_TB_CAP * _TB_TOKEN_US}) END,
                 x[1],
                 acc[3] + CASE WHEN least(acc[1] + (x[1] - acc[2]),
                                          {_TB_CAP * _TB_TOKEN_US})
                                    >= {_TB_TOKEN_US}
                               THEN 1 ELSE 0 END,
                 acc[4] + CASE WHEN least(acc[1] + (x[1] - acc[2]),
                                          {_TB_CAP * _TB_TOKEN_US})
                                    >= {_TB_TOKEN_US}
                               THEN 0 ELSE 1 END
               ]) AS st
      FROM arrivals
    )
    SELECT user_id, n_events,
           CAST(st[3] AS BIGINT) AS accepted,
           CAST(st[4] AS BIGINT) AS rejected
    FROM folded
    """,
    "LIVE streaming token-bucket limiter (custom stateful operator, "
    "streaming/stateful.py::rate_limit_stream): four integers of "
    "state per key carried across micro-batches, update-mode "
    "emissions of running accepted/rejected counts — the enforcing "
    "twin of the batch `rate_limiter_token_bucket` audit. Under "
    "availableNow a single-file parquet stream folds each key in "
    "(ts, event_id) order exactly like the batch recurrence, so "
    "the ORACLE is the same per-user integer fold — streaming "
    "semantics checked bit-exactly through the real "
    "applyInPandasWithState path.",
    ("streaming", "stateful", "rate-limit", "events", "python-stateful"),
)
def streaming_rate_limiter(spark, sf_dir):
    import uuid

    from pyspark.sql import Window

    from ..sources.tables import load_events_stream
    from ..streaming.stateful import rate_limit_stream

    stream = load_events_stream(spark, sf_dir)
    out = rate_limit_stream(
        stream, capacity_tokens=_TB_CAP, token_us=_TB_TOKEN_US
    )
    sink = f"stream_rl_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(sink)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    _await_stream(q, 120)
    t = spark.table(sink)
    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        t.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("user_id", "n_events", "accepted", "rejected")
    )
