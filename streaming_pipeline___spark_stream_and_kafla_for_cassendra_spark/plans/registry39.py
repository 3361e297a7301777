"""Round-3 registry additions, batch 26 — streaming windowFunnel
twin, content-defined chunking, and time-decay attribution.

Same contract as ``registry.py``. Imported at the bottom of
``registry.py``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import _await_stream, _register, _t
from .registry34 import _WF_CASE, _WF_WINDOW_US

# ---------------------------------------------------------------------------
# Streaming windowFunnel (stateful twin of window_funnel_users)
# ---------------------------------------------------------------------------


@_register(
    "streaming_window_funnel",
    f"""
    WITH coded AS (
      SELECT user_id,
             list([CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT),
                   CAST({_WF_CASE} AS BIGINT)]
                  ORDER BY ts, event_id) AS xs
      FROM events
      WHERE {_WF_CASE} > 0
      GROUP BY user_id
    )
    SELECT user_id,
           CAST(len(xs) AS BIGINT) AS n_funnel_events,
           CAST(list_reduce(
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
               ])[3] AS BIGINT) AS max_stage
    FROM coded
    """,
    "LIVE streaming windowFunnel (custom stateful operator, "
    "streaming/stateful.py::window_funnel_stream): the [stage, "
    "start, best] integer recurrence of `window_funnel_users` "
    "carried across micro-batches per user, update-mode emissions "
    "of the running funnel depth — the real-time 'how deep is this "
    "user right now' signal. Under availableNow the single-file "
    "parquet stream folds each key in (ts, event_id) order exactly "
    "like the batch fold, so the ORACLE is the identical per-user "
    "recurrence — a second stateful semantic (after "
    "`streaming_rate_limiter`) proven bit-exactly through the real "
    "applyInPandasWithState path.",
    ("streaming", "stateful", "funnel", "events", "python-stateful"),
)
def streaming_window_funnel(spark, sf_dir):
    import uuid

    from pyspark.sql import Window

    from ..sources.tables import load_events_stream
    from ..streaming.stateful import window_funnel_stream

    stream = load_events_stream(spark, sf_dir)
    out = window_funnel_stream(stream, window_us=_WF_WINDOW_US)
    sink = f"stream_wf_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(sink)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    _await_stream(q, 120)
    t = spark.table(sink)
    w = Window.partitionBy("user_id").orderBy(F.desc("n_funnel_events"))
    return (
        t.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("user_id", "n_funnel_events", "max_stage")
    )


# ---------------------------------------------------------------------------
# Content-defined chunking (rolling-hash cut points) + dedup potential
# ---------------------------------------------------------------------------

_CDC_W = 8          # rolling window chars
_CDC_B = 257        # polynomial base
_CDC_M = 1_000_003  # modulus
_CDC_MASK = 64      # expected chunk size ~ 64 chars

_CDC_HASH = " + ".join(
    f"CAST(ascii(substr(s, i + {k}, 1)) AS BIGINT) * {_CDC_B ** k % _CDC_M}"
    for k in range(_CDC_W)
)


@_register(
    "content_defined_chunking_documents",
    f"""
    WITH base AS (
      SELECT doc_id, lower(text) AS s FROM documents
      WHERE length(text) > {_CDC_W}
    ),
    cuts AS (
      SELECT doc_id, s,
             list_filter(
               list_transform(generate_series(1, length(s) - {_CDC_W}),
                 i -> CASE WHEN ({_CDC_HASH}) % {_CDC_M} % {_CDC_MASK} = 0
                      THEN i + {_CDC_W - 1} ELSE 0 END),
               x -> x > 0) AS cutpos
      FROM base
    ),
    bounds AS (
      SELECT doc_id, s,
             list_prepend(CAST(0 AS BIGINT),
               list_append(cutpos, CAST(length(s) AS BIGINT))) AS bs
      FROM cuts
    ),
    chunks AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(bs) - 1),
               j -> md5(substr(s, CAST(bs[j] + 1 AS INTEGER),
                               CAST(bs[j + 1] - bs[j] AS INTEGER)))))
               AS chash,
             unnest(list_transform(generate_series(1, len(bs) - 1),
               j -> bs[j + 1] - bs[j])) AS clen
      FROM bounds
    )
    SELECT CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(count(DISTINCT chash) AS BIGINT) AS distinct_chunks,
           CAST(sum(clen) AS BIGINT) AS total_chars,
           CAST(sum(clen) // count(*) AS BIGINT) AS avg_chunk_chars,
           CAST((count(*) - count(DISTINCT chash)) * 1000000
                // count(*) AS BIGINT) AS dedup_ppm
    FROM chunks
    """,
    "Content-defined chunking — the storage-dedup primitive behind "
    "restic/borg/LBFS: a polynomial rolling hash over "
    f"{_CDC_W}-char windows (base {_CDC_B} mod {_CDC_M}, generated "
    "as identical integer arithmetic in both engines) cuts "
    f"wherever hash %% {_CDC_MASK} == 0 — so chunk boundaries "
    "FOLLOW CONTENT and survive insertions that would shift every "
    "fixed-size block. Chunks hash with md5 and the corpus report "
    "(chunk count, distinct chunks, duplicated-chunk ppm) is the "
    "dedup-potential estimate a backup or artifact store quotes. "
    "Scan-local per document (window hashes via one in-row "
    "transform); only chunk hashes shuffle for the distinct count.",
    ("storage", "dedup", "chunking", "documents"),
)
def content_defined_chunking_documents(spark, sf_dir):
    from ..operators.scale import spread_for_compute

    d = _t(spark, sf_dir, "documents")
    # the rolling-hash window fold is heavy per-row expression work
    # that inherits the scan's single fixture split — spread first
    base = spread_for_compute(
        d.select("doc_id", F.lower(F.col("text")).alias("s"))
    ).filter(F.length("s") > _CDC_W)

    # substr(s, i, 1) costs O(i) on UTF8 strings — a quadratic trap
    # on long docs. Split once into an int code array; element_at is
    # O(1), so the whole rolling-hash pass is linear.
    codes = F.transform(
        F.split(F.col("s"), ""), lambda c: F.ascii(c).cast("long")
    )

    def win_hash(i, carr):
        acc = None
        for k in range(_CDC_W):
            term = F.element_at(carr, i + k) * ((_CDC_B ** k) % _CDC_M)
            acc = term if acc is None else acc + term
        return acc

    base = base.withColumn("codes", codes)
    cutpos = F.filter(
        F.transform(
            F.sequence(F.lit(1), F.length("s") - _CDC_W),
            lambda i: F.when(
                win_hash(i, F.col("codes")) % _CDC_M % _CDC_MASK == 0,
                (i + (_CDC_W - 1)).cast("long"),
            ).otherwise(F.lit(0).cast("long")),
        ),
        lambda x: x > 0,
    )
    bounds = base.select(
        "doc_id",
        "s",
        F.concat(
            F.array(F.lit(0).cast("long")),
            cutpos,
            F.array(F.length("s").cast("long")),
        ).alias("bs"),
    )
    chunks = bounds.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("bs") - 1),
                lambda j: F.struct(
                    F.md5(
                        F.col("s")
                        .substr(
                            (F.element_at(F.col("bs"), j) + 1).cast("int"),
                            (
                                F.element_at(F.col("bs"), j + 1)
                                - F.element_at(F.col("bs"), j)
                            ).cast("int"),
                        )
                        .cast("binary")
                    ).alias("chash"),
                    (
                        F.element_at(F.col("bs"), j + 1)
                        - F.element_at(F.col("bs"), j)
                    ).alias("clen"),
                ),
            )
        ).alias("c"),
    ).select(F.col("c.chash").alias("chash"), F.col("c.clen").alias("clen"))
    return chunks.agg(
        F.count("*").cast("long").alias("n_chunks"),
        F.countDistinct("chash").alias("distinct_chunks"),
        F.sum("clen").cast("long").alias("total_chars"),
        F.expr("sum(clen) div count(*)").cast("long").alias(
            "avg_chunk_chars"
        ),
        F.expr(
            "CAST((count(*) - count(DISTINCT chash)) * 1000000 div count(*)"
            " AS BIGINT)"
        ).alias("dedup_ppm"),
    )


# ---------------------------------------------------------------------------
# Time-decay attribution (exponential half-life in integer halvings)
# ---------------------------------------------------------------------------

_TD_WINDOW_DAYS = 7


@_register(
    "attribution_time_decay",
    f"""
    WITH purchases AS (
      SELECT event_id AS pid, user_id, ts AS pts
      FROM events WHERE event_type = 'purchase'
    ),
    touches AS (
      SELECT p.pid, e.event_type AS channel,
             date_diff('second', e.ts, p.pts) // 86400 AS age_days
      FROM purchases p
      JOIN events e
        ON e.user_id = p.user_id
       AND e.event_type IN ('view', 'click')
       AND e.ts < p.pts
       AND e.ts >= p.pts - INTERVAL {_TD_WINDOW_DAYS} DAY
    ),
    weighted AS (
      -- half-life = 1 day in pure integers: weight = 2^(6 - age)
      SELECT pid, channel,
             CAST(64 // power(2, least(age_days, 6)) AS BIGINT) AS w
      FROM touches
    )
    SELECT channel,
           CAST(count(*) AS BIGINT) AS n_touches,
           CAST(sum(w) AS BIGINT) AS decay_weight
    FROM weighted GROUP BY channel
    """,
    "Time-decay attribution with a 1-day half-life in PURE INTEGER "
    "halvings (weight = 2^(6 - age_days), floor-capped at age 6): "
    "recent touches inside the 7-day pre-purchase window earn "
    "exponentially more credit — the recency-weighted member "
    "completing the attribution five: last-touch, linear, "
    "position-based, Shapley, time-decay. Integer weights make the "
    "channel totals order-free exact sums; the touch join is the "
    "same bounded purchase-keyed fan-out as `attribution_linear`.",
    ("join", "attribution", "events"),
)
def attribution_time_decay(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"), "user_id", F.col("ts").alias("pts")
    )
    touches = purchases.join(
        e.filter(F.col("event_type").isin("view", "click")).select(
            F.col("user_id").alias("tu"),
            F.col("event_type").alias("channel"),
            F.col("ts").alias("tts"),
        ),
        (F.col("tu") == F.col("user_id"))
        & (F.col("tts") < F.col("pts"))
        & (
            F.col("tts")
            >= F.col("pts") - F.expr(f"INTERVAL {_TD_WINDOW_DAYS} DAY")
        ),
    ).select(
        "channel",
        F.expr(
            "(CAST(CAST(pts AS TIMESTAMP) AS LONG)"
            " - CAST(CAST(tts AS TIMESTAMP) AS LONG)) div 86400"
        ).alias("age_days"),
    )
    w = F.expr("64 div CAST(power(2, least(age_days, 6)) AS BIGINT)").cast(
        "long"
    )
    return touches.select("channel", w.alias("w")).groupBy("channel").agg(
        F.count("*").alias("n_touches"),
        F.sum("w").cast("long").alias("decay_weight"),
    )
