"""Streaming joins (SURVEY.md §2.4 J1 and §2.10 T9).

The reference reads two CDC streams but never joins them — the FK
relationship employees↔activities exists only in its DDL
(PROJECT_DOCUMENTATION.md:159) and a batch monitoring query
(KAFKA_LEARNING_MANUAL.md:459-463). The engine provides both join
shapes Structured Streaming supports as first-class operators:

* **stream–static enrichment** — a streaming fact joined to a bounded
  dimension. Stateless: each micro-batch hash-joins against the dim,
  and a broadcast hint keeps the dim on every executor so no shuffle
  of the stream ever happens. This is the J1 "enrich activities with
  the employees table" shape, and at 100 TB/day of stream it is the
  ONLY join whose cost does not grow with stream history.

* **stream–stream interval join** — two unbounded sides, equi-key
  plus an event-time range condition. Watermarks on BOTH sides are
  mandatory here (not optional, as in the reference's aggregations —
  SURVEY T3): the range condition lets Spark derive a state horizon
  per side, so buffered rows are evicted once the other side's
  watermark passes ``ts + upper``. Without them state grows with the
  full stream history.

Both operators are pure plan builders — no ``.start()``; callers pick
sinks/triggers, tests drive them with ``trigger(availableNow=True)``.

Eviction timing caveat (measured, tests/test_streaming_joins.py): the
symmetric hash join removes out-of-horizon state at the END of the
batch in which the watermark passes it, and late input rows are not
pre-filtered against the state watermark — so a late row arriving in
that same batch can still match. The guarantee is therefore "no match
one batch after the horizon passes", which is the right mental model
when reasoning about replay/backfill correctness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    on,
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Join a streaming DataFrame to a static (batch) dimension.

    ``on`` is passed through to ``DataFrame.join`` (column name, list,
    or Column condition). The dimension is broadcast by default —
    stream-side rows never shuffle, which is the property that makes
    this join flat-cost at any stream volume. Left/inner only:
    right/full outer against a static side would need the stream's
    complete history and is rejected by Spark itself.
    """
    if how not in ("left", "inner", "left_outer", "leftouter", "left_semi", "left_anti"):
        raise ValueError(f"stream-static join supports left/inner/semi/anti, got {how!r}")
    d = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(d, on=on, how=how)


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    upper: str,
    lower: str = "0 seconds",
    left_watermark: str = "2 hours",
    right_watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Stream–stream equi-join with an event-time interval condition.

    Matches rows where ``left_key == right_key`` and::

        left_ts + lower  <=  right_ts  <=  left_ts + upper

    Both inputs must be streaming and must carry distinct column
    names (rename before calling — e.g. two readers of the same topic
    joined as a self-join). Watermarks are applied here so the state
    store evicts each side as soon as the opposite watermark clears
    its horizon; ``how`` may be ``inner`` or the outer variants
    Structured Streaming supports (outer rows emit only after the
    watermark proves no match can still arrive).
    """
    l = left.withWatermark(left_ts, left_watermark)
    r = right.withWatermark(right_ts, right_watermark)
    cond = (
        (F.col(left_key) == F.col(right_key))
        & (F.col(right_ts) >= F.col(left_ts) + F.expr(f"INTERVAL {lower}"))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {upper}"))
    )
    return l.join(r, on=cond, how=how)
