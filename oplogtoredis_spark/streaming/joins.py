"""Watermarked stream-stream interval join.

The one join shape Structured Streaming supports natively that the batch
operators here don't cover: BOTH sides are unbounded streams, and a left
row matches right rows with the same key whose event time falls in
``[left_ts + lower_ms, left_ts + upper_ms]``. This is the CDC-consumer
composition for correlating two live feeds (click ↔ trailing purchase,
request ↔ response, write ↔ replica-ack) — the batch analogue is
operators/rangejoin.py; reference context: the ordered publishes of
lib/redispub/publisher.go are exactly what make per-key stream
correlation meaningful downstream.

Scale shape: Spark keys BOTH sides' state stores by the join key and uses
the time-range condition + watermarks to EVICT state — a right row is
droppable once the watermark passes ``right_ts + upper_ms`` (it can no
longer match any future left row), symmetrically for left. So steady-state
memory is O(key-cardinality × window-span × rate), NOT O(stream length) —
pinned in tests via recentProgress stateOperators. The same function on
batch frames degrades to a plain theta join (the oracle form), so one
definition serves both the streaming engine and its batch backfill.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    lower_ms: int,
    upper_ms: int,
    watermark_delay: str | None = None,
    how: str = "inner",
    prefix: str = "r_",
) -> DataFrame:
    """Join rows of ``right`` to ``left`` on ``on`` where
    ``prefix+right_ts ∈ [left_ts + lower_ms, left_ts + upper_ms]``
    (both bounds inclusive; ``lower_ms`` may be negative for a
    look-back). Right columns (except the key) come back ``prefix``ed.

    ``left_ts``/``right_ts`` must be TIMESTAMP columns — event-time state
    eviction only works on real event-time columns, and ``watermark_delay``
    (e.g. "1 hour") is applied to both sides here, after the caller's
    projections, so no upstream cast can strip it. Batch inputs ignore
    the watermark (Spark treats it as a no-op) and plan a plain theta
    join.
    """
    if lower_ms > upper_ms:
        raise ValueError(f"lower_ms {lower_ms} > upper_ms {upper_ms}")
    renames = {
        c: prefix + c for c in right.columns if c != on
    }
    collisions = sorted(set(renames.values()) & set(left.columns))
    if collisions:
        raise ValueError(
            f"prefixed right columns collide with left: {collisions}"
        )
    r = right
    for old, new in renames.items():
        r = r.withColumnRenamed(old, new)
    if watermark_delay is not None:
        left = left.withWatermark(left_ts, watermark_delay)
        r = r.withWatermark(prefix + right_ts, watermark_delay)

    def _iv(ms: int):
        # a plain day-time INTERVAL literal, not make_dt_interval(): the
        # stream-stream OUTER join analyzer derives state watermarks only
        # from literal interval arithmetic in the range condition
        return F.expr(f"INTERVAL '{ms / 1000.0}' SECOND")

    rts = F.col(prefix + right_ts)
    lts = F.col(left_ts)
    cond = (
        (left[on] == r[on])
        & (rts >= lts + _iv(lower_ms))
        & (rts <= lts + _iv(upper_ms))
    )
    return left.join(r, cond, how).drop(r[on])
