"""Gap-based sessionization over an event stream.

Groups each key's events into sessions: a new session starts when an event
arrives ``gap`` or more after the previous one. This is the canonical
behavioural rollup over a CDC/event feed (the reference's per-key ordered
delivery — SURVEY.md §2 B2 — exists precisely so consumers can run
stateful per-key logic like this downstream).

Spark-first: ``F.session_window`` — the NATIVE session operator — so
Catalyst plans it as a single hash aggregate with in-partition window
merging (one Exchange on the key, no self-join, no window-function sort
pass), and the identical expression works in Structured Streaming with a
watermark (append mode emits a session once the watermark passes its end;
tests/test_sessions.py pins streaming == batch). Session semantics (pinned
by test_strict_gap_boundary against the engine): events a and b (a ≤ b)
share a session iff ``b - a <= gap`` — INCLUSIVE; Spark merges the touching
windows [a, a+gap) and [b, b+gap) when ``b == a + gap``, so only a gap
STRICTLY greater than ``gap_ms`` starts a new session. Chained
transitively.

For engine-exact parity the caller should truncate event times to the
grain it compares on (the registered query truncates to epoch millis —
``F.timestamp_millis(F.unix_millis(ts))`` — so the DuckDB lag/cumsum
oracle's integer gap arithmetic matches Spark's microsecond windows).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def sessionize(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    gap: str = "30 minutes",
    aggs: Sequence[Column] = (),
) -> DataFrame:
    """Per-(key, session) rollup: ``keys..., session_start_ms,
    session_last_ms, n_events`` plus any caller ``aggs``.

    ``session_start_ms``/``session_last_ms`` are the first/last EVENT times
    of the session in epoch millis (not the window end, which includes the
    trailing gap).
    """
    # Use the column AS-IS when it is already a timestamp: a cast — even a
    # no-op one — strips the event-time watermark metadata, and streaming
    # append-mode aggregation then fails analysis (STREAMING_OUTPUT_MODE).
    from pyspark.sql.types import TimestampType

    if isinstance(df.schema[ts_col].dataType, TimestampType):
        ts = F.col(ts_col)
    else:
        ts = F.col(ts_col).cast("timestamp")
    return (
        df.withColumn("_ts_ms", F.unix_millis(ts))
        .groupBy(F.session_window(ts, gap).alias("_sw"), *keys)
        .agg(
            F.min("_ts_ms").alias("session_start_ms"),
            F.max("_ts_ms").alias("session_last_ms"),
            F.count(F.lit(1)).alias("n_events"),
            *aggs,
        )
        .drop("_sw")
    )
