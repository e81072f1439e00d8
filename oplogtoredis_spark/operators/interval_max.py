"""M2 — interval-max metric with completed-interval reporting (SURVEY §2).

Reference: the IntervalMaxMetric gauge reports the max observed value over
the last *completed* disjoint interval on a monotonic clock — a reading
never reflects a partially elapsed window, and an interval with no
observations reports nothing (/root/reference/lib/oplog/
interval_max_metric.go:18-315; behavior pinned in
interval_max_metric_test.go).

Spark-first mapping:
  * Streaming: a tumbling window aggregate in APPEND output mode with a
    watermark IS this discipline — Spark finalizes (emits) a window only
    after the watermark passes its end, so every emitted row is a completed
    interval's max. No custom state needed.
  * Batch/replay (below): bucket to ``floor(ts / interval)`` and keep only
    buckets whose end is ≤ the reporting clock ``now`` — the current
    (partial) interval is withheld exactly like the reference's
    ``report()`` returning the previous interval.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def interval_maxima(
    df: DataFrame,
    ts_ms: Column,
    value: Column,
    interval_ms: int,
    now_ms: Column | int | None = None,
) -> DataFrame:
    """(interval_start_ms, max_value) per COMPLETED tumbling interval.

    ``now_ms``: the reporting clock; intervals with ``start + interval >
    now`` are withheld (partially elapsed). None = report every interval
    (pure replay over a closed log, where the log's end completes them all).
    """
    start = (F.floor(ts_ms / F.lit(interval_ms)) * F.lit(interval_ms)).cast("long")
    out = (
        df.select(start.alias("interval_start_ms"), value.alias("_v"))
        .groupBy("interval_start_ms")
        .agg(F.max("_v").alias("max_value"))
    )
    if now_ms is not None:
        now_col = F.lit(now_ms) if isinstance(now_ms, int) else now_ms
        out = out.where(F.col("interval_start_ms") + F.lit(interval_ms) <= now_col)
    return out


def last_completed_max(
    df: DataFrame,
    ts_ms: Column,
    value: Column,
    interval_ms: int,
    now_ms: int,
) -> DataFrame:
    """The gauge reading: ONE row with the IMMEDIATELY PRECEDING interval's
    max, or zero rows when that interval has no observations. The reference
    gauge reports nothing unless ``currentBucket - previousMax.timeBucket
    == 1`` (interval_max_metric.go Collect) — so data that ended more than
    one interval before ``now`` reads as 'no value', NOT as the stale last
    max, and an empty/absent interval reads as 'no value' rather than 0."""
    prev_start = (now_ms // interval_ms) * interval_ms - interval_ms
    per = interval_maxima(df, ts_ms, value, interval_ms, now_ms)
    return per.where(F.col("interval_start_ms") == F.lit(prev_start))
