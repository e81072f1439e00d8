"""Gap-based sessionization: inclusive-gap boundary semantics, the native
session_window plan, and streaming==batch parity through a watermark."""

from __future__ import annotations

import os
import time

import pandas as pd
import pytest
from pyspark.sql import Row, functions as F

from oplogtoredis_spark.operators.sessions import sessionize

GAP_MS = 1000


def _rows(df):
    return sorted(
        (
            (r["k"], r["session_start_ms"], r["session_last_ms"], r["n_events"])
            for r in df.collect()
        )
    )


def _mk(spark, rows):
    df = spark.createDataFrame([Row(k=k, ts_ms=t) for k, t in rows])
    return df.withColumn("ts", F.timestamp_millis("ts_ms"))


def test_strict_gap_boundary(spark):
    """diff <= gap chains (Spark merges touching session windows — a diff of
    EXACTLY gap_ms stays in the session); only diff > gap starts a new one.
    The DuckDB oracle mirrors this with `ts - prev > gap` as the break."""
    df = _mk(
        spark,
        [("a", 0), ("a", 999), ("a", 1998), ("a", 2999), ("b", 0), ("b", 1000)],
    )
    out = _rows(sessionize(df, ["k"], "ts", "1 seconds"))
    assert out == [
        ("a", 0, 1998, 3),      # 0..999..1998 chain (each diff 999 <= 1000)
        ("a", 2999, 2999, 1),   # 2999-1998 = 1001 > gap -> new session
        ("b", 0, 1000, 2),      # diff exactly 1000 == gap -> chains
    ]


def test_caller_aggs_and_single_event_sessions(spark):
    df = _mk(spark, [("a", 0), ("a", 10_000)]).withColumn("v", F.lit(2.0))
    out = sessionize(
        df, ["k"], "ts", "1 seconds", aggs=[F.sum("v").alias("sv")]
    ).collect()
    assert sorted((r["n_events"], r["sv"]) for r in out) == [(1, 2.0), (1, 2.0)]


def test_plan_uses_native_session_window(spark):
    """Spark-first: the plan must be a session-window aggregate (one
    Exchange keyed on the session key), not a window-function sort pass."""
    df = _mk(spark, [("a", 0)])
    plan = (
        sessionize(df, ["k"], "ts", "1 seconds")
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "session_window" in plan


def test_streaming_matches_batch(spark, tmp_path):
    """The same session_window expression under readStream + watermark
    (append mode): sessions arriving across micro-batches merge in state
    and emit once the watermark passes them; the emitted set equals the
    batch recompute. A far-future sentinel per key drives the watermark
    past every real session (its own open session is excluded from the
    compare)."""
    real = [
        ("a", 0), ("a", 900), ("a", 1800),        # one chained session
        ("a", 5000),
        ("b", 100), ("b", 2000), ("b", 2900),
    ]
    late_batch = [("a", 2400), ("b", 3500)]        # extends sessions cross-batch
    sentinel = [("a", 10_000_000), ("b", 10_000_000)]

    src = tmp_path / "sess"
    src.mkdir()
    for i, rows in enumerate([real, late_batch, sentinel]):
        p = str(src / f"{i:02d}.parquet")
        pd.DataFrame(rows, columns=["k", "ts_ms"]).to_parquet(p)
        t = time.time() - 100 + i
        os.utime(p, (t, t))

    batch_df = spark.read.parquet(str(src)).withColumn(
        "ts", F.timestamp_millis("ts_ms")
    )
    expect = [
        r
        for r in _rows(sessionize(batch_df, ["k"], "ts", "1 seconds"))
        if r[1] < 10_000_000
    ]

    stream = (
        spark.readStream.schema("k string, ts_ms long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .withColumn("ts", F.timestamp_millis("ts_ms"))
        # 3s delay: after batch 0 (max event 5000ms) the watermark is
        # 2000ms, so the open sessions survive for the second file's
        # extensions; the sentinel then drives it past everything
        .withWatermark("ts", "3 seconds")
    )
    out = sessionize(stream, ["k"], "ts", "1 seconds")
    q = (
        out.writeStream.format("memory")
        .queryName("sess_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = [
        r
        for r in _rows(spark.table("sess_stream"))
        if r[1] < 10_000_000
    ]
    assert got == expect
    # the cross-batch extension genuinely merged: a's first session spans
    # into the second file's 2400ms event
    assert ("a", 0, 2400, 4) in got
