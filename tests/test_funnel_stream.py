"""Stateful streaming funnel (streaming/stateful.py funnel_stream):
cross-batch stage advancement with strictly-increasing emissions,
same-ts cascade, the monotone late-event rule, and convergence to the
batch funnel over a multi-batch replay."""

from __future__ import annotations

import os
import time

import pandas as pd
import pytest
from pyspark.sql import functions as F

from oplogtoredis_spark.streaming.stateful import funnel_stream

STAGES = ("signup", "click", "purchase")


def _write_batches(path, rows_per_file):
    path.mkdir()
    for i, rows in enumerate(rows_per_file):
        p = str(path / f"{i:02d}.parquet")
        pd.DataFrame(
            rows, columns=["user_id", "ts_ms", "event_type"]
        ).to_parquet(p)
        t = time.time() - 100 + i
        os.utime(p, (t, t))
    return str(path)


def _run(spark, src, ckpt, name):
    stream = spark.readStream.schema(
        "user_id long, ts_ms long, event_type string"
    ).option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        funnel_stream(stream, STAGES)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def test_cross_batch_advancement_emits_increasing_stages(spark, tmp_path):
    src = _write_batches(
        tmp_path / "ev",
        [
            [(1, 10, "signup"), (1, 20, "view")],
            [(1, 30, "click")],
            [(1, 40, "purchase"), (2, 40, "click")],  # u2 never signs up
        ],
    )
    out = _run(spark, src, str(tmp_path / "ck"), "fst_adv").collect()
    u1 = sorted(
        (r["stage"], r["t_signup_ms"], r["t_click_ms"], r["t_purchase_ms"])
        for r in out
        if r["user_id"] == 1
    )
    # one emission per batch it advanced, stage strictly increasing
    assert u1 == [(1, 10, None, None), (2, 10, 30, None), (3, 10, 30, 40)]
    # u2 never passed stage 1 → no emission at all
    assert not [r for r in out if r["user_id"] == 2]


def test_same_ts_cascade_within_batch(spark, tmp_path):
    src = _write_batches(
        tmp_path / "ev", [[(1, 10, "click"), (1, 10, "signup"),
                           (1, 10, "purchase")]]
    )
    out = _run(spark, src, str(tmp_path / "ck"), "fst_ts").collect()
    assert len(out) == 1
    r = out[0]
    assert (r["stage"], r["t_signup_ms"], r["t_click_ms"],
            r["t_purchase_ms"]) == (3, 10, 10, 10)


def test_late_event_is_ignored_monotone(spark, tmp_path):
    """A cross-batch late signup cannot retro-lower t_signup (exact
    nested-min maintenance would need unbounded per-key event retention);
    the fold's contract is per-key ordered delivery (B2)."""
    src = _write_batches(
        tmp_path / "ev",
        [
            [(1, 100, "signup"), (1, 200, "click")],
            [(1, 50, "signup"), (1, 60, "click")],  # late, already resolved
        ],
    )
    out = _run(spark, src, str(tmp_path / "ck"), "fst_late").collect()
    assert len(out) == 1  # batch 2 advanced nothing → no emission
    assert (out[0]["t_signup_ms"], out[0]["t_click_ms"]) == (100, 200)


def test_converges_to_batch_funnel(spark, tmp_path):
    """Ordered multi-batch replay of a mixed fixture converges to the
    batch operator exactly (stage-0 users joined back like the driver
    query does)."""
    import datetime as dt

    from oplogtoredis_spark.operators.analytics import funnel

    rows = []
    for u in range(1, 8):
        rows += [(u, 10 * u, "signup")]
        if u % 2 == 0:
            rows += [(u, 10 * u + 5, "click")]
        if u % 4 == 0:
            rows += [(u, 10 * u + 9, "purchase")]
        if u == 7:
            rows += [(u, 5, "click")]  # click BEFORE signup: not eligible
    rows.sort(key=lambda r: r[1])
    thirds = [rows[: len(rows) // 3], rows[len(rows) // 3: 2 * len(rows) // 3],
              rows[2 * len(rows) // 3:]]
    src = _write_batches(tmp_path / "ev", thirds)
    out = _run(spark, src, str(tmp_path / "ck"), "fst_conv")
    latest = out.groupBy("user_id").agg(
        F.max("stage").alias("stage"),
        *[F.max_by(f"t_{s}_ms", "stage").alias(f"t_{s}_ms") for s in STAGES],
    )
    base = dt.datetime(2026, 1, 1)
    bdf = spark.createDataFrame(
        [(u, base + dt.timedelta(milliseconds=ts), e) for u, ts, e in rows],
        "user_id long, ts timestamp, event_type string",
    )
    base_ms = int(
        dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc).timestamp() * 1000
    )
    expect = {
        r["user_id"]: (
            r["stage"],
            *[
                None if r[f"t_{s}_ms"] is None else r[f"t_{s}_ms"] - base_ms
                for s in STAGES
            ],
        )
        for r in funnel(bdf, STAGES).collect()
        if r["stage"] > 0
    }
    got = {
        r["user_id"]: (
            r["stage"],
            *[r[f"t_{s}_ms"] for s in STAGES],
        )
        for r in latest.collect()
    }
    assert got == expect


def test_guards(spark):
    df = spark.createDataFrame([], "user_id long, ts_ms long, event_type string")
    with pytest.raises(ValueError):
        funnel_stream(df, ("signup",))
    with pytest.raises(ValueError, match="duplicate"):
        funnel_stream(df, ("a", "b", "a"))
