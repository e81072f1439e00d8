"""Stream-stream interval join (streaming/joins.py): batch == manual
theta join, streaming == batch across micro-batches (cross-batch state
matching), watermark state EVICTION bounded (the scale guarantee), late
drops pinned, and the fail-loud guards."""

from __future__ import annotations

import os
import time

import pandas as pd
import pytest
from pyspark.sql import Row, functions as F

from oplogtoredis_spark.streaming.joins import interval_join


def _write_batches(path, rows_per_file, columns):
    path.mkdir()
    for i, rows in enumerate(rows_per_file):
        p = str(path / f"{i:02d}.parquet")
        pd.DataFrame(rows, columns=columns).to_parquet(p)
        t = time.time() - 100 + i
        os.utime(p, (t, t))
    return str(path)


def _with_ts(df):
    return df.withColumn("ts", F.timestamp_millis("ts_ms")).drop("ts_ms")


def test_batch_mode_matches_manual_theta(spark):
    left = spark.createDataFrame(
        [Row(k=1, ts_ms=1000, lid=1), Row(k=1, ts_ms=5000, lid=2),
         Row(k=2, ts_ms=1000, lid=3)]
    )
    right = spark.createDataFrame(
        [Row(k=1, ts_ms=1000, rid=10),   # == left 1 (inclusive lower 0)
         Row(k=1, ts_ms=3500, rid=11),   # within 2.5s of left 1, and
                                         # within look-back of left 2
         Row(k=2, ts_ms=9000, rid=12)]   # out of window
    )
    out = interval_join(
        _with_ts(left), _with_ts(right), on="k",
        left_ts="ts", right_ts="ts", lower_ms=-2000, upper_ms=2500,
    )
    got = sorted((r["lid"], r["r_rid"]) for r in out.collect())
    assert got == [(1, 10), (1, 11), (2, 11)]


def test_streaming_matches_batch_with_cross_batch_state(spark, tmp_path):
    """Left rows from batch 0 match right rows arriving in batch 1 (and
    vice versa): both sides' state retained under a generous watermark,
    and the emitted set equals the batch recompute exactly."""
    lrows = [
        [(1, 1000, 1), (2, 2000, 2)],
        [(1, 8000, 3)],
    ]
    rrows = [
        [(1, 9000, 10)],                       # matches batch-1 LEFT lid=3
        [(1, 2000, 11), (2, 2500, 12)],        # matches batch-0 lefts
    ]
    lp = _write_batches(tmp_path / "l", lrows, ["k", "ts_ms", "lid"])
    rp = _write_batches(tmp_path / "r", rrows, ["k", "ts_ms", "rid"])

    def join(l, r):
        return interval_join(
            _with_ts(l), _with_ts(r), on="k", left_ts="ts", right_ts="ts",
            lower_ms=0, upper_ms=2000, watermark_delay="1 hour",
        )

    expect = sorted(
        (r["lid"], r["r_rid"])
        for r in join(
            spark.read.parquet(lp), spark.read.parquet(rp)
        ).collect()
    )
    assert expect == [(1, 11), (2, 12), (3, 10)]  # fixture sanity

    ls = spark.readStream.schema("k long, ts_ms long, lid long").option(
        "maxFilesPerTrigger", 1
    ).parquet(lp)
    rs = spark.readStream.schema("k long, ts_ms long, rid long").option(
        "maxFilesPerTrigger", 1
    ).parquet(rp)
    q = (
        join(ls, rs)
        .writeStream.format("memory")
        .queryName("ssj_parity")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r["lid"], r["r_rid"]) for r in spark.table("ssj_parity").collect()
    )
    assert got == expect


def test_state_eviction_is_watermark_bounded(spark, tmp_path):
    """The scale guarantee: with a tight watermark, rows older than
    watermark - window are EVICTED from both state stores — total state
    rows stay far below the rows fed (not O(stream length))."""
    wk = 1000
    # batch 0: an early cluster; batch 1+: time marches on 100s per file,
    # so the watermark (delay 1s) passes the early cluster immediately
    lrows = [[(1, 0, 1), (1, 500, 2)]] + [
        [(1, (i + 1) * 100_000, 10 + i)] for i in range(4)
    ]
    rrows = [[(1, 100, 10)]] + [
        [(1, (i + 1) * 100_000 + 50, 20 + i)] for i in range(4)
    ]
    lp = _write_batches(tmp_path / "l", lrows, ["k", "ts_ms", "lid"])
    rp = _write_batches(tmp_path / "r", rrows, ["k", "ts_ms", "rid"])
    ls = spark.readStream.schema("k long, ts_ms long, lid long").option(
        "maxFilesPerTrigger", 1
    ).parquet(lp)
    rs = spark.readStream.schema("k long, ts_ms long, rid long").option(
        "maxFilesPerTrigger", 1
    ).parquet(rp)
    out = interval_join(
        _with_ts(ls), _with_ts(rs), on="k", left_ts="ts", right_ts="ts",
        lower_ms=0, upper_ms=wk, watermark_delay="1 second",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("ssj_state")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    totals = [
        so["numRowsTotal"]
        for p in q.recentProgress
        for so in (p["stateOperators"] or [])
    ]
    assert totals, "no state-operator progress recorded"
    fed = sum(len(b) for b in lrows) + sum(len(b) for b in rrows)
    # eviction happened: the final state never holds the whole feed, and
    # the early cluster's rows were removed after the watermark passed
    assert totals[-1] < fed, (totals, fed)
    assert min(totals) <= 4, totals


def test_left_outer_emits_unmatched_after_watermark(spark, tmp_path):
    """leftOuter: matched rows emit like inner; an unmatched left row is
    emitted with nulls once the watermark proves no future right row can
    match it (here the availableNow run's final watermark advance)."""
    lrows = [
        [(1, 1000, 1), (2, 1000, 2)],           # lid=2 never matches
        [(1, 500_000, 3)],                       # advances the watermark
    ]
    rrows = [
        [(1, 1500, 10)],
        [(1, 500_100, 11)],
    ]
    lp = _write_batches(tmp_path / "l", lrows, ["k", "ts_ms", "lid"])
    rp = _write_batches(tmp_path / "r", rrows, ["k", "ts_ms", "rid"])
    ls = spark.readStream.schema("k long, ts_ms long, lid long").option(
        "maxFilesPerTrigger", 1
    ).parquet(lp)
    rs = spark.readStream.schema("k long, ts_ms long, rid long").option(
        "maxFilesPerTrigger", 1
    ).parquet(rp)
    out = interval_join(
        _with_ts(ls), _with_ts(rs), on="k", left_ts="ts", right_ts="ts",
        lower_ms=0, upper_ms=1000, watermark_delay="2 seconds",
        how="leftOuter",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("ssj_outer")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r["lid"], r["r_rid"]) for r in spark.table("ssj_outer").collect()
    )
    assert (1, 10) in got                      # matched pair
    assert (2, None) in got                    # unmatched left, null-padded
    assert (3, 11) in got


def test_prefix_collision_raises(spark):
    df = spark.createDataFrame([Row(k=1, ts_ms=0, r_v=1)])
    with pytest.raises(ValueError, match="collide"):
        interval_join(
            _with_ts(df), _with_ts(spark.createDataFrame(
                [Row(k=1, ts_ms=0, v=2)]
            )),
            on="k", left_ts="ts", right_ts="ts", lower_ms=0, upper_ms=1,
        )


def test_invalid_bounds_raise(spark):
    df = spark.createDataFrame([Row(k=1, ts_ms=0, v=1)])
    with pytest.raises(ValueError, match="lower_ms"):
        interval_join(
            _with_ts(df), _with_ts(df.withColumnRenamed("v", "w")),
            on="k", left_ts="ts", right_ts="ts", lower_ms=5, upper_ms=1,
        )
