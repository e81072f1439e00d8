"""Streaming interval-max state machine (applyInPandasWithState) — the
reference gauge's Report()/bucket-retirement semantics carried across
micro-batches (interval_max_metric.go:18-315). Files are fed one per
micro-batch so state genuinely crosses epoch boundaries."""

import os
import time

import pandas as pd
import pytest

from oplogtoredis_spark.streaming.stateful import interval_max_stream

INTERVAL = 1000


def _write_batches(tmp_path, batches):
    src = tmp_path / "events"
    src.mkdir()
    for i, rows in enumerate(batches):
        p = str(src / f"{i:02d}.parquet")
        pd.DataFrame(rows, columns=["key", "ts_ms", "value"]).to_parquet(p)
        # file source admits in mtime order — force it to match batch order
        t = time.time() - 100 + i
        os.utime(p, (t, t))
    return str(src)


def _run(spark, tmp_path, src, files_per_trigger=1):
    events = (
        spark.readStream.schema("key string, ts_ms long, value double")
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(src)
    )
    out = interval_max_stream(events, "key", "ts_ms", "value", INTERVAL)
    name = f"imax_{abs(hash((src, files_per_trigger))) % 10**8}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{files_per_trigger}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return {
        (r["key"], r["interval_start_ms"]): r["max_value"]
        for r in spark.table(name).collect()
    }


def test_state_crosses_micro_batches_and_drops_late(spark, tmp_path):
    batches = [
        # batch 0: key a bucket 0 (max 5), key b bucket 0 (max 2)
        [("a", 100, 5.0), ("a", 900, 1.0), ("b", 500, 2.0)],
        # batch 1: key a bucket 0 continues (max -> 7), then bucket 1
        # arrives (retires bucket 0); key b advances to bucket 1 — a
        # same-batch disordered bucket-0 row (800, 1.5) is ABSORBED
        # (intra-batch fold is event-time ordered, deterministic under
        # shuffle — lateness is judged at batch boundaries only)
        [("a", 950, 7.0), ("a", 1100, 3.0), ("b", 1200, 4.0), ("b", 800, 1.5)],
        # batch 2: key a jumps to bucket 5 (retires bucket 1; empty
        # buckets 2-4 emit nothing — reference gauge reports nothing for
        # empty intervals); key b gets a CROSS-BATCH late bucket-0 row,
        # which must be dropped (its bucket retired in a prior epoch)
        [("a", 5500, 8.0), ("b", 900, 99.0)],
    ]
    got = _run(spark, tmp_path, _write_batches(tmp_path, batches))
    assert got == {
        ("a", 0): 7.0,  # max across batches 0+1 — state crossed the epoch
        ("a", 1000): 3.0,  # retired by the bucket-5 jump
        ("b", 0): 2.0,  # same-batch 1.5 absorbed but < 2.0; late 99.0 dropped
        # ("b", 1000) and ("a", 5000) in flight: withheld (incomplete)
    }


def test_single_batch_equals_split_batches(spark, tmp_path):
    rows = [
        ("a", 100, 5.0), ("a", 950, 7.0), ("a", 1100, 3.0),
        ("a", 2100, 9.0), ("b", 500, 2.0), ("b", 1200, 4.0),
    ]
    d1 = tmp_path / "one"; d1.mkdir()
    split = _run(spark, d1, _write_batches(d1, [rows[:2], rows[2:4], rows[4:]]))
    d2 = tmp_path / "all"; d2.mkdir()
    whole = _run(spark, d2, _write_batches(d2, [rows]), files_per_trigger=10)
    assert split == whole == {("a", 0): 7.0, ("a", 1000): 3.0, ("b", 0): 2.0}


def test_group_spanning_arrow_chunks_is_order_invariant(spark, tmp_path):
    """ADVICE r3: a group larger than arrow.maxRecordsPerBatch arrives as
    multiple chunks in arbitrary order — a later chunk's LOWER bucket must
    still be absorbed (the fold drains all chunks before judging lateness),
    so the tiny-chunk result equals the unchunked one."""
    rows = [  # one key, 12 rows, buckets deliberately descending then mixed
        ("a", 3100, 1.0), ("a", 3200, 6.0), ("a", 2100, 9.0), ("a", 2200, 2.0),
        ("a", 1100, 4.0), ("a", 1200, 8.0), ("a", 100, 5.0), ("a", 200, 3.0),
        ("a", 900, 7.0), ("a", 1900, 1.5), ("a", 2900, 2.5), ("a", 3900, 0.5),
    ]
    expected = {("a", 0): 7.0, ("a", 1000): 8.0, ("a", 2000): 9.0}
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
        d1 = tmp_path / "tiny"; d1.mkdir()
        tiny = _run(spark, d1, _write_batches(d1, [rows]), files_per_trigger=10)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    d2 = tmp_path / "big"; d2.mkdir()
    whole = _run(spark, d2, _write_batches(d2, [rows]), files_per_trigger=10)
    assert tiny == whole == expected


def test_state_ttl_retires_idle_keys_and_bounds_state(spark, tmp_path):
    """state_ttl_ms GC (reference's NewIntervalMaxMetricVec expiry,
    interval_max_metric.go): keys idle past the TTL are retired — their
    in-flight bucket EMITS (no data loss) and the state row is removed, so
    state count tracks recently-seen keys, not all keys ever."""
    src = tmp_path / "events"; src.mkdir()
    events = (
        spark.readStream.schema("key string, ts_ms long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = interval_max_stream(
        events, "key", "ts_ms", "value", INTERVAL, state_ttl_ms=800
    )
    q = (
        out.writeStream.format("memory")
        .queryName("imax_ttl")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    # NOTE: no processAllAvailable() here — a ProcessingTimeTimeout query
    # keeps scheduling timeout-check batches forever, which starves that
    # call; poll the sink with a deadline instead.
    def poll(pred, timeout=150):  # generous: timeout-check batch scheduling
        # is wall-clock and this shared host's load swings 0→20
        deadline = time.time() + timeout
        while time.time() < deadline:
            got = {
                (r["key"], r["interval_start_ms"]): r["max_value"]
                for r in spark.table("imax_ttl").collect()
            }
            if pred(got):
                return got
            time.sleep(0.5)
        raise AssertionError(f"timed out waiting; last sink state: {got}")

    try:
        p0 = str(src / "00.parquet")
        pd.DataFrame(
            [("a", 100, 5.0), ("b", 300, 2.0)],
            columns=["key", "ts_ms", "value"],
        ).to_parquet(p0)
        # a and b go idle; after the TTL their in-flight bucket-0 rows are
        # retired-and-emitted by a timeout-check batch
        got = poll(lambda g: g == {("a", 0): 5.0, ("b", 0): 2.0})
        # a fresh key arrives AFTER a+b were evicted; it too idles out and
        # retires — churn through 3 keys total
        p1 = str(src / "01.parquet")
        pd.DataFrame(
            [("c", 100, 9.0)], columns=["key", "ts_ms", "value"]
        ).to_parquet(p1)
        poll(lambda g: g == {("a", 0): 5.0, ("b", 0): 2.0, ("c", 0): 9.0})
        # bounded state: 3 keys ever seen, but the store never held more
        # than the 2 concurrently-live ones (a+b), and ends empty. The
        # sink shows c's eviction BEFORE the evicting batch's progress
        # entry lands in recentProgress — poll for the zero-state entry
        # instead of asserting on whatever progress happens to be last.
        deadline = time.time() + 60
        counts: list[int] = []
        while time.time() < deadline:
            counts = [
                p["stateOperators"][0]["numRowsTotal"]
                for p in q.recentProgress
                if p.get("stateOperators")
            ]
            if counts and counts[-1] == 0:
                break
            time.sleep(0.5)
        assert counts and max(counts) <= 2
        assert counts[-1] == 0
    finally:
        q.stop()


def test_restart_resumes_state_from_checkpoint(spark, tmp_path):
    src = tmp_path / "events"; src.mkdir()
    ck = str(tmp_path / "ckpt")

    def run_once():
        events = (
            spark.readStream.schema("key string, ts_ms long, value double")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        out = interval_max_stream(events, "key", "ts_ms", "value", INTERVAL)
        q = (
            out.writeStream.format("parquet")
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    p0 = str(src / "00.parquet")
    pd.DataFrame([("a", 100, 5.0)], columns=["key", "ts_ms", "value"]).to_parquet(p0)
    os.utime(p0, (time.time() - 100, time.time() - 100))
    run_once()  # bucket 0 in flight, nothing emitted yet
    p1 = str(src / "01.parquet")
    pd.DataFrame([("a", 1200, 3.0)], columns=["key", "ts_ms", "value"]).to_parquet(p1)
    run_once()  # restarted query: state store must recall bucket 0 max 5.0
    out = pd.read_parquet(str(tmp_path / "out"))
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["key"], r["interval_start_ms"], r["max_value"]) == ("a", 0, 5.0)


def test_event_time_ttl_is_replay_speed_invariant(spark, tmp_path):
    """ttl_clock="event" (VERDICT r4 #3): an HOUR-long TTL must retire idle
    keys in a seconds-long backfill because expiry rides the WATERMARK (the
    data's clock), not wall time — and, unlike ProcessingTimeTimeout, an
    availableNow run terminates cleanly (no perpetual timeout-check batches),
    so awaitTermination works."""
    interval = 60_000           # 1-minute buckets
    ttl = 3_600_000             # 1-hour idle TTL — wall-clock could never fire here
    batches = [
        [("a", 30_000, 5.0)],                # a: bucket 0
        [("b", 10_000_000, 2.0)],            # watermark jumps ~2.7h of data time
        [("b", 20_000_000, 3.0)],            # watermark 10M > a's expiry 3.66M
    ]
    src = _write_batches(tmp_path, batches)
    events = (
        spark.readStream.schema("key string, ts_ms long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = interval_max_stream(
        events, "key", "ts_ms", "value", interval,
        state_ttl_ms=ttl, ttl_clock="event",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("imax_ettl")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["key"], r["interval_start_ms"]): r["max_value"]
        for r in spark.table("imax_ettl").collect()
    }
    assert got == {
        ("a", 0): 5.0,            # retired by EVENT-time TTL during the replay
        ("b", 9_960_000): 2.0,    # retired by b's own bucket advance
        # b's bucket 19_980_000 in flight: withheld (incomplete)
    }
    # bounded state on the data's clock: a was evicted while b stayed live
    counts = [
        p["stateOperators"][0]["numRowsTotal"]
        for p in q.recentProgress
        if p.get("stateOperators")
    ]
    assert counts and max(counts) <= 2 and counts[-1] == 1


def test_ttl_clock_validation_and_processing_default(spark, tmp_path):
    """Bad ttl_clock fails loud; default stays the reference-parity
    processing clock (plan uses ProcessingTimeTimeout only when a TTL is
    set, NoTimeout otherwise — existing tests pin those behaviors)."""
    import pytest as _pytest

    events = (
        spark.readStream.schema("key string, ts_ms long, value double")
        .parquet(str(tmp_path))
    )
    with _pytest.raises(ValueError, match="ttl_clock"):
        interval_max_stream(
            events, "key", "ts_ms", "value", 1000,
            state_ttl_ms=100, ttl_clock="lamport",
        )
