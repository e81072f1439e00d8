"""Streaming space-saving heavy hitters (streaming/stateful.py
heavy_hitters_stream): cross-batch count accumulation, exact regime,
space-saving invariants under overflow, and bounded state."""

from __future__ import annotations

import os
import time
from collections import Counter

import pandas as pd
import pytest

from oplogtoredis_spark.streaming.stateful import heavy_hitters_stream


def _write_batches(path, items_per_file):
    path.mkdir()
    for i, items in enumerate(items_per_file):
        p = str(path / f"{i:02d}.parquet")
        pd.DataFrame({"item": items}).to_parquet(p)
        t = time.time() - 100 + i
        os.utime(p, (t, t))
    return str(path)


def _run(spark, src, ckpt, name, capacity, n_partitions=4):
    stream = spark.readStream.schema("item string").option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = (
        heavy_hitters_stream(stream, "item", capacity, n_partitions)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).collect()


def _latest_summary(rows):
    """Union of each partition's latest-ver emission."""
    last_ver = {}
    for r in rows:
        last_ver[r.pid] = max(last_ver.get(r.pid, 0), r.ver)
    return {
        r.item: (r.n, r.err)
        for r in rows
        if r.ver == last_ver[r.pid]
    }


def test_exact_regime_converges_to_group_by(spark, tmp_path):
    batches = [
        ["a", "b", "a", "c"],
        ["b", "a", "d"],
        ["a", "e", "e", "b"],
    ]
    rows = _run(spark, _write_batches(tmp_path / "s", batches),
                str(tmp_path / "ck"), "hh_exact", capacity=8)
    got = _latest_summary(rows)
    true = Counter(x for b in batches for x in b)
    assert {i: c for i, (c, _) in got.items()} == dict(true)
    assert all(e == 0 for _, e in got.values())


def test_cross_batch_accumulation_and_ver_monotone(spark, tmp_path):
    batches = [["x", "x"], ["x"], ["x", "x", "x"]]
    rows = _run(spark, _write_batches(tmp_path / "s", batches),
                str(tmp_path / "ck"), "hh_ver", capacity=2, n_partitions=1)
    xs = sorted((r.ver, r.n) for r in rows if r.item == "x")
    assert xs == [(1, 2), (2, 3), (3, 6)]


def test_space_saving_invariants_under_overflow(spark, tmp_path):
    """capacity 3, one partition, 6 distinct items: every tracked item
    satisfies count - err <= true <= count, and the genuinely heavy item
    is present with its exact count-bound."""
    stream = (["hot"] * 30 + ["w1", "w2", "w3", "w4", "w5"] * 2)
    rows = _run(spark, _write_batches(tmp_path / "s", [stream]),
                str(tmp_path / "ck"), "hh_ovf", capacity=3, n_partitions=1)
    got = _latest_summary(rows)
    assert len(got) == 3
    true = Counter(stream)
    for item, (cnt, err) in got.items():
        assert cnt - err <= true[item] <= cnt, (item, cnt, err)
    assert "hot" in got and got["hot"][0] >= 30
    # state is bounded by capacity in every emission
    per_emission = Counter((r.pid, r.ver) for r in rows)
    assert max(per_emission.values()) <= 3


def test_sharding_never_double_counts(spark, tmp_path):
    """Items split across partitions: global union equals the exact
    counts when every partition stays under capacity."""
    items = [f"i{j}" for j in range(20) for _ in range(j + 1)]
    rows = _run(spark, _write_batches(tmp_path / "s", [items[:100], items[100:]]),
                str(tmp_path / "ck"), "hh_shard", capacity=32, n_partitions=4)
    got = _latest_summary(rows)
    true = Counter(items)
    assert {i: c for i, (c, _) in got.items()} == dict(true)
    # each item reported by exactly one partition
    assert len({(r.item, r.pid) for r in rows}) == len({r.item for r in rows})


def test_guards(spark):
    df = spark.range(1).selectExpr("cast(id as string) item")
    with pytest.raises(ValueError, match="capacity"):
        heavy_hitters_stream(df, "item", 0)
    with pytest.raises(ValueError, match="n_partitions"):
        heavy_hitters_stream(df, "item", 4, 0)
