"""Range join: containment semantics vs a naive theta join, boundary
inclusivity, long-interval routing, and the no-nested-loop plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from oplogtoredis_spark.operators.rangejoin import range_join

BUCKET = 1000


@pytest.fixture(scope="module")
def sides(spark):
    points = spark.createDataFrame(
        [
            Row(k="a", ts_ms=500, pid=1),
            Row(k="a", ts_ms=1000, pid=2),   # exactly on a bucket edge
            Row(k="a", ts_ms=2500, pid=3),
            Row(k="a", ts_ms=9999, pid=4),   # in no interval
            Row(k="b", ts_ms=500, pid=5),    # same ts, other key
        ]
    )
    intervals = spark.createDataFrame(
        [
            Row(k="a", start_ms=0, end_ms=1000, iid=10),      # pid 1, 2 (inclusive end)
            Row(k="a", start_ms=1000, end_ms=2600, iid=11),   # pid 2 (inclusive start), 3
            Row(k="a", start_ms=2600, end_ms=2400, iid=12),   # inverted: matches nothing
            Row(k="b", start_ms=0, end_ms=1000, iid=13),      # pid 5 only (key-scoped)
        ]
    )
    return points, intervals


def _pairs(df):
    return sorted((r["pid"], r["i_iid"]) for r in df.collect())


def _naive(points, intervals, keys=("k",)):
    cond = (intervals["start_ms"] <= points["ts_ms"]) & (
        points["ts_ms"] <= intervals["end_ms"]
    )
    for k in keys:
        cond = cond & (points[k] == intervals[k])
    out = points.join(intervals, cond, "inner")
    return sorted((r["pid"], r["iid"]) for r in out.collect())


def test_matches_naive_theta_join(spark, sides):
    points, intervals = sides
    got = _pairs(range_join(points, intervals, on=["k"], bucket_ms=BUCKET))
    assert got == _naive(points, intervals)
    assert got == [(1, 10), (2, 10), (2, 11), (3, 11), (5, 13)]


def test_interval_columns_prefixed_points_unchanged(spark, sides):
    points, intervals = sides
    out = range_join(points, intervals, on=["k"], bucket_ms=BUCKET)
    assert out.columns == ["k", "ts_ms", "pid", "i_start_ms", "i_end_ms", "i_iid"]


def test_no_keys_global_intervals(spark, sides):
    points, intervals = sides
    got = _pairs(
        range_join(points, intervals.drop("k"), on=[], bucket_ms=BUCKET)
    )
    # without keys every interval is global: b's interval also catches
    # a-side points and vice versa
    assert got == _naive(points, intervals.drop("k"), keys=())


def test_long_interval_errors_by_default(spark):
    points = spark.createDataFrame([Row(ts_ms=5, pid=1)])
    intervals = spark.createDataFrame(
        [Row(start_ms=0, end_ms=10_000_000, iid=1)]
    )
    with pytest.raises(Exception, match="range_join: interval spans"):
        range_join(
            points, intervals, bucket_ms=BUCKET, max_span_buckets=4
        ).collect()


def test_long_interval_broadcast_path(spark):
    points = spark.createDataFrame(
        [Row(k="a", ts_ms=5, pid=1), Row(k="a", ts_ms=7000, pid=2)]
    )
    intervals = spark.createDataFrame(
        [
            Row(k="a", start_ms=0, end_ms=10_000_000, iid=1),  # long -> broadcast
            Row(k="a", start_ms=0, end_ms=1000, iid=2),        # short -> buckets
        ]
    )
    got = _pairs(
        range_join(
            points,
            intervals,
            on=["k"],
            bucket_ms=BUCKET,
            max_span_buckets=4,
            long_intervals="broadcast",
        )
    )
    assert got == [(1, 1), (1, 2), (2, 1)]


def test_default_plan_has_no_nested_loop_join(spark, sides):
    """The scale guarantee: the default path is an EQUALITY join on
    (keys, bucket) — no BroadcastNestedLoopJoin / CartesianProduct node."""
    points, intervals = sides
    plan = (
        range_join(points, intervals, on=["k"], bucket_ms=BUCKET)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan
