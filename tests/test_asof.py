"""as-of join: semantics (backward inclusive, ties, tolerance, left-join
nulls) and the scale-shape guarantee (one Exchange, no theta-join)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from oplogtoredis_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        [
            Row(k="a", ts_ms=5, lid=1),
            Row(k="a", ts_ms=10, lid=2),   # == right ts: inclusive match
            Row(k="a", ts_ms=11, lid=3),
            Row(k="a", ts_ms=99, lid=4),
            Row(k="b", ts_ms=7, lid=5),    # before any right row -> null
            Row(k="c", ts_ms=1, lid=6),    # key absent on the right -> null
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k="a", ts_ms=4, rid=100, v=1.0),
            Row(k="a", ts_ms=10, rid=101, v=2.0),
            Row(k="a", ts_ms=10, rid=102, v=3.0),  # tie: greatest rid wins
            Row(k="a", ts_ms=50, rid=103, v=4.0),
            Row(k="b", ts_ms=8, rid=104, v=5.0),
        ]
    )
    return left, right


def _by_lid(df):
    return {r["lid"]: r for r in df.collect()}

def test_backward_inclusive_with_tie_break(spark, sides):
    left, right = sides
    out = _by_lid(asof_join(left, right, on="k", right_tiebreak="rid"))
    assert out[1]["r_rid"] == 100          # 5 -> right@4
    assert out[2]["r_rid"] == 102          # 10 -> right@10 (inclusive), rid 102 > 101
    assert out[2]["r_v"] == 3.0
    assert out[3]["r_rid"] == 102          # 11 -> still the 10ms pair
    assert out[4]["r_rid"] == 103          # 99 -> right@50
    assert out[5]["r_rid"] is None         # left@7 predates right@8
    assert out[6]["r_rid"] is None         # no right rows for key c
    assert sorted(out) == [1, 2, 3, 4, 5, 6]  # every left row survives


def test_tolerance_nulls_stale_matches(spark, sides):
    left, right = sides
    out = _by_lid(
        asof_join(left, right, on="k", right_tiebreak="rid", tolerance_ms=5)
    )
    assert out[1]["r_rid"] == 100          # 5-4=1 <= 5
    assert out[2]["r_rid"] == 102          # 0 <= 5
    assert out[4]["r_rid"] is None         # 99-50=49 > 5 -> stale, nulled


def test_left_columns_unchanged_and_prefixed(spark, sides):
    left, right = sides
    out = asof_join(left, right, on="k", right_tiebreak="rid", prefix="p_")
    assert out.columns == ["k", "ts_ms", "lid", "p_ts_ms", "p_rid", "p_v"]


def test_plan_is_one_exchange_no_theta_join(spark, sides):
    """The scale guarantee: carry-forward, not an inequality join — exactly
    one Exchange (on the key) and no Join node at all in the plan."""
    left, right = sides
    plan = asof_join(left, right, on="k", right_tiebreak="rid")._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    n_exchange = plan.count("Exchange hashpartitioning")
    assert n_exchange == 1, plan


def test_multi_key_join(spark):
    left = spark.createDataFrame([Row(a=1, b="x", ts_ms=10, lid=1)])
    right = spark.createDataFrame(
        [
            Row(a=1, b="x", ts_ms=9, rid=1),
            Row(a=1, b="y", ts_ms=9, rid=2),  # other composite key: no match
        ]
    )
    out = _by_lid(asof_join(left, right, on=["a", "b"], right_tiebreak="rid"))
    assert out[1]["r_rid"] == 1
