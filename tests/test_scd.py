"""SCD2 history derivation: interval chaining, delete closure, compression
semantics (incl. the delete/re-insert boundary and null-safe equality),
tiebreak ordering, and the one-Exchange plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oplogtoredis_spark.operators.scd import scd2_history

COLS = "k string, ts long, seq int, op string, v string"


def _hist(spark, rows, **kw):
    df = spark.createDataFrame(rows, COLS)
    kw.setdefault("op", "op")
    kw.setdefault("tiebreak", "seq")
    out = scd2_history(df, keys="k", attrs=["v"], ts="ts", **kw)
    return {
        (r["k"], r["valid_from"]): (r["v"], r["valid_to"], r["is_current"])
        for r in out.collect()
    }


def test_upserts_chain_intervals(spark):
    h = _hist(
        spark,
        [("a", 10, 0, "i", "x"), ("a", 20, 0, "u", "y"), ("a", 30, 0, "u", "z")],
    )
    assert h == {
        ("a", 10): ("x", 20, False),
        ("a", 20): ("y", 30, False),
        ("a", 30): ("z", None, True),
    }


def test_delete_closes_without_emitting_and_reinsert_reopens(spark):
    h = _hist(
        spark,
        [
            ("a", 10, 0, "i", "x"),
            ("a", 20, 0, "d", None),
            # same attrs as before the delete: must still be a NEW version
            ("a", 30, 0, "i", "x"),
        ],
    )
    assert h == {("a", 10): ("x", 20, False), ("a", 30): ("x", None, True)}


def test_trailing_delete_leaves_no_current_row(spark):
    h = _hist(spark, [("a", 10, 0, "i", "x"), ("a", 20, 0, "d", None)])
    assert h == {("a", 10): ("x", 20, False)}


def test_compression_drops_unchanged_runs_transitively(spark):
    h = _hist(
        spark,
        [
            ("a", 10, 0, "i", "x"),
            ("a", 20, 0, "u", "x"),  # unchanged -> dropped
            ("a", 30, 0, "u", "x"),  # unchanged vs the DROPPED row too
            ("a", 40, 0, "u", "y"),
        ],
    )
    assert h == {("a", 10): ("x", 40, False), ("a", 40): ("y", None, True)}


def test_compress_false_keeps_every_change(spark):
    h = _hist(
        spark,
        [("a", 10, 0, "i", "x"), ("a", 20, 0, "u", "x")],
        compress=False,
    )
    assert h == {("a", 10): ("x", 20, False), ("a", 20): ("x", None, True)}


def test_null_attrs_compress_null_safely(spark):
    h = _hist(
        spark,
        [("a", 10, 0, "i", None), ("a", 20, 0, "u", None), ("a", 30, 0, "u", "x")],
    )
    assert h == {("a", 10): (None, 30, False), ("a", 30): ("x", None, True)}


def test_same_ts_tiebreak_orders_versions(spark):
    # seq=1 first (zero-length interval), seq=2 wins until the next ts.
    df = spark.createDataFrame(
        [("a", 10, 2, "u", "late"), ("a", 10, 1, "u", "early"), ("a", 20, 0, "u", "z")],
        COLS,
    )
    rows = (
        scd2_history(df, keys="k", attrs=["v"], ts="ts", tiebreak="seq", op="op")
        .orderBy("valid_from", "valid_to")
        .collect()
    )
    assert [(r["v"], r["valid_from"], r["valid_to"]) for r in rows] == [
        ("early", 10, 10),
        ("late", 10, 20),
        ("z", 20, None),
    ]


def test_upsert_only_feed_without_op_column(spark):
    df = spark.createDataFrame([("a", 10, "x"), ("a", 20, "y")], "k string, ts long, v string")
    rows = scd2_history(df, keys="k", attrs=["v"], ts="ts").collect()
    assert {(r["valid_from"], r["valid_to"]) for r in rows} == {(10, 20), (20, None)}


def test_keys_are_independent(spark):
    h = _hist(spark, [("a", 10, 0, "i", "x"), ("b", 5, 0, "i", "y")])
    assert h == {("a", 10): ("x", None, True), ("b", 5): ("y", None, True)}


def test_plan_has_exactly_one_exchange(spark):
    df = spark.createDataFrame(
        [("a", 10, 0, "i", "x"), ("a", 20, 0, "u", "y")], COLS
    )
    out = scd2_history(df, keys="k", attrs=["v"], ts="ts", tiebreak="seq", op="op")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_output_columns_and_rename(spark):
    df = spark.createDataFrame([("a", 10, 0, "i", "x")], COLS)
    out = scd2_history(
        df, keys="k", attrs=["v"], ts="ts", op="op",
        valid_from="vf", valid_to="vt", is_current="cur",
    )
    assert out.columns == ["k", "v", "vf", "vt", "cur"]


def test_reserved_internal_names_fail_loud(spark):
    df = spark.createDataFrame([("a", 1, "x")], "k string, ts long, _to string")
    with pytest.raises(ValueError, match="_to"):
        scd2_history(df, keys="k", attrs=["_to"], ts="ts")
