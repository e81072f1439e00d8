"""Data-quality expectation suite: per-family semantics, the one-scan
row-local fold, FK null semantics, and empty-input behavior."""

import pytest
from pyspark.sql import functions as F

from oplogtoredis_spark.operators.expectations import (
    accepted_values,
    foreign_key,
    in_range,
    not_null,
    run_expectations,
    unique,
)


@pytest.fixture(scope="module")
def child(spark):
    rows = [
        (1, 10, 5.0, "ok"),
        (2, 10, -1.0, "ok"),      # range violation
        (2, 20, 3.0, "bad"),      # dup id + accepted_values violation
        (3, None, 2.0, "ok"),     # null fk -> NOT an fk violation
        (4, 99, None, "ok"),      # orphan fk + null value
    ]
    return spark.createDataFrame(rows, "id long, pid long, v double, s string")


@pytest.fixture(scope="module")
def parent(spark):
    return spark.createDataFrame([(10,), (20,)], "pk long")


def _report(spark, child, parent):
    out = run_expectations(
        child,
        [
            not_null("v"),
            in_range("v", 0.0, 10.0),
            accepted_values("s", ["ok"]),
            unique(["id"]),
            foreign_key(["pid"], parent, ["pk"]),
        ],
    )
    return {r.check: r.n_violations for r in out.collect()}


def test_check_semantics(spark, child, parent):
    got = _report(spark, child, parent)
    assert got == {
        "not_null:v": 1,
        "in_range:v[0.0,10.0]": 1,           # nulls don't double-count
        "accepted_values:s": 1,
        "unique:id": 1,                       # one EXTRA row for id=2
        "foreign_key:pid": 1,                 # null pid is not checked
    }


def test_empty_table_passes_all(spark, parent):
    empty = spark.createDataFrame([], "id long, pid long, v double, s string")
    got = {
        r.check: r.n_violations
        for r in run_expectations(
            empty,
            [not_null("v"), unique(["id"]), foreign_key(["pid"], parent, ["pk"])],
        ).collect()
    }
    assert got == {"not_null:v": 0, "unique:id": 0, "foreign_key:pid": 0}


def test_row_local_checks_share_one_scan(spark, child):
    out = run_expectations(
        child, [not_null("v"), in_range("v", 0.0, 10.0), accepted_values("s", ["ok"])]
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # one aggregate subtree over one scan: no join, no per-check scan fan-out
    assert plan.count("LocalTableScan") + plan.count("Scan ExistingRDD") <= 2
    assert "Join" not in plan


def test_fk_multi_column_match_simple(spark):
    child = spark.createDataFrame(
        [(1, "a"), (None, "a"), (2, "zz")], "k1 long, k2 string"
    )
    parent = spark.createDataFrame([(1, "a")], "p1 long, p2 string")
    got = {
        r.check: r.n_violations
        for r in run_expectations(
            child, [foreign_key(["k1", "k2"], parent, ["p1", "p2"])]
        ).collect()
    }
    # (None,'a') has a null key column -> unchecked; (2,'zz') is the orphan
    assert got == {"foreign_key:k1,k2": 1}


def test_guards(spark, child, parent):
    with pytest.raises(ValueError, match="no checks"):
        run_expectations(child, [])
    with pytest.raises(ValueError, match="duplicate check names"):
        run_expectations(child, [not_null("v"), not_null("v")])
    with pytest.raises(ValueError, match="column counts differ"):
        foreign_key(["a", "b"], parent, ["pk"])


def test_accepted_values_tolerates_none_in_list(spark):
    """A None inside the accepted list must not poison isin with
    three-valued NULL logic (x IN (..., NULL) is NULL, not False)."""
    df = spark.createDataFrame([("go",), ("??",), (None,)], "lang string")
    got = run_expectations(
        df, [accepted_values("lang", ["go", None])]
    ).collect()[0]
    assert got.n_violations == 1
