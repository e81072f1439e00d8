"""Salted join (operators/skew.py): result equality with the plain join
under extreme key skew, left-join multiplicity preservation, the salt in
the physical join keys, and guards."""

import pytest
from pyspark.sql import functions as F

from oplogtoredis_spark.operators.skew import salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # 90% of facts share one key — the regime the operator exists for
    rows = [(i, "hot" if i % 10 else f"k{i % 7}", float(i)) for i in range(3000)]
    return spark.createDataFrame(rows, "event_id long, k string, value double")


@pytest.fixture(scope="module")
def dim(spark):
    return spark.createDataFrame(
        [("hot", 1), ("k0", 2), ("k3", 3)], "k string, attr int"
    )


def test_inner_equals_plain_join(spark, skewed, dim):
    got = salted_join(skewed, dim, ["k"], n_salts=8)
    want = skewed.join(dim, "k")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    assert got.columns == want.columns


def test_left_preserves_unmatched_rows(spark, skewed, dim):
    got = salted_join(skewed, dim, ["k"], n_salts=4, how="left")
    want = skewed.join(dim, "k", "left")
    assert sorted(map(tuple, (r for r in got.collect()))) == sorted(
        map(tuple, (r for r in want.collect()))
    )


def test_duplicate_dim_rows_multiply_like_plain_join(spark, skewed):
    dupdim = spark.createDataFrame(
        [("hot", 1), ("hot", 2)], "k string, attr int"
    )
    got = salted_join(skewed, dupdim, ["k"], n_salts=4)
    want = skewed.join(dupdim, "k")
    assert got.count() == want.count()


def test_salt_is_in_the_join_keys(spark, skewed, dim):
    plan = (
        salted_join(skewed, dim, ["k"], n_salts=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "_otr_salt" in plan


def test_guards(spark, skewed, dim):
    with pytest.raises(ValueError, match="n_salts"):
        salted_join(skewed, dim, ["k"], n_salts=1)
    with pytest.raises(ValueError, match="inner|left"):
        salted_join(skewed, dim, ["k"], how="full")
    with pytest.raises(ValueError, match="at least one"):
        salted_join(skewed, dim, [])
    with pytest.raises(ValueError, match="_otr_salt"):
        salted_join(skewed.withColumn("_otr_salt", F.lit(1)), dim, ["k"])
