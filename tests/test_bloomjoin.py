"""Bloom-filter semi-join: no false negatives ever, exact equality with
the plain semi join, map-side probe plan, and guard rails."""

import pytest
from pyspark.sql import functions as F

from oplogtoredis_spark.operators.bloomjoin import (
    bloom_probe,
    bloom_semi_join,
    build_bloom,
)


@pytest.fixture(scope="module")
def facts(spark):
    return spark.createDataFrame(
        [(i, f"u{i % 100}", float(i)) for i in range(2000)],
        "event_id long, user string, value double",
    )


@pytest.fixture(scope="module")
def dim(spark):
    # 7 of the 100 users
    return spark.createDataFrame(
        [(f"u{i}",) for i in (3, 12, 31, 47, 55, 78, 99)], "user string"
    )


def test_semi_join_equals_plain_semi_join(spark, facts, dim):
    got = bloom_semi_join(facts, dim, "user")
    want = facts.join(dim, "user", "left_semi")
    assert sorted(r.event_id for r in got.collect()) == sorted(
        r.event_id for r in want.collect()
    )
    assert set(got.columns) == set(facts.columns)  # semi join keeps big's cols


def test_probe_is_superset_with_no_false_negatives(spark, facts, dim):
    words = build_bloom(dim, "user", n_bits=256, k_hashes=3)  # tiny: force FPs
    cand = {r.user for r in bloom_probe(facts, "user", words, 3).collect()}
    true = {r.user for r in facts.join(dim, "user", "left_semi").collect()}
    assert true <= cand  # every match survives even at absurd FP rates


def test_null_keys_never_match(spark, dim):
    facts = dim.sparkSession.createDataFrame(
        [(1, None), (2, "u3")], "event_id long, user string"
    )
    words = build_bloom(dim, "user")
    got = bloom_probe(facts, "user", words).collect()
    assert [r.event_id for r in got] == [2]
    out = bloom_semi_join(facts, dim, "user")
    assert [r.event_id for r in out.collect()] == [2]


def test_probe_plan_is_map_side(spark, facts, dim):
    """The probe must not shuffle the fact side: a broadcast (nested-loop)
    join against the single bitmap row plus codegen'd filters only."""
    words = build_bloom(dim, "user")
    plan = (
        bloom_probe(facts, "user", words)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange hashpartitioning" not in plan
    assert "SortMergeJoin" not in plan


def test_empty_dim_and_guards(spark, facts, dim):
    empty = dim.where(F.lit(False))
    assert bloom_semi_join(facts, empty, "user").count() == 0
    with pytest.raises(ValueError, match="multiple of 64"):
        build_bloom(dim, "user", n_bits=100)
    with pytest.raises(ValueError, match=">= 1"):
        build_bloom(dim, "user", k_hashes=0)


def test_deterministic_across_partitionings(spark, facts, dim):
    a = build_bloom(dim.coalesce(1), "user")
    b = build_bloom(dim.repartition(8), "user")
    assert a == b


def test_bloom_internal_column_rejected(spark, dim):
    bad = dim.withColumn("_bloom", F.lit(1))
    with pytest.raises(ValueError, match="_bloom"):
        bloom_probe(bad, "user", build_bloom(dim, "user"))
