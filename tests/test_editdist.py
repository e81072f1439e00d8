"""Edit-distance similarity join (FastSS deletion neighborhoods)."""

import pytest
from pyspark.sql import functions as F

from oplogtoredis_spark.operators.editdist import (
    deletion_variants,
    edit_distance_pairs,
)


def _pairs(df, k=1, **kw):
    return {
        (r.id_a, r.id_b, r.dist)
        for r in edit_distance_pairs(df, "id", "key", k=k, **kw).collect()
    }


class TestDeletionVariants:
    def test_variants_k1(self, spark):
        out = spark.range(1).select(
            deletion_variants(F.lit("abc"), 1).alias("v")
        ).collect()[0].v
        assert set(out) == {"abc", "bc", "ac", "ab"}

    def test_variants_empty_string(self, spark):
        out = spark.range(1).select(
            deletion_variants(F.lit(""), 1).alias("v")
        ).collect()[0].v
        assert out == [""]

    def test_variants_k2_includes_double_deletions(self, spark):
        out = spark.range(1).select(
            deletion_variants(F.lit("abcd"), 2).alias("v")
        ).collect()[0].v
        assert "cd" in out and "ad" in out and "ab" in out
        # no triple deletions
        assert all(len(v) >= 2 for v in out)

    def test_k_gate(self, spark):
        with pytest.raises(ValueError, match="k must be"):
            deletion_variants(F.lit("x"), 3)


class TestEditDistancePairs:
    def _df(self, spark):
        rows = [
            (1, "kitten"),
            (2, "mitten"),   # substitution: dist 1 from kitten
            (3, "kitte"),    # deletion: dist 1 from kitten, 2 from mitten
            (4, "sitting"),  # dist 3 from kitten
            (5, "kitten"),   # exact dup of 1
        ]
        return spark.createDataFrame(rows, "id long, key string")

    def test_k1_complete_and_precise(self, spark):
        got = _pairs(self._df(spark), k=1)
        assert got == {
            (1, 2, 1), (1, 3, 1), (1, 5, 0), (2, 5, 1), (3, 5, 1),
        }

    def test_k2_adds_distance2_pairs(self, spark):
        got = _pairs(self._df(spark), k=2)
        assert (2, 3, 2) in got            # mitten↔kitte
        assert not any(p[:2] == (1, 4) for p in got)  # dist 3 stays out

    def test_insertion_pairs_found(self, spark):
        df = spark.createDataFrame(
            [(1, "spark"), (2, "sparkk"), (3, "spak")],
            "id long, key string",
        )
        got = _pairs(df, k=1)
        assert (1, 2, 1) in got and (1, 3, 1) in got
        assert not any(p[:2] == (2, 3) for p in got)  # dist 2

    def test_max_bucket_drops_hot_variants(self, spark):
        df = spark.createDataFrame(
            [(i, "same") for i in range(5)] + [(9, "samee")],
            "id long, key string",
        )
        full = _pairs(df, k=1)
        assert len(full) == 10 + 5  # C(5,2) exact + 5 near pairs
        capped = _pairs(df, k=1, max_bucket=3)
        assert len(capped) < len(full)

    def test_no_product_join_in_plan(self, spark):
        plan = (
            edit_distance_pairs(self._df(spark), "id", "key")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_internal_name_in_input_is_tolerated(self, spark):
        # the operator's first select drops every input column except
        # id/key, so a caller column named like an internal can never
        # collide — no spurious guard (review r5s9 simplification)
        df = self._df(spark).withColumn("_ed_var", F.lit(1))
        out = edit_distance_pairs(df, "id", "key")
        assert out.count() >= 0
