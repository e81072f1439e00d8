"""Cross-document repeated-span removal (operators/spandedup.py)."""

import pytest
from pyspark.sql import functions as F

from oplogtoredis_spark.operators.spandedup import span_dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _out(df):
    return {
        r["doc_id"]: (r["text"], r["n_spans"], r["n_spans_dropped"])
        for r in df.collect()
    }


def test_first_occurrence_wins_and_reassembly_order(spark):
    # span_words=2: doc 1 = [a b][c d][e f]; doc 2 repeats [c d] then adds
    # its own span. Doc 2 loses only the repeat, order of survivors holds.
    got = _out(
        span_dedup(
            _docs(
                spark,
                [(1, "a b c d e f"), (2, "c d x y")],
            ),
            span_words=2,
        )
    )
    assert got[1] == ("a b c d e f", 3, 0)
    assert got[2] == ("x y", 2, 1)


def test_fully_claimed_document_drops(spark):
    got = _out(
        span_dedup(
            _docs(spark, [(1, "a b c d"), (2, "a b c d")]), span_words=2
        )
    )
    assert set(got) == {1}
    assert got[1] == ("a b c d", 2, 0)


def test_within_document_repeat_drops_later_copy(spark):
    got = _out(span_dedup(_docs(spark, [(1, "a b a b c")]), span_words=2))
    # spans: [a b][a b][c] -> second [a b] is a repeat of the first
    assert got[1] == ("a b c", 3, 1)


def test_short_doc_is_one_span(spark):
    got = _out(span_dedup(_docs(spark, [(1, "hi")]), span_words=20))
    assert got[1] == ("hi", 1, 0)


def test_partition_order_invariance(spark):
    rows = [(i, " ".join(f"w{(i * 7 + j) % 13}" for j in range(12))) for i in range(40)]
    base = span_dedup(_docs(spark, rows), span_words=3)
    shuffled = span_dedup(
        _docs(spark, rows).repartition(7, F.col("text")), span_words=3
    )
    assert sorted(map(tuple, base.collect())) == sorted(
        map(tuple, shuffled.collect())
    )


def test_guards(spark):
    with pytest.raises(ValueError, match="span_words"):
        span_dedup(_docs(spark, [(1, "a")]), span_words=0)
    bad = _docs(spark, [(1, "a")]).withColumn("_span", F.lit(1))
    with pytest.raises(ValueError, match="collide"):
        span_dedup(bad)


def test_plan_has_no_join(spark):
    plan = span_dedup(
        _docs(spark, [(1, "a b c d")]), span_words=2
    )._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
