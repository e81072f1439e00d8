"""Corpus-hygiene operators: benchmark decontamination, repetition
signals, and PII redaction — value semantics on hand-built fixtures plus
the scale-shape plan pins (broadcast bench side, no Cartesian)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from oplogtoredis_spark.operators.decontam import decontaminate, word_ngrams
from oplogtoredis_spark.operators.pii import redact_pii
from oplogtoredis_spark.operators.text import repetition_signals


# ---------------------------------------------------------------------------
# decontamination
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def contaminated_corpus(spark):
    bench = spark.createDataFrame(
        [Row(doc_id=100, text="alpha beta gamma delta epsilon")]
    )
    corpus = spark.createDataFrame(
        [
            # verbatim copy → every benchmark 3-gram hits (3 of them)
            Row(doc_id=1, text="alpha beta gamma delta epsilon"),
            # one shared window, repeated twice → counts DISTINCT grams = 1
            Row(doc_id=2, text="x alpha beta gamma y alpha beta gamma z"),
            # clean
            Row(doc_id=3, text="one two three four five six"),
            # shorter than n → zero grams, still present in the output
            Row(doc_id=4, text="alpha beta"),
        ]
    )
    return corpus, bench


def test_decontaminate_counts_distinct_hits(spark, contaminated_corpus):
    corpus, bench = contaminated_corpus
    rows = {
        r["doc_id"]: r
        for r in decontaminate(corpus, bench, n=3).collect()
    }
    assert len(rows) == 4
    assert rows[1]["n_hit_ngrams"] == 3 and rows[1]["contaminated"]
    assert rows[2]["n_hit_ngrams"] == 1 and rows[2]["contaminated"]
    assert rows[3]["n_hit_ngrams"] == 0 and not rows[3]["contaminated"]
    assert rows[4]["n_hit_ngrams"] == 0 and not rows[4]["contaminated"]


def test_word_ngrams_short_doc_is_empty_not_descending(spark):
    """sequence(1, stop<1) would be a DESCENDING sequence — pin the guard."""
    df = spark.range(1).select(
        word_ngrams(F.lit("only two"), 3).alias("g"),
        word_ngrams(F.lit("a b c"), 3).alias("g3"),
    )
    r = df.first()
    assert r["g"] == []
    assert r["g3"] == ["a b c"]


def test_decontaminate_case_normalized(spark):
    bench = spark.createDataFrame([Row(doc_id=9, text="Alpha BETA gamma")])
    corpus = spark.createDataFrame([Row(doc_id=1, text="ALPHA beta GAMMA")])
    r = decontaminate(corpus, bench, n=3).first()
    assert r["n_hit_ngrams"] == 1


def test_decontaminate_plan_broadcasts_bench_no_cartesian(
    spark, contaminated_corpus
):
    corpus, bench = contaminated_corpus
    plan = (
        decontaminate(corpus, bench, n=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


# ---------------------------------------------------------------------------
# repetition signals
# ---------------------------------------------------------------------------
def test_repetition_signals_known_values(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="a a a b"),
            Row(doc_id=2, text="solo"),
            Row(doc_id=3, text="all words here are distinct"),
        ]
    )
    rows = {r["doc_id"]: r for r in repetition_signals(df).collect()}
    r1 = rows[1]
    # tokens: a a a b → 4 total, 2 distinct → dup ratio 0.5
    assert r1["n_tokens"] == 4 and r1["dup_token_ratio"] == 0.5
    # bigrams: "a a"×2, "a b"×1
    assert r1["top_bigram_count"] == 2 and r1["bigram_total"] == 3
    assert r1["top_bigram_frac"] == round(2 / 3, 4)
    # single token: no bigrams, present with zeros (never dropped)
    r2 = rows[2]
    assert r2["bigram_total"] == 0 and r2["top_bigram_frac"] == 0.0
    assert r2["dup_token_ratio"] == 0.0
    # fully distinct text
    r3 = rows[3]
    assert r3["dup_token_ratio"] == 0.0 and r3["top_bigram_count"] == 1


def test_repetition_signals_lowercases(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="The THE the")])
    r = repetition_signals(df).first()
    assert r["dup_token_ratio"] == round(1 - 1 / 3, 4)
    assert r["top_bigram_count"] == 2  # "the the" twice


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------
def test_redact_pii_all_three_types(spark):
    df = spark.createDataFrame(
        [
            Row(
                doc_id=1,
                text="mail a.b+x@c-d.org or 10.1.2.3 call 415-555-1234 now",
            )
        ]
    )
    r = redact_pii(df).first()
    assert r["redacted"] == "mail <EMAIL> or <IP> call <PHONE> now"
    assert (r["n_email"], r["n_ipv4"], r["n_phone"]) == (1, 1, 1)
    assert r["n_pii"] == 3


def test_redact_pii_stage_order_prevents_double_count(spark):
    """An IP-shaped local part is consumed by the email rule first; the IP
    rule then sees nothing — each token is counted by exactly one rule."""
    df = spark.createDataFrame([Row(doc_id=1, text="x 1.2.3.4@foo.com y")])
    r = redact_pii(df).first()
    assert r["redacted"] == "x <EMAIL> y"
    assert (r["n_email"], r["n_ipv4"], r["n_phone"]) == (1, 0, 0)


def test_redact_pii_clean_text_untouched(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="nothing secret here")])
    r = redact_pii(df).first()
    assert r["redacted"] == "nothing secret here" and r["n_pii"] == 0


def test_redact_pii_multiple_matches_counted(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="a@b.co c@d.io 1.1.1.1 2.2.2.2 212-555-0000")]
    )
    r = redact_pii(df).first()
    assert (r["n_email"], r["n_ipv4"], r["n_phone"]) == (2, 2, 1)
    assert r["redacted"] == "<EMAIL> <EMAIL> <IP> <IP> <PHONE>"
