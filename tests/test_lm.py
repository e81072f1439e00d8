"""Character n-gram LM: pure-Python parity (counts, smoothing, e4 costs),
unseen-gram/context fallbacks, the short-doc sequence() footgun, outlier
behavior, and the broadcast plan shape that keeps scoring corpus-shuffle
free."""

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from oplogtoredis_spark.operators.lm import (
    char_grams,
    lm_perplexity,
    lm_score,
    lm_train,
)


def _py_model(texts, n):
    cnt, ctx_tot, vocab = Counter(), Counter(), set()
    for t in texts:
        for i in range(len(t) - n + 1):
            g = t[i : i + n]
            cnt[(g[: n - 1], g[n - 1 :])] += 1
            ctx_tot[g[: n - 1]] += 1
            vocab.add(g[n - 1 :])
    return cnt, ctx_tot, len(vocab)


def _py_score(text, n, k, cnt, ctx_tot, v):
    costs = []
    for i in range(len(text) - n + 1):
        ctx, nxt = text[i : i + n - 1], text[i + n - 1]
        p = (cnt.get((ctx, nxt), 0) + k) / (ctx_tot.get(ctx, 0) + k * v)
        costs.append(int(math.floor(-math.log(p) * 10000.0 + 0.5)))
    return len(costs), sum(costs)


TEXTS = {
    1: "the cat sat on the mat",
    2: "the dog sat on the log",
    3: "aaaaaaaaaaaaaaaa",
    4: "zq",  # shorter than n=3: emits nothing
    5: "the cat and the dog",
}


def _docs(spark):
    return spark.createDataFrame(
        list(TEXTS.items()), "doc_id long, text string"
    )


def test_train_counts_exact(spark):
    got = {
        (r.ctx, r.nxt): r.c for r in lm_train(_docs(spark), n=3).collect()
    }
    cnt, _, _ = _py_model([t for t in TEXTS.values() if len(t) >= 3], 3)
    assert got == dict(cnt)


def test_self_perplexity_matches_python_reference(spark):
    n, k = 3, 1.0
    texts = [t for t in TEXTS.values() if len(t) >= n]
    cnt, ctx_tot, v = _py_model(texts, n)
    got = {
        r.doc_id: (r.n_grams, r.nll_e4)
        for r in lm_perplexity(_docs(spark), n=n, k=k).collect()
    }
    want = {
        i: _py_score(t, n, k, cnt, ctx_tot, v)
        for i, t in TEXTS.items()
        if len(t) >= n
    }
    assert got == want
    assert 4 not in got  # the short doc emitted nothing


def test_unseen_gram_and_context_fallbacks(spark):
    """Scoring OTHER documents: an unseen (ctx, nxt) under a seen context
    uses k/(C(ctx)+kV); a fully unseen context degrades to exactly 1/V per
    char — both via the same coalesce expression."""
    n, k = 3, 0.5
    train = _docs(spark).where(F.col("doc_id") <= 2)
    probe = _docs(spark).where(F.col("doc_id") >= 3)
    cnt, ctx_tot, v = _py_model([TEXTS[1], TEXTS[2]], n)
    got = {
        r.doc_id: (r.n_grams, r.nll_e4)
        for r in lm_score(probe, lm_train(train, n), n=n, k=k).collect()
    }
    want = {
        i: _py_score(TEXTS[i], n, k, cnt, ctx_tot, v)
        for i in (3, 5)
        if len(TEXTS[i]) >= n
    }
    assert got == want
    # doc 3 is all unseen contexts: cost per gram is exactly -ln(1/V)
    per = int(math.floor(math.log(v / k * k) * 10000.0 + 0.5))
    unit = int(math.floor(-math.log(1.0 / v) * 10000.0 + 0.5))
    assert got[3][1] == got[3][0] * unit and per == unit


def test_outliers_score_higher(spark):
    """Self-perplexity flags out-of-distribution text: a doc of characters
    the rest of the corpus never uses scores a higher avg_nll than every
    in-distribution doc."""
    rows = [(i, f"the quick brown fox {i % 7} jumps over the lazy dog")
            for i in range(40)]
    rows.append((99, "@#%&*^!~@#%&*^!~@#%&*^!~"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.avg_nll for r in lm_perplexity(df, n=3).collect()}
    garbage = out.pop(99)
    assert garbage > max(out.values())


def test_scoring_plan_broadcasts_the_model(spark):
    out = lm_perplexity(_docs(spark), n=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_guards(spark):
    df = _docs(spark)
    with pytest.raises(ValueError, match="n must be"):
        char_grams(df, "doc_id", "text", 1)
    with pytest.raises(ValueError, match="k > 0"):
        lm_score(df, lm_train(df), k=0.0)
    with pytest.raises(ValueError, match="collides"):
        lm_score(df.withColumn("ctx", F.lit("x")), lm_train(df))
    # id_col must not shadow a model-side join output either: 'c'/'ctx_c'/
    # 'v'/'_cost' would come out ambiguous after the broadcast joins
    with pytest.raises(ValueError, match="model-side join output"):
        lm_score(
            df.withColumnRenamed("doc_id", "v"), lm_train(df), id_col="v"
        )


def test_empty_model_fails_loud(spark):
    """Scoring against an EMPTY model (no usable training docs) makes the
    smoothing denominator 0 for every gram — under ANSI mode that was a
    bare DIVIDE_BY_ZERO deep in the job; now it names the condition."""
    import pytest

    from oplogtoredis_spark.operators.lm import lm_score, lm_train

    short = spark.createDataFrame([(0, "ab")], "doc_id long, text string")
    docs = spark.createDataFrame(
        [(1, "hello world")], "doc_id long, text string"
    )
    empty_lm = lm_train(short, n=4)  # every doc shorter than n
    with pytest.raises(Exception, match="empty language model"):
        lm_score(docs, empty_lm, n=4).collect()
