"""Inverted index + BM25 retrieval (operators/retrieval.py): hand-computed
scores, tie/edge semantics, and plan shape."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from oplogtoredis_spark.operators.retrieval import (
    DEFAULT_B,
    DEFAULT_K1,
    bm25_topk,
    index_stats,
    postings,
)


def _bm25_py(corpus: dict[int, str], qterms: list[str], k1=DEFAULT_K1, b=DEFAULT_B):
    """Pure-Python reference mirroring the operator's formula (e4 fixed
    point per term, distinct query terms)."""
    toks = {d: t.lower().split() for d, t in corpus.items() if t.split()}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    out = {}
    for d, t in toks.items():
        score = 0
        for w in set(qterms):
            tf = t.count(w)
            if not tf:
                continue
            df = sum(1 for tt in toks.values() if w in tt)
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            term = idf * ((tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + (b * len(t)) / avgdl)))
            score += math.floor(term * 10000.0 + 0.5)
        if score or any(w in t for w in qterms):
            out[d] = score / 10000.0
    return out


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "apple banana apple cherry"),
        (2, "banana banana durian"),
        (3, "cherry durian elderberry fig"),
        (4, "apple apple apple apple banana"),
        (5, "   "),  # zero tokens: never indexed, excluded from N/avgdl
        (6, "grape"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_postings_and_stats(spark, corpus):
    post = {
        (r.doc_id, r.token): (r.dl, r.tf) for r in postings(corpus).collect()
    }
    assert post[(1, "apple")] == (4, 2)
    assert post[(4, "apple")] == (5, 4)
    assert (5, "") not in post and not any(d == 5 for d, _ in post)
    stats = {r.token: (r.n_docs, r.total_tf) for r in index_stats(postings(corpus)).collect()}
    assert stats["apple"] == (2, 6)
    assert stats["banana"] == (3, 4)
    assert stats["grape"] == (1, 1)


def test_bm25_matches_python_reference(spark, corpus):
    qdf = spark.createDataFrame(
        [("qa", "apple banana"), ("qb", "durian durian")],
        "query_id string, qtext string",
    )
    got = {
        (r.query_id, r.doc_id): (r.rank, r.score)
        for r in bm25_topk(corpus, qdf, k=10).collect()
    }
    corpus_py = {
        r.doc_id: r.text for r in corpus.collect()
    }
    for qid, terms in (("qa", ["apple", "banana"]), ("qb", ["durian"])):
        want = _bm25_py(corpus_py, terms)
        got_q = {d: s for (q, d), (_, s) in got.items() if q == qid}
        assert got_q == pytest.approx(want), qid
        # ranks descend by score, ties by ascending doc_id
        ranked = sorted(
            ((r, d) for (q, d), (r, _) in got.items() if q == qid)
        )
        scores = [got[(qid, d)][1] for _, d in ranked]
        assert scores == sorted(scores, reverse=True)


def test_bm25_k_boundary_tie_resolves_by_doc_id(spark):
    # four identical single-token docs, k=2: equal scores, lowest ids win
    docs = spark.createDataFrame(
        [(i, "same token here") for i in (9, 3, 7, 1)],
        "doc_id long, text string",
    )
    qdf = spark.createDataFrame([("q", "token")], "query_id string, qtext string")
    rows = bm25_topk(docs, qdf, k=2).orderBy("rank").collect()
    assert [r.doc_id for r in rows] == [1, 3]
    assert rows[0].score == rows[1].score


def test_bm25_repeated_query_terms_score_once(spark, corpus):
    q1 = spark.createDataFrame([("q", "apple")], "query_id string, qtext string")
    q2 = spark.createDataFrame([("q", "apple apple apple")], "query_id string, qtext string")
    a = sorted((r.doc_id, r.score) for r in bm25_topk(corpus, q1, k=10).collect())
    b = sorted((r.doc_id, r.score) for r in bm25_topk(corpus, q2, k=10).collect())
    assert a == b


def test_bm25_rejects_bad_k(spark, corpus):
    qdf = spark.createDataFrame([("q", "apple")], "query_id string, qtext string")
    with pytest.raises(ValueError, match="k must be"):
        bm25_topk(corpus, qdf, k=0)


def test_bm25_plan_shape(spark, corpus):
    """No Cartesian product, no sort-merge join (query dimension broadcasts),
    top-k runs as WindowGroupLimit (map-side k-pruning)."""
    qdf = spark.createDataFrame([("q", "apple banana")], "query_id string, qtext string")
    df = bm25_topk(corpus, qdf, k=3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert "WindowGroupLimit" in plan
    assert plan.count("BroadcastHashJoin") == 2


def test_bm25_postings_exchange_reused(spark, corpus, tmp_path):
    """The corpus is scanned+shuffled ONCE: after execution, AQE's exchange
    reuse must have deduplicated the postings subtree for its three
    consumers (dft, stats, scoring). Pinned over a parquet scan — the
    production input shape; in-memory LocalRelation scans don't
    canonicalize equal, so reuse is a file-source property."""
    path = str(tmp_path / "corpus")
    corpus.write.parquet(path)
    qdf = spark.createDataFrame([("q", "apple")], "query_id string, qtext string")
    df = bm25_topk(spark.read.parquet(path), qdf, k=3)
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]
    assert final.count("ReusedExchange") >= 2, final
    assert final.count("FileScan parquet") == 1, final
