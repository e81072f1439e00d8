"""Text-analysis operator tests (tokens, lang-id, quality, fingerprint)."""

from pyspark.sql import functions as F

from oplogtoredis_spark.operators.text import (
    bpe_ish_token_count,
    en_stopword_hits,
    fingerprint,
    lang_guess,
    quality_score,
    text_profile,
    token_count,
)


def _one(spark, text, col):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(col(F.col("text")).alias("v")).first().v


def test_token_count(spark):
    assert _one(spark, "a b  c", token_count) == 3
    assert _one(spark, "  leading and trailing  ", token_count) == 3


def test_bpe_ish_count(spark):
    # "hello" → hell+o (2 pieces), "x123!" → x,123,! (3)
    assert _one(spark, "hello", bpe_ish_token_count) == 2
    assert _one(spark, "x123!", bpe_ish_token_count) == 3


def test_lang_guess(spark):
    assert _one(spark, "the cat sat on a mat", lang_guess) == "en"
    assert _one(spark, "zzz qqq www", lang_guess) == "unk"
    assert _one(spark, "the the the", lang_guess) == "unk"  # distinct stopwords


def test_stopword_hits_distinct(spark):
    assert _one(spark, "the the a a of", en_stopword_hits) == 3


def test_quality_bounds(spark):
    q = _one(spark, "the quick brown fox and a dog in of to is it for on", quality_score)
    assert 0.0 <= q <= 1.0


def test_fingerprint_order_sensitive(spark):
    f1 = _one(spark, "alpha beta gamma", fingerprint)
    f2 = _one(spark, "gamma beta alpha", fingerprint)
    f3 = _one(spark, "alpha beta gamma", fingerprint)
    assert f1 == f3 != f2
    assert 0 <= f1 < 2**31


def test_profile_on_documents_table(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    prof = text_profile(docs).limit(50).toPandas()
    assert {"n_tokens", "lang_guess", "quality", "fingerprint"} <= set(prof.columns)
    assert (prof["n_tokens"] > 0).all()
    # fixture docs are SQL-keyword soup containing only 'a'/'the' as English
    # stopwords — the heuristic should still tag a clear majority
    assert (prof["lang_guess"] == "en").mean() > 0.5


def test_quality_filter_reasons_and_split(spark):
    from oplogtoredis_spark.operators.text import quality_filter

    rows = [
        (1, "the cat sat on the mat and it is a fine day for walking outside"),
        (2, "ok"),                                  # too_short
        (3, "1234 5678 9012 3456 7890 1111 2222"),  # low_alpha
        (4, "zxqj vbnk wplt mnbv qwer asdf zxcv"),  # no stopwords → low quality/lang
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept, rejected = quality_filter(
        df, min_tokens=5, min_alpha_ratio=0.5, min_quality=0.3, langs=("en",)
    )
    assert [r.doc_id for r in kept.collect()] == [1]
    got = {r.doc_id: r.reject_reason for r in rejected.collect()}
    assert got[2] == "too_short"
    assert got[3] == "low_alpha"
    assert got[4] in ("low_quality", "wrong_lang")
    # one reason per doc; kept+rejected partition the input
    assert set(got) | {1} == {1, 2, 3, 4}


def test_chunk_documents_windows_and_overlap(spark):
    from oplogtoredis_spark.operators.text import chunk_documents

    words = " ".join(f"w{i}" for i in range(25))
    df = spark.createDataFrame([(1, words), (2, "short doc")], "doc_id long, text string")
    out = chunk_documents(df, chunk_tokens=10, overlap=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    c1 = sorted(by_doc[1], key=lambda r: r.chunk_idx)
    # 25 tokens, step 8 → ceil((25-2)/8) = 3 chunks
    assert [r.chunk_idx for r in c1] == [0, 1, 2]
    assert c1[0].chunk_text.split() == [f"w{i}" for i in range(10)]
    assert c1[1].chunk_text.split() == [f"w{i}" for i in range(8, 18)]
    assert c1[2].chunk_text.split() == [f"w{i}" for i in range(16, 25)]
    assert [r.n_tokens for r in c1] == [10, 10, 9]
    # overlap: last 2 tokens of chunk 0 open chunk 1
    assert c1[0].chunk_text.split()[-2:] == c1[1].chunk_text.split()[:2]
    # short doc → exactly one whole-doc chunk
    assert len(by_doc[2]) == 1 and by_doc[2][0].chunk_text == "short doc"


def _ref_bpe_count(word: str) -> int:
    """Independent pure-Python rendering of the documented BPE semantics:
    one left-to-right non-overlapping pass per merge rank."""
    from oplogtoredis_spark.operators.text import BPE_MERGES

    toks = list(word)
    for a, b in BPE_MERGES:
        out, i = [], 0
        while i < len(toks):
            if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(toks[i])
                i += 1
        toks = out
    return len(toks)


def test_bpe_token_count_matches_reference_tokenizer(spark):
    """The string-expression BPE must agree with an independently coded
    tokenizer on merge chains, adjacent same-merge pairs (the
    shared-boundary case), multi-char merges, digits, case folding, and
    empty/punctuation-only docs."""
    import re

    from oplogtoredis_spark.operators.text import bpe_token_counts

    docs = [
        (0, "the ingestion of the standard"),
        (1, "anand and initiation"),  # adjacent (a,n)(a,n) shared boundary
        (2, "42 esters, orthogonal!"),
        (3, ""),                      # no words -> 0
        (4, "?!... --- ..."),         # punctuation only -> 0
        (5, "Tion THE tHe"),          # case folding
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = bpe_token_counts(df).toPandas().set_index("doc_id")["n_tokens_bpe"]
    for i, text in docs:
        want = sum(
            _ref_bpe_count(w) for w in re.findall(r"[a-z0-9]+", text.lower())
        )
        assert got[i] == want, (i, text, got[i], want)
    assert got[3] == 0 and got[4] == 0
    assert got[5] == 3  # tion + the + the -> one token each
