"""Dedup-family operator tests with planted duplicates/near-duplicates."""

import pytest
from pyspark.sql import functions as F

from oplogtoredis_spark.operators.dedup import (
    content_hash_dedup,
    embedding_cosine_pairs,
    minhash_lsh_pairs,
    minhash_signature,
    ngram_jaccard_pairs,
    shingles,
    simhash16,
    simhash_dup_groups,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches from "
    "a sunny window sill and dreams of chasing birds in the garden"
)
NEAR = BASE.replace("sunny", "rainy")  # one token differs → high jaccard
FAR = "completely different text about spark query engines and shuffle layout"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(0, BASE), (1, NEAR), (2, FAR), (3, BASE), (4, "tiny")]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark, docs):
    out = content_hash_dedup(docs, "doc_id", "text").toPandas()
    dup_groups = out[out["n_dups"] > 1]
    assert len(dup_groups) == 1
    assert dup_groups.iloc[0]["keep_id"] == 0  # min id survives
    assert dup_groups.iloc[0]["n_dups"] == 2


def test_shingles(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",)], "text string")
    got = df.select(shingles(F.col("text"), 3).alias("s")).collect()
    assert sorted(got[0].s) == ["a b c", "b c d"]
    assert got[1].s == []  # shorter than n → no shingles


def test_ngram_jaccard_finds_near_dup(spark, docs):
    pairs = ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.5).toPandas()
    got = {tuple(r) for r in pairs[["id_a", "id_b"]].itertuples(index=False)}
    assert (0, 1) in got          # near-dup found
    assert (0, 3) in got          # exact dup found (jaccard 1.0)
    assert (0, 2) not in got      # unrelated text not matched
    exact = pairs.set_index(["id_a", "id_b"]).loc[(0, 3), "jaccard"]
    assert exact == 1.0


def test_minhash_signature_identical_for_identical_docs(spark, docs):
    sig = minhash_signature(docs, "doc_id", "text").toPandas().set_index("id")
    assert (sig.loc[0] == sig.loc[3]).all()
    # near-dup shares most minhashes
    agree = (sig.loc[0] == sig.loc[1]).sum()
    assert agree >= 10  # of 16


def test_minhash_lsh_pairs(spark, docs):
    pairs = minhash_lsh_pairs(docs, "doc_id", "text", verify_threshold=0.5).toPandas()
    got = {tuple(r) for r in pairs[["id_a", "id_b"]].itertuples(index=False)}
    assert (0, 3) in got and (0, 1) in got
    # verified candidates are a subset of exact-jaccard pairs
    exact = ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.5).toPandas()
    exact_set = {tuple(r) for r in exact[["id_a", "id_b"]].itertuples(index=False)}
    assert got <= exact_set


def test_simhash(spark, docs):
    s = simhash16(docs, "doc_id", "text").toPandas().set_index("id")
    assert s.loc[0, "simhash"] == s.loc[3, "simhash"]
    assert 0 <= s.loc[0, "simhash"] < 2**16
    groups = simhash_dup_groups(docs, "doc_id", "text").toPandas()
    assert (groups["n_docs"] >= 2).all()
    assert len(groups) >= 1


def test_embedding_cosine_pairs(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0]),   # near-dup of 0
        (2, [0.0, 1.0, 0.0]),      # orthogonal
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = embedding_cosine_pairs(df, "vec_id", "embedding", threshold=0.95).toPandas()
    assert list(pairs[["id_a", "id_b"]].itertuples(index=False, name=None)) == [(0, 1)]
    assert pairs.iloc[0]["cosine"] > 0.99


def test_embedding_dup_pairs_lsh_subset_and_plan(spark):
    """LSH-bucketed near-dup pairs: (1) every emitted pair is a true
    cosine>=tau pair (verify step is exact), (2) exact duplicates are always
    recalled (identical vectors share every bucket), (3) the physical plan
    contains no all-pairs join — the anti-pattern this operator replaces."""
    from oplogtoredis_spark.operators.dedup import embedding_dup_pairs_lsh

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    lsh = embedding_dup_pairs_lsh(
        emb, "vec_id", "embedding", threshold=0.4, n_planes=4, n_tables=8
    )
    plan = lsh._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan

    got = {(r.id_a, r.id_b) for r in lsh.collect()}
    exact = {
        (r.id_a, r.id_b)
        for r in embedding_cosine_pairs(
            emb, "vec_id", "embedding", threshold=0.4
        ).collect()
    }
    assert got <= exact  # no false positives: candidates verified exactly
    assert len(got) >= 0.5 * len(exact)  # recall floor at tau=0.4, 8 tables


def test_embedding_dup_pairs_lsh_exact_dups_recalled(spark):
    rows = [
        (0, [1.0, 0.2, 0.0, 0.5]),
        (1, [1.0, 0.2, 0.0, 0.5]),     # exact duplicate of 0
        (2, [-1.0, 0.3, 0.9, -0.5]),
    ]
    from oplogtoredis_spark.operators.dedup import embedding_dup_pairs_lsh

    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = embedding_dup_pairs_lsh(df, "vec_id", "embedding", threshold=0.99).toPandas()
    assert list(pairs[["id_a", "id_b"]].itertuples(index=False, name=None)) == [(0, 1)]


def test_dedup_clusters_connected_components(spark):
    """Pairs (1-2), (2-3), (5-6) + singleton 4 → clusters {1,2,3}->1,
    {5,6}->5, {4}->4 — transitive closure resolved by label propagation."""
    from oplogtoredis_spark.operators.dedup import dedup_clusters

    pairs = spark.createDataFrame([(1, 2), (2, 3), (5, 6)], "id_a long, id_b long")
    ids = spark.createDataFrame([(i,) for i in range(1, 7)], "id long")
    got = {r.doc_id: r.cluster_id for r in dedup_clusters(pairs, ids).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 5}


def test_dedup_clusters_long_chain(spark):
    # a 9-hop chain exercises multi-round propagation to convergence
    from oplogtoredis_spark.operators.dedup import dedup_clusters

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 10)], "id_a long, id_b long"
    )
    ids = spark.createDataFrame([(i,) for i in range(1, 11)], "id long")
    got = {r.doc_id: r.cluster_id for r in dedup_clusters(pairs, ids).collect()}
    assert got == {i: 1 for i in range(1, 11)}


def test_minhash_lsh_verify_is_candidate_gated(spark, docs):
    """The exact-Jaccard verify stage must cost O(candidates), not O(corpus
    pairs): the plan may contain NO inverted-index self-join (the sh_h
    shingle-posting join of ngram_jaccard_pairs — running it here would make
    LSH prune nothing at any scale). The verify is pinned to the
    set-intersection form: two hash joins from the candidate pairs to the
    per-doc shingle-hash sets + array_intersect."""
    lsh = minhash_lsh_pairs(docs, "doc_id", "text", verify_threshold=0.5)
    plan = lsh._jdf.queryExecution().executedPlan().toString()
    assert "sh_h" not in plan          # the full-corpus posting join is gone
    assert "array_intersect" in plan   # per-candidate set intersection
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_jaccard_verify_scores_only_candidates(spark, docs):
    """A pair the candidate generator did not emit is never scored — even an
    exact duplicate pair: verify work tracks candidates, not corpus pairs."""
    from oplogtoredis_spark.operators.dedup import (
        _shingle_sets,
        jaccard_verify_candidates,
    )

    sets = _shingle_sets(docs, "doc_id", "text", 3)
    # candidate set deliberately omits the exact-dup pair (0, 3)
    cand = spark.createDataFrame([(0, 1)], "id_a long, id_b long")
    got = jaccard_verify_candidates(cand, sets, threshold=0.0).toPandas()
    assert list(got[["id_a", "id_b"]].itertuples(index=False, name=None)) == [(0, 1)]
    # and the scored value is the true exact Jaccard (matches the index path)
    exact = ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.0).toPandas()
    want = exact.set_index(["id_a", "id_b"]).loc[(0, 1), "jaccard"]
    assert got.iloc[0]["jaccard"] == want


def test_jaccard_verify_empty_sets_pair_is_ansi_safe(spark):
    """ADVICE r3: two zero-shingle docs as a caller-supplied candidate pair
    divide by a zero-size union — must NOT raise DIVIDE_BY_ZERO under ANSI
    mode; jaccard of two empty sets is null and the pair is filtered."""
    from oplogtoredis_spark.operators.dedup import (
        _shingle_sets,
        jaccard_verify_candidates,
    )

    docs = spark.createDataFrame(
        [(0, ""), (1, ""), (2, "the same text here"), (3, "the same text here")],
        "doc_id long, text string",
    )
    sets = _shingle_sets(docs, "doc_id", "text", 3)
    cand = spark.createDataFrame([(0, 1), (2, 3)], "id_a long, id_b long")
    got = jaccard_verify_candidates(cand, sets, threshold=0.0).toPandas()
    # the empty-empty pair is dropped (null jaccard); the real pair scores 1.0
    assert list(got[["id_a", "id_b"]].itertuples(index=False, name=None)) == [(2, 3)]
    assert got.iloc[0]["jaccard"] == 1.0


def test_alternating_components_chain_converges_in_log_rounds(spark):
    """A 1000-node chain — the adversarial case for min-label propagation
    (needs ~1000 diameter rounds) — must converge in O(log n) alternating
    large-star/small-star rounds (VERDICT r2 #8)."""
    from oplogtoredis_spark.operators.dedup import alternating_components

    n = 1000
    edges = spark.range(n - 1).select(
        F.col("id").alias("u"), (F.col("id") + 1).alias("v")
    )
    stars, rounds = alternating_components(edges, max_iters=20)
    assert rounds <= 12, f"needed {rounds} rounds on a {n}-chain"
    got = stars.toPandas()
    assert set(got["v"]) == {0}            # every node labeled by the min
    assert set(got["u"]) == set(range(1, n))


def test_dedup_clusters_random_graph_matches_union_find(spark):
    """Cluster labels equal a driver-side union-find ground truth on a
    random multi-component graph (singletons label themselves)."""
    import random

    from oplogtoredis_spark.operators.dedup import dedup_clusters

    random.seed(7)
    n = 200
    raw_edges = [(random.randrange(n), random.randrange(n)) for _ in range(150)]
    edges = [(a, b) for a, b in raw_edges if a != b]

    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comps = {}
    for x in range(n):
        comps.setdefault(find(x), []).append(x)
    want = {x: min(members) for members in comps.values() for x in members}

    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    ids = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    got = {
        r.doc_id: r.cluster_id
        for r in dedup_clusters(pairs, ids, id_col="doc_id").collect()
    }
    assert got == want


def test_simhash60_identical_docs_hamming0(spark, docs):
    from oplogtoredis_spark.operators.dedup import simhash60

    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy dog"),
         (3, "completely different text about spark engines and parquet")],
        "doc_id long, text string",
    )
    s = {r["id"]: r["simhash"] for r in simhash60(df, "doc_id", "text").collect()}
    assert s[1] == s[2]
    assert s[1] != s[3]
    assert 0 <= s[1] < (1 << 60)


def test_simhash_dup_pairs_banding_recall(spark):
    from oplogtoredis_spark.operators.dedup import simhash60, simhash_dup_pairs

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    rows = [
        (1, base),
        (2, base),  # identical -> hamming 0
        (3, base.replace("kappa", "lambda", 1)),  # near dup
        (4, "unrelated words entirely disjoint vocabulary set here now"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = simhash_dup_pairs(df, "doc_id", "text", max_hamming=3, bands=4).toPandas()
    got = {(r.id_a, r.id_b): r.hamming for r in out.itertuples()}
    assert got.get((1, 2)) == 0
    # banding must equal the exhaustive hamming filter (pigeonhole recall)
    s = {r["id"]: r["simhash"] for r in simhash60(df, "doc_id", "text").collect()}
    ids = sorted(s)
    brute = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if bin(s[a] ^ s[b]).count("1") <= 3
    }
    assert set(got) == brute


def test_simhash_dup_pairs_rejects_lossy_banding(spark):
    from oplogtoredis_spark.operators.dedup import simhash_dup_pairs

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="recall"):
        simhash_dup_pairs(df, "doc_id", "text", max_hamming=4, bands=4)


def test_minhash_lsh_pairs_rejects_bad_bands(spark):
    """bands > 16 would make every band hash a constant (all-pairs
    candidate product); a non-divisor silently discards minhashes."""
    import pytest

    from oplogtoredis_spark.operators.dedup import minhash_lsh_pairs

    df = spark.createDataFrame(
        [(0, "a b c d e"), (1, "a b c d e")], "id long, text string"
    )
    for bad in (0, 5, 17):
        with pytest.raises(ValueError, match="bands must divide"):
            minhash_lsh_pairs(df, "id", "text", bands=bad)


def test_alternating_components_nonconvergence_is_loud(spark):
    """Exhausting max_iters without a stable star set must raise, not
    return non-minimum labels silently."""
    import pytest

    from oplogtoredis_spark.operators.dedup import alternating_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "u long, v long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        alternating_components(chain, max_iters=1)
    # and the same chain converges fine with the default budget
    stars, rounds = alternating_components(chain)
    assert {r.v for r in stars.collect()} == {0}
