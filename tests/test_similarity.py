"""ANN similarity-search tests: brute-force exactness + LSH recall."""

import pytest
from pyspark.sql import functions as F

from oplogtoredis_spark.operators.similarity import (
    ann_ivf_topk,
    ann_lsh_bucketed,
    cosine_topk_bruteforce,
    lsh_bucket,
)


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def test_bruteforce_planted_neighbor(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.99, 0.1, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 0.0, 1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.where(F.col("vec_id") == 0)
    out = cosine_topk_bruteforce(df, q, k=2).toPandas()
    assert list(out["neighbor_id"]) == [1, 2]
    assert list(out["rank"]) == [1, 2]
    assert out.iloc[0]["cosine"] > 0.99


def test_bruteforce_on_fixture(spark, embeddings):
    q = embeddings.where(F.col("vec_id") < 3)
    out = cosine_topk_bruteforce(embeddings, q, k=5).toPandas()
    assert len(out) == 15  # 3 queries × 5
    assert set(out["query_id"]) == {0, 1, 2}
    # exact top-k: ranks are 1..5, scores non-increasing per query
    for qid, grp in out.groupby("query_id"):
        assert list(grp.sort_values("rank")["rank"]) == [1, 2, 3, 4, 5]
        sims = list(grp.sort_values("rank")["cosine"])
        assert sims == sorted(sims, reverse=True)
        assert qid not in set(grp["neighbor_id"])  # self excluded


def test_lsh_bucket_deterministic(spark, embeddings):
    b1 = embeddings.select(lsh_bucket(F.col("embedding").cast("array<double>")).alias("b")).toPandas()
    b2 = embeddings.select(lsh_bucket(F.col("embedding").cast("array<double>")).alias("b")).toPandas()
    assert b1.equals(b2)
    assert b1["b"].between(0, 255).all()
    assert b1["b"].nunique() > 1  # planes actually split the space


def test_lsh_identical_vectors_same_bucket_rank1(spark):
    rows = [(i, [float(i % 7 == j) for j in range(8)]) for i in range(7)]
    rows.append((100, rows[0][1]))  # exact duplicate of vec 0
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.where(F.col("vec_id") == 100)
    out = ann_lsh_bucketed(df, q, k=3).toPandas()
    assert out.iloc[0]["neighbor_id"] == 0
    assert out.iloc[0]["cosine"] == 1.0


def test_lsh_recall_vs_bruteforce(spark, embeddings):
    q = embeddings.where(F.col("vec_id") < 10)
    exact = cosine_topk_bruteforce(embeddings, q, k=3).toPandas()
    approx = ann_lsh_bucketed(embeddings, q, k=3, n_planes=4, n_tables=8).toPandas()
    exact_set = {(r.query_id, r.neighbor_id) for r in exact.itertuples()}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx.itertuples()}
    recall = len(exact_set & approx_set) / len(exact_set)
    # random 64-d vectors are the hardest case (weak neighbors); multi-table
    # LSH must still recover a solid fraction of the true top-3
    assert recall > 0.4, f"recall {recall}"


def test_ivf_exact_duplicate_rank1(spark):
    rows = [(i, [float(i % 7 == j) for j in range(8)]) for i in range(7)]
    rows.append((100, rows[2][1]))  # exact duplicate of vec 2
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.where(F.col("vec_id") == 100)
    out = ann_ivf_topk(df, q, k=3, n_centroids=4, n_probe=4).toPandas()
    # probing every centroid ⇒ exhaustive ⇒ the duplicate must rank first
    assert out.iloc[0]["neighbor_id"] == 2
    assert out.iloc[0]["cosine"] == 1.0


def test_ivf_centroids_deterministic_and_partitioning(spark, embeddings):
    from oplogtoredis_spark.operators.similarity import _assign_nearest, ivf_centroids

    c1 = ivf_centroids(embeddings, n_centroids=8).toPandas().sort_values("cid")
    c2 = ivf_centroids(embeddings, n_centroids=8).toPandas().sort_values("cid")
    assert list(c1["cid"]) == list(range(8))
    assert c1[["cid", "cenorm"]].equals(c2[["cid", "cenorm"]])
    # every corpus vector lands in exactly one inverted list
    cents = ivf_centroids(embeddings, n_centroids=8)
    v = embeddings.select(
        F.col("vec_id").alias("nid"),
        F.col("embedding").cast("array<double>").alias("cv"),
    ).withColumn("cnorm", F.sqrt(F.aggregate(
        F.transform("cv", lambda x: x * x), F.lit(0.0), lambda a, x: a + x)))
    lists = _assign_nearest(v, cents).toPandas()
    assert len(lists) == embeddings.count()
    assert lists["nid"].is_unique
    assert lists["cid"].nunique() > 1  # quantizer actually partitions


def test_ivf_recall_vs_bruteforce(spark, embeddings):
    q = embeddings.where(F.col("vec_id") < 5)
    exact = cosine_topk_bruteforce(embeddings, q, k=5).toPandas()
    approx = ann_ivf_topk(
        embeddings, q, k=5, n_centroids=8, n_probe=4
    ).toPandas()
    ek = {(r.query_id, r.neighbor_id) for r in exact.itertuples()}
    ak = {(r.query_id, r.neighbor_id) for r in approx.itertuples()}
    recall = len(ek & ak) / len(ek)
    assert recall >= 0.5, f"IVF recall {recall} too low at n_probe=half"
    # full probing degenerates to exact brute force
    full = ann_ivf_topk(embeddings, q, k=5, n_centroids=8, n_probe=8).toPandas()
    fk = {(r.query_id, r.neighbor_id) for r in full.itertuples()}
    assert fk == ek


def test_ivf_build_is_sample_bounded_no_vector_id_join(spark, embeddings):
    """VERDICT r3 #1: the centroid BUILD must not explode-and-join the full
    corpus on the vector id. Pins: (a) the build plan contains NO shuffled
    join at all (the assignment rides a broadcast of the constant-size seed
    table, carried through max_by — no join keyed on nid); (b) the build is
    fed by the bounded smallest-id sample (a top-K TakeOrderedAndProject,
    not a full-corpus scan into the explode); (c) sampled semantics: the
    centroids equal those built from the sample subset alone."""
    from oplogtoredis_spark.operators.similarity import ivf_centroids

    cents = ivf_centroids(embeddings, n_centroids=8, sample_per_centroid=8)
    plan = cents._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    assert "TakeOrderedAndProject" in plan  # the bounded smallest-id sample
    # value check: only the 64 smallest-id vectors participate in the build
    sub = embeddings.where(F.col("vec_id") < 10_000_000).orderBy("vec_id").limit(64)
    c_sub = ivf_centroids(sub, n_centroids=8, sample_per_centroid=8).toPandas()
    c_all = cents.toPandas()
    merged = c_all.merge(c_sub, on="cid", suffixes=("_a", "_s"))
    assert len(merged) == 8
    assert (merged["cenorm_a"] == merged["cenorm_s"]).all()
    assert all(list(a) == list(s) for a, s in zip(merged["ce_a"], merged["ce_s"]))


def test_ivf_no_cartesian_beyond_centroid_broadcast(spark, embeddings):
    q = embeddings.where(F.col("vec_id") < 3)
    plan = ann_ivf_topk(embeddings, q, k=5)._jdf.queryExecution().executedPlan().toString()
    # the only nested-loop joins allowed are against the broadcast
    # constant-size centroid table; candidate/vector joins must be equality
    assert "CartesianProduct" not in plan


def test_quantization_bounded_deterministic_and_accurate(spark, embeddings):
    """int8 scalar quantization: codes in [0,255], two builds identical,
    and asymmetric top-k over dequantized vectors recalls most of the
    exact float top-k (the storage-for-accuracy trade, quantified)."""
    from oplogtoredis_spark.operators.similarity import (
        ann_quantized_topk,
        quantization_stats,
        quantize_embeddings,
    )

    stats = quantization_stats(embeddings, sample_k=256)
    qz = quantize_embeddings(embeddings, stats).toPandas()
    assert all(0 <= v <= 255 for row in qz["qv"] for v in row)
    qz2 = quantize_embeddings(embeddings, quantization_stats(embeddings, sample_k=256)).toPandas()
    a = qz.sort_values("nid").reset_index(drop=True)
    b = qz2.sort_values("nid").reset_index(drop=True)
    assert all(list(x) == list(y) for x, y in zip(a["qv"], b["qv"]))

    q = embeddings.where(F.col("vec_id") < 5)
    exact = cosine_topk_bruteforce(embeddings, q, k=5).toPandas()
    quant = ann_quantized_topk(embeddings, q, k=5).toPandas()
    ek = {(r.query_id, r.neighbor_id) for r in exact.itertuples()}
    qk = {(r.query_id, r.neighbor_id) for r in quant.itertuples()}
    recall = len(ek & qk) / len(ek)
    assert recall >= 0.6, f"int8 recall {recall}"


def test_ivf_quantized_full_probe_equals_quantized_exhaustive(spark, embeddings):
    """VERDICT r4 #4 composition: probing EVERY list makes IVF-SQ exhaustive
    over the quantized store, so its output must equal ann_quantized_topk
    exactly (same codes, same asymmetric scoring, same ranks)."""
    from oplogtoredis_spark.operators.similarity import (
        ann_ivf_quantized_topk,
        ann_quantized_topk,
    )

    q = embeddings.where(F.col("vec_id") < 3)
    full = ann_ivf_quantized_topk(
        embeddings, q, k=5, n_centroids=8, n_probe=8
    ).toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    ex = ann_quantized_topk(embeddings, q, k=5).toPandas().sort_values(
        ["query_id", "rank"]
    ).reset_index(drop=True)
    assert full.equals(ex)


def test_ivf_quantized_recall_and_plan(spark, embeddings):
    """Partial probing recalls most of the exact float top-k (both the
    routing loss and the coding loss are bounded on this corpus), and the
    plan has no Cartesian product — broadcasts + equality joins only."""
    from oplogtoredis_spark.operators.similarity import ann_ivf_quantized_topk

    q = embeddings.where(F.col("vec_id") < 5)
    exact = cosine_topk_bruteforce(embeddings, q, k=5).toPandas()
    approx_df = ann_ivf_quantized_topk(embeddings, q, k=5, n_centroids=8, n_probe=4)
    plan = approx_df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    approx = approx_df.toPandas()
    ek = {(r.query_id, r.neighbor_id) for r in exact.itertuples()}
    ak = {(r.query_id, r.neighbor_id) for r in approx.itertuples()}
    recall = len(ek & ak) / len(ek)
    assert recall >= 0.5, f"IVF-SQ recall {recall} too low at n_probe=half"


def test_ivf_quantized_duplicate_rank1(spark):
    rows = [(i, [float(i % 7 == j) for j in range(8)]) for i in range(7)]
    rows.append((100, rows[2][1]))  # exact duplicate of vec 2
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.where(F.col("vec_id") == 100)
    from oplogtoredis_spark.operators.similarity import ann_ivf_quantized_topk

    out = ann_ivf_quantized_topk(
        df, q, k=3, n_centroids=4, n_probe=4, sample_k=8
    ).toPandas()
    # exhaustive probing: the duplicate must rank first even through int8
    assert out.iloc[0]["neighbor_id"] == 2
    assert out.iloc[0]["cosine_q"] >= 0.99


def test_embedding_clusters_total_deterministic_and_plan(spark, embeddings):
    """Every vector gets exactly one cluster id in [0, n_centroids);
    assignment is invariant to input partitioning (no RNG anywhere); the
    corpus never joins or shuffles except its own per-vector aggregation
    (centroids broadcast, no sort-merge/shuffled-hash join)."""
    from oplogtoredis_spark.operators.similarity import embedding_clusters

    out = embedding_clusters(embeddings, n_centroids=8)
    got = {r.vec_id: r.cid for r in out.collect()}
    assert len(got) == embeddings.count()  # total: one cid per vector
    assert set(got.values()) <= set(range(8))
    got2 = {
        r.vec_id: r.cid
        for r in embedding_clusters(
            embeddings.repartition(16), n_centroids=8
        ).collect()
    }
    assert got == got2
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_embedding_clusters_groups_by_direction(spark):
    """Sanity on planted data: three tight direction bundles land in three
    distinct clusters with bundle-mates together."""
    import itertools

    from oplogtoredis_spark.operators.similarity import embedding_clusters

    rows = []
    base = {0: [1.0, 0.0, 0.0], 1: [0.0, 1.0, 0.0], 2: [0.0, 0.0, 1.0]}
    for b, (i, eps) in itertools.product(
        range(3), enumerate((0.0, 0.02, 0.04, 0.06))
    ):
        v = list(base[b])
        v[(b + 1) % 3] += eps
        rows.append((b * 4 + i, v))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r.vec_id: r.cid
        for r in embedding_clusters(
            df, n_centroids=3, sample_per_centroid=4
        ).collect()
    }
    bundles = [{out[b * 4 + i] for i in range(4)} for b in range(3)]
    assert all(len(s) == 1 for s in bundles)  # mates stay together
    assert len({next(iter(s)) for s in bundles}) == 3  # bundles separate


def test_semdedup_prunes_within_cluster_only(spark, embeddings):
    """Kept set is exactly {v : no smaller-id SAME-CLUSTER mate at cosine
    >= tau} — verified against a brute-force pandas recomputation over the
    operator's own cluster assignment; partition-invariant; no
    CartesianProduct in the plan (the pairwise stage is an equality join
    on cid)."""
    import numpy as np

    from oplogtoredis_spark.operators.dedup import semdedup_keep
    from oplogtoredis_spark.operators.similarity import embedding_clusters

    tau = 0.4
    kept = semdedup_keep(embeddings, threshold=tau, n_centroids=8)
    got = {(r.vec_id, r.cid) for r in kept.collect()}

    asg = {
        r.vec_id: r.cid
        for r in embedding_clusters(embeddings, n_centroids=8).collect()
    }
    vecs = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in embeddings.collect()
    }
    nrm = {i: float(np.sqrt(v @ v)) for i, v in vecs.items()}
    want = set()
    for i, ci in asg.items():
        dup = any(
            j < i
            and cj == ci
            and round(float(vecs[i] @ vecs[j]) / (nrm[i] * nrm[j]), 4) >= tau
            for j, cj in asg.items()
        )
        if not dup:
            want.add((i, ci))
    assert got == want
    assert 0 < len(got) < len(asg)  # prunes something, keeps something

    got2 = {
        (r.vec_id, r.cid)
        for r in semdedup_keep(
            embeddings.repartition(16), threshold=tau, n_centroids=8
        ).collect()
    }
    assert got2 == got
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_semdedup_planted_duplicate_group_keeps_smallest(spark):
    """A planted bundle of near-identical vectors collapses to its
    smallest id; unrelated directions survive untouched."""
    from oplogtoredis_spark.operators.dedup import semdedup_keep

    rows = [
        (10, [1.0, 0.0, 0.0]),
        (11, [0.999, 0.01, 0.0]),
        (12, [0.998, 0.02, 0.0]),
        (20, [0.0, 1.0, 0.0]),
        (30, [0.0, 0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    kept = {
        r.vec_id
        for r in semdedup_keep(
            df, threshold=0.95, n_centroids=3, sample_per_centroid=4
        ).collect()
    }
    assert kept == {10, 20, 30}


def test_zero_norm_embedding_fails_loud(spark):
    """ANSI mode turns an unguarded dot/(na*nb) into a bare DIVIDE_BY_ZERO
    deep in a shuffle; _norm now names the condition at the map stage."""
    from oplogtoredis_spark.operators.dedup import semdedup_keep

    rows = [(0, [1.0, 0.0]), (1, [0.0, 0.0]), (2, [0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    with pytest.raises(Exception, match="zero-norm or NULL embedding"):
        cosine_topk_bruteforce(df, df.where(F.col("vec_id") == 0), k=2).collect()
    with pytest.raises(Exception, match="zero-norm or NULL embedding"):
        semdedup_keep(df, threshold=0.9, n_centroids=2,
                      sample_per_centroid=1).collect()


def test_lsh_bucket_tables_null_vector_fails_loud(spark):
    """A NULL/empty vector explodes to zero rows — without the in-generator
    guard it would silently vanish from every bucket (never a dedup
    candidate, never an ANN result)."""
    rows = [(0, [1.0, 0.5]), (1, None), (2, [0.5, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    from oplogtoredis_spark.operators.similarity import lsh_bucket_tables

    with pytest.raises(Exception, match="no LSH bucket: 1"):
        lsh_bucket_tables(df, "vec_id", "embedding", 4, 2).collect()
    with pytest.raises(Exception, match="no LSH bucket"):
        df2 = spark.createDataFrame(
            [(0, [1.0, 0.5]), (3, [])], "vec_id long, embedding array<double>"
        )
        lsh_bucket_tables(df2, "vec_id", "embedding", 4, 2).collect()
