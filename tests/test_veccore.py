"""Focused tests for the r6 vectorized cosine-verify kernels (veccore.py):
the blocked-BLAS election/pair paths must be value-exact against the
relational formulations they replaced (same rounding semantics, same
decisions), not merely statistically close."""

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_round4_matches_spark_decimal_semantics():
    """round4_half_up == BigDecimal.valueOf(x).setScale(4, HALF_UP) for
    random values AND exact half boundaries (the decimal-string rule both
    engines' shortest-repr printing agrees on)."""
    from decimal import ROUND_HALF_UP, Decimal

    from oplogtoredis_spark.operators.veccore import round4_half_up

    rng = np.random.default_rng(7)
    xs = np.concatenate(
        [
            rng.uniform(-1, 1, 100000),
            np.array(
                [0.44995, -0.44995, 0.45005, 0.44994999999999998,
                 0.4499500000000001, 0.0, -0.00004, 0.00005, -0.00005,
                 0.99995, -0.99995, 1.0, -1.0]
            ),
            (np.round(rng.uniform(-1, 1, 20000) * 1e4) + 0.5) / 1e4,
        ]
    )
    got = round4_half_up(xs.copy())
    q = Decimal("0.0001")
    exact = np.array(
        [float(Decimal(repr(float(v))).quantize(q, ROUND_HALF_UP)) for v in xs]
    )
    assert (got == exact).all()


def _relational_kept(members, tau):
    """The pre-r6.2 relational election (equality self-join on cid +
    codegen cosine fold + rounded threshold + anti-join) as the reference."""
    from oplogtoredis_spark.operators.similarity import _dot

    a = members.select(
        "cid", F.col("nid").alias("id_a"), F.col("cv").alias("va"),
        F.col("cnorm").alias("na"),
    )
    b = members.select(
        "cid", F.col("nid").alias("id_b"), F.col("cv").alias("vb"),
        F.col("cnorm").alias("nb"),
    )
    dups = (
        a.join(b, "cid")
        .where(F.col("id_a") < F.col("id_b"))
        .where(
            F.round(
                _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 4
            )
            >= F.lit(tau)
        )
        .select(F.col("id_b").alias("nid"))
        .distinct()
    )
    return members.join(dups, "nid", "left_anti").select("nid", "cid")


@pytest.mark.parametrize("tau", [0.4, 0.95])
def test_semdedup_election_vectorized_equals_relational(spark, tau):  # noqa: F811
    """Random clustered members (several clusters, duplicate-heavy): the
    vectorized election returns EXACTLY the relational keep set."""
    from oplogtoredis_spark.operators.dedup import semdedup_elect_vectorized
    from oplogtoredis_spark.operators.similarity import _norm

    rng = np.random.default_rng(11)
    rows = []
    for cid in range(5):
        center = rng.normal(size=16)
        for i in range(120):
            v = center + rng.normal(scale=0.35, size=16)
            rows.append((cid * 1000 + i, cid, [float(x) for x in v]))
    members = (
        spark.createDataFrame(rows, "nid long, cid int, cv array<double>")
        .withColumn("cnorm", _norm(F.col("cv")))
    )
    got = {
        (r.nid, r.cid)
        for r in semdedup_elect_vectorized(members, tau, id_out="nid").collect()
    }
    want = {(r.nid, r.cid) for r in _relational_kept(members, tau).collect()}
    assert got == want and len(want) > 0


def test_embedding_pairs_vectorized_equals_relational(spark):  # noqa: F811
    """embedding_dup_pairs_lsh (vectorized kernel) vs the retained
    relational fallback on the sf0.001 embeddings: identical pair sets AND
    bit-identical rounded cosines."""
    from oplogtoredis_spark.operators.dedup import (
        _embedding_dup_pairs_lsh_relational,
        embedding_dup_pairs_lsh,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    kw = dict(threshold=0.4, n_planes=4, n_tables=8)
    got = {
        (r.id_a, r.id_b, r.cosine)
        for r in embedding_dup_pairs_lsh(emb, "vec_id", "embedding", **kw).collect()
    }
    want = {
        (r.id_a, r.id_b, r.cosine)
        for r in _embedding_dup_pairs_lsh_relational(
            emb, "vec_id", "embedding", **kw
        ).collect()
    }
    assert got == want and len(want) > 0


def test_embedding_pairs_vectorized_null_vector_still_loud(spark):  # noqa: F811
    """The NULL/empty-vector guard must stay loud through the vectorized
    path (the collect that builds the kernel broadcast runs the guarded
    bucket aggregate)."""
    from oplogtoredis_spark.operators.dedup import embedding_dup_pairs_lsh

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, None)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(Exception, match="no LSH bucket"):
        embedding_dup_pairs_lsh(df, "vec_id", "embedding", threshold=0.9)
