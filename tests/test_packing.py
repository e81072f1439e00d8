"""Deterministic sequence packing (operators/packing.py)."""

import pytest
from pyspark.sql import functions as F

from oplogtoredis_spark.operators.packing import pack_chunks


def _chunks(spark, n=60):
    rows = [(i, 0, 10 + (i % 7)) for i in range(n)]
    return spark.createDataFrame(
        rows, "doc_id long, chunk_idx int, n_tokens int"
    )


def test_all_rows_kept_and_shards_bounded(spark):
    df = _chunks(spark)
    out = pack_chunks(df, budget=100).toPandas()
    assert len(out) == 60
    total = out["n_tokens"].sum()
    n_shards = -(-int(total) // 100)
    assert set(out["shard_id"]) <= set(range(n_shards))


def test_positions_and_offsets_are_consistent(spark):
    out = pack_chunks(_chunks(spark), budget=100).toPandas()
    for _sid, g in out.groupby("shard_id"):
        g = g.sort_values("pack_pos").reset_index(drop=True)
        # contiguous 0..k-1 positions; offset = cumsum of earlier tokens
        assert list(g["pack_pos"]) == list(range(len(g)))
        run = 0
        for _, r in g.iterrows():
            assert r["token_offset"] == run
            run += r["n_tokens"]


def test_partition_order_invariance(spark):
    df = _chunks(spark, n=100)
    a = sorted(map(tuple, pack_chunks(df, budget=128).collect()))
    b = sorted(
        map(
            tuple,
            pack_chunks(
                df.repartition(7, F.col("n_tokens")), budget=128
            ).collect(),
        )
    )
    assert a == b


def test_salt_draws_an_independent_packing(spark):
    df = _chunks(spark)
    a = pack_chunks(df, budget=100).toPandas().set_index(["doc_id"])
    b = pack_chunks(df, budget=100, salt="v2").toPandas().set_index(["doc_id"])
    assert (a["shard_id"] != b.loc[a.index, "shard_id"]).any()


def test_n_shards_override(spark):
    out = pack_chunks(_chunks(spark), n_shards=3).toPandas()
    assert set(out["shard_id"]) <= {0, 1, 2}


def test_guards(spark):
    df = _chunks(spark)
    with pytest.raises(ValueError, match="budget"):
        pack_chunks(df, budget=0)
    with pytest.raises(ValueError, match="id_cols"):
        pack_chunks(df, id_cols=())
    with pytest.raises(ValueError, match="collide"):
        pack_chunks(df.withColumn("shard_id", F.lit(1)))
    # a NEGATIVE token count would silently fold into the running window
    # sum (well-formed but wrong offsets) — must fail loud like NULL does
    bad = df.withColumn(
        "n_tokens",
        F.when(F.col("doc_id") == 1, F.lit(-5)).otherwise(F.col("n_tokens")),
    )
    with pytest.raises(Exception, match="NULL/negative n_tokens"):
        pack_chunks(bad, budget=100).collect()


def test_empty_input(spark):
    df = _chunks(spark).where("doc_id < 0")
    assert pack_chunks(df, budget=100).count() == 0
