"""Routing derivations T2/T3/T8/T9/R1 against the reference's golden values."""

import hashlib
import struct

from pyspark.sql import functions as F

from oplogtoredis_spark.functions.routing import (
    assign_to_shard,
    bucket_for,
    channels,
    parallelism_key,
    split_namespace,
)


def py_sha256_le_int64(s: str) -> int:
    digest = hashlib.sha256(s.encode()).digest()
    return struct.unpack("<q", digest[-8:])[0]


def test_parallelism_key_golden(spark):
    # Golden from the reference's own test:
    # /root/reference/lib/oplog/processor_test.go:18-19
    assert py_sha256_le_int64("foo") == -5843589418109203719

    df = spark.createDataFrame([("foo",), ("bar",), ("tulip",)], "repo string")
    rows = {r.repo: r.k for r in df.select("repo", parallelism_key(F.col("repo")).alias("k")).collect()}
    assert rows["foo"] == -5843589418109203719
    for name in ("foo", "bar", "tulip"):
        assert rows[name] == py_sha256_le_int64(name)


def test_assign_to_shard_negative_keys(spark):
    # ((k % n) + n) % n — /root/reference/lib/oplog/tail.go:786-788
    df = spark.createDataFrame(
        [(-5843589418109203719,), (-1,), (0,), (7,)], "k long"
    )
    rows = df.select("k", assign_to_shard(F.col("k"), 4).alias("s")).collect()
    for r in rows:
        assert r.s == ((r.k % 4) + 4) % 4
        assert 0 <= r.s < 4


def test_namespace_split(spark):
    # SplitN(2) edge cases — /root/reference/lib/oplog/tail_test.go:441-479
    df = spark.createDataFrame(
        [("db.coll",), ("db.coll.sub",), ("db",), ("db.",)], "ns string"
    )
    db, coll = split_namespace(F.col("ns"))
    got = {r.ns: (r.db, r.coll) for r in df.select("ns", db.alias("db"), coll.alias("coll")).collect()}
    assert got["db.coll"] == ("db", "coll")
    assert got["db.coll.sub"] == ("db", "coll.sub")
    assert got["db"] == ("db", "")
    assert got["db."] == ("db", "")


def test_channels(spark):
    # <ns> and <ns>::<id> — /root/reference/lib/oplog/processor.go:99-109
    df = spark.createDataFrame([("db.coll", "doc1")], "ns string, id string")
    row = df.select(channels(F.col("ns"), F.col("id")).alias("ch")).first()
    assert row.ch == ["db.coll", "db.coll::doc1"]


def test_bucket_stability_and_range(spark):
    df = spark.createDataFrame(
        [("org0/repo0", "a.py"), ("org1/repo1", "b.py")], "repo string, path string"
    )
    b1 = df.select(bucket_for(F.col("repo"), F.col("path"), 32).alias("b")).collect()
    b2 = df.select(bucket_for(F.col("repo"), F.col("path"), 32).alias("b")).collect()
    assert [r.b for r in b1] == [r.b for r in b2]
    assert all(0 <= r.b < 32 for r in b1)
