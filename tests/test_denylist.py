"""Denylist control plane — mirrors the reference's HTTP CRUD + persistence
+ mid-stream application tests (lib/denylist/, acceptance/denylist_*)."""

from oplogtoredis_spark.operators.denylist import DenylistStore


def test_crud_and_persistence(tmp_path):
    p = str(tmp_path / "deny.json")
    d = DenylistStore(p)
    assert d.list() == []
    assert d.add("org/bad") is True
    assert d.add("org/bad") is False  # duplicate PUT → 409 analogue
    assert d.add("org/worse") is True
    assert d.list() == ["org/bad", "org/worse"]
    assert d.remove("org/bad") is True
    assert d.remove("org/bad") is False
    # persistence across "restart" (new instance, same path)
    d2 = DenylistStore(p)
    assert d2.list() == ["org/worse"]


def test_mid_stream_application(spark, tmp_path):
    """CRUD between batches takes effect on the next batch
    (denylist_oplog_test.go:12-75 analogue)."""
    d = DenylistStore(str(tmp_path / "deny.json"))
    df = spark.createDataFrame(
        [("org/a", 1), ("org/b", 2), ("org/c", 3)], "repo string, x int"
    )
    assert d.filter(df).count() == 3
    d.add("org/b")
    assert sorted(r.repo for r in d.filter(df).collect()) == ["org/a", "org/c"]
    d.remove("org/b")
    assert d.filter(df).count() == 3
