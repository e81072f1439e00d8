"""Lake maintenance: tombstone GC (dedup-TTL analogue) + snapshot expiry."""

import os

import pytest

from oplogtoredis_spark.sources.schemas import TARGET_SCHEMA
from oplogtoredis_spark.streaming.lake import LakeTable


def _batch(spark, rows):
    cols = "repo string, path string, ts long, tx_idx int, op string, commit string, lang string, content string"
    return spark.createDataFrame(rows, cols)


@pytest.fixture()
def table(tmp_path):
    return LakeTable.create(str(tmp_path / "tbl"), TARGET_SCHEMA, n_buckets=4)


def test_compact_drops_expired_tombstones_only(spark, table):
    table.merge_batch(_batch(spark, [
        ("r/a", "f", 1 << 32, 0, "i", "c", "py", "x"),
        ("r/b", "g", 1 << 32, 0, "i", "c", "py", "y"),
    ]), 0)
    table.merge_batch(_batch(spark, [
        ("r/a", "f", 2 << 32, 0, "d", None, None, None),   # old delete
        ("r/b", "g", 9 << 32, 0, "d", None, None, None),   # recent delete
    ]), 1)
    all_rows = table.read(spark, include_deleted=True).toPandas()
    assert all_rows["deleted"].sum() == 2
    table.compact(spark, drop_tombstones_older_than_ts=5 << 32)
    after = table.read(spark, include_deleted=True).toPandas()
    # the old tombstone is gone; the recent one still fences late events
    assert len(after) == 1 and after.iloc[0]["repo"] == "r/b"
    # live view unchanged semantics (both keys deleted)
    assert len(table.read(spark).toPandas()) == 0


def test_expire_snapshots_removes_unreferenced_dirs(spark, table):
    for i in range(5):
        table.merge_batch(_batch(spark, [
            ("r/a", "f", (i + 1) << 32, 0, "u", f"c{i}", "py", f"v{i}"),
        ]), i)
    data_root = os.path.join(table.path, "data")
    before = sum(len(os.listdir(os.path.join(data_root, s))) for s in os.listdir(data_root))
    removed = table.expire_snapshots(keep_last=2)
    assert removed > 0
    # current state still readable and correct
    got = table.read(spark).toPandas()
    assert list(got["content"]) == ["v4"]
    # older snapshot reads (time travel) beyond the horizon are gone — that's
    # the documented trade, same as Iceberg expire_snapshots


def test_time_travel_read(spark, tmp_path):
    """VERSION AS OF analogue: an older snapshot reads back its exact state
    while its data dirs are retained."""
    from oplogtoredis_spark.sources.schemas import TARGET_SCHEMA
    from oplogtoredis_spark.streaming.lake import LakeTable

    t = LakeTable.create(str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=4)

    def batch(rows):
        return spark.createDataFrame(
            rows,
            "seq long, ts long, tx_idx int, op string, repo string, path string,"
            " commit string, lang string, content string",
        )

    t.merge_batch(batch([(0, 1 << 32, 0, "i", "r", "p", "c1", "py", "v1")]), 0, epoch_ns="tt")
    v1 = t.current_version()
    t.merge_batch(batch([(1, 2 << 32, 0, "i", "r", "p", "c2", "py", "v2")]), 1, epoch_ns="tt")

    assert [r.content for r in t.read(spark).collect()] == ["v2"]
    assert [r.content for r in t.read(spark, version=v1).collect()] == ["v1"]
    hist = t.history()
    assert [h["version"] for h in hist] == [0, 1, 2]
    assert hist[-1]["applied_watermarks"] == {"tt": 1}
