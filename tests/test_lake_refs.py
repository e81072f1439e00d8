"""Named refs (tags) + rollback — Iceberg's create_tag / rollback_to_snapshot
analogues on the lake sink.

The reference has no table format (Redis pub/sub is fire-and-forget, history
lives only in the oplog, /root/reference/lib/redispub/publisher.go); these are
lake-side capabilities the north_rule's snapshot design adds, matched to
Iceberg semantics: a tag PINS its snapshot through expire_snapshots, and
rollback commits a NEW version whose content (state + replay ledger) is the
target's.
"""

import pytest

from oplogtoredis_spark.sources.schemas import TARGET_SCHEMA
from oplogtoredis_spark.streaming.lake import LakeTable, SnapshotExpiredError


def _batch(spark, rows):
    cols = (
        "repo string, path string, ts long, tx_idx int, op string, "
        "commit string, lang string, content string"
    )
    return spark.createDataFrame(rows, cols)


@pytest.fixture()
def table(tmp_path):
    return LakeTable.create(str(tmp_path / "tbl"), TARGET_SCHEMA, n_buckets=8)


def _state(table, spark, **read_kw):
    df = table.read(spark, **read_kw).toPandas()
    return sorted(zip(df["path"], df["content"]))


def test_tag_create_resolve_read(spark, table):
    table.merge_batch(
        _batch(spark, [("r", "a", 1 << 32, 0, "i", "c1", "py", "v1")]), 0
    )
    v1 = table.current_version()
    assert table.create_tag("nightly") == v1
    table.merge_batch(
        _batch(spark, [("r", "a", 2 << 32, 0, "u", "c2", "py", "v2")]), 1
    )
    assert table.tags() == {"nightly": v1}
    assert table.resolve_ref("nightly") == v1
    assert _state(table, spark, tag="nightly") == [("a", "v1")]
    assert _state(table, spark) == [("a", "v2")]
    # tag read == version read, byte for byte
    assert _state(table, spark, tag="nightly") == _state(table, spark, version=v1)


def test_tag_guards(spark, table):
    table.merge_batch(
        _batch(spark, [("r", "a", 1 << 32, 0, "i", "c1", "py", "v1")]), 0
    )
    table.create_tag("t")
    with pytest.raises(ValueError, match="already exists"):
        table.create_tag("t")
    table.merge_batch(
        _batch(spark, [("r", "a", 2 << 32, 0, "u", "c2", "py", "v2")]), 1
    )
    v2 = table.current_version()
    assert table.create_tag("t", replace=True) == v2  # REPLACE TAG moves it
    assert table.resolve_ref("t") == v2
    with pytest.raises(ValueError, match="invalid ref name"):
        table.create_tag("../escape")
    with pytest.raises(ValueError, match="invalid ref name"):
        table.create_tag("")
    with pytest.raises(FileNotFoundError):
        table.create_tag("ghost", version=999)
    with pytest.raises(KeyError, match="no such tag"):
        table.resolve_ref("absent")
    with pytest.raises(KeyError, match="no such tag"):
        table.drop_tag("absent")
    with pytest.raises(ValueError, match="not both"):
        table.read(spark, version=v2, tag="t")
    table.drop_tag("t")
    assert table.tags() == {}


def test_tag_pins_snapshot_through_expiry(spark, table):
    # v1: insert a+b; v2 and v3 each rewrite a's bucket, so v2's dir for a is
    # referenced by NOTHING kept — unless a tag pins it
    table.merge_batch(
        _batch(
            spark,
            [
                ("r", "a", 1 << 32, 0, "i", "c1", "py", "a1"),
                ("r", "b", 1 << 32, 1, "i", "c1", "py", "b1"),
            ],
        ),
        0,
    )
    v1 = table.current_version()
    table.create_tag("keepme", version=v1)
    table.merge_batch(
        _batch(spark, [("r", "a", 2 << 32, 0, "u", "c2", "py", "a2")]), 1
    )
    v2 = table.current_version()
    table.merge_batch(
        _batch(spark, [("r", "a", 3 << 32, 0, "u", "c3", "py", "a3")]), 2
    )
    table.expire_snapshots(keep_last=1)
    # tagged snapshot fully readable after expiry
    assert _state(table, spark, tag="keepme") == [("a", "a1"), ("b", "b1")]
    # the untagged intermediate lost its only-referenced dir
    with pytest.raises(SnapshotExpiredError):
        table.read(spark, version=v2).collect()
    assert _state(table, spark) == [("a", "a3"), ("b", "b1")]
    # dropping the tag releases the bytes on the NEXT expiry
    table.drop_tag("keepme")
    table.expire_snapshots(keep_last=1)
    with pytest.raises(SnapshotExpiredError):
        table.read(spark, version=v1).collect()


def test_tags_listing_survives_dotted_names_and_tmp_leftovers(spark, table):
    import os

    table.merge_batch(
        _batch(spark, [("r", "a", 1 << 32, 0, "i", "c1", "py", "v1")]), 0
    )
    v1 = table.current_version()
    # a legal name CONTAINING ".tmp-" must list (no substring filtering)
    table.create_tag("rel-1.tmp-candidate")
    # a crashed-writer leftover (`<name>.json.tmp-<hex>`) must NOT list
    with open(
        os.path.join(table._refs_dir, "ghost.json.tmp-deadbeef"), "w"
    ) as f:
        f.write('{"name": "ghost", "version": 999}')
    assert table.tags() == {"rel-1.tmp-candidate": v1}
    assert table.resolve_ref("rel-1.tmp-candidate") == v1


def test_rollback_restores_state_and_replay_ledger(spark, table):
    table.merge_batch(
        _batch(spark, [("r", "a", 1 << 32, 0, "i", "c1", "py", "good")]), 0
    )
    v1 = table.current_version()
    table.merge_batch(
        _batch(spark, [("r", "a", 2 << 32, 0, "u", "c2", "py", "BAD")]), 1
    )
    v2 = table.current_version()
    v3 = table.rollback(v1)
    assert v3 == v2 + 1 and table.current_version() == v3
    assert _state(table, spark) == [("a", "good")]
    # the changelog across the rollback is the INVERSE diff
    ch = table.changes(spark, v2, v3).toPandas()
    got = dict(zip(ch["_change_type"], ch["content"]))
    assert got == {"update_preimage": "BAD", "update_postimage": "good"}
    # the replay ledger rolled back with the state: epoch 1 applies again
    assert not table.epoch_applied("", 1)
    table.merge_batch(
        _batch(spark, [("r", "a", 3 << 32, 0, "u", "c3", "py", "fixed")]), 1
    )
    assert _state(table, spark) == [("a", "fixed")]


def test_rollback_guards(spark, table):
    table.merge_batch(
        _batch(spark, [("r", "a", 1 << 32, 0, "i", "c1", "py", "a1")]), 0
    )
    v1 = table.current_version()
    with pytest.raises(ValueError, match="roll forward"):
        table.rollback(v1 + 5)
    assert table.rollback(v1) == v1  # no-op to CURRENT
    # expire the target, then rolling back to it must fail loud
    table.merge_batch(
        _batch(spark, [("r", "a", 2 << 32, 0, "u", "c2", "py", "a2")]), 1
    )
    table.merge_batch(
        _batch(spark, [("r", "a", 3 << 32, 0, "u", "c3", "py", "a3")]), 2
    )
    table.expire_snapshots(keep_last=1)
    with pytest.raises(SnapshotExpiredError, match="rollback"):
        table.rollback(v1)


def test_rollback_pins_target_dirs_through_expiry(spark, table):
    # after a rollback commit, the target's data dirs are referenced by the
    # ROLLBACK manifest itself, so expire(keep_last=1) cannot reclaim them
    table.merge_batch(
        _batch(spark, [("r", "a", 1 << 32, 0, "i", "c1", "py", "keep")]), 0
    )
    v1 = table.current_version()
    table.merge_batch(
        _batch(spark, [("r", "a", 2 << 32, 0, "u", "c2", "py", "bad")]), 1
    )
    table.rollback(v1)
    table.expire_snapshots(keep_last=1)
    assert _state(table, spark) == [("a", "keep")]
