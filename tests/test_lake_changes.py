"""LakeTable.changes(): the net changelog scan between two snapshots
(Delta CDF / Iceberg changelog analogue — the table-side counterpart of the
reference's per-op Redis publication stream, lib/redispub/publisher.go).

Covers: insert/update/delete classification, net semantics (insert+delete
in-window, unchanged rows, tombstone→tombstone emit nothing), manifest-diff
bucket pruning (unchanged buckets never read), merge-on-read deltas, schema
evolution across the window, and the empty same-version diff.
"""

import pytest

from pyspark.sql import functions as F

from oplogtoredis_spark.sources.schemas import TARGET_SCHEMA
from oplogtoredis_spark.streaming.lake import LakeTable


def _batch(spark, rows):
    cols = (
        "repo string, path string, ts long, tx_idx int, op string,"
        " commit string, lang string, content string"
    )
    return spark.createDataFrame(rows, cols)


@pytest.fixture()
def table(tmp_path):
    return LakeTable.create(str(tmp_path / "tbl"), TARGET_SCHEMA, n_buckets=8)


def _types(df):
    return {
        (r["repo"], r["path"], r["_change_type"]) for r in df.collect()
    }


def test_insert_update_delete_classification(spark, table):
    table.merge_batch(
        _batch(
            spark,
            [
                ("r/a", "keep.py", 1 << 32, 0, "i", "c0", "py", "same"),
                ("r/a", "upd.py", 1 << 32, 1, "i", "c0", "py", "v1"),
                ("r/a", "del.py", 1 << 32, 2, "i", "c0", "py", "bye"),
            ],
        ),
        0,
    )
    v1 = table.current_version()
    table.merge_batch(
        _batch(
            spark,
            [
                ("r/a", "upd.py", 2 << 32, 0, "u", "c1", "py", "v2"),
                ("r/a", "del.py", 2 << 32, 1, "d", None, None, None),
                ("r/a", "new.py", 2 << 32, 2, "i", "c1", "py", "hi"),
            ],
        ),
        1,
    )
    ch = table.changes(spark, v1)
    assert _types(ch) == {
        ("r/a", "upd.py", "update_preimage"),
        ("r/a", "upd.py", "update_postimage"),
        ("r/a", "del.py", "delete"),
        ("r/a", "new.py", "insert"),
    }
    rows = {(r["path"], r["_change_type"]): r for r in ch.collect()}
    assert rows[("upd.py", "update_preimage")]["content"] == "v1"
    assert rows[("upd.py", "update_postimage")]["content"] == "v2"
    assert rows[("del.py", "delete")]["content"] == "bye"  # pre-image payload
    assert all(r["_commit_version"] == table.current_version() for r in rows.values())


def test_net_semantics_emit_nothing(spark, table):
    table.merge_batch(
        _batch(spark, [("r/a", "gone.py", 1 << 32, 0, "d", None, None, None)]), 0
    )
    v1 = table.current_version()
    # insert+delete within the window nets to nothing; tombstone stays
    # tombstone (a DIFFERENT delete event wins the seat) nets to nothing
    table.merge_batch(
        _batch(
            spark,
            [
                ("r/a", "flash.py", 2 << 32, 0, "i", "c1", "py", "hi"),
                ("r/a", "gone.py", 2 << 32, 1, "d", None, None, None),
            ],
        ),
        1,
    )
    table.merge_batch(
        _batch(spark, [("r/a", "flash.py", 3 << 32, 0, "d", None, None, None)]), 2
    )
    assert table.changes(spark, v1).count() == 0


def test_same_version_and_unchanged_rows(spark, table):
    table.merge_batch(
        _batch(spark, [("r/a", "a.py", 1 << 32, 0, "i", "c0", "py", "x")]), 0
    )
    v1 = table.current_version()
    assert table.changes(spark, v1, v1).count() == 0
    # an epoch whose event LOSES the LWW seat changes nothing
    table.merge_batch(
        _batch(spark, [("r/a", "a.py", 0, 0, "u", "cX", "py", "OLD")]), 1
    )
    assert table.changes(spark, v1).count() == 0


def test_bucket_pruning_reads_only_changed_buckets(spark, tmp_path):
    t = LakeTable.create(str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=8)
    rows = [
        (f"r/{i}", f"f{i}.py", 1 << 32, i, "i", "c0", "py", f"v{i}")
        for i in range(64)
    ]
    t.merge_batch(_batch(spark, rows), 0)
    v1 = t.current_version()
    t.merge_batch(
        _batch(spark, [("r/0", "f0.py", 2 << 32, 0, "u", "c1", "py", "v0b")]), 1
    )
    ch = t.changes(spark, v1)
    # only the touched bucket's dirs are scanned — the manifest diff prunes
    # the other 7 buckets out of both snapshot reads
    m = t.manifest(v1)
    from oplogtoredis_spark.functions.routing import bucket_for

    b0 = spark.range(1).select(
        bucket_for(F.lit("r/0"), F.lit("f0.py"), 8).alias("b")
    ).collect()[0]["b"]
    scanned = set(ch.inputFiles())
    assert scanned, "diff plan should scan the changed bucket"
    for f in scanned:
        assert f"pb={b0}/" in f, f"unchanged bucket file scanned: {f}"
    assert _types(ch) == {
        ("r/0", "f0.py", "update_preimage"),
        ("r/0", "f0.py", "update_postimage"),
    }
    assert m is not None


def test_changes_over_mor_deltas(spark, tmp_path):
    t = LakeTable.create(str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=4)
    t.merge_batch(
        _batch(spark, [("r/a", "a.py", 1 << 32, 0, "i", "c0", "py", "v1")]),
        0,
        merge_mode="mor",
    )
    v1 = t.current_version()
    t.merge_batch(
        _batch(
            spark,
            [
                ("r/a", "a.py", 2 << 32, 0, "u", "c1", "py", "v2"),
                ("r/b", "b.py", 2 << 32, 1, "i", "c1", "py", "new"),
            ],
        ),
        1,
        merge_mode="mor",
    )
    ch = t.changes(spark, v1)
    assert _types(ch) == {
        ("r/a", "a.py", "update_preimage"),
        ("r/a", "a.py", "update_postimage"),
        ("r/b", "b.py", "insert"),
    }
    rows = {(r["path"], r["_change_type"]): r["content"] for r in ch.collect()}
    assert rows[("a.py", "update_preimage")] == "v1"
    assert rows[("a.py", "update_postimage")] == "v2"


def test_changes_across_schema_evolution(spark, table):
    table.merge_batch(
        _batch(spark, [("r/a", "a.py", 1 << 32, 0, "i", "c0", "py", "v1")]), 0
    )
    v1 = table.current_version()
    evolved = _batch(
        spark, [("r/a", "a.py", 2 << 32, 0, "u", "c1", "py", "v2")]
    ).withColumn("stars", F.lit(7).cast("long"))
    table.merge_batch(evolved, 1, extra_payload_cols=("stars",))
    ch = table.changes(spark, v1)
    rows = {r["_change_type"]: r for r in ch.collect()}
    assert set(rows) == {"update_preimage", "update_postimage"}
    assert rows["update_preimage"]["stars"] is None  # pre-evolution snapshot
    assert rows["update_postimage"]["stars"] == 7


def test_expired_snapshot_fails_loud(spark, table):
    """A time-travel or changelog read of a snapshot whose data dirs were
    reclaimed by expire_snapshots raises SnapshotExpiredError EAGERLY (at
    plan time, with the retention cause named) — not a lazy opaque
    path-not-found from the parquet scan at action time."""
    from oplogtoredis_spark.streaming.lake import SnapshotExpiredError

    for e in range(4):
        table.merge_batch(
            _batch(
                spark,
                [("r/a", "a.py", (e + 1) << 32, 0, "u", f"c{e}", "py", f"v{e}")],
            ),
            e,
        )
    v0 = 1  # the first committed snapshot
    assert table.read(spark, version=v0).count() == 1  # retained: readable
    removed = table.expire_snapshots(keep_last=1)
    assert removed > 0
    with pytest.raises(SnapshotExpiredError, match="expire_snapshots"):
        table.read(spark, version=v0)
    with pytest.raises(SnapshotExpiredError, match=f"v{v0}"):
        table.changes(spark, v0).collect()
    # the retained current snapshot stays readable, with the newest row
    cur = table.read(spark).collect()
    assert len(cur) == 1 and cur[0]["content"] == "v3"
