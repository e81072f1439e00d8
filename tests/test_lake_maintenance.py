"""Lake maintenance: tombstone GC (dedup-TTL analogue) + snapshot expiry."""

import os

import pytest

from oplogtoredis_spark.sources.schemas import TARGET_SCHEMA
from oplogtoredis_spark.streaming.lake import LakeTable, SnapshotExpiredError


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


def _manifests(table):
    d = os.path.join(table.path, "_manifests")
    return sorted(n for n in os.listdir(d) if n.startswith("v"))


def _sidecars(table):
    d = os.path.join(table.path, "_manifests")
    return sorted(n for n in os.listdir(d) if n.startswith("idx-"))


def test_expire_metadata_bounds_manifest_count(spark, table):
    """expire_metadata=True deletes expired v*.json and unreferenced bloom
    sidecars — a long stream otherwise accumulates O(epochs) manifests that
    every history()/fsck listdir walks. Tag-pinned versions keep BOTH their
    data and their metadata."""
    # r/a, r/b, r/e land in buckets 3, 1, 0 of 4 — the later one-key epochs
    # stay sparse (frac 1/3 < ADAPTIVE_DENSE_FRAC), so merges PRUNE and the
    # bloom carry-forward takes the filtered-sidecar path, not the
    # all-buckets-replaced empty-ref path
    table.merge_batch(_batch(spark, [
        ("r/a", "f", 1 << 32, 0, "i", "c0", "py", "a0"),
        ("r/b", "g", 1 << 32, 0, "i", "c0", "py", "b0"),
        ("r/e", "m", 1 << 32, 0, "i", "c0", "py", "e0"),
    ]), 0)
    for i in range(1, 4):
        table.merge_batch(_batch(spark, [
            ("r/a", "f", (i + 1) << 32, 0, "u", f"c{i}", "py", f"a{i}"),
        ]), i)
    table.rewrite_clustered(spark, ["path"], bloom_cols=["path"])
    ref0 = table.manifest()["file_blooms_ref"]
    # the next merge replaces only r/a's bucket, so the carry-forward
    # writes a FILTERED sidecar (ref0 stays on disk, referenced only by
    # the rewrite manifest)
    table.merge_batch(_batch(spark, [
        ("r/a", "f", 99 << 32, 0, "u", "c9", "py", "a9"),
    ]), 4)
    ref1 = table.manifest()["file_blooms_ref"]
    assert ref1 and ref1 != ref0 and set(_sidecars(table)) == {ref0, ref1}
    # a second merge on the same bucket: index unchanged -> SAME sidecar
    table.merge_batch(_batch(spark, [
        ("r/a", "f", 100 << 32, 0, "u", "ca", "py", "aa"),
    ]), 5)
    assert table.manifest()["file_blooms_ref"] == ref1
    assert len(_sidecars(table)) == 2
    cur = table.current_version()
    pinned = 3  # pre-rewrite, no bloom ref
    table.create_tag("keep", pinned)
    table.expire_snapshots(keep_last=2, expire_metadata=True)
    kept = _manifests(table)
    assert kept == [f"v{v:08d}.json" for v in (pinned, cur - 1, cur)]
    # ref0's only referent (the rewrite manifest) expired -> sidecar swept;
    # ref1 is live on both kept head manifests
    assert _sidecars(table) == [ref1]
    # current state unaffected; tagged version still readable (data pinned)
    got = table.read(spark).toPandas().sort_values("repo")
    assert list(got["content"]) == ["aa", "b0", "e0"]
    assert table.read(spark, tag="keep").count() == 3
    # expired version: metadata is gone too -> eager SnapshotExpiredError
    # naming the metadata-expiry cause (not an opaque FileNotFoundError)
    with pytest.raises(SnapshotExpiredError, match="expire_metadata"):
        table.manifest(1)
    with pytest.raises(SnapshotExpiredError):
        table.read(spark, version=1)
    # default call never touches metadata (back-compat)
    n_before = len(_manifests(table))
    table.expire_snapshots(keep_last=1)
    assert len(_manifests(table)) == n_before


def test_expire_protects_inflight_claims_and_fresh_orphans(spark, table):
    """expire_snapshots beside a live writer (the HA posture): a manifest
    ABOVE current (claim-then-advance window / orphan awaiting adoption) is
    never expired and its data stays referenced; data dirs and sidecars
    referenced by NO manifest are reclaimed only once stale (a fresh one may
    be an in-flight commit's write — data and sidecars land BEFORE the
    manifest links); dirs referenced only by manifests being expired remain
    reclaimable whatever their age."""
    import json
    import time as _time

    for i in range(4):
        table.merge_batch(_batch(spark, [
            ("r/a", "f", (i + 1) << 32, 0, "u", f"c{i}", "py", f"a{i}"),
        ]), i)
    cur = table.current_version()
    mdir = os.path.join(table.path, "_manifests")

    def _mkdata(snap, backdate=False):
        d = os.path.join(table.path, "data", snap, "pb=0")
        os.makedirs(d)
        with open(os.path.join(d, "part-0.parquet"), "w") as f:
            f.write("x")
        if backdate:
            t = _time.time() - 2 * table.ORPHAN_STALENESS_SECS
            os.utime(d, (t, t))
        return d

    # an in-flight claim at cur+1: manifest linked, CURRENT not yet advanced
    claim_dir = _mkdata(f"v{cur + 1:08d}-claim")
    m = json.load(open(os.path.join(mdir, f"v{cur:08d}.json")))
    m["version"] = cur + 1
    m["buckets"] = {"0": os.path.relpath(claim_dir, table.path)}
    m["file_blooms_ref"] = "idx-claimref.json"
    with open(os.path.join(mdir, f"v{cur + 1:08d}.json"), "w") as f:
        json.dump(m, f)
    for name, backdate in (
        ("idx-claimref.json", True),   # referenced by the claim: protected
        ("idx-freshorphan.json", False),  # unreferenced + fresh: in-flight?
        ("idx-staleorphan.json", True),   # unreferenced + stale: reclaim
    ):
        p = os.path.join(mdir, name)
        with open(p, "w") as f:
            f.write("{}")
        if backdate:
            t = _time.time() - 2 * table.ORPHAN_STALENESS_SECS
            os.utime(p, (t, t))
    fresh_orphan = _mkdata("v99999991-fresh")
    stale_orphan = _mkdata("v99999992-stale", backdate=True)

    table.expire_snapshots(keep_last=1, expire_metadata=True)

    # the claim survives in full: manifest, its data dir, its sidecar
    assert f"v{cur + 1:08d}.json" in _manifests(table)
    assert os.path.isdir(claim_dir)
    side = _sidecars(table)
    assert "idx-claimref.json" in side
    # fresh unreferenced artifacts survive; stale ones are reclaimed
    assert os.path.isdir(fresh_orphan) and not os.path.isdir(stale_orphan)
    assert "idx-freshorphan.json" in side and "idx-staleorphan.json" not in side
    # genuinely expired manifests ARE gone despite their data being fresh
    assert f"v{max(0, cur - 2):08d}.json" not in _manifests(table)
    # current state unaffected
    assert list(table.read(spark).toPandas()["content"]) == ["a3"]


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
