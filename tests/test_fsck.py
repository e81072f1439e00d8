"""LakeTable.fsck — integrity checks over metadata and the live view."""

import os
import shutil

import pytest

from oplogtoredis_spark.sources.schemas import TARGET_SCHEMA
from oplogtoredis_spark.streaming.lake import LakeTable


def _batch(spark, rows):
    cols = (
        "repo string, path string, ts long, tx_idx int, op string, "
        "commit string, lang string, content string"
    )
    return spark.createDataFrame(rows, cols)


@pytest.fixture()
def table(spark, tmp_path):
    t = LakeTable.create(str(tmp_path / "tbl"), TARGET_SCHEMA, n_buckets=8)
    t.merge_batch(
        _batch(
            spark,
            [
                ("r", f"f{i}", 1 << 32, i, "i", "c1", "py", f"v{i}")
                for i in range(20)
            ],
        ),
        0,
    )
    return t


def _report(t, spark, **kw):
    return {
        r["check"]: r["n_violations"] for r in t.fsck(spark, **kw).collect()
    }


def _bucket_files(t):
    m = t.manifest()
    out = {}
    for b, d in m["buckets"].items():
        bdir = os.path.join(t.path, d)
        out[int(b)] = [
            os.path.join(bdir, f)
            for f in os.listdir(bdir)
            if f.endswith(".parquet")
        ]
    return out


def test_healthy_table_reports_all_zero(spark, table):
    rep = _report(table, spark)
    assert set(rep) == {
        "fsck:missing_base_dir",
        "fsck:missing_delta_dir",
        "fsck:orphan_data_dirs",
        "fsck:missing_index_sidecar",
        "fsck:bucket_assignment",
        "fsck:misplaced_file_row",
        "fsck:duplicate_live_key",
    }
    assert all(v == 0 for v in rep.values()), rep


def test_missing_index_sidecar_is_detected(spark, table):
    """A bloom sidecar referenced by a retained manifest but deleted from
    disk is surfaced (planning stays sound — files are just kept — but a
    lost index is corruption worth seeing)."""
    import os

    table.rewrite_clustered(spark, ["path"], bloom_cols=["path"])
    ref = table.manifest()["file_blooms_ref"]
    assert ref
    os.remove(os.path.join(table.path, "_manifests", ref))
    rep = _report(table, spark)
    assert rep["fsck:missing_index_sidecar"] == 1


def test_duplicated_base_file_is_detected(spark, table):
    files = _bucket_files(table)
    b, fs = next((b, fs) for b, fs in files.items() if fs)
    shutil.copy(fs[0], fs[0].replace(".parquet", "-dup.parquet"))
    rep = _report(table, spark)
    assert rep["fsck:duplicate_live_key"] > 0
    assert rep["fsck:bucket_assignment"] == 0  # copies sit in the RIGHT bucket


def test_misplaced_file_breaks_bucket_assignment(spark, table):
    files = _bucket_files(table)
    nonempty = [(b, fs) for b, fs in files.items() if fs]
    (b1, fs1), (b2, _fs2) = nonempty[0], nonempty[1]
    m = table.manifest()
    dst = os.path.join(table.path, m["buckets"][str(b2)], "smuggled.parquet")
    shutil.copy(fs1[0], dst)
    rep = _report(table, spark)
    # the smuggled rows carry bucket=b1 but LIVE in b2's dir — their bucket
    # column still matches the hash (bucket_assignment stays clean), so only
    # the file-location check can catch them; pruned reads and merges keyed
    # on b2 would silently miss these rows
    assert rep["fsck:misplaced_file_row"] > 0
    assert rep["fsck:bucket_assignment"] == 0
    assert rep["fsck:duplicate_live_key"] > 0


def test_corrupted_bucket_column_detected(spark, table):
    import pandas as pd

    files = _bucket_files(table)
    _b, fs = next((b, fs) for b, fs in files.items() if fs)
    df = pd.read_parquet(fs[0])
    df["bucket"] = (df["bucket"] + 1) % 8
    df.to_parquet(fs[0].replace(".parquet", "-doc.parquet"), index=False)
    rep = _report(table, spark)
    # wrong column value: fails both the hash check and the location check
    assert rep["fsck:bucket_assignment"] > 0
    assert rep["fsck:misplaced_file_row"] > 0


def test_missing_dir_short_circuits_deep_checks(spark, table):
    m = table.manifest()
    d = next(iter(m["buckets"].values()))
    shutil.rmtree(os.path.join(table.path, d))
    rep = _report(table, spark)
    assert rep["fsck:missing_base_dir"] == 1
    # deep checks are skipped (they would crash on the missing dir)
    assert "fsck:duplicate_live_key" not in rep


def test_orphan_dirs_counted(spark, table):
    ghost = os.path.join(table.path, "data", "v99999999-dead", "pb=0")
    os.makedirs(ghost)
    rep = _report(table, spark)
    assert rep["fsck:orphan_data_dirs"] == 1
    assert rep["fsck:duplicate_live_key"] == 0


def test_missing_delta_dir_detected(spark, table):
    table.merge_batch(
        _batch(spark, [("r", "f1", 2 << 32, 0, "u", "c2", "py", "w")]),
        1,
        merge_mode="mor",
    )
    m = table.manifest()
    entry = next(es[0] for es in m["bucket_deltas"].values() if es)
    shutil.rmtree(os.path.join(table.path, entry["dir"]))
    rep = _report(table, spark)
    assert rep["fsck:missing_delta_dir"] == 1


def test_shallow_mode_skips_spark_jobs(spark, table):
    rep = _report(table, spark, deep=False)
    assert set(rep) == {
        "fsck:missing_base_dir",
        "fsck:missing_delta_dir",
        "fsck:orphan_data_dirs",
        "fsck:missing_index_sidecar",
    }
