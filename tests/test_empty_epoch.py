"""Empty micro-batches must COMMIT their epoch, not crash the writer.

A fully-filtered epoch is a legitimate steady state (the denylist can drop
every event of a batch; a quiet source can deliver none), and Spark 4's AQE
empty-relation propagation erases the CollectMetrics node from such plans —
``Observation.get`` then dies in ``toPyRow``'s assertion
(functions/histograms.py observed_row documents the mechanism; found by a
/verify boundary drive, not by unit tests on non-empty fixtures)."""

import pytest
from pyspark.sql import functions as F

from oplogtoredis_spark.sources.schemas import TARGET_SCHEMA
from oplogtoredis_spark.streaming.lake import LakeTable


def _batch(spark, ids, ts, op="u"):
    cols = (
        "repo string, path string, ts long, tx_idx int, op string,"
        " commit string, lang string, content string"
    )
    return spark.createDataFrame(
        [
            ("docs", str(i), ts << 32, int(i), op, f"c{ts}", "en", f"body {i}")
            for i in ids
        ],
        cols,
    )


def _empty(spark):
    return _batch(spark, range(4), ts=1).where(F.col("path") == "nope")


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_empty_batch_commits_fresh_table(spark, tmp_path, mode):
    t = LakeTable.create(str(tmp_path / mode), TARGET_SCHEMA, n_buckets=4)
    v0 = t.current_version()
    st = t.merge_batch(_empty(spark), 0, merge_mode=mode)
    assert st["applied"] == 0 and st["rows_out"] == 0
    assert t.current_version() == v0 + 1  # the epoch is COMMITTED
    assert t.read(spark).count() == 0
    # replay of the empty epoch is recognized, not re-applied
    st2 = t.merge_batch(_empty(spark), 0, merge_mode=mode)
    assert st2.get("skipped") or st2.get("dedup") or t.current_version() == v0 + 1
    # the stream continues normally afterwards
    t.merge_batch(_batch(spark, range(8), ts=2), 1, merge_mode=mode)
    assert t.read(spark).count() == 8


def test_empty_batch_on_populated_table_keeps_state(spark, tmp_path):
    t = LakeTable.create(str(tmp_path / "tbl"), TARGET_SCHEMA, n_buckets=4)
    t.merge_batch(_batch(spark, range(16), ts=1), 0)
    before = sorted((r.path, r.last_ts) for r in t.read(spark).collect())
    st = t.merge_batch(_empty(spark), 1)
    assert st["applied"] == 0
    assert sorted((r.path, r.last_ts) for r in t.read(spark).collect()) == before
    # later epochs still apply and the batch-id ledger stayed consistent
    t.merge_batch(_batch(spark, [3], ts=9), 2)
    assert t.read(spark).where(F.col("path") == "3").first().last_ts == 9 << 32
