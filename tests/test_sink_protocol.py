"""Sink-protocol contract: the runner and the delivery semantics depend only
on the UpsertSink surface (streaming/sink.py), not on LakeTable internals —
the Iceberg swap point. The same end-to-end contract (ordered LWW, exact
replay skip, tombstoned deletes, parity with the single-threaded oracle)
must hold for BOTH the production LakeTable and the structurally different
InMemorySink."""

import pytest

from oplogtoredis_spark.config import EngineConfig
from oplogtoredis_spark.plans.oracle import assert_parity, replay_oracle
from oplogtoredis_spark.sources.generator import generate_events, write_events
from oplogtoredis_spark.streaming.lake import LakeTable
from oplogtoredis_spark.streaming.runner import run_to_completion
from oplogtoredis_spark.streaming.sink import InMemorySink, UpsertSink

DENY = ("denied_org/repo0", "denied_org/repo1")
CFG = EngineConfig(denylist=DENY, target_buckets=8)


def test_both_sinks_satisfy_protocol():
    assert isinstance(LakeTable("/tmp/_proto_probe"), UpsertSink)
    assert isinstance(InMemorySink("/tmp/_proto_probe"), UpsertSink)


@pytest.mark.parametrize("factory", [None, InMemorySink], ids=["lake", "inmemory"])
def test_stream_delivery_contract_per_sink(spark, tmp_path, factory):
    ev = generate_events(n_events=1200, n_repos=15, seed=21, dup_frac=0.1)
    d = str(tmp_path / "ev")
    write_events(ev, d, n_files=4)
    kw = {} if factory is None else {"sink_factory": factory}
    sink = run_to_completion(
        spark, d, str(tmp_path / "tbl"), str(tmp_path / "ckpt"), CFG, **kw
    )
    got = (
        sink.read(spark)
        .toPandas()
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )
    assert_parity(got, replay_oracle(ev, DENY))


def test_inmemory_sink_replay_skip(spark):
    """Epoch replay (foreachBatch re-invocation) must be skipped by ANY
    conforming sink — the protocol's exactly-once half."""
    sink = InMemorySink("/tmp/_proto_replay")
    sink.state.clear(), sink.applied.clear()
    batch = spark.createDataFrame(
        [(0, 1 << 32, 0, "i", "r", "p", "c", "py", "body")],
        "seq long, ts long, tx_idx int, op string, repo string, path string,"
        " commit string, lang string, content string",
    )
    s1 = sink.merge_batch(batch, 0, epoch_ns="x")
    s2 = sink.merge_batch(batch, 0, epoch_ns="x")  # replay
    assert s1["applied"] == 1
    assert s2 == {"skipped_replay": True}
    assert sink.read(spark).count() == 1


# ---------------------------------------------------------------------------
# Iceberg dry-run planner (streaming/iceberg.py): the UpsertSink -> Iceberg
# mapping pinned as golden SQL — what a cluster deployment executes per
# protocol method. No jars ship here, so the planner runs plan-only.
# ---------------------------------------------------------------------------
def test_iceberg_planner_satisfies_protocol():
    from oplogtoredis_spark.streaming.iceberg import IcebergSinkPlanner

    assert isinstance(IcebergSinkPlanner("lake.files"), UpsertSink)


MERGE_GOLDEN = """\
MERGE INTO iceberg.lake.files t
USING (
  SELECT repo, path, w.* FROM (
    SELECT repo, path,
           max_by(struct(commit, lang, content, content_sha256, last_ts, last_tx_idx, deleted),
                  struct(last_ts, last_tx_idx)) AS w
    FROM (
      SELECT
      repo,
      path,
      commit,
      lang,
      content,
      sha2(content, 256) AS content_sha256,
      ts AS last_ts,
      CAST(tx_idx AS INT) AS last_tx_idx,
      op = 'd' AS deleted
      FROM otr_batch_7
    )
    GROUP BY repo, path
  )
) s
ON t.repo = s.repo AND t.path = s.path
WHEN MATCHED AND (s.last_ts > t.last_ts OR (s.last_ts = t.last_ts AND s.last_tx_idx > t.last_tx_idx)) THEN UPDATE SET
    t.commit = s.commit,
    t.lang = s.lang,
    t.content = s.content,
    t.content_sha256 = s.content_sha256,
    t.last_ts = s.last_ts,
    t.last_tx_idx = s.last_tx_idx,
    t.deleted = s.deleted
WHEN NOT MATCHED THEN INSERT (repo, path, commit, lang, content, content_sha256, last_ts, last_tx_idx, deleted)
  VALUES (s.repo, s.path, s.commit, s.lang, s.content, s.content_sha256, s.last_ts, s.last_tx_idx, s.deleted)"""


def test_iceberg_merge_sql_golden():
    """The MERGE the planner emits IS the LWW predicate of LakeTable.merge_batch
    expanded to ANSI SQL: in-batch max_by collapse, ordered WHEN MATCHED
    update, tombstone flag on delete, insert otherwise."""
    from oplogtoredis_spark.streaming.iceberg import IcebergSinkPlanner

    p = IcebergSinkPlanner("lake.files")
    stats = p.merge_batch(None, 7, epoch_ns="ck")
    assert stats["planned"] and stats["epoch_key"] == "ck:7"
    assert stats["sql"] == MERGE_GOLDEN
    rec = [x for x in p.plans if x["op"] == "merge"][0]
    # the epoch identity commits as a snapshot-summary property — the
    # replay check reads it back from the snapshots metadata table
    assert rec["commit_properties"] == {"otr.epoch-key": "ck:7"}
    check = [x for x in p.plans if x["op"] == "epoch_check"][0]
    assert "snapshots" in check["sql"] and "otr.epoch-key" in check["sql"]


def test_iceberg_planner_replay_and_maintenance_goldens():
    from oplogtoredis_spark.streaming.iceberg import IcebergSinkPlanner

    p = IcebergSinkPlanner("lake.files")
    p.merge_batch(None, 0, epoch_ns="ck")
    assert p.merge_batch(None, 0, epoch_ns="ck") == {"skipped_replay": True}
    assert p.epoch_applied("ck", 0) is True and p.epoch_applied("ck", 1) is False

    assert p.read_sql() == "SELECT * FROM iceberg.lake.files\nWHERE NOT deleted"
    p.compact(drop_tombstones_older_than_ts=12345)
    comp = [x for x in p.plans if x["op"] == "compact"][0]
    assert "DELETE FROM iceberg.lake.files\nWHERE deleted AND last_ts < 12345" in comp["sql"]
    assert "CALL iceberg.system.rewrite_data_files(table => 'lake.files')" in comp["sql"]
    p.expire_snapshots(keep_last=5)
    exp = [x for x in p.plans if x["op"] == "expire_snapshots"][0]
    assert exp["sql"] == (
        "CALL iceberg.system.expire_snapshots(table => 'lake.files', retain_last => 5)"
    )


MOR_DDL_GOLDEN = """\
ALTER TABLE iceberg.lake.files SET TBLPROPERTIES (
  'format-version' = '2',
  'write.delete.mode' = 'merge-on-read',
  'write.update.mode' = 'merge-on-read',
  'write.merge.mode' = 'merge-on-read'
)"""


def test_iceberg_planner_mor_goldens():
    """The merge-on-read mapping (LakeTable.merge_batch(merge_mode='mor') ->
    Iceberg v2 row-level MoR properties) and the compaction procedures that
    fold the deltas back, pinned as golden SQL."""
    from oplogtoredis_spark.streaming.iceberg import IcebergSinkPlanner

    p = IcebergSinkPlanner("lake.files")
    out = p.set_merge_mode("mor")
    assert out["sql"] == MOR_DDL_GOLDEN
    rec = [x for x in p.plans if x["op"] == "set_merge_mode"][0]
    assert rec["mode"] == "mor"
    # flipping back emits copy-on-write properties
    assert "'write.merge.mode' = 'copy-on-write'" in p.set_merge_mode("cow")["sql"]
    # compaction folds MoR delete files alongside the data rewrite
    p.compact(drop_tombstones_older_than_ts=0)
    comp = [x for x in p.plans if x["op"] == "compact"][0]
    assert (
        "CALL iceberg.system.rewrite_position_delete_files(table => 'lake.files')"
        in comp["sql"]
    )
