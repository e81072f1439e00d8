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
