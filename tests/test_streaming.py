"""Streaming end-to-end + fault injection.

Mirrors the reference's fault-injection suite (SURVEY.md §5.3):
  baseline_test.go  → full drain converges to oracle state
  restart_test.go   → kill mid-stream, restart from checkpoint, parity +
                      replayed epoch applies once
  resume/HA         → lost checkpoint ⇒ full replay is idempotent (no dup
                      applies); lineage records the dedup
"""

import os

import pytest

from oplogtoredis_spark.config import EngineConfig
from oplogtoredis_spark.plans.oracle import assert_parity, replay_oracle
from oplogtoredis_spark.sources.generator import generate_events, write_events
from oplogtoredis_spark.streaming.runner import run_to_completion, start_stream

DENY = ("denied_org/repo0", "denied_org/repo1")
CFG = EngineConfig(denylist=DENY, target_buckets=8)


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("ev")
    ev = generate_events(n_events=3000, n_repos=40, paths_per_repo=6, seed=11)
    write_events(ev, str(d), n_files=6)
    return str(d), ev


def _table_state(spark, table):
    df = table.read(spark).toPandas()
    return df.sort_values(["repo", "path"]).reset_index(drop=True)


def test_stream_drain_matches_oracle(spark, events_dir, tmp_path):
    d, ev = events_dir
    table = run_to_completion(
        spark, d, str(tmp_path / "tbl"), str(tmp_path / "ckpt"), CFG,
        max_files_per_trigger=2,
    )
    oracle = replay_oracle(ev, DENY)
    got = _table_state(spark, table)
    assert len(got) == len(oracle) > 0
    assert_parity(got, oracle)
    # one commit per epoch: 6 files / 2 per trigger = 3 batches
    assert len(table.applied_batch_ids()) == 3


def test_restart_mid_stream_resumes_and_converges(spark, events_dir, tmp_path):
    """Kill after 1 committed batch; restart must resume from the checkpoint
    and reach the same final state (restart_test.go:50-64 analogue)."""
    d, ev = events_dir
    tbl, ckpt = str(tmp_path / "tbl"), str(tmp_path / "ckpt")
    q = start_stream(
        spark, d, tbl, ckpt, CFG, max_files_per_trigger=1, fail_before_batch=2
    )
    with pytest.raises(Exception):
        q.awaitTermination()
    from oplogtoredis_spark.streaming.lake import LakeTable

    applied_before = LakeTable(tbl).applied_batch_ids()
    assert len(applied_before) >= 1  # made progress, then died

    table = run_to_completion(spark, d, tbl, ckpt, CFG, max_files_per_trigger=1)
    assert_parity(_table_state(spark, table), replay_oracle(ev, DENY))
    # every epoch applied exactly once (ids are contiguous, no gaps/dups)
    ids = sorted(int(k.rsplit(":", 1)[1]) for k in table.applied_batch_ids())
    assert ids == list(range(len(ids)))


def test_lost_checkpoint_full_replay_is_idempotent(spark, events_dir, tmp_path):
    """Blow away the checkpoint after a full drain and re-run from scratch:
    the whole log replays (at-least-once read), but LWW + identity dedup make
    the effects exactly-once — final state unchanged, zero dangling applies
    (HA_test.go / resume_test.go analogue; policy tail.go:552-576: never
    silently skip — replay instead)."""
    d, ev = events_dir
    tbl = str(tmp_path / "tbl")
    table = run_to_completion(spark, d, tbl, str(tmp_path / "ckpt1"), CFG)
    state1 = _table_state(spark, table)
    v1 = table.current_version()

    # new checkpoint dir ⇒ Spark assigns fresh batch ids from 0; every event
    # re-applies through the MERGE — dedup_hits must absorb them all
    table2 = run_to_completion(spark, d, tbl, str(tmp_path / "ckpt2"), CFG)
    state2 = _table_state(spark, table2)
    assert state1.equals(state2)
    assert table2.current_version() > v1  # replay flowed through the MERGE
    # the second run's events were all absorbed: nothing newly applied beyond
    # re-confirming winners; dedup_hits recorded the absorbed duplicates
    second_run = [x for x in table2.lineage() if x["epoch_key"].startswith(str(tmp_path / "ckpt2"))]
    assert sum(x.get("dedup_hits", 0) for x in second_run) > 0


def test_two_concurrent_streams_one_table_ha(spark, events_dir, tmp_path):
    """Stream-level HA double-run (integration-tests/fault-injection/
    HA_test.go:12-41): TWO streaming runners over the same log into ONE
    table, separate checkpoints, running concurrently. The optimistic
    snapshot claim serializes every epoch commit (losers re-read and
    re-apply), so the final state equals the single-threaded oracle, no
    event identity ever applies twice (total applies across both streams
    never exceed the single-stream apply count), and the overlap is
    visible as dedup hits in lineage."""
    from oplogtoredis_spark.streaming.lake import LakeTable

    d, ev = events_dir
    # reference run: the same log through ONE stream (same epoch boundaries)
    ref = run_to_completion(
        spark, d, str(tmp_path / "ref_tbl"), str(tmp_path / "ref_ck"), CFG,
        max_files_per_trigger=1,
    )
    applied_single = sum(r.get("applied", 0) for r in ref.lineage())

    # HA double-run: both writers race on one table under the DEFAULT
    # retry budget + jittered backoff (no tuning)
    tbl = str(tmp_path / "tbl")
    ck_a, ck_b = str(tmp_path / "ck_a"), str(tmp_path / "ck_b")
    qa = start_stream(spark, d, tbl, ck_a, CFG, max_files_per_trigger=1)
    qb = start_stream(spark, d, tbl, ck_b, CFG, max_files_per_trigger=1)
    qa.awaitTermination()
    qb.awaitTermination()

    table = LakeTable(tbl)
    got = _table_state(spark, table)
    assert_parity(got, replay_oracle(ev, DENY))

    # every epoch of BOTH lineages committed exactly once, ids contiguous
    for ck in (ck_a, ck_b):
        ns = os.path.abspath(ck)
        ids = sorted(
            int(k.rsplit(":", 1)[1])
            for k in table.applied_batch_ids()
            if k.startswith(ns)
        )
        assert ids == list(range(len(ids))), f"{ck}: {ids}"

    lin = [r for r in table.lineage() if "applied" in r]
    total_applied = sum(r["applied"] for r in lin)
    total_dedup = sum(r.get("dedup_hits", 0) for r in lin)
    # zero duplicate applies: the double-read can only apply FEWER times
    # than the serial run (a winner landed by one stream reads as a dedup
    # hit in the other), never more
    assert len(got) <= total_applied <= applied_single
    assert total_dedup > 0  # the overlap was absorbed, and visibly so


def test_lineage_metrics_recorded(spark, events_dir, tmp_path):
    d, ev = events_dir
    table = run_to_completion(
        spark, d, str(tmp_path / "tbl"), str(tmp_path / "ckpt"), CFG,
        max_files_per_trigger=3,
    )
    lin = table.lineage()
    assert len(lin) == 2  # 6 files / 3
    for rec in lin:
        assert {"batch_id", "applied", "dedup_hits", "deletes", "rows_out", "wall_secs"} <= set(rec)
    assert sum(r["applied"] for r in lin) >= len(_table_state(spark, table))
