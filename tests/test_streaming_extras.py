"""Streaming extras: resume policy (S3), dedup-within-watermark, health (H1),
schema evolution through the streaming path (M5), batch metrics (M1)."""

import os

import pytest

from oplogtoredis_spark.config import EngineConfig
from oplogtoredis_spark.plans.oracle import assert_parity, replay_oracle
from oplogtoredis_spark.sources.generator import generate_events, write_events
from oplogtoredis_spark.sources.schemas import EVENT_SCHEMA_EVOLVED
from oplogtoredis_spark.streaming.runner import (
    health,
    resolve_start_policy,
    run_to_completion,
    start_stream,
)

DENY = ("denied_org/repo0", "denied_org/repo1")
CFG = EngineConfig(denylist=DENY, target_buckets=8)


def _mk_ckpt(path: str, readable: bool = True, age_s: float = 0.0) -> None:
    os.makedirs(os.path.join(path, "offsets"), exist_ok=True)
    off = os.path.join(path, "offsets", "0")
    open(off, "w").write("{}")
    if age_s:
        import time

        old = time.time() - age_s
        os.utime(off, (old, old))
    if readable:
        open(os.path.join(path, "metadata"), "w").write("{}")


# Full decision matrix of lib/oplog/tail_test.go:45-205 — checkpoint state
# (fresh / recent / stale / unreadable) × start_mode (replay=engine default,
# latest=reference default MaxCatchUp) × escape hatch. Expected outcome:
#   replay_all       — no source restriction
#   resume           — no options, existing checkpoint drives the offsets
#   skip_to_recent   — modifiedAfter cutoff (+ checkpoint archived if present)
#   raise            — never silently skip (tail.go:552-576)
_MATRIX = [
    ("fresh", "replay", False, "replay_all"),
    ("fresh", "latest", False, "skip_to_recent"),
    ("recent", "replay", False, "resume"),
    ("recent", "latest", False, "resume"),
    ("stale", "replay", False, "resume"),  # replay mode never skips
    ("stale", "latest", False, "skip_to_recent"),  # MaxCatchUp exceeded
    ("unreadable", "replay", False, "raise"),
    ("unreadable", "latest", False, "raise"),
    ("unreadable", "replay", True, "skip_to_recent"),  # escape hatch
    ("unreadable", "latest", True, "skip_to_recent"),
]


@pytest.mark.parametrize("ckpt_state,mode,escape,expect", _MATRIX)
def test_resume_policy_matrix(tmp_path, ckpt_state, mode, escape, expect):
    ckpt = str(tmp_path / "ckpt")
    if ckpt_state == "recent":
        _mk_ckpt(ckpt)
    elif ckpt_state == "stale":
        _mk_ckpt(ckpt, age_s=9999)
    elif ckpt_state == "unreadable":
        _mk_ckpt(ckpt, readable=False)
    cfg = EngineConfig(
        start_mode=mode, resume_from_end_on_failure=escape, max_catch_up_seconds=120
    )
    if expect == "raise":
        with pytest.raises(RuntimeError, match="refusing to silently skip"):
            resolve_start_policy(ckpt, "/x", cfg)
        assert os.path.isdir(ckpt)  # untouched
        return
    opts = resolve_start_policy(ckpt, "/x", cfg)
    if expect in ("replay_all", "resume"):
        assert opts == {}
        if ckpt_state in ("recent", "stale"):
            assert os.path.isdir(ckpt)  # resume keeps the checkpoint
    else:  # skip_to_recent
        assert "modifiedAfter" in opts
        if ckpt_state in ("stale", "unreadable"):
            # archived (audit trail), never deleted
            assert not os.path.isdir(ckpt)
            assert any(".skipped-" in d for d in os.listdir(tmp_path))


def test_dedup_within_watermark_converges(spark, tmp_path):
    ev = generate_events(n_events=1500, n_repos=20, seed=33, dup_frac=0.25)
    d = str(tmp_path / "ev")
    write_events(ev, d, n_files=4)
    table = run_to_completion(
        spark, d, str(tmp_path / "tbl"), str(tmp_path / "ckpt"), CFG,
        dedup_within_watermark=True,
    )
    got = table.read(spark).toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    assert_parity(got, replay_oracle(ev, DENY))


def test_health_reports_progress(spark, tmp_path):
    ev = generate_events(n_events=300, n_repos=10, seed=5)
    d = str(tmp_path / "ev")
    write_events(ev, d, n_files=2)
    q = start_stream(spark, d, str(tmp_path / "tbl"), str(tmp_path / "ckpt"), CFG)
    q.awaitTermination()
    h = health(q)
    assert h["exception"] is None
    assert h["active"] is False  # availableNow drained and stopped


def test_streaming_schema_evolution(spark, tmp_path):
    """Phase 1 without `stars`, then restart with the evolved schema —
    old rows null-fill, new rows carry values (M5 streaming path)."""
    tbl, d = str(tmp_path / "tbl"), str(tmp_path / "ev")
    ev1 = generate_events(n_events=400, n_repos=10, seed=8)
    write_events(ev1, d, n_files=2)
    run_to_completion(spark, d, tbl, str(tmp_path / "ckpt1"), CFG)

    ev2 = generate_events(n_events=400, n_repos=10, seed=9, evolve=True)
    # phase 2 happens strictly later in oplog time (avoids cross-phase
    # (ts, tx_idx) identity collisions between independently-seeded runs)
    ev2["ts"] = ev2["ts"] + (100_000 << 32)
    d2 = str(tmp_path / "ev2")
    write_events(ev2, d2, n_files=2)
    table = run_to_completion(
        spark, d2, tbl, str(tmp_path / "ckpt2"), CFG,
        schema=EVENT_SCHEMA_EVOLVED, extra_payload_cols=("stars",),
    )
    got = table.read(spark).toPandas()
    assert "stars" in got.columns
    assert got["stars"].notna().any()  # new rows carry values
    # and the combined state equals the oracle over the concatenation
    import pandas as pd

    both = pd.concat([ev1.assign(stars=None), ev2], ignore_index=True)
    # arrival interleave doesn't matter for LWW parity; re-seq
    both["seq"] = range(len(both))
    oracle = replay_oracle(both, DENY)
    got_sorted = got.sort_values(["repo", "path"]).reset_index(drop=True)
    assert_parity(got_sorted, oracle)


def test_lineage_has_input_metrics(spark, tmp_path):
    ev = generate_events(n_events=500, n_repos=10, seed=13)
    d = str(tmp_path / "ev")
    write_events(ev, d, n_files=2)
    table = run_to_completion(spark, d, str(tmp_path / "tbl"), str(tmp_path / "ckpt"), CFG)
    rec = [x for x in table.lineage() if x.get("events_in")]
    assert rec, "no input metrics recorded"
    assert rec[0]["events_in"] > 0
    assert "lag_secs" in rec[0]
    # per-partition lineage: per-bucket row counts for every rewritten bucket
    assert rec[0]["bucket_rows"], "no per-bucket lineage"
    assert sum(rec[0]["bucket_rows"].values()) == rec[0]["rows_out"]

def test_jsonl_source_parity(spark, tmp_path):
    """The SAME log consumed as newline-JSON segments converges to the same
    final state as the parquet source — the pipeline is format-agnostic."""
    from oplogtoredis_spark.sources.generator import write_events_jsonl

    ev = generate_events(n_events=800, n_repos=12, seed=44)
    d = str(tmp_path / "jsonl")
    write_events_jsonl(ev, d, n_files=3)
    table = run_to_completion(
        spark, d, str(tmp_path / "tbl"), str(tmp_path / "ckpt"), CFG,
        source_format="jsonl",
    )
    got = table.read(spark).toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    assert_parity(got, replay_oracle(ev, DENY))
