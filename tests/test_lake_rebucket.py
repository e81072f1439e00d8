"""Bucket-count EVOLUTION (LakeTable.rebucket / maybe_rebucket): the day-1
bucket count never survives 100 TB. A rebucket rewrites every live row under
the new modulus and flips ``n_buckets`` in the SAME atomic manifest commit —
no mixed-modulus state is ever observable — while old snapshots keep their
own count and layout (time travel reads them unchanged). Merges, replay
protection, MoR deltas, pruning, and fsck must all hold across the flip."""

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
            ("docs", str(i), ts << 32, int(i), op, f"c{ts}", "en", f"body {i} t{ts}")
            for i in ids
        ],
        cols,
    )


def _state(t, spark, **kw):
    return sorted(
        (r.path, r.last_ts, r.content) for r in t.read(spark, **kw).collect()
    )


def _fsck_clean(t, spark):
    bad = {r.check: r.n_violations for r in t.fsck(spark, deep=True).collect()}
    assert all(v == 0 for v in bad.values()), bad


def test_grow_preserves_state_and_later_merges_route_correctly(spark, tmp_path):
    t = LakeTable.create(str(tmp_path / "tbl"), TARGET_SCHEMA, n_buckets=4)
    t.merge_batch(_batch(spark, range(64), ts=1), 0)
    before = _state(t, spark)
    st = t.rebucket(spark, 16)
    assert st["rebucketed"] and st["n_buckets"] == 16
    assert t.manifest()["n_buckets"] == 16
    assert _state(t, spark) == before
    # post-flip merges hash under the new modulus: upserts must REPLACE
    # their old rows (a mixed-modulus bug would duplicate them), deletes
    # must land
    t.merge_batch(
        _batch(spark, range(0, 64, 2), ts=5).unionByName(
            _batch(spark, [1, 3], ts=5, op="d")
        ),
        1,
    )
    got = _state(t, spark)
    want = sorted(
        [(str(i), 5 << 32, f"body {i} t5") for i in range(0, 64, 2)]
        + [(str(i), 1 << 32, f"body {i} t1") for i in range(5, 64, 2)]
    )
    assert got == want
    _fsck_clean(t, spark)


def test_shrink_also_works(spark, tmp_path):
    t = LakeTable.create(str(tmp_path / "tbl"), TARGET_SCHEMA, n_buckets=16)
    t.merge_batch(_batch(spark, range(48), ts=1), 0)
    before = _state(t, spark)
    t.rebucket(spark, 4)
    assert t.manifest()["n_buckets"] == 4
    assert _state(t, spark) == before
    t.merge_batch(_batch(spark, [7], ts=9), 1)
    assert (str(7), 9 << 32, "body 7 t9") in _state(t, spark)
    _fsck_clean(t, spark)


def test_time_travel_reads_the_old_layout(spark, tmp_path):
    t = LakeTable.create(str(tmp_path / "tbl"), TARGET_SCHEMA, n_buckets=4)
    t.merge_batch(_batch(spark, range(32), ts=1), 0)
    v_pre = t.current_version()
    pre = _state(t, spark)
    t.create_tag("before-rebucket", v_pre)
    t.rebucket(spark, 8)
    t.merge_batch(_batch(spark, [0], ts=9), 1)
    assert _state(t, spark, version=v_pre) == pre
    assert _state(t, spark, tag="before-rebucket") == pre
    assert t.manifest(v_pre)["n_buckets"] == 4
    assert t.manifest()["n_buckets"] == 8


def test_mor_deltas_fold_and_stream_continues(spark, tmp_path):
    t = LakeTable.create(str(tmp_path / "tbl"), TARGET_SCHEMA, n_buckets=2)
    t.merge_batch(_batch(spark, range(16), ts=1), 0, merge_mode="mor")
    t.merge_batch(_batch(spark, range(0, 16, 4), ts=3), 1, merge_mode="mor")
    assert any(t.manifest().get("bucket_deltas", {}).values())
    before = _state(t, spark)
    t.rebucket(spark, 8)
    assert t.manifest()["bucket_deltas"] == {}
    assert _state(t, spark) == before
    # stale redelivery AFTER the flip is still absorbed by read-time LWW
    t.merge_batch(_batch(spark, [0], ts=2), 2, merge_mode="mor")
    assert (str(0), 3 << 32, "body 0 t3") in _state(t, spark)
    _fsck_clean(t, spark)


def test_replay_protection_survives_rebucket(spark, tmp_path):
    t = LakeTable.create(str(tmp_path / "tbl"), TARGET_SCHEMA, n_buckets=4)
    t.merge_batch(_batch(spark, range(8), ts=1), 0)
    t.merge_batch(_batch(spark, [2], ts=5), 1)
    t.rebucket(spark, 8)
    before = _state(t, spark)
    v = t.current_version()
    # a redelivered epoch (same batch id, OLDER payload) must be recognized
    st = t.merge_batch(_batch(spark, [2], ts=1), 1)
    assert st.get("skipped_replay")
    assert t.current_version() == v
    assert _state(t, spark) == before


def test_stats_and_blooms_cleared_pruning_stays_sound(spark, tmp_path):
    t = LakeTable.create(str(tmp_path / "tbl"), TARGET_SCHEMA, n_buckets=2)
    t.merge_batch(_batch(spark, range(64), ts=1), 0)
    t.rewrite_clustered(spark, ["path"], files_per_bucket=4, bloom_cols=["path"])
    assert t.manifest()["file_stats"] and t._load_blooms(t.manifest())
    t.rebucket(spark, 8)
    m = t.manifest()
    assert m["file_stats"] == {} and t._load_blooms(m) == {}
    assert m["file_blooms_ref"] == ""
    # stale entries are GONE (a stale bloom could falsely skip); planning
    # falls back to the new files' own footers — still sound — and the
    # pruned read stays exact
    got = sorted(r.path for r in t.read_pruned(spark, "path", eq="7").collect())
    assert got == ["7"]


def test_noop_and_validation(spark, tmp_path):
    t = LakeTable.create(str(tmp_path / "tbl"), TARGET_SCHEMA, n_buckets=4)
    t.merge_batch(_batch(spark, range(4), ts=1), 0)
    v = t.current_version()
    st = t.rebucket(spark, 4)
    assert not st["rebucketed"] and t.current_version() == v
    with pytest.raises(ValueError, match="n_buckets"):
        t.rebucket(spark, 0)
    with pytest.raises(ValueError, match="target_bucket_bytes"):
        t.maybe_rebucket(spark, 0)


def test_maybe_rebucket_growth_policy(spark, tmp_path):
    t = LakeTable.create(str(tmp_path / "tbl"), TARGET_SCHEMA, n_buckets=2)
    t.merge_batch(_batch(spark, range(256), ts=1), 0)
    # huge target: nothing fires, no Spark job, version unchanged
    v = t.current_version()
    st = t.maybe_rebucket(spark, target_bucket_bytes=1 << 40)
    assert not st["rebucketed"] and st["live_bytes"] > 0
    assert t.current_version() == v
    # tiny target: grows to the power-of-two that brings the mean under
    # (clamped), preserving state
    before = _state(t, spark)
    st = t.maybe_rebucket(spark, target_bucket_bytes=1024, max_n_buckets=16)
    assert st["rebucketed"] and st["n_buckets"] == 16
    assert t.manifest()["n_buckets"] == 16
    assert _state(t, spark) == before
    # already at the clamp: never fires again
    st = t.maybe_rebucket(spark, target_bucket_bytes=1, max_n_buckets=16)
    assert not st["rebucketed"]


def test_streaming_auto_rebucket_grows_mid_stream(spark, tmp_path):
    """rebucket_target_bytes wires bucket evolution into the runner: a
    stream born at 2 buckets grows mid-stream (power-of-two steps), later
    epochs merge under the new modulus, and the drained state still equals
    the replay oracle (a mixed-modulus bug would duplicate keys)."""
    from oplogtoredis_spark.config import EngineConfig
    from oplogtoredis_spark.plans.oracle import assert_parity, replay_oracle
    from oplogtoredis_spark.sources.generator import (
        generate_events,
        write_events,
    )
    from oplogtoredis_spark.streaming.runner import run_to_completion

    deny = ("denied_org/repo0",)
    ev = generate_events(n_events=1600, n_repos=16, seed=44, dup_frac=0.1)
    d = str(tmp_path / "ev")
    write_events(ev, d, n_files=6)
    table = run_to_completion(
        spark,
        d,
        str(tmp_path / "tbl"),
        str(tmp_path / "ckpt"),
        EngineConfig(denylist=deny, target_buckets=2),
        max_files_per_trigger=1,
        rebucket_target_bytes=4096,
        rebucket_max_n_buckets=8,
    )
    assert table.manifest()["n_buckets"] == 8
    rb = [x for x in table.lineage() if x.get("rebucketed")]
    assert rb, "threshold rebucket never fired"
    got = table.read(spark).toPandas()
    got = got.sort_values(["repo", "path"]).reset_index(drop=True)
    assert_parity(got, replay_oracle(ev, deny))
    _fsck_clean(table, spark)


def test_expire_reclaims_the_old_layout(spark, tmp_path):
    import os

    t = LakeTable.create(str(tmp_path / "tbl"), TARGET_SCHEMA, n_buckets=2)
    t.merge_batch(_batch(spark, range(32), ts=1), 0)
    v_pre = t.current_version()
    t.rebucket(spark, 4)
    t.merge_batch(_batch(spark, [0], ts=2), 1)
    t.merge_batch(_batch(spark, [1], ts=3), 2)
    removed = t.expire_snapshots(keep_last=2)
    assert removed > 0
    with pytest.raises(Exception):
        t.read(spark, version=v_pre)
    # current state unaffected
    assert len(_state(t, spark)) == 32
