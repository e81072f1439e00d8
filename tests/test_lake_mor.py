"""Merge-on-read LakeTable mode (VERDICT r3 #4): per-epoch deltas with ~1x
write amplification, read-time LWW resolution, state parity with CoW,
tombstone fencing, replay/concurrency under the shared commit protocol,
streaming restart, compaction folding, and snapshot expiry of folded deltas.

Reference analogue being replaced: the same at-least-once->exactly-once
publish discipline as CoW (lib/redispub/publisher.go:41-62); MoR is the
write-optimized posture SCALE.md §1/§5 names for high-dispersion batches.
"""

import os

import pytest
from pyspark.sql import functions as F

from oplogtoredis_spark.config import EngineConfig
from oplogtoredis_spark.plans.oracle import assert_parity, replay_oracle
from oplogtoredis_spark.sources.generator import generate_events, write_events
from oplogtoredis_spark.sources.schemas import TARGET_SCHEMA
from oplogtoredis_spark.streaming.lake import LakeTable
from oplogtoredis_spark.streaming.runner import run_to_completion, start_stream

DENY = ("denied_org/repo0", "denied_org/repo1")
CFG = EngineConfig(denylist=DENY, target_buckets=8)


def _batch(spark, rows):
    cols = (
        "repo string, path string, ts long, tx_idx int, op string,"
        " commit string, lang string, content string"
    )
    return spark.createDataFrame(rows, cols)


def _state(spark, t):
    return (
        t.read(spark).toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    )


def test_mor_state_matches_cow_across_epochs(spark, tmp_path):
    """Three event batches applied CoW vs MoR must resolve to the identical
    final state — the read-time LWW collapse is the same merge, deferred."""
    ev = generate_events(n_events=900, n_repos=12, seed=77, dup_frac=0.15)
    sdf = spark.createDataFrame(ev)
    parts = [
        sdf.where((F.col("seq") >= lo) & (F.col("seq") < hi))
        for lo, hi in ((0, 300), (300, 600), (600, 900))
    ]
    states = {}
    tables = {}
    for mode in ("cow", "mor"):
        t = LakeTable.create(str(tmp_path / mode), TARGET_SCHEMA, n_buckets=8)
        for i, p in enumerate(parts):
            t.merge_batch(p, i, epoch_ns=mode, merge_mode=mode)
        states[mode] = _state(spark, t)
        tables[mode] = t
    assert len(states["cow"]) > 0
    assert states["cow"].equals(states["mor"])
    # MoR never rewrote a base bucket: everything lives in deltas
    m = tables["mor"].manifest()
    assert m["buckets"] == {}
    assert len(m["bucket_deltas"]) > 0
    assert all(x["merge_mode"] == "mor" for x in tables["mor"].lineage()
               if "merge_mode" in x)


def test_mor_lww_and_tombstone_semantics(spark, tmp_path):
    """The delta-vs-base and delta-vs-delta LWW rules reproduce the CoW
    predicate: newer wins, a tombstone fences older zombies, a genuinely
    newer insert revives."""
    t = LakeTable.create(str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=4)
    t.merge_batch(_batch(spark, [("r/a", "f.py", 5 << 32, 0, "i", "c0", "py", "v5")]),
                  0, epoch_ns="m", merge_mode="mor")
    # older event in a later delta must NOT win
    t.merge_batch(_batch(spark, [("r/a", "f.py", 3 << 32, 7, "u", "cX", "py", "OLD")]),
                  1, epoch_ns="m", merge_mode="mor")
    assert _state(spark, t).iloc[0]["content"] == "v5"
    # delete fences a later-arriving older zombie
    t.merge_batch(_batch(spark, [("r/a", "f.py", 8 << 32, 0, "d", None, None, None)]),
                  2, epoch_ns="m", merge_mode="mor")
    assert len(_state(spark, t)) == 0
    t.merge_batch(_batch(spark, [("r/a", "f.py", 6 << 32, 0, "u", "c6", "py", "ZOMBIE")]),
                  3, epoch_ns="m", merge_mode="mor")
    assert len(_state(spark, t)) == 0
    # newer insert revives
    t.merge_batch(_batch(spark, [("r/a", "f.py", 9 << 32, 0, "i", "c9", "py", "alive")]),
                  4, epoch_ns="m", merge_mode="mor")
    got = _state(spark, t)
    assert list(got["content"]) == ["alive"]


def test_mor_exact_tie_base_wins_then_oldest_delta(spark, tmp_path):
    """Exact (ts, tx_idx) ties: a replayed event must read as a no-op — the
    BASE row wins over any delta, and between deltas the OLDEST epoch wins
    (first apply stands; adversarial different-content replays don't flap)."""
    t = LakeTable.create(str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=4)
    # base row via CoW
    t.merge_batch(_batch(spark, [("r/a", "f.py", 5 << 32, 0, "i", "c0", "py", "base")]),
                  0, epoch_ns="m")
    # same-identity delta with different content: base must win the tie
    t.merge_batch(_batch(spark, [("r/a", "f.py", 5 << 32, 0, "i", "cZ", "py", "delta1")]),
                  1, epoch_ns="m", merge_mode="mor")
    assert _state(spark, t).iloc[0]["content"] == "base"
    # fresh key arriving twice as deltas with the same identity: first wins
    t.merge_batch(_batch(spark, [("r/b", "g.py", 7 << 32, 0, "i", "c1", "py", "first")]),
                  2, epoch_ns="m", merge_mode="mor")
    t.merge_batch(_batch(spark, [("r/b", "g.py", 7 << 32, 0, "i", "c2", "py", "second")]),
                  3, epoch_ns="m", merge_mode="mor")
    got = _state(spark, t).set_index("repo")
    assert got.loc["r/b", "content"] == "first"


def test_mor_write_amplification_vs_cow(spark, tmp_path):
    """The point of the mode: a small random-key batch against a populated
    table writes ~batch-sized deltas under MoR but rewrites every touched
    bucket under CoW. Asserted on actual bytes written by the epoch."""
    ev = generate_events(n_events=6000, n_repos=60, seed=99)
    # realistic payload sizes: pad contents to ~4 KB so bucket rewrite cost
    # reflects data volume, not parquet per-file overhead (at toy sizes the
    # fixed footer/schema overhead of the 16 delta files hides the effect)
    sdf = spark.createDataFrame(ev).withColumn(
        "content", F.rpad(F.col("content"), 4000, "x")
    )
    # 40 random keys spread across buckets — the high-dispersion shape
    small = [
        (f"org{i}/repo{i % 60}", "path_0.py", 1 << 40, 0, "u", "cc", "py", "tiny")
        for i in range(40)
    ]
    sizes, states = {}, {}
    for mode in ("cow", "mor"):
        t = LakeTable.create(str(tmp_path / mode), TARGET_SCHEMA, n_buckets=16)
        t.merge_batch(sdf, 0, epoch_ns=mode)  # identical CoW-seeded base
        before = _tree_bytes(t.path)
        t.merge_batch(_batch(spark, small), 1, epoch_ns=mode, merge_mode=mode)
        sizes[mode] = _tree_bytes(t.path) - before
        states[mode] = _state(spark, t)
    assert states["cow"].equals(states["mor"])
    # MoR writes a small multiple of the batch itself; CoW rewrites buckets
    ratio = sizes["cow"] / max(sizes["mor"], 1)
    assert ratio > 5, f"write amplification ratio only {ratio:.1f}x ({sizes})"


def _tree_bytes(root: str) -> int:
    total = 0
    for dirpath, _dirnames, filenames in os.walk(root):
        for f in filenames:
            try:
                total += os.path.getsize(os.path.join(dirpath, f))
            except OSError:
                pass
    return total


def test_mor_replay_skip_and_concurrent_writers(spark, tmp_path):
    """The commit protocol is shared with CoW: epoch replays skip, and two
    racing MoR writers serialize through the snapshot claim — final state is
    the serial application of both deltas."""
    path = str(tmp_path / "t")
    t_a = LakeTable.create(path, TARGET_SCHEMA, n_buckets=4)
    t_b = LakeTable(path)
    t_a.merge_batch(_batch(spark, [("r/a", "f.py", 1 << 32, 0, "i", "c0", "py", "v1")]),
                    0, epoch_ns="A", merge_mode="mor")
    # replay of the same epoch is a no-op
    s = t_a.merge_batch(_batch(spark, [("r/a", "f.py", 9 << 32, 0, "u", "c9", "py", "NO")]),
                        0, epoch_ns="A", merge_mode="mor")
    assert s.get("skipped_replay") is True
    assert _state(spark, t_a).iloc[0]["content"] == "v1"

    # race: B commits a full MoR epoch while A is claiming its snapshot
    orig = t_a._write_manifest
    fired = {"done": False}

    def hijack(manifest):
        if not fired["done"]:
            fired["done"] = True
            t_b.merge_batch(
                _batch(spark, [("r/a", "f.py", 3 << 32, 0, "u", "cb", "py", "B@3")]),
                0, epoch_ns="B", merge_mode="mor",
            )
        return orig(manifest)

    t_a._write_manifest = hijack
    t_a.merge_batch(
        _batch(spark, [("r/a", "f.py", 5 << 32, 0, "u", "ca", "py", "A@5")]),
        1, epoch_ns="A", merge_mode="mor",
    )
    got = _state(spark, t_a)
    assert len(got) == 1 and got.iloc[0]["content"] == "A@5"  # newest ts wins
    assert t_a.epoch_applied("A", 1) and t_a.epoch_applied("B", 0)


def test_mor_streaming_parity_and_restart(spark, tmp_path):
    """The full streaming path in MoR mode: kill mid-stream, resume from the
    checkpoint, drain — final state equals the single-threaded oracle and
    every epoch landed exactly once, all as deltas."""
    ev = generate_events(n_events=1200, n_repos=15, seed=21, dup_frac=0.1)
    d = str(tmp_path / "ev")
    write_events(ev, d, n_files=4)
    tbl, ckpt = str(tmp_path / "tbl"), str(tmp_path / "ckpt")
    q = start_stream(spark, d, tbl, ckpt, CFG, max_files_per_trigger=1,
                     fail_before_batch=2, merge_mode="mor")
    with pytest.raises(Exception):
        q.awaitTermination()
    assert len(LakeTable(tbl).applied_batch_ids()) >= 1
    table = run_to_completion(spark, d, tbl, ckpt, CFG, max_files_per_trigger=1,
                              merge_mode="mor")
    assert_parity(_state(spark, table), replay_oracle(ev, DENY))
    ids = sorted(int(k.rsplit(":", 1)[1]) for k in table.applied_batch_ids())
    assert ids == list(range(len(ids)))
    assert table.manifest()["buckets"] == {}  # never compacted: all deltas


def test_cow_epoch_folds_that_buckets_deltas(spark, tmp_path):
    """Mixed-mode interop: a CoW epoch's target read resolves the bucket's
    live deltas, so the rewrite IS an incremental compaction — the bucket's
    delta entries drop from the manifest and state is unchanged."""
    t = LakeTable.create(str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=2)
    ev = generate_events(n_events=300, n_repos=6, seed=13)
    t.merge_batch(spark.createDataFrame(ev), 0, epoch_ns="m", merge_mode="mor")
    assert len(t.manifest()["bucket_deltas"]) > 0
    before = _state(spark, t)
    # CoW epoch with one update per repo — 6 keys over 2 buckets covers both
    ups = [
        (f"org{i}/repo{i}", "path_0.py", 1 << 42, 0, "u", "c", "py", "newest")
        for i in range(6)
    ]
    stats = t.merge_batch(_batch(spark, ups), 1, epoch_ns="m")
    assert stats["affected_buckets"] == 2
    m = t.manifest()
    assert m["bucket_deltas"] == {}  # folded by the CoW rewrites
    after = _state(spark, t)
    # refreshed contents for the updated keys, nothing lost or resurrected
    assert (after["content"] == "newest").sum() >= 6
    assert set(after["repo"]) >= set(before["repo"])


def test_mor_schema_evolution_added_column(spark, tmp_path):
    """A MoR delta carrying a new column evolves the table schema; old base
    and old deltas read back with nulls for it (mergeSchema fallback)."""
    import pandas as pd

    t = LakeTable.create(str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=4)
    t.merge_batch(_batch(spark, [("r/a", "f.py", 1 << 32, 0, "i", "c0", "py", "v1")]),
                  0, epoch_ns="m", merge_mode="mor")
    b2 = spark.createDataFrame(
        [("r/b", "g.py", 2 << 32, 0, "i", "c1", "py", "v2", 777)],
        "repo string, path string, ts long, tx_idx int, op string,"
        " commit string, lang string, content string, stars long",
    )
    stats = t.merge_batch(b2, 1, epoch_ns="m", merge_mode="mor",
                          extra_payload_cols=("stars",))
    assert stats["schema_evolved"] is True
    got = _state(spark, t).set_index("repo")
    assert pd.isna(got.loc["r/a", "stars"]) and got.loc["r/b", "stars"] == 777


def test_mor_compact_folds_deltas_and_expire_reclaims(spark, tmp_path):
    """compact() materializes the resolved state as the new base and clears
    bucket_deltas (reads take the fast path again); expire_snapshots then
    reclaims the folded delta dirs from disk."""
    t = LakeTable.create(str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=4)
    ev = generate_events(n_events=400, n_repos=8, seed=5)
    sdf = spark.createDataFrame(ev)
    t.merge_batch(sdf.where(F.col("seq") < 200), 0, epoch_ns="m", merge_mode="mor")
    t.merge_batch(sdf.where(F.col("seq") >= 200), 1, epoch_ns="m", merge_mode="mor")
    before = _state(spark, t)
    assert len(t.manifest()["bucket_deltas"]) > 0
    delta_dirs = [
        os.path.join(t.path, e["dir"])
        for entries in t.manifest()["bucket_deltas"].values()
        for e in entries
    ]
    assert all(os.path.isdir(p) for p in delta_dirs)

    t.compact(spark, drop_tombstones_older_than_ts=0)
    m = t.manifest()
    assert m["bucket_deltas"] == {} and len(m["buckets"]) > 0
    after = _state(spark, t)
    assert before.equals(after)
    # further merges work on the folded base
    t.merge_batch(
        _batch(spark, [("org0/repo0", "zzz_new.py", 1 << 42, 0, "i", "c", "py", "x")]),
        2, epoch_ns="m", merge_mode="mor",
    )
    assert len(_state(spark, t)) == len(after) + 1

    removed = t.expire_snapshots(keep_last=1)
    assert removed > 0
    assert not any(os.path.isdir(p) for p in delta_dirs)  # folded deltas gone
    # the live delta (epoch 2, referenced by the current manifest) survives
    assert len(_state(spark, t)) == len(after) + 1


def test_mor_delta_seq_is_path_anchored(spark, tmp_path):
    """ADVICE r4: a TABLE PATH that itself contains a 'delta/vNNNNNNNN-'
    substring must not alias every delta to the same seq — the oldest-delta-
    wins exact-tie rule depends on per-epoch seqs. The extraction is now
    anchored to the table-relative suffix (delta-dir/pb=N/file at path END)."""
    poisoned = tmp_path / "delta" / "v00000099-deadbeef" / "t"
    t = LakeTable.create(str(poisoned), TARGET_SCHEMA, n_buckets=4)
    # same identity twice as deltas: FIRST (oldest epoch) must win the tie;
    # with the unanchored regexp both deltas extract seq=99 and the tie is
    # broken arbitrarily
    t.merge_batch(_batch(spark, [("r/b", "g.py", 7 << 32, 0, "i", "c1", "py", "first")]),
                  0, epoch_ns="m", merge_mode="mor")
    t.merge_batch(_batch(spark, [("r/b", "g.py", 7 << 32, 0, "i", "c2", "py", "second")]),
                  1, epoch_ns="m", merge_mode="mor")
    got = _state(spark, t)
    assert list(got["content"]) == ["first"]
    # and newest-wins still resolves across the poisoned path
    t.merge_batch(_batch(spark, [("r/b", "g.py", 9 << 32, 0, "u", "c3", "py", "newer")]),
                  2, epoch_ns="m", merge_mode="mor")
    assert list(_state(spark, t)["content"]) == ["newer"]


def test_bucket_scoped_compaction_folds_only_selected(spark, tmp_path):
    """compact_buckets rewrites ONLY the given buckets: their deltas fold
    into fresh bases, other buckets keep files, schema ids, and delta
    entries verbatim — the 100 TB compaction unit (rewrite_data_files with
    a partition filter)."""
    t = LakeTable.create(str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=4)
    ev = generate_events(n_events=600, n_repos=10, seed=3)
    sdf = spark.createDataFrame(ev)
    t.merge_batch(sdf.where(F.col("seq") < 300), 0, epoch_ns="m", merge_mode="mor")
    t.merge_batch(sdf.where(F.col("seq") >= 300), 1, epoch_ns="m", merge_mode="mor")
    before = _state(spark, t)
    m0 = t.manifest()
    touched = sorted(int(b) for b in m0["bucket_deltas"])
    assert len(touched) >= 2
    sel, untouched = touched[:1], touched[1:]
    st = t.compact_buckets(spark, sel)
    assert st["compacted"] and st["buckets"] == sel
    m1 = t.manifest()
    # selected: folded (base present, deltas gone); others: verbatim
    assert str(sel[0]) in m1["buckets"] and str(sel[0]) not in m1["bucket_deltas"]
    for b in untouched:
        assert m1["bucket_deltas"][str(b)] == m0["bucket_deltas"][str(b)]
        assert m1["buckets"].get(str(b)) == m0["buckets"].get(str(b))
    assert _state(spark, t).equals(before)


def test_streaming_auto_compaction_bounds_delta_count(spark, tmp_path):
    """VERDICT r4 #6: a long MoR stream with compact_min_deltas keeps every
    bucket's delta count under the threshold for the stream's LIFETIME (not
    just at the end), state stays correct, and compaction events land in
    lineage."""
    ev = generate_events(n_events=1600, n_repos=16, seed=33, dup_frac=0.1)
    d = str(tmp_path / "ev")
    write_events(ev, d, n_files=8)  # 8 micro-batches at maxFilesPerTrigger=1
    tbl, ckpt = str(tmp_path / "tbl"), str(tmp_path / "ckpt")
    table = run_to_completion(
        spark, d, tbl, ckpt, CFG, max_files_per_trigger=1,
        merge_mode="mor", compact_min_deltas=3,
    )
    assert_parity(_state(spark, table), replay_oracle(ev, DENY))
    # lifetime bound: replay the manifest history — no snapshot ever holds
    # a bucket at >= threshold + 1 deltas (the merge that crosses the
    # threshold is immediately followed by the fold)
    worst = 0
    for h in table.history():
        mv = table.manifest(h["version"])
        for ds in mv.get("bucket_deltas", {}).values():
            worst = max(worst, len(ds))
    assert worst <= 3, f"a bucket reached {worst} live deltas"
    # compaction actually fired (8 epochs over dense buckets must cross 3)
    compacts = [x for x in table.lineage() if x.get("compacted")]
    assert compacts, "threshold compaction never fired"
    # and the final read is delta-light: every bucket under threshold
    assert all(len(ds) < 3 for ds in table.manifest()["bucket_deltas"].values())
