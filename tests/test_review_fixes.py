"""Regressions from the round-5 adversarial review of the streaming core
(lake.py / runner.py): checkpoint-lineage epoch namespaces, type-widening
reads, sink-factory kwargs, deadletter identity, expire accounting."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from oplogtoredis_spark.config import EngineConfig
from oplogtoredis_spark.functions.routing import bucket_for
from oplogtoredis_spark.sources.schemas import TARGET_SCHEMA
from oplogtoredis_spark.streaming.lake import LakeTable
from oplogtoredis_spark.streaming.runner import _lineage_token

ENV_COLS = (
    "repo string, path string, ts long, tx_idx int, op string, "
    "commit string, lang string, content string"
)


def _env(spark, rows, extra=""):
    return spark.createDataFrame(rows, ENV_COLS + extra)


# ---------------------------------------------------------------------------
# finding 1: epoch namespace must change with the checkpoint LINEAGE
# ---------------------------------------------------------------------------
def test_lineage_token_survives_lineage_and_changes_after_archive(tmp_path):
    ckpt = str(tmp_path / "ck")
    t1 = _lineage_token(ckpt)
    assert t1 == _lineage_token(ckpt)  # stable within one lineage
    import shutil

    shutil.move(ckpt, str(tmp_path / "ck.skipped-0"))  # the archive paths
    t2 = _lineage_token(ckpt)  # fresh lineage at the SAME path
    assert t2 != t1


def test_fresh_lineage_batches_apply_despite_old_watermark(spark, tmp_path):
    """The data-loss scenario: old lineage advanced the applied watermark
    to a high batch id; a fresh lineage at the same checkpoint path
    restarts ids at 0 — its batches must APPLY, not be watermark-skipped."""
    from oplogtoredis_spark.streaming.runner import make_batch_applier

    tbl = str(tmp_path / "tbl")
    LakeTable.create(tbl, TARGET_SCHEMA, n_buckets=4)
    ckpt = str(tmp_path / "ck")
    ns_old = f"{os.path.abspath(ckpt)}#{_lineage_token(ckpt)}"
    lake = LakeTable(tbl)
    # old lineage applied epochs 0..499 (watermark via a high batch id)
    lake.merge_batch(
        _env(spark, [("r/a", "f", 10, 0, "i", "c1", "py", "v1")]),
        499,
        epoch_ns=ns_old,
    )
    # archive + fresh lineage at the same path
    import shutil

    shutil.move(ckpt, str(tmp_path / "ck.skipped-1"))
    applier = make_batch_applier(
        tbl, (), None, f"{os.path.abspath(ckpt)}#{_lineage_token(ckpt)}"
    )
    applier(_env(spark, [("r/b", "g", 20, 0, "i", "c2", "go", "w1")]), 0)
    keys = {r.repo for r in lake.read(spark).collect()}
    assert "r/b" in keys, "fresh-lineage batch 0 was watermark-skipped"


# ---------------------------------------------------------------------------
# finding 2: type-widening evolution must stay readable across mixed buckets
# ---------------------------------------------------------------------------
def _two_keys_in_different_buckets(spark, n_buckets=4):
    cands = [(f"r{i}", f"p{i}") for i in range(32)]
    rows = spark.createDataFrame(cands, "repo string, path string").select(
        "repo", "path", bucket_for(F.col("repo"), F.col("path"), n_buckets).alias("b")
    ).collect()
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r.b, (r.repo, r.path))
        if len(by_bucket) >= 2:
            break
    (k1, k2) = list(by_bucket.values())[:2]
    return k1, k2


@pytest.mark.parametrize("merge_mode", ["cow", "mor"])
def test_widened_column_readable_across_mixed_sid_buckets(
    spark, tmp_path, merge_mode
):
    k1, k2 = _two_keys_in_different_buckets(spark)
    t = LakeTable.create(
        str(tmp_path / f"tw_{merge_mode}"), TARGET_SCHEMA, n_buckets=4
    )
    t.merge_batch(
        _env(spark, [(k1[0], k1[1], 10, 0, "i", "c", "py", "x", 7)], ", size int"),
        0,
        extra_payload_cols=("size",),
        merge_mode=merge_mode,
    )
    t.merge_batch(
        _env(
            spark,
            [(k2[0], k2[1], 20, 0, "i", "c", "py", "y", 1 << 40)],
            ", size long",
        ),
        1,
        extra_payload_cols=("size",),
        merge_mode=merge_mode,
    )
    # the wedge: old bucket holds int32 files, new holds int64 — the read
    # (and compact(), which reads first) must conform instead of crashing
    got = {
        (r.repo, r.path): r.size
        for r in t.read(spark).select("repo", "path", "size").collect()
    }
    assert got == {k1: 7, k2: 1 << 40}
    t.compact(spark, drop_tombstones_older_than_ts=0)
    got2 = {
        (r.repo, r.path): r.size
        for r in t.read(spark).select("repo", "path", "size").collect()
    }
    assert got2 == got


# ---------------------------------------------------------------------------
# findings 3/5/6: sink-factory handling
# ---------------------------------------------------------------------------
def test_lake_subclass_keeps_merge_kwargs(spark, tmp_path):
    from oplogtoredis_spark.streaming.runner import make_batch_applier

    calls = {}

    class Instrumented(LakeTable):
        def merge_batch(self, batch, batch_id, **kw):
            calls.update(kw)
            return super().merge_batch(batch, batch_id, **kw)

    tbl = str(tmp_path / "sub")
    LakeTable.create(tbl, TARGET_SCHEMA, n_buckets=4)
    applier = make_batch_applier(
        tbl, (), None, "ns", sink_factory=Instrumented, merge_mode="mor"
    )
    applier(_env(spark, [("r/a", "f", 10, 0, "i", "c", "py", "v")]), 0)
    assert calls.get("merge_mode") == "mor", (
        "subclass sink silently lost the caller's merge_mode"
    )


def test_non_lake_sink_rejects_lake_only_kwargs(tmp_path):
    from oplogtoredis_spark.streaming.runner import make_batch_applier
    from oplogtoredis_spark.streaming.sink import InMemorySink

    with pytest.raises(ValueError, match="merge_mode"):
        make_batch_applier(
            str(tmp_path / "x"), (), None, "ns",
            sink_factory=InMemorySink, merge_mode="mor",
        )


def test_explicit_lake_factory_creates_the_table(spark, tmp_path):
    from oplogtoredis_spark.sources.generator import generate_events, write_events
    from oplogtoredis_spark.streaming.runner import run_to_completion

    ev = str(tmp_path / "ev")
    write_events(generate_events(n_events=200, n_repos=5, seed=3), ev, n_files=2)
    table = run_to_completion(
        spark, ev, str(tmp_path / "tbl"), str(tmp_path / "ck"),
        EngineConfig(target_buckets=4), sink_factory=LakeTable,
    )
    assert table.read(spark).count() > 0


def test_run_to_completion_accepts_explicit_none_factory(spark, tmp_path):
    from oplogtoredis_spark.sources.generator import generate_events, write_events
    from oplogtoredis_spark.streaming.runner import run_to_completion

    ev = str(tmp_path / "ev2")
    write_events(generate_events(n_events=200, n_repos=5, seed=4), ev, n_files=2)
    table = run_to_completion(
        spark, ev, str(tmp_path / "tbl2"), str(tmp_path / "ck2"),
        EngineConfig(target_buckets=4), sink_factory=None,
    )
    assert table.read(spark).count() > 0


# ---------------------------------------------------------------------------
# finding 4: null tx_idx is an identity violation -> quarantined, not merged
# ---------------------------------------------------------------------------
def test_null_tx_idx_is_quarantined_not_merged(spark, tmp_path):
    t = LakeTable.create(str(tmp_path / "dl"), TARGET_SCHEMA, n_buckets=4)
    t.merge_batch(
        _env(
            spark,
            [
                ("r/a", "f", 10, 5, "i", "c1", "py", "good"),
                # ts TIE with higher true position unknowable: null tx_idx
                # must not silently lose the LWW — it must deadletter
                ("r/a", "f", 10, None, "u", "c2", "py", "bad"),
            ],
        ),
        0,
    )
    rows = t.read(spark).collect()
    assert len(rows) == 1 and rows[0].content == "good"
    dl = os.path.join(t.path, "_deadletter")
    assert os.path.isdir(dl)
    dead = spark.read.parquet(dl)
    assert dead.where("dl_reason = 'null_tx_idx'").count() == 1


# ---------------------------------------------------------------------------
# finding 9: expire_snapshots counts real reclaimed dirs only
# ---------------------------------------------------------------------------
def test_expire_snapshots_counts_only_reclaimed_dirs(spark, tmp_path):
    t = LakeTable.create(str(tmp_path / "ex"), TARGET_SCHEMA, n_buckets=2)
    for i in range(3):
        t.merge_batch(
            _env(spark, [("r/a", "f", 10 + i, 0, "u", "c", "py", f"v{i}")]), i
        )
    n1 = t.expire_snapshots(keep_last=1)
    assert n1 > 0
    # second call: nothing left to reclaim — must report 0, not count
    # _SUCCESS marker files as reclaimed dirs forever
    assert t.expire_snapshots(keep_last=1) == 0


# ---------------------------------------------------------------------------
# finding 7: stale orphans are ADOPTED, never replaced
# ---------------------------------------------------------------------------
def test_stale_orphan_adopted_never_replaced(spark, tmp_path):
    """A linked-but-unadvanced manifest is complete-on-link: a repair or a
    successor may already have built on it, so the reclaim path must raise
    CURRENT over it and retry — never overwrite its bytes (which would let
    the reclaimer report success for a merge that is not in the chain and
    corrupt time-travel reads of that version)."""
    import json
    import time

    from oplogtoredis_spark.streaming.lake import ConcurrentCommitError

    t = LakeTable.create(str(tmp_path / "ad"), TARGET_SCHEMA, n_buckets=2)
    t.merge_batch(
        _env(spark, [("r/a", "f", 10, 0, "i", "c", "py", "v1")]), 0, epoch_ns="s"
    )
    v = t.current_version()
    orphan = {
        **t.manifest(),
        "version": v + 1,
        "writer_token": "w-crashed",
        "mark": "ORPHAN",
    }
    opath = os.path.join(t._manifest_dir, f"v{v + 1:08d}.json")
    with open(opath, "w") as f:
        json.dump(orphan, f)
    old = time.time() - 2 * LakeTable.ORPHAN_STALENESS_SECS
    os.utime(opath, (old, old))

    with pytest.raises(ConcurrentCommitError, match="adopted"):
        t._write_manifest({**t.manifest(), "version": v + 1})

    with open(opath) as f:
        assert json.load(f)["mark"] == "ORPHAN"  # bytes untouched
    assert t.current_version() == v + 1  # ...and now visible (adopted)


# ---------------- session-9 review round (packing/spandedup/wap/sampling) --
def test_wap_audit_exception_rolls_back(spark, tmp_path):
    """An exception raised by the AUDIT itself (not a violation — e.g. a
    check referencing a column the post-image frame lacks) must roll back
    the unaudited snapshot AND the replay ledger; otherwise the retry is
    skipped as a replay and the next clean publish moves the tag past a
    never-audited snapshot."""
    import pytest

    from oplogtoredis_spark.operators.expectations import not_null
    from oplogtoredis_spark.sources.schemas import TARGET_SCHEMA
    from oplogtoredis_spark.streaming.lake import LakeTable
    from oplogtoredis_spark.streaming.wap import wap_merge

    t = LakeTable.create(str(tmp_path / "tbl"), TARGET_SCHEMA, n_buckets=4)

    def env(rows, ts):
        return spark.createDataFrame(
            [("r", str(i), ts << 32, int(i), "u", f"c{ts}", "en", txt)
             for i, txt in rows],
            "repo string, path string, ts long, tx_idx int, op string,"
            " commit string, lang string, content string",
        )

    with pytest.raises(Exception, match="no_such_column"):
        wap_merge(t, spark, env([(1, "a")], 1), 0,
                  checks=[not_null("no_such_column")])
    # rollback is a NEW commit restoring the pre-merge state: the
    # unaudited rows are gone
    assert t.read(spark).count() == 0
    # the retry with a FIXED suite must re-apply (ledger rolled back too,
    # so batch 0 is NOT skipped as a replay)
    out = wap_merge(t, spark, env([(1, "a")], 1), 0,
                    checks=[not_null("content")])
    assert out.get("published") == t.current_version()
    assert t.read(spark).count() == 1


def test_wap_rejects_unknown_check_kind(spark, tmp_path):
    import pytest

    from oplogtoredis_spark.sources.schemas import TARGET_SCHEMA
    from oplogtoredis_spark.streaming.lake import LakeTable
    from oplogtoredis_spark.streaming.wap import wap_merge

    t = LakeTable.create(str(tmp_path / "tbl"), TARGET_SCHEMA, n_buckets=4)
    bad = {"kind": "foreign_key", "name": "fk:x", "pred": None}
    with pytest.raises(ValueError, match="unknown expectation kind"):
        wap_merge(t, spark, None, 0, checks=[bad])
    assert t.current_version() == 0  # validated BEFORE any merge


def test_pack_chunks_null_tokens_fails_loud_and_long_shards(spark):
    import pytest

    from oplogtoredis_spark.operators.packing import pack_chunks

    ok = spark.createDataFrame(
        [(1, 0, 10), (1, 1, 12), (2, 0, 7)],
        "doc_id long, chunk_idx int, n_tokens int",
    )
    out = pack_chunks(ok, budget=16)
    assert dict(out.dtypes)["shard_id"] == "bigint"  # no ANSI overflow at scale
    bad = spark.createDataFrame(
        [(1, 0, 10), (1, 1, None)], "doc_id long, chunk_idx int, n_tokens int"
    )
    with pytest.raises(Exception, match="NULL/negative n_tokens for 1\\|1"):
        pack_chunks(bad, budget=16).collect()
    neg = spark.createDataFrame(
        [(1, 0, 10), (1, 1, -3)], "doc_id long, chunk_idx int, n_tokens int"
    )
    with pytest.raises(Exception, match="NULL/negative n_tokens for 1\\|1"):
        pack_chunks(neg, budget=16).collect()


def test_span_dedup_blank_docs_pass_through(spark):
    """tokens('') = [''] used to give every blank doc the same empty span:
    one arbitrary 'winner' survived with text '' and the rest were deleted
    as repeats. Blank docs now pass through verbatim with zero spans."""
    from oplogtoredis_spark.operators.spandedup import span_dedup

    docs = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, None),
         (4, "real words here forming one span")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in span_dedup(docs, span_words=3).collect()}
    assert set(out) == {1, 2, 3, 4}          # nothing silently deleted
    assert out[1].text == "" and out[2].text == "   " and out[3].text is None
    assert out[1].n_spans == 0 and out[1].n_spans_dropped == 0
    assert out[4].n_spans == 2


def test_mixture_resample_missing_domain_fails_loud(spark):
    import pytest

    from oplogtoredis_spark.operators.sampling import mixture_resample

    df = spark.createDataFrame(
        [(i, "web") for i in range(6)] + [(10, "books")],
        "doc_id long, source string",
    )
    with pytest.raises(Exception, match="no corpus mass: code"):
        mixture_resample(
            df, "source", {"web": 0.5, "books": 0.3, "code": 0.2}, "doc_id"
        ).collect()


def test_hash_split_rejects_negative_fraction(spark):
    import pytest

    from oplogtoredis_spark.operators.sampling import hash_split

    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="must be > 0"):
        hash_split(df, "k", (("train", 0.5), ("eval", -0.2), ("test", 0.7)))


def test_sample_rank_col_collision_rejected(spark):
    import pytest

    from oplogtoredis_spark.operators.sampling import (
        stratified_sample,
        weighted_sample,
    )

    df = spark.createDataFrame([(1, "a", 2.0, 9)], "k long, s string, w double, rk int")
    with pytest.raises(ValueError, match="rank_col 'rk' already exists"):
        stratified_sample(df, ("s",), 1, "k")
    with pytest.raises(ValueError, match="rank_col 'rk' already exists"):
        weighted_sample(df, "k", "w", 1)


# ---------------- session-9 review round 3 (editdist/decontam/graph/pii) --
def test_editdist_duplicate_ids_deterministic_min_dist(spark):
    """With a non-unique id_col the old ids-only dropDuplicates BEFORE the
    verify kept an arbitrary key pair (output flickered across runs); the
    pair now deterministically carries the CLOSEST key pair."""
    from oplogtoredis_spark.operators.editdist import edit_distance_pairs

    df = spark.createDataFrame(
        [(1, "kitten"), (1, "sittin"), (2, "kitten")], "id long, key string"
    )
    for attempt in range(3):
        out = {
            (r.id_a, r.id_b): (r.key_a, r.key_b, r.dist)
            for r in edit_distance_pairs(
                df.repartition(attempt + 2), "id", "key", k=1
            ).collect()
        }
        assert out == {(1, 2): ("kitten", "kitten", 0)}


def test_decontaminate_rejects_bad_n(spark):
    import pytest

    from oplogtoredis_spark.operators.decontam import decontaminate

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    for bad in (0, -1):
        with pytest.raises(ValueError, match="n must be >= 1"):
            decontaminate(docs, docs, n=bad)


def test_pagerank_resolution_ceiling_and_deep_iters(spark):
    """Past ~1e9 nodes the e9 grid floors init to 0 (all ranks silently
    zero) — now loud. And a convergence-grade iteration count completes
    (lineage cut every 16 rounds) with ranks matching a shallower
    already-converged run."""
    import pytest

    from oplogtoredis_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (4, 1)], "src long, dst long"
    )
    deep = {r.node: r.rank_e9 for r in pagerank(edges, iters=40).collect()}
    again = {r.node: r.rank_e9 for r in pagerank(edges, iters=40).collect()}
    # 40 iterations crosses two lineage cuts (every 16): the run completes
    # (no plan blow-up) and the cuts change no values
    assert deep == again
    assert set(deep) == {1, 2, 3, 4} and all(v > 0 for v in deep.values())

    with pytest.raises(ValueError, match="must be >= 1"):
        pagerank(edges, iters=0)


def test_pii_null_text_counts_zero(spark):
    """NULL text: redacted stays NULL but every counter is 0 — the row no
    longer falls out of BOTH n_pii=0 and n_pii>0 filters."""
    from oplogtoredis_spark.operators.pii import redact_pii

    df = spark.createDataFrame(
        [(1, "mail me: a@b.co"), (2, None)], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in redact_pii(df).collect()}
    assert out[2].redacted is None
    assert (out[2].n_email, out[2].n_ipv4, out[2].n_phone, out[2].n_pii) == (
        0, 0, 0, 0,
    )
    assert out[1].n_email == 1 and out[1].n_pii == 1
