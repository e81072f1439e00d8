"""Streaming SCD2 history maintenance (streaming/history.py): multi-epoch
parity with the batch recompute, replay idempotency, the late-arrival
guard, and the lake-as-open-tail composition."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oplogtoredis_spark.operators.scd import scd2_history
from oplogtoredis_spark.sources.schemas import TARGET_SCHEMA
from oplogtoredis_spark.streaming.history import (
    make_history_applier,
    read_history,
)
from oplogtoredis_spark.streaming.lake import LakeTable

COLS = (
    "repo string, path string, ts long, tx_idx int, op string, "
    "commit string, lang string, content string"
)


def _batch(spark, rows):
    return spark.createDataFrame(rows, COLS)


def _recompute(spark, all_rows):
    """Ground truth: batch SCD2 over every change so far, deduped on the
    event identity (key, ts, tx_idx) — redeliveries are not changes."""
    return {
        (r.repo, r.path, r.commit, r.lang, r.content,
         r.valid_from, r.valid_to, r.is_current)
        for r in scd2_history(
            _batch(spark, all_rows).dropDuplicates(
                ["repo", "path", "ts", "tx_idx"]
            ),
            keys=["repo", "path"],
            attrs=["commit", "lang", "content"],
            ts="ts",
            tiebreak="tx_idx",
            op="op",
            compress=False,
        ).collect()
    }


def _view(spark, lake_path, hist_dir):
    return {
        (r.repo, r.path, r.commit, r.lang, r.content,
         r.valid_from, r.valid_to, r.is_current)
        for r in read_history(spark, lake_path, hist_dir).collect()
    }


EPOCHS = [
    # epoch 0: inserts + an intra-batch double-change (closes one version
    # in-batch) + a same-batch delete/re-insert chain
    [
        ("r/a", "f", 10, 0, "i", "c1", "py", "v1"),
        ("r/a", "f", 20, 0, "u", "c2", "py", "v2"),
        ("r/b", "g", 15, 0, "i", "c1", "go", "w1"),
        ("r/c", "h", 5, 0, "i", "c1", "rs", "x1"),
        ("r/c", "h", 6, 0, "d", None, None, None),
        ("r/c", "h", 7, 0, "i", "c2", "rs", "x2"),
    ],
    # epoch 1: cross-epoch close (r/a updated), delete closing an open
    # version as the FIRST change of its epoch (r/b), untouched key (r/c)
    [
        ("r/a", "f", 30, 0, "u", "c3", "py", "v3"),
        ("r/b", "g", 25, 0, "d", None, None, None),
    ],
    # epoch 2: re-insert after a cross-epoch delete + same-ts tiebreak
    [
        ("r/b", "g", 40, 0, "i", "c9", "go", "w2"),
        ("r/a", "f", 35, 1, "u", "c4", "py", "v4"),
        ("r/a", "f", 35, 2, "u", "c5", "py", "v5"),
    ],
]


@pytest.fixture()
def table(spark, tmp_path):
    lake = LakeTable.create(str(tmp_path / "lake"), TARGET_SCHEMA, n_buckets=4)
    hist = str(tmp_path / "hist")
    applier = make_history_applier(lake.path, hist)
    return lake, hist, applier


def test_multi_epoch_equals_batch_recompute(spark, table):
    lake, hist, applier = table
    seen = []
    for i, rows in enumerate(EPOCHS):
        applier(_batch(spark, rows), i)
        seen += rows
        assert _view(spark, lake.path, hist) == _recompute(spark, seen), (
            f"divergence after epoch {i}"
        )


def test_replayed_epoch_is_skipped(spark, table):
    lake, hist, applier = table
    applier(_batch(spark, EPOCHS[0]), 0)
    applier(_batch(spark, EPOCHS[1]), 1)
    before = _view(spark, lake.path, hist)
    applier(_batch(spark, EPOCHS[1]), 1)  # foreachBatch redelivery
    applier(_batch(spark, EPOCHS[0]), 0)  # even older epoch
    assert _view(spark, lake.path, hist) == before


def test_redeliveries_are_absorbed_like_the_lake(spark, table):
    """At-least-once delivery: an epoch re-delivering already-folded
    changes (plus one genuinely new one) folds ONLY the new one — same
    absorption the lake's MERGE predicate applies."""
    lake, hist, applier = table
    applier(_batch(spark, EPOCHS[0]), 0)
    before = _view(spark, lake.path, hist)
    redelivered = EPOCHS[0] + [("r/a", "f", 25, 0, "u", "c9", "py", "v9")]
    applier(_batch(spark, redelivered), 1)
    after = _view(spark, lake.path, hist)
    assert after == _recompute(spark, EPOCHS[0] + redelivered)
    assert after != before  # the new change DID fold
    # in-batch duplicate rows also collapse
    applier(_batch(spark, [("r/b", "g", 30, 0, "u", "c2", "go", "w2")] * 3), 2)
    assert _view(spark, lake.path, hist) == _recompute(
        spark,
        EPOCHS[0] + redelivered + [("r/b", "g", 30, 0, "u", "c2", "go", "w2")],
    )


def test_late_error_mode_fails_loud(spark, tmp_path):
    lake = LakeTable.create(str(tmp_path / "lk"), TARGET_SCHEMA, n_buckets=4)
    hist = str(tmp_path / "h")
    applier = make_history_applier(lake.path, hist, late="error")
    applier(_batch(spark, [("r/a", "f", 100, 0, "i", "c1", "py", "v1")]), 0)
    with pytest.raises(Exception, match="cross-epoch arrival"):
        applier(_batch(spark, [("r/a", "f", 90, 0, "u", "c2", "py", "v2")]), 1)
    # equal (ts, tx_idx) — a redelivery — also refuses in strict mode
    with pytest.raises(Exception, match="cross-epoch arrival"):
        applier(_batch(spark, [("r/a", "f", 100, 0, "u", "c2", "py", "v2")]), 2)


def test_rejects_unknown_late_mode(spark, tmp_path):
    lake = LakeTable.create(str(tmp_path / "lk2"), TARGET_SCHEMA, n_buckets=4)
    with pytest.raises(ValueError, match="absorb|error"):
        make_history_applier(lake.path, str(tmp_path / "h2"), late="clamp")


def test_open_versions_ride_the_lake(spark, table):
    lake, hist, applier = table
    applier(_batch(spark, EPOCHS[0]), 0)
    view = read_history(spark, lake.path, hist)
    open_keys = {
        (r.repo, r.path, r.valid_from)
        for r in view.where("is_current").collect()
    }
    lake_keys = {
        (r.repo, r.path, r.last_ts) for r in lake.read(spark).collect()
    }
    assert open_keys == lake_keys


def test_empty_history_dir_is_just_the_open_tail(spark, table):
    lake, hist, applier = table
    lake.merge_batch(
        _batch(spark, [("r/a", "f", 10, 0, "i", "c1", "py", "v1")]), 0
    )
    view = _view(spark, lake.path, hist)  # hist dir never created
    assert view == {("r/a", "f", "c1", "py", "v1", 10, None, True)}


def test_history_through_a_real_stream(spark, table, tmp_path):
    """availableNow stream, one file per micro-batch: the applier composes
    with real foreachBatch epochs and the final view equals the recompute."""
    import pandas as pd

    lake, hist, applier = table
    src = tmp_path / "src"
    src.mkdir()
    cols = ["repo", "path", "ts", "tx_idx", "op", "commit", "lang", "content"]
    for i, rows in enumerate(EPOCHS):
        pd.DataFrame(rows, columns=cols).astype(
            {"ts": "int64", "tx_idx": "int32"}
        ).to_parquet(str(src / f"{i:02d}.parquet"))
        q = (
            spark.readStream.schema(COLS)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
            .writeStream.foreachBatch(applier)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    all_rows = [r for rows in EPOCHS for r in rows]
    assert _view(spark, lake.path, hist) == _recompute(spark, all_rows)


def test_compact_history_preserves_view_and_bounds_dirs(spark, table):
    import os

    from oplogtoredis_spark.streaming.history import compact_history

    lake, hist, applier = table
    applier(_batch(spark, EPOCHS[0]), 0)
    applier(_batch(spark, EPOCHS[1]), 1)
    want = _view(spark, lake.path, hist)
    assert compact_history(spark, lake.path, hist) == 2
    assert _view(spark, lake.path, hist) == want
    assert [d for d in sorted(os.listdir(hist)) if d[0] in "ce"] == [
        "c00000000_00000001"
    ]
    applier(_batch(spark, EPOCHS[2]), 2)
    full = _recompute(spark, [r for e in EPOCHS for r in e])
    assert _view(spark, lake.path, hist) == full
    assert compact_history(spark, lake.path, hist) == 2  # folds c-dir + e2
    assert _view(spark, lake.path, hist) == full
    assert compact_history(spark, lake.path, hist) == 0  # nothing left to fold


def test_stale_epoch_dir_below_watermark_ignored_and_swept(spark, table):
    """A retried half-failed epoch can rewrite its e-dir AFTER compaction
    already folded that epoch: readers must ignore it (its rows are
    already in the c-dir) and the next compaction sweeps it."""
    import os

    from oplogtoredis_spark.streaming.history import compact_history

    lake, hist, applier = table
    applier(_batch(spark, EPOCHS[0]), 0)
    applier(_batch(spark, EPOCHS[1]), 1)
    compact_history(spark, lake.path, hist)
    want = _view(spark, lake.path, hist)
    stale = os.path.join(hist, "e00000001")
    spark.createDataFrame(
        [("zz", "zz", "c", "x", "y", 1, 2)],
        "repo string, path string, commit string, lang string, "
        "content string, valid_from long, valid_to long",
    ).write.mode("overwrite").parquet(stale)
    assert _view(spark, lake.path, hist) == want  # below watermark: ignored
    compact_history(spark, lake.path, hist)
    assert not os.path.exists(stale)  # swept as stale
    assert _view(spark, lake.path, hist) == want


def test_auto_compaction_bounds_live_dir_count(spark, tmp_path):
    """A long stream with compact_min_dirs keeps the live dir count
    bounded at every point in its life, and the view still equals the
    batch recompute."""
    import os

    from oplogtoredis_spark.streaming.history import _live_dirs

    lake = LakeTable.create(str(tmp_path / "lk3"), TARGET_SCHEMA, n_buckets=4)
    hist = str(tmp_path / "h3")
    applier = make_history_applier(lake.path, hist, compact_min_dirs=3)
    seen = []
    for i in range(7):
        rows = [("r/a", "f", 10 * (i + 1), 0, "u", f"c{i}", "py", f"v{i}"),
                ("r/b", "g", 10 * (i + 1) + 1, 0, "u", f"c{i}", "go", f"w{i}")]
        applier(_batch(spark, rows), i)
        seen += rows
        assert len(_live_dirs(hist)) < 3 + 1, f"unbounded at epoch {i}"
    assert _view(spark, lake.path, hist) == _recompute(spark, seen)
    # the log is dominated by one compacted dir, not 7 epoch dirs
    assert sum(1 for d in os.listdir(hist) if d.startswith("e")) <= 2


# ---------------------------------------------------------------------------
# regressions from the round-5 adversarial review
# ---------------------------------------------------------------------------
def test_post_delete_redelivery_does_not_refold(spark, table):
    """The redelivery guard must compare against TOMBSTONES too (the
    merge predicate does): replaying pre-delete changes after the delete
    must not re-fold them into the log."""
    lake, hist, applier = table
    e0 = [
        ("k", "f", 10, 0, "i", "c1", "py", "v1"),
        ("k", "f", 15, 0, "u", "c2", "py", "v2"),
        ("k", "f", 20, 0, "d", None, None, None),
    ]
    applier(_batch(spark, e0), 0)
    # at-least-once window replay: pre-delete changes + one genuinely new
    e1 = e0[:2] + [("k", "f", 25, 0, "u", "c3", "py", "v3")]
    applier(_batch(spark, e1), 1)
    assert _view(spark, lake.path, hist) == _recompute(spark, e0 + e1)
    # explicitly: exactly one [10,15) and one [15,20), and NO close of the
    # new version against a stale pre-delete open
    rows = sorted(
        (r.valid_from, r.valid_to)
        for r in read_history(spark, lake.path, hist).collect()
    )
    assert rows == [(10, 15), (15, 20), (25, None)]


def test_markerless_compacted_dir_is_untrusted_and_swept(spark, table):
    """A compaction that crashed mid-write leaves a c-dir without
    _SUCCESS: readers must keep trusting the e-dirs it failed to fold,
    and the next compaction sweeps the garbage instead of the e-dirs."""
    import os

    from oplogtoredis_spark.streaming.history import compact_history

    lake, hist, applier = table
    applier(_batch(spark, EPOCHS[0]), 0)
    applier(_batch(spark, EPOCHS[1]), 1)
    want = _view(spark, lake.path, hist)
    bogus = os.path.join(hist, "c00000000_00000001")
    os.makedirs(os.path.join(bogus, "_temporary"))  # no _SUCCESS marker
    assert _view(spark, lake.path, hist) == want  # e-dirs still trusted
    compact_history(spark, lake.path, hist)
    assert _view(spark, lake.path, hist) == want
    assert not any(
        d == "c00000000_00000001" and not os.path.exists(
            os.path.join(hist, d, "_SUCCESS")
        )
        for d in os.listdir(hist)
    )


def test_unapplied_epoch_dir_is_invisible_until_merge_commits(spark, table):
    """Crash between the history write and the lake merge: the e-dir
    exists but its epoch is not applied — readers must not see a torn
    'closed but still open' state; the retry makes it visible."""
    lake, hist, applier = table
    applier(_batch(spark, EPOCHS[0]), 0)
    want = _view(spark, lake.path, hist)

    # simulate the crash: write epoch 1's closes WITHOUT merging
    crashed = make_history_applier(lake.path, hist)
    orig_merge = LakeTable.merge_batch
    try:
        LakeTable.merge_batch = lambda self, *a, **k: (_ for _ in ()).throw(
            RuntimeError("crash before merge")
        )
        with pytest.raises(RuntimeError, match="crash before merge"):
            crashed(_batch(spark, EPOCHS[1]), 1)
    finally:
        LakeTable.merge_batch = orig_merge

    import os

    assert os.path.exists(os.path.join(hist, "e00000001"))  # dir written
    assert _view(spark, lake.path, hist) == want  # ...but invisible

    applier(_batch(spark, EPOCHS[1]), 1)  # the retry commits the merge
    assert _view(spark, lake.path, hist) == _recompute(
        spark, EPOCHS[0] + EPOCHS[1]
    )


def test_deadletter_rows_never_enter_history(spark, table):
    """Rows the merge quarantines (null identity) must not fold into
    history — history never records an entity the lake does not serve."""
    lake, hist, applier = table
    applier(
        _batch(
            spark,
            [
                (None, "p", 1, 0, "i", "c", "py", "x"),   # null repo
                (None, "p", 2, 0, "u", "c", "py", "y"),   # would close ^
                ("r/ok", "f", 5, 0, "i", "c1", "py", "v"),
            ],
        ),
        0,
    )
    view = read_history(spark, lake.path, hist)
    assert view.where(F.col("repo").isNull()).count() == 0
    assert _view(spark, lake.path, hist) == {
        ("r/ok", "f", "c1", "py", "v", 5, None, True)
    }
