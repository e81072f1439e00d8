"""IncrementalCorpus.follow_lake: the corpus follows a CDC LakeTable via the
NET changelog scan (LakeTable.changes) — the end-to-end composition the
nightly training-data job runs: lake is the system of record, corpus state
converges to the batch recompute over the lake's live documents without
rescanning either side."""

import pytest
from pyspark.sql import functions as F

from oplogtoredis_spark.operators.incremental_corpus import IncrementalCorpus
from oplogtoredis_spark.sources.schemas import TARGET_SCHEMA
from oplogtoredis_spark.streaming.lake import LakeTable

from tests.test_incremental_corpus import (
    GATE,
    LONG_A,
    LONG_B,
    LONG_C,
    _batch_recompute,
    _state,
)


def _mk_corpus(tmp_path):
    return IncrementalCorpus(
        str(tmp_path / "corpus"), chunk_tokens=5, overlap=1, **GATE
    )


def _lake_batch(spark, rows, ts):
    """Documents as CDC envelopes: path=str(doc_id), content=text."""
    cols = (
        "repo string, path string, ts long, tx_idx int, op string,"
        " commit string, lang string, content string"
    )
    return spark.createDataFrame(
        [
            ("docs", str(i), ts << 32, int(i), op, f"c{ts}", "en", txt)
            for (i, txt, op) in rows
        ],
        cols,
    )


def _live_docs(spark, table):
    return table.read(spark).select(
        F.col("path").cast("long").alias("doc_id"),
        F.col("content").alias("text"),
    )


def test_follow_converges_to_recompute_across_epochs(spark, tmp_path):
    t = LakeTable.create(str(tmp_path / "tbl"), TARGET_SCHEMA, n_buckets=4)
    c = _mk_corpus(tmp_path)

    # epoch 1: initial docs (a dup group 3/4, a singleton, a gate reject)
    t.merge_batch(
        _lake_batch(
            spark,
            [(3, LONG_A, "u"), (4, LONG_A, "u"), (6, LONG_B, "u"), (7, "x", "u")],
            ts=1,
        ),
        0,
    )
    s = c.follow_lake(spark, t, repo="docs")
    assert s["lake_version"] == t.current_version()
    want = _batch_recompute(spark, _live_docs(spark, t))
    assert _state(c.chunks(spark)).equals(_state(want))

    # epoch 2: smaller-id dup flips the survivor seat, a delete, an insert
    t.merge_batch(
        _lake_batch(
            spark,
            [(1, LONG_A, "u"), (6, LONG_B, "d"), (5, LONG_C, "u")],
            ts=2,
        ),
        1,
    )
    c.follow_lake(spark, t, repo="docs")
    want = _batch_recompute(spark, _live_docs(spark, t))
    assert _state(c.chunks(spark)).equals(_state(want))
    # survivor seats: 1 took the LONG_A group from 3; 6's group is gone
    assert sorted(
        c.chunks(spark).select("doc_id").distinct().toPandas()["doc_id"]
    ) == [1, 5]

    # epoch 3: text update changes a doc's hash group
    t.merge_batch(
        _lake_batch(spark, [(1, LONG_C, "u")], ts=3),
        2,
    )
    c.follow_lake(spark, t, repo="docs")
    want = _batch_recompute(spark, _live_docs(spark, t))
    assert _state(c.chunks(spark)).equals(_state(want))


def test_follow_is_idempotent_and_monotonic(spark, tmp_path):
    t = LakeTable.create(str(tmp_path / "tbl"), TARGET_SCHEMA, n_buckets=4)
    c = _mk_corpus(tmp_path)
    t.merge_batch(_lake_batch(spark, [(3, LONG_A, "u")], ts=1), 0)
    c.follow_lake(spark, t, repo="docs")
    before = _state(c.chunks(spark))
    # no new lake commits: follow is a no-op
    s = c.follow_lake(spark, t, repo="docs")
    assert s.get("up_to_date") is True
    assert _state(c.chunks(spark)).equals(before)


def test_follow_rejects_mixed_epoch_numbering(spark, tmp_path):
    t = LakeTable.create(str(tmp_path / "tbl"), TARGET_SCHEMA, n_buckets=4)
    c = _mk_corpus(tmp_path)
    c.apply_epoch(
        spark,
        spark.createDataFrame(
            [(3, LONG_A, "u")], "doc_id long, text string, op string"
        ),
        epoch=999,
    )
    t.merge_batch(_lake_batch(spark, [(5, LONG_B, "u")], ts=1), 0)
    with pytest.raises(ValueError, match="beyond the lake"):
        c.follow_lake(spark, t, repo="docs")
