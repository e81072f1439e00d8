"""Streaming data-quality gate (streaming/gate.py): fail / quarantine /
log policies over real micro-batches, quarantine idempotency under
replay, and the clean-stream fast path."""

import glob

import pytest

from oplogtoredis_spark.config import EngineConfig
from oplogtoredis_spark.operators.expectations import (
    accepted_values,
    not_null,
    unique,
)
from oplogtoredis_spark.sources.generator import generate_events, write_events
from oplogtoredis_spark.streaming.gate import DataQualityError, make_gated_applier
from oplogtoredis_spark.streaming.lake import LakeTable
from oplogtoredis_spark.streaming.runner import run_to_completion, start_stream

CFG = EngineConfig(target_buckets=8)
GOOD_LANGS = ["go", "py", "js", "md", "java", "rs", "ts", "c", "rb", "cpp"]


@pytest.fixture(scope="module")
def poisoned_events(tmp_path_factory):
    """A log whose SECOND half carries lang='??' rows — with
    maxFilesPerTrigger=1 the early batches are clean, a later one trips."""
    d = tmp_path_factory.mktemp("gate_ev")
    ev = generate_events(n_events=1200, n_repos=20, seed=23)
    langs = sorted(ev["lang"].dropna().unique())
    assert set(langs) <= set(GOOD_LANGS), langs
    bad = ev.index[(ev.index > len(ev) * 0.6) & ev["lang"].notna()][:30]
    ev.loc[bad, "lang"] = "??"
    write_events(ev, str(d), n_files=4)
    return str(d), len(bad)


def _checks():
    return [not_null("repo"), accepted_values("lang", GOOD_LANGS + [None])]


def test_fail_policy_stops_stream_before_merge(spark, poisoned_events, tmp_path):
    d, _ = poisoned_events
    q = start_stream(
        spark, d, str(tmp_path / "tbl"), str(tmp_path / "ck"), CFG,
        max_files_per_trigger=1,
        dq_checks=[accepted_values("lang", GOOD_LANGS)],
        dq_policy="fail",
    )
    with pytest.raises(Exception) as ei:
        q.awaitTermination()
    assert "DataQualityError" in str(ei.value) or "data-quality" in str(ei.value)
    # nothing from the bad batch reached the table; earlier clean batches did
    t = LakeTable(str(tmp_path / "tbl"))
    assert t.read(spark).where("lang = '??'").count() == 0
    assert t.read(spark).count() > 0


def test_quarantine_policy_splits_and_applies_clean_rows(
    spark, poisoned_events, tmp_path
):
    d, n_bad = poisoned_events
    qdir = str(tmp_path / "quar")
    table = run_to_completion(
        spark, d, str(tmp_path / "tbl"), str(tmp_path / "ck"), CFG,
        max_files_per_trigger=1,
        dq_checks=[accepted_values("lang", GOOD_LANGS + [None])],
        dq_policy="quarantine",
        dq_quarantine_dir=qdir,
    )
    assert table.read(spark).where("lang = '??'").count() == 0
    quar = spark.read.parquet(*glob.glob(f"{qdir}/epoch=*"))
    assert quar.where("lang = '??'").count() > 0
    assert quar.where("lang <> '??'").count() == 0
    assert {r.dl_reason for r in quar.select("dl_reason").distinct().collect()} == {
        "accepted_values:lang"
    }
    # vs an ungated run: the table differs ONLY in keys whose winner was '??'
    t2 = run_to_completion(
        spark, d, str(tmp_path / "tbl2"), str(tmp_path / "ck2"), CFG,
        max_files_per_trigger=1,
    )
    assert t2.read(spark).where("lang = '??'").count() > 0


def test_log_policy_applies_everything_and_reports(spark, poisoned_events, tmp_path):
    d, _ = poisoned_events
    seen = []
    table = run_to_completion(
        spark, d, str(tmp_path / "tbl"), str(tmp_path / "ck"), CFG,
        max_files_per_trigger=2,
        dq_checks=[accepted_values("lang", GOOD_LANGS + [None])],
        dq_policy="log",
        dq_on_report=lambda bid, rep: seen.append((bid, rep)),
    )
    assert table.read(spark).where("lang = '??'").count() > 0
    assert sum(rep["accepted_values:lang"] for _, rep in seen) > 0
    assert len(seen) >= 2  # one report per micro-batch


def test_gated_applier_replay_is_idempotent(spark, tmp_path):
    """Re-running the same (batch, id) — the crash-after-quarantine /
    before-commit replay — overwrites the same epoch subdir, never
    duplicates quarantined rows."""
    applied = []
    gated = make_gated_applier(
        lambda df, bid: applied.append((bid, df.count())),
        [accepted_values("lang", GOOD_LANGS)],
        policy="quarantine",
        quarantine_dir=str(tmp_path / "q"),
        epoch_ns="testns",
    )
    df = spark.createDataFrame(
        [("r", "p", "go"), ("r", "p2", "??")], "repo string, path string, lang string"
    )
    gated(df, 7)
    gated(df, 7)  # replay
    quar = spark.read.parquet(str(tmp_path / "q/epoch=*"))
    assert quar.count() == 1
    assert applied == [(7, 1), (7, 1)]
    assert [bid for bid, _ in gated.reports] == [7, 7]


def test_gate_guards(spark, tmp_path):
    inner = lambda df, bid: None  # noqa: E731
    with pytest.raises(ValueError, match="policy must be"):
        make_gated_applier(inner, _checks(), policy="drop")
    with pytest.raises(ValueError, match="needs quarantine_dir"):
        make_gated_applier(inner, _checks(), policy="quarantine")
    with pytest.raises(ValueError, match="no per-row culprit"):
        make_gated_applier(
            inner, [unique(["repo"])], policy="quarantine",
            quarantine_dir=str(tmp_path / "q"),
        )
