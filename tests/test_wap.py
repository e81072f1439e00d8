"""Write-audit-publish merges (streaming/wap.py)."""

import pytest

from oplogtoredis_spark.operators.expectations import (
    accepted_values,
    in_range,
    not_null,
    unique,
)
from oplogtoredis_spark.sources.schemas import TARGET_SCHEMA
from oplogtoredis_spark.streaming.lake import LakeTable
from oplogtoredis_spark.streaming.wap import WriteAuditError, wap_merge

def _checks():
    # built lazily: expectation constructors create Column objects, which
    # need a live SparkContext
    return [not_null("content"), accepted_values("lang", ["py", "go"])]


def _batch(spark, rows):
    cols = (
        "repo string, path string, ts long, tx_idx int, op string, "
        "commit string, lang string, content string"
    )
    return spark.createDataFrame(rows, cols)


@pytest.fixture()
def table(tmp_path):
    return LakeTable.create(str(tmp_path / "tbl"), TARGET_SCHEMA, n_buckets=8)


def _state(table, spark, **kw):
    df = table.read(spark, **kw).toPandas()
    return sorted(zip(df["path"], df["content"]))


def test_publish_moves_tag_on_clean_epoch(spark, table):
    out = wap_merge(
        table, spark,
        _batch(spark, [("r", "a", 1 << 32, 0, "i", "c1", "py", "good")]),
        0, _checks(),
    )
    assert out["published"] == table.current_version()
    assert _state(table, spark, tag="published") == [("a", "good")]


def test_failed_audit_rolls_back_and_never_publishes(spark, table):
    wap_merge(
        table, spark,
        _batch(spark, [("r", "a", 1 << 32, 0, "i", "c1", "py", "good")]), 0,
        _checks(),
    )
    v_good = table.resolve_ref("published")
    with pytest.raises(WriteAuditError) as ei:
        wap_merge(
            table, spark,
            _batch(spark, [("r", "b", 2 << 32, 0, "i", "c2", "xx", "bad")]),
            1, _checks(),
        )
    assert ei.value.violations == {"accepted_values:lang": 1}
    # state rolled back; the published tag never moved
    assert _state(table, spark) == [("a", "good")]
    assert table.resolve_ref("published") == v_good
    assert _state(table, spark, tag="published") == [("a", "good")]
    # the replay ledger rolled back too: the CORRECTED epoch re-applies
    # under the same batch id
    out = wap_merge(
        table, spark,
        _batch(spark, [("r", "b", 2 << 32, 0, "i", "c2", "go", "fixed")]),
        1, _checks(),
    )
    assert out["published"] == table.current_version()
    assert _state(table, spark, tag="published") == [("a", "good"), ("b", "fixed")]


def test_replayed_epoch_is_skipped_and_tag_untouched(spark, table):
    wap_merge(
        table, spark,
        _batch(spark, [("r", "a", 1 << 32, 0, "i", "c1", "py", "v1")]), 0,
        _checks(),
    )
    v = table.resolve_ref("published")
    out = wap_merge(
        table, spark,
        _batch(spark, [("r", "a", 9 << 32, 0, "u", "c9", "py", "REPLAY")]),
        0, _checks(),
    )
    assert out.get("skipped_replay") is True
    assert table.resolve_ref("published") == v
    assert _state(table, spark) == [("a", "v1")]


def test_changes_scope_audits_only_the_epoch(spark, table):
    # seed a PRE-EXISTING violation with a plain (un-audited) merge
    table.merge_batch(
        _batch(spark, [("r", "old", 1 << 32, 0, "i", "c1", "xx", "legacy")]), 0
    )
    # a clean epoch passes under scope="changes" despite the legacy row...
    out = wap_merge(
        table, spark,
        _batch(spark, [("r", "new", 2 << 32, 0, "i", "c2", "py", "clean")]),
        1, _checks(), audit_scope="changes",
    )
    assert "published" in out
    # ...but the same clean epoch FAILS the strict whole-table audit
    with pytest.raises(WriteAuditError) as ei:
        wap_merge(
            table, spark,
            _batch(spark, [("r", "new2", 3 << 32, 0, "i", "c3", "py", "ok")]),
            2, _checks(), audit_scope="table",
        )
    assert ei.value.violations == {"accepted_values:lang": 1}
    assert _state(table, spark) == [("new", "clean"), ("old", "legacy")]


def test_cross_epoch_unique_check_via_table_scope(spark, table):
    # content_sha256 collisions across epochs are invisible to a batch-only
    # gate; the WAP table-scope audit sees the merged state
    checks = [unique(["content_sha256"])]
    wap_merge(
        table, spark,
        _batch(spark, [("r", "a", 1 << 32, 0, "i", "c1", "py", "same")]), 0,
        checks, audit_scope="table",
    )
    with pytest.raises(WriteAuditError):
        wap_merge(
            table, spark,
            _batch(spark, [("r", "b", 2 << 32, 0, "i", "c2", "py", "same")]),
            1, checks, audit_scope="table",
        )
    assert _state(table, spark) == [("a", "same")]


GOOD_LANGS = ["go", "py", "js", "md", "java", "rs", "ts", "c", "rb", "cpp"]


def test_streaming_wap_publishes_every_clean_epoch(spark, tmp_path):
    from oplogtoredis_spark.config import EngineConfig
    from oplogtoredis_spark.sources.generator import (
        generate_events,
        write_events,
    )
    from oplogtoredis_spark.streaming.runner import run_to_completion

    d = tmp_path / "ev"
    write_events(generate_events(n_events=800, n_repos=16, seed=7), str(d), n_files=4)
    t = run_to_completion(
        spark, str(d), str(tmp_path / "tbl"), str(tmp_path / "ck"),
        EngineConfig(target_buckets=8), max_files_per_trigger=2,
        wap_checks=[not_null("repo"), accepted_values("lang", GOOD_LANGS)],
    )
    # every epoch audited and published: the tag tracks CURRENT, and the
    # published view equals the live view
    assert t.resolve_ref("published") == t.current_version()
    assert (
        t.read(spark, tag="published").count() == t.read(spark).count() > 0
    )


def test_streaming_wap_failure_rolls_back_and_blocks_publish(spark, tmp_path):
    from oplogtoredis_spark.config import EngineConfig
    from oplogtoredis_spark.sources.generator import (
        generate_events,
        write_events,
    )
    from oplogtoredis_spark.streaming.lake import LakeTable
    from oplogtoredis_spark.streaming.runner import start_stream

    d = tmp_path / "ev"
    ev = generate_events(n_events=1200, n_repos=20, seed=23)
    bad = ev.index[(ev.index > len(ev) * 0.6) & ev["lang"].notna()][:30]
    ev.loc[bad, "lang"] = "??"
    write_events(ev, str(d), n_files=4)
    q = start_stream(
        spark, str(d), str(tmp_path / "tbl"), str(tmp_path / "ck"),
        EngineConfig(target_buckets=8), max_files_per_trigger=1,
        wap_checks=[accepted_values("lang", GOOD_LANGS)],
    )
    with pytest.raises(Exception) as ei:
        q.awaitTermination()
    assert "WriteAuditError" in str(ei.value) or "write-audit" in str(ei.value)
    t = LakeTable(str(tmp_path / "tbl"))
    # the poisoned epoch merged, failed its audit, and ROLLED BACK: no '??'
    # row is live, and the published tag points at the last audited snapshot
    assert t.read(spark).where("lang = '??'").count() == 0
    v_pub = t.resolve_ref("published")
    pub = t.read(spark, tag="published")
    assert pub.where("lang = '??'").count() == 0 and pub.count() > 0
    # rollback is visible in history: CURRENT advanced past the tag
    # (merge + rollback commits) while the published view stayed clean
    assert t.current_version() > v_pub


def test_guards(spark, table):
    b = _batch(spark, [("r", "a", 1 << 32, 0, "i", "c1", "py", "x")])
    with pytest.raises(ValueError, match="no checks"):
        wap_merge(table, spark, b, 0, [])
    with pytest.raises(ValueError, match="audit_scope"):
        wap_merge(table, spark, b, 0, _checks(), audit_scope="bogus")
    with pytest.raises(ValueError, match="publish_tag"):
        wap_merge(table, spark, b, 0, _checks(), publish_tag="../escape")
    # a malformed suite must fail BEFORE the merge commits anything
    v0 = table.current_version()
    with pytest.raises(ValueError, match="duplicate check names"):
        wap_merge(table, spark, b, 0, [in_range("ts", 5, 1), in_range("ts", 5, 1)])
    assert table.current_version() == v0
