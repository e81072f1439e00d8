"""Diff-folding apply (sequential per-key modifier application via
applyInPandas) — the diff-only CDC path."""

import json

from oplogtoredis_spark.operators.fold import fold_diff_events


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "repo string, path string, ts long, tx_idx int, op string, doc string"
    )


def test_insert_set_unset_sequence(spark):
    rows = [
        ("r", "f", 1 << 32, 0, "i", json.dumps({"a": 1, "b": {"c": 2}})),
        ("r", "f", 2 << 32, 0, "u", json.dumps({"$set": {"a": 10, "b.d": 3}})),
        ("r", "f", 3 << 32, 0, "u", json.dumps({"$unset": {"b.c": True}})),
    ]
    out = fold_diff_events(_events(spark, rows)).collect()
    assert len(out) == 1
    doc = json.loads(out[0].doc_json)
    assert doc == {"a": 10, "b": {"d": 3}}
    assert out[0].last_ts == 3 << 32 and not out[0].deleted


def test_v2_diff_application(spark):
    rows = [
        ("r", "f", 1 << 32, 0, "i", json.dumps({"meta": {"owner": "a"}, "n": 1})),
        ("r", "f", 2 << 32, 0, "u",
         json.dumps({"$v": 2, "diff": {"u": {"n": 2}, "smeta": {"u": {"owner": "b"}}, "d": {"gone": True}}})),
    ]
    out = fold_diff_events(_events(spark, rows)).collect()
    doc = json.loads(out[0].doc_json)
    assert doc == {"meta": {"owner": "b"}, "n": 2}


def test_out_of_order_and_duplicates_fold_correctly(spark):
    rows = [
        ("r", "f", 3 << 32, 0, "u", json.dumps({"$set": {"v": 3}})),  # arrives first
        ("r", "f", 1 << 32, 0, "i", json.dumps({"v": 1})),
        ("r", "f", 2 << 32, 0, "u", json.dumps({"$set": {"v": 2}})),
        ("r", "f", 2 << 32, 0, "u", json.dumps({"$set": {"v": 2}})),  # exact dup
    ]
    out = fold_diff_events(_events(spark, rows)).collect()
    assert json.loads(out[0].doc_json) == {"v": 3}


def test_delete_then_replacement(spark):
    rows = [
        ("r", "f", 1 << 32, 0, "i", json.dumps({"v": 1})),
        ("r", "f", 2 << 32, 0, "d", None),
        ("r", "g", 1 << 32, 0, "i", json.dumps({"v": 9})),
        ("r", "g", 2 << 32, 0, "u", json.dumps({"v": 10, "w": 1})),  # replacement
    ]
    out = {r.path: r for r in fold_diff_events(_events(spark, rows)).collect()}
    assert out["f"].deleted and out["f"].doc_json is None
    assert json.loads(out["g"].doc_json) == {"v": 10, "w": 1}


def test_parallel_across_keys(spark):
    rows = []
    for k in range(50):
        rows.append((f"r{k % 5}", f"f{k}", 1 << 32, 0, "i", json.dumps({"k": k})))
        rows.append((f"r{k % 5}", f"f{k}", 2 << 32, 0, "u", json.dumps({"$set": {"k2": k * 2}})))
    out = fold_diff_events(_events(spark, rows)).collect()
    assert len(out) == 50
    sample = next(r for r in out if r.path == "f7")
    assert json.loads(sample.doc_json) == {"k": 7, "k2": 14}


def test_fold_v2_array_operator(spark):
    """v2 array-index diff {"stags":{"a":true,"u2":"new"}} must SET index 2
    of the list field, not vanish into the object-diff recursion
    (oplog_v2_converter.go:97-111 checks isArrayOperator first)."""
    rows = [
        ("r", "p", 1, 0, "i", '{"tags": ["a", "b", "c"], "n": 1}'),
        ("r", "p", 2, 0, "u", '{"$v": 2, "diff": {"stags": {"a": true, "u2": "new"}}}'),
    ]
    df = spark.createDataFrame(
        rows, "repo string, path string, ts long, tx_idx int, op string, doc string"
    )
    out = fold_diff_events(df).collect()
    assert len(out) == 1
    doc = json.loads(out[0].doc_json)
    assert doc["tags"] == ["a", "b", "new"]
    assert doc["n"] == 1


def test_fold_v2_array_operator_extends(spark):
    # index past the current length null-fills, mirroring Mongo array set
    rows = [
        ("r", "p", 1, 0, "i", '{"tags": ["a"]}'),
        ("r", "p", 2, 0, "u", '{"$v": 2, "diff": {"stags": {"a": true, "u3": "x"}}}'),
    ]
    df = spark.createDataFrame(
        rows, "repo string, path string, ts long, tx_idx int, op string, doc string"
    )
    out = fold_diff_events(df).collect()
    assert json.loads(out[0].doc_json)["tags"] == ["a", None, None, "x"]
