"""Outgoing-message golden tests — mirror of
/root/reference/lib/oplog/processor_test.go:22-297."""

import json

from pyspark.sql import functions as F

from oplogtoredis_spark.functions.messages import event_name, message_json


def _msg(spark, op, id_str, fields, is_oid=False):
    df = spark.createDataFrame(
        [(op, id_str, fields, is_oid)],
        "op string, id string, f array<string>, oid boolean",
    )
    return df.select(
        message_json(F.col("op"), F.col("id"), F.col("f"), F.col("oid")).alias("m")
    ).first().m


def test_insert_message(spark):
    m = _msg(spark, "i", "id1", ["_id", "foo"])
    assert json.loads(m) == {"e": "i", "d": {"_id": "id1"}, "f": ["_id", "foo"]}
    # byte-exact field order mirrors the Go struct order (processor.go:25-32)
    assert m == '{"e":"i","d":{"_id":"id1"},"f":["_id","foo"]}'


def test_remove_renamed_to_r(spark):
    # processor.go:119-124 — redis-oplog calls deletes "r"
    m = _msg(spark, "d", "id1", [])
    assert json.loads(m) == {"e": "r", "d": {"_id": "id1"}, "f": []}


def test_objectid_extended_json(spark):
    # processor.go:53-59
    hexid = "deadbeefdeadbeefdeadbeef"
    m = _msg(spark, "u", hexid, ["a"], is_oid=True)
    assert json.loads(m) == {
        "e": "u",
        "d": {"_id": {"$type": "oid", "$value": hexid}},
        "f": ["a"],
    }


def test_unsupported_id_is_null_message(spark):
    # ErrUnsupportedDocIDType (processor.go:16,61-66): ids we can't route
    # produce no message; the row can be side-outputted, never published
    m = _msg(spark, "i", None, ["a"])
    assert m is None


def test_event_name_passthrough(spark):
    df = spark.createDataFrame([("i",), ("u",), ("d",)], "op string")
    got = [r.e for r in df.select(event_name(F.col("op")).alias("e")).collect()]
    assert got == ["i", "u", "r"]


def test_classify_doc_id_supported_and_unsupported(spark):
    """Mirror of processor_test.go:198-213 (ErrUnsupportedDocIDType): string
    and ObjectID ids are supported; numbers / bools / other objects are
    unprocessable with a reason — never a silent null."""
    from oplogtoredis_spark.functions.messages import classify_doc_id
    from pyspark.sql import functions as F

    rows = [
        ("s", '{"_id": "abc", "x": 1}'),
        ("s2", '{"_id": "42"}'),                                  # string "42" IS supported
        ("oid", '{"_id": {"$oid": "507f1f77bcf86cd799439011"}}'),
        ("num", '{"_id": 42}'),                                   # number 42 is NOT
        ("bool", '{"_id": true}'),
        ("obj", '{"_id": {"nested": 1}}'),
        ("badoid", '{"_id": {"$oid": "xyz"}}'),                   # malformed hex
        ("miss", '{"x": 1}'),
        ("junk", "not json"),
    ]
    df = spark.createDataFrame(rows, "tag string, o string")
    id_str, id_is_oid, reason = classify_doc_id(F.col("o"))
    got = {
        r.tag: (r.id_str, r.is_oid, r.reason)
        for r in df.select(
            "tag", id_str.alias("id_str"), id_is_oid.alias("is_oid"), reason.alias("reason")
        ).collect()
    }
    assert got["s"] == ("abc", False, None)
    assert got["s2"] == ("42", False, None)
    assert got["oid"] == ("507f1f77bcf86cd799439011", True, None)
    for tag in ("num", "bool", "obj", "badoid"):
        assert got[tag][0] is None and got[tag][2] == "unsupported_doc_id_type", tag
    assert got["miss"][2] == "missing_doc_id"
    assert got["junk"][2] == "missing_doc_id"


def test_dead_letter_split_counts(spark):
    from oplogtoredis_spark.functions.messages import classify_doc_id
    from oplogtoredis_spark.operators.deadletter import split_dead_letters
    from pyspark.sql import functions as F

    rows = [('{"_id": "a"}',), ('{"_id": 1}',), ('{"_id": "b"}',)]
    df = spark.createDataFrame(rows, "o string")
    _, _, reason = classify_doc_id(F.col("o"))
    ok, dead = split_dead_letters(df, reason)
    assert ok.count() == 2
    d = dead.collect()
    assert len(d) == 1 and d[0].dl_reason == "unsupported_doc_id_type"
