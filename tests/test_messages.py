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
