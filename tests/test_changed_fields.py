"""Changed-field extraction golden corpora, ported 1:1 from the reference:

  - 15-case v2-deep corpus: /root/reference/lib/oplog/oplog_v2_converter_test.go:12-174
    (itself ported from Meteor's oplog_v2_converter_tests.js)
  - v1 / replacement / v2-shallow tables: /root/reference/lib/oplog/oplogEntry_test.go:154-351
"""

import json

import pytest
from pyspark.sql import functions as F

from oplogtoredis_spark.functions.changed_fields import (
    changed_fields,
    changed_fields_v2_deep_py,
    is_v2_update,
    update_is_replace,
)

# --- the 15 Meteor-ported deep cases (oplog_v2_converter_test.go) -----------
DEEP_CASES = [
    ("basic", {"scustom": {"sEJSON$value": {"u": {"EJSONtail": "d"}}}},
     ["custom.EJSON$value.EJSONtail"]),
    ("basic with u", {"u": {"d": "2", "oi": "asdas"}}, ["d", "oi"]),
    ("set inside an array", {"sasd": {"a": True, "u0": 2}}, ["asd.0"]),
    ("unset inside an array", {"sasd": {"a": True, "u0": None}}, ["asd.0"]),
    ("set a new nested field inside an object", {"i": {"a": {"b": 2}}}, ["a.b"]),
    ("set a new nested field inside an object, variant",
     {"u": {"count": 1}, "i": {"nested": {"state": {}}}}, ["nested.state", "count"]),
    ("set an existing nested field inside an object",
     {"sa": {"i": {"b": 3, "c": 1}}}, ["a.b", "a.c"]),
    ("unset an existing nested field inside an object",
     {"sa": {"d": {"b": False}}}, ["a.b"]),
    ("combine u and s", {"u": {"c": "bar"}, "sb": {"a": True, "u0": 2}},
     ["b.0", "c"]),
    ("deeply nested s entries",
     {"sservices": {"sresume": {"u": {"loginTokens": []}}}},
     ["services.resume.loginTokens"]),
    ("set a new array", {"i": {"tShirt": {"sizes": ["small", "medium", "large"]}}},
     ["tShirt.sizes"]),
    ("update specific list elements", {"slist": {"a": True, "u3": "i", "u4": "h"}},
     ["list.3", "list.4"]),
    ("set whole array", {"sobject": {"u": {"array": ["2", "2", "4", "3"]}}},
     ["object.array"]),
    ("more deep nesting",
     {"slayout": {"sjourneyStepIds": {"sj4aqp3tiK6xCPCYu8": {"a": True, "u2": "zTkxivNrKuBi2iJ2m"}}}},
     ["layout.journeyStepIds.j4aqp3tiK6xCPCYu8.2"]),
    ("misleading array operator-like keys",
     {"sarray": {"a": True, "s2": {"u": {"a": "something"}}}},
     ["array.2.a"]),
]


@pytest.mark.parametrize("name,diff,want", DEEP_CASES, ids=[c[0] for c in DEEP_CASES])
def test_v2_deep_python_golden(name, diff, want):
    got = changed_fields_v2_deep_py(diff, "")
    assert sorted(got) == sorted(want)


def test_v2_deep_spark_udf_golden(spark):
    rows = [(name, json.dumps({"$v": 2, "diff": diff})) for name, diff, _ in DEEP_CASES]
    df = spark.createDataFrame(rows, "name string, o string")
    out = df.select(
        "name", changed_fields(F.lit("u"), F.col("o"), deep=True).alias("f")
    ).collect()
    want = {name: sorted(w) for name, _, w in DEEP_CASES}
    for r in out:
        assert sorted(r.f) == want[r.name], r.name


# --- v1 / replacement / shallow tables (oplogEntry_test.go:109-351) ---------
SHALLOW_CASES = [
    # (name, op, o-doc, deep?, expected)
    ("insert", "i", {"_id": "x", "a": 1, "b": {"c": 2}}, False, ["_id", "a", "b"]),
    ("replacement update", "u", {"_id": "x", "a": 5, "z": 6}, False, ["_id", "a", "z"]),
    ("v1 set", "u", {"$v": 1, "$set": {"a": 10, "b": 20}}, False, ["a", "b"]),
    ("v1 set+unset", "u", {"$v": 1, "$set": {"a": 10}, "$unset": {"c": True}}, False,
     ["a", "c"]),
    ("v1 dotted keys", "u", {"$v": 1, "$set": {"meta.owner": "a", "meta.team": "b"}},
     False, ["meta.owner", "meta.team"]),
    ("v1 $v skipped", "u", {"$v": 1, "$set": {"x": 1}}, False, ["x"]),
    ("v2 shallow subtree keys", "u", {"$v": 2, "diff": {"u": {"a": 1, "b": 2}}},
     False, ["a", "b"]),
    ("v2 shallow s-field", "u", {"$v": 2, "diff": {"sfoo": {"a": True, "u2": "z"}}},
     False, ["foo"]),
    ("v2 shallow i+d+s", "u",
     {"$v": 2, "diff": {"i": {"n": 1}, "d": {"old": True}, "sm": {"u": {"k": 1}}}},
     False, ["n", "old", "m"]),
    ("v2 shallow a/o ignored", "u",
     {"$v": 2, "diff": {"a": True, "o2": {"x": 1}, "u": {"y": 1}}}, False, ["y"]),
    ("delete", "d", {"_id": "x"}, False, []),
    ("v2 deep via dispatcher", "u",
     {"$v": 2, "diff": {"sa": {"i": {"b": 3, "c": 1}}}}, True, ["a.b", "a.c"]),
]


@pytest.mark.parametrize(
    "name,op,doc,deep,want", SHALLOW_CASES, ids=[c[0] for c in SHALLOW_CASES]
)
def test_changed_fields_dispatcher(spark, name, op, doc, deep, want):
    df = spark.createDataFrame([(op, json.dumps(doc))], "op string, o string")
    got = df.select(changed_fields(F.col("op"), F.col("o"), deep=deep).alias("f")).first().f
    assert sorted(got) == sorted(want)


def test_replace_vs_modifier_classifier(spark):
    # oplogEntry_test.go:109-151 UpdateIsReplace table
    cases = [
        ({"a": 1}, True),
        ({"$set": {"a": 1}}, False),
        ({"$unset": {"a": 1}}, False),
        ({"$v": 2, "diff": {"u": {"a": 1}}}, False),   # v2 is never a replace
        ({"$v": 1, "a": 1}, True),                      # $v alone doesn't imply modifier
        ({"$v": 2, "a": 1}, True),                      # $v:2 without diff is not v2
    ]
    df = spark.createDataFrame(
        [(json.dumps(d), want) for d, want in cases], "o string, want boolean"
    )
    rows = df.select(
        "want",
        update_is_replace(F.col("o")).alias("got"),
        is_v2_update(F.col("o")).alias("v2"),
    ).collect()
    for r in rows:
        assert r.got == r.want
