"""End-to-end publication pipeline (processOplogEntry golden path):
namespace split -> typed doc id -> changed fields -> wire message ->
channel fan-out -> pkey/shard, with unsupported ids dead-lettered."""

import json

from oplogtoredis_spark.operators.publications import derive_publications


def _raw(spark, rows):
    return spark.createDataFrame(rows, "op string, ns string, o string, o2 string")


def test_publication_golden_insert(spark):
    rows = [("i", "foo.bar", '{"_id": "doc1", "x": 1}', None)]
    pubs, dead = derive_publications(_raw(spark, rows))
    got = sorted(pubs.collect(), key=lambda r: r.channel)
    assert dead.count() == 0
    assert [r.channel for r in got] == ["foo.bar", "foo.bar::doc1"]
    m = json.loads(got[0].msg)
    assert m == {"e": "i", "d": {"_id": "doc1"}, "f": ["_id", "x"]}
    # pkey = sha256-LE("foo") — the reference's own golden value
    # (lib/oplog/processor_test.go:18-19)
    assert got[0].pkey == -5843589418109203719
    assert got[0].shard == ((-5843589418109203719 % 8) + 8) % 8


def test_publication_update_reads_o2_and_renames_delete(spark):
    rows = [
        ("u", "db.c", '{"$v":1,"$set":{"a":1},"$unset":{"b":true}}', '{"_id": "k"}'),
        ("d", "db.c", '{"_id": "k"}', None),
    ]
    pubs, dead = derive_publications(_raw(spark, rows))
    assert dead.count() == 0
    msgs = {(r.op, r.channel): json.loads(r.msg) for r in pubs.collect()}
    assert msgs[("u", "db.c::k")] == {"e": "u", "d": {"_id": "k"}, "f": ["a", "b"]}
    assert msgs[("d", "db.c::k")] == {"e": "r", "d": {"_id": "k"}, "f": []}


def test_publication_oid_and_dead_letter(spark):
    hex24 = "507f1f77bcf86cd799439011"
    rows = [
        ("i", "db.c", '{"_id": {"$oid": "%s"}}' % hex24, None),
        ("i", "db.c", '{"_id": 42}', None),  # unsupported → dead letter
    ]
    pubs, dead = derive_publications(_raw(spark, rows))
    got = pubs.collect()
    assert len(got) == 2  # one event × two channels
    m = json.loads(got[0].msg)
    assert m["d"]["_id"] == {"$type": "oid", "$value": hex24}
    d = dead.collect()
    assert len(d) == 1 and d[0].dl_reason == "unsupported_doc_id_type"


def test_publication_plan_is_shuffle_free(spark):
    rows = [("i", "db.c", '{"_id": "a"}', None)]
    pubs, _ = derive_publications(_raw(spark, rows))
    plan = pubs._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure map: runs in the scan stage
