"""S4 envelope projection from raw JSON entries."""

import json

from oplogtoredis_spark.sources.envelope import parse_raw_envelope
from oplogtoredis_spark.timestamps import encode_ts


def test_envelope_fields(spark):
    rows = [
        (0, json.dumps({
            "ts": {"t": 1700000000, "i": 3},
            "wall": "2024-01-01T00:00:00",
            "op": "i",
            "ns": "db.coll",
            "o": {"_id": "x", "a": 1},
        })),
        (1, json.dumps({
            "ts": {"t": 1700000001, "i": 0},
            "op": "u",
            "ns": "db.coll",
            "o": {"$set": {"a": 2}},
            "o2": {"_id": "x"},
        })),
    ]
    df = spark.createDataFrame(rows, "seq long, raw string")
    out = {r.seq: r for r in parse_raw_envelope(df).collect()}
    assert out[0].ts == encode_ts(1700000000, 3)
    assert out[0].op == "i" and out[0].ns == "db.coll"
    assert json.loads(out[0].o) == {"_id": "x", "a": 1}
    assert out[0].o2 is None
    assert json.loads(out[1].o2) == {"_id": "x"}


def test_envelope_malformed_rows_survive(spark):
    df = spark.createDataFrame([(0, "{not json"), (1, "[]")], "seq long, raw string")
    out = parse_raw_envelope(df).collect()
    # unparseable → null op (dropped later by the op filter), batch survives
    assert len(out) == 2
    assert all(r.op is None for r in out)
