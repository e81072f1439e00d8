"""Transaction flattening golden tests — mirror of
/root/reference/lib/oplog/tail_test.go:207-404 (4-op txn + nested txn with
TxIdx 0..3) and the acceptance transaction test
(integration-tests/acceptance/transaction_test.go:19-96)."""

import json

from pyspark.sql import functions as F

from oplogtoredis_spark.operators.transactions import flatten_transactions


def _raw(spark, rows):
    return spark.createDataFrame(
        rows, "seq long, ts long, wall timestamp, op string, ns string, o string, o2 string"
    )


def _txn_doc(ops):
    return json.dumps({"applyOps": ops})


def test_plain_ops_pass_through(spark):
    rows = [
        (0, 1 << 32, None, "i", "db.coll", json.dumps({"_id": "a", "x": 1}), None),
        (1, 2 << 32, None, "u", "db.coll", json.dumps({"$set": {"x": 2}}),
         json.dumps({"_id": "a"})),
    ]
    out = flatten_transactions(_raw(spark, rows)).orderBy("ts").collect()
    assert [r.op for r in out] == ["i", "u"]
    assert [r.tx_idx for r in out] == [0, 0]


def test_four_op_transaction_txidx(spark):
    # tail_test.go:280-393 — children inherit the txn ts; TxIdx 0..3
    children = [
        {"op": "i", "ns": "db.c1", "o": {"_id": "a", "v": 1}},
        {"op": "u", "ns": "db.c1", "o": {"$set": {"v": 2}}, "o2": {"_id": "a"}},
        {"op": "i", "ns": "db.c2", "o": {"_id": "b"}},
        {"op": "d", "ns": "db.c1", "o": {"_id": "a"}},
    ]
    rows = [(0, 7 << 32, None, "c", "admin.$cmd", _txn_doc(children), None)]
    out = flatten_transactions(_raw(spark, rows)).orderBy("tx_idx").collect()
    assert len(out) == 4
    assert [r.op for r in out] == ["i", "u", "i", "d"]
    assert [r.tx_idx for r in out] == [0, 1, 2, 3]
    assert all(r.ts == 7 << 32 for r in out)  # inherited
    assert json.loads(out[1].o) == {"$set": {"v": 2}}
    assert json.loads(out[1].o2) == {"_id": "a"}


def test_nested_transaction_depth_first(spark):
    # nested txn inside txn: [A, txn[b0, b1], C] → TxIdx A=0 b0=1 b1=2 C=3
    inner = {"op": "c", "ns": "admin.$cmd",
             "o": {"applyOps": [
                 {"op": "i", "ns": "db.c", "o": {"_id": "b0"}},
                 {"op": "i", "ns": "db.c", "o": {"_id": "b1"}},
             ]}}
    children = [
        {"op": "i", "ns": "db.c", "o": {"_id": "A"}},
        inner,
        {"op": "i", "ns": "db.c", "o": {"_id": "C"}},
    ]
    rows = [(0, 9 << 32, None, "c", "admin.$cmd", _txn_doc(children), None)]
    out = flatten_transactions(_raw(spark, rows)).orderBy("tx_idx").collect()
    ids = [json.loads(r.o)["_id"] for r in out]
    assert ids == ["A", "b0", "b1", "C"]
    assert [r.tx_idx for r in out] == [0, 1, 2, 3]
    assert all(r.ts == 9 << 32 for r in out)


def test_non_admin_command_not_flattened(spark):
    # tail.go:715-717: only admin.$cmd transactions expand; other commands
    # pass through untouched (and die at the op filter later)
    rows = [
        (0, 1 << 32, None, "c", "db.$cmd", _txn_doc([{"op": "i", "ns": "db.c", "o": {}}]), None),
        (1, 2 << 32, None, "c", "admin.$cmd", json.dumps({"drop": "coll"}), None),
    ]
    out = flatten_transactions(_raw(spark, rows)).collect()
    assert sorted(r.op for r in out) == ["c", "c"]


def test_mixed_stream(spark):
    rows = [
        (0, 1 << 32, None, "i", "db.c", json.dumps({"_id": "x"}), None),
        (1, 2 << 32, None, "c", "admin.$cmd",
         _txn_doc([{"op": "i", "ns": "db.c", "o": {"_id": "t0"}},
                   {"op": "d", "ns": "db.c", "o": {"_id": "t0"}}]), None),
        (2, 3 << 32, None, "c", "admin.$cmd", json.dumps({"other": 1}), None),
    ]
    out = flatten_transactions(_raw(spark, rows)).orderBy("ts", "tx_idx").collect()
    got = [(r.op, r.tx_idx, r.ts >> 32) for r in out]
    assert got == [("i", 0, 1), ("i", 0, 2), ("d", 1, 2), ("c", 0, 3)]


def test_depth3_nested_golden(spark):
    # depth-3: txn[ A, txn[ b0, txn[c0, c1], b2 ], D ] — depth-first order
    innermost = {"op": "c", "ns": "admin.$cmd",
                 "o": {"applyOps": [
                     {"op": "i", "ns": "db.c", "o": {"_id": "c0"}},
                     {"op": "i", "ns": "db.c", "o": {"_id": "c1"}},
                 ]}}
    inner = {"op": "c", "ns": "admin.$cmd",
             "o": {"applyOps": [
                 {"op": "i", "ns": "db.c", "o": {"_id": "b0"}},
                 innermost,
                 {"op": "i", "ns": "db.c", "o": {"_id": "b2"}},
             ]}}
    children = [
        {"op": "i", "ns": "db.c", "o": {"_id": "A"}},
        inner,
        {"op": "i", "ns": "db.c", "o": {"_id": "D"}},
    ]
    rows = [(0, 5 << 32, None, "c", "admin.$cmd", _txn_doc(children), None)]
    # data-driven default handles depth 3 without a caller-tuned bound
    out = flatten_transactions(_raw(spark, rows)).orderBy("tx_idx").collect()
    ids = [json.loads(r.o)["_id"] for r in out]
    assert ids == ["A", "b0", "c0", "c1", "b2", "D"]
    assert [r.tx_idx for r in out] == [0, 1, 2, 3, 4, 5]


def test_max_depth_1_single_level(spark):
    # explicit max_depth=1 must work (regression: F.greatest needs 2+ cols)
    children = [{"op": "i", "ns": "db.c", "o": {"_id": "a"}}]
    rows = [
        (0, 1 << 32, None, "c", "admin.$cmd", _txn_doc(children), None),
        (1, 2 << 32, None, "i", "db.c", json.dumps({"_id": "p"}), None),
    ]
    out = flatten_transactions(_raw(spark, rows), max_depth=1).orderBy("ts").collect()
    assert [(r.op, r.tx_idx) for r in out] == [("i", 0), ("i", 0)]


def test_residual_depth_raises_loudly(spark):
    # nesting deeper than an explicit bound must FAIL the job, not leak an
    # unexploded command row into the stream (SURVEY §7.3 fail-loud)
    import pytest
    from py4j.protocol import Py4JJavaError

    inner = {"op": "c", "ns": "admin.$cmd",
             "o": {"applyOps": [{"op": "i", "ns": "db.c", "o": {"_id": "x"}}]}}
    rows = [(0, 1 << 32, None, "c", "admin.$cmd", _txn_doc([inner]), None)]
    flat = flatten_transactions(_raw(spark, rows), max_depth=1)
    with pytest.raises(Exception) as exc:
        flat.collect()
    assert "nested deeper" in str(exc.value)


def test_probe_nesting_depth(spark):
    from oplogtoredis_spark.operators.transactions import probe_nesting_depth

    def raw(rows):
        return _raw(spark, rows)

    plain = [(0, 1, None, "i", "app.x", '{"_id":1}', None)]
    txn1 = [(1, 2, None, "c", "admin.$cmd",
             '{"applyOps":[{"op":"i","ns":"app.x","o":{"_id":2}}]}', None)]
    txn2 = [(2, 3, None, "c", "admin.$cmd",
             '{"applyOps":[{"op":"c","ns":"admin.$cmd","o":{"applyOps":'
             '[{"op":"i","ns":"app.x","o":{"_id":3}}]}}]}', None)]
    assert probe_nesting_depth(raw(plain)) == 0
    assert probe_nesting_depth(raw(plain + txn1)) == 1
    assert probe_nesting_depth(raw(plain + txn1 + txn2)) == 2
    # a non-admin command is NOT a transaction: depth 0 even with applyOps-
    # shaped o is allowed to overestimate only when op/ns match the gate
    other = [(3, 4, None, "c", "app.$cmd",
              '{"applyOps":[{"op":"i","ns":"app.x","o":{"_id":4}}]}', None)]
    assert probe_nesting_depth(raw(other)) == 0


def test_data_driven_flatten_runs_one_probe_job(spark):
    """max_depth=None must cost ONE probe job regardless of depth — the old
    per-level where(is_txn).limit(1).isEmpty() probe launched a job per
    level, each re-executing every explode built so far over the full input
    (VERDICT r2 #3)."""
    sc = spark.sparkContext
    rows = [
        (0, 1, None, "i", "app.x", '{"_id":1}', None),
        (1, 2, None, "c", "admin.$cmd",
         '{"applyOps":[{"op":"c","ns":"admin.$cmd","o":{"applyOps":'
         '[{"op":"i","ns":"app.x","o":{"_id":3}}]}},'
         '{"op":"u","ns":"app.x","o":{"_id":4}}]}', None),
    ]
    # AQE materializes the single probe aggregate as 2 jobs (one per stage);
    # the pinned property is that the count is CONSTANT in nesting depth —
    # one scan pass whether the log is flat or depth-2 — where the old code
    # added a probe job (re-running all prior explodes) per extra level.
    counts = {}
    for label, data in (("depth2", rows), ("depth0", rows[:1])):
        sc.setJobGroup(f"probe_{label}", "flatten construction probes")
        df = flatten_transactions(_raw(spark, data))  # plan build runs the probe
        counts[label] = len(sc.statusTracker().getJobIdsForGroup(f"probe_{label}"))
        sc.setJobGroup(None, None)
        # and the flatten itself is still correct
        got = df.orderBy("ts", "tx_idx").select("op", "tx_idx").collect()
        if len(data) == 2:
            assert [(r.op, r.tx_idx) for r in got] == [
                ("i", 0), ("i", 0), ("u", 1)]
    assert counts["depth2"] == counts["depth0"] <= 2, counts
