"""HTTP control-plane transport tests — no Spark needed (transport only;
semantics are tested where they live: runner.health in test_streaming,
DenylistStore in test_denylist, histograms in test_lake/test_entry).

Mirrors the reference's surfaces: /healthz (main.go:301-345), /metrics
Prometheus exposition (main.go:346-359), denylist CRUD with member URLs
and 201/404/409 statuses (lib/denylist/http.go:22-144,
denylist_endpoint_test.go).
"""

import json
import urllib.error
import urllib.request

import pytest

from oplogtoredis_spark.operators.denylist import DenylistStore
from oplogtoredis_spark.streaming.http import ControlPlaneServer, render_metrics

LINEAGE = [
    {"batch_id": 0, "events_in": 100, "applied": 90, "dedup_hits": 8,
     "deletes": 2, "unprocessable_in": 1, "lag_secs": 3.0,
     "entry_size_hist": {"8": 60, "16": 30, "512": 10}},
    {"batch_id": 1, "skipped_replay": True},
    {"batch_id": 1, "events_in": 50, "applied": 50, "dedup_hits": 0,
     "deletes": 0, "unprocessable_in": 0, "lag_secs": 70.0,
     "entry_size_hist": {"16": 50}},
]


@pytest.fixture()
def server(tmp_path):
    store = DenylistStore(str(tmp_path / "denylist.json"))
    store.add("denied_org/repo0")
    state = {"healthy": True}
    srv = ControlPlaneServer(
        health_fn=lambda: dict(state, active=True),
        denylist=store,
        lineage_fn=lambda: LINEAGE,
    )
    port = srv.start()
    yield f"http://127.0.0.1:{port}", state, store
    srv.stop()


def _req(url, method="GET"):
    req = urllib.request.Request(url, method=method)
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, r.read().decode()
    except urllib.error.HTTPError as e:
        return e.code, e.read().decode()


def test_healthz_statuses(server):
    base, state, _ = server
    code, body = _req(base + "/healthz")
    assert code == 200 and json.loads(body)["healthy"] is True
    state["healthy"] = False
    code, body = _req(base + "/healthz")
    assert code == 503 and json.loads(body)["healthy"] is False


def test_denylist_crud_roundtrip(server):
    base, _, store = server
    code, body = _req(base + "/denylist")
    assert code == 200 and json.loads(body) == ["denied_org/repo0"]
    # member GET: present / absent
    assert _req(base + "/denylist/denied_org%2Frepo0")[0] == 200
    assert _req(base + "/denylist/nope")[0] == 404
    # PUT: 201 then 409 (reference create/conflict statuses)
    assert _req(base + "/denylist/org%2Fnew", "PUT")[0] == 201
    assert _req(base + "/denylist/org%2Fnew", "PUT")[0] == 409
    assert "org/new" in store.list()  # URL-escaped member decoded
    # DELETE: 200 then 404
    assert _req(base + "/denylist/org%2Fnew", "DELETE")[0] == 200
    assert _req(base + "/denylist/org%2Fnew", "DELETE")[0] == 404
    assert "org/new" not in store.list()


def test_metrics_prometheus_exposition(server):
    base, _, _ = server
    code, text = _req(base + "/metrics")
    assert code == 200
    m = dict(
        line.rsplit(" ", 1)
        for line in text.splitlines()
        if line and not line.startswith("#")
    )
    assert m["otr_entries_received_total"] == "150"
    assert m["otr_entries_applied_total"] == "140"
    assert m["otr_unprocessable_total"] == "1"
    assert m["otr_batches_replay_skipped_total"] == "1"
    # cumulative histogram: le=8 -> 60, le=16 -> 60+80, +Inf -> all 150
    assert m['otr_entry_size_bytes_bucket{le="8"}'] == "60"
    assert m['otr_entry_size_bytes_bucket{le="16"}'] == "140"
    assert m['otr_entry_size_bytes_bucket{le="+Inf"}'] == "150"
    assert m["otr_entry_size_bytes_count"] == "150"
    # resume-gap buckets: 3 s -> le=4; 70 s -> le=128
    assert m['otr_resume_gap_seconds_bucket{le="4"}'] == "1"
    assert m['otr_resume_gap_seconds_bucket{le="128"}'] == "2"


def test_render_metrics_empty_lineage():
    text = render_metrics([])
    assert "otr_entries_received_total 0" in text
    assert 'otr_entry_size_bytes_bucket{le="+Inf"} 0' in text


class _FakeQuery:
    """Duck-typed StreamingQuery: just what runner.health reads."""

    isActive = True
    status = {"message": "ok"}
    lastProgress = {"batchId": 7, "numInputRows": 123}

    def exception(self):
        return None


def test_serve_control_plane_wires_health_and_denylist(tmp_path):
    from oplogtoredis_spark.streaming.runner import serve_control_plane

    store = DenylistStore(str(tmp_path / "dl.json"))
    srv, port = serve_control_plane(_FakeQuery(), denylist=store)
    try:
        base = f"http://127.0.0.1:{port}"
        code, body = _req(base + "/healthz")
        assert code == 200
        h = json.loads(body)
        assert h["healthy"] is True and h["batch_id"] == 7
        assert _req(base + "/denylist/x", "PUT")[0] == 201
        assert store.list() == ["x"]
    finally:
        srv.stop()
