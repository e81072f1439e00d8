"""HTTP control-plane transports — the reference's wire surface.

The reference serves three HTTP surfaces next to the tailer: a /healthz
liveness endpoint (/root/reference/main.go:301-345), a Prometheus /metrics
endpoint (/root/reference/main.go:346-359 + the histogram/counter
definitions in lib/oplog/tail.go:71-137 and lib/redispub/publisher.go:
64-114), and a denylist CRUD API (/root/reference/lib/denylist/http.go:
22-144: GET collection, GET/PUT/DELETE member with URL-escaped ids,
201/404/409 statuses).

The engine's SEMANTICS for all three already live elsewhere (runner.health,
functions/histograms.lineage_histograms, operators/denylist.DenylistStore);
this module is transport only, so it binds those callables to routes with
nothing but the standard library — no web framework, no Spark dependency,
usable next to any driver process. Metrics are rendered in the Prometheus
text exposition format (counter + cumulative histogram with ``le`` labels)
so the reference's dashboards read this engine unchanged.
"""

from __future__ import annotations

import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable

from ..functions.histograms import EXP_BUCKETS, GAP_BUCKETS_SECS


def render_metrics(lineage: list[dict]) -> str:
    """Prometheus text exposition of the engine's lineage-backed metrics:
    received/applied/dedup/deletes/unprocessable counters plus the three
    reference histograms (entry size, batch size, resume gap) as cumulative
    ``_bucket{le=...}`` series. Driver-side over O(batches) records."""
    from ..functions.histograms import lineage_histograms

    applied = [r for r in lineage if not r.get("skipped_replay")]
    counters = {
        "otr_entries_received_total": sum(r.get("events_in") or 0 for r in applied),
        "otr_entries_applied_total": sum(r.get("applied") or 0 for r in applied),
        "otr_dedup_hits_total": sum(r.get("dedup_hits") or 0 for r in applied),
        "otr_deletes_total": sum(r.get("deletes") or 0 for r in applied),
        "otr_unprocessable_total": sum(
            r.get("unprocessable_in") or 0 for r in applied
        ),
        "otr_batches_applied_total": len(applied),
        "otr_batches_replay_skipped_total": sum(
            1 for r in lineage if r.get("skipped_replay")
        ),
    }
    hists = lineage_histograms(lineage)
    out: list[str] = []
    for name, v in counters.items():
        out.append(f"# TYPE {name} counter")
        out.append(f"{name} {v}")

    def emit_hist(name: str, data: dict[str, int], bounds: tuple) -> None:
        out.append(f"# TYPE {name} histogram")
        cum = 0
        for le in bounds:
            cum += data.get(str(le), 0)
            out.append(f'{name}_bucket{{le="{le}"}} {cum}')
        cum += data.get("inf", 0)
        out.append(f'{name}_bucket{{le="+Inf"}} {cum}')
        out.append(f"{name}_count {cum}")

    emit_hist("otr_entry_size_bytes", hists["entry_size"], EXP_BUCKETS)
    emit_hist("otr_batch_size_entries", hists["batch_size"], EXP_BUCKETS)
    emit_hist("otr_resume_gap_seconds", hists["resume_gap_secs"], GAP_BUCKETS_SECS)
    return "\n".join(out) + "\n"


class ControlPlaneServer:
    """Threaded HTTP server binding the engine's control-plane callables.

    ``health_fn``  -> dict (runner.health over the live StreamingQuery);
    ``denylist``   -> operators.denylist.DenylistStore (or None to disable);
    ``lineage_fn`` -> list[dict] (LakeTable.lineage, or None to disable
    /metrics). Start with ``start()`` (ephemeral port unless given), stop
    with ``stop()``. Routes and statuses mirror the reference:

      GET    /healthz            200 healthy / 503 unhealthy, JSON body
      GET    /metrics            200 Prometheus text
      GET    /denylist           200 JSON array
      GET    /denylist/<id>      200 / 404
      PUT    /denylist/<id>      201 created / 409 already present
      DELETE /denylist/<id>      200 / 404
    """

    def __init__(
        self,
        health_fn: Callable[[], dict] | None = None,
        denylist=None,
        lineage_fn: Callable[[], list[dict]] | None = None,
        host: str = "127.0.0.1",
        port: int = 0,
    ):
        self._health_fn = health_fn
        self._denylist = denylist
        self._lineage_fn = lineage_fn
        self._host, self._port = host, port
        self._httpd: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    # ---- lifecycle ----
    def start(self) -> int:
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet: the engine logs via lineage
                pass

            def _send(self, code: int, body: str, ctype: str = "application/json"):
                data = body.encode()
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def _member(self) -> str | None:
                # /denylist/<url-escaped id> (reference http.go member URLs)
                parts = self.path.split("/", 2)
                return urllib.parse.unquote(parts[2]) if len(parts) == 3 else None

            def do_GET(self):
                if self.path == "/healthz" and outer._health_fn is not None:
                    h = outer._health_fn()
                    self._send(200 if h.get("healthy") else 503, json.dumps(h))
                elif self.path == "/metrics" and outer._lineage_fn is not None:
                    self._send(
                        200, render_metrics(outer._lineage_fn()), "text/plain"
                    )
                elif self.path == "/denylist" and outer._denylist is not None:
                    self._send(200, json.dumps(outer._denylist.list()))
                elif self.path.startswith("/denylist/") and outer._denylist:
                    m = self._member()
                    if m in set(outer._denylist.list()):
                        self._send(200, json.dumps(m))
                    else:
                        self._send(404, "{}")
                else:
                    self._send(404, "{}")

            def do_PUT(self):
                m = self._member() if self.path.startswith("/denylist/") else None
                if m is None or outer._denylist is None:
                    return self._send(404, "{}")
                created = outer._denylist.add(m)
                # reference PUT semantics: 201 on create, 409 if present
                self._send(201 if created else 409, json.dumps(m))

            def do_DELETE(self):
                m = self._member() if self.path.startswith("/denylist/") else None
                if m is None or outer._denylist is None:
                    return self._send(404, "{}")
                self._send(200 if outer._denylist.remove(m) else 404, "{}")

        self._httpd = ThreadingHTTPServer((self._host, self._port), Handler)
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self._httpd.server_address[1]

    def stop(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None
