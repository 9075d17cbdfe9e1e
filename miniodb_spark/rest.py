"""REST transport: the reference's HTTP route table over the facade.

Parity target: /root/reference/internal/transport/rest/server.go
(route registration at :477-521). Same paths, same `/v1` prefix, same
auth model (Bearer access token on secured routes when auth is
configured; `/v1/health` and `/v1/auth/*` open). Implemented on the
stdlib ``http.server`` — no framework dependency — so a reference REST
client can point at this engine and run its calls unchanged.

| Method+path                          | facade call        |
|--------------------------------------|--------------------|
| POST   /v1/auth/token                | get_token          |
| POST   /v1/auth/refresh              | refresh_token      |
| DELETE /v1/auth/token                | revoke_token       |
| GET    /v1/health                    | health_check       |
| POST   /v1/data                      | write_data         |
| POST   /v1/query                     | query_data         |
| PUT    /v1/data                      | update_data        |
| DELETE /v1/data                      | delete_data        |
| POST   /v1/data/cleanup-empty-ids    | cleanup RPC        |
| POST   /v1/stream/write              | stream_write       |
| POST   /v1/stream/query              | stream_query       |
| POST   /v1/tables                    | create_table       |
| POST   /v1/tables/{name}/optimize    | optimize_table     |
| GET    /v1/tables                    | list_tables        |
| GET    /v1/tables/{name}             | get_table          |
| GET    /v1/tables/{name}/records/{id}| get_record (zone-map lookup) |
| DELETE /v1/tables/{name}             | delete_table       |
| POST   /v1/metadata/backup           | backup_metadata    |
| POST   /v1/metadata/restore          | restore_metadata   |
| POST   /v1/backup/data               | backup_data        |
| POST   /v1/backup/data/restore       | restore_data       |
| GET    /v1/backup/data               | list_data_backups  |
| GET    /v1/metadata/backups          | list_backups       |
| GET    /v1/metadata/status           | get_metadata_status|
| GET    /v1/status                    | get_status         |
| GET    /v1/metrics                   | get_metrics        |
| GET    /v1/audit                     | audit trail        |
| GET    /v1/dashboard/cluster         | dashboard cluster  |
| GET    /v1/dashboard/tables          | dashboard tables   |
| GET    /v1/dashboard/overview        | dashboard monitor  |
| GET    /v1/dashboard/slow-queries    | slow-query log     |
| GET    /metrics                      | Prometheus text    |

(The reference's swagger/pprof debug groups are intentionally omitted.)
"""

from __future__ import annotations

import json
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from .auth import AuthError
from .ratelimit import RateLimitExceeded


class RestServer:
    """Blocking-queue-free HTTP wrapper; one engine/facade per server.
    Start with :meth:`serve_background` in tests; real deployments can
    front it however they like — the route contract is the point."""

    def __init__(self, service, host: str = "127.0.0.1", port: int = 0,
                 static_dir: str | None = None):
        self.service = service
        handler = _make_handler(service, static_dir=static_dir)
        self.httpd = ThreadingHTTPServer((host, port), handler)
        self._thread: threading.Thread | None = None

    @property
    def port(self) -> int:
        return self.httpd.server_address[1]

    def serve_background(self) -> "RestServer":
        self._thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        self._thread.start()
        return self

    def shutdown(self) -> None:
        self.httpd.shutdown()
        self.httpd.server_close()


# (method, path-regex) -> (handler-name, open_route)
def _routes():
    return [
        ("POST", r"^/v1/auth/token$", "auth_get_token", True),
        ("POST", r"^/v1/auth/refresh$", "auth_refresh", True),
        ("DELETE", r"^/v1/auth/token$", "auth_revoke", True),
        ("GET", r"^/v1/health$", "health", True),
        ("POST", r"^/v1/data$", "write_data", False),
        ("POST", r"^/v1/query$", "query_data", False),
        ("PUT", r"^/v1/data$", "update_data", False),
        ("DELETE", r"^/v1/data$", "delete_data", False),
        ("POST", r"^/v1/data/cleanup-empty-ids$", "cleanup_empty_ids", False),
        ("POST", r"^/v1/data/merge$", "merge_data", False),
        ("POST", r"^/v1/stream/write$", "stream_write", False),
        ("POST", r"^/v1/stream/query$", "stream_query", False),
        ("POST", r"^/v1/tables$", "create_table", False),
        ("POST", r"^/v1/tables/(?P<name>[^/]+)/optimize$", "optimize_table",
         False),
        ("GET", r"^/v1/tables$", "list_tables", False),
        ("GET", r"^/v1/tables/(?P<name>[^/]+)/records/(?P<rid>[^/]+)$",
         "get_record", False),
        ("GET", r"^/v1/tables/(?P<name>[^/]+)$", "get_table", False),
        ("DELETE", r"^/v1/tables/(?P<name>[^/]+)$", "delete_table", False),
        ("POST", r"^/v1/metadata/backup$", "backup_metadata", False),
        ("POST", r"^/v1/metadata/restore$", "restore_metadata", False),
        ("POST", r"^/v1/backup/data$", "backup_data", False),
        ("POST", r"^/v1/backup/data/restore$", "restore_data", False),
        ("GET", r"^/v1/backup/data$", "list_data_backups", False),
        ("GET", r"^/v1/metadata/backups$", "list_backups", False),
        ("GET", r"^/v1/metadata/status$", "metadata_status", False),
        ("GET", r"^/v1/status$", "status", False),
        ("GET", r"^/v1/metrics$", "metrics", False),
        ("GET", r"^/v1/audit$", "audit", False),
        ("GET", r"^/v1/dashboard/cluster$", "dash_cluster", False),
        ("GET", r"^/v1/dashboard/tables$", "dash_tables", False),
        ("GET", r"^/v1/dashboard/overview$", "dash_overview", False),
        ("GET", r"^/v1/dashboard/slow-queries$", "dash_slow", False),
        ("GET", r"^/metrics$", "metrics_text", False),
        # static dashboard UI (reference serves its embedded dashboard-ui
        # from internal/dashboard/server.go; we serve a user-provided
        # directory — the UI assets themselves are not part of this repo).
        # Open route like the reference's static handler: the login page
        # must load before the client holds a bearer token; the data it
        # talks to (/v1/dashboard/*) stays auth-gated.
        ("GET", r"^/dashboard(?:/(?P<path>.*))?$", "dash_static", True),
    ]


_STATIC_TYPES = {
    ".html": "text/html", ".js": "text/javascript", ".css": "text/css",
    ".json": "application/json", ".svg": "image/svg+xml",
    ".png": "image/png", ".ico": "image/x-icon", ".map": "application/json",
    ".woff2": "font/woff2",
}


def _make_handler(service, static_dir: str | None = None):
    routes = [(m, re.compile(p), h, open_) for m, p, h, open_ in _routes()]

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # tests don't want stderr chatter
            pass

        # -- plumbing ---------------------------------------------------

        def _body(self) -> dict:
            n = int(self.headers.get("Content-Length") or 0)
            if not n:
                return {}
            try:
                return json.loads(self.rfile.read(n) or b"{}")
            except json.JSONDecodeError:
                return {}

        def _send(self, code: int, payload, content_type="application/json") -> None:
            data = (
                payload.encode() if isinstance(payload, str)
                else json.dumps(payload).encode()
            )
            self.send_response(code)
            self.send_header("Content-Type", content_type)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def _bearer(self) -> str | None:
            h = self.headers.get("Authorization") or ""
            return h[7:] if h.startswith("Bearer ") else None

        def _dispatch(self, method: str) -> None:
            parsed = urlparse(self.path)
            for m, rx, name, open_route in routes:
                if m != method:
                    continue
                match = rx.match(parsed.path)
                if not match:
                    continue
                try:
                    # rate/limit identity: the token subject when auth is
                    # on (one noisy api key must not 429 the others —
                    # reference keys its limiter per client the same way),
                    # else the peer address
                    self.client_id = self.client_address[0]
                    if not open_route and service.auth is not None:
                        tok = self._bearer()
                        if not tok:
                            return self._send(401, {"error": "missing bearer token"})
                        claims = service.auth.validate(tok)
                        self.client_id = claims.get("sub") or self.client_id
                    q = {k: v[0] for k, v in parse_qs(parsed.query).items()}
                    return getattr(self, f"r_{name}")(match.groupdict(), q)
                except AuthError as exc:
                    return self._send(401, {"error": str(exc)})
                except RateLimitExceeded as exc:
                    self.send_response(429)
                    self.send_header("Retry-After", f"{exc.retry_after_s:.2f}")
                    body = json.dumps({"error": str(exc)}).encode()
                    self.send_header("Content-Type", "application/json")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                    return
                except (ValueError, KeyError, TypeError) as exc:
                    # client-shaped errors: SQLGateError is a ValueError,
                    # bad params are Type/KeyErrors
                    return self._send(400, {"error": str(exc)[:500]})
                except Exception as exc:
                    # anything else is a server-side failure, not the
                    # caller's fault
                    return self._send(500, {"error": str(exc)[:500]})
            self._send(404, {"error": f"no route {method} {parsed.path}"})

        def do_GET(self):  # noqa: N802
            self._dispatch("GET")

        def do_POST(self):  # noqa: N802
            self._dispatch("POST")

        def do_PUT(self):  # noqa: N802
            self._dispatch("PUT")

        def do_DELETE(self):  # noqa: N802
            self._dispatch("DELETE")

        # -- routes -----------------------------------------------------

        def r_auth_get_token(self, pv, q):
            b = self._body()
            self._send(200, service.get_token(b.get("api_key", ""), b.get("secret", "")))

        def r_auth_refresh(self, pv, q):
            self._send(200, service.refresh_token(self._body().get("refresh_token", "")))

        def r_auth_revoke(self, pv, q):
            tok = self._body().get("token") or self._bearer() or ""
            self._send(200, service.revoke_token(tok))

        def r_health(self, pv, q):
            self._send(200, service.health_check())

        def r_write_data(self, pv, q):
            b = self._body()
            self._send(200, service.write_data(b.get("table", ""), b.get("record", b),
                                               client_id=self.client_id))

        def r_query_data(self, pv, q):
            b = self._body()
            out = service.query_data(
                b.get("sql", ""), limit=b.get("limit"),
                default_table=b.get("table"), client_id=self.client_id,
            )
            self._send(200, out)

        def r_update_data(self, pv, q):
            b = self._body()
            self._send(200, service.update_data(
                b.get("table", ""), b.get("id", ""), b.get("payload", {}),
                timestamp_us=b.get("timestamp"), client_id=self.client_id,
            ))

        def r_delete_data(self, pv, q):
            b = self._body()
            self._send(200, service.delete_data(b.get("table", ""), b.get("id", ""),
                                                client_id=self.client_id))

        def r_cleanup_empty_ids(self, pv, q):
            b = self._body()
            n = service.engine.cleanup_empty_id_records(b.get("table", ""))
            self._send(200, {"success": True, "cleaned": n})

        def r_merge_data(self, pv, q):
            b = self._body()
            self._send(200, service.merge_data(
                b.get("table", ""), b.get("records", []),
                key_col=b.get("key_col", "id"), client_id=self.client_id))

        def r_stream_write(self, pv, q):
            b = self._body()
            self._send(200, service.stream_write(b.get("table", ""), b.get("records", []),
                                                 client_id=self.client_id))

        def r_stream_query(self, pv, q):
            b = self._body()
            self._send(200, service.stream_query(
                b.get("sql", ""), batch_size=b.get("batch_size", 100),
                cursor=b.get("cursor", 0), client_id=self.client_id,
            ))

        def r_create_table(self, pv, q):
            b = self._body()
            self._send(200, service.create_table(
                b.get("name", ""), b.get("config"),
                if_not_exists=b.get("if_not_exists", False)))

        def r_optimize_table(self, pv, q):
            b = self._body()
            self._send(200, service.optimize_table(
                pv["name"], zorder_by=b.get("zorder_by"),
                client_id=self.client_id))

        def r_list_tables(self, pv, q):
            self._send(200, service.list_tables())

        def r_get_record(self, pv, q):
            # zone-map point lookup (GetRecord fast path): opens only
            # the files whose min/max bracket admits the id
            self._send(200, service.get_record(
                pv["name"], pv["rid"], client_id=self.client_id))

        def r_get_table(self, pv, q):
            self._send(200, service.get_table(pv["name"]))

        def r_delete_table(self, pv, q):
            self._send(200, service.delete_table(pv["name"]))

        def r_backup_metadata(self, pv, q):
            self._send(200, service.backup_metadata())

        def r_restore_metadata(self, pv, q):
            b = self._body()
            self._send(200, service.restore_metadata(
                metadata=b.get("metadata"), object_name=b.get("object_name"),
            ))

        def r_backup_data(self, pv, q):
            self._send(200, service.backup_data(self._body().get("tables")))

        def r_restore_data(self, pv, q):
            b = self._body()
            self._send(200, service.restore_data(
                b.get("object_name", ""), tables=b.get("tables"),
            ))

        def r_list_data_backups(self, pv, q):
            self._send(200, service.list_data_backups())

        def r_list_backups(self, pv, q):
            self._send(200, service.list_backups(days=int(q.get("days", 30))))

        def r_metadata_status(self, pv, q):
            self._send(200, service.get_metadata_status())

        def r_status(self, pv, q):
            self._send(200, service.get_status())

        def r_metrics(self, pv, q):
            self._send(200, service.get_metrics())

        def r_metrics_text(self, pv, q):
            self._send(200, service.get_metrics_text(),
                       content_type="text/plain; version=0.0.4")

        def r_audit(self, pv, q):
            """GET /v1/audit?table=&action=&user_id=&limit= — the audit
            trail surface (reference internal/audit/audit.go entries)."""
            if service.audit is None:
                return self._send(200, {"enabled": False, "entries": []})
            entries = service.audit.read(
                table=q.get("table"), action=q.get("action"),
                user_id=q.get("user_id"), limit=int(q.get("limit", 100)),
            )
            self._send(200, {"enabled": True, "entries": entries,
                             "total": len(entries)})

        # read-only dashboard family (reference internal/dashboard/)

        def r_dash_cluster(self, pv, q):
            self._send(200, service.dashboard_cluster())

        def r_dash_tables(self, pv, q):
            self._send(200, service.dashboard_tables())

        def r_dash_overview(self, pv, q):
            self._send(200, service.dashboard_overview())

        def r_dash_slow(self, pv, q):
            self._send(200, service.dashboard_slow_queries(
                limit=int(q.get("limit", 20))))

        def r_dash_static(self, pv, q):
            """Static dashboard assets (reference
            internal/dashboard/server.go serves the embedded
            dashboard-ui the same way). Traversal-safe: the resolved
            path must stay inside static_dir."""
            import os as _os

            if static_dir is None:
                return self._send(404, {"error": "no dashboard UI configured"})
            rel = (pv.get("path") or "").strip("/") or "index.html"
            base = _os.path.realpath(static_dir)
            full = _os.path.realpath(_os.path.join(base, rel))
            if full != base and not full.startswith(base + _os.sep):
                return self._send(404, {"error": "not found"})
            if _os.path.isdir(full):
                full = _os.path.join(full, "index.html")
            if not _os.path.isfile(full):
                return self._send(404, {"error": "not found"})
            ctype = _STATIC_TYPES.get(
                _os.path.splitext(full)[1].lower(), "application/octet-stream")
            with open(full, "rb") as f:
                data = f.read()
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

    return Handler
