"""gRPC transport: the reference's RPC surface over the facade.

Parity target: /root/reference/api/proto/miniodb/v1/miniodb.proto:12-46
— ``miniodb.v1.MinIODBService`` (17 RPCs: WriteData, QueryData,
UpdateData, DeleteData, client-streaming StreamWrite, server-streaming
StreamQuery, CreateTable, ListTables, GetTable, DeleteTable,
BackupMetadata, RestoreMetadata, ListBackups, GetMetadataStatus,
HealthCheck, GetStatus, GetMetrics)
plus ``miniodb.v1.AuthService`` (GetToken, RefreshToken, RevokeToken) —
bound to the same :class:`miniodb_spark.api.MiniODBService` facade that
``rest.py`` serves, with the same auth model (Bearer access token in
the ``authorization`` metadata key; health + auth RPCs open) and the
same status mapping (AuthError → UNAUTHENTICATED, RateLimitExceeded →
RESOURCE_EXHAUSTED, client-shaped errors → INVALID_ARGUMENT, the rest
→ INTERNAL).

``grpcio`` is an **optional** dependency: importing this module never
requires it; constructing :class:`GrpcServer` raises a clear
ImportError when it is absent, and ``tests/test_grpc.py``'s wire tests
skip. The default codec is **protobuf** via the hand-rolled pure-python
wire codec in :mod:`miniodb_spark.protowire` — a stock reference client
built from ``miniodb.proto`` sends/receives the exact binary message
shapes (full method paths match the proto service/method names —
``/miniodb.v1.MinIODBService/WriteData``). ``codec="json"`` keeps the
pre-round-7 JSON framing for hand-rolled clients; both ride the same
method table and the same facade. :func:`dispatch_proto` is the whole
decode→facade→encode pipeline factored out of the grpc handler so the
codec and translators are fully testable without grpcio.

RPC shapes match the proto exactly: 18 unary methods, StreamWrite as
client-streaming (drain request messages, one aggregate response) and
StreamQuery as server-streaming (one page per response message,
cursor-advanced until exhausted) — so a stock protoc-generated client's
streaming stubs bind to matching handler types.
"""

from __future__ import annotations

import json
import time
from typing import Any, Callable

from . import protowire
from .auth import AuthError
from .ratelimit import RateLimitExceeded

# full-method-name suffix -> (facade method, open_route, adapter)
# adapters map the request dict onto facade call args, mirroring rest.py


def _method_table(service) -> dict[str, tuple[Callable[[dict, str], Any], bool]]:
    """method name -> (handler(request_dict, client_id) -> response dict,
    open_route). One entry per proto RPC."""

    def data_svc(name: str, fn: Callable[[dict, str], Any], open_route=False):
        return (name, (fn, open_route))

    return dict(
        [
            data_svc(
                "miniodb.v1.MinIODBService/WriteData",
                lambda b, cid: service.write_data(
                    b.get("table", ""), b.get("record", b), client_id=cid
                ),
            ),
            data_svc(
                "miniodb.v1.MinIODBService/QueryData",
                lambda b, cid: service.query_data(
                    b.get("sql", ""), limit=b.get("limit"),
                    default_table=b.get("table"), client_id=cid,
                ),
            ),
            data_svc(
                "miniodb.v1.MinIODBService/UpdateData",
                lambda b, cid: service.update_data(
                    b.get("table", ""), b.get("id", ""), b.get("payload", {}),
                    timestamp_us=b.get("timestamp"), client_id=cid,
                ),
            ),
            data_svc(
                "miniodb.v1.MinIODBService/DeleteData",
                lambda b, cid: service.delete_data(
                    b.get("table", ""), b.get("id", ""), client_id=cid
                ),
            ),
            data_svc(
                "miniodb.v1.MinIODBService/StreamWrite",
                lambda b, cid: service.stream_write(
                    b.get("table", ""), b.get("records", []), client_id=cid
                ),
            ),
            data_svc(
                "miniodb.v1.MinIODBService/StreamQuery",
                lambda b, cid: service.stream_query(
                    b.get("sql", ""), batch_size=b.get("batch_size", 100),
                    cursor=b.get("cursor", 0), client_id=cid,
                ),
            ),
            data_svc(
                "miniodb.v1.MinIODBService/CreateTable",
                lambda b, cid: service.create_table(
                    b.get("name", ""), b.get("config"),
                    if_not_exists=b.get("if_not_exists", False),
                ),
            ),
            data_svc(
                "miniodb.v1.MinIODBService/ListTables",
                lambda b, cid: service.list_tables(),
            ),
            data_svc(
                "miniodb.v1.MinIODBService/GetTable",
                lambda b, cid: service.get_table(b.get("name", "")),
            ),
            data_svc(
                "miniodb.v1.MinIODBService/DeleteTable",
                lambda b, cid: service.delete_table(b.get("name", "")),
            ),
            data_svc(
                "miniodb.v1.MinIODBService/BackupMetadata",
                lambda b, cid: service.backup_metadata(),
            ),
            data_svc(
                "miniodb.v1.MinIODBService/RestoreMetadata",
                lambda b, cid: service.restore_metadata(
                    metadata=b.get("metadata"),
                    object_name=b.get("object_name"),
                    from_latest=b.get("from_latest", False),
                ),
            ),
            data_svc(
                "miniodb.v1.MinIODBService/ListBackups",
                lambda b, cid: service.list_backups(days=b.get("days", 30)),
            ),
            data_svc(
                "miniodb.v1.MinIODBService/GetMetadataStatus",
                lambda b, cid: service.get_metadata_status(),
            ),
            data_svc(
                "miniodb.v1.MinIODBService/HealthCheck",
                lambda b, cid: service.health_check(),
                open_route=True,
            ),
            data_svc(
                "miniodb.v1.MinIODBService/GetStatus",
                lambda b, cid: service.get_status(),
            ),
            data_svc(
                "miniodb.v1.MinIODBService/GetMetrics",
                lambda b, cid: service.get_metrics(),
            ),
            data_svc(
                "miniodb.v1.AuthService/GetToken",
                lambda b, cid: service.get_token(
                    b.get("api_key", ""), b.get("secret", "")
                ),
                open_route=True,
            ),
            data_svc(
                "miniodb.v1.AuthService/RefreshToken",
                lambda b, cid: service.refresh_token(b.get("refresh_token", "")),
                open_route=True,
            ),
            data_svc(
                "miniodb.v1.AuthService/RevokeToken",
                lambda b, cid: service.revoke_token(b.get("token", "")),
                open_route=True,
            ),
        ]
    )


def method_names() -> list[str]:
    """The full proto surface (service/method), importable without grpcio
    — lets tests pin the 17+3 contract even where grpcio is absent."""
    svc = [
        "WriteData", "QueryData", "UpdateData", "DeleteData",
        "StreamWrite", "StreamQuery",
        "CreateTable", "ListTables", "GetTable", "DeleteTable",
        "BackupMetadata", "RestoreMetadata", "ListBackups",
        "GetMetadataStatus",
        "HealthCheck", "GetStatus", "GetMetrics",
    ]
    auth = ["GetToken", "RefreshToken", "RevokeToken"]
    return [f"miniodb.v1.MinIODBService/{m}" for m in svc] + [
        f"miniodb.v1.AuthService/{m}" for m in auth
    ]


# ---------------------------------------------------------------------------
# protobuf <-> facade translators
# ---------------------------------------------------------------------------
# Each RPC gets (to_body, to_resp): to_body maps the decoded proto request
# dict onto the REST-shaped body the method table consumes; to_resp maps the
# facade's output dict (plus the original proto request, for echo fields)
# onto the proto response message shape. Reference server behavior:
# internal/transport/grpc/server.go (thin translation over the service
# layer — same division of labor here).


def _now_us() -> int:
    return int(time.time() * 1_000_000)


def _cfg_from_proto(pc: dict | None) -> dict | None:
    """proto TableConfig (miniodb.proto:157-176) -> catalog.TableConfig
    kwargs. proto3 cannot distinguish absent from zero, so zero-valued
    fields fall back to engine defaults (notably ``auto_generate_id``:
    disable auto-generation via ``id_strategy: user_provided``, the
    reference's own convention)."""
    if not pc:
        return None
    cfg: dict[str, Any] = {}
    if pc.get("buffer_size"):
        cfg["buffer_size"] = int(pc["buffer_size"])
    if pc.get("flush_interval_seconds"):
        cfg["flush_interval_s"] = float(pc["flush_interval_seconds"])
    if pc.get("retention_days"):
        cfg["retention_days"] = int(pc["retention_days"])
    if pc.get("backup_enabled"):
        cfg["backup_enabled"] = True
    if pc.get("properties"):
        cfg["properties"] = dict(pc["properties"])
    if pc.get("id_strategy"):
        cfg["id_strategy"] = pc["id_strategy"]
    if pc.get("id_prefix"):
        cfg["id_prefix"] = pc["id_prefix"]
    if pc.get("auto_generate_id"):
        cfg["auto_generate_id"] = True
    iv = pc.get("id_validation")
    if iv and iv.get("max_length"):
        cfg["max_id_length"] = int(iv["max_length"])
    return cfg or None


def _cfg_to_proto(cfg: dict) -> dict:
    return {
        "buffer_size": int(cfg.get("buffer_size") or 0),
        "flush_interval_seconds": int(cfg.get("flush_interval_s") or 0),
        "retention_days": int(cfg.get("retention_days") or 0),
        "backup_enabled": bool(cfg.get("backup_enabled")),
        "properties": {str(k): str(v)
                       for k, v in (cfg.get("properties") or {}).items()},
        "id_strategy": cfg.get("id_strategy", ""),
        "id_prefix": cfg.get("id_prefix", ""),
        "auto_generate_id": bool(cfg.get("auto_generate_id")),
        "id_validation": {"max_length": int(cfg.get("max_id_length") or 0)},
    }


def _row_to_record(row: dict) -> dict:
    """Query-result row -> DataRecord (id/timestamp system columns out,
    everything else into the Struct payload). Spark's toJSON emits
    timestamps as ISO strings; the wire wants µs."""
    ts, us = row.get("timestamp"), None
    if isinstance(ts, (int, float)):
        us = int(ts)
    elif isinstance(ts, str):
        from datetime import datetime, timezone

        try:
            dt = datetime.fromisoformat(ts.replace("Z", "+00:00"))
            if dt.tzinfo is None:
                dt = dt.replace(tzinfo=timezone.utc)
            us = int(dt.timestamp() * 1_000_000)
        except ValueError:
            us = None
    rec: dict[str, Any] = {
        "id": str(row.get("id", "")),
        "payload": {k: v for k, v in row.items()
                    if k not in ("id", "timestamp")},
    }
    if us:
        rec["timestamp"] = us
    return rec


def _flatten_metrics(obj: dict, prefix: str, floats: dict, ints: dict,
                     strs: dict) -> None:
    """GetMetricsResponse splits metrics into three typed maps
    (miniodb.proto:368-373); flatten the facade's nested dict with dotted
    keys, routing by value type."""
    for k, v in obj.items():
        key = f"{prefix}{k}"
        if isinstance(v, bool):
            ints[key] = int(v)
        elif isinstance(v, dict):
            _flatten_metrics(v, key + ".", floats, ints, strs)
        elif isinstance(v, float):
            floats[key] = v
        elif isinstance(v, int):
            ints[key] = v
        else:
            strs[key] = str(v)


def _proto_adapters(service) -> dict[str, tuple[Callable, Callable]]:
    """method -> (to_body(proto_req) -> rest_body,
                  to_resp(facade_out, proto_req) -> proto_resp)."""
    from . import __version__

    eng = service.engine
    node = str(getattr(service.backup, "node_id", "0"))
    M = "miniodb.v1.MinIODBService/"
    A = "miniodb.v1.AuthService/"
    ident = lambda p: p  # noqa: E731
    echo = lambda out, p: out  # noqa: E731

    def list_tables_resp(out, p):
        import fnmatch

        names = out.get("tables", [])
        if p.get("pattern"):
            names = [n for n in names if fnmatch.fnmatch(n, p["pattern"])]
        infos = []
        for n in names:
            cfg = eng.get_table(n)
            from dataclasses import asdict

            infos.append({
                "name": n, "status": "active",
                "config": _cfg_to_proto(asdict(cfg)) if cfg else None,
            })
        return {"tables": infos, "total": len(infos)}

    def get_table_resp(out, p):
        if not out.get("found"):
            raise KeyError(f"table not found: {p.get('table_name', '')}")
        cfg = out["config"]
        return {"table_info": {"name": cfg.get("name", ""),
                               "status": "active",
                               "config": _cfg_to_proto(cfg)}}

    def status_resp(out, p):
        q = out.get("queries", {})
        return {
            "timestamp": _now_us(),
            "buffer_stats": {str(t): int(n) for t, n in
                             out.get("buffered_rows", {}).items()},
            # cache substitutes Redis; catalog+object store substitute MinIO
            "redis_stats": {"cache_hits": int(out["cache"]["hits"]),
                            "cache_misses": int(out["cache"]["misses"])},
            "minio_stats": {"tables": len(out.get("tables", [])),
                            "query_count": int(q.get("count", 0)),
                            "slow_queries": int(q.get("slow", 0))},
            "nodes": [{"id": node, "status": "healthy",
                       "type": "standalone", "last_seen": _now_us()}],
            "total_nodes": 1,
        }

    def metrics_resp(out, p):
        floats: dict = {}
        ints: dict = {}
        strs: dict = {}
        _flatten_metrics(out, "", floats, ints, strs)
        return {"timestamp": _now_us(), "performance_metrics": floats,
                "resource_usage": ints, "system_info": strs}

    return {
        M + "WriteData": (
            lambda p: {"table": p.get("table", ""),
                       "record": p.get("data") or {}},
            lambda out, p: {"success": bool(out.get("success")),
                            "message": str(out.get("id", "")),
                            "node_id": node},
        ),
        M + "QueryData": (
            lambda p: {"sql": p.get("sql", ""),
                       "limit": p.get("limit") or None},
            lambda out, p: {"result_json": out.get("result_json", "[]"),
                            "has_more": bool(out.get("truncated"))},
        ),
        M + "UpdateData": (
            lambda p: {"table": p.get("table", ""), "id": p.get("id", ""),
                       "payload": p.get("payload") or {},
                       "timestamp": p.get("timestamp")},
            lambda out, p: {"success": bool(out.get("success")),
                            "message": f"replaced {out.get('replaced', 0)}",
                            "node_id": node},
        ),
        M + "DeleteData": (
            lambda p: {"table": p.get("table", ""), "id": p.get("id", "")},
            lambda out, p: {"success": bool(out.get("success")),
                            "deleted_count": int(out.get("deleted_count",
                                                         0))},
        ),
        M + "StreamWrite": (
            lambda p: {"table": p.get("table", ""),
                       "records": p.get("records", [])},
            lambda out, p: {"success": bool(out.get("success")),
                            "records_count": int(out.get("count", 0))},
        ),
        M + "StreamQuery": (
            lambda p: {"sql": p.get("sql", ""),
                       "batch_size": p.get("batch_size") or 100,
                       "cursor": int(p.get("cursor") or 0)},
            lambda out, p: {
                "records": [_row_to_record(r) for r in out.get("rows", [])],
                "has_more": bool(out.get("has_more")),
                "cursor": str(out.get("cursor", 0)),
            },
        ),
        M + "CreateTable": (
            lambda p: {"name": p.get("table_name", ""),
                       "config": _cfg_from_proto(p.get("config")),
                       "if_not_exists": bool(p.get("if_not_exists"))},
            lambda out, p: {"success": bool(out.get("success")),
                            "message": out.get("message", "created")},
        ),
        M + "ListTables": (lambda p: {}, list_tables_resp),
        M + "GetTable": (
            lambda p: {"name": p.get("table_name", "")}, get_table_resp,
        ),
        M + "DeleteTable": (
            lambda p: {"name": p.get("table_name", "")},
            lambda out, p: {
                "success": bool(out.get("success")) or
                bool(p.get("if_exists")),
                "message": "" if out.get("success") else "no such table",
            },
        ),
        M + "BackupMetadata": (
            lambda p: {},
            lambda out, p: {
                "success": bool(out.get("success")),
                "message": out.get("backup", {}).get("object_name", ""),
                "backup_id": out.get("backup", {}).get("object_name", ""),
                "timestamp": out.get("backup", {}).get("timestamp"),
            },
        ),
        M + "RestoreMetadata": (
            lambda p: {"object_name": p.get("backup_file") or None,
                       "from_latest": bool(p.get("from_latest"))},
            lambda out, p: {
                "success": bool(out.get("success")),
                "message": "restored",
                "backup_file": out.get("backup_file") or
                p.get("backup_file", ""),
                "entries_total": int(out.get("tables_restored", 0)),
                "entries_ok": int(out.get("tables_restored", 0)),
            },
        ),
        M + "ListBackups": (
            lambda p: {"days": p.get("days") or 30}, echo,
        ),
        M + "GetMetadataStatus": (lambda p: {}, echo),
        M + "HealthCheck": (
            lambda p: {},
            lambda out, p: {
                "status": out.get("status", ""), "timestamp": _now_us(),
                "version": __version__,
                "details": {k: str(v) for k, v in out.items()
                            if k != "status"},
            },
        ),
        M + "GetStatus": (lambda p: {}, status_resp),
        M + "GetMetrics": (lambda p: {}, metrics_resp),
        A + "GetToken": (ident, echo),
        A + "RefreshToken": (ident, echo),
        A + "RevokeToken": (ident, echo),
    }


def dispatch_proto(service, method: str, request_bytes: bytes,
                   client_id: str = "default", table=None,
                   adapters=None) -> bytes:
    """The full protobuf pipeline for one RPC: decode the binary request
    per miniodb.proto, translate to the facade shape, invoke, translate
    back, encode the binary response. grpcio-free — the wire handler and
    the tests both call this."""
    table = table if table is not None else _method_table(service)
    adapters = adapters if adapters is not None else _proto_adapters(service)
    req_schema, resp_schema = protowire.METHOD_IO[method]
    preq = protowire.decode_message(req_schema, request_bytes or b"")
    to_body, to_resp = adapters[method]
    fn, _open = table[method]
    out = fn(to_body(preq), client_id)
    return protowire.encode_message(resp_schema, to_resp(out, preq))


# the two non-unary RPCs (miniodb.proto:20-21): StreamWrite is
# client-streaming, StreamQuery is server-streaming — a stock
# protoc-generated client opens them with streaming stubs, so the
# server must register matching handler types.
STREAMING_METHODS = {
    "miniodb.v1.MinIODBService/StreamWrite": "client",
    "miniodb.v1.MinIODBService/StreamQuery": "server",
}


def dispatch_proto_stream_write(service, request_iter, client_id="default",
                                table=None, adapters=None) -> bytes:
    """Client-streaming StreamWrite: drain the request stream, writing
    each message's batch as it arrives (bounded memory — one message's
    records at a time), then answer with the aggregate
    StreamWriteResponse (success, records_count, per-batch errors)."""
    table = table if table is not None else _method_table(service)
    adapters = adapters if adapters is not None else _proto_adapters(service)
    req_schema, resp_schema = protowire.METHOD_IO[
        "miniodb.v1.MinIODBService/StreamWrite"]
    to_body, _ = adapters["miniodb.v1.MinIODBService/StreamWrite"]
    fn, _open = table["miniodb.v1.MinIODBService/StreamWrite"]
    total, errors, ok = 0, [], True
    for request_bytes in request_iter:
        preq = protowire.decode_message(req_schema, request_bytes or b"")
        try:
            out = fn(to_body(preq), client_id)
            total += int(out.get("count", 0))
        except (AuthError, RateLimitExceeded):
            # status-mapped conditions must terminate the RPC with their
            # code (UNAUTHENTICATED / RESOURCE_EXHAUSTED + retry_after),
            # not degrade into an OK response's error list
            raise
        except Exception as exc:  # noqa: BLE001 - per-batch error list
            ok = False
            errors.append(str(exc)[:200])
    return protowire.encode_message(resp_schema, {
        "success": ok, "records_count": total, "errors": errors[:100]})


def dispatch_proto_stream_query(service, request_bytes: bytes,
                                client_id="default", table=None,
                                adapters=None):
    """Server-streaming StreamQuery: yield one encoded
    StreamQueryResponse per page, following the cursor until the
    engine reports no more — the page loop holds one batch at a time
    (the engine side pulls through toLocalIterator)."""
    table = table if table is not None else _method_table(service)
    adapters = adapters if adapters is not None else _proto_adapters(service)
    req_schema, resp_schema = protowire.METHOD_IO[
        "miniodb.v1.MinIODBService/StreamQuery"]
    to_body, to_resp = adapters["miniodb.v1.MinIODBService/StreamQuery"]
    fn, _open = table["miniodb.v1.MinIODBService/StreamQuery"]
    preq = protowire.decode_message(req_schema, request_bytes or b"")
    body = to_body(preq)
    while True:
        out = fn(body, client_id)
        resp = to_resp(out, preq)
        yield protowire.encode_message(resp_schema, resp)
        if not out.get("has_more"):
            return
        body = dict(body, cursor=int(out.get("cursor", 0)))


class GrpcServer:
    """gRPC server over the facade. Requires ``grpcio`` at construction
    (not import) time; everything else in this module is stdlib."""

    def __init__(self, service, host: str = "127.0.0.1", port: int = 0,
                 max_workers: int = 8, codec: str = "proto"):
        if codec not in ("proto", "json"):
            raise ValueError(f"codec must be 'proto' or 'json', got {codec!r}")
        try:
            import grpc  # noqa: PLC0415
            from concurrent import futures
        except ImportError as exc:  # pragma: no cover - grpcio installed
            raise ImportError(
                "grpcio is required for the gRPC transport; "
                "install grpcio or use miniodb_spark.rest.RestServer"
            ) from exc
        self._grpc = grpc
        self.service = service
        self.codec = codec
        self._table = table = _method_table(service)
        self._adapters = _proto_adapters(service) if codec == "proto" else None

        outer = self

        class Handler(grpc.GenericRpcHandler):
            def service(self, handler_call_details):
                name = handler_call_details.method.lstrip("/")
                entry = table.get(name)
                if entry is None:
                    return None
                fn, open_route = entry
                md = dict(handler_call_details.invocation_metadata or ())
                passthrough = {"request_deserializer": lambda b: b,
                               "response_serializer": lambda b: b}

                # proto codec: honor the two non-unary RPC shapes a
                # stock protoc client uses (miniodb.proto:20-21)
                if outer.codec == "proto":
                    kind = STREAMING_METHODS.get(name)
                    if kind == "client":
                        def s_unary(request_iter, context):
                            return outer._handle_stream_write(
                                open_route, request_iter, md, context)

                        return grpc.stream_unary_rpc_method_handler(
                            s_unary, **passthrough)
                    if kind == "server":
                        def unary_s(request_bytes, context):
                            return outer._handle_stream_query(
                                open_route, request_bytes, md, context)

                        return grpc.unary_stream_rpc_method_handler(
                            unary_s, **passthrough)

                def unary(request_bytes, context):
                    return outer._handle(fn, open_route, name, request_bytes,
                                         md, context)

                return grpc.unary_unary_rpc_method_handler(
                    unary, **passthrough)

        self.server = grpc.server(
            futures.ThreadPoolExecutor(max_workers=max_workers)
        )
        self.server.add_generic_rpc_handlers((Handler(),))
        self.port = self.server.add_insecure_port(f"{host}:{port}")

    # -- per-RPC pipeline (mirrors rest.py's _dispatch) -------------------

    def _auth_client(self, open_route, metadata, context) -> str:
        """Shared auth/identity step: token subject when auth is on,
        else the transport peer address (never client metadata)."""
        client_id = context.peer() or "grpc-peer"
        if not open_route and self.service.auth is not None:
            authz = metadata.get("authorization", "")
            if not authz.startswith("Bearer "):
                raise AuthError("missing bearer token")
            claims = self.service.auth.validate(authz[7:])
            client_id = claims.get("sub") or client_id
        return client_id

    def _abort(self, context, exc):
        """Map an exception onto the reference's status codes and abort
        (abort raises, terminating the RPC)."""
        grpc = self._grpc
        if isinstance(exc, AuthError):
            context.abort(grpc.StatusCode.UNAUTHENTICATED, str(exc))
        elif isinstance(exc, RateLimitExceeded):
            context.abort(grpc.StatusCode.RESOURCE_EXHAUSTED,
                          f"rate limited; retry after {exc.retry_after_s:.2f}s")
        elif isinstance(exc, (ValueError, KeyError, TypeError)):
            context.abort(grpc.StatusCode.INVALID_ARGUMENT, str(exc)[:500])
        else:
            context.abort(grpc.StatusCode.INTERNAL, str(exc)[:500])

    def _handle_stream_write(self, open_route, request_iter, metadata,
                             context):
        try:
            client_id = self._auth_client(open_route, metadata, context)
            return dispatch_proto_stream_write(
                self.service, request_iter, client_id,
                table=self._table, adapters=self._adapters)
        except Exception as exc:  # noqa: BLE001 - transport boundary
            self._abort(context, exc)

    def _handle_stream_query(self, open_route, request_bytes, metadata,
                             context):
        try:
            client_id = self._auth_client(open_route, metadata, context)
            yield from dispatch_proto_stream_query(
                self.service, request_bytes, client_id,
                table=self._table, adapters=self._adapters)
        except Exception as exc:  # noqa: BLE001 - transport boundary
            self._abort(context, exc)

    def _handle(self, fn, open_route, method, request_bytes, metadata,
                context):
        # aborts happen ONLY in the except arms: context.abort() raises to
        # terminate the RPC, and raising from an except arm of the same
        # try cannot be re-caught below (a second wrap would mask the
        # status code)
        grpc = self._grpc
        try:
            # fallback identity is the transport-level peer address —
            # never client-supplied metadata, which would let a caller
            # rotate identities to evade the rate limiter
            client_id = context.peer() or "grpc-peer"
            if not open_route and self.service.auth is not None:
                authz = metadata.get("authorization", "")
                if not authz.startswith("Bearer "):
                    raise AuthError("missing bearer token")
                claims = self.service.auth.validate(authz[7:])
                client_id = claims.get("sub") or client_id
            if self.codec == "proto":
                return dispatch_proto(self.service, method, request_bytes,
                                      client_id, table=self._table,
                                      adapters=self._adapters)
            body = json.loads(request_bytes or b"{}")
            out = fn(body, client_id)
            return json.dumps(out).encode("utf-8")
        except AuthError as exc:
            context.abort(grpc.StatusCode.UNAUTHENTICATED, str(exc))
        except RateLimitExceeded as exc:
            context.abort(grpc.StatusCode.RESOURCE_EXHAUSTED,
                          f"rate limited; retry after {exc.retry_after_s:.2f}s")
        except (ValueError, KeyError, TypeError) as exc:
            context.abort(grpc.StatusCode.INVALID_ARGUMENT, str(exc)[:500])
        except Exception as exc:  # noqa: BLE001 - transport boundary
            context.abort(grpc.StatusCode.INTERNAL, str(exc)[:500])

    def serve_background(self) -> "GrpcServer":
        self.server.start()
        return self

    def shutdown(self) -> None:
        self.server.stop(grace=None)
