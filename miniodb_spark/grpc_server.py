"""gRPC transport: the reference's RPC surface over the facade.

Parity target: /root/reference/api/proto/miniodb/v1/miniodb.proto:12-46
— ``miniodb.v1.MinIODBService`` (17 unary RPCs: WriteData, QueryData,
UpdateData, DeleteData, StreamWrite, StreamQuery, CreateTable,
ListTables, GetTable, DeleteTable, BackupMetadata, RestoreMetadata,
ListBackups, GetMetadataStatus, HealthCheck, GetStatus, GetMetrics)
plus ``miniodb.v1.AuthService`` (GetToken, RefreshToken, RevokeToken) —
bound to the same :class:`miniodb_spark.api.MiniODBService` facade that
``rest.py`` serves, with the same auth model (Bearer access token in
the ``authorization`` metadata key; health + auth RPCs open) and the
same status mapping (AuthError → UNAUTHENTICATED, RateLimitExceeded →
RESOURCE_EXHAUSTED, client-shaped errors → INVALID_ARGUMENT, the rest
→ INTERNAL).

``grpcio`` is an **optional** dependency: importing this module never
requires it; constructing :class:`GrpcServer` raises a clear
ImportError when it is absent, and ``tests/test_grpc.py`` skips. The
sandbox this engine is developed in carries no protoc, so messages ride
a JSON codec over gRPC's HTTP/2 framing (full method paths match the
proto service/method names exactly — ``/miniodb.v1.MinIODBService/
WriteData`` — so swapping the codec for generated pb2 classes is a
serializer change, not a server change). Request/response dict shapes
are identical to the REST bodies, which themselves mirror the proto
message fields.
"""

from __future__ import annotations

import json
from typing import Any, Callable

from .auth import AuthError
from .ratelimit import RateLimitExceeded

# full-method-name suffix -> (facade method, open_route, adapter)
# adapters map the request dict onto facade call args, mirroring rest.py


def _method_table(service) -> dict[str, tuple[Callable[[dict, str], Any], bool]]:
    """method name -> (handler(request_dict, client_id) -> response dict,
    open_route). One entry per proto RPC."""

    def data_svc(name: str, fn: Callable[[dict, str], Any], open_route=False):
        return (name, (fn, open_route))

    eng = service.engine
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
                    b.get("name", ""), b.get("config")
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
                    metadata=b.get("metadata"), object_name=b.get("object_name")
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


class GrpcServer:
    """gRPC server over the facade. Requires ``grpcio`` at construction
    (not import) time; everything else in this module is stdlib."""

    def __init__(self, service, host: str = "127.0.0.1", port: int = 0,
                 max_workers: int = 8):
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
        table = _method_table(service)

        outer = self

        class Handler(grpc.GenericRpcHandler):
            def service(self, handler_call_details):
                name = handler_call_details.method.lstrip("/")
                entry = table.get(name)
                if entry is None:
                    return None
                fn, open_route = entry
                md = dict(handler_call_details.invocation_metadata or ())

                def unary(request_bytes, context):
                    return outer._handle(fn, open_route, request_bytes,
                                         md, context)

                return grpc.unary_unary_rpc_method_handler(
                    unary,
                    request_deserializer=lambda b: b,
                    response_serializer=lambda b: b,
                )

        self.server = grpc.server(
            futures.ThreadPoolExecutor(max_workers=max_workers)
        )
        self.server.add_generic_rpc_handlers((Handler(),))
        self.port = self.server.add_insecure_port(f"{host}:{port}")

    # -- per-RPC pipeline (mirrors rest.py's _dispatch) -------------------

    def _handle(self, fn, open_route, request_bytes, metadata, context):
        # aborts happen ONLY in the except arms: context.abort() raises to
        # terminate the RPC, and raising from an except arm of the same
        # try cannot be re-caught below (a second wrap would mask the
        # status code)
        grpc = self._grpc
        try:
            body = json.loads(request_bytes or b"{}")
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
