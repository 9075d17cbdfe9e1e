"""gRPC transport (miniodb.proto:12-46 surface over the facade).

Two layers: the method table + adapters are plain Python and tested
everywhere; the wire tests need grpcio and skip cleanly without it
(the development sandbox carries no grpcio — the transport is an
optional import by design).
"""

import json

import pytest

from miniodb_spark.api import MiniODBService
from miniodb_spark.grpc_server import GrpcServer, _method_table, method_names

US = 1_000_000
T0 = 1_700_000_000 * US


def test_method_surface_is_complete():
    names = method_names()
    assert len(names) == 20  # 17 service + 3 auth RPCs
    assert len(set(names)) == 20
    svc = [n for n in names if n.startswith("miniodb.v1.MinIODBService/")]
    auth = [n for n in names if n.startswith("miniodb.v1.AuthService/")]
    assert len(svc) == 17 and len(auth) == 3


def test_method_table_matches_surface(engine):
    table = _method_table(MiniODBService(engine))
    assert sorted(table) == sorted(method_names())
    # health + the three auth RPCs are open; everything else is secured
    open_routes = {n for n, (_, open_) in table.items() if open_}
    assert open_routes == {
        "miniodb.v1.MinIODBService/HealthCheck",
        "miniodb.v1.AuthService/GetToken",
        "miniodb.v1.AuthService/RefreshToken",
        "miniodb.v1.AuthService/RevokeToken",
    }


def test_adapters_drive_the_facade(engine):
    """The request-dict adapters (what the wire handler invokes after
    decode) run the full write→query→mutate lifecycle without grpcio."""
    table = _method_table(MiniODBService(engine))

    def call(method, body):
        fn, _ = table[f"miniodb.v1.MinIODBService/{method}"]
        return fn(body, "test-client")

    assert call("HealthCheck", {})["status"] == "healthy"
    out = call("WriteData", {
        "table": "g", "record": {"id": "a", "timestamp": T0,
                                 "payload": {"v": 1}}})
    assert out["success"] and out["id"] == "a"
    call("StreamWrite", {"table": "g", "records": [
        {"id": "b", "timestamp_us": T0, "payload": {"v": 2}}]})
    rows = json.loads(call("QueryData", {
        "sql": "SELECT id, v FROM g ORDER BY id"})["result_json"])
    assert [r["id"] for r in rows] == ["a", "b"]
    call("UpdateData", {"table": "g", "id": "a", "payload": {"v": 9},
                        "timestamp": T0})
    call("DeleteData", {"table": "g", "id": "b"})
    rows = json.loads(call("QueryData", {
        "sql": "SELECT id, v FROM g"})["result_json"])
    assert rows == [{"id": "a", "v": 9}]
    assert "g" in call("ListTables", {})["tables"]
    assert call("GetTable", {"name": "g"})["found"]
    assert call("GetStatus", {})["uptime_s"] >= 0
    assert "cache_hits" in call("GetMetrics", {})
    b = call("BackupMetadata", {})
    assert b["success"]
    assert call("ListBackups", {"days": 1})["total"] >= 1
    assert call("GetMetadataStatus", {})["health_status"] == "healthy"
    sq = call("StreamQuery", {"sql": "SELECT id FROM g", "batch_size": 1})
    assert len(sq["rows"]) == 1
    assert call("DeleteTable", {"name": "g"})["success"]


def test_server_requires_grpcio_cleanly(engine):
    try:
        import grpc  # noqa: F401
        pytest.skip("grpcio installed; covered by the wire tests below")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="grpcio is required"):
        GrpcServer(MiniODBService(engine))


# -- wire tests (need grpcio; skip per-test so the adapter tests above
#    still run in grpcio-less environments) ----------------------------------


@pytest.fixture()
def grpc_server(engine):
    """JSON-codec server (the pre-round-7 framing, kept as fallback)."""
    grpc = pytest.importorskip("grpc")  # noqa: F841
    from miniodb_spark.auth import TokenManager

    svc = MiniODBService(engine, auth=TokenManager("k", {"api": "sec"}))
    srv = GrpcServer(svc, codec="json").serve_background()
    yield srv
    srv.shutdown()


@pytest.fixture()
def grpc_proto_server(engine):
    """Default protobuf-codec server — what a stock reference client
    built from miniodb.proto speaks."""
    grpc = pytest.importorskip("grpc")  # noqa: F841
    from miniodb_spark.auth import TokenManager

    svc = MiniODBService(engine, auth=TokenManager("k", {"api": "sec"}))
    srv = GrpcServer(svc).serve_background()
    assert srv.codec == "proto"
    yield srv
    srv.shutdown()


def _proto_stub(port, method):
    import grpc

    from miniodb_spark import protowire as pw

    req_schema, resp_schema = pw.METHOD_IO[method]
    chan = grpc.insecure_channel(f"127.0.0.1:{port}")
    return chan, chan.unary_unary(
        f"/{method}",
        request_serializer=lambda d: pw.encode_message(req_schema, d),
        response_deserializer=lambda b: pw.decode_message(resp_schema, b),
    )


def test_grpc_proto_wire_roundtrip(grpc_proto_server):
    """Binary protobuf end-to-end over real HTTP/2 framing."""
    p = grpc_proto_server.port
    _, health = _proto_stub(p, "miniodb.v1.MinIODBService/HealthCheck")
    assert health({})["status"] == "healthy"
    _, get_token = _proto_stub(p, "miniodb.v1.AuthService/GetToken")
    tok = get_token({"api_key": "api", "secret": "sec"})["access_token"]
    md = (("authorization", f"Bearer {tok}"),)
    _, write = _proto_stub(p, "miniodb.v1.MinIODBService/WriteData")
    out = write({"table": "w", "data": {"id": "x", "timestamp": T0,
                                        "payload": {"v": 1}}}, metadata=md)
    assert out["success"] and out["message"] == "x"
    _, query = _proto_stub(p, "miniodb.v1.MinIODBService/QueryData")
    rows = json.loads(query({"sql": "SELECT id, v FROM w"},
                            metadata=md)["result_json"])
    assert rows == [{"id": "x", "v": 1.0}]


def _stub(port, method):
    import grpc

    chan = grpc.insecure_channel(f"127.0.0.1:{port}")
    return chan, chan.unary_unary(
        f"/{method}",
        request_serializer=lambda d: json.dumps(d).encode(),
        response_deserializer=lambda b: json.loads(b),
    )


def test_grpc_wire_roundtrip(grpc_server):
    p = grpc_server.port
    chan, health = _stub(p, "miniodb.v1.MinIODBService/HealthCheck")
    assert health({})["status"] == "healthy"
    _, get_token = _stub(p, "miniodb.v1.AuthService/GetToken")
    tok = get_token({"api_key": "api", "secret": "sec"})["access_token"]
    md = (("authorization", f"Bearer {tok}"),)
    _, write = _stub(p, "miniodb.v1.MinIODBService/WriteData")
    out = write({"table": "w", "record": {"id": "x", "timestamp": T0,
                                          "payload": {"v": 1}}}, metadata=md)
    assert out["success"]
    _, query = _stub(p, "miniodb.v1.MinIODBService/QueryData")
    rows = json.loads(query({"sql": "SELECT id, v FROM w"},
                            metadata=md)["result_json"])
    assert rows == [{"id": "x", "v": 1}]


def test_grpc_wire_status_codes(grpc_server):
    import grpc

    p = grpc_server.port
    _, query = _stub(p, "miniodb.v1.MinIODBService/QueryData")
    with pytest.raises(grpc.RpcError) as ei:
        query({"sql": "SELECT 1"})  # no token
    assert ei.value.code() == grpc.StatusCode.UNAUTHENTICATED
    _, get_token = _stub(p, "miniodb.v1.AuthService/GetToken")
    tok = get_token({"api_key": "api", "secret": "sec"})["access_token"]
    md = (("authorization", f"Bearer {tok}"),)
    with pytest.raises(grpc.RpcError) as ei:
        query({"sql": "DROP TABLE w"}, metadata=md)  # gate violation
    assert ei.value.code() == grpc.StatusCode.INVALID_ARGUMENT


def test_wire_skip_guard_is_the_import_not_a_stale_flag():
    """Readiness audit (round-7 verdict item 7): the wire tests must
    auto-unskip the moment grpcio appears in the environment. Assert
    the gate is `pytest.importorskip("grpc")` itself — not a marker,
    env var, or hardcoded skip that would stay stale."""
    import re
    from pathlib import Path

    src = Path(__file__).read_text()
    assert len(re.findall(r'pytest\.importorskip\("grpc"\)', src)) >= 2, (
        "wire fixtures must gate on importorskip('grpc')"
    )
    # no unconditional skips or skip-markers on the wire tests
    # (concatenated so this test's own source doesn't match itself)
    assert ("skip" + "if") not in src.replace('"skip" + "if"', "")
    assert not re.search(r'pytestmark\s*=.*skip', src)
    # and the adapter-level test skips only when grpcio IS present
    # (inverse gate) — both directions covered, never both skipped
    assert 'pytest.skip("grpcio installed' in src
