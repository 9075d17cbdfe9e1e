"""Protobuf wire codec tests — all grpcio-free.

Byte-level vectors are hand-computed from the public wire-format spec
(tag = field_number<<3 | wire_type; varint LEB128; doubles little-endian
I64; strings/messages LEN-prefixed), so the codec is pinned to what a
stock protoc-generated client emits, not merely to itself. The dispatch
tests then run the full binary request -> facade -> binary response
pipeline for the miniodb.v1 surface (reference contract:
api/proto/miniodb/v1/miniodb.proto:53-413).
"""

import json
import struct

import pytest

from miniodb_spark import protowire as pw
from miniodb_spark.api import MiniODBService
from miniodb_spark.grpc_server import dispatch_proto

US = 1_000_000
T0 = 1_700_000_000 * US


# ---------------------------------------------------------------------------
# wire primitives
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("n,raw", [
    (0, b"\x00"), (1, b"\x01"), (127, b"\x7f"),
    (128, b"\x80\x01"), (300, b"\xac\x02"),
    (2 ** 32, b"\x80\x80\x80\x80\x10"),
])
def test_uvarint_vectors(n, raw):
    assert pw.encode_uvarint(n) == raw
    assert pw.decode_uvarint(raw, 0) == (n, len(raw))


def test_uvarint_rejects_truncation():
    with pytest.raises(ValueError, match="truncated"):
        pw.decode_uvarint(b"\x80", 0)


def test_negative_int64_is_ten_byte_twos_complement():
    schema = {1: ("x", "int64")}
    raw = pw.encode_message(schema, {"x": -1})
    assert raw == b"\x08" + b"\xff" * 9 + b"\x01"
    assert pw.decode_message(schema, raw) == {"x": -1}
    assert pw.decode_message(schema, pw.encode_message(schema, {"x": -(2**40)}))["x"] == -(2**40)


def test_known_bytes_write_data_request():
    # field 1 (string "t"): tag 0x0a, len 1
    raw = pw.encode_message(pw.WRITE_DATA_REQUEST, {"table": "t"})
    assert raw == b"\x0a\x01t"


def test_known_bytes_query_data_request():
    raw = pw.encode_message(pw.QUERY_DATA_REQUEST,
                            {"sql": "SELECT 1", "limit": 5})
    assert raw == b"\x0a\x08SELECT 1\x10\x05"


def test_known_bytes_struct_number():
    # Struct{fields:{"a": Value{number_value: 1.5}}}
    valmsg = b"\x11" + struct.pack("<d", 1.5)          # field 2, I64
    entry = b"\x0a\x01a\x12" + bytes([len(valmsg)]) + valmsg
    expected = b"\x0a" + bytes([len(entry)]) + entry   # fields map entry
    assert pw.encode_struct({"a": 1.5}) == expected
    assert pw.decode_struct(expected) == {"a": 1.5}


def test_known_bytes_bool_and_default_omission():
    schema = {1: ("on", "bool"), 2: ("name", "string")}
    assert pw.encode_message(schema, {"on": True}) == b"\x08\x01"
    # proto3: default values are omitted entirely
    assert pw.encode_message(schema, {"on": False, "name": ""}) == b""
    assert pw.decode_message(schema, b"") == {"on": False, "name": ""}


def test_unknown_fields_are_skipped():
    raw = pw.encode_message(pw.WRITE_DATA_REQUEST, {"table": "t"})
    # append unknown field 15 varint, field 14 LEN, field 13 I64
    raw += b"\x78\x07" + b"\x72\x03abc" + b"\x69" + b"\x00" * 8
    out = pw.decode_message(pw.WRITE_DATA_REQUEST, raw)
    assert out["table"] == "t"


def test_timestamp_round_trip_microseconds():
    us = T0 + 123_456
    raw = pw.encode_timestamp_us(us)
    assert pw.decode_timestamp_us(raw) == us
    # seconds field is a plain varint of 1_700_000_000
    assert raw.startswith(b"\x08" + pw.encode_uvarint(1_700_000_000))
    # nanos carry the sub-second µs exactly
    assert pw.decode_timestamp_us(pw.encode_timestamp_us(999_999)) == 999_999
    assert pw.decode_timestamp_us(b"") == 0


def test_struct_round_trip_all_kinds():
    d = {"s": "x", "n": 2.5, "i": 3, "b": True, "z": None,
         "l": [1.0, "a", False, None, {"k": 1.0}],
         "d": {"nested": {"deep": "v"}}}
    out = pw.decode_struct(pw.encode_struct(d))
    # protobuf Struct numbers are always double (reference structpb
    # AsMap() gives float64) — ints come back as integral floats
    assert out["i"] == 3.0 and isinstance(out["i"], float)
    assert out["s"] == "x" and out["b"] is True and out["z"] is None
    assert out["l"] == [1.0, "a", False, None, {"k": 1.0}]
    assert out["d"] == {"nested": {"deep": "v"}}


def test_map_round_trip():
    raw = pw.encode_message(pw.TABLE_CONFIG,
                            {"properties": {"a": "1", "b": ""}})
    out = pw.decode_message(pw.TABLE_CONFIG, raw)
    assert out["properties"] == {"a": "1", "b": ""}


def test_every_method_io_schema_round_trips():
    """Exercise all 20 request+response schemas with a value for every
    field, so no schema entry can drift from its codec path."""

    def sample(kind, depth=0):
        if kind == "string":
            return "s"
        if kind == "bytes":
            return b"\x01\x02"
        if kind == "bool":
            return True
        if kind in ("int32", "int64"):
            return 7
        if kind == "double":
            return 1.25
        if kind == "timestamp":
            return T0
        if kind == "struct":
            return {"k": "v", "n": 2.0}
        if kind[0] == "msg":
            return fill(kind[1], depth + 1)
        if kind[0] == "rep":
            return [sample(kind[1], depth + 1)]
        if kind[0] == "map":
            return {"mk": sample(kind[2], depth + 1)}
        raise AssertionError(kind)

    def fill(schema, depth=0):
        return {name: sample(kind, depth)
                for name, kind in schema.values()}

    for method, (req_s, resp_s) in pw.METHOD_IO.items():
        for schema in (req_s, resp_s):
            obj = fill(schema)
            got = pw.decode_message(schema, pw.encode_message(schema, obj))
            assert got == obj, f"{method} schema drift: {got} != {obj}"


def test_method_io_covers_full_surface():
    from miniodb_spark.grpc_server import method_names

    assert sorted(pw.METHOD_IO) == sorted(method_names())


# ---------------------------------------------------------------------------
# dispatch: binary request -> facade -> binary response (no grpcio)
# ---------------------------------------------------------------------------

M = "miniodb.v1.MinIODBService/"
A = "miniodb.v1.AuthService/"


def _call(service, method, req_dict):
    req_schema, resp_schema = pw.METHOD_IO[method]
    raw = dispatch_proto(service, method,
                         pw.encode_message(req_schema, req_dict), "tester")
    return pw.decode_message(resp_schema, raw)


def test_proto_lifecycle_write_query_mutate(engine):
    svc = MiniODBService(engine)
    out = _call(svc, M + "WriteData", {
        "table": "p", "data": {"id": "a", "timestamp": T0,
                               "payload": {"v": 1, "tag": "x"}}})
    assert out["success"] and out["message"] == "a"
    out = _call(svc, M + "StreamWrite", {
        "table": "p",
        "records": [{"id": "b", "timestamp": T0 + US,
                     "payload": {"v": 2.5, "tag": "y"}}]})
    assert out["success"] and out["records_count"] == 1
    out = _call(svc, M + "QueryData",
                {"sql": "SELECT id, v, tag FROM p ORDER BY id"})
    rows = json.loads(out["result_json"])
    # Struct numbers arrive as doubles — the engine types v as double
    assert [(r["id"], r["v"], r["tag"]) for r in rows] == [
        ("a", 1.0, "x"), ("b", 2.5, "y")]
    out = _call(svc, M + "UpdateData",
                {"table": "p", "id": "a", "payload": {"v": 9, "tag": "x"},
                 "timestamp": T0})
    assert out["success"] and out["message"] == "replaced 1"
    out = _call(svc, M + "DeleteData", {"table": "p", "id": "b"})
    assert out["success"] and out["deleted_count"] >= 1
    rows = json.loads(_call(svc, M + "QueryData", {
        "sql": "SELECT id, v FROM p"})["result_json"])
    assert [(r["id"], r["v"]) for r in rows] == [("a", 9.0)]
    sq = _call(svc, M + "StreamQuery",
               {"sql": "SELECT id FROM p ORDER BY id", "batch_size": 10})
    assert [r["id"] for r in sq["records"]] == ["a"]
    assert sq["has_more"] is False


def test_proto_table_plane(engine):
    svc = MiniODBService(engine)
    out = _call(svc, M + "CreateTable", {
        "table_name": "cfg_t",
        "config": {"buffer_size": 123, "flush_interval_seconds": 9,
                   "retention_days": 30, "backup_enabled": True,
                   "properties": {"owner": "me"},
                   "id_strategy": "snowflake", "id_prefix": "n-",
                   "id_validation": {"max_length": 64}},
    })
    assert out["success"]
    # if_not_exists: second create is a no-op success
    out = _call(svc, M + "CreateTable",
                {"table_name": "cfg_t", "if_not_exists": True})
    assert out["success"] and out["message"] == "table exists"
    got = _call(svc, M + "GetTable", {"table_name": "cfg_t"})
    cfg = got["table_info"]["config"]
    assert got["table_info"]["name"] == "cfg_t"
    assert cfg["buffer_size"] == 123
    assert cfg["flush_interval_seconds"] == 9
    assert cfg["retention_days"] == 30
    assert cfg["backup_enabled"] is True
    assert cfg["properties"] == {"owner": "me"}
    assert cfg["id_strategy"] == "snowflake"
    assert cfg["id_validation"]["max_length"] == 64
    listed = _call(svc, M + "ListTables", {})
    assert "cfg_t" in [t["name"] for t in listed["tables"]]
    assert listed["total"] == len(listed["tables"])
    # pattern filter (ListTablesRequest.pattern, miniodb.proto:180)
    listed = _call(svc, M + "ListTables", {"pattern": "cfg_*"})
    assert [t["name"] for t in listed["tables"]] == ["cfg_t"]
    out = _call(svc, M + "DeleteTable", {"table_name": "cfg_t"})
    assert out["success"]
    out = _call(svc, M + "DeleteTable",
                {"table_name": "cfg_t", "if_exists": True})
    assert out["success"]  # if_exists tolerates absence
    with pytest.raises(KeyError, match="not found"):
        _call(svc, M + "GetTable", {"table_name": "cfg_t"})


def test_proto_metadata_and_ops_plane(engine):
    svc = MiniODBService(engine)
    _call(svc, M + "WriteData",
          {"table": "mm", "data": {"id": "1", "payload": {"v": 1}}})
    b = _call(svc, M + "BackupMetadata", {})
    assert b["success"] and b["backup_id"].startswith("metadata-")
    assert b["timestamp"] > 0
    lb = _call(svc, M + "ListBackups", {"days": 1})
    assert lb["total"] >= 1
    assert lb["backups"][0]["object_name"] == b["backup_id"]
    r = _call(svc, M + "RestoreMetadata", {"from_latest": True})
    assert r["success"] and r["backup_file"] == b["backup_id"]
    st = _call(svc, M + "GetMetadataStatus", {})
    assert st["health_status"] == "healthy"
    assert st["backup_status"]["backend"] == "catalog-json"
    hc = _call(svc, M + "HealthCheck", {})
    assert hc["status"] == "healthy" and hc["version"]
    gs = _call(svc, M + "GetStatus", {})
    assert gs["total_nodes"] == 1
    assert gs["nodes"][0]["status"] == "healthy"
    assert gs["redis_stats"]["cache_hits"] >= 0
    gm = _call(svc, M + "GetMetrics", {})
    assert gm["resource_usage"]["writes"] == 1
    assert gm["resource_usage"]["queries"] == 0


def test_proto_auth_plane(engine):
    from miniodb_spark.auth import TokenManager

    svc = MiniODBService(engine, auth=TokenManager("k", {"api": "sec"}))
    tok = _call(svc, A + "GetToken", {"api_key": "api", "secret": "sec"})
    assert tok["access_token"] and tok["token_type"] == "Bearer"
    ref = _call(svc, A + "RefreshToken",
                {"refresh_token": tok["refresh_token"]})
    assert ref["access_token"] != tok["access_token"]
    out = _call(svc, A + "RevokeToken", {"token": ref["access_token"]})
    assert out["success"]


def test_stream_write_client_streaming_dispatch(engine):
    """StreamWrite is client-streaming on the wire (miniodb.proto:20):
    the dispatcher drains N binary request messages and answers one
    aggregate response."""
    from miniodb_spark.grpc_server import dispatch_proto_stream_write

    svc = MiniODBService(engine)
    req_schema, resp_schema = pw.METHOD_IO[M + "StreamWrite"]
    frames = [
        pw.encode_message(req_schema, {
            "table": "sw",
            "records": [{"id": f"r{b}-{i}", "timestamp": T0,
                         "payload": {"v": float(i)}} for i in range(3)],
        })
        for b in range(4)
    ]
    out = pw.decode_message(
        resp_schema, dispatch_proto_stream_write(svc, iter(frames)))
    assert out["success"] is True
    assert out["records_count"] == 12 and out["errors"] == []
    rows = json.loads(_call(svc, M + "QueryData", {
        "sql": "SELECT count(*) AS n FROM sw"})["result_json"])
    assert rows == [{"n": 12}]
    # regression: proto DataRecord timestamps must be STORED, not
    # silently replaced with server time (the two write paths used
    # different key spellings for the microsecond timestamp)
    rows = json.loads(_call(svc, M + "QueryData", {
        "sql": f"SELECT count(*) AS n FROM sw "
               f"WHERE unix_micros(timestamp) = {T0}"})["result_json"])
    assert rows == [{"n": 12}]
    # a bad batch mid-stream is recorded, the rest still lands
    bad = pw.encode_message(req_schema, {"table": "", "records": [
        {"id": "x", "payload": {"v": 1}}]})
    out = pw.decode_message(resp_schema, dispatch_proto_stream_write(
        svc, iter([frames[0], bad])))
    assert out["success"] is False and len(out["errors"]) == 1
    assert out["records_count"] == 3


def test_stream_query_server_streaming_dispatch(engine):
    """StreamQuery is server-streaming (miniodb.proto:21): one request,
    a page per response message, cursor-advanced until exhausted."""
    from miniodb_spark.grpc_server import dispatch_proto_stream_query

    svc = MiniODBService(engine)
    for i in range(7):
        svc.write_data("sq", {"id": f"r{i}", "timestamp": T0,
                              "payload": {"v": i}})
    req_schema, resp_schema = pw.METHOD_IO[M + "StreamQuery"]
    req = pw.encode_message(req_schema, {
        "sql": "SELECT id FROM sq ORDER BY id", "batch_size": 3})
    pages = [pw.decode_message(resp_schema, b)
             for b in dispatch_proto_stream_query(svc, req)]
    assert [len(p["records"]) for p in pages] == [3, 3, 1]
    assert [p["has_more"] for p in pages] == [True, True, False]
    ids = [r["id"] for p in pages for r in p["records"]]
    assert ids == [f"r{i}" for i in range(7)]
