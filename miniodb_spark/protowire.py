"""Pure-python protobuf wire codec for the ``miniodb.v1`` surface.

The reference's primary interface is protobuf over gRPC
(/root/reference/api/proto/miniodb/v1/miniodb.proto:53-413). This
sandbox carries neither ``protoc`` nor the ``protobuf`` runtime, so the
codec is hand-rolled against the public protobuf wire-format spec
(https://protobuf.dev/programming-guides/encoding/): messages are a
sequence of ``(tag, value)`` pairs where ``tag = (field_number << 3) |
wire_type`` and the wire types used by the miniodb.v1 messages are

  0  VARINT           bool / int32 / int64 / enum
  1  I64              double
  2  LEN              string / bytes / nested message / map entry

No other wire types appear (the proto has no float/fixed32/sfixed/
sint fields and no packed numeric repeateds). Unknown fields are
skipped on decode per the spec, so newer clients degrade gracefully.

Message schemas are declared as plain dicts — ``{field_number:
(name, kind)}`` — mirroring the proto line-for-line. Two well-known
types get engine-convention mappings:

- ``google.protobuf.Timestamp`` <-> int microseconds since epoch (the
  engine's timestamp convention everywhere, matching the reference's
  ``AsTime().UnixMicro()`` at internal/ingest/ingest.go:63).
- ``google.protobuf.Struct`` <-> plain dict. Like the reference's Go
  ``structpb`` (``payload.AsMap()``), ALL numbers decode as float —
  protobuf Struct has a single ``number_value`` (double) kind, so an
  integer payload value round-trips as an integral float. The engine's
  type inference widens long->double identically (schema.merge_type),
  so this matches reference semantics, not just protobuf's.

proto3 presence semantics: scalar fields at their default value
(0 / "" / False / empty) are omitted on encode and materialized on
decode, so ``decode(S, encode(S, d))`` yields a dict with every scalar
field present. Message-typed fields absent on the wire decode as None.
"""

from __future__ import annotations

import struct
from typing import Any

# ---------------------------------------------------------------------------
# wire primitives
# ---------------------------------------------------------------------------

_MASK64 = (1 << 64) - 1


def encode_uvarint(n: int) -> bytes:
    """LEB128 base-128 varint (protobuf encoding.md#varints)."""
    if n < 0:
        raise ValueError("uvarint requires n >= 0")
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def decode_uvarint(data: bytes, pos: int) -> tuple[int, int]:
    """Returns (value, next_pos). Bounded at 10 bytes (64-bit)."""
    result = 0
    shift = 0
    while True:
        if pos >= len(data):
            raise ValueError("truncated varint")
        if shift >= 70:
            raise ValueError("varint too long")
        b = data[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _encode_signed(n: int) -> bytes:
    """int32/int64 on the wire: two's-complement 64-bit varint (negative
    values always take 10 bytes — protobuf semantics, not zigzag)."""
    return encode_uvarint(n & _MASK64)


def _decode_signed(n: int) -> int:
    return n - (1 << 64) if n >= (1 << 63) else n


def _tag(field_number: int, wire_type: int) -> bytes:
    return encode_uvarint((field_number << 3) | wire_type)


def _len_delimited(payload: bytes) -> bytes:
    return encode_uvarint(len(payload)) + payload


def _skip_field(data: bytes, pos: int, wire_type: int) -> int:
    """Skip an unknown field (spec: unknown fields are preserved or
    dropped, never an error)."""
    if wire_type == 0:
        _, pos = decode_uvarint(data, pos)
        return pos
    if wire_type == 1:
        return pos + 8
    if wire_type == 2:
        n, pos = decode_uvarint(data, pos)
        return pos + n
    if wire_type == 5:
        return pos + 4
    raise ValueError(f"unsupported wire type {wire_type}")


# ---------------------------------------------------------------------------
# google.protobuf.Struct / Value / ListValue  (struct.proto)
# ---------------------------------------------------------------------------
# Struct    { map<string, Value> fields = 1; }
# Value     { oneof kind { NullValue null_value = 1; double number_value = 2;
#             string string_value = 3; bool bool_value = 4;
#             Struct struct_value = 5; ListValue list_value = 6; } }
# ListValue { repeated Value values = 1; }


def _encode_value(v: Any) -> bytes:
    if v is None:
        return _tag(1, 0) + encode_uvarint(0)  # NullValue.NULL_VALUE
    if isinstance(v, bool):  # bool before int: True is an int in Python
        return _tag(4, 0) + encode_uvarint(1 if v else 0)
    if isinstance(v, (int, float)):
        return _tag(2, 1) + struct.pack("<d", float(v))
    if isinstance(v, str):
        return _tag(3, 2) + _len_delimited(v.encode("utf-8"))
    if isinstance(v, dict):
        return _tag(5, 2) + _len_delimited(encode_struct(v))
    if isinstance(v, (list, tuple)):
        body = b"".join(
            _tag(1, 2) + _len_delimited(_encode_value(x)) for x in v
        )
        return _tag(6, 2) + _len_delimited(body)
    # last-resort stringification — mirrors the engine's ingest fallback
    # (reference concurrent_buffer.go:576-592 stringifies unknown types)
    return _tag(3, 2) + _len_delimited(str(v).encode("utf-8"))


def _decode_value(data: bytes) -> Any:
    pos, out = 0, None
    while pos < len(data):
        key, pos = decode_uvarint(data, pos)
        fno, wt = key >> 3, key & 7
        if fno == 1 and wt == 0:  # null_value
            _, pos = decode_uvarint(data, pos)
            out = None
        elif fno == 2 and wt == 1:  # number_value
            if pos + 8 > len(data):
                raise ValueError("truncated number_value")
            out = struct.unpack_from("<d", data, pos)[0]
            pos += 8
        elif fno == 3 and wt == 2:  # string_value
            n, pos = decode_uvarint(data, pos)
            out = data[pos:pos + n].decode("utf-8")
            pos += n
        elif fno == 4 and wt == 0:  # bool_value
            b, pos = decode_uvarint(data, pos)
            out = bool(b)
        elif fno == 5 and wt == 2:  # struct_value
            n, pos = decode_uvarint(data, pos)
            out = decode_struct(data[pos:pos + n])
            pos += n
        elif fno == 6 and wt == 2:  # list_value
            n, pos = decode_uvarint(data, pos)
            out = _decode_list(data[pos:pos + n])
            pos += n
        else:
            pos = _skip_field(data, pos, wt)
    return out


def _decode_list(data: bytes) -> list:
    pos, items = 0, []
    while pos < len(data):
        key, pos = decode_uvarint(data, pos)
        if key >> 3 == 1 and key & 7 == 2:
            n, pos = decode_uvarint(data, pos)
            items.append(_decode_value(data[pos:pos + n]))
            pos += n
        else:
            pos = _skip_field(data, pos, key & 7)
    return items


def encode_struct(d: dict) -> bytes:
    out = bytearray()
    for k, v in d.items():
        entry = (_tag(1, 2) + _len_delimited(str(k).encode("utf-8"))
                 + _tag(2, 2) + _len_delimited(_encode_value(v)))
        out += _tag(1, 2) + _len_delimited(entry)
    return bytes(out)


def decode_struct(data: bytes) -> dict:
    pos, out = 0, {}
    while pos < len(data):
        key, pos = decode_uvarint(data, pos)
        if key >> 3 == 1 and key & 7 == 2:
            n, pos = decode_uvarint(data, pos)
            entry = data[pos:pos + n]
            pos += n
            ep, k, v = 0, "", None
            while ep < len(entry):
                ek, ep = decode_uvarint(entry, ep)
                if ek >> 3 == 1 and ek & 7 == 2:
                    m, ep = decode_uvarint(entry, ep)
                    k = entry[ep:ep + m].decode("utf-8")
                    ep += m
                elif ek >> 3 == 2 and ek & 7 == 2:
                    m, ep = decode_uvarint(entry, ep)
                    v = _decode_value(entry[ep:ep + m])
                    ep += m
                else:
                    ep = _skip_field(entry, ep, ek & 7)
            out[k] = v
        else:
            pos = _skip_field(data, pos, key & 7)
    return out


# ---------------------------------------------------------------------------
# google.protobuf.Timestamp <-> int microseconds
# ---------------------------------------------------------------------------
# Timestamp { int64 seconds = 1; int32 nanos = 2; }


def encode_timestamp_us(us: int) -> bytes:
    seconds, rem_us = divmod(int(us), 1_000_000)
    out = b""
    if seconds:
        out += _tag(1, 0) + _encode_signed(seconds)
    nanos = rem_us * 1000
    if nanos:
        out += _tag(2, 0) + _encode_signed(nanos)
    return out


def decode_timestamp_us(data: bytes) -> int:
    pos, seconds, nanos = 0, 0, 0
    while pos < len(data):
        key, pos = decode_uvarint(data, pos)
        if key >> 3 == 1 and key & 7 == 0:
            n, pos = decode_uvarint(data, pos)
            seconds = _decode_signed(n)
        elif key >> 3 == 2 and key & 7 == 0:
            n, pos = decode_uvarint(data, pos)
            nanos = _decode_signed(n)
        else:
            pos = _skip_field(data, pos, key & 7)
    return seconds * 1_000_000 + nanos // 1000


# ---------------------------------------------------------------------------
# schema-driven message codec
# ---------------------------------------------------------------------------
# kind grammar:
#   "string" | "bytes" | "bool" | "int32" | "int64" | "double"
#   "timestamp"             -> int µs (None/0 omitted)
#   "struct"                -> dict
#   ("msg", SCHEMA)         -> nested dict
#   ("rep", kind)           -> list of kind
#   ("map", "string", kind) -> dict (wire: repeated {1: key, 2: value})

_SCALAR_DEFAULTS = {"string": "", "bytes": b"", "bool": False,
                    "int32": 0, "int64": 0, "double": 0.0}


def _encode_single(fno: int, kind, v) -> bytes:
    if kind == "string":
        return _tag(fno, 2) + _len_delimited(str(v).encode("utf-8"))
    if kind == "bytes":
        return _tag(fno, 2) + _len_delimited(bytes(v))
    if kind == "bool":
        return _tag(fno, 0) + encode_uvarint(1 if v else 0)
    if kind in ("int32", "int64"):
        return _tag(fno, 0) + _encode_signed(int(v))
    if kind == "double":
        return _tag(fno, 1) + struct.pack("<d", float(v))
    if kind == "timestamp":
        return _tag(fno, 2) + _len_delimited(encode_timestamp_us(int(v)))
    if kind == "struct":
        return _tag(fno, 2) + _len_delimited(encode_struct(v))
    if isinstance(kind, tuple) and kind[0] == "msg":
        return _tag(fno, 2) + _len_delimited(encode_message(kind[1], v))
    raise ValueError(f"unknown kind {kind!r}")


def _is_default(kind, v) -> bool:
    if v is None:
        return True
    if isinstance(kind, str) and kind in _SCALAR_DEFAULTS:
        return v == _SCALAR_DEFAULTS[kind]
    if kind == "timestamp":
        return not v
    if kind == "struct":
        return False  # empty Struct is still an explicit message
    return False


def encode_message(schema: dict, obj: dict | None) -> bytes:
    """dict -> wire bytes. Fields absent from ``obj`` or at their proto3
    default are omitted (standard proto3 serialization)."""
    obj = obj or {}
    out = bytearray()
    for fno in sorted(schema):
        name, kind = schema[fno]
        v = obj.get(name)
        if v is None:
            continue
        if isinstance(kind, tuple) and kind[0] == "rep":
            for item in v:
                out += _encode_single(fno, kind[1], item)
        elif isinstance(kind, tuple) and kind[0] == "map":
            _, _kk, vk = kind
            for k, mv in v.items():
                entry = _encode_single(1, "string", k)
                if not _is_default(vk, mv):
                    entry += _encode_single(2, vk, mv)
                out += _tag(fno, 2) + _len_delimited(entry)
        elif not _is_default(kind, v):
            out += _encode_single(fno, kind, v)
    return bytes(out)


def _decode_payload(kind, data: bytes, pos: int, wt: int):
    """Decode one occurrence of a field; returns (value, next_pos)."""
    if kind == "bool":
        n, pos = decode_uvarint(data, pos)
        return bool(n), pos
    if kind in ("int32", "int64"):
        n, pos = decode_uvarint(data, pos)
        return _decode_signed(n), pos
    if kind == "double":
        if pos + 8 > len(data):
            raise ValueError("truncated double field")
        return struct.unpack_from("<d", data, pos)[0], pos + 8
    # everything else is length-delimited
    if wt != 2:
        raise ValueError(f"wire type {wt} for LEN field")
    n, pos = decode_uvarint(data, pos)
    chunk = data[pos:pos + n]
    pos += n
    if kind == "string":
        return chunk.decode("utf-8"), pos
    if kind == "bytes":
        return chunk, pos
    if kind == "timestamp":
        return decode_timestamp_us(chunk), pos
    if kind == "struct":
        return decode_struct(chunk), pos
    if isinstance(kind, tuple) and kind[0] == "msg":
        return decode_message(kind[1], chunk), pos
    raise ValueError(f"unknown kind {kind!r}")


def decode_message(schema: dict, data: bytes) -> dict:
    """wire bytes -> dict with proto3 defaults materialized for scalars,
    [] for repeateds, {} for maps, None for absent sub-messages."""
    out: dict[str, Any] = {}
    for fno in sorted(schema):
        name, kind = schema[fno]
        if isinstance(kind, tuple) and kind[0] == "rep":
            out[name] = []
        elif isinstance(kind, tuple) and kind[0] == "map":
            out[name] = {}
        elif isinstance(kind, str) and kind in _SCALAR_DEFAULTS:
            out[name] = _SCALAR_DEFAULTS[kind]
        else:
            out[name] = None
    pos = 0
    while pos < len(data):
        key, pos = decode_uvarint(data, pos)
        fno, wt = key >> 3, key & 7
        entry = schema.get(fno)
        if entry is None:
            pos = _skip_field(data, pos, wt)
            continue
        name, kind = entry
        if isinstance(kind, tuple) and kind[0] == "rep":
            v, pos = _decode_payload(kind[1], data, pos, wt)
            out[name].append(v)
        elif isinstance(kind, tuple) and kind[0] == "map":
            _, _kk, vk = kind
            n, pos = decode_uvarint(data, pos)
            entry_bytes = data[pos:pos + n]
            pos += n
            ep, k, v = 0, "", _SCALAR_DEFAULTS.get(vk)
            while ep < len(entry_bytes):
                ek, ep = decode_uvarint(entry_bytes, ep)
                if ek >> 3 == 1:
                    k, ep = _decode_payload("string", entry_bytes, ep, ek & 7)
                elif ek >> 3 == 2:
                    v, ep = _decode_payload(vk, entry_bytes, ep, ek & 7)
                else:
                    ep = _skip_field(entry_bytes, ep, ek & 7)
            out[name][k] = v
        else:
            out[name], pos = _decode_payload(kind, data, pos, wt)
    return out


# ---------------------------------------------------------------------------
# miniodb.v1 message schemas (miniodb.proto:53-413, field-for-field)
# ---------------------------------------------------------------------------

DATA_RECORD = {1: ("id", "string"), 2: ("timestamp", "timestamp"),
               3: ("payload", "struct")}

WRITE_DATA_REQUEST = {1: ("table", "string"),
                      2: ("data", ("msg", DATA_RECORD))}
WRITE_DATA_RESPONSE = {1: ("success", "bool"), 2: ("message", "string"),
                       3: ("node_id", "string")}

QUERY_DATA_REQUEST = {1: ("sql", "string"), 2: ("limit", "int32"),
                      3: ("cursor", "string")}
QUERY_DATA_RESPONSE = {1: ("result_json", "string"), 2: ("has_more", "bool"),
                       3: ("next_cursor", "string")}

UPDATE_DATA_REQUEST = {1: ("table", "string"), 2: ("id", "string"),
                       3: ("payload", "struct"),
                       4: ("timestamp", "timestamp")}
UPDATE_DATA_RESPONSE = WRITE_DATA_RESPONSE

DELETE_DATA_REQUEST = {1: ("table", "string"), 2: ("id", "string"),
                       3: ("soft_delete", "bool")}
DELETE_DATA_RESPONSE = {1: ("success", "bool"), 2: ("message", "string"),
                        3: ("deleted_count", "int32")}

STREAM_WRITE_REQUEST = {1: ("records", ("rep", ("msg", DATA_RECORD))),
                        2: ("table", "string")}
STREAM_WRITE_RESPONSE = {1: ("success", "bool"),
                         2: ("records_count", "int64"),
                         3: ("errors", ("rep", "string"))}

STREAM_QUERY_REQUEST = {1: ("sql", "string"), 2: ("batch_size", "int32"),
                        3: ("cursor", "string")}
STREAM_QUERY_RESPONSE = {1: ("records", ("rep", ("msg", DATA_RECORD))),
                         2: ("has_more", "bool"), 3: ("cursor", "string")}

ID_VALIDATION_RULES = {1: ("max_length", "int32"), 2: ("pattern", "string"),
                       3: ("allowed_chars", "string")}
TABLE_CONFIG = {1: ("buffer_size", "int32"),
                2: ("flush_interval_seconds", "int32"),
                3: ("retention_days", "int32"),
                4: ("backup_enabled", "bool"),
                5: ("properties", ("map", "string", "string")),
                6: ("id_strategy", "string"),
                7: ("id_prefix", "string"),
                8: ("auto_generate_id", "bool"),
                9: ("id_validation", ("msg", ID_VALIDATION_RULES))}

CREATE_TABLE_REQUEST = {1: ("table_name", "string"),
                        2: ("config", ("msg", TABLE_CONFIG)),
                        3: ("if_not_exists", "bool")}
CREATE_TABLE_RESPONSE = {1: ("success", "bool"), 2: ("message", "string")}

LIST_TABLES_REQUEST = {1: ("pattern", "string")}
TABLE_STATS = {1: ("record_count", "int64"), 2: ("file_count", "int64"),
               3: ("size_bytes", "int64"),
               4: ("oldest_record", "timestamp"),
               5: ("newest_record", "timestamp")}
TABLE_INFO = {1: ("name", "string"), 2: ("config", ("msg", TABLE_CONFIG)),
              3: ("created_at", "timestamp"), 4: ("last_write", "timestamp"),
              5: ("status", "string"), 6: ("stats", ("msg", TABLE_STATS))}
LIST_TABLES_RESPONSE = {1: ("tables", ("rep", ("msg", TABLE_INFO))),
                        2: ("total", "int32")}

GET_TABLE_REQUEST = {1: ("table_name", "string")}
GET_TABLE_RESPONSE = {1: ("table_info", ("msg", TABLE_INFO))}

DELETE_TABLE_REQUEST = {1: ("table_name", "string"), 2: ("if_exists", "bool"),
                        3: ("cascade", "bool")}
DELETE_TABLE_RESPONSE = {1: ("success", "bool"), 2: ("message", "string"),
                         3: ("files_deleted", "int32")}

BACKUP_METADATA_REQUEST = {1: ("force", "bool")}
BACKUP_METADATA_RESPONSE = {1: ("success", "bool"), 2: ("message", "string"),
                            3: ("backup_id", "string"),
                            4: ("timestamp", "timestamp")}

RESTORE_METADATA_REQUEST = {1: ("backup_file", "string"),
                            2: ("from_latest", "bool"),
                            3: ("dry_run", "bool"), 4: ("overwrite", "bool"),
                            5: ("validate", "bool"), 6: ("parallel", "bool"),
                            7: ("filters", ("map", "string", "string")),
                            8: ("key_patterns", ("rep", "string"))}
RESTORE_METADATA_RESPONSE = {1: ("success", "bool"), 2: ("message", "string"),
                             3: ("backup_file", "string"),
                             4: ("entries_total", "int32"),
                             5: ("entries_ok", "int32"),
                             6: ("entries_skipped", "int32"),
                             7: ("entries_error", "int32"),
                             8: ("duration", "string"),
                             9: ("errors", ("rep", "string")),
                             10: ("details", ("map", "string", "string"))}

LIST_BACKUPS_REQUEST = {1: ("days", "int32")}
BACKUP_INFO = {1: ("object_name", "string"), 2: ("node_id", "string"),
               3: ("timestamp", "timestamp"), 4: ("size", "int64"),
               5: ("last_modified", "timestamp")}
LIST_BACKUPS_RESPONSE = {1: ("backups", ("rep", ("msg", BACKUP_INFO))),
                         2: ("total", "int32")}

GET_METADATA_STATUS_REQUEST: dict = {}
GET_METADATA_STATUS_RESPONSE = {1: ("node_id", "string"),
                                2: ("backup_status",
                                    ("map", "string", "string")),
                                3: ("last_backup", "timestamp"),
                                4: ("next_backup", "timestamp"),
                                5: ("health_status", "string")}

HEALTH_CHECK_REQUEST: dict = {}
HEALTH_CHECK_RESPONSE = {1: ("status", "string"),
                         2: ("timestamp", "timestamp"),
                         3: ("version", "string"),
                         4: ("details", ("map", "string", "string"))}

GET_STATUS_REQUEST: dict = {}
NODE_INFO = {1: ("id", "string"), 2: ("status", "string"),
             3: ("type", "string"), 4: ("address", "string"),
             5: ("last_seen", "int64")}
GET_STATUS_RESPONSE = {1: ("timestamp", "timestamp"),
                       2: ("buffer_stats", ("map", "string", "int64")),
                       3: ("redis_stats", ("map", "string", "int64")),
                       4: ("minio_stats", ("map", "string", "int64")),
                       5: ("nodes", ("rep", ("msg", NODE_INFO))),
                       6: ("total_nodes", "int32")}

GET_METRICS_REQUEST: dict = {}
GET_METRICS_RESPONSE = {1: ("timestamp", "timestamp"),
                        2: ("performance_metrics",
                            ("map", "string", "double")),
                        3: ("resource_usage", ("map", "string", "int64")),
                        4: ("system_info", ("map", "string", "string"))}

GET_TOKEN_REQUEST = {1: ("api_key", "string"), 2: ("secret", "string")}
TOKEN_PAIR_RESPONSE = {1: ("access_token", "string"),
                       2: ("refresh_token", "string"),
                       3: ("expires_in", "int64"),
                       4: ("token_type", "string")}
REFRESH_TOKEN_REQUEST = {1: ("refresh_token", "string")}
REVOKE_TOKEN_REQUEST = {1: ("token", "string")}
REVOKE_TOKEN_RESPONSE = {1: ("success", "bool"), 2: ("message", "string")}


def _m(name: str) -> str:
    return f"miniodb.v1.MinIODBService/{name}"


def _a(name: str) -> str:
    return f"miniodb.v1.AuthService/{name}"


# full method name -> (request schema, response schema)
METHOD_IO: dict[str, tuple[dict, dict]] = {
    _m("WriteData"): (WRITE_DATA_REQUEST, WRITE_DATA_RESPONSE),
    _m("QueryData"): (QUERY_DATA_REQUEST, QUERY_DATA_RESPONSE),
    _m("UpdateData"): (UPDATE_DATA_REQUEST, UPDATE_DATA_RESPONSE),
    _m("DeleteData"): (DELETE_DATA_REQUEST, DELETE_DATA_RESPONSE),
    _m("StreamWrite"): (STREAM_WRITE_REQUEST, STREAM_WRITE_RESPONSE),
    _m("StreamQuery"): (STREAM_QUERY_REQUEST, STREAM_QUERY_RESPONSE),
    _m("CreateTable"): (CREATE_TABLE_REQUEST, CREATE_TABLE_RESPONSE),
    _m("ListTables"): (LIST_TABLES_REQUEST, LIST_TABLES_RESPONSE),
    _m("GetTable"): (GET_TABLE_REQUEST, GET_TABLE_RESPONSE),
    _m("DeleteTable"): (DELETE_TABLE_REQUEST, DELETE_TABLE_RESPONSE),
    _m("BackupMetadata"): (BACKUP_METADATA_REQUEST,
                           BACKUP_METADATA_RESPONSE),
    _m("RestoreMetadata"): (RESTORE_METADATA_REQUEST,
                            RESTORE_METADATA_RESPONSE),
    _m("ListBackups"): (LIST_BACKUPS_REQUEST, LIST_BACKUPS_RESPONSE),
    _m("GetMetadataStatus"): (GET_METADATA_STATUS_REQUEST,
                              GET_METADATA_STATUS_RESPONSE),
    _m("HealthCheck"): (HEALTH_CHECK_REQUEST, HEALTH_CHECK_RESPONSE),
    _m("GetStatus"): (GET_STATUS_REQUEST, GET_STATUS_RESPONSE),
    _m("GetMetrics"): (GET_METRICS_REQUEST, GET_METRICS_RESPONSE),
    _a("GetToken"): (GET_TOKEN_REQUEST, TOKEN_PAIR_RESPONSE),
    _a("RefreshToken"): (REFRESH_TOKEN_REQUEST, TOKEN_PAIR_RESPONSE),
    _a("RevokeToken"): (REVOKE_TOKEN_REQUEST, REVOKE_TOKEN_RESPONSE),
}
