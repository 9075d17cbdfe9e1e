"""Dynamic schema inference + column-name sanitization.

The reference has no user-declared schemas: each flushed batch gets a
parquet schema inferred from the union of its rows' field keys, typed
from the first-seen value, with sanitized + collision-suffixed column
names (/root/reference/internal/buffer/concurrent_buffer.go:521-655,
560-592). Semantics re-expressed here for Spark ``StructType``:

- fixed system columns (required): id STRING, timestamp TIMESTAMP,
  table_name STRING;
- dynamic columns (nullable): bool → BooleanType, int → LongType,
  float → DoubleType, everything else (strings, nested maps/lists)
  → StringType (nested values JSON-stringified);
- names: lowercased, non-``[a-z0-9_]`` replaced with ``_``, leading
  digit prefixed with ``_``, empty → ``_col``; collisions with each
  other or the reserved system names get ``_2``, ``_3``… suffixes
  assigned in deterministic sorted order of the original keys.
"""

from __future__ import annotations

import json
import re
from datetime import datetime, timezone
from typing import Any

from pyspark.sql import types as T

SYSTEM_COLUMNS = ("id", "timestamp", "table_name")
# partition column added by our layout (not in the reference's row shape)
DT_COLUMN = "dt"

_SANITIZE_RE = re.compile(r"[^a-z0-9_]")


def sanitize_column_name(name: str) -> str:
    s = _SANITIZE_RE.sub("_", name.lower())
    if not s:
        return "_col"
    if s[0].isdigit():
        s = "_" + s
    return s


def resolve_field_names(keys: list[str]) -> dict[str, str]:
    """Map original field keys → final sanitized column names with
    deterministic collision suffixes (reference concurrent_buffer.go:594-655).

    Keys are processed in sorted order; a sanitized name that collides
    with a system column or an already-assigned name gets ``_2``,
    ``_3``… appended."""
    taken: set[str] = set(SYSTEM_COLUMNS) | {DT_COLUMN}
    mapping: dict[str, str] = {}
    for key in sorted(keys):
        base = sanitize_column_name(key)
        candidate = base
        n = 2
        while candidate in taken:
            candidate = f"{base}_{n}"
            n += 1
        taken.add(candidate)
        mapping[key] = candidate
    return mapping


def infer_spark_type(value: Any) -> T.DataType:
    """First-seen-value typing (reference concurrent_buffer.go:576-592)."""
    if isinstance(value, bool):  # bool before int: bool is an int subclass
        return T.BooleanType()
    if isinstance(value, int):
        return T.LongType()
    if isinstance(value, float):
        return T.DoubleType()
    return T.StringType()


def coerce_value(value: Any, dtype: T.DataType) -> Any:
    """Coerce a payload value to its inferred column type; non-scalar
    values are JSON-stringified (matching the reference's UTF8
    stringification of nested maps/lists)."""
    if value is None:
        return None
    if isinstance(dtype, T.BooleanType):
        return bool(value)
    if isinstance(dtype, T.LongType):
        try:
            v = int(value)
        except (TypeError, ValueError):
            return None
        # int64 range guard: the flush path hands these tuples to
        # createDataFrame with verifySchema=False (the coercions here
        # already guarantee the schema's types — r17), so the range
        # check PySpark's row verifier used to do must happen here to
        # keep the same contract: an unrepresentable long fails the
        # flush loudly (rows requeued, WAL intact) instead of
        # overflowing silently in the JVM.
        if not (-(1 << 63) <= v < (1 << 63)):
            raise ValueError(
                f"object of LongType out of range: {value!r}")
        return v
    if isinstance(dtype, T.DoubleType):
        try:
            return float(value)
        except (TypeError, ValueError):
            return None
    # StringType
    if isinstance(value, str):
        return value
    if isinstance(value, (dict, list)):
        return json.dumps(value, separators=(",", ":"), ensure_ascii=False, default=str)
    return str(value)


def infer_batch_schema(rows: list[dict]) -> tuple[T.StructType, dict[str, str]]:
    """Schema for one flush batch: system columns + the union of all
    dynamic field keys, typed from the first-seen non-null value.

    ``rows`` are buffer rows: {"id", "timestamp" (µs int or datetime),
    "table_name", "fields": {...}}. Returns (schema, key→column map)."""
    field_types: dict[str, T.DataType] = {}
    order: list[str] = []
    for row in rows:
        for key, value in (row.get("fields") or {}).items():
            if key not in field_types:
                order.append(key)
                field_types[key] = infer_spark_type(value) if value is not None else None
            elif field_types[key] is None and value is not None:
                field_types[key] = infer_spark_type(value)
    for key in order:
        if field_types[key] is None:  # all-null column
            field_types[key] = T.StringType()

    name_map = resolve_field_names(order)

    struct = [
        T.StructField("id", T.StringType(), False),
        T.StructField("timestamp", T.TimestampType(), False),
        T.StructField("table_name", T.StringType(), False),
    ]
    # deterministic column order: sorted original keys (same order the
    # collision resolver assigns suffixes in)
    for key in sorted(order):
        struct.append(T.StructField(name_map[key], field_types[key], True))
    return T.StructType(struct), name_map


def micros_to_datetime(us: int) -> datetime:
    return datetime.fromtimestamp(us / 1_000_000, tz=timezone.utc)


def to_row_tuple(row: dict, schema: T.StructType, name_map: dict[str, str]) -> tuple:
    """Buffer row dict → tuple matching ``schema`` field order."""
    ts = row["timestamp"]
    if isinstance(ts, int):
        ts = micros_to_datetime(ts)
    elif ts is None:
        # non-nullable system column; with verifySchema=False (see
        # coerce_value) this guard replaces the row verifier's
        # nullability error — same failure, same flush-requeue path
        # (a caller CAN pass an explicit timestamp_us=None through
        # the merge API's .get(..., default) lookups).
        raise ValueError("timestamp must not be None")
    fields = row.get("fields") or {}
    if row.get("table_name") is None:
        raise ValueError("table_name must not be None")
    # reverse map: column name -> original key
    rev = {v: k for k, v in name_map.items()}
    out: list[Any] = []
    for f in schema.fields:
        if f.name == "id":
            out.append(str(row["id"]) if row.get("id") else "_")
        elif f.name == "timestamp":
            out.append(ts)
        elif f.name == "table_name":
            out.append(row["table_name"])
        else:
            out.append(coerce_value(fields.get(rev[f.name]), f.dataType))
    return tuple(out)


def _pa_type(dtype: T.DataType):
    """Arrow equivalent of a dynamic-schema column type (the inference
    above only ever produces these five)."""
    import pyarrow as pa

    if isinstance(dtype, T.TimestampType):
        # session + process tz are pinned UTC (session._pin_process_utc);
        # to_row_tuple emits aware-UTC datetimes
        return pa.timestamp("us", tz="UTC")
    if isinstance(dtype, T.LongType):
        return pa.int64()
    if isinstance(dtype, T.DoubleType):
        return pa.float64()
    if isinstance(dtype, T.BooleanType):
        return pa.bool_()
    if isinstance(dtype, T.StringType):
        return pa.string()
    raise TypeError(f"no arrow mapping for {dtype}")  # -> tuple fallback


# Arrow-path fallback telemetry (r17 verdict watch-item 3 / r18): the
# tuple fallback is ~2× slower per flush — correct but silently so. A
# systematic Arrow failure (pyarrow upgrade, new column type) would
# halve write throughput with no signal; these counters make it visible
# to ops/BENCH_NOTES forensics, and the engine-e2e test pins that they
# increment. Plain ints under the engine's per-table flush lock are
# adequate (a racing concurrent flush can at worst undercount by one —
# telemetry, not accounting).
ARROW_FALLBACK_COUNT = 0
ARROW_FALLBACK_LAST: str | None = None


def batch_dataframe(spark, row_dicts: list[dict], schema: T.StructType,
                    name_map: dict[str, str]):
    """Flush batch → DataFrame: coerce rows with :func:`to_row_tuple`
    (which enforces the schema contract — types, int64 range, non-null
    system columns), then hand the batch to the JVM as ONE columnar
    Arrow table instead of N pickled tuples (~2× faster per 20k-row
    flush, measured; optimization guide §4 — shrink the Python
    boundary). Result rows, schema and nullability are identical to
    ``createDataFrame(tuples, schema)`` — verified by the engine
    oracle suites. Any value Arrow cannot represent (e.g. a
    lone-surrogate string, which the pickled path ferries through to
    the JVM's U+FFFD replacement) falls back to the tuple path, so the
    Arrow conversion can only ever change speed, never results. The
    fallback is scoped to CONVERSION errors (Arrow encode failures,
    type mismatches, the unsupported-createDataFrame signature case) —
    a genuine Spark/Py4J failure propagates instead of being masked by
    a second, equally doomed conversion attempt (r17 ADVICE).

    The returned DataFrame carries ``_miniodb_est_bytes`` (the Arrow
    table's in-memory byte size) when the Arrow path was taken — the
    flush path uses it to pick its write shape driver-side (guide §8:
    decide with small metadata, move the rows once)."""
    global ARROW_FALLBACK_COUNT, ARROW_FALLBACK_LAST
    tuples = [to_row_tuple(d, schema, name_map) for d in row_dicts]
    try:
        import pyarrow as pa

        conversion_errors = (
            pa.lib.ArrowInvalid, pa.lib.ArrowTypeError,
            pa.lib.ArrowNotImplementedError, TypeError, ValueError,
            OverflowError,
        )
    except ImportError as exc:  # no pyarrow at all → tuple path
        ARROW_FALLBACK_COUNT += 1
        ARROW_FALLBACK_LAST = repr(exc)
        return spark.createDataFrame(tuples, schema, verifySchema=False)
    try:
        cols = list(zip(*tuples))
        arrays = [
            pa.array(col, type=_pa_type(f.dataType))
            for col, f in zip(cols, schema.fields)
        ]
        tbl = pa.Table.from_arrays(arrays,
                                   names=[f.name for f in schema.fields])
        df = spark.createDataFrame(tbl, schema=schema)
        df._miniodb_est_bytes = tbl.nbytes
        return df
    except conversion_errors as exc:
        ARROW_FALLBACK_COUNT += 1
        ARROW_FALLBACK_LAST = repr(exc)
        import logging

        logging.getLogger(__name__).warning(
            "batch_dataframe: Arrow path fell back to pickled tuples "
            "(%d so far this process): %r", ARROW_FALLBACK_COUNT, exc)
        return spark.createDataFrame(tuples, schema, verifySchema=False)
