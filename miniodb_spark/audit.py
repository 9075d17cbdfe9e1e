"""Per-RPC audit logging — parity with the reference's audit subsystem.

Reference: /root/reference/internal/audit/audit.go:1-180 — an
append-only JSONL file of ``AuditEntry`` records ``{timestamp, action,
table, record_id, user_id, client_ip, details, success, error,
node_id, duration}``, written under a mutex by the service layer for
every mutating operation (write/update/delete), with an enabled flag.

This implementation keeps the reference's field shape and JSONL layout
and adds the durability trick proven by the CDC ``FileSink``
(streaming/cdc.py): every line carries a CRC32 of its own payload, so
replay after a crash skips torn/corrupt tail lines instead of dying on
them — an audit trail that cannot be replayed is not an audit trail.
Writes append + flush under a lock; ``fsync_every`` (default off)
trades throughput for per-entry durability like the WAL's synced mode.

Spark-first note: the audit stream is driver-side operational metadata
(one line per RPC, not per row) — it never touches the Spark plan. At
fleet scale each driver writes its own file keyed by node_id, and the
files are batch-loadable for analysis: ``load_df`` reads the JSONL
into a DataFrame so the audit trail is queryable through the same
engine it audits.
"""

from __future__ import annotations

import contextlib
import json
import os
import threading
import time
import zlib
from typing import Any, Iterator

ACTIONS = ("write", "update", "delete", "stream_write", "create_table",
           "delete_table", "optimize_table", "restore_metadata",
           "restore_data")


class AuditLogger:
    """Append-only, CRC-framed JSONL audit log (reference audit.go
    field shape). Thread-safe; disabled loggers are no-ops, mirroring
    the reference's ``enabled`` flag."""

    def __init__(self, path: str, node_id: str = "0", enabled: bool = True,
                 fsync_every: bool = False):
        self.path = path
        self.node_id = str(node_id)
        self.enabled = enabled
        self.fsync_every = fsync_every
        self._lock = threading.Lock()
        self._tail_checked = False  # torn-tail probe runs once per process
        if enabled:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    # -- write side ------------------------------------------------------

    def log(self, action: str, table: str = "", record_id: str = "",
            user_id: str = "", success: bool = True, error: str = "",
            details: dict[str, Any] | None = None,
            duration_ms: float | None = None) -> None:
        if not self.enabled:
            return
        entry: dict[str, Any] = {
            "timestamp": int(time.time() * 1_000_000),  # µs, engine-wide
            "action": action,
            "table": table,
            "record_id": str(record_id or ""),
            "user_id": user_id,
            "success": bool(success),
            "node_id": self.node_id,
        }
        if error:
            entry["error"] = str(error)[:500]
        if details:
            entry["details"] = details
        if duration_ms is not None:
            entry["duration_ms"] = round(duration_ms, 3)
        payload = json.dumps(entry, sort_keys=True, separators=(",", ":"))
        crc = zlib.crc32(payload.encode("utf-8")) & 0xFFFFFFFF
        line = f'{{"crc":{crc},"e":{payload}}}\n'
        with self._lock:
            # self-healing append: a crash can leave a torn final line
            # with no newline — appending straight onto it would glue
            # THIS record to the garbage and lose both. If the tail
            # isn't newline-terminated, start on a fresh line (the torn
            # fragment then fails its own CRC and only it is lost).
            # The probe runs ONCE per process: after our first locked
            # append the file is guaranteed newline-terminated, so the
            # hot path pays a single open per entry, not three.
            prefix = ""
            if not self._tail_checked:
                try:
                    if os.path.getsize(self.path) > 0:
                        with open(self.path, "rb") as rf:
                            rf.seek(-1, os.SEEK_END)
                            if rf.read(1) != b"\n":
                                prefix = "\n"
                except OSError:
                    pass
                self._tail_checked = True
            with open(self.path, "a", encoding="utf-8") as fh:
                fh.write(prefix + line)
                fh.flush()
                if self.fsync_every:
                    os.fsync(fh.fileno())

    @contextlib.contextmanager
    def audited(self, action: str, table: str = "", record_id: str = "",
                user_id: str = ""):
        """Wrap a mutating operation: logs success with duration, or
        failure with the error string, then re-raises. Yields a mutable
        dict — handlers fill ``record_id``/``details`` discovered
        mid-call (e.g. a generated id)."""
        ctx: dict[str, Any] = {"record_id": record_id, "details": None}
        t0 = time.perf_counter()
        try:
            yield ctx
        except Exception as exc:
            self.log(action, table, ctx["record_id"], user_id,
                     success=False, error=str(exc), details=ctx["details"],
                     duration_ms=(time.perf_counter() - t0) * 1000)
            raise
        self.log(action, table, ctx["record_id"], user_id, success=True,
                 details=ctx["details"],
                 duration_ms=(time.perf_counter() - t0) * 1000)

    # -- read / replay side ----------------------------------------------

    def replay(self) -> Iterator[dict[str, Any]]:
        """Yield valid entries in write order, skipping torn or
        corrupted lines (CRC mismatch, truncated JSON) — the FileSink
        tail-repair semantic."""
        if not os.path.exists(self.path):
            return
        with open(self.path, encoding="utf-8") as fh:
            for raw in fh:
                raw = raw.strip()
                if not raw:
                    continue
                try:
                    frame = json.loads(raw)
                    payload = json.dumps(frame["e"], sort_keys=True,
                                         separators=(",", ":"))
                    if zlib.crc32(payload.encode("utf-8")) & 0xFFFFFFFF != frame["crc"]:
                        continue
                    yield frame["e"]
                except (json.JSONDecodeError, KeyError, TypeError):
                    continue

    def read(self, table: str | None = None, action: str | None = None,
             user_id: str | None = None, limit: int = 100) -> list[dict]:
        """Filtered tail view (newest last), bounded by ``limit`` —
        the `/v1/audit` REST shape."""
        out = [
            e for e in self.replay()
            if (table is None or e.get("table") == table)
            and (action is None or e.get("action") == action)
            and (user_id is None or e.get("user_id") == user_id)
        ]
        return out[-max(1, int(limit)):]

    def load_df(self, spark):
        """The audit trail as a DataFrame — queryable through the same
        engine it audits (schema inferred over the validated entries;
        corrupt lines are already filtered by :meth:`replay`)."""
        rows = list(self.replay())
        if not rows:
            return spark.createDataFrame(
                [], "timestamp long, action string, table string, "
                    "record_id string, user_id string, success boolean, "
                    "node_id string")
        return spark.createDataFrame(rows)
