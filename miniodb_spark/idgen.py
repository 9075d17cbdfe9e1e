"""ID generation strategies: uuid / snowflake / custom / user_provided.

Reference: /root/reference/pkg/idgen/{uuid,snowflake,custom}.go and the
resolution logic in internal/service/miniodb_service.go:551-601.
These run driver-side on the write API path; the bulk-ingest path can
use ``F.uuid()`` / ``F.monotonically_increasing_id()`` column
expressions instead (distributed, no driver round-trip).
"""

from __future__ import annotations

import re
import threading
import time
import uuid as _uuid

_EPOCH_MS = 1288834974657  # twitter snowflake epoch (public constant)


class SnowflakeGenerator:
    """64-bit: 41b timestamp-ms | 10b node id | 12b sequence."""

    def __init__(self, node_id: int = 0):
        self.node_id = node_id & 0x3FF
        self._lock = threading.Lock()
        self._last_ms = -1
        self._seq = 0

    def next_id(self) -> int:
        with self._lock:
            now = int(time.time() * 1000)
            if now == self._last_ms:
                self._seq = (self._seq + 1) & 0xFFF
                if self._seq == 0:
                    while now <= self._last_ms:
                        now = int(time.time() * 1000)
            else:
                self._seq = 0
            self._last_ms = now
            return ((now - _EPOCH_MS) << 22) | (self.node_id << 12) | self._seq


class IDGenerator:
    def __init__(self, node_id: int = 0):
        self._snowflake = SnowflakeGenerator(node_id)
        self._custom_counter = 0
        self._lock = threading.Lock()

    def generate(self, strategy: str, prefix: str = "") -> str:
        if strategy == "uuid":
            return str(_uuid.uuid4())
        if strategy == "snowflake":
            return str(self._snowflake.next_id())
        if strategy == "custom":
            with self._lock:
                self._custom_counter += 1
                return f"{prefix}{self._custom_counter:012d}"
        raise ValueError(f"unknown id strategy: {strategy}")


_ID_RE = re.compile(r"^[a-zA-Z0-9_-]+$")


def resolve_id(
    provided_id: str | None,
    strategy: str,
    auto_generate: bool,
    generator: IDGenerator,
    prefix: str = "",
    max_length: int = 255,
) -> str:
    """Reference miniodb_service.go:551-601: user_provided requires an
    id; other strategies generate when missing and auto_generate=True."""
    if provided_id:
        if len(provided_id) > max_length or not _ID_RE.match(provided_id):
            raise ValueError(f"invalid id: {provided_id!r}")
        return provided_id
    if strategy == "user_provided" or not auto_generate:
        raise ValueError("id required but not provided")
    return generator.generate(strategy, prefix)
