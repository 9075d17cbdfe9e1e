"""Query result cache with table-keyed invalidation.

Reference: /root/reference/internal/query/query_cache.go (Redis value
keyed ``query_cache:sha256(normalized_sql + "|" + tables)``, local LRU
mirror, TTL 30 min, per-table invalidation sets dropped on every
write/update/delete). Spark has no built-in result cache, so this
layer is genuinely custom: an in-process LRU with the same keying,
normalization and invalidation semantics. On a cluster the same class
can sit in the driver process of a long-running SQL service.
"""

from __future__ import annotations

import hashlib
import re
import threading
import time
from collections import OrderedDict
from typing import Any

_WS_RE = re.compile(r"\s+")


def normalize_sql(sql: str) -> str:
    """Collapse whitespace and lowercase everything *outside* string
    literals, preserving '' escapes (reference query_cache.go:265-316)."""
    out: list[str] = []
    i, n = 0, len(sql)
    while i < n:
        c = sql[i]
        if c == "'":
            j = i + 1
            while j < n:
                if sql[j] == "'":
                    if j + 1 < n and sql[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            out.append(sql[i : j + 1])
            i = j + 1
        elif c.isspace():
            if out and out[-1] != " ":
                out.append(" ")
            i += 1
        else:
            out.append(c.lower())
            i += 1
    return "".join(out).strip()


def cache_key(sql: str, tables: list[str]) -> str:
    basis = normalize_sql(sql) + "|" + ",".join(sorted(tables))
    return "query_cache:" + hashlib.sha256(basis.encode("utf-8")).hexdigest()


class QueryResultCache:
    """In-process LRU with optional cross-process invalidation.

    With ``version_store`` (a :class:`miniodb_spark.kv.TableVersionStore`
    on the shared store root), each entry records the version nonce of
    every table it read; a hit re-checks those nonces, so a mutation
    committed through *another* driver process on the same store is seen
    without any push channel — the multi-driver substitution for the
    reference's shared Redis cache keys + invalidation sets."""

    def __init__(self, max_entries: int = 1024, ttl_s: float = 1800.0,
                 version_store=None):
        self.max_entries = max_entries
        self.ttl_s = ttl_s
        self.version_store = version_store
        self._lock = threading.Lock()
        # key -> (monotonic_ts, value, {table: version_at_put})
        self._entries: OrderedDict[str, tuple[float, Any, dict]] = OrderedDict()
        self._by_table: dict[str, set[str]] = {}
        self.hits = 0
        self.misses = 0

    def snapshot_versions(self, tables: list[str]) -> dict:
        """Capture the tables' version nonces NOW. Callers must snapshot
        BEFORE executing the query and hand the result to put():
        recording versions at put time would stamp a pre-mutation result
        with a post-mutation nonce when another driver commits mid-query,
        making the stale entry permanently invisible to invalidation."""
        if self.version_store is None:
            return {}
        return {t: self.version_store.version(t) for t in tables}

    def get(self, sql: str, tables: list[str]) -> Any | None:
        key = cache_key(sql, tables)
        with self._lock:
            item = self._entries.get(key)
            if item is None:
                self.misses += 1
                return None
            ts, value, versions = item
            if time.monotonic() - ts > self.ttl_s:
                del self._entries[key]
                self.misses += 1
                return None
        if self.version_store is not None:
            # store reads outside the lock — one small GET per table
            for t, seen in versions.items():
                if self.version_store.version(t) != seen:
                    with self._lock:
                        self._entries.pop(key, None)
                        self.misses += 1
                    return None
        with self._lock:
            if key not in self._entries:
                self.misses += 1
                return None
            self._entries.move_to_end(key)
            self.hits += 1
            return value

    def put(self, sql: str, tables: list[str], value: Any,
            versions: dict | None = None) -> None:
        key = cache_key(sql, tables)
        if versions is None:
            versions = self.snapshot_versions(tables)
        with self._lock:
            self._entries[key] = (time.monotonic(), value, versions)
            self._entries.move_to_end(key)
            for t in tables:
                self._by_table.setdefault(t, set()).add(key)
            while len(self._entries) > self.max_entries:
                old_key, _ = self._entries.popitem(last=False)
                for keys in self._by_table.values():
                    keys.discard(old_key)

    def invalidate_table(self, table: str) -> int:
        """Drop every cached result that referenced ``table`` — called on
        each write/update/delete (reference query_cache.go:364-397). With
        a version store, also bumps the shared nonce so every *other*
        driver on the store invalidates too."""
        if self.version_store is not None:
            self.version_store.bump(table)
        with self._lock:
            keys = self._by_table.pop(table, set())
            n = 0
            for key in keys:
                if self._entries.pop(key, None) is not None:
                    n += 1
            return n

    def clear(self) -> None:
        with self._lock:
            self._entries.clear()
            self._by_table.clear()
