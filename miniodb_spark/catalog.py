"""Table catalog: configs + cumulative schema registry.

The reference persists per-table operational config (buffer size,
flush interval, retention, id strategy) in Redis with a MinIO JSON
fallback (/root/reference/internal/metadata/table_config.go:17-108).
Here the catalog is a directory of JSON files under
``<root>/_system/tables/`` plus an in-process dict — the same
three-level resolution (memory → file → default) without the external
services.

The catalog additionally tracks a **cumulative schema** per table
(column name → spark type name), updated on every flush. This is the
scale-critical design point from SURVEY §7: at 100 TB / millions of
files, ``mergeSchema`` over full file listings is unaffordable; a
catalog-maintained union schema lets reads pass an explicit schema to
the parquet scan instead.
"""

from __future__ import annotations

import json
import os
import threading
from dataclasses import asdict, dataclass, field
from typing import Any


@dataclass
class TableConfig:
    name: str
    buffer_size: int = 5000
    flush_interval_s: float = 15.0
    retention_days: int | None = None
    backup_enabled: bool = False
    id_strategy: str = "uuid"  # uuid | snowflake | custom | user_provided
    auto_generate_id: bool = True
    id_prefix: str = ""
    max_id_length: int = 255
    properties: dict[str, str] = field(default_factory=dict)


class Catalog:
    def __init__(self, root: str):
        self.root = root
        self._dir = os.path.join(root, "_system", "tables")
        os.makedirs(self._dir, exist_ok=True)
        self._configs: dict[str, TableConfig] = {}
        self._schemas: dict[str, dict[str, str]] = {}  # table -> {col: type}
        self._lock = threading.RLock()
        self._load_all()

    # -- config persistence (memory -> json file -> default) ------------

    def _path(self, name: str) -> str:
        return os.path.join(self._dir, f"{name}.json")

    def _load_all(self) -> None:
        for fn in os.listdir(self._dir):
            if not fn.endswith(".json"):
                continue
            with open(os.path.join(self._dir, fn), encoding="utf-8") as fh:
                doc = json.load(fh)
            cfg = TableConfig(**doc.get("config", {}))
            self._configs[cfg.name] = cfg
            self._schemas[cfg.name] = doc.get("schema", {})

    def _persist(self, name: str) -> None:
        doc = {
            "config": asdict(self._configs[name]),
            "schema": self._schemas.get(name, {}),
        }
        tmp = self._path(name) + ".tmp"
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump(doc, fh, indent=1)
        os.replace(tmp, self._path(name))

    def create_table(self, name: str, config: TableConfig | None = None) -> TableConfig:
        with self._lock:
            if name in self._configs:
                return self._configs[name]
            cfg = config or TableConfig(name=name)
            cfg.name = name
            self._configs[name] = cfg
            self._schemas.setdefault(name, {})
            self._persist(name)
            return cfg

    def get_table(self, name: str) -> TableConfig | None:
        with self._lock:
            return self._configs.get(name)

    def ensure_table(self, name: str) -> TableConfig:
        """Auto-create on first write (reference miniodb_service.go:278)."""
        return self.create_table(name)

    def list_tables(self) -> list[str]:
        with self._lock:
            return sorted(self._configs)

    def drop_table(self, name: str) -> bool:
        with self._lock:
            if name not in self._configs:
                return False
            del self._configs[name]
            self._schemas.pop(name, None)
            try:
                os.remove(self._path(name))
            except FileNotFoundError:
                pass
            return True

    # -- cumulative schema ----------------------------------------------

    def merge_schema(self, name: str, columns: dict[str, str]) -> None:
        """Union new flush columns into the table's cumulative schema.
        First-seen type wins (matching write-time inference); a later
        conflicting type widens to string, mirroring the reference's
        everything-else-is-UTF8 fallback."""
        with self._lock:
            cur = self._schemas.setdefault(name, {})
            for col, typ in columns.items():
                if col not in cur:
                    cur[col] = typ
                elif cur[col] != typ:
                    cur[col] = "string"
            self._persist(name)

    def schema_of(self, name: str) -> dict[str, str]:
        with self._lock:
            return dict(self._schemas.get(name, {}))

    # -- metadata backup/restore (BackupMetadata / RestoreMetadata) ------

    def export_metadata(self) -> dict[str, Any]:
        with self._lock:
            return {
                "tables": {n: asdict(c) for n, c in self._configs.items()},
                "schemas": dict(self._schemas),
            }

    def import_metadata(self, doc: dict[str, Any]) -> int:
        with self._lock:
            n = 0
            for name, cfg in doc.get("tables", {}).items():
                self._configs[name] = TableConfig(**cfg)
                self._schemas[name] = doc.get("schemas", {}).get(name, {})
                self._persist(name)
                n += 1
            return n
