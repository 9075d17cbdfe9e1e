"""Metadata backup subsystem: create / list / restore / status.

Parity target: the reference's backup RPCs (miniodb.proto:281-318 —
BackupMetadata, RestoreMetadata, ListBackups, GetMetadataStatus) and
``internal/backup/`` (executor writes timestamped metadata snapshots
to the object store, scheduler runs them on an interval, status
reports last/next backup). Here snapshots are JSON files under
``{root}/_system/backups/`` — the same store the engine's data lives
in, so when the engine root is an object-store path the backups land
beside the data exactly like the reference's MinIO backup bucket.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

from .catalog import Catalog


class BackupManager:
    def __init__(self, catalog: Catalog, node_id: int = 0,
                 interval_s: float = 3600.0):
        self.catalog = catalog
        self.node_id = node_id
        self.interval_s = interval_s
        self._dir = os.path.join(catalog.root, "_system", "backups")
        os.makedirs(self._dir, exist_ok=True)

    # -- create ----------------------------------------------------------

    def create_backup(self) -> dict[str, Any]:
        """Snapshot the catalog metadata to a timestamped object. Returns
        the BackupInfo shape (miniodb.proto:292-298)."""
        ts_us = int(time.time() * 1_000_000)
        name = f"metadata-node{self.node_id}-{ts_us}.json"
        path = os.path.join(self._dir, name)
        doc = {
            "node_id": str(self.node_id),
            "timestamp": ts_us,
            "metadata": self.catalog.export_metadata(),
        }
        tmp = path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump(doc, fh)
        os.replace(tmp, path)
        st = os.stat(path)
        return {
            "object_name": name,
            "node_id": str(self.node_id),
            "timestamp": ts_us,
            "size": st.st_size,
            "last_modified": int(st.st_mtime * 1_000_000),
        }

    # -- list / restore --------------------------------------------------

    def list_backups(self, days: int = 30) -> dict[str, Any]:
        """ListBackups RPC (miniodb.proto:287-304): backups from the last
        ``days`` days, newest first."""
        cutoff_us = int((time.time() - days * 86400) * 1_000_000)
        infos: list[dict[str, Any]] = []
        for fn in os.listdir(self._dir):
            if not (fn.startswith("metadata-") and fn.endswith(".json")):
                continue
            path = os.path.join(self._dir, fn)
            try:
                ts_us = int(fn.rsplit("-", 1)[-1].removesuffix(".json"))
            except ValueError:
                continue
            if ts_us < cutoff_us:
                continue
            st = os.stat(path)
            node = fn.split("-")[1].removeprefix("node")
            infos.append({
                "object_name": fn,
                "node_id": node,
                "timestamp": ts_us,
                "size": st.st_size,
                "last_modified": int(st.st_mtime * 1_000_000),
            })
        infos.sort(key=lambda b: b["timestamp"], reverse=True)
        return {"backups": infos, "total": len(infos)}

    def restore_backup(self, object_name: str) -> int:
        """Restore catalog metadata from a named backup object; returns
        tables restored."""
        path = os.path.join(self._dir, os.path.basename(object_name))
        with open(path, encoding="utf-8") as fh:
            doc = json.load(fh)
        return self.catalog.import_metadata(doc["metadata"])

    # -- status ----------------------------------------------------------

    def status(self, healthy: bool = True) -> dict[str, Any]:
        """GetMetadataStatus RPC (miniodb.proto:306-318)."""
        listed = self.list_backups(days=36500)["backups"]
        last = listed[0]["timestamp"] if listed else None
        next_backup = (last or int(time.time() * 1_000_000)) + int(
            self.interval_s * 1_000_000
        )
        return {
            "node_id": str(self.node_id),
            "backup_status": {
                "backend": "catalog-json",
                "count": str(len(listed)),
                "interval_s": str(int(self.interval_s)),
            },
            "last_backup": last,
            "next_backup": next_backup,
            "health_status": "healthy" if healthy else "degraded",
        }
