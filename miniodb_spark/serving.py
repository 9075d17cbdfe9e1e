"""Serving-index staleness contract for materialized ANN indexes.

``operators/similarity.py``'s ``write_bucketed`` / ``write_ivf`` /
``write_ivfpq`` produce *derived* serving tables (partitioned by
bucket/cell). Without a contract, nothing invalidates them when the
base table mutates: a user who upserts a vector and then probes the
index silently gets pre-upsert results. The reference invalidates its
query cache per table on every write (minIODB
internal/query/query_cache.go:364-397); this module extends that
contract to index artifacts using the same per-table version nonces
(:class:`miniodb_spark.kv.TableVersionStore`, the nonce the engine
already bumps on every flush / upsert / delete).

Mechanics:

- ``write_*(..., source=engine.index_source(table))`` snapshots the
  table's nonce **before** the build starts (conservative: a mutation
  racing the build makes the index stale, never silently fresh) and
  stamps ``{table, version, versions_root}`` into a tiny
  ``_index_meta.json`` sidecar next to the parquet directories.
- ``probe_*`` calls :func:`check_index` first: it re-reads the CURRENT
  nonce from the recorded version store (reconstructed from
  ``versions_root`` via the same fs abstraction the engine uses, so it
  works across processes and on object-store roots) and raises
  :class:`StaleServingIndexError` — or warns, per ``on_stale`` — when
  the nonce moved. Unstamped (legacy / free-standing) indexes carry no
  contract and probe as before.
- :func:`rebuild_index` re-materializes the index from the engine's
  current table state and re-stamps, closing the
  mutate → probe(stale) → rebuild → probe(fresh) loop
  (tests/test_serving_staleness.py).

The sidecar read is one small object GET per probe — the same cost the
SQL result cache already pays per hit for its nonce re-check.
"""

from __future__ import annotations

import json
import warnings

from . import fs as fsmod
from .kv import FileKV, TableVersionStore

META_NAME = "_index_meta.json"


class StaleServingIndexError(RuntimeError):
    """The base table mutated after this serving index was built."""


class IndexSource:
    """Identifies the base table an index is derived from, plus the
    version store that tracks its mutations. Build one with
    :meth:`miniodb_spark.engine.Engine.index_source`."""

    def __init__(self, versions: TableVersionStore, table: str,
                 versions_root: str):
        self.versions = versions
        self.table = table
        self.versions_root = versions_root

    def current(self) -> bytes | None:
        return self.versions.version(self.table)


def stamp_index(spark, path: str, source: IndexSource,
                version: bytes | None) -> None:
    """Record the source table + its nonce next to the written index.
    ``version`` is the nonce snapshotted *before* the build started."""
    fs = fsmod.get_fs(spark, path)
    meta = {
        "table": source.table,
        "version": version.hex() if version is not None else None,
        "versions_root": source.versions_root,
    }
    fs.write_bytes(fsmod.join(path, META_NAME),
                   json.dumps(meta).encode("utf-8"))


def index_meta(spark, path: str) -> dict | None:
    """The staleness sidecar, or None for an unstamped index."""
    fs = fsmod.get_fs(spark, path)
    p = fsmod.join(path, META_NAME)
    if not fs.exists(p):
        return None
    return json.loads(fs.read_bytes(p).decode("utf-8"))


def check_index(spark, path: str, on_stale: str = "raise") -> dict | None:
    """Enforce the staleness contract before a probe.

    Returns the sidecar dict (None if the index is unstamped — no
    contract to enforce). If the base table's current nonce differs
    from the stamped one, raises :class:`StaleServingIndexError`
    (``on_stale="raise"``, default) or emits a warning
    (``on_stale="warn"``).
    """
    meta = index_meta(spark, path)
    if meta is None:
        return None
    vroot = meta["versions_root"]
    store = TableVersionStore(FileKV(fsmod.get_fs(spark, vroot), vroot))
    now = store.version(meta["table"])
    stamped = bytes.fromhex(meta["version"]) if meta["version"] else None
    if now != stamped:
        msg = (
            f"serving index at {path} is stale: base table "
            f"'{meta['table']}' mutated since the index was built "
            f"(stamped nonce {meta['version']}, current "
            f"{now.hex() if now else None}); rebuild with "
            f"miniodb_spark.serving.rebuild_index"
        )
        if on_stale == "warn":
            warnings.warn(msg, stacklevel=3)
        else:
            raise StaleServingIndexError(msg)
    return meta


def rebuild_index(engine, table: str, path: str, kind: str = "bucketed",
                  vec_col: str = "embedding", id_col: str = "vec_id",
                  **index_kwargs):
    """Re-materialize a serving index from the engine table's CURRENT
    state and re-stamp it. Returns the trained index object for
    ``kind in ("ivf", "ivfpq")`` (the caller needs it to probe), None
    for ``kind="bucketed"`` (the LSH planes are seed-deterministic).
    """
    from .operators import similarity as sim

    df = engine.read_persisted(table)
    if df is None:
        raise ValueError(f"no persisted data for table '{table}'")
    source = engine.index_source(table)
    if kind == "bucketed":
        sim.write_bucketed(df, path, vec_col=vec_col, source=source,
                           **index_kwargs)
        return None
    if kind == "ivf":
        idx = sim.IVFIndex(**index_kwargs).fit(df, vec_col)
        sim.write_ivf(df, idx, path, vec_col=vec_col, source=source)
        return idx
    if kind == "ivfpq":
        idx = sim.IVFPQIndex(**index_kwargs).fit(df, vec_col)
        sim.write_ivfpq(df, idx, path, vec_col=vec_col, id_col=id_col,
                        source=source)
        return idx
    raise ValueError(f"unknown index kind: {kind!r}")
