"""Table catalog: configs + cumulative schema registry.

The reference persists per-table operational config (buffer size,
flush interval, retention, id strategy) in Redis with a MinIO JSON
fallback (/root/reference/internal/metadata/table_config.go:17-108).
Here the catalog is a directory of JSON files under
``<root>/_system/tables/`` plus an in-process dict — the same
three-level resolution (memory → file → default) without the external
services.

The catalog additionally tracks the table's **schema generations** and
the derived **cumulative schema**. This is the scale-critical design
point from SURVEY §7: at 100 TB / millions of files, ``mergeSchema``
over full file listings is unaffordable, and Spark's parquet reader
cannot read an INT64 column through a DOUBLE/STRING schema — so
per-file type divergence (which the reference tolerates and delegates
to DuckDB's ``union_by_name`` coercion) must be modeled explicitly:

- every flushed file lives under ``<table>/gen=<N>/dt=<day>/``;
- within a generation each column has exactly one physical type
  (additive new columns are fine — missing reads as NULL);
- an incompatible type change (rare) starts a new generation;
- reads scan each generation with its exact schema and cast/align to
  the cumulative schema (long+double → double, anything else → string,
  matching the reference's everything-else-is-UTF8 fallback), then
  union. Partition pruning on ``dt`` still applies inside every
  generation prefix.
"""

from __future__ import annotations

import json
import os
import threading
import time
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
    # parquet codec: snappy (default) | zstd | gzip | lz4 | uncompressed
    # (reference storage/parquet_writer.go:112-127, snappy on the flush path)
    compression: str = "snappy"
    # extra zone-map columns beyond the engine defaults (id, timestamp):
    # lets a numeric payload column carry min/max file-skipping brackets
    # — the reference's configurable multi-column index
    # (query/file_pruning.go:107-255 prunes on any indexed column's
    # stored min/max). Sidecars self-heal when this changes (the
    # column-set reconfiguration rebuild in zonemap.build).
    zonemap_columns: list[str] = field(default_factory=list)
    properties: dict[str, str] = field(default_factory=dict)


def merge_type(a: str, b: str) -> str:
    """Cumulative-schema type merge: numeric widening, else string —
    the reference's everything-else-is-UTF8 fallback."""
    if a == b:
        return a
    if {a, b} == {"long", "double"}:
        return "double"
    return "string"


class Catalog:
    def __init__(self, root: str):
        self.root = root
        self._dir = os.path.join(root, "_system", "tables")
        os.makedirs(self._dir, exist_ok=True)
        self._configs: dict[str, TableConfig] = {}
        # table -> list of generation schemas [{col: type}, ...]
        self._generations: dict[str, list[dict[str, str]]] = {}
        # table -> [[gen, dt], ...]: partitions superseded by a committed
        # rewrite, excluded from reads until their directories are GC'd
        self._excluded: dict[str, list[list]] = {}
        self._lock = threading.RLock()
        self._stream_commits: dict[str, int] | None = None  # lazy-loaded
        # table -> (mtime_ns, size) of its json at last load/persist;
        # lets refresh_if_changed detect cross-process commits with a stat
        self._sigs: dict[str, tuple | None] = {}
        # table -> last committed catalog version (the commit-log line
        # count); versions start at 1 with the table's first persist
        self._versions: dict[str, int] = {}
        self._hist_dir = os.path.join(self._dir, "_history")
        os.makedirs(self._hist_dir, exist_ok=True)
        self._load_all()

    # -- config persistence (memory -> json file -> default) ------------

    def _path(self, name: str) -> str:
        return os.path.join(self._dir, f"{name}.json")

    def _sig_of(self, path: str) -> tuple | None:
        try:
            st = os.stat(path)
            return (st.st_mtime_ns, st.st_size)
        except OSError:
            return None

    def _load_one(self, path: str) -> None:
        with open(path, encoding="utf-8") as fh:
            doc = json.load(fh)
        cfg = TableConfig(**doc.get("config", {}))
        self._configs[cfg.name] = cfg
        self._generations[cfg.name] = doc.get("generations", [])
        self._excluded[cfg.name] = doc.get("excluded", [])
        self._sigs[cfg.name] = self._sig_of(path)

    def _load_all(self) -> None:
        for fn in os.listdir(self._dir):
            if not fn.endswith(".json"):
                continue
            self._load_one(os.path.join(self._dir, fn))

    def _persist(
        self, name: str,
        add_files: dict[int, list[str]] | None = None,
        remove_files: dict[int, list[str]] | None = None,
    ) -> None:
        doc = {
            "config": asdict(self._configs[name]),
            "generations": self._generations.get(name, []),
            "excluded": self._excluded.get(name, []),
        }
        tmp = self._path(name) + ".tmp"
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump(doc, fh, indent=1)
        os.replace(tmp, self._path(name))
        self._sigs[name] = self._sig_of(self._path(name))
        # commit log: every catalog flip appends the full (small) doc as
        # one JSONL line, giving an ordered history of table states —
        # the substrate for Engine.read_snapshot time travel and a
        # metadata audit trail. Appends are O_APPEND-atomic for these
        # line sizes. The version number is max(in-memory counter,
        # last line ON DISK) + 1 — the tail re-read (one seek-from-end,
        # not a full-file scan) keeps versions monotone when ANOTHER
        # driver advanced the shared history since our last persist:
        # with the add-file index, a duplicated version number is no
        # longer benign last-line-wins metadata — it would pin a later
        # batch's files onto an earlier snapshot (caught by
        # tests/test_multiprocess.py). Truly simultaneous persists to
        # one table still require the flush-lock/lease serialization
        # the mutation paths already use.
        v = max(
            self._versions.get(name, 0), self._last_history_version(name)
        ) + 1
        self._versions[name] = v
        rec: dict = {"v": v, "ts_us": int(time.time() * 1e6), "doc": doc}
        if add_files:
            # Delta-style add-file entries: {gen: [relpaths]} the commit
            # ADDED — pins snapshot file membership without trusting
            # file mtimes (object-store PUT time vs driver wall clock
            # can skew; see Engine.read_snapshot). Recorded only on the
            # history line, never in the current-state json: it is a
            # per-commit delta, not table state.
            rec["add"] = {str(g): sorted(rels)
                          for g, rels in add_files.items() if rels}
        if remove_files:
            # Delta-style remove-file entries: files this commit
            # physically REPLACED (compaction swaps). A file is alive
            # for snapshots in [added_version, removed_version);
            # read_snapshot refuses versions that still need a removed
            # file and uses the replacement adds for later versions.
            rec["rm"] = {str(g): sorted(rels)
                         for g, rels in remove_files.items() if rels}
        line = json.dumps(rec, separators=(",", ":"))
        with open(self._hist_path(name), "a", encoding="utf-8") as fh:
            fh.write(line + "\n")

    # -- commit log (time travel / audit) --------------------------------

    def _hist_path(self, name: str) -> str:
        return os.path.join(self._hist_dir, f"{name}.jsonl")

    def _last_history_version(self, name: str) -> int:
        """Version on the history file's last line — read via one
        seek-from-end block, not a full-file scan: _persist calls this
        per commit, and the log grows one line per commit, so a linear
        read here would make N commits cost O(N^2) total."""
        try:
            with open(self._hist_path(name), "rb") as fh:
                fh.seek(0, os.SEEK_END)
                size = fh.tell()
                if size == 0:
                    return 0
                # history lines are small (one doc + add list); 64 KiB
                # covers any single line — double until a newline-split
                # yields a complete last line or the whole file is read
                block = 65536
                while True:
                    start = max(0, size - block)
                    fh.seek(start)
                    data = fh.read(size - start)
                    lines = [
                        ln for ln in data.split(b"\n") if ln.strip()
                    ]
                    if start == 0:
                        break
                    # the first split piece may be a partial line; a
                    # complete last line needs >= 2 pieces (or BOF)
                    if len(lines) >= 2:
                        break
                    block *= 2
                if not lines:
                    return 0
                return json.loads(lines[-1].decode("utf-8"))["v"]
        except FileNotFoundError:
            return 0
        except (ValueError, KeyError):
            # torn/corrupt tail line: fall back to a full scan for the
            # last parseable record
            try:
                with open(self._hist_path(name), encoding="utf-8") as fh:
                    v = 0
                    for line in fh:
                        if not line.strip():
                            continue
                        try:
                            v = max(v, int(json.loads(line)["v"]))
                        except (ValueError, KeyError):
                            continue
                    return v
            except FileNotFoundError:
                return 0

    def touch(
        self, name: str,
        add_files: dict[int, list[str]] | None = None,
        remove_files: dict[int, list[str]] | None = None,
    ) -> int:
        """Append a data-commit marker: re-persist the current doc AFTER
        a write job's files are on disk, so the marker version's ts_us
        upper-bounds those files' mtimes. Schema registration persists
        BEFORE the job runs (the rollback protocol needs that order), so
        the registration version deliberately does NOT include the
        in-flight files — the post-write marker is the version whose
        snapshot does. ``add_files`` ({gen: [relpaths]}) records the
        batch's files on the commit line (Delta-style add entries) so
        read_snapshot pins membership without trusting file mtimes.
        Returns the marker version."""
        with self._lock:
            if name in self._configs:
                self._persist(name, add_files=add_files,
                              remove_files=remove_files)
            return self._versions.get(name, 0)

    def current_version(self, name: str) -> int:
        """Last committed catalog version for ``name`` (0 = never
        persisted). Re-reads the commit log so a version committed by
        another driver since our last persist is visible."""
        with self._lock:
            v = self._last_history_version(name)
            if v:
                self._versions[name] = v
            return v

    def history(self, name: str) -> list[dict[str, Any]]:
        """The table's commit log, oldest first: one
        ``{"v": int, "ts_us": int}`` per catalog flip (docs omitted —
        use :meth:`doc_at`). Length is the number of metadata commits,
        not data volume, so driver-side materialization is safe."""
        out: list[dict[str, Any]] = []
        try:
            with open(self._hist_path(name), encoding="utf-8") as fh:
                for line in fh:
                    if not line.strip():
                        continue
                    rec = json.loads(line)
                    out.append({"v": rec["v"], "ts_us": rec["ts_us"]})
        except FileNotFoundError:
            pass
        return out

    def record_at(self, name: str, version: int) -> dict[str, Any] | None:
        """The full commit-log record ``{"v", "ts_us", "doc"}`` for
        ``version`` (last-line-wins on a duplicated version number,
        mirroring the json's last-writer semantics). None when the
        version was never committed."""
        found = None
        try:
            with open(self._hist_path(name), encoding="utf-8") as fh:
                for line in fh:
                    if not line.strip():
                        continue
                    rec = json.loads(line)
                    if rec["v"] == version:
                        found = rec
        except FileNotFoundError:
            return None
        return found

    def doc_at(self, name: str, version: int) -> dict[str, Any] | None:
        rec = self.record_at(name, version)
        return rec["doc"] if rec else None

    def version_as_of(self, name: str, ts_us: int) -> int | None:
        """Largest version committed at or before ``ts_us`` (Delta's
        TIMESTAMP AS OF resolution). None when the table had no commit
        by then."""
        best = None
        try:
            with open(self._hist_path(name), encoding="utf-8") as fh:
                for line in fh:
                    if not line.strip():
                        continue
                    rec = json.loads(line)
                    if rec["ts_us"] <= ts_us and (
                        best is None or rec["v"] >= best
                    ):
                        best = rec["v"]
        except FileNotFoundError:
            return None
        return best

    def docs_between(
        self, name: str, after: int, upto: int | None = None
    ) -> list[dict[str, Any]]:
        """Docs for versions in (after, upto] — the window
        read_snapshot inspects to find partitions vacuumed since a
        snapshot's commit point."""
        out: list[dict[str, Any]] = []
        try:
            with open(self._hist_path(name), encoding="utf-8") as fh:
                for line in fh:
                    if not line.strip():
                        continue
                    rec = json.loads(line)
                    if rec["v"] > after and (upto is None or rec["v"] <= upto):
                        out.append(rec["doc"])
        except FileNotFoundError:
            pass
        return out

    def added_files_index(self, name: str) -> dict[tuple[int, str], int]:
        """``{(gen, relpath): first_version_that_added_it}`` over the
        whole commit log — the Delta-style add-file index. A file
        absent from this index predates the add-file log (or was
        written by a path that doesn't record adds); read_snapshot
        falls back to the mtime watermark for those. Size is one small
        tuple per data file ever added — the same order as a generation
        LIST, driver-side safe."""
        idx: dict[tuple[int, str], int] = {}
        try:
            with open(self._hist_path(name), encoding="utf-8") as fh:
                for line in fh:
                    if not line.strip():
                        continue
                    rec = json.loads(line)
                    for g, rels in (rec.get("add") or {}).items():
                        for rel in rels:
                            key = (int(g), rel)
                            if key not in idx or rec["v"] < idx[key]:
                                idx[key] = rec["v"]
        except FileNotFoundError:
            pass
        return idx

    def removed_files_index(self, name: str) -> dict[tuple[int, str], int]:
        """``{(gen, relpath): first_version_that_removed_it}`` — the
        remove-file twin of :meth:`added_files_index` (compaction
        swaps record removals). A file is alive for snapshot versions
        in [added, removed)."""
        idx: dict[tuple[int, str], int] = {}
        try:
            with open(self._hist_path(name), encoding="utf-8") as fh:
                for line in fh:
                    if not line.strip():
                        continue
                    rec = json.loads(line)
                    for g, rels in (rec.get("rm") or {}).items():
                        for rel in rels:
                            key = (int(g), rel)
                            if key not in idx or rec["v"] < idx[key]:
                                idx[key] = rec["v"]
        except FileNotFoundError:
            pass
        return idx

    def refresh_if_changed(self, name: str) -> bool:
        """Reload one table's metadata when another process changed it —
        multi-driver serving support. One os.stat when nothing changed
        (the reference pays a Redis metadata read per query instead).
        Handles remote create (file appears), remote commit (mtime/size
        moves) and remote delete (file gone). Returns True on reload."""
        path = self._path(name)
        with self._lock:
            sig = self._sig_of(path)
            if sig == self._sigs.get(name):
                return False
            if sig is None:  # deleted by another process
                self._configs.pop(name, None)
                self._generations.pop(name, None)
                self._excluded.pop(name, None)
                self._sigs.pop(name, None)
                return True
            self._load_one(path)
            return True

    def create_table(self, name: str, config: TableConfig | None = None) -> TableConfig:
        with self._lock:
            if name in self._configs:
                return self._configs[name]
            cfg = config or TableConfig(name=name)
            cfg.name = name
            self._configs[name] = cfg
            self._generations.setdefault(name, [])
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
            self._generations.pop(name, None)
            self._excluded.pop(name, None)
            self._versions.pop(name, None)
            for path in (self._path(name), self._hist_path(name)):
                try:
                    os.remove(path)
                except FileNotFoundError:
                    pass
            return True

    # -- schema generations ---------------------------------------------

    def register_flush_schema(self, name: str, columns: dict[str, str],
                              force_new: bool = False) -> int:
        """Pick (or open) the generation a flush with ``columns`` physical
        types writes into, and fold new columns into it.

        The latest generation absorbs the flush when no existing column
        changes type (additive evolution is free). A type conflict on any
        column opens a new generation. Returns the generation index.

        ``force_new`` always opens a fresh generation even for an
        identical schema — merge_upsert needs its batch in a generation
        no pre-existing row shares, because the old-version sweep
        discriminates fresh-vs-old by generation (lazy DataFrames make
        "rows that existed before the ingest" unexpressible otherwise)."""
        with self._lock:
            gens = self._generations.setdefault(name, [])
            if gens and not force_new:
                latest = gens[-1]
                if all(latest.get(c, t) == t for c, t in columns.items()):
                    latest.update(columns)
                    self._persist(name)
                    return len(gens) - 1
            gens.append(dict(columns))
            self._persist(name)
            return len(gens) - 1

    # -- streaming batch commit registry ---------------------------------
    # foreachBatch guarantees a stable batch_id per epoch across retries;
    # recording the high-water mark per stream makes the sink idempotent
    # against Structured Streaming's replay-after-restart.

    def _stream_commits_path(self) -> str:
        return os.path.join(self.root, "_system", "stream_commits.json")

    def _load_stream_commits(self) -> dict[str, int]:
        if self._stream_commits is None:
            try:
                with open(self._stream_commits_path(), encoding="utf-8") as fh:
                    self._stream_commits = {k: int(v) for k, v in json.load(fh).items()}
            except (FileNotFoundError, json.JSONDecodeError):
                self._stream_commits = {}
        return self._stream_commits

    def last_committed_batch(self, stream_id: str) -> int:
        with self._lock:
            return self._load_stream_commits().get(stream_id, -1)

    def commit_stream_batch(self, stream_id: str, batch_id: int) -> None:
        with self._lock:
            commits = self._load_stream_commits()
            commits[stream_id] = max(commits.get(stream_id, -1), int(batch_id))
            path = self._stream_commits_path()
            tmp = path + ".tmp"
            with open(tmp, "w", encoding="utf-8") as fh:
                json.dump(commits, fh)
            os.replace(tmp, path)

    def rollback_generation(self, name: str, gen_idx: int) -> bool:
        """Remove a generation that a failed flush created and never wrote
        into. Only the *last* generation can be rolled back (a later flush
        may already have opened — and written — a newer one, in which case
        the empty generation is left behind; readers tolerate empty gen
        dirs). Returns True if removed."""
        with self._lock:
            gens = self._generations.get(name)
            if gens and len(gens) - 1 == gen_idx:
                gens.pop()
                if not gens:
                    del self._generations[name]
                self._persist(name)
                return True
            return False

    def generation_for(self, name: str, columns: dict[str, str]) -> int:
        """Generation whose schema can hold exactly ``columns`` (used by
        rewrites that re-materialize data in cumulative types)."""
        return self.register_flush_schema(name, columns)

    # -- rename-free rewrite commit ---------------------------------------
    # A copy-on-write rewrite lands its survivors in a brand-new generation
    # directory that no reader references (readers enumerate only the
    # catalog's generation list), then commits with ONE atomic catalog
    # write: the survivor generation appears and the partitions it
    # supersedes become excluded, in the same os.replace. On an object
    # store there is no rename anywhere on the data path — matching the
    # reference's upload-then-delete (internal/query/query.go:1252-1413),
    # but with an atomic metadata flip instead of a visible delete window.

    def next_generation_index(self, name: str) -> int:
        with self._lock:
            return len(self._generations.get(name, []))

    def commit_rewrite(
        self, name: str, columns: dict[str, str],
        superseded: list[tuple[int, str]],
        expected_gen: int | None = None,
        add_files: dict[int, list[str]] | None = None,
        remove_files: dict[int, list[str]] | None = None,
    ) -> int:
        """Atomic commit of a rewrite: append the survivors' generation
        (always a NEW generation — its directory was invisible until this
        write) and exclude the superseded ``(gen, dt)`` partitions from
        reads. Returns the new generation index.

        The commit mutates the *on-disk* state, not a possibly-stale
        in-memory snapshot: it re-reads the catalog file first
        (refresh_if_changed), then applies the append+exclusions on top.
        ``expected_gen`` is the generation index the rewrite wrote its
        survivor directory under (next_generation_index at reserve
        time); if the refreshed generation list no longer lines up —
        another driver committed while our lease was stolen — the commit
        raises instead of registering our schema under an index whose
        directory holds someone else's data (lost-write prevention; the
        orphan survivor dir stays unreferenced and harmless)."""
        with self._lock:
            self.refresh_if_changed(name)
            gens = self._generations.setdefault(name, [])
            if expected_gen is not None and len(gens) != expected_gen:
                raise RuntimeError(
                    f"stale rewrite commit for {name!r}: reserved gen="
                    f"{expected_gen} but catalog now has {len(gens)} "
                    "generations (concurrent commit — lease lost?)")
            gens.append(dict(columns))
            ex = self._excluded.setdefault(name, [])
            for g, d in superseded:
                if [int(g), d] not in ex:
                    ex.append([int(g), d])
            # record the survivor generation's files (Delta-style add
            # entries) so snapshot membership — and the loss check a
            # later compaction swap relies on — covers rewrite output
            # exactly, not via the mtime fallback. remove_files records
            # the SUPERSEDED partitions' files as rm entries AT THIS
            # VERSION: the doc-level exclusion alone cannot carry that
            # fact forward, because gc_superseded's clear_excluded
            # persists a LATER version whose doc no longer excludes the
            # partition — without rm entries the add-file index then
            # counts the GC'd files as alive and read_snapshot refuses
            # every version at or past the clear (round-15 find: a
            # single delete() broke read_snapshot(current_version)).
            self._persist(name, add_files=add_files,
                          remove_files=remove_files)
            return len(gens) - 1

    def excluded_parts(self, name: str) -> set[tuple[int, str]]:
        with self._lock:
            return {(int(g), d) for g, d in self._excluded.get(name, [])}

    def clear_excluded(self, name: str, parts: list[tuple[int, str]]) -> None:
        """Forget exclusions whose directories have been physically
        removed (the GC step after a committed rewrite)."""
        with self._lock:
            gone = {(int(g), d) for g, d in parts}
            ex = self._excluded.get(name, [])
            kept = [p for p in ex if (int(p[0]), p[1]) not in gone]
            if len(kept) != len(ex):
                self._excluded[name] = kept
                self._persist(name)

    def gen_schemas(self, name: str) -> list[dict[str, str]]:
        with self._lock:
            return [dict(g) for g in self._generations.get(name, [])]

    def tombstone_generations(self, name: str, indices: list[int]) -> None:
        """Mark generations as dead ({} schema) after collapse_generations
        folded their data away. Indices must stay stable (they name the
        gen=N directories), so entries are emptied, never removed; an
        empty schema is skipped by readers without a directory stat, so
        scan metadata cost stays O(live generations)."""
        with self._lock:
            gens = self._generations.get(name, [])
            for i in indices:
                if 0 <= i < len(gens):
                    gens[i] = {}
            self._persist(name)

    def schema_of(self, name: str) -> dict[str, str]:
        """Cumulative schema: column union across generations with
        widening merge (long+double → double, else → string)."""
        with self._lock:
            cum: dict[str, str] = {}
            for gen in self._generations.get(name, []):
                for col, typ in gen.items():
                    cum[col] = merge_type(cum[col], typ) if col in cum else typ
            return cum

    # -- metadata backup/restore (BackupMetadata / RestoreMetadata) ------

    def export_metadata(self) -> dict[str, Any]:
        with self._lock:
            return {
                "tables": {n: asdict(c) for n, c in self._configs.items()},
                "generations": {n: g for n, g in self._generations.items()},
                "excluded": {n: e for n, e in self._excluded.items() if e},
            }

    def import_metadata(self, doc: dict[str, Any]) -> int:
        with self._lock:
            n = 0
            for name, cfg in doc.get("tables", {}).items():
                self._configs[name] = TableConfig(**cfg)
                self._generations[name] = doc.get("generations", {}).get(name, [])
                self._excluded[name] = doc.get("excluded", {}).get(name, [])
                self._persist(name)
                n += 1
            return n
