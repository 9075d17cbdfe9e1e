"""Id-level delete/update via copy-on-write partition rewrite.

Reference semantics (/root/reference/internal/query/query.go:1252-1413):
find the files containing the id via the Redis index; files made
entirely of the id are dropped, others are rewritten without the
matching rows — upload the rewritten object, then delete the old one.
Our Spark-shaped unit of rewrite is the ``gen=N/dt=day`` partition:
affected partitions are discovered by a pruned scan (the ``id``
predicate rides parquet footer min/max), survivors are re-materialized
in cumulative types, and the old partitions are superseded. The
rewrite itself is a distributed Spark job, not a driver loop over
files.

**Rename-free commit protocol** (object-store-safe: on S3A a rename is
a non-atomic copy+delete, so the data path must never rename):

1. survivors are written *directly* into a brand-new generation
   directory ``gen=M`` that the catalog does not reference yet —
   readers enumerate only catalog-listed generations, so a crash
   mid-write leaves an invisible orphan directory, never partial data;
2. the commit point is ONE atomic catalog write
   (:meth:`~miniodb_spark.catalog.Catalog.commit_rewrite`): the
   survivor generation appears and the superseded ``(gen, dt)``
   partitions become excluded from reads in the same ``os.replace``;
3. the old partition directories are garbage-collected afterwards — a
   crash between commit and GC leaves them on disk but invisible
   (excluded), and the next mutation on the table retries the GC.

The whole reserve→write→commit window runs under the engine's
per-table flush lock so no concurrent flush can claim generation M.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import fs as fsmod


def gc_superseded(engine, table: str) -> int:
    """Remove the directories of partitions a committed rewrite
    superseded, then forget the exclusions. Idempotent and crash-safe:
    every step re-checks disk state, and exclusions are only cleared
    after the removals succeed."""
    parts = sorted(engine.catalog.excluded_parts(table))
    if not parts:
        return 0
    for g, d in parts:
        pdir = fsmod.join(engine._gen_dir(table, g), f"dt={d}")
        if engine.fs.is_dir(pdir):
            engine.fs.remove_dir(pdir)
    engine.catalog.clear_excluded(table, parts)
    return len(parts)


def delete_rows(
    engine,
    table: str,
    df: DataFrame,
    delete_predicate: Column,
) -> int:
    """Delete rows matching ``delete_predicate`` from a table's persisted
    data; returns the number of rows deleted. ``df`` must be the
    engine's aligned persisted read (columns = cumulative schema +
    dt + gen). Only (gen, dt) partitions containing matches are
    rewritten, via the rename-free commit protocol above.

    **Cross-driver serialization**: the whole snapshot→rewrite→commit
    runs under the table-level ``#rewrite`` lease (reference: every
    mutation holds the Redis (table,id) lock, miniodb_service.go:
    720-722; rewrites serialize per *table* here because the unit of
    commit is the whole catalog entry). The per-process flush lock
    alone cannot stop a second driver on the same store root from
    reserving the same generation index — and, worse, a snapshot taken
    before the other driver's commit would re-materialize rows it just
    deleted. So if the catalog moved while we waited for the lease, the
    snapshot is re-derived from the refreshed catalog before counting."""
    with engine.lease.holding(f"{table}/#rewrite"), engine._flush_lock(table):
        if engine.catalog.refresh_if_changed(table):
            df = engine.read_persisted(table)
            if df is None:
                return 0
        per_part = df.filter(delete_predicate).groupBy("gen", "dt").count().collect()
        if not per_part:
            return 0
        affected = [(int(r["gen"]), r["dt"]) for r in per_part]
        deleted = sum(r["count"] for r in per_part)

        affected_pred = F.lit(False)
        for g, d in affected:
            affected_pred = affected_pred | ((F.col("gen") == g) & (F.col("dt") == d))
        survivors = df.filter(affected_pred).filter(~delete_predicate).drop("gen")

        cum = engine.catalog.schema_of(table)
        cfg = engine.catalog.get_table(table)
        # retry any GC a previous crash left behind, so stale excluded
        # directories can't accumulate
        gc_superseded(engine, table)
        new_gen = engine.catalog.next_generation_index(table)
        # a long rewrite job must not outlive the lease TTL mid-commit:
        # the keepalive daemon re-extends every ttl/3 for the duration
        # of the write + commit (at 100 TB the rewrite job runs minutes;
        # the reference lock exposes the same Extend, pkg/lock/lock.go)
        with engine.lease.keepalive(f"{table}/#rewrite"):
            # 1. land survivors directly in the unreferenced generation
            #    dir
            (
                survivors.repartition("dt")
                .write.mode("overwrite")
                .option("compression", cfg.compression if cfg else "snappy")
                .partitionBy("dt")
                .parquet(engine._gen_dir(table, new_gen))
            )
            # 2. COMMIT: generation M becomes visible and the old
            #    partitions invisible in one atomic metadata write
            engine.catalog.commit_rewrite(table, dict(cum), affected)
    # 3. GC the superseded directories (safe to crash here)
    gc_superseded(engine, table)
    return int(deleted)
