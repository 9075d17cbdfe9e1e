"""Id-level delete/update via copy-on-write partition rewrite.

Reference semantics (/root/reference/internal/query/query.go:1252-1413):
find the files containing the id via the Redis index; files made
entirely of the id are dropped, others are rewritten without the
matching rows. Our Spark-shaped unit of rewrite is the
``gen=N/dt=day`` partition: affected partitions are discovered by a
pruned scan (the ``id`` predicate rides parquet footer min/max),
survivors are re-materialized in *cumulative* types into the matching
schema generation, and the old partition directories are removed. A
failure mid-rewrite leaves the old data in place (write-to-temp, swap
last). The rewrite itself is a distributed Spark job, not a driver
loop over files.

All file manipulation goes through the engine's filesystem abstraction
(:mod:`miniodb_spark.fs`), so the same rewrite-and-swap runs against a
local root or an object store (``s3a://``) — matching the reference's
MinIO rewrite-and-reupload.
"""

from __future__ import annotations

import uuid

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import fs as fsmod


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
    rewritten."""
    fs = engine.fs
    per_part = df.filter(delete_predicate).groupBy("gen", "dt").count().collect()
    if not per_part:
        return 0
    affected = [(int(r["gen"]), r["dt"]) for r in per_part]
    deleted = sum(r["count"] for r in per_part)

    cum = engine.catalog.schema_of(table)
    target_gen = engine.catalog.generation_for(table, cum)

    affected_pred = F.lit(False)
    for g, d in affected:
        affected_pred = affected_pred | ((F.col("gen") == g) & (F.col("dt") == d))
    survivors = df.filter(affected_pred).filter(~delete_predicate).drop("gen")

    table_dir = engine._table_dir(table)
    tmp = fsmod.join(table_dir, f"_rewrite_{uuid.uuid4().hex}")
    survivors.write.mode("overwrite").partitionBy("dt").parquet(tmp)

    # snapshot the exact pre-existing files of every affected partition —
    # they (and only they) become redundant once survivors land
    preexisting: list[str] = []
    for g, d in affected:
        pdir = fsmod.join(engine._gen_dir(table, g), f"dt={d}")
        preexisting.extend(p for p, _ in fs.list_files(pdir, suffix=".parquet"))

    try:
        # land survivors in the cumulative-typed generation first…
        target_dir = engine._gen_dir(table, target_gen)
        for part_dir in fs.list_dirs(tmp, prefix="dt="):
            part_name = part_dir.rstrip("/").rsplit("/", 1)[-1]
            dst_dir = fsmod.join(target_dir, part_name)
            fs.makedirs(dst_dir)
            for src, _ in fs.list_files(part_dir, suffix=".parquet"):
                fname = src.rstrip("/").rsplit("/", 1)[-1]
                fs.move(src, fsmod.join(dst_dir, f"rw_{uuid.uuid4().hex}_{fname}"))
        # …then drop exactly the snapshotted old files
        for path in preexisting:
            fs.remove_file(path)
        for g, d in affected:
            pdir = fsmod.join(engine._gen_dir(table, g), f"dt={d}")
            if fs.is_dir(pdir) and not fs.list_files(pdir, suffix=".parquet"):
                fs.remove_dir(pdir)
    finally:
        fs.remove_dir(tmp)
    return int(deleted)
