"""Id-level delete/update via copy-on-write partition rewrite.

Reference semantics (/root/reference/internal/query/query.go:1252-1413):
find the files containing the id via the Redis index; files made
entirely of the id are dropped, others are rewritten without the
matching rows. Our Spark-shaped unit of rewrite is the ``dt``
partition: affected partitions are discovered by a pruned scan (the
``id`` predicate rides parquet footer min/max), rewritten to a temp
location, and swapped in. Partitions with no surviving rows are
removed entirely — same net behavior, no per-file bookkeeping, and the
rewrite itself is a distributed Spark job rather than a driver loop.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _partition_dir(table_dir: str, dt: str) -> str:
    return os.path.join(table_dir, f"dt={dt}")


def rewrite_partitions(
    spark: SparkSession,
    table_dir: str,
    df: DataFrame,
    affected_dts: list[str],
    keep_predicate: Column,
) -> None:
    """Rewrite the given ``dt`` partitions keeping only rows matching
    ``keep_predicate``. Uses write-to-temp + atomic directory swap so a
    failure mid-rewrite leaves the old data in place."""
    if not affected_dts:
        return
    tmp = os.path.join(table_dir, f"_rewrite_{uuid.uuid4().hex}")
    survivors = df.filter(F.col("dt").isin(affected_dts)).filter(keep_predicate)
    survivors.write.mode("overwrite").partitionBy("dt").parquet(tmp)

    written = {
        e.name for e in os.scandir(tmp) if e.is_dir() and e.name.startswith("dt=")
    } if os.path.isdir(tmp) else set()
    try:
        for dt in affected_dts:
            old = _partition_dir(table_dir, dt)
            part = f"dt={dt}"
            if os.path.isdir(old):
                shutil.rmtree(old)
            if part in written:
                shutil.move(os.path.join(tmp, part), old)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def delete_rows(
    spark: SparkSession,
    table_dir: str,
    df: DataFrame,
    delete_predicate: Column,
) -> int:
    """Delete rows matching ``delete_predicate`` from a dt-partitioned
    table; returns the number of rows deleted. Only partitions that
    actually contain matches are rewritten (partition + footer pruning
    keep the discovery scan cheap)."""
    matches = df.filter(delete_predicate)
    per_dt = matches.groupBy("dt").count().collect()
    if not per_dt:
        return 0
    affected = [r["dt"] for r in per_dt]
    deleted = sum(r["count"] for r in per_dt)
    rewrite_partitions(spark, table_dir, df, affected, ~delete_predicate)
    return int(deleted)
