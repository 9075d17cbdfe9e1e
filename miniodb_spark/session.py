"""SparkSession factory.

One place to own the configs that matter at 100 TB: AQE (runtime
re-planning, skew-join splitting, partition coalescing), parquet
filter pushdown + predicate-level pruning, Arrow for any Python
exchange, and a shuffle-partition count that tracks the local core
count during tests (on a real cluster this is overridden by the
submitter; AQE coalesces the rest).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(
    app_name: str = "miniodb_spark",
    cpus: str | int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = str(cpus or _DEFAULT_CPUS)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # AQE: runtime re-plan, auto-coalesce post-shuffle partitions,
        # skew-join splitting — essential at 100 TB, harmless at sf0.001.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        # Arrow for createDataFrame/toPandas/pandas_udf exchange.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Parquet scan efficiency: pushdown is on by default; make it
        # explicit because the reference's whole pruning layer depends on it.
        .config("spark.sql.parquet.filterPushdown", "true")
        # parquet TIMESTAMP(NANOS) (e.g. the events fixture) is otherwise an
        # illegal type for the vectorized reader; read as long + convert.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # Don't let tiny test files produce one-row tasks, but keep the
        # default 128m split for scale runs.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
