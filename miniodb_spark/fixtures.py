"""Catalog-style schema reuse for the STATIC testdata fixtures.

``spark.read.parquet(path)`` pays a file listing + parquet footer
schema inference on the DRIVER on every call — measured ~90 ms per
call at sf0.1 (tools/profile_r17.py round-17 experiment), and at 100 TB
it is a per-query object-store footer fetch. Every registry query
re-opens its fixture tables on every invocation, so this constant was
multiplied by 1-6 tables × every query execution.

:func:`fixture_df` infers the schema ONCE per (process, path) from the
parquet footer — i.e. still computed from the parquet inputs, exactly
like the first read always has — and supplies it explicitly on
subsequent reads (~17 ms/call measured). This is precisely what a
table catalog does with a table definition (the reference keeps table
schemas in its catalog; Spark's own ``saveAsTable`` metastore path
never re-infers), scoped to one process: nothing is persisted across
runs, and a fresh bench/driver process always starts by reading the
footer again.

Scope guard: ONLY for the read-only fixture directories the registry
queries scan. Engine store directories mutate (flush / compaction /
schema evolution) and must keep re-reading their live schema — the
engine paths do not use this module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_SCHEMA_CACHE: dict[str, T.StructType] = {}


def fixture_df(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Read ``{sf_dir}/{table}.parquet`` with the process-cached
    footer schema (first call infers and caches it)."""
    path = f"{sf_dir}/{table}.parquet"
    sch = _SCHEMA_CACHE.get(path)
    if sch is None:
        sch = spark.read.parquet(path).schema
        _SCHEMA_CACHE[path] = sch
    return spark.read.schema(sch).parquet(path)
