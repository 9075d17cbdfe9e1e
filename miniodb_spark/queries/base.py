"""Registry plumbing shared by every query module: fixture loading
(ts-encoding-tolerant), the QuerySpec dataclass, and the @register
decorator that populates the shared REGISTRY dict."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..fixtures import fixture_df



def normalize_event_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize an events timestamp column to TimestampType.

    The fixture's ts encoding has drifted across driver testdata
    regenerations: parquet TIMESTAMP(NANOS) (rounds ≤4), plain
    TIMESTAMP(MICROS) (round 5+), and — with nanosAsLong set — nanos
    surfaces as a raw int64. Handle all three so nothing here assumes
    a physical type. Works on batch and streaming DataFrames alike
    (pure column expressions, no actions).
    """
    dt = df.schema[col].dataType
    if isinstance(dt, T.TimestampType):
        return df
    if isinstance(dt, T.TimestampNTZType):
        # TimestampType so downstream instant arithmetic (unix_micros,
        # watermarks) resolves; identical wall-clock values under the
        # UTC session this repo runs with.
        return df.withColumn(col, F.col(col).cast("timestamp"))
    # int64 nanoseconds (legacy nanos fixture read under nanosAsLong,
    # or a raw epoch-ns column): truncate to µs exactly like DuckDB's
    # TIMESTAMP_NS → TIMESTAMP coercion. MUST be integer division —
    # `/` coerces to double, whose 256 ns ulp near 1.7e18 truncates
    # ~1/64 of µs-grain values to the wrong microsecond.
    return df.withColumn(
        col, F.timestamp_micros(F.expr(f"`{col}` div 1000"))
    )


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    # fixture_df reuses the footer-inferred schema per (process, path)
    # instead of re-inferring on the driver every call — see
    # miniodb_spark.fixtures (r17: ~90 ms → ~17 ms per table open).
    if table == "events":
        # nanosAsLong is runtime-settable and only affects
        # TIMESTAMP(NANOS) files; set it first so a legacy nanos fixture
        # reads as long instead of throwing PARQUET_TYPE_ILLEGAL
        # (registry queries must not depend on the caller's session
        # factory — the correctness driver builds its own SparkSession).
        # It is set BEFORE the first fixture_df call, so the cached
        # schema is the one inferred under this flag.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return normalize_event_ts(fixture_df(spark, sf_dir, table))
    return fixture_df(spark, sf_dir, table)


def bounded_sort(df: DataFrame, *cols) -> DataFrame:
    """Output-edge total order for a result whose row count is bounded
    by a SCHEMA-level cardinality (an enum-like group key, a key-range
    predicate), not by the data volume — q1's returnflag×linestatus,
    a month domain, nation keys.

    ``orderBy`` plans ``Exchange rangepartitioning`` whose bounds come
    from an extra SAMPLING pass over the child (one more Spark job +
    one more shuffle every execution, at every scale — guide §2.4's
    "orderBy used only to make output deterministic"). For a frame
    that is provably ≤ a few hundred rows the range machinery buys
    nothing: exchange everything to ONE partition and sort inside it.
    The upstream aggregation keeps its full AQE-chosen parallelism —
    only the already-aggregated rows move (this is deliberately
    ``repartition(1)``, not ``coalesce(1)``: coalesce would collapse
    the final aggregate itself to one task, which at 100 TB would
    serialize the shuffle-block fetch of every map task into a single
    reducer). Result rows and their order are identical to
    ``df.orderBy(*cols)``; measured at sf0.1 it removes 1 Exchange +
    1-2 jobs per query (plans/r17/*_after.txt)."""
    return df.repartition(1).sortWithinPartitions(*cols)


@dataclass
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → driver records rows-only check
    doc: str = ""
    tags: tuple = ()


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = "", tags: tuple = ()):
    def deco(fn):
        REGISTRY[name] = QuerySpec(fn=fn, oracle=oracle, doc=doc, tags=tags)
        return fn

    return deco
