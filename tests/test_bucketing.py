"""Bucketed co-located joins: the recurring-join scale path must not
shuffle either side."""

import pytest
from pyspark.sql import functions as F

from miniodb_spark import plans
from miniodb_spark.bucketing import bucketed_join, write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    # warehouse.dir is a static conf; managed tables land in the default
    # ./spark-warehouse (gitignored) and are dropped on teardown
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(orders, "b_orders", "o_orderkey", 8)
    write_bucketed(lineitem, "b_lineitem", "o_orderkey", 8)
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_no_exchange(spark, bucketed_tables):
    lt, rt = bucketed_tables
    # disable broadcast so the test exercises the co-located merge path
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, lt, rt, on="o_orderkey")
        assert plans.num_shuffles(joined) == 0, plans.simple_plan(joined)
        # and it still computes the right thing
        n = joined.count()
        orders = spark.table(lt)
        li = spark.table(rt)
        expected = li.join(orders.hint("merge"), "o_orderkey").count()
        assert n == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_unbucketed_join_does_exchange(spark, sf_dir):
    # control: the same join over plain parquet shuffles both sides
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        joined = li.join(orders, li.l_orderkey == orders.o_orderkey)
        assert plans.num_shuffles(joined) >= 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
