"""Core SQL surface: aggregations, filters/scalars, joins,
window functions, sorts/limits/CTE/subqueries (SURVEY §2.3-§2.7, §2.9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401
from pyspark.sql import types as T  # noqa: F401

from .base import bounded_sort, load, normalize_event_ts, register  # noqa: F401


# ---------------------------------------------------------------------------
# aggregations (SURVEY §2.5)
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT)                           AS count_order,
           sum(l_quantity)                                    AS sum_qty,
           sum(l_extendedprice)                               AS sum_base_price,
           sum(l_extendedprice * (1 - l_discount))            AS sum_disc_price,
           avg(l_quantity)                                    AS avg_qty,
           avg(l_extendedprice)                               AS avg_price,
           avg(l_discount)                                    AS avg_disc
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1-shaped pricing summary: partial+final agg, group by low-card keys",
)
def q1_pricing_summary(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    agg = (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("count_order"),
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc_price"),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.avg("l_discount").alias("avg_disc"),
        )
    )
    # returnflag×linestatus is a ≤9-row domain at any SF
    return bounded_sort(agg, "l_returnflag", "l_linestatus")


@register(
    "agg_global",
    """
    SELECT CAST(count(*) AS BIGINT)        AS n_rows,
           CAST(count(l_orderkey) AS BIGINT) AS n_orderkey,
           sum(l_extendedprice)            AS sum_price,
           avg(l_discount)                 AS avg_disc,
           min(l_quantity)                 AS min_qty,
           max(l_quantity)                 AS max_qty
    FROM lineitem
    """,
    doc="global COUNT/SUM/AVG/MIN/MAX — the reference's simple_aggregate merge strategy",
)
def agg_global(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n_rows"),
        F.count("l_orderkey").alias("n_orderkey"),
        F.sum("l_extendedprice").alias("sum_price"),
        F.avg("l_discount").alias("avg_disc"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
    )


@register(
    "agg_group_having",
    """
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           sum(o_totalprice)        AS total
    FROM orders
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    HAVING count(*) > 10
    ORDER BY o_orderpriority
    """,
    doc="GROUP BY + HAVING on aggregate (group_aggregate merge strategy, exact in Spark)",
)
def agg_group_having(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderstatus") == "F")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"), F.sum("o_totalprice").alias("total"))
        .filter(F.col("n") > 10)
        .orderBy("o_orderpriority")
    )


@register(
    "agg_count_distinct",
    """
    SELECT l_returnflag,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_part
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="exact DISTINCT aggregation (the reference flags but cannot merge it distributively; Spark can)",
)
def agg_count_distinct(spark, sf_dir):
    # r18 (guide §2.3): two DISTINCT columns in ONE aggregate plan as
    # Expand (every row duplicated per distinct column) feeding a
    # single 2N-row shuffle and three aggregate passes. Splitting into
    # two independent single-distinct aggregates joined on the group
    # key shuffles the same total bytes but as two N-row pipelines
    # that run CONCURRENTLY (independent AQE stages), each a plain
    # partial+final distinct-agg with no Expand. Exact, same rows: the
    # join key set is identical on both sides (same source, same
    # grouping). Measured med 0.54→0.39 s / min 0.42→0.34 s at sf0.1
    # (9-rep A/B, twice, both orders). The 3-row join broadcasts.
    li = load(spark, sf_dir, "lineitem")
    a = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"))
    b = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_part"))
    agg = a.join(b, "l_returnflag").select(
        "l_returnflag", "n_supp", "n_part")
    # returnflag is a ≤3-value enum at any SF
    return bounded_sort(agg, "l_returnflag")


@register(
    "agg_rollup",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n, sum(l_quantity) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    doc="ROLLUP grouping sets — capability upgrade over the reference (it has none)",
    tags=("capability",),
)
def agg_rollup(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("sum_qty"))
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


@register(
    "derived_table",
    """
    SELECT status_band, CAST(count(*) AS BIGINT) AS n,
           round(sum(total), 2) AS grand
    FROM (
      SELECT o_custkey,
             CASE WHEN sum(o_totalprice) > 500000 THEN 'high' ELSE 'low' END AS status_band,
             sum(o_totalprice) AS total
      FROM orders GROUP BY o_custkey) t
    GROUP BY status_band ORDER BY status_band
    """,
    doc="subquery in FROM (derived table) with re-aggregation",
)
def derived_table(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    inner = o.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("total")).select(
        "o_custkey",
        F.when(F.col("total") > 500000, "high").otherwise("low").alias("status_band"),
        "total",
    )
    return (
        inner.groupBy("status_band")
        .agg(F.count("*").alias("n"), F.round(F.sum("total"), 2).alias("grand"))
        .orderBy("status_band")
    )


@register(
    "having_on_avg",
    """
    SELECT c_nationkey, round(avg(c_acctbal), 6) AS avg_bal
    FROM customer GROUP BY c_nationkey
    HAVING avg(c_acctbal) > 5000 AND count(*) >= 3
    ORDER BY c_nationkey
    """,
    doc="HAVING on multiple aggregate predicates (avg + count)",
)
def having_on_avg(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    return (
        c.groupBy("c_nationkey")
        .agg(F.avg("c_acctbal").alias("_avg"), F.count("*").alias("_n"))
        .filter((F.col("_avg") > 5000) & (F.col("_n") >= 3))
        .select("c_nationkey", F.round("_avg", 6).alias("avg_bal"))
        .orderBy("c_nationkey")
    )


@register(
    "ilike_filter",
    """
    SELECT p_partkey, p_name FROM part
    WHERE p_name ILIKE '%BLUE%' AND p_partkey <= 500
    ORDER BY p_partkey
    """,
    doc="case-insensitive LIKE",
)
def ilike_filter(spark, sf_dir):
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") <= 500)
    return (
        p.filter(F.col("p_name").ilike("%BLUE%"))
        .select("p_partkey", "p_name")
        .orderBy("p_partkey")
    )


@register(
    "agg_cube",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem WHERE l_orderkey <= 1000
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    doc="CUBE grouping sets (all 4 grouping combinations) — capability upgrade",
    tags=("capability",),
)
def agg_cube(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 1000)
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"))
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


@register(
    "approx_distinct_within_bound",
    "SELECT true AS hll_ok, true AS exact_gt_zero",
    doc="HLL approx COUNT DISTINCT within its error bound vs exact "
        "(reference query/approximation.go:13-199; rsd 0.02 ≈ precision-12 HLL)",
)
def approx_distinct_within_bound(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    row = ev.agg(
        F.approx_count_distinct("user_id", 0.02).alias("approx"),
        F.countDistinct("user_id").alias("exact"),
    )
    return row.select(
        ((F.abs(F.col("approx") - F.col("exact")) / F.col("exact")) < 0.10).alias("hll_ok"),
        (F.col("exact") > 0).alias("exact_gt_zero"),
    )


# ---------------------------------------------------------------------------
# filters / predicates / scalar functions (SURVEY §2.3, §2.9)
# ---------------------------------------------------------------------------


@register(
    "filter_in_between_like",
    """
    SELECT o_orderkey, o_totalprice, o_orderpriority
    FROM orders
    WHERE o_orderstatus IN ('F', 'P')
      AND o_totalprice BETWEEN 1000 AND 50000
      AND o_orderpriority LIKE '%URGENT%'
    ORDER BY o_orderkey
    """,
    doc="conjunctive predicates: IN / BETWEEN / LIKE (pushed to the parquet scan)",
)
def filter_in_between_like(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return (
        o.filter(
            F.col("o_orderstatus").isin("F", "P")
            & F.col("o_totalprice").between(1000, 50000)
            & F.col("o_orderpriority").like("%URGENT%")
        )
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
        .orderBy("o_orderkey")
    )


@register(
    "string_funcs",
    """
    SELECT c_custkey,
           upper(c_name)                       AS name_upper,
           CAST(length(c_name) AS BIGINT)      AS name_len,
           substr(c_mktsegment, 1, 3)          AS seg3,
           concat(c_mktsegment, '-', c_name)   AS seg_name,
           trim(c_name)                        AS name_trim
    FROM customer WHERE c_custkey <= 50 ORDER BY c_custkey
    """,
    doc="string scalar functions (delegated layer)",
)
def string_funcs(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    return (
        c.filter(F.col("c_custkey") <= 50)
        .select(
            "c_custkey",
            F.upper("c_name").alias("name_upper"),
            F.length("c_name").cast("bigint").alias("name_len"),
            F.substring("c_mktsegment", 1, 3).alias("seg3"),
            F.concat("c_mktsegment", F.lit("-"), "c_name").alias("seg_name"),
            F.trim("c_name").alias("name_trim"),
        )
        .orderBy("c_custkey")
    )


@register(
    "math_case_when",
    """
    SELECT l_orderkey, l_linenumber,
           round(abs(l_discount - 0.05), 6)             AS disc_dev,
           CAST(floor(l_quantity) AS BIGINT)            AS qty_floor,
           CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS price_k,
           CASE WHEN l_quantity > 40 THEN 'bulk'
                WHEN l_quantity > 20 THEN 'mid'
                ELSE 'small' END          AS bucket
    FROM lineitem WHERE l_orderkey <= 100
    ORDER BY l_orderkey, l_linenumber
    """,
    doc="math scalars + CASE WHEN (delegated layer)",
)
def math_case_when(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_orderkey") <= 100)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.abs(F.col("l_discount") - 0.05), 6).alias("disc_dev"),
            F.floor("l_quantity").alias("qty_floor"),
            F.ceil(F.col("l_extendedprice") / 1000).alias("price_k"),
            F.when(F.col("l_quantity") > 40, "bulk")
            .when(F.col("l_quantity") > 20, "mid")
            .otherwise("small")
            .alias("bucket"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@register(
    "date_trunc_month",
    """
    SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
           CAST(count(*) AS BIGINT)         AS n_orders,
           sum(o_totalprice)                AS revenue
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY 1 ORDER BY 1
    """,
    doc="DATE_TRUNC + time-range predicate (the reference's documented date surface, SOLUTION.md:1289)",
)
def date_trunc_month(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return (
        o.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy(F.date_trunc("month", "o_orderdate").alias("month"))
        .agg(F.count("*").alias("n_orders"), F.sum("o_totalprice").alias("revenue"))
        # the 1996 predicate bounds the group domain to 12 months
        .transform(lambda d: bounded_sort(d, "month"))
    )


@register(
    "date_parts_interval",
    """
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT)   AS order_year,
           CAST(month(o_orderdate) AS BIGINT)  AS order_month,
           o_orderdate + INTERVAL 30 DAY       AS due_date
    FROM orders WHERE o_orderkey <= 200 ORDER BY o_orderkey
    """,
    doc="EXTRACT parts + INTERVAL arithmetic (NOW/INTERVAL surface)",
)
def date_parts_interval(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderkey") <= 200)
        .select(
            "o_orderkey",
            F.year("o_orderdate").cast("bigint").alias("order_year"),
            F.month("o_orderdate").cast("bigint").alias("order_month"),
            F.expr("o_orderdate + INTERVAL 30 DAY").alias("due_date"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "json_extract_props",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           avg(CAST(json_extract_string(props, '$.k') AS DOUBLE)) AS avg_k
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    doc="JSON payload extraction — reference payloads are stringified JSON "
        "(concurrent_buffer.go:576-592 stringifies nested values)",
)
def json_extract_props(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.avg(F.get_json_object("props", "$.k").cast("double")).alias("avg_k"),
        )
        # event_type is a fixed enum in the fixture/reference schema
        .transform(lambda d: bounded_sort(d, "event_type"))
    )


@register(
    "json_flatten_typed",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_typed
    FROM events WHERE event_id < 100 ORDER BY event_id
    """,
    doc="typed JSON flattening: from_json with an explicit schema (the "
        "reference stores nested payloads as JSON strings — this is the read-back)",
)
def json_flatten_typed(spark, sf_dir):
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < 100)
    parsed = ev.withColumn("parsed", F.from_json("props", "k BIGINT"))
    return parsed.select("event_id", F.col("parsed.k").alias("k_typed")).orderBy(
        "event_id"
    )


@register(
    "grouped_zscore",
    """
    SELECT event_id, user_id,
           round((value - avg(value) OVER (PARTITION BY user_id))
                 / stddev_samp(value) OVER (PARTITION BY user_id), 6) AS zscore
    FROM events WHERE user_id < 5
    ORDER BY event_id
    """,
    doc="per-key z-score normalization via applyInPandas grouped map — the "
        "UDF-surface showcase (reference has no UDFs, SURVEY §2.12); oracle is "
        "the equivalent window SQL",
)
def grouped_zscore(spark, sf_dir):
    import pandas as pd

    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 5).select(
        "event_id", "user_id", "value"
    )

    def _zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["value"].mean()
        sd = pdf["value"].std(ddof=1)
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "user_id": pdf["user_id"],
                "zscore": ((pdf["value"] - mu) / sd).round(6),
            }
        )

    return (
        ev.groupBy("user_id")
        .applyInPandas(_zscore, "event_id long, user_id long, zscore double")
        .orderBy("event_id")
    )


@register(
    "distinct_values",
    "SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment",
    doc="SELECT DISTINCT (shuffle dedup)",
)
def distinct_values(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    return c.select("c_mktsegment").distinct().orderBy("c_mktsegment")


# ---------------------------------------------------------------------------
# joins (SURVEY §2.4)
# ---------------------------------------------------------------------------


@register(
    "join_inner_agg",
    """
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_orders,
           sum(o_totalprice)        AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    doc="INNER join fact→dim + aggregate; dim side broadcast",
)
def join_inner_agg(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_orders"), F.sum("o_totalprice").alias("revenue"))
        # c_mktsegment is a 5-value enum at any SF
        .transform(lambda d: bounded_sort(d, "c_mktsegment"))
    )


@register(
    "join_multiway_region",
    """
    SELECT r_name, n_name,
           CAST(count(*) AS BIGINT) AS n_orders,
           sum(o_totalprice)        AS revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name IN ('ASIA', 'EUROPE')
    GROUP BY r_name, n_name ORDER BY r_name, n_name
    """,
    doc="TPC-H Q5-shaped multiway star join; dims broadcast, fact never shuffled pre-agg",
)
def join_multiway_region(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name").isin("ASIA", "EUROPE"))
    # broadcast hints only on the BOUNDED dims (nation=25, region=5 rows at
    # every SF). customer grows with the data — at 100× a hard-coded hint
    # would force an executor-OOM-sized broadcast, so AQE's size check
    # decides for it (it still broadcasts at bench SFs, asserted in
    # test_plans.py::test_star_join_broadcasts_dims).
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.count("*").alias("n_orders"), F.sum("o_totalprice").alias("revenue"))
        # region×nation is schema-bounded at 5×25 rows
        .transform(lambda d: bounded_sort(d, "r_name", "n_name"))
    )


@register(
    "join_left_count",
    """
    SELECT c_custkey,
           CAST(count(o_orderkey) AS BIGINT) AS n_big_orders
    FROM customer LEFT JOIN orders
      ON c_custkey = o_custkey AND o_totalprice > 100000
    WHERE c_custkey <= 100
    GROUP BY c_custkey ORDER BY c_custkey
    """,
    doc="LEFT OUTER join with non-matching rows preserved (zero-count groups)",
)
def join_left_count(spark, sf_dir):
    c = load(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 100)
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, (c.c_custkey == o.o_custkey) & (o.o_totalprice > 100000), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_big_orders"))
        # the c_custkey <= 100 pushdown bounds the output to 100 rows
        .transform(lambda d: bounded_sort(d, "c_custkey"))
    )


@register(
    "join_right",
    """
    SELECT n_name, CAST(count(c_custkey) AS BIGINT) AS n_cust
    FROM customer RIGHT JOIN nation ON c_nationkey = n_nationkey AND c_acctbal > 9000
    GROUP BY n_name ORDER BY n_name
    """,
    doc="RIGHT OUTER join (all nations kept, even with no qualifying customers)",
)
def join_right(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    return (
        c.join(n, (c.c_nationkey == n.n_nationkey) & (c.c_acctbal > 9000), "right")
        .groupBy("n_name")
        .agg(F.count("c_custkey").alias("n_cust"))
        .orderBy("n_name")
    )


@register(
    "join_full_outer",
    """
    WITH cn AS (SELECT c_nationkey AS k, CAST(count(*) AS BIGINT) AS n_cust
                FROM customer WHERE c_acctbal > 9500 GROUP BY 1),
         sn AS (SELECT s_nationkey AS k, CAST(count(*) AS BIGINT) AS n_supp
                FROM supplier WHERE s_acctbal > 9500 GROUP BY 1)
    SELECT coalesce(cn.k, sn.k) AS nationkey, n_cust, n_supp
    FROM cn FULL OUTER JOIN sn ON cn.k = sn.k
    ORDER BY nationkey
    """,
    doc="FULL OUTER join over asymmetric key sets",
)
def join_full_outer(spark, sf_dir):
    c = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9500)
        .groupBy(F.col("c_nationkey").alias("k"))
        .agg(F.count("*").alias("n_cust"))
    )
    s = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9500)
        .groupBy(F.col("s_nationkey").alias("k"))
        .agg(F.count("*").alias("n_supp"))
    )
    return (
        c.join(s, "k", "full")
        .select(F.col("k").alias("nationkey"), "n_cust", "n_supp")
        .orderBy("nationkey")
    )


@register(
    "join_cross",
    """
    SELECT r_name, n_name FROM region CROSS JOIN nation
    WHERE n_nationkey < 5 ORDER BY r_name, n_name
    """,
    doc="CROSS join (small×small; admitted by the reference's JOIN regex)",
)
def join_cross(spark, sf_dir):
    r = load(spark, sf_dir, "region")
    n = load(spark, sf_dir, "nation").filter(F.col("n_nationkey") < 5)
    return r.crossJoin(n).select("r_name", "n_name").orderBy("r_name", "n_name")


@register(
    "join_semi",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    ORDER BY c_custkey
    """,
    doc="LEFT SEMI join (EXISTS) — capability the reference never surfaces distinctly",
    tags=("capability",),
)
def join_semi(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "join_anti",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    ORDER BY c_custkey
    """,
    doc="LEFT ANTI join (NOT EXISTS)",
    tags=("capability",),
)
def join_anti(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# window functions (SURVEY §2.6)
# ---------------------------------------------------------------------------


@register(
    "window_row_number_topn",
    """
    SELECT user_id, event_id, value FROM (
      SELECT user_id, event_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events) t
    WHERE rn <= 3 ORDER BY user_id, event_id
    """,
    doc="row_number per partition → first-3-per-user (dedup/top-n-per-key pattern)",
)
def window_row_number_topn(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("user_id", "event_id", "value")
        .orderBy("user_id", "event_id")
    )


@register(
    "window_running_sum",
    """
    SELECT user_id, event_id,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS running_value
    FROM events WHERE user_id < 5 ORDER BY user_id, event_id
    """,
    doc="running aggregate over an ordered frame",
)
def window_running_sum(spark, sf_dir):
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 5)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        ev.select(
            "user_id",
            "event_id",
            F.round(F.sum("value").over(w), 6).alias("running_value"),
        ).orderBy("user_id", "event_id")
    )


@register(
    "window_lag_lead",
    """
    SELECT user_id, event_id,
           lag(event_type)  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
           lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
    FROM events WHERE user_id < 5 ORDER BY user_id, event_id
    """,
    doc="lag/lead navigation",
)
def window_lag_lead(spark, sf_dir):
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 5)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "user_id",
            "event_id",
            F.lag("event_type").over(w).alias("prev_type"),
            F.lead("event_type").over(w).alias("next_type"),
        )
        .orderBy("user_id", "event_id")
    )


@register(
    "window_moving_avg",
    """
    SELECT user_id, event_id,
           avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS mavg
    FROM events WHERE user_id < 5 ORDER BY user_id, event_id
    """,
    doc="moving average over a bounded row frame",
)
def window_moving_avg(spark, sf_dir):
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 5)
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-3, 0)
    return (
        ev.select("user_id", "event_id", F.avg("value").over(w).alias("mavg"))
        .orderBy("user_id", "event_id")
    )


@register(
    "window_rank_dist",
    """
    SELECT user_id, event_id,
           rank()         OVER w AS rnk,
           dense_rank()   OVER w AS drnk,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           round(percent_rank() OVER w, 6) AS prank,
           round(cume_dist()    OVER w, 6) AS cdist
    FROM events WHERE user_id < 5
    WINDOW w AS (PARTITION BY user_id ORDER BY value, event_id)
    ORDER BY user_id, event_id
    """,
    doc="ranking window family: rank/dense_rank/ntile/percent_rank/cume_dist",
)
def window_rank_dist(spark, sf_dir):
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 5)
    w = W.partitionBy("user_id").orderBy("value", "event_id")
    return (
        ev.select(
            "user_id",
            "event_id",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.ntile(4).over(w).cast("bigint").alias("quartile"),
            F.round(F.percent_rank().over(w), 6).alias("prank"),
            F.round(F.cume_dist().over(w), 6).alias("cdist"),
        )
        .orderBy("user_id", "event_id")
    )


@register(
    "window_first_last",
    """
    SELECT user_id, event_id,
           first_value(event_type) OVER w AS first_type,
           last_value(event_type)  OVER (PARTITION BY user_id ORDER BY ts, event_id
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND UNBOUNDED FOLLOWING) AS last_type,
           nth_value(event_type, 2) OVER w AS second_type
    FROM events WHERE user_id < 5
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, event_id
    """,
    doc="first/last/nth_value navigation over ordered frames",
)
def window_first_last(spark, sf_dir):
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 5)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return (
        ev.select(
            "user_id",
            "event_id",
            F.first("event_type").over(w).alias("first_type"),
            F.last("event_type").over(w_full).alias("last_type"),
            F.nth_value("event_type", 2).over(w).alias("second_type"),
        )
        .orderBy("user_id", "event_id")
    )


@register(
    "approx_percentile_within_bound",
    "SELECT true AS p50_ok, true AS p95_ok",
    doc="approx_percentile within rank-error bound of the exact interpolated "
        "percentile (accuracy 10000 ⇒ ±0.01 rank error)",
)
def approx_percentile_within_bound(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    row = ev.agg(
        F.expr("approx_percentile(value, 0.5, 10000)").alias("a50"),
        F.expr("approx_percentile(value, 0.95, 10000)").alias("a95"),
        F.expr("percentile(value, 0.45)").alias("lo50"),
        F.expr("percentile(value, 0.55)").alias("hi50"),
        F.expr("percentile(value, 0.90)").alias("lo95"),
        F.expr("percentile(value, 0.99)").alias("hi95"),
    ).first()
    ok50 = row["lo50"] <= row["a50"] <= row["hi50"]
    ok95 = row["lo95"] <= row["a95"] <= row["hi95"]
    return spark.createDataFrame([(bool(ok50), bool(ok95))],
                                 "p50_ok boolean, p95_ok boolean")


@register(
    "sessionize_30min",
    """
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE OR
                  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events)
    SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions
    FROM flagged GROUP BY user_id ORDER BY user_id
    """,
    doc="gap-based sessionization (30 min) — batch analogue of session windows",
)
def sessionize_30min(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    flag = F.when(
        prev.isNull()
        | (F.unix_micros(F.col("ts")) - F.unix_micros(prev) > 1800 * 1_000_000),
        1,
    ).otherwise(0)
    # r18 (guide §2.4): ONE range exchange on user_id up front serves
    # the whole pipeline — RangePartitioning(user_id) satisfies the
    # window's and the aggregate's clustering AND the output orderBy's
    # OrderedDistribution (equal keys land in one partition, partitions
    # are key-ordered), so the planner's hash exchange + second range
    # exchange + its sampling job collapse to a single shuffle of the
    # events rows (4 → 3 jobs, −0.11 s med at sf0.1; rows identical).
    # Trade: the range bounds are now sampled from the (column-pruned)
    # events input instead of the smaller per-user aggregate — a
    # sampling pass over 3 columns vs a full extra shuffle of the
    # per-user rows; skew profile is unchanged (the window already
    # clusters by user_id).
    return (
        ev.select("user_id", "ts", "event_id")
        .repartitionByRange("user_id")
        .select("user_id", flag.alias("new_session"))
        .groupBy("user_id")
        .agg(F.sum("new_session").cast("bigint").alias("n_sessions"))
        .orderBy("user_id")
    )


@register(
    "tumbling_window_counts",
    """
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
           CAST(count(*) AS BIGINT)                  AS n,
           sum(value)                                AS total_value
    FROM events GROUP BY 1 ORDER BY 1
    """,
    doc="tumbling 1h event-time windows (streaming capability upgrade, validated "
        "in batch: window() is the same Catalyst expression either way)",
    tags=("streaming", "capability"),
)
def tumbling_window_counts(spark, sf_dir):
    from ..streaming.windows import tumbling

    ev = load(spark, sf_dir, "events")
    win = tumbling(
        ev, "ts", "1 hour",
        aggs=[F.count("*").alias("n"), F.sum("value").alias("total_value")],
    )
    return win.select(
        F.col("window.start").alias("window_start"), "n", "total_value"
    ).orderBy("window_start")


# ---------------------------------------------------------------------------
# sorts / limits / CTE / subqueries (SURVEY §2.7, §3)
# ---------------------------------------------------------------------------


@register(
    "sort_limit_topk",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    doc="top-k: TakeOrderedAndProject replaces the reference's topn_merge strategy",
)
def sort_limit_topk(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@register(
    "limit_offset",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_orderkey LIMIT 20 OFFSET 40
    """,
    doc="LIMIT+OFFSET pagination (StreamQuery cursor semantics, miniodb_service.go:1276-1360)",
)
def limit_offset(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice").orderBy("o_orderkey").offset(40).limit(20)
    )


@register(
    "cte_revenue",
    """
    WITH rev AS (
      SELECT l_orderkey, sum(l_extendedprice * (1 - l_discount)) AS revenue
      FROM lineitem GROUP BY l_orderkey)
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT)  AS n,
           round(sum(revenue), 2)    AS total_rev
    FROM orders JOIN rev ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    doc="CTE + join on derived aggregate (WITH ... SELECT is the gate's second admitted form)",
)
def cte_revenue(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    rev = li.groupBy("l_orderkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    )
    return (
        o.join(rev, o.o_orderkey == rev.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"), F.round(F.sum("revenue"), 2).alias("total_rev"))
        # o_orderpriority is a 5-value enum at any SF
        .transform(lambda d: bounded_sort(d, "o_orderpriority"))
    )


@register(
    "subquery_in",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9900)
    ORDER BY o_orderkey
    """,
    doc="IN-subquery (decorrelated to a semi join by Catalyst)",
)
def subquery_in(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9900)
    return (
        o.join(c, o.o_custkey == c.c_custkey, "left_semi")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    )


@register(
    "subquery_scalar",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_above_avg
    FROM lineitem
    WHERE l_quantity > (SELECT avg(l_quantity) FROM lineitem)
    """,
    doc="scalar subquery in a predicate",
)
def subquery_scalar(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem")
    return spark.sql(
        "SELECT CAST(count(*) AS BIGINT) AS n_above_avg FROM lineitem "
        "WHERE l_quantity > (SELECT avg(l_quantity) FROM lineitem)"
    )


@register(
    "subquery_correlated_scalar",
    """
    SELECT c_custkey,
           (SELECT CAST(count(*) AS BIGINT) FROM orders o
            WHERE o.o_custkey = c.c_custkey) AS n_orders
    FROM customer c WHERE c_custkey <= 100 ORDER BY c_custkey
    """,
    doc="correlated scalar subquery in the SELECT list (Catalyst rewrites "
        "to a left outer aggregate join)",
)
def subquery_correlated_scalar(spark, sf_dir):
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c_custkey,
               (SELECT CAST(count(*) AS BIGINT) FROM orders o
                WHERE o.o_custkey = c.c_custkey) AS n_orders
        FROM customer c WHERE c_custkey <= 100 ORDER BY c_custkey
        """
    )


@register(
    "subquery_not_exists",
    """
    SELECT c_custkey, c_name
    FROM customer c
    WHERE c_custkey <= 200
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= DATE '2001-01-01')
    ORDER BY c_custkey
    """,
    doc="correlated NOT EXISTS through the SQL gate (Catalyst rewrites to a "
        "left-anti join — the distributed plan shape; no per-row subquery "
        "execution at any scale)",
)
def subquery_not_exists(spark, sf_dir):
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer c
        WHERE c_custkey <= 200
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderdate >= DATE '2001-01-01')
        ORDER BY c_custkey
        """
    )


@register(
    "order_nulls_last",
    """
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_totalprice END AS tp
    FROM orders WHERE o_orderkey <= 300
    ORDER BY tp DESC NULLS LAST, o_orderkey
    """,
    doc="explicit NULLS LAST ordering (engine defaults differ: Spark DESC is "
        "nulls-last, DuckDB DESC is nulls-first — explicit placement is the "
        "portable contract)",
)
def order_nulls_last(spark, sf_dir):
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 300)
    tp = F.when(F.col("o_orderkey") % 7 == 0, F.lit(None)).otherwise(
        F.col("o_totalprice")
    )
    return o.select("o_orderkey", tp.alias("tp")).orderBy(
        F.col("tp").desc_nulls_last(), "o_orderkey"
    )


@register(
    "grouping_sets_explicit",
    """
    SELECT o_orderstatus, o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    ORDER BY o_orderstatus NULLS LAST, o_orderpriority NULLS LAST
    """,
    doc="explicit GROUPING SETS (beyond rollup/cube): per-status, "
        "per-priority, and grand-total groups in one pass",
)
def grouping_sets_explicit(spark, sf_dir):
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(count(*) AS BIGINT) AS n,
               round(sum(o_totalprice), 2) AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus NULLS LAST, o_orderpriority NULLS LAST
        """
    )


