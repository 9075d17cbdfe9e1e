"""Additional coverage: classic TPC-H shapes (q3/q6), nulls, set
ops, string/stat aggregates, funnels/cohorts, histograms (SURVEY §2 tail).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401
from pyspark.sql import types as T  # noqa: F401

from .base import load, normalize_event_ts, register  # noqa: F401


# ---------------------------------------------------------------------------
# additional coverage: classic TPC-H shapes, nulls, set ops, stats
# ---------------------------------------------------------------------------


@register(
    "q3_shipping_priority",
    """
    SELECT l_orderkey,
           sum(l_extendedprice * (1 - l_discount)) AS revenue,
           o_orderdate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shape: selective dim filter → fact join → agg → top-k",
)
def q3_shipping_priority(spark, sf_dir):
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    # customer is a growing table: no hard broadcast hint — AQE sizes the
    # post-filter side at runtime (BUILDING segment ≈ 20% of customers) and
    # still picks broadcast at bench SFs; at 100× it degrades gracefully to
    # a shuffle join instead of OOMing an executor.
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "q6_forecast_revenue",
    """
    SELECT sum(l_extendedprice * l_discount) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape: pure scan+filter+agg — every predicate must push down",
)
def q6_forecast_revenue(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


@register(
    "null_handling",
    """
    SELECT c_custkey,
           coalesce(CAST(count(o_orderkey) AS BIGINT), 0)       AS n_orders,
           CASE WHEN count(o_orderkey) = 0 THEN 'inactive'
                ELSE 'active' END                               AS activity,
           nullif(CAST(count(o_orderkey) AS BIGINT), 0)         AS n_or_null
    FROM customer LEFT JOIN orders
      ON c_custkey = o_custkey AND o_totalprice > 450000
    WHERE c_custkey <= 200
    GROUP BY c_custkey
    ORDER BY c_custkey
    """,
    doc="NULL semantics: coalesce / nullif / CASE over outer-join nulls",
)
def null_handling(spark, sf_dir):
    c = load(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 200)
    o = load(spark, sf_dir, "orders")
    n = F.count("o_orderkey")
    return (
        c.join(o, (c.c_custkey == o.o_custkey) & (o.o_totalprice > 450000), "left")
        .groupBy("c_custkey")
        .agg(
            F.coalesce(n, F.lit(0)).alias("n_orders"),
            F.when(n == 0, "inactive").otherwise("active").alias("activity"),
            F.nullif(n, F.lit(0)).alias("n_or_null"),
        )
        .orderBy("c_custkey")
    )


@register(
    "set_union_all",
    """
    SELECT k, v FROM (
      SELECT 'cust' AS k, CAST(count(*) AS BIGINT) AS v FROM customer
      UNION ALL
      SELECT 'supp' AS k, CAST(count(*) AS BIGINT) AS v FROM supplier
      UNION ALL
      SELECT 'part' AS k, CAST(count(*) AS BIGINT) AS v FROM part) t
    ORDER BY k
    """,
    doc="UNION ALL — capability upgrade: the reference's gate bans set ops "
        "outright (sql_sanitizer.go:16); Spark has them natively",
    tags=("capability",),
)
def set_union_all(spark, sf_dir):
    c = load(spark, sf_dir, "customer").agg(F.count("*").alias("v")).select(
        F.lit("cust").alias("k"), "v"
    )
    s = load(spark, sf_dir, "supplier").agg(F.count("*").alias("v")).select(
        F.lit("supp").alias("k"), "v"
    )
    p = load(spark, sf_dir, "part").agg(F.count("*").alias("v")).select(
        F.lit("part").alias("k"), "v"
    )
    return c.unionAll(s).unionAll(p).orderBy("k")


@register(
    "set_intersect_except",
    """
    SELECT 'both' AS tag, k FROM (
      SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 9800
      INTERSECT
      SELECT s_nationkey AS k FROM supplier WHERE s_acctbal > 9800) a
    UNION ALL
    SELECT 'cust_only' AS tag, k FROM (
      SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 9800
      EXCEPT
      SELECT s_nationkey AS k FROM supplier WHERE s_acctbal > 9800) b
    ORDER BY tag, k
    """,
    doc="INTERSECT / EXCEPT — capability upgrade over the banned set-op surface",
    tags=("capability",),
)
def set_intersect_except(spark, sf_dir):
    c = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9800)
        .select(F.col("c_nationkey").alias("k"))
    )
    s = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9800)
        .select(F.col("s_nationkey").alias("k"))
    )
    both = c.intersect(s).select(F.lit("both").alias("tag"), "k")
    # subtract == EXCEPT (set) semantics; exceptAll().distinct() is NOT the
    # same — a key on both sides with higher left multiplicity would survive
    cust_only = c.subtract(s).select(F.lit("cust_only").alias("tag"), "k")
    return both.unionAll(cust_only).orderBy("tag", "k")


@register(
    "string_agg_sorted",
    """
    SELECT r_name,
           string_agg(n_name, ',' ORDER BY n_name) AS nations
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name ORDER BY r_name
    """,
    doc="ordered string aggregation (collect_list → sort_array → array_join)",
)
def string_agg_sorted(spark, sf_dir):
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("nations")
        )
        .orderBy("r_name")
    )


@register(
    "percentiles_stddev",
    """
    SELECT event_type,
           round(quantile_cont(value, 0.5), 6)  AS p50,
           round(quantile_cont(value, 0.95), 6) AS p95,
           round(stddev_samp(value), 6)         AS sd,
           round(var_samp(value), 6)            AS var
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    doc="exact interpolated percentiles + sample stddev/variance "
        "(rounded: both engines interpolate in double)",
)
def percentiles_stddev(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
            F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95"),
            F.round(F.stddev_samp("value"), 6).alias("sd"),
            F.round(F.var_samp("value"), 6).alias("var"),
        )
        .orderBy("event_type")
    )


@register(
    "regexp_ops",
    """
    SELECT p_partkey,
           regexp_extract(p_type, '([A-Z]+)', 1)            AS first_word,
           regexp_replace(p_name, '[aeiou]', '_', 'g')      AS devoweled,
           CAST(regexp_matches(p_brand, 'Brand#[0-9]+') AS BOOLEAN) AS brand_ok
    FROM part WHERE p_partkey <= 100 ORDER BY p_partkey
    """,
    doc="regexp extract/replace/match (identical RE syntax subset in both engines)",
)
def regexp_ops(spark, sf_dir):
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") <= 100)
    return p.select(
        "p_partkey",
        F.regexp_extract("p_type", r"([A-Z]+)", 1).alias("first_word"),
        F.regexp_replace("p_name", r"[aeiou]", "_").alias("devoweled"),
        F.col("p_brand").rlike(r"Brand#[0-9]+").alias("brand_ok"),
    ).orderBy("p_partkey")


@register(
    "pivot_status_by_priority",
    """
    SELECT o_orderpriority,
           sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END) AS F,
           sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END) AS O,
           sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END) AS P
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    doc="pivot (df.groupBy().pivot() — oracle via conditional aggregation)",
    tags=("capability",),
)
def pivot_status_by_priority(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .sum("o_totalprice")
        .orderBy("o_orderpriority")
    )


@register(
    "corr_covar_stats",
    """
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
           round(covar_samp(l_quantity, l_extendedprice), 4) AS covs_qp,
           round(covar_pop(l_quantity, l_extendedprice), 4) AS covp_qp,
           round(regr_slope(l_extendedprice, l_quantity), 4) AS slope_pq,
           round(regr_intercept(l_extendedprice, l_quantity), 4) AS icept_pq
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="bivariate statistical aggregates (corr / covar_samp / covar_pop "
        "/ regr_slope / regr_intercept) — single-pass partial+final agg "
        "in both engines; rounded because the moment sums accumulate in "
        "engine-specific order",
)
def corr_covar_stats(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qp"),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("covs_qp"),
            F.round(F.covar_pop("l_quantity", "l_extendedprice"), 4).alias("covp_qp"),
            F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("slope_pq"),
            F.round(
                F.regr_intercept("l_extendedprice", "l_quantity"), 4
            ).alias("icept_pq"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "window_range_frame",
    """
    SELECT user_id, event_id,
           round(sum(value) OVER w, 6) AS hour_sum,
           CAST(count(*) OVER w AS BIGINT) AS hour_n
    FROM events WHERE user_id < 8
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    ORDER BY user_id, event_id
    """,
    doc="time-RANGE window frame (trailing 1-hour sum/count per user) — "
        "the value-based frame the ROWS-frame entries don't cover. Spark "
        "expresses the interval frame as rangeBetween over unix_micros "
        "(exact us arithmetic, identical to DuckDB's ts - INTERVAL "
        "boundary); peers at the same ts are included by both engines",
)
def window_range_frame(spark, sf_dir):
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 8)
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3_600_000_000, 0)
    )
    return (
        ev.select(
            "user_id",
            "event_id",
            F.round(F.sum("value").over(w), 6).alias("hour_sum"),
            F.count("*").over(w).cast("bigint").alias("hour_n"),
        )
        .orderBy("user_id", "event_id")
    )


@register(
    "median_by_type",
    """
    SELECT event_type,
           round(median(value), 6) AS med_value,
           CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    doc="exact MEDIAN aggregate (both engines interpolate the middle "
        "pair on even counts) — the exact-percentile face of the "
        "approx_percentile entries; Spark executes it as a sort-based "
        "percentile within each group",
)
def median_by_type(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(F.median("value"), 6).alias("med_value"),
            F.count("*").alias("n"),
        )
        .orderBy("event_type")
    )


@register(
    "filter_clause_agg",
    """
    SELECT user_id,
           CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT)
               AS n_click,
           CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT)
               AS n_error,
           round(sum(value) FILTER (WHERE event_type = 'purchase'), 6)
               AS purchase_value,
           round(avg(value) FILTER (WHERE value > 50), 6) AS avg_high
    FROM events WHERE user_id < 20
    GROUP BY user_id ORDER BY user_id
    """,
    doc="FILTER-clause aggregation (modern-SQL conditional aggregates; "
        "one scan, N conditions) — expressed in the DataFrame API as "
        "agg-over-when, which Catalyst compiles to the identical "
        "single-pass conditional-aggregate plan; empty filter groups "
        "yield NULL in both engines",
)
def filter_clause_agg(spark, sf_dir):
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    return (
        ev.groupBy("user_id")
        .agg(
            F.count(F.when(F.col("event_type") == "click", True))
            .alias("n_click"),
            F.count(F.when(F.col("event_type") == "error", True))
            .alias("n_error"),
            F.round(
                F.sum(F.when(F.col("event_type") == "purchase",
                             F.col("value"))), 6
            ).alias("purchase_value"),
            F.round(
                F.avg(F.when(F.col("value") > 50, F.col("value"))), 6
            ).alias("avg_high"),
        )
        .orderBy("user_id")
    )


@register(
    "funnel_conversion",
    """
    WITH v AS (
      SELECT user_id, min(ts) AS t_view FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS t_click
      FROM events e JOIN v USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > v.t_view
        AND e.ts <= v.t_view + INTERVAL 1 DAY
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS t_purchase
      FROM events e JOIN c USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
        AND e.ts <= c.t_click + INTERVAL 1 DAY
      GROUP BY e.user_id
    )
    SELECT CAST((SELECT count(*) FROM v) AS BIGINT) AS n_view,
           CAST((SELECT count(*) FROM c) AS BIGINT) AS n_view_click,
           CAST((SELECT count(*) FROM p) AS BIGINT) AS n_full_funnel
    """,
    doc="ordered funnel analysis (view -> click within 1 day -> purchase "
        "within 1 day): each stage is a min-agg over the previous "
        "stage's users — per-user state stays one timestamp per stage, "
        "and the per-stage user tables (cardinality = users, not "
        "events) broadcast under AQE at any corpus size where users << "
        "events",
)
def funnel_conversion(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    day = F.expr("INTERVAL 1 DAY")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id").agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter((F.col("ts") > F.col("t_view"))
                & (F.col("ts") <= F.col("t_view") + day))
        .groupBy("user_id").agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter((F.col("ts") > F.col("t_click"))
                & (F.col("ts") <= F.col("t_click") + day))
        .groupBy("user_id").agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.agg(F.count("*").alias("n_view"))
        .crossJoin(c.agg(F.count("*").alias("n_view_click")))
        .crossJoin(p.agg(F.count("*").alias("n_full_funnel")))
    )


@register(
    "retention_cohorts",
    """
    WITH firsts AS (
      SELECT user_id,
             CAST(date_trunc('day', min(ts)) AS TIMESTAMP) AS cohort_day
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    )
    SELECT f.cohort_day,
           CAST(date_diff('day', f.cohort_day, date_trunc('day', e.ts)) // 7
                AS BIGINT) AS week_offset,
           CAST(count(DISTINCT e.user_id) AS BIGINT) AS active_users
    FROM events e JOIN firsts f USING (user_id)
    WHERE date_trunc('day', e.ts) >= f.cohort_day
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
    doc="retention cohort matrix: users grouped by first-signup day, "
        "distinct-active counts per week offset since signup. The "
        "cohort table (one row per user) broadcasts; one shuffle for "
        "the distinct-count agg. Week offset is integer-div of exact "
        "day difference on day-truncated timestamps — identical "
        "arithmetic in both engines (no week-boundary semantics)",
)
def retention_cohorts(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    firsts = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.date_trunc("day", F.min("ts")).alias("cohort_day"))
    )
    return (
        ev.join(firsts, "user_id")
        .withColumn("eday", F.date_trunc("day", F.col("ts")))
        .filter(F.col("eday") >= F.col("cohort_day"))
        .withColumn(
            "week_offset",
            F.expr("CAST(datediff(eday, cohort_day) div 7 AS BIGINT)"),
        )
        .groupBy("cohort_day", "week_offset")
        .agg(F.count_distinct("user_id").alias("active_users"))
        .orderBy("cohort_day", "week_offset")
    )


@register(
    "rolling_7d_active_users",
    """
    WITH du AS (
      SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, user_id
      FROM events
    ),
    days AS (SELECT DISTINCT day FROM du)
    SELECT d.day,
           CAST(count(DISTINCT u.user_id) AS BIGINT) AS active_7d
    FROM days d JOIN du u
      ON u.day <= d.day AND u.day > d.day - INTERVAL 7 DAY
    GROUP BY d.day ORDER BY d.day
    """,
    doc="trailing-7-day distinct active users per day. Scale shape: events "
        "first collapse to distinct (day, user) pairs — cardinality is "
        "days x users, orders of magnitude below raw events — then each "
        "pair explodes to the <=7 window days it covers (sequence()) and "
        "equi-joins the observed-day dimension: O(7*|pairs|) hash-join "
        "work, never an O(|days|*|pairs|) nested-loop range predicate. "
        "Avoids the quadratic expanding-distinct-window formulation "
        "entirely",
)
def rolling_7d_active_users(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    du = ev.select(
        F.date_trunc("day", "ts").alias("day"), "user_id"
    ).distinct()
    days = F.broadcast(du.select(F.col("day").alias("obs_day")).distinct())
    # each (day, user) activity covers window anchors day..day+6; only
    # anchors that actually occur in the data survive the equi-join
    covered = du.select(
        F.explode(
            F.expr("sequence(day, day + INTERVAL 6 DAY, INTERVAL 1 DAY)")
        ).alias("wday"),
        "user_id",
    )
    return (
        covered.join(days, covered.wday == F.col("obs_day"))
        .groupBy(F.col("obs_day").alias("day"))
        .agg(F.count_distinct("user_id").alias("active_7d"))
        .orderBy("day")
    )


@register(
    "cumulative_distinct_users",
    """
    WITH firsts AS (
      SELECT user_id,
             min(CAST(date_trunc('day', ts) AS TIMESTAMP)) AS day
      FROM events GROUP BY user_id
    ),
    per_day AS (
      SELECT day, CAST(count(*) AS BIGINT) AS new_users
      FROM firsts GROUP BY day
    )
    SELECT day, new_users,
           CAST(sum(new_users) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cumulative_users
    FROM per_day ORDER BY day
    """,
    doc="cumulative distinct users per day via the first-seen-day trick: "
        "min(day) per user then a running sum over the day-grain table. "
        "One agg shuffle on user_id; the window runs over ~days rows, not "
        "events — the expanding COUNT(DISTINCT) it replaces is quadratic "
        "and unshardable at 100 TB",
)
def cumulative_distinct_users(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    firsts = (
        ev.groupBy("user_id")
        .agg(F.date_trunc("day", F.min("ts")).alias("day"))
    )
    per_day = firsts.groupBy("day").agg(
        F.count("*").cast("bigint").alias("new_users")
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    return per_day.select(
        "day",
        "new_users",
        F.sum("new_users").over(w).cast("bigint").alias("cumulative_users"),
    ).orderBy("day")


@register(
    "event_transition_matrix",
    """
    WITH seq AS (
      SELECT event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    )
    SELECT event_type AS from_type, next_type AS to_type,
           CAST(count(*) AS BIGINT) AS n,
           round(count(*) * 1.0 /
                 sum(count(*)) OVER (PARTITION BY event_type), 6) AS prob
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
    doc="first-order Markov transition matrix over per-user event "
        "sequences: lead() under a (ts, event_id) total order, then one "
        "group-agg; row-normalized via a window over the tiny "
        "(types x types) result. One shuffle on user_id, one on the "
        "transition pair — both key-bounded",
)
def event_transition_matrix(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    g = seq.groupBy(
        F.col("event_type").alias("from_type"),
        F.col("next_type").alias("to_type"),
    ).agg(F.count("*").alias("n"))
    row_tot = W.partitionBy("from_type")
    return g.select(
        "from_type", "to_type", "n",
        F.round(F.col("n") / F.sum("n").over(row_tot), 6).alias("prob"),
    ).orderBy("from_type", "to_type")


@register(
    "histogram_equi_width",
    """
    WITH v AS (SELECT value FROM events WHERE value IS NOT NULL),
    b AS (SELECT min(value) AS lo, max(value) AS hi FROM v)
    SELECT CASE WHEN hi = lo THEN CAST(0 AS BIGINT)
           ELSE least(CAST(floor((value - lo) / ((hi - lo) / 10.0))
                           AS BIGINT), 9) END AS bin,
           CAST(count(*) AS BIGINT) AS n
    FROM v, b GROUP BY 1 ORDER BY 1
    """,
    doc="equi-width 10-bin histogram: global min/max (scalar agg, "
        "broadcast), then a single binning pass + group-agg on a 10-key "
        "domain. Two scans, no wide shuffle; the bin arithmetic is "
        "identical IEEE double ops in both engines. NULL values are "
        "excluded before binning and the degenerate hi==lo range "
        "collapses to bin 0, so bin 9 only ever holds genuine "
        "top-decile rows",
)
def histogram_equi_width(spark, sf_dir):
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    b = ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    return (
        ev.crossJoin(F.broadcast(b))
        .select(
            F.when(
                F.col("hi") == F.col("lo"), F.lit(0).cast("bigint")
            ).otherwise(
                F.least(
                    F.floor(
                        (F.col("value") - F.col("lo"))
                        / ((F.col("hi") - F.col("lo")) / 10.0)
                    ).cast("bigint"),
                    F.lit(9).cast("bigint"),
                )
            ).alias("bin")
        )
        .groupBy("bin")
        .agg(F.count("*").alias("n"))
        .orderBy("bin")
    )


@register(
    "revenue_share_by_nation",
    """
    WITH rev AS (
      SELECT n.n_name, sum(l.l_extendedprice * (1 - l.l_discount)) AS revenue
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY n.n_name
    )
    SELECT n_name, round(revenue, 2) AS revenue,
           round(revenue / sum(revenue) OVER (), 6) AS share
    FROM rev ORDER BY n_name
    """,
    doc="ratio-to-report: per-nation revenue share via an unbounded "
        "window over the 25-row aggregate (the grand total never "
        "recomputes the fact scan). Joins: nation/customer broadcast "
        "under AQE; lineitem->orders is the only big shuffle",
)
def revenue_share_by_nation(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    rev = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .alias("revenue")
        )
    )
    w = W.partitionBy()
    return rev.select(
        "n_name",
        F.round("revenue", 2).alias("revenue"),
        F.round(F.col("revenue") / F.sum("revenue").over(w), 6).alias("share"),
    ).orderBy("n_name")


@register(
    "unpivot_part_metrics",
    """
    SELECT p_partkey, metric, value
    FROM (SELECT p_partkey, CAST(p_size AS DOUBLE) AS p_size, p_retailprice
          FROM part WHERE p_partkey <= 50)
    UNPIVOT (value FOR metric IN (p_size, p_retailprice))
    ORDER BY p_partkey, metric
    """,
    doc="UNPIVOT / melt: wide metric columns to long (metric, value) rows "
        "— the inverse of pivot_status_by_priority. Spark's unpivot is a "
        "narrow per-row expand (no shuffle); output is k x rows. NULL "
        "values are dropped after the expand to match DuckDB UNPIVOT's "
        "exclude-NULLs default (Spark's unpivot keeps them), so the two "
        "formulations stay equivalent even on nullable metrics",
)
def unpivot_part_metrics(spark, sf_dir):
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") <= 50)
    return (
        p.select(
            "p_partkey",
            F.col("p_size").cast("double").alias("p_size"),
            "p_retailprice",
        )
        .unpivot(["p_partkey"], ["p_size", "p_retailprice"], "metric", "value")
        .filter(F.col("value").isNotNull())
        .orderBy("p_partkey", "metric")
    )


@register(
    "levenshtein_blocked_pairs",
    """
    WITH b AS (
      SELECT p_partkey, p_name, string_split(p_name, ' ')[2] AS blk
      FROM part
    )
    SELECT a.blk, CAST(count(*) AS BIGINT) AS n_near_pairs
    FROM b a JOIN b c ON a.blk = c.blk AND a.p_partkey < c.p_partkey
    WHERE levenshtein(a.p_name, c.p_name) <= 2
    GROUP BY a.blk ORDER BY a.blk
    """,
    doc="blocked string near-dup join: edit-distance pairs computed only "
        "within blocking-key groups (the noun token), never all-pairs — "
        "the classic entity-resolution shape. The self-join shuffles on "
        "the block key; per-block fan-out is bounded by block size, and "
        "skewed blocks would split under AQE skew-join handling",
)
def levenshtein_blocked_pairs(spark, sf_dir):
    p = load(spark, sf_dir, "part").select(
        "p_partkey", "p_name",
        F.split("p_name", " ").getItem(1).alias("blk"),
    )
    a, c = p.alias("a"), p.alias("c")
    return (
        a.join(
            c,
            (F.col("a.blk") == F.col("c.blk"))
            & (F.col("a.p_partkey") < F.col("c.p_partkey")),
        )
        .filter(F.levenshtein("a.p_name", "c.p_name") <= 2)
        .groupBy(F.col("a.blk").alias("blk"))
        .agg(F.count("*").alias("n_near_pairs"))
        .orderBy("blk")
    )


