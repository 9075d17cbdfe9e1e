"""Statistical tests and late-round entries: rank statistics,
ANOVA-family tests, drift metrics, SQL-surface showcases (UDF/lateral/pipe).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401
from pyspark.sql import types as T  # noqa: F401

from ..fixtures import fixture_df

from .base import load, normalize_event_ts, register  # noqa: F401


@register(
    "mann_whitney_u",
    """
    WITH s AS (
      SELECT value,
             CASE WHEN event_type = 'click' THEN 1 ELSE 2 END AS grp
      FROM events
      WHERE event_type IN ('click', 'error') AND value IS NOT NULL),
    r AS (
      SELECT grp,
             2 * rank() OVER (ORDER BY value)
               + count(*) OVER (PARTITION BY value) - 1 AS mr2
      FROM s),
    agg AS (
      SELECT CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(sum(CASE WHEN grp = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
             CAST(sum(CASE WHEN grp = 1 THEN mr2 ELSE 0 END) AS BIGINT)
               AS r1x2
      FROM r),
    ties AS (
      SELECT CAST(sum(t * t * t - t) AS BIGINT) AS tsum
      FROM (SELECT CAST(count(*) AS BIGINT) AS t FROM s GROUP BY value)),
    u AS (
      SELECT n1, n2,
             (2 * n1 * n2 + n1 * (n1 + 1) - r1x2) / 2.0 AS u1,
             n1 + n2 AS nn, tsum
      FROM agg, ties)
    SELECT n1, n2, round(u1, 1) AS u1,
           round((u1 - n1 * n2 / 2.0)
                 / sqrt(n1 * 1.0 * n2 / 12.0
                        * ((nn + 1) - tsum * 1.0 / (nn * (nn - 1.0)))),
                 6) AS z,
           round(1 - 2.0 * u1 / (n1 * n2), 6) AS rank_biserial
    FROM u
    """,
    doc="Mann-Whitney U rank-sum test (click vs error event values) with "
        "midrank tie handling and the tie-corrected normal approximation. "
        "All rank arithmetic is INTEGER-exact: doubled midranks "
        "2*rank + tiecount - 1 are BIGINTs, so the rank sum is "
        "order-independent at any parallelism and both engines derive "
        "identical doubles for U, z and the rank-biserial effect size "
        "(round-6 guard on top). Fully distributed: the fact table "
        "collapses to a per-value count table (one map-side-combinable "
        "shuffle) carrying the group-1 count per value; doubled midranks "
        "come from operators/ranks.py's bucketed prefix sum (no "
        "single-task window), and U = f(sum(n1v * mr2)) reduces on the "
        "domain table — ranks are never joined back to fact rows",
    tags=("statistics",),
)
def mann_whitney_u(spark, sf_dir):
    from ..operators.ranks import doubled_midranks

    ev = load(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type").isin("click", "error")
                  & F.col("value").isNotNull())
        .select("value",
                F.when(F.col("event_type") == "click", 1).otherwise(2)
                .alias("grp"))
    )
    pv = s.groupBy("value").agg(
        F.count("*").cast("bigint").alias("t"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).cast("bigint")
        .alias("n1v"),
    )
    mr = doubled_midranks(pv, "value", "t")
    agg = mr.agg(
        F.sum("n1v").cast("bigint").alias("n1"),
        F.sum(F.col("t") - F.col("n1v")).cast("bigint").alias("n2"),
        # rank sum over group-1 rows = sum over values of n1v * mr2
        F.sum(F.col("n1v") * F.col("mr2")).cast("bigint").alias("r1x2"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("bigint").alias("tsum"),
    )
    u = agg.select(
        "n1", "n2",
        ((2 * F.col("n1") * F.col("n2")
          + F.col("n1") * (F.col("n1") + 1) - F.col("r1x2")) / 2.0)
        .alias("u1"),
        (F.col("n1") + F.col("n2")).alias("nn"), "tsum",
    )
    return u.select(
        "n1", "n2", F.round("u1", 1).alias("u1"),
        F.round(
            (F.col("u1") - F.col("n1") * F.col("n2") / 2.0)
            / F.sqrt(F.col("n1") * 1.0 * F.col("n2") / 12.0
                     * ((F.col("nn") + 1)
                        - F.col("tsum") * 1.0
                        / (F.col("nn") * (F.col("nn") - 1.0)))),
            6).alias("z"),
        F.round(1 - 2.0 * F.col("u1") / (F.col("n1") * F.col("n2")), 6)
        .alias("rank_biserial"),
    )


@register(
    "sliding_window_counts",
    """
    WITH ks(k) AS (VALUES (0), (1), (2), (3)),
    w AS (
      SELECT make_timestamp(((epoch_us(ts) // 1800000000) - k)
                            * 1800000000) AS window_start,
             user_id
      FROM events CROSS JOIN ks)
    SELECT CAST(window_start AS TIMESTAMP) AS window_start,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT user_id) AS BIGINT) AS users
    FROM w GROUP BY 1 ORDER BY 1
    """,
    doc="sliding (hopping) event-time windows, 2h length / 30min slide: "
        "each event lands in exactly 4 overlapping windows. Validates the "
        "streaming sliding() helper's window() expression in batch (same "
        "Catalyst expression either way; the streaming variant adds a "
        "watermark). The oracle reconstructs Spark's epoch-aligned window "
        "assignment arithmetically (bucket - k*slide in integer "
        "microseconds), so boundaries match bit-for-bit. Explosion factor "
        "is duration/slide = 4 — bounded by the window spec, never by "
        "data volume — and the aggregate shuffles on (window, nothing "
        "else) with exact integer outputs",
    tags=("streaming", "capability"),
)
def sliding_window_counts(spark, sf_dir):
    from ..streaming.windows import sliding

    ev = load(spark, sf_dir, "events")
    win = sliding(
        ev, "ts", "2 hours", "30 minutes",
        aggs=[F.count("*").alias("n"),
              F.countDistinct("user_id").alias("users")],
    )
    return (
        win.select(F.col("window.start").alias("window_start"),
                   F.col("n").cast("bigint").alias("n"),
                   F.col("users").cast("bigint").alias("users"))
        .orderBy("window_start")
    )


@register(
    "brand_itemset3_support",
    """
    WITH ob AS MATERIALIZED (
      SELECT DISTINCT l_orderkey, p_brand
      FROM lineitem JOIN part ON l_partkey = p_partkey),
    pairs AS MATERIALIZED (
      SELECT a.l_orderkey, a.p_brand AS b1, b.p_brand AS b2
      FROM ob a JOIN ob b
        ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand),
    t AS (
      SELECT p.b1, p.b2, c.p_brand AS b3,
             CAST(count(*) AS BIGINT) AS support
      FROM pairs p JOIN ob c
        ON p.l_orderkey = c.l_orderkey AND p.b2 < c.p_brand
      GROUP BY 1, 2, 3)
    SELECT b1, b2, b3, support
    FROM t ORDER BY support DESC, b1, b2, b3 LIMIT 10
    """,
    doc="frequent 3-itemset mining over per-order brand sets (the 3-way "
        "extension of market_basket_lift's pair analysis). The Spark "
        "plan is ONE orderkey shuffle: baskets collapse to sorted brand "
        "arrays and the i<j<k triples are generated JVM-side with nested "
        "array transform()s — C(basket,3) per order, bounded by order "
        "width, with no self-join and no cross-order blow-up — then "
        "grouped on the C(|brands|,3) ~ 2.3k key domain. Ties broken "
        "lexicographically for a deterministic top-10 "
        "(TakeOrderedAndProject, no global sort). The oracle CTEs are "
        "MATERIALIZED pairwise joins: without the hint DuckDB reorders "
        "the 3-way self-join into an inequality-only merge join "
        "(a 550k x 550k quasi-cross at sf0.1)",
    tags=("itemset",),
)
def brand_itemset3_support(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    baskets = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("p_brand")).alias("bs"))
    )
    # i<j<k combinations via nested transform — per-row work is
    # C(|bs|,3), |bs| <= order width (~7), so this is flat-map cheap
    triples = baskets.select(
        F.explode(F.expr("""
          flatten(flatten(transform(bs, (x1, i) ->
            transform(slice(bs, i + 2, size(bs)), (x2, j) ->
              transform(slice(bs, i + j + 3, size(bs)), x3 ->
                struct(x1 AS b1, x2 AS b2, x3 AS b3))))))
        """)).alias("c")
    ).select("c.b1", "c.b2", "c.b3")
    t = (
        triples.groupBy("b1", "b2", "b3")
        .agg(F.count("*").cast("bigint").alias("support"))
    )
    return t.orderBy(F.desc("support"), "b1", "b2", "b3").limit(10)


@register(
    "ntile_decile_stats",
    """
    WITH r AS (
      SELECT o_totalprice,
             ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
      FROM orders)
    SELECT decile, CAST(count(*) AS BIGINT) AS n,
           min(o_totalprice) AS lo, max(o_totalprice) AS hi,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total
    FROM r GROUP BY decile ORDER BY decile
    """,
    doc="ntile(10) decile assignment with per-decile count/min/max and "
        "exact-decimal totals. The tiebreak (o_totalprice, o_orderkey) "
        "makes the row order TOTAL, so both engines assign identical "
        "deciles (ntile over a partial order is engine-dependent — the "
        "classic porting trap this entry pins down). ntile is a global "
        "sort by construction; this is the SQL-surface semantics entry — "
        "the scale path for equal-mass bucketing is "
        "histogram_equi_depth's approx-quantile width_bucket",
    tags=("sql-surface",),
)
def ntile_decile_stats(spark, sf_dir):
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders")
    r = o.select(
        "o_totalprice",
        F.ntile(10).over(Window.orderBy("o_totalprice", "o_orderkey"))
        .alias("decile"),
    )
    return (
        r.groupBy("decile")
        .agg(F.count("*").cast("bigint").alias("n"),
             F.min("o_totalprice").alias("lo"),
             F.max("o_totalprice").alias("hi"),
             F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
             .cast("double").alias("total"))
        .orderBy("decile")
    )


@register(
    "neyman_allocation_quotas",
    """
    WITH s AS (
      SELECT o_orderpriority AS stratum,
             CAST(count(*) AS BIGINT) AS n_h,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS sx,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))
                      * CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS sxx
      FROM orders GROUP BY 1),
    d AS (
      SELECT stratum, n_h,
             n_h * sqrt((sxx - sx * sx / n_h) / (n_h - 1)) AS w
      FROM s),
    tot AS (SELECT sum(w) AS wsum FROM d)
    SELECT stratum, n_h,
           round(w / n_h, 6) AS sd,
           round(w / wsum, 6) AS share,
           CAST(round(1000 * w / wsum, 0) AS BIGINT) AS quota
    FROM d, tot ORDER BY stratum
    """,
    doc="Neyman optimal allocation for a 1000-row stratified sample: "
        "per-stratum quota proportional to N_h * sigma_h (minimizes the "
        "variance of the stratified mean at fixed budget — the sampling-"
        "design step before stratified_split's hash selection). Stddevs "
        "come from EXACT decimal first/second moments per stratum "
        "(order-independent at any parallelism), so both engines derive "
        "identical doubles; shares/quotas are round-6/round-0 guarded. "
        "One stratum-keyed aggregate + a 1-row total broadcast; output "
        "is enum-sized",
    tags=("sampling", "statistics"),
)
def neyman_allocation_quotas(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    s = o.groupBy(F.col("o_orderpriority").alias("stratum")).agg(
        F.count("*").cast("bigint").alias("n_h"),
        F.sum(dec).cast("double").alias("sx"),
        F.sum(dec * dec).cast("double").alias("sxx"),
    )
    d = s.select(
        "stratum", "n_h",
        (F.col("n_h")
         * F.sqrt((F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n_h"))
                  / (F.col("n_h") - 1))).alias("w"),
    )
    tot = d.agg(F.sum("w").alias("wsum"))
    return (
        d.crossJoin(F.broadcast(tot))  # 1-row scalar, not a data join
        .select(
            "stratum", "n_h",
            F.round(F.col("w") / F.col("n_h"), 6).alias("sd"),
            F.round(F.col("w") / F.col("wsum"), 6).alias("share"),
            F.round(1000 * F.col("w") / F.col("wsum"), 0).cast("bigint")
            .alias("quota"),
        )
        .orderBy("stratum")
    )


@register(
    "anova_oneway_priority",
    """
    WITH s AS (
      SELECT o_orderpriority AS g, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS sx,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))
                      * CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS sxx
      FROM orders GROUP BY 1),
    p AS (
      SELECT
        max(CASE WHEN g = '1-URGENT' THEN n END) AS n1,
        max(CASE WHEN g = '1-URGENT' THEN sx END) AS sx1,
        max(CASE WHEN g = '1-URGENT' THEN sxx END) AS sxx1,
        max(CASE WHEN g = '2-HIGH' THEN n END) AS n2,
        max(CASE WHEN g = '2-HIGH' THEN sx END) AS sx2,
        max(CASE WHEN g = '2-HIGH' THEN sxx END) AS sxx2,
        max(CASE WHEN g = '3-MEDIUM' THEN n END) AS n3,
        max(CASE WHEN g = '3-MEDIUM' THEN sx END) AS sx3,
        max(CASE WHEN g = '3-MEDIUM' THEN sxx END) AS sxx3,
        max(CASE WHEN g = '4-NOT SPECIFIED' THEN n END) AS n4,
        max(CASE WHEN g = '4-NOT SPECIFIED' THEN sx END) AS sx4,
        max(CASE WHEN g = '4-NOT SPECIFIED' THEN sxx END) AS sxx4,
        max(CASE WHEN g = '5-LOW' THEN n END) AS n5,
        max(CASE WHEN g = '5-LOW' THEN sx END) AS sx5,
        max(CASE WHEN g = '5-LOW' THEN sxx END) AS sxx5
      FROM s),
    m AS (
      SELECT n1 + n2 + n3 + n4 + n5 AS nn,
             (sx1 * sx1 / n1 + sx2 * sx2 / n2 + sx3 * sx3 / n3
              + sx4 * sx4 / n4 + sx5 * sx5 / n5)
             - (sx1 + sx2 + sx3 + sx4 + sx5)
               * (sx1 + sx2 + sx3 + sx4 + sx5)
               / (n1 + n2 + n3 + n4 + n5) AS ssb,
             (sxx1 + sxx2 + sxx3 + sxx4 + sxx5)
             - (sx1 * sx1 / n1 + sx2 * sx2 / n2 + sx3 * sx3 / n3
                + sx4 * sx4 / n4 + sx5 * sx5 / n5) AS ssw
      FROM p)
    SELECT CAST(nn AS BIGINT) AS n, CAST(5 AS BIGINT) AS k,
           round((ssb / 4) / (ssw / (nn - 5)), 6) AS f_stat,
           round(ssb / (ssb + ssw), 6) AS eta_sq
    FROM m
    """,
    doc="one-way ANOVA F-test of order value across the 5 priority "
        "classes (the k-group extension of welch_t_test). Per-group "
        "moments are EXACT decimal(18,2) sums; the cross-group reduction "
        "is pivoted into ONE row so SSB/SSW come from a fixed-order "
        "expression tree — no engine-dependent double summation order "
        "anywhere, so both engines derive bit-identical F and eta-squared "
        "(round-6 guard on top). One map-side-combinable aggregate over "
        "facts; everything after is scalar arithmetic",
    tags=("statistics",),
)
def anova_oneway_priority(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    s = o.groupBy(F.col("o_orderpriority").alias("g")).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(dec).cast("double").alias("sx"),
        F.sum(dec * dec).cast("double").alias("sxx"),
    )
    groups = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    p = s.agg(*[
        F.max(F.when(F.col("g") == g, F.col(c))).alias(f"{c}{i + 1}")
        for i, g in enumerate(groups) for c in ("n", "sx", "sxx")
    ])
    sxs = [F.col(f"sx{i}") for i in range(1, 6)]
    nns = [F.col(f"n{i}") for i in range(1, 6)]
    within = (sxs[0] * sxs[0] / nns[0] + sxs[1] * sxs[1] / nns[1]
              + sxs[2] * sxs[2] / nns[2] + sxs[3] * sxs[3] / nns[3]
              + sxs[4] * sxs[4] / nns[4])
    sx_tot = sxs[0] + sxs[1] + sxs[2] + sxs[3] + sxs[4]
    n_tot = nns[0] + nns[1] + nns[2] + nns[3] + nns[4]
    sxx_tot = (F.col("sxx1") + F.col("sxx2") + F.col("sxx3")
               + F.col("sxx4") + F.col("sxx5"))
    m = p.select(
        n_tot.alias("nn"),
        (within - sx_tot * sx_tot / n_tot).alias("ssb"),
        (sxx_tot - within).alias("ssw"),
    )
    return m.select(
        F.col("nn").cast("bigint").alias("n"),
        F.lit(5).cast("bigint").alias("k"),
        F.round((F.col("ssb") / 4) / (F.col("ssw") / (F.col("nn") - 5)), 6)
        .alias("f_stat"),
        F.round(F.col("ssb") / (F.col("ssb") + F.col("ssw")), 6)
        .alias("eta_sq"),
    )


@register(
    "spearman_rank_corr",
    """
    WITH s AS (
      SELECT l_quantity AS q, l_extendedprice AS p
      FROM lineitem WHERE l_quantity IS NOT NULL
        AND l_extendedprice IS NOT NULL),
    r AS (
      SELECT CAST(2 * rank() OVER (ORDER BY q)
                  + count(*) OVER (PARTITION BY q) - 1 AS BIGINT) AS x,
             CAST(2 * rank() OVER (ORDER BY p)
                  + count(*) OVER (PARTITION BY p) - 1 AS BIGINT) AS y
      FROM s),
    a AS (
      SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
             CAST(sum(x * x) AS HUGEINT) AS sxx,
             CAST(sum(y * y) AS HUGEINT) AS syy,
             CAST(sum(x * y) AS HUGEINT) AS sxy
      FROM r)
    SELECT CAST(n AS BIGINT) AS n,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                        * CAST(n * syy - sy * sy AS DOUBLE)), 6)
             AS spearman_rho
    FROM a
    """,
    doc="Spearman rank correlation between line quantity and extended "
        "price, tie-aware (Pearson over midranks). Doubled midranks are "
        "BIGINTs and every moment is summed in 128-bit/decimal integer "
        "arithmetic (HUGEINT / decimal(38,0)), so the correlation inputs "
        "are EXACT on both engines — no float accumulation anywhere "
        "before the final division. Fully distributed: facts collapse "
        "to the (q, p) pair-count table in one shuffle; each axis's "
        "midranks come from operators/ranks.py's bucketed prefix sum "
        "over its own marginal count table (no single-task window), "
        "and the moments reduce as count-weighted sums over the pair "
        "table — ranks are never joined back to fact rows",
    tags=("statistics",),
)
def spearman_rank_corr(spark, sf_dir):
    from ..operators.ranks import doubled_midranks

    li = load(spark, sf_dir, "lineitem")
    s = li.filter(
        F.col("l_quantity").isNotNull()
        & F.col("l_extendedprice").isNotNull()
    ).select(F.col("l_quantity").alias("q"),
             F.col("l_extendedprice").alias("p"))
    pairs = s.groupBy("q", "p").agg(
        F.count("*").cast("bigint").alias("c"))
    qv = pairs.groupBy("q").agg(F.sum("c").cast("bigint").alias("t"))
    pv = pairs.groupBy("p").agg(F.sum("c").cast("bigint").alias("t"))
    qm = doubled_midranks(qv, "q", "t").select(
        "q", F.col("mr2").alias("xm"))
    pm = doubled_midranks(pv, "p", "t").select(
        "p", F.col("mr2").alias("ym"))
    r = (
        pairs.join(qm, "q").join(pm, "p")
        .select(F.col("c").cast("decimal(20,0)").alias("c"),
                F.col("xm").cast("decimal(20,0)").alias("x"),
                F.col("ym").cast("decimal(20,0)").alias("y"))
    )
    a = r.agg(
        F.sum("c").cast("decimal(20,0)").alias("n"),
        F.sum(F.col("c") * F.col("x")).alias("sx"),
        F.sum(F.col("c") * F.col("y")).alias("sy"),
        F.sum(F.col("c") * F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("c") * F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("c") * F.col("x") * F.col("y")).alias("sxy"),
    )
    return a.select(
        F.col("n").cast("bigint").alias("n"),
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            .cast("double")
            / F.sqrt(
                (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
                .cast("double")
                * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
                .cast("double")),
            6).alias("spearman_rho"),
    )


@register(
    "cusum_changepoint",
    """
    WITH d AS (
      SELECT date_trunc('day', ts) AS day, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(n) AS BIGINT) AS total FROM d),
    c AS (
      SELECT day, n,
             CAST(sum(n) OVER (ORDER BY day) AS BIGINT) AS cum_n,
             CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t
      FROM d)
    SELECT CAST(c.day AS TIMESTAMP) AS day, c.t AS day_index,
           round(c.cum_n - c.t * (tot.total * 1.0 / tot.k), 6) AS cusum
    FROM c, tot
    ORDER BY abs(c.cum_n - c.t * (tot.total * 1.0 / tot.k)) DESC, c.day
    LIMIT 1
    """,
    doc="CUSUM changepoint detection over daily event volume: the day "
        "maximizing |cumulative deviation from the global mean rate| is "
        "the maximum-likelihood single changepoint for a mean shift "
        "(Page's statistic evaluated in closed form, no recursion). "
        "cum_n and t are exact BIGINTs from a window over the day spine "
        "(calendar-bounded, never fact-sized), the mean is one scalar "
        "broadcast, and S_t = cum_n - t*mu is a deterministic double on "
        "both engines, so the argmax and its round-6 value agree "
        "bit-for-bit. Facts are touched once by the day aggregate",
    tags=("statistics", "timeseries"),
)
def cusum_changepoint(spark, sf_dir):
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    d = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count("*").cast("bigint").alias("n"))
    tot = d.agg(F.count("*").cast("bigint").alias("k"),
                F.sum("n").cast("bigint").alias("total"))
    c = d.select(
        "day", "n",
        F.sum("n").over(Window.orderBy("day")).cast("bigint")
        .alias("cum_n"),
        F.row_number().over(Window.orderBy("day")).cast("bigint")
        .alias("t"),
    )
    s = (F.col("cum_n")
         - F.col("t") * (F.col("total") * 1.0 / F.col("k")))
    return (
        c.crossJoin(F.broadcast(tot))  # 1-row scalar, not a data join
        .orderBy(F.abs(s).desc(), "day")
        .limit(1)
        .select("day", F.col("t").alias("day_index"),
                F.round(s, 6).alias("cusum"))
    )


@register(
    "readability_by_source",
    """
    WITH d AS (
      SELECT source,
             CAST(len(regexp_extract_all(trim(text), '[^ ]+')) AS BIGINT)
               AS w,
             CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                  AS BIGINT) AS syl,
             CAST(greatest(1, len(regexp_extract_all(text, '[.!?]+')))
                  AS BIGINT) AS sents
      FROM documents WHERE text IS NOT NULL),
    a AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(w) AS BIGINT) AS words,
             CAST(sum(syl) AS BIGINT) AS syllables,
             CAST(sum(sents) AS BIGINT) AS sentences
      FROM d GROUP BY 1)
    SELECT source, n_docs, words, syllables,
           round(206.835 - 1.015 * (words * 1.0 / sentences)
                 - 84.6 * (syllables * 1.0 / words), 6)
             AS flesch_aggregate
    FROM a ORDER BY source
    """,
    doc="corpus readability per source: Flesch reading-ease computed "
        "from AGGREGATE word/sentence/syllable totals (syllables = vowel "
        "groups, the standard heuristic). Per-doc tallies are exact "
        "integers from regexp counts, so the per-source sums are "
        "order-independent and the aggregate score is a deterministic "
        "double on both engines — deliberately NOT a mean of per-doc "
        "doubles, which would depend on summation order. One "
        "codegen-friendly pass over documents + an enum-keyed aggregate",
    tags=("text",),
)
def readability_by_source(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    d = docs.filter(F.col("text").isNotNull()).select(
        "source",
        F.size(F.expr("regexp_extract_all(trim(text), '[^ ]+', 0)"))
        .cast("bigint").alias("w"),
        F.size(F.expr("regexp_extract_all(lower(text), '[aeiouy]+', 0)"))
        .cast("bigint").alias("syl"),
        F.greatest(
            F.lit(1),
            F.size(F.expr("regexp_extract_all(text, '[.!?]+', 0)")))
        .cast("bigint").alias("sents"),
    )
    a = d.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("w").cast("bigint").alias("words"),
        F.sum("syl").cast("bigint").alias("syllables"),
        F.sum("sents").cast("bigint").alias("sentences"),
    )
    return a.select(
        "source", "n_docs", "words", "syllables",
        F.round(206.835
                - 1.015 * (F.col("words") * 1.0 / F.col("sentences"))
                - 84.6 * (F.col("syllables") * 1.0 / F.col("words")), 6)
        .alias("flesch_aggregate"),
    ).orderBy("source")


@register(
    "brown_forsythe_test",
    """
    WITH med AS (
      SELECT o_orderpriority AS g, median(o_totalprice) AS med
      FROM orders GROUP BY 1),
    z AS (
      SELECT o.o_orderpriority AS g,
             CAST(abs(o.o_totalprice - m.med) AS DECIMAL(18,6)) AS z
      FROM orders o JOIN med m ON o.o_orderpriority = m.g),
    s AS (
      SELECT g, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(z) AS DOUBLE) AS sz,
             CAST(sum(CAST(z AS DECIMAL(28,6)) * z) AS DOUBLE) AS szz
      FROM z GROUP BY 1),
    p AS (
      SELECT
        max(CASE WHEN g = '1-URGENT' THEN n END) AS n1,
        max(CASE WHEN g = '1-URGENT' THEN sz END) AS sz1,
        max(CASE WHEN g = '1-URGENT' THEN szz END) AS szz1,
        max(CASE WHEN g = '2-HIGH' THEN n END) AS n2,
        max(CASE WHEN g = '2-HIGH' THEN sz END) AS sz2,
        max(CASE WHEN g = '2-HIGH' THEN szz END) AS szz2,
        max(CASE WHEN g = '3-MEDIUM' THEN n END) AS n3,
        max(CASE WHEN g = '3-MEDIUM' THEN sz END) AS sz3,
        max(CASE WHEN g = '3-MEDIUM' THEN szz END) AS szz3,
        max(CASE WHEN g = '4-NOT SPECIFIED' THEN n END) AS n4,
        max(CASE WHEN g = '4-NOT SPECIFIED' THEN sz END) AS sz4,
        max(CASE WHEN g = '4-NOT SPECIFIED' THEN szz END) AS szz4,
        max(CASE WHEN g = '5-LOW' THEN n END) AS n5,
        max(CASE WHEN g = '5-LOW' THEN sz END) AS sz5,
        max(CASE WHEN g = '5-LOW' THEN szz END) AS szz5
      FROM s),
    m AS (
      SELECT n1 + n2 + n3 + n4 + n5 AS nn,
             (sz1 * sz1 / n1 + sz2 * sz2 / n2 + sz3 * sz3 / n3
              + sz4 * sz4 / n4 + sz5 * sz5 / n5)
             - (sz1 + sz2 + sz3 + sz4 + sz5)
               * (sz1 + sz2 + sz3 + sz4 + sz5)
               / (n1 + n2 + n3 + n4 + n5) AS ssb,
             (szz1 + szz2 + szz3 + szz4 + szz5)
             - (sz1 * sz1 / n1 + sz2 * sz2 / n2 + sz3 * sz3 / n3
                + sz4 * sz4 / n4 + sz5 * sz5 / n5) AS ssw
      FROM p)
    SELECT CAST(nn AS BIGINT) AS n, CAST(5 AS BIGINT) AS k,
           round((ssb / 4) / (ssw / (nn - 5)), 6) AS w_stat
    FROM m
    """,
    doc="Brown-Forsythe robust variance-equality test across the 5 "
        "priority classes: one-way ANOVA on |x - group median| "
        "(median-centered Levene — robust to the heavy right tail where "
        "the classical F-test on raw variances is not). Group medians "
        "are exact interpolated percentiles (the median_by_type "
        "precedent); |x - med| is a deterministic double whose "
        "decimal(18,6) image is exact (inputs are 2-3 dp), so the "
        "moment sums are order-independent; the cross-group reduction "
        "reuses anova_oneway_priority's one-row pivot so W comes from a "
        "fixed-order expression tree. Two fact passes (median, then "
        "deviations) with the 5-row median table broadcast into the "
        "second",
    tags=("statistics",),
)
def brown_forsythe_test(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    med = o.groupBy(F.col("o_orderpriority").alias("g")).agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("med"))
    z = (
        o.join(F.broadcast(med), o.o_orderpriority == med.g)
        .select("g",
                F.abs(F.col("o_totalprice") - F.col("med"))
                .cast("decimal(18,6)").alias("z"))
    )
    s = z.groupBy("g").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("z").cast("double").alias("sz"),
        F.sum(F.col("z") * F.col("z")).cast("double").alias("szz"),
    )
    groups = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    p = s.agg(*[
        F.max(F.when(F.col("g") == g, F.col(c))).alias(f"{c}{i + 1}")
        for i, g in enumerate(groups) for c in ("n", "sz", "szz")
    ])
    szs = [F.col(f"sz{i}") for i in range(1, 6)]
    nns = [F.col(f"n{i}") for i in range(1, 6)]
    within = (szs[0] * szs[0] / nns[0] + szs[1] * szs[1] / nns[1]
              + szs[2] * szs[2] / nns[2] + szs[3] * szs[3] / nns[3]
              + szs[4] * szs[4] / nns[4])
    sz_tot = szs[0] + szs[1] + szs[2] + szs[3] + szs[4]
    n_tot = nns[0] + nns[1] + nns[2] + nns[3] + nns[4]
    szz_tot = (F.col("szz1") + F.col("szz2") + F.col("szz3")
               + F.col("szz4") + F.col("szz5"))
    m = p.select(
        n_tot.alias("nn"),
        (within - sz_tot * sz_tot / n_tot).alias("ssb"),
        (szz_tot - within).alias("ssw"),
    )
    return m.select(
        F.col("nn").cast("bigint").alias("n"),
        F.lit(5).cast("bigint").alias("k"),
        F.round((F.col("ssb") / 4) / (F.col("ssw") / (F.col("nn") - 5)), 6)
        .alias("w_stat"),
    )


@register(
    "rbo_top_tokens_drift",
    """
    WITH tok AS (
      SELECT source, unnest(string_split(lower(text), ' ')) AS w
      FROM documents WHERE source IN ('src0', 'src1')),
    cnt AS (
      SELECT source, w, count(*) AS c FROM tok
      WHERE w <> '' GROUP BY 1, 2),
    ranked AS (
      SELECT source, w,
             row_number() OVER (PARTITION BY source
                                ORDER BY c DESC, w) AS r
      FROM cnt),
    top AS (SELECT * FROM ranked WHERE r <= 50),
    md AS (
      SELECT CAST(greatest(a.r, b.r) AS BIGINT) AS d0
      FROM top a JOIN top b ON a.w = b.w
      WHERE a.source = 'src0' AND b.source = 'src1'),
    spine AS (
      SELECT CAST(unnest(generate_series(1, 50)) AS BIGINT) AS d),
    ad AS (
      SELECT s.d,
             CAST(count(m.d0) AS BIGINT) AS a_d
      FROM spine s LEFT JOIN md m ON m.d0 <= s.d
      GROUP BY 1),
    run AS (
      SELECT d, a_d,
             sum(power(0.9, d) * a_d / d)
               OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW) AS acc
      FROM ad)
    SELECT CAST((SELECT max(a_d) FROM ad) AS BIGINT) AS n_common_at_50,
           round((0.1 / 0.9) * acc, 6) AS rbo
    FROM run WHERE d = 50
    """,
    doc="rank-biased overlap (RBO, p=0.9, truncated at depth 50) between "
        "the top-token rankings of two sources — the IR-standard drift "
        "metric for 'did the head of the distribution change', "
        "complementing ks_drift (mass drift) and kl_divergence (full "
        "distribution). Rankings are row_number with (count DESC, token) "
        "tie-break so both engines rank identically; overlap@d comes "
        "from each common token's max(rank_a, rank_b) vs a 50-row depth "
        "spine, and the geometric accumulation runs as a SEQUENTIAL "
        "window cumsum over the spine (ORDER BY d), so the float "
        "addition order is pinned on both engines. Everything after the "
        "per-source token count is top-50-bounded",
    tags=("text", "llm"),
)
def rbo_top_tokens_drift(spark, sf_dir):
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    tok = (
        docs.filter(F.col("source").isin("src0", "src1"))
        .select("source",
                F.explode(F.split(F.lower("text"), " ")).alias("w"))
        .filter(F.col("w") != "")
    )
    cnt = tok.groupBy("source", "w").agg(F.count("*").alias("c"))
    ranked = cnt.select(
        "source", "w",
        F.row_number().over(
            Window.partitionBy("source")
            .orderBy(F.desc("c"), "w")).alias("r"),
    ).filter(F.col("r") <= 50)
    a = ranked.filter(F.col("source") == "src0").alias("a")
    b = ranked.filter(F.col("source") == "src1").alias("b")
    md = (
        a.join(b, F.col("a.w") == F.col("b.w"))
        .select(F.greatest(F.col("a.r"), F.col("b.r"))
                .cast("bigint").alias("d0"))
    )
    spine = spark.range(1, 51).select(F.col("id").cast("bigint").alias("d"))
    ad = (
        spine.join(F.broadcast(md), F.col("d0") <= F.col("d"), "left")
        .groupBy("d").agg(F.count("d0").cast("bigint").alias("a_d"))
    )
    run = ad.select(
        "d", "a_d",
        F.sum(F.pow(F.lit(0.9), F.col("d")) * F.col("a_d") / F.col("d"))
        .over(Window.orderBy("d")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("acc"),
    )
    ncommon = ad.agg(F.max("a_d").cast("bigint").alias("n_common_at_50"))
    return (
        run.filter(F.col("d") == 50)
        .crossJoin(F.broadcast(ncommon))  # 1-row scalar
        .select("n_common_at_50", F.round((0.1 / 0.9) * F.col("acc"), 6)
                .alias("rbo"))
    )


@register(
    "sql_udf_price_bands",
    """
    SELECT CASE WHEN l_extendedprice < 20000 THEN 'low'
                WHEN l_extendedprice < 40000 THEN 'mid'
                ELSE 'high' END AS band,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(18,4))) AS DOUBLE) AS disc_revenue
    FROM lineitem GROUP BY 1 ORDER BY band
    """,
    doc="Spark 4 SQL scalar UDFs (CREATE TEMPORARY FUNCTION ... RETURN "
        "expr): disc_price() and price_band() defined in SQL and used in "
        "a grouped aggregate. The point is the UDF surface done the "
        "scale-safe way — SQL UDFs INLINE into Catalyst (the plan is a "
        "plain codegen Project, no BatchEvalPython/Arrow boundary, "
        "verified by the plan gate), so unlike Python UDFs they cost "
        "nothing at 100 TB. The oracle inlines the same expressions; "
        "revenue sums are exact decimal(18,4)",
    tags=("sql-surface", "udf"),
)
def sql_udf_price_bands(spark, sf_dir):
    load(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "lineitem_sqludf_v")
    spark.sql("""
      CREATE OR REPLACE TEMPORARY FUNCTION disc_price(p DOUBLE, d DOUBLE)
      RETURNS DOUBLE RETURN p * (1 - d)
    """)
    spark.sql("""
      CREATE OR REPLACE TEMPORARY FUNCTION price_band(p DOUBLE)
      RETURNS STRING RETURN CASE WHEN p < 20000 THEN 'low'
                                 WHEN p < 40000 THEN 'mid'
                                 ELSE 'high' END
    """)
    return spark.sql("""
      SELECT price_band(l_extendedprice) AS band,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(disc_price(l_extendedprice, l_discount)
                           AS DECIMAL(18,4))) AS DOUBLE) AS disc_revenue
      FROM lineitem_sqludf_v GROUP BY 1 ORDER BY band
    """)


@register(
    "lateral_topn_per_nation",
    """
    SELECT n.n_name, t.c_name, t.c_acctbal
    FROM nation n,
    LATERAL (SELECT c_name, c_acctbal FROM customer c
             WHERE c.c_nationkey = n.n_nationkey
             ORDER BY c_acctbal DESC, c_name LIMIT 3) t
    ORDER BY n.n_name, t.c_acctbal DESC, t.c_name
    """,
    doc="correlated LATERAL subquery with per-group ORDER BY/LIMIT: "
        "top-3 customers by balance per nation, written the way an "
        "analyst ports it from Postgres/DuckDB. Spark 4 decorrelates "
        "the lateral into a join + per-key ordered limit (same physical "
        "shape as the window_row_number_topn formulation — one "
        "nationkey-partitioned ranking, no per-nation re-scan of "
        "customer), so the 25x fan-out never replays the fact side. "
        "Tie-break (balance DESC, name) makes the top-3 total-ordered "
        "on both engines",
    tags=("sql-surface",),
)
def lateral_topn_per_nation(spark, sf_dir):
    load(spark, sf_dir, "nation").createOrReplaceTempView(
        "nation_lat_v")
    load(spark, sf_dir, "customer").createOrReplaceTempView(
        "customer_lat_v")
    return spark.sql("""
      SELECT n.n_name, t.c_name, t.c_acctbal
      FROM nation_lat_v n,
      LATERAL (SELECT c_name, c_acctbal FROM customer_lat_v c
               WHERE c.c_nationkey = n.n_nationkey
               ORDER BY c_acctbal DESC, c_name LIMIT 3) t
      ORDER BY n.n_name, t.c_acctbal DESC, t.c_name
    """)


@register(
    "pipe_syntax_pricing",
    """
    SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
           sum(l_quantity) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_base_price
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="Spark 4 SQL pipe syntax (|> WHERE / |> AGGREGATE / |> ORDER "
        "BY): the q1-shaped pricing summary written as a linear pipeline "
        "— same Catalyst plan as the standard form (filter pushdown, "
        "partial+final agg), purely a parser-level surface, which is "
        "exactly what the oracle (standard ANSI form) certifies. "
        "Quantity sums are integer-valued doubles (exact); price sums "
        "are exact decimal(18,2)",
    tags=("sql-surface",),
)
def pipe_syntax_pricing(spark, sf_dir):
    load(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "lineitem_pipe_v")
    return spark.sql("""
      FROM lineitem_pipe_v
      |> WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |> AGGREGATE CAST(count(*) AS BIGINT) AS n,
                   sum(l_quantity) AS sum_qty,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                        AS DOUBLE) AS sum_base_price
         GROUP BY l_returnflag
      |> ORDER BY l_returnflag
    """)


@register(
    "token_budget_mix",
    """
    WITH d AS (
      SELECT doc_id, source,
             CAST(len(regexp_extract_all(trim(text), '[^ ]+')) AS BIGINT)
               AS toks,
             md5(CAST(doc_id AS VARCHAR)) AS h
      FROM documents WHERE text IS NOT NULL),
    s AS (
      SELECT source, CAST(sum(toks) AS BIGINT) AS src_toks,
             CAST(floor(sqrt(sum(toks))) AS BIGINT) AS w
      FROM d GROUP BY 1),
    tot AS (SELECT CAST(sum(w) AS BIGINT) AS wsum FROM s),
    q AS (
      SELECT source, src_toks, w,
             CAST((50000 * w) // wsum AS BIGINT) AS quota
      FROM s, tot),
    r AS (
      SELECT d.source, d.toks, q.quota,
             sum(d.toks) OVER (PARTITION BY d.source
                               ORDER BY d.h, d.doc_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS run
      FROM d JOIN q ON d.source = q.source)
    SELECT source, CAST(max(quota) AS BIGINT) AS quota_tokens,
           CAST(count(*) FILTER (WHERE run <= quota) AS BIGINT)
             AS kept_docs,
           CAST(coalesce(sum(toks) FILTER (WHERE run <= quota), 0)
                AS BIGINT) AS kept_tokens
    FROM r GROUP BY source ORDER BY source
    """,
    doc="token-budget source mixing: a 50k-token training budget split "
        "across sources proportional to sqrt(source_tokens) (multinomial "
        "temperature sampling at T=2 — up-weights small sources), then "
        "filled per source by deterministic md5-ordered greedy selection "
        "until the quota. EVERY quantity is integer: weights are "
        "floor(sqrt(n)) of exact token sums, quotas are integer "
        "division, and the greedy fill is a per-source window cumsum "
        "over the hash order — no float ever enters a comparison, so "
        "both engines keep the identical doc set. Scale: one doc-level "
        "pass, a source-keyed aggregate, and a source-partitioned "
        "window (each partition = one source's docs; a skewed source "
        "shards by hash range in production — same note as "
        "epoch_shuffle_shards)",
    tags=("llm", "sampling"),
)
def token_budget_mix(spark, sf_dir):
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    d = docs.filter(F.col("text").isNotNull()).select(
        "doc_id", "source",
        F.size(F.expr("regexp_extract_all(trim(text), '[^ ]+', 0)"))
        .cast("bigint").alias("toks"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    s = d.groupBy("source").agg(
        F.sum("toks").cast("bigint").alias("src_toks"),
        F.floor(F.sqrt(F.sum("toks"))).cast("bigint").alias("w"),
    )
    tot = s.agg(F.sum("w").cast("bigint").alias("wsum"))
    q = (
        s.crossJoin(F.broadcast(tot))  # 1-row scalar, not a data join
        .select("source", "src_toks", "w",
                F.expr("(50000 * w) div wsum")
                .cast("bigint").alias("quota"))
    )
    r = d.join(F.broadcast(q), "source").select(
        "source", "toks", "quota",
        F.sum("toks").over(
            Window.partitionBy("source").orderBy("h", "doc_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("run"),
    )
    kept = F.col("run") <= F.col("quota")
    return (
        r.groupBy("source")
        .agg(F.max("quota").cast("bigint").alias("quota_tokens"),
             F.sum(F.when(kept, 1).otherwise(0)).cast("bigint")
             .alias("kept_docs"),
             F.coalesce(F.sum(F.when(kept, F.col("toks"))), F.lit(0))
             .cast("bigint").alias("kept_tokens"))
        .orderBy("source")
    )


@register(
    "kruskal_wallis_test",
    """
    WITH s AS (
      SELECT event_type AS g, value FROM events WHERE value IS NOT NULL),
    r AS (
      SELECT g,
             CAST(2 * rank() OVER (ORDER BY value)
                  + count(*) OVER (PARTITION BY value) - 1 AS BIGINT)
               AS mr2
      FROM s),
    agg AS (
      SELECT g, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(mr2) AS BIGINT) AS r2
      FROM r GROUP BY 1),
    ties AS (
      SELECT CAST(sum(t * t * t - t) AS BIGINT) AS tsum
      FROM (SELECT CAST(count(*) AS BIGINT) AS t FROM s GROUP BY value)),
    p AS (
      SELECT
        max(CASE WHEN g = 'click' THEN n END) AS n1,
        max(CASE WHEN g = 'click' THEN r2 END) AS r21,
        max(CASE WHEN g = 'error' THEN n END) AS n2,
        max(CASE WHEN g = 'error' THEN r2 END) AS r22,
        max(CASE WHEN g = 'purchase' THEN n END) AS n3,
        max(CASE WHEN g = 'purchase' THEN r2 END) AS r23,
        max(CASE WHEN g = 'signup' THEN n END) AS n4,
        max(CASE WHEN g = 'signup' THEN r2 END) AS r24,
        max(CASE WHEN g = 'view' THEN n END) AS n5,
        max(CASE WHEN g = 'view' THEN r2 END) AS r25
      FROM agg),
    m AS (
      SELECT n1 + n2 + n3 + n4 + n5 AS nn,
             (r21 * 1.0 * r21 / (4.0 * n1)
              + r22 * 1.0 * r22 / (4.0 * n2)
              + r23 * 1.0 * r23 / (4.0 * n3)
              + r24 * 1.0 * r24 / (4.0 * n4)
              + r25 * 1.0 * r25 / (4.0 * n5)) AS sq,
             tsum
      FROM p, ties)
    SELECT CAST(nn AS BIGINT) AS n, CAST(5 AS BIGINT) AS k,
           round((12.0 / (nn * (nn + 1.0)) * sq - 3.0 * (nn + 1))
                 / (1.0 - tsum * 1.0 / (nn * 1.0 * nn * nn - nn)), 6)
             AS h_stat
    FROM m
    """,
    doc="Kruskal-Wallis H test of event value across the 5 event types "
        "(the k-sample extension of mann_whitney_u; rank-based, so it "
        "needs no normality assumption). Doubled midranks and tie "
        "corrections are exact BIGINTs; the cross-group reduction reuses "
        "the anova pivot so H comes from a fixed-order expression tree "
        "over exact integers — identical doubles on both engines, "
        "round-6 guarded. Fully distributed: facts collapse to a "
        "per-value count table carrying all 5 per-group counts; "
        "doubled midranks come from operators/ranks.py's bucketed "
        "prefix sum (no single-task window), and each group's rank sum "
        "is sum(n_gv * mr2) over the domain table — ranks are never "
        "joined back to fact rows, and the tie correction rides the "
        "same aggregate",
    tags=("statistics",),
)
def kruskal_wallis_test(spark, sf_dir):
    from ..operators.ranks import doubled_midranks

    ev = load(spark, sf_dir, "events")
    s = ev.filter(F.col("value").isNotNull()).select(
        F.col("event_type").alias("g"), "value")
    groups = ["click", "error", "purchase", "signup", "view"]
    pv = s.groupBy("value").agg(
        F.count("*").cast("bigint").alias("t"),
        *[F.sum(F.when(F.col("g") == g, 1).otherwise(0)).cast("bigint")
          .alias(f"c{i + 1}") for i, g in enumerate(groups)],
    )
    mr = doubled_midranks(pv, "value", "t")
    cols = []
    for i in range(1, 6):
        cols.append(F.sum(F.col(f"c{i}")).cast("bigint").alias(f"n{i}"))
        # group rank sum = sum over values of (group count at v) * mr2
        cols.append(F.sum(F.col(f"c{i}") * F.col("mr2")).cast("bigint")
                    .alias(f"r2{i}"))
    cols.append(
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("bigint").alias("tsum"))
    p = mr.agg(*cols)
    sq = (F.col("r21") * 1.0 * F.col("r21") / (4.0 * F.col("n1"))
          + F.col("r22") * 1.0 * F.col("r22") / (4.0 * F.col("n2"))
          + F.col("r23") * 1.0 * F.col("r23") / (4.0 * F.col("n3"))
          + F.col("r24") * 1.0 * F.col("r24") / (4.0 * F.col("n4"))
          + F.col("r25") * 1.0 * F.col("r25") / (4.0 * F.col("n5")))
    nn = (F.col("n1") + F.col("n2") + F.col("n3")
          + F.col("n4") + F.col("n5"))
    m = p.select(nn.alias("nn"), sq.alias("sq"), "tsum")
    return m.select(
        F.col("nn").cast("bigint").alias("n"),
        F.lit(5).cast("bigint").alias("k"),
        F.round(
            (12.0 / (F.col("nn") * (F.col("nn") + 1.0)) * F.col("sq")
             - 3.0 * (F.col("nn") + 1))
            / (1.0 - F.col("tsum") * 1.0
               / (F.col("nn") * 1.0 * F.col("nn") * F.col("nn")
                  - F.col("nn"))), 6).alias("h_stat"),
    )


@register(
    "pk_uniqueness_audit",
    """
    WITH u AS (
      SELECT 'orders' AS table_name, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_keys
      FROM orders
      UNION ALL
      SELECT 'customer', count(*), count(DISTINCT c_custkey) FROM customer
      UNION ALL
      SELECT 'part', count(*), count(DISTINCT p_partkey) FROM part
      UNION ALL
      SELECT 'supplier', count(*), count(DISTINCT s_suppkey) FROM supplier
      UNION ALL
      SELECT 'events', count(*), count(DISTINCT event_id) FROM events
      UNION ALL
      SELECT 'documents', count(*), count(DISTINCT doc_id) FROM documents
      UNION ALL
      SELECT 'lineitem', count(*),
             count(DISTINCT l_orderkey * 100 + l_linenumber) FROM lineitem)
    SELECT table_name, n_rows, n_keys,
           CAST(n_rows - n_keys AS BIGINT) AS dup_rows
    FROM u ORDER BY table_name
    """,
    doc="primary-key uniqueness audit across every keyed table "
        "(lineitem's composite key is folded to orderkey*100+linenumber "
        "— linenumber < 100 by TPC-H construction). The data-quality "
        "gate that runs before any merge/upsert trusts its keys. Each "
        "branch is one exact distinct-count aggregate; the union is "
        "7 single-row results, and nothing floats",
    tags=("data-quality",),
)
def pk_uniqueness_audit(spark, sf_dir):
    specs = [
        ("orders", "o_orderkey", None),
        ("customer", "c_custkey", None),
        ("part", "p_partkey", None),
        ("supplier", "s_suppkey", None),
        ("events", "event_id", None),
        ("documents", "doc_id", None),
        ("lineitem", None,
         F.col("l_orderkey") * 100 + F.col("l_linenumber")),
    ]
    parts = []
    for table, key, expr in specs:
        t = load(spark, sf_dir, table)
        k = expr if expr is not None else F.col(key)
        parts.append(
            t.agg(
                F.count("*").cast("bigint").alias("n_rows"),
                F.countDistinct(k).cast("bigint").alias("n_keys"),
            ).select(F.lit(table).alias("table_name"), "n_rows", "n_keys")
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u.select(
        "table_name", "n_rows", "n_keys",
        (F.col("n_rows") - F.col("n_keys")).cast("bigint")
        .alias("dup_rows"),
    ).orderBy("table_name")


@register(
    "linear_attribution_by_type",
    """
    WITH p AS (
      SELECT event_id, user_id, ts, value FROM events
      WHERE event_type = 'purchase' AND value IS NOT NULL),
    t AS (
      SELECT user_id, ts, event_type FROM events
      WHERE event_type IN ('click', 'view')),
    j AS (
      SELECT p.event_id, p.value, t.event_type AS touch_type
      FROM p LEFT JOIN t
        ON p.user_id = t.user_id
       AND t.ts < p.ts AND t.ts >= p.ts - INTERVAL 7 DAY),
    w AS (
      SELECT event_id, value,
             coalesce(touch_type, 'unattributed') AS touch_type,
             count(touch_type) OVER (PARTITION BY event_id) AS n
      FROM j)
    SELECT touch_type, CAST(count(*) AS BIGINT) AS credited_touches,
           CAST(sum(CAST(value / greatest(n, 1) AS DECIMAL(18,6)))
                AS DOUBLE) AS total_credit
    FROM w GROUP BY touch_type ORDER BY touch_type
    """,
    doc="linear multi-touch attribution: each purchase's value is split "
        "equally over the user's click/view touches in the 7 days "
        "before it (purchases with no touches credit a synthetic "
        "'unattributed' row, so total credit is conserved). The "
        "event-time range join is the interval_join/asof shape — user "
        "equi-key plus a watermark-boundable time window, so streaming "
        "state stays rate x 7d. Per-touch credits are identical doubles "
        "on both engines and are summed as exact decimal(18,6), so the "
        "per-type totals can't drift with partial-sum order",
    tags=("timeseries", "analytics"),
)
def linear_attribution_by_type(spark, sf_dir):
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    p = (
        ev.filter((F.col("event_type") == "purchase")
                  & F.col("value").isNotNull())
        .select("event_id", "user_id", "ts", "value")
    )
    t = (
        ev.filter(F.col("event_type").isin("click", "view"))
        .select(F.col("user_id").alias("t_user"),
                F.col("ts").alias("t_ts"),
                F.col("event_type").alias("touch_type"))
    )
    j = p.join(
        t,
        (F.col("user_id") == F.col("t_user"))
        & (F.col("t_ts") < F.col("ts"))
        & (F.col("t_ts") >= F.col("ts") - F.expr("INTERVAL 7 DAY")),
        "left",
    ).select("event_id", "value",
             F.coalesce("touch_type", F.lit("unattributed"))
             .alias("touch_type"),
             F.col("touch_type").alias("raw_touch"))
    w = j.select(
        "event_id", "value", "touch_type",
        F.count("raw_touch").over(Window.partitionBy("event_id"))
        .alias("n"),
    )
    credit = (F.col("value") / F.greatest(F.col("n"), F.lit(1))) \
        .cast("decimal(18,6)")
    return (
        w.groupBy("touch_type")
        .agg(F.count("*").cast("bigint").alias("credited_touches"),
             F.sum(credit).cast("double").alias("total_credit"))
        .orderBy("touch_type")
    )



@register(
    "kendall_tau_monthly",
    """
    WITH m AS (
      SELECT date_trunc('month', o_orderdate) AS mon,
             CAST(count(*) AS BIGINT) AS n,
             sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY 1),
    p AS (
      SELECT CAST(sign(b.n - a.n) AS BIGINT)
               * CAST(sign(b.rev - a.rev) AS BIGINT) AS s,
             CAST(CASE WHEN a.n = b.n THEN 1 ELSE 0 END AS BIGINT) AS tx,
             CAST(CASE WHEN a.rev = b.rev THEN 1 ELSE 0 END AS BIGINT) AS ty
      FROM m a JOIN m b ON a.mon < b.mon),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS concordant,
             CAST(sum(CASE WHEN s = -1 THEN 1 ELSE 0 END) AS BIGINT)
               AS discordant,
             CAST(sum(tx) AS BIGINT) AS tie_x,
             CAST(sum(ty) AS BIGINT) AS tie_y
      FROM p)
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM m) AS n_months,
           n_pairs, concordant, discordant,
           round((concordant - discordant)
                 / sqrt((n_pairs - tie_x) * 1.0 * (n_pairs - tie_y)),
                 6) AS tau_b
    FROM agg
    """,
    doc="Kendall tau-b rank correlation between monthly order count and "
        "monthly revenue, with tie corrections. Pair enumeration is "
        "O(months^2) — quadratic in the MONTH SPINE (80 rows -> 3,160 "
        "pairs), never the facts: one grouped aggregate collapses "
        "orders to the spine, the pair join is a broadcast over that "
        "bounded table (the theil_sen shape), and concordance counts "
        "are exact integers (revenue compared as DECIMAL) so tau_b is "
        "identical across engines before the round-6 guard",
    tags=("statistics",),
)
def kendall_tau_monthly(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    m = (
        o.groupBy(F.date_trunc("month", "o_orderdate").alias("mon"))
        .agg(F.count("*").cast("bigint").alias("n"),
             F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
    )
    a = m.alias("a")
    b = m.alias("b")
    p = (
        a.join(F.broadcast(b), F.col("a.mon") < F.col("b.mon"))
        .select(
            (F.signum(F.col("b.n") - F.col("a.n")).cast("bigint")
             * F.signum(F.col("b.rev") - F.col("a.rev")).cast("bigint"))
            .alias("s"),
            F.when(F.col("a.n") == F.col("b.n"), 1).otherwise(0)
            .cast("bigint").alias("tx"),
            F.when(F.col("a.rev") == F.col("b.rev"), 1).otherwise(0)
            .cast("bigint").alias("ty"),
        )
    )
    agg = p.agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        F.sum(F.when(F.col("s") == 1, 1).otherwise(0)).cast("bigint")
        .alias("concordant"),
        F.sum(F.when(F.col("s") == -1, 1).otherwise(0)).cast("bigint")
        .alias("discordant"),
        F.sum("tx").cast("bigint").alias("tie_x"),
        F.sum("ty").cast("bigint").alias("tie_y"),
    )
    n_months = m.agg(F.count("*").cast("bigint").alias("n_months"))
    return (
        agg.crossJoin(F.broadcast(n_months))
        .select(
            "n_months", "n_pairs", "concordant", "discordant",
            F.round(
                (F.col("concordant") - F.col("discordant"))
                / F.sqrt((F.col("n_pairs") - F.col("tie_x"))
                         * F.lit(1.0)
                         * (F.col("n_pairs") - F.col("tie_y"))),
                6,
            ).alias("tau_b"),
        )
    )


@register(
    "psi_value_drift",
    """
    WITH c AS (
      SELECT event_type,
             CAST(least(floor(value / 50), 9) AS BIGINT) AS bucket,
             CAST(count_if(ts <  TIMESTAMP '2024-01-16') AS BIGINT) AS na,
             CAST(count_if(ts >= TIMESTAMP '2024-01-16') AS BIGINT) AS nb
      FROM events
      WHERE value IS NOT NULL
      GROUP BY 1, 2),
    t AS (
      SELECT event_type, bucket, na, nb,
             sum(na) OVER (PARTITION BY event_type) AS ta,
             sum(nb) OVER (PARTITION BY event_type) AS tb
      FROM c)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_buckets,
           CAST(sum(na) AS BIGINT) AS n_before,
           CAST(sum(nb) AS BIGINT) AS n_after,
           round(sum((na * 1.0 / ta - nb * 1.0 / tb)
                     * ln((na * 1.0 / ta + 1e-6)
                          / (nb * 1.0 / tb + 1e-6))), 6) AS psi
    FROM t
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="Population Stability Index per event type between the first "
        "and second half of the month (fixed 2024-01-16 boundary, 10 "
        "fixed-width value buckets, 1e-6 epsilon guard) — the standard "
        "model-monitoring drift score. ONE conditional-count aggregate "
        "over the facts; period totals are a window over the (type x "
        "bucket) aggregate and the PSI sum a second tiny aggregate — "
        "zero joins, zero fact-sized windows. Buckets empty in both "
        "periods contribute exactly 0 and need no spine",
    tags=("statistics", "drift"),
)
def psi_value_drift(spark, sf_dir):
    split = F.lit("2024-01-16 00:00:00").cast("timestamp")
    ev = load(spark, sf_dir, "events")
    c = (
        ev.filter(F.col("value").isNotNull())
        .groupBy(
            "event_type",
            F.least(F.floor(F.col("value") / 50), F.lit(9))
            .cast("bigint").alias("bucket"),
        )
        .agg(F.count_if(F.col("ts") < split).cast("bigint").alias("na"),
             F.count_if(F.col("ts") >= split).cast("bigint").alias("nb"))
    )
    w = W.partitionBy("event_type")
    t = c.withColumn("ta", F.sum("na").over(w)).withColumn(
        "tb", F.sum("nb").over(w))
    pa = F.col("na") * 1.0 / F.col("ta")
    pb = F.col("nb") * 1.0 / F.col("tb")
    return (
        t.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_buckets"),
            F.sum("na").cast("bigint").alias("n_before"),
            F.sum("nb").cast("bigint").alias("n_after"),
            F.round(F.sum((pa - pb) * F.log((pa + 1e-6) / (pb + 1e-6))), 6)
            .alias("psi"),
        )
        .orderBy("event_type")
    )


@register(
    "kaplan_meier_user_retention",
    """
    WITH u AS (
      SELECT user_id, event_type,
             date_diff('day', min(ts)::DATE, max(ts)::DATE) AS life,
             CASE WHEN max(ts) >= TIMESTAMP '2024-01-28' THEN 1 ELSE 0 END
               AS censored
      FROM events GROUP BY user_id, event_type),
    d AS (
      SELECT CAST(life AS BIGINT) AS t_day,
             CAST(count(*) AS BIGINT) AS n_leave,
             CAST(count_if(censored = 0) AS BIGINT) AS n_death
      FROM u GROUP BY 1),
    r AS (
      SELECT t_day, n_death,
             (SELECT CAST(count(*) AS BIGINT) FROM u)
               - CAST(coalesce(sum(n_leave) OVER
                   (ORDER BY t_day ROWS BETWEEN UNBOUNDED PRECEDING
                    AND 1 PRECEDING), 0) AS BIGINT) AS at_risk
      FROM d),
    s AS (
      SELECT t_day, n_death, at_risk,
             max(CASE WHEN n_death >= at_risk THEN 1 ELSE 0 END) OVER
               (ORDER BY t_day) AS hit_zero,
             sum(ln(nullif(1.0 - n_death * 1.0 / at_risk, 0.0))) OVER
               (ORDER BY t_day) AS lsum
      FROM r)
    SELECT t_day, at_risk AS n_at_risk, n_death AS n_deaths,
           CASE WHEN hit_zero = 1 THEN 0.0
                ELSE round(exp(lsum), 6) END AS survival
    FROM s
    WHERE n_death > 0
    ORDER BY t_day
    """,
    doc="Kaplan-Meier survival curve over per-(user, event-type) "
        "engagement lifetimes (first-to-last event span in days; "
        "subjects still active in the final 3 days are right-censored "
        "— the per-user grain would censor everything in this fixture, "
        "leaving a vacuous curve). Facts collapse to a subject aggregate, then "
        "to a per-day leave/death table (<=31 rows); at-risk counts and "
        "the log-survival prefix product are windows over that bounded "
        "day table — the cusum day-spine shape, never a fact-sized "
        "window. S(t)=0 when the last at-risk cohort all die is handled "
        "via an explicit flag (Spark ln(0) is NULL, DuckDB -inf — the "
        "CASE keeps both engines off that edge); round-6 guards the "
        "exp/ln libm difference",
    tags=("statistics", "survival"),
)
def kaplan_meier_user_retention(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    u = (
        ev.groupBy("user_id", "event_type")
        .agg(
            F.datediff(F.max("ts").cast("date"), F.min("ts").cast("date"))
            .alias("life"),
            F.when(F.max("ts") >= F.lit("2024-01-28 00:00:00")
                   .cast("timestamp"), 1).otherwise(0).alias("censored"),
        )
    )
    d = (
        u.groupBy(F.col("life").cast("bigint").alias("t_day"))
        .agg(F.count("*").cast("bigint").alias("n_leave"),
             F.count_if(F.col("censored") == 0).cast("bigint")
             .alias("n_death"))
    )
    n_total = u.agg(F.count("*").cast("bigint").alias("n_total"))
    wprev = W.orderBy("t_day").rowsBetween(W.unboundedPreceding, -1)
    wcum = W.orderBy("t_day")
    r = (
        d.crossJoin(F.broadcast(n_total))
        .withColumn(
            "at_risk",
            (F.col("n_total")
             - F.coalesce(F.sum("n_leave").over(wprev), F.lit(0)))
            .cast("bigint"),
        )
    )
    s = (
        r.withColumn(
            "hit_zero",
            F.max(F.when(F.col("n_death") >= F.col("at_risk"), 1)
                  .otherwise(0)).over(wcum),
        )
        .withColumn(
            "lsum",
            F.sum(F.log(F.nullif(
                F.lit(1.0) - F.col("n_death") * 1.0 / F.col("at_risk"),
                F.lit(0.0)))).over(wcum),
        )
    )
    return (
        s.filter(F.col("n_death") > 0)
        .select(
            "t_day",
            F.col("at_risk").alias("n_at_risk"),
            F.col("n_death").alias("n_deaths"),
            F.when(F.col("hit_zero") == 1, F.lit(0.0))
            .otherwise(F.round(F.exp("lsum"), 6)).alias("survival"),
        )
        .orderBy("t_day")
    )


@register(
    "cuped_adjusted_uplift",
    """
    WITH u AS (
      SELECT user_id,
             sum(CASE WHEN ts < TIMESTAMP '2024-01-16'
                      THEN CAST(value AS DECIMAL(18,6)) END) AS sa,
             count_if(ts <  TIMESTAMP '2024-01-16') AS na,
             sum(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                      THEN CAST(value AS DECIMAL(18,6)) END) AS sb,
             count_if(ts >= TIMESTAMP '2024-01-16') AS nb
      FROM events WHERE value IS NOT NULL
      GROUP BY user_id),
    xy AS (
      SELECT CAST(sa AS DOUBLE) / na AS x,
             CAST(sb AS DOUBLE) / nb AS y
      FROM u WHERE na > 0 AND nb > 0),
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS n_users,
             covar_pop(y, x) AS cxy, var_pop(x) AS vx, var_pop(y) AS vy
      FROM xy)
    SELECT n_users,
           round(cxy / vx, 6) AS theta,
           round(vy, 6) AS var_raw,
           round(vy - cxy * cxy / vx, 6) AS var_adjusted,
           round(100.0 * (cxy * cxy / vx) / vy, 6) AS var_reduction_pct
    FROM mom
    """,
    doc="CUPED variance reduction (Deng et al., WSDM'13): per-user "
        "pre-period mean value (first half of the month) as the "
        "covariate for the post-period mean; theta = cov(y,x)/var(x) "
        "and the adjusted-metric variance var(y) - cov^2/var(x). One "
        "grouped aggregate collapses facts to the 150-user table "
        "(per-user means are DECIMAL-sum-over-integer-count, so x and "
        "y are bit-identical doubles across engines); the moments are "
        "one covar_pop/var_pop pass over that bounded table, round-6 "
        "guarded for accumulation order. The experimentation-platform "
        "shape: at 100 TB the covariate table is user-cardinality, not "
        "fact-cardinality",
    tags=("statistics", "experimentation"),
)
def cuped_adjusted_uplift(spark, sf_dir):
    split = F.lit("2024-01-16 00:00:00").cast("timestamp")
    ev = load(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(18,6)")
    u = (
        ev.filter(F.col("value").isNotNull())
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("ts") < split, dec)).alias("sa"),
            F.count_if(F.col("ts") < split).alias("na"),
            F.sum(F.when(F.col("ts") >= split, dec)).alias("sb"),
            F.count_if(F.col("ts") >= split).alias("nb"),
        )
    )
    xy = (
        u.filter((F.col("na") > 0) & (F.col("nb") > 0))
        .select((F.col("sa").cast("double") / F.col("na")).alias("x"),
                (F.col("sb").cast("double") / F.col("nb")).alias("y"))
    )
    mom = xy.agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.covar_pop("y", "x").alias("cxy"),
        F.var_pop("x").alias("vx"),
        F.var_pop("y").alias("vy"),
    )
    return mom.select(
        "n_users",
        F.round(F.col("cxy") / F.col("vx"), 6).alias("theta"),
        F.round(F.col("vy"), 6).alias("var_raw"),
        F.round(F.col("vy") - F.col("cxy") * F.col("cxy") / F.col("vx"), 6)
        .alias("var_adjusted"),
        F.round(F.lit(100.0) * (F.col("cxy") * F.col("cxy") / F.col("vx"))
                / F.col("vy"), 6).alias("var_reduction_pct"),
    )


@register(
    "tukey_hsd_pairwise",
    """
    WITH g AS (
      SELECT o_orderpriority AS grp,
             CAST(count(*) AS BIGINT) AS n,
             sum(CAST(o_totalprice AS DECIMAL(18,2))) AS s,
             sum(CAST(o_totalprice AS DECIMAL(18,2))
                 * CAST(o_totalprice AS DECIMAL(18,2))) AS ss
      FROM orders GROUP BY 1),
    msw AS (
      SELECT (SELECT sum(CAST(ss AS DOUBLE)
                         - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
              FROM g)
             / ((SELECT CAST(sum(n) AS BIGINT) FROM g)
                - (SELECT CAST(count(*) AS BIGINT) FROM g)) AS msw)
    SELECT a.grp AS grp_1, b.grp AS grp_2,
           a.n AS n_1, b.n AS n_2,
           round(CAST(a.s AS DOUBLE) / a.n
                 - CAST(b.s AS DOUBLE) / b.n, 4) AS mean_diff,
           round(abs(CAST(a.s AS DOUBLE) / a.n
                     - CAST(b.s AS DOUBLE) / b.n)
                 / sqrt(msw / 2.0 * (1.0 / a.n + 1.0 / b.n)), 6)
             AS q_stat
    FROM g a JOIN g b ON a.grp < b.grp, msw
    ORDER BY grp_1, grp_2
    """,
    doc="Tukey-Kramer HSD post-hoc pairwise comparisons after the "
        "one-way ANOVA (anova_oneway_priority): studentized-range q "
        "statistics for all 10 priority pairs on order totalprice. "
        "Group sums and sums-of-squares are exact DECIMALs from ONE "
        "fact aggregate; MS-within and the q statistics are arithmetic "
        "over the 5-row group table (pair join = broadcast of 5 rows, "
        "MSW a 1-row broadcast), round-6/4 guarded. The unbalanced-n "
        "Tukey-Kramer form (per-pair 1/n_i + 1/n_j) — no equal-size "
        "assumption",
    tags=("statistics",),
)
def tukey_hsd_pairwise(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    g = (
        o.groupBy(F.col("o_orderpriority").alias("grp"))
        .agg(F.count("*").cast("bigint").alias("n"),
             F.sum(dec).alias("s"),
             F.sum(dec * dec).alias("ss"))
    )
    msw = g.agg(
        (F.sum(F.col("ss").cast("double")
               - F.col("s").cast("double") * F.col("s").cast("double")
               / F.col("n"))
         / (F.sum("n") - F.count("*"))).alias("msw")
    )
    a, b = g.alias("a"), g.alias("b")
    mean = lambda side: F.col(f"{side}.s").cast("double") / F.col(f"{side}.n")
    return (
        a.join(F.broadcast(b), F.col("a.grp") < F.col("b.grp"))
        .crossJoin(F.broadcast(msw))
        .select(
            F.col("a.grp").alias("grp_1"), F.col("b.grp").alias("grp_2"),
            F.col("a.n").alias("n_1"), F.col("b.n").alias("n_2"),
            F.round(mean("a") - mean("b"), 4).alias("mean_diff"),
            F.round(
                F.abs(mean("a") - mean("b"))
                / F.sqrt(F.col("msw") / 2.0
                         * (1.0 / F.col("a.n") + 1.0 / F.col("b.n"))),
                6,
            ).alias("q_stat"),
        )
        .orderBy("grp_1", "grp_2")
    )


@register(
    "bm25_term_scores",
    """
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      FROM documents),
    dl AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY 1),
    stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(dl) AS BIGINT) AS total_len
      FROM dl),
    tf AS (
      SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
      FROM toks WHERE tok IN ('join', 'shuffle', 'broadcast')
      GROUP BY 1, 2),
    df AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
    scored AS (
      SELECT t.doc_id,
             sum(ln((s.n_docs - f.df + 0.5) / (f.df + 0.5) + 1.0)
                 * t.tf * 2.2
                 / (t.tf + 1.2 * (0.25 + 0.75 * d.dl * s.n_docs
                                  * 1.0 / s.total_len))) AS score
      FROM tf t JOIN df f ON t.tok = f.tok
      JOIN dl d ON t.doc_id = d.doc_id, stats s
      GROUP BY t.doc_id)
    SELECT doc_id, round(score, 6) AS bm25
    FROM scored
    ORDER BY round(score, 6) DESC, doc_id
    LIMIT 10
    """,
    doc="BM25 ranking (k1=1.2, b=0.75, Lucene's +1 idf smoothing) for "
        "the fixed query {join, shuffle, broadcast} over the documents "
        "table — the lexical half of a hybrid retrieval stack (RRF "
        "fusion with the vector half is rrf_fused_selection). Term "
        "frequencies come from one tokenize+filter pass (the IN "
        "prunes the exploded stream to query terms before any "
        "shuffle); document lengths and corpus stats are one aggregate "
        "each; df and the corpus-stat row broadcast. Ranking ties "
        "break on doc_id over the round-6 score so both engines pick "
        "identical top-10 rows. At 100 TB: tf is (docs x 3 terms) "
        "bounded, dl is doc-cardinality — no fact-sized join side",
    tags=("statistics", "retrieval"),
)
def bm25_term_scores(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return (
        _bm25_scored(docs)
        .select("doc_id", F.round("score", 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(10)
    )


def _bm25_scored(docs, terms=("join", "shuffle", "broadcast"),
                 k1=1.2, b=0.75):
    """(doc_id, score) BM25 table for a fixed term set — shared by
    bm25_term_scores and hybrid_retrieval_rrf. tf is pruned to the
    query terms before any shuffle; df and corpus stats broadcast."""
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok"))
    dl = toks.groupBy("doc_id").agg(F.count("*").cast("bigint").alias("dl"))
    stats = dl.agg(F.count("*").cast("bigint").alias("n_docs"),
                   F.sum("dl").cast("bigint").alias("total_len"))
    tf = (
        toks.filter(F.col("tok").isin(*terms))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").cast("bigint").alias("tf"))
    )
    df_ = tf.groupBy("tok").agg(F.count("*").cast("bigint").alias("df"))
    return (
        tf.join(F.broadcast(df_), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.sum(
            F.log((F.col("n_docs") - F.col("df") + 0.5)
                  / (F.col("df") + 0.5) + 1.0)
            * F.col("tf") * (k1 + 1.0)
            / (F.col("tf")
               + k1 * (1 - b + b * F.col("dl") * F.col("n_docs")
                       * 1.0 / F.col("total_len")))
        ).alias("score"))
    )


@register(
    "moment_skew_kurtosis",
    """
    WITH v AS (
      SELECT event_type,
             CAST(round(value * 100) AS BIGINT) AS v100
      FROM events WHERE value IS NOT NULL),
    s AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(v100) AS DOUBLE) AS s1,
             CAST(sum(v100 * v100) AS DOUBLE) AS s2,
             CAST(sum(CAST(v100 * v100 AS DECIMAL(19,0)) * v100)
                  AS DOUBLE) AS s3,
             CAST(sum(CAST(v100 * v100 AS DECIMAL(19,0)) * (v100 * v100))
                  AS DOUBLE) AS s4
      FROM v GROUP BY event_type),
    m AS (
      SELECT event_type, n,
             s1 / n / 1e2 AS a1, s2 / n / 1e4 AS a2,
             s3 / n / 1e6 AS a3, s4 / n / 1e8 AS a4
      FROM s),
    c AS (
      SELECT event_type, n, a1,
             a2 - a1 * a1 AS m2,
             a3 - 3 * a1 * a2 + 2 * a1 * a1 * a1 AS m3,
             a4 - 4 * a1 * a3 + 6 * a1 * a1 * a2
               - 3 * a1 * a1 * a1 * a1 AS m4
      FROM m)
    SELECT event_type, n,
           round(a1, 6) AS mean,
           round(m3 / pow(m2, 1.5), 6) AS skewness_pop,
           round(m4 / (m2 * m2) - 3.0, 6) AS excess_kurtosis_pop
    FROM c
    ORDER BY event_type
    """,
    doc="Population skewness and excess kurtosis per event type from "
        "EXPLICIT power sums: the built-in skewness()/kurtosis() "
        "aggregates disagree across engines (Spark ships population "
        "moments, DuckDB sample-adjusted g1/g2), so the sums are exact "
        "INTEGERS — value has a fixed 0.01 grain, so v100 = value*100 "
        "is a bigint and sum(v100^k), k=1..4, accumulates exactly "
        "(DECIMAL-widened where a bigint sum could overflow) in any "
        "partition order. Only the 5-row moment algebra runs in "
        "doubles, guarded at round-6. One map-side-combinable "
        "aggregate over the facts",
    tags=("statistics",),
)
def moment_skew_kurtosis(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    v100 = F.round(F.col("value") * 100).cast("bigint")
    v2 = F.col("v100") * F.col("v100")
    v2dec = v2.cast("decimal(19,0)")
    s = (
        ev.filter(F.col("value").isNotNull())
        .select("event_type", v100.alias("v100"))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("v100").cast("double").alias("s1"),
            F.sum(v2).cast("double").alias("s2"),
            F.sum(v2dec * F.col("v100")).cast("double").alias("s3"),
            F.sum(v2dec * v2).cast("double").alias("s4"),
        )
    )
    a1 = F.col("s1") / F.col("n") / F.lit(1e2)
    a2 = F.col("s2") / F.col("n") / F.lit(1e4)
    a3 = F.col("s3") / F.col("n") / F.lit(1e6)
    a4 = F.col("s4") / F.col("n") / F.lit(1e8)
    m2 = a2 - a1 * a1
    m3 = a3 - F.lit(3) * a1 * a2 + F.lit(2) * a1 * a1 * a1
    m4 = (a4 - F.lit(4) * a1 * a3 + F.lit(6) * a1 * a1 * a2
          - F.lit(3) * a1 * a1 * a1 * a1)
    return (
        s.select(
            "event_type", "n",
            F.round(a1, 6).alias("mean"),
            F.round(m3 / F.pow(m2, 1.5), 6).alias("skewness_pop"),
            F.round(m4 / (m2 * m2) - 3.0, 6).alias("excess_kurtosis_pop"),
        )
        .orderBy("event_type")
    )


@register(
    "seasonal_decompose_additive",
    """
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day,
             dayofweek(ts) AS dow,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2),
    t AS (
      SELECT day, dow, n,
             avg(n * 1.0) OVER (ORDER BY day
                                ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
               AS trend,
             count(*) OVER (ORDER BY day
                            ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
               AS w
      FROM d),
    inner_t AS (SELECT * FROM t WHERE w = 7),
    s AS (
      SELECT dow,
             avg(n - trend) AS seasonal
      FROM inner_t GROUP BY dow)
    SELECT strftime(i.day, '%Y-%m-%d') AS day, i.n,
           round(i.trend, 6) AS trend,
           round(s.seasonal, 6) AS seasonal,
           round(i.n - i.trend - s.seasonal, 6) AS residual
    FROM inner_t i JOIN s ON i.dow = s.dow
    ORDER BY day
    """,
    doc="Classical additive seasonal decomposition of the daily event "
        "count: 7-day centered moving-average trend (full windows only "
        "— edge days with fewer than 7 neighbors are excluded, pinned "
        "by the window row COUNT, not value heuristics), weekday "
        "seasonal = mean detrended value per day-of-week, residual = "
        "observed - trend - seasonal. Every window runs on the "
        "~30-row day table (the cusum/KM day-spine shape; the one "
        "unpartitioned window is spine-sized by construction); the "
        "seasonal join is a 7-row broadcast. Day-of-week normalized "
        "to DuckDB's 0=Sunday",
    tags=("statistics", "timeseries"),
)
def seasonal_decompose_additive(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    d = (
        ev.groupBy(F.col("ts").cast("date").alias("day"),
                   (F.dayofweek("ts") - 1).alias("dow"))
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    w7 = W.orderBy("day").rowsBetween(-3, 3)
    t = (
        d.withColumn("trend", F.avg(F.col("n") * 1.0).over(w7))
        .withColumn("w", F.count("*").over(w7))
        .filter(F.col("w") == 7)
    )
    s = t.groupBy("dow").agg(
        F.avg(F.col("n") - F.col("trend")).alias("seasonal"))
    return (
        t.join(F.broadcast(s), "dow")
        .select(
            # STRING day: DuckDB DATE surfaces as a pandas Timestamp in
            # the driver compare while Spark DATE stays datetime.date —
            # identical values, mismatched canon types
            F.date_format("day", "yyyy-MM-dd").alias("day"), "n",
            F.round("trend", 6).alias("trend"),
            F.round("seasonal", 6).alias("seasonal"),
            F.round(F.col("n") - F.col("trend") - F.col("seasonal"), 6)
            .alias("residual"),
        )
        .orderBy("day")
    )


@register(
    "text_augment_char_noise",
    """
    WITH aug AS (
      SELECT doc_id, source, length(text) AS n_before,
             array_to_string(list_transform(list_filter(
               generate_series(1, length(text)),
               p -> substring(md5(doc_id || ':' || p), 1, 1) != '0'),
               p -> substring(text, p, 1)), '') AS aug_text
      FROM documents)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_before) AS BIGINT) AS chars_before,
           CAST(sum(length(aug_text)) AS BIGINT) AS chars_after,
           min(md5(aug_text)) AS min_aug_md5
    FROM aug GROUP BY source ORDER BY source
    """,
    doc="Deterministic data augmentation (char-level deletion noise): "
        "drop every character whose position hashes into a 1/16 md5 "
        "band keyed on (doc_id, position) — the reproducible-noise "
        "contract augmentation pipelines need (same corpus + seed => "
        "same augmented corpus on ANY engine/partitioning, pinned here "
        "by cross-engine md5 equality of the augmented text). Pure "
        "higher-order array functions (sequence -> filter -> "
        "per-char substring -> join): no explode, no shuffle beyond "
        "the source rollup — a map-only pass at 100 TB. Per-char md5 "
        "is the slow-but-exact fixture form; the production swap is "
        "one xxhash64 per (doc, position-block)",
    tags=("llm", "augmentation"),
)
def text_augment_char_noise(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    keep = F.filter(
        F.sequence(F.lit(1), F.length("text")),
        lambda p: F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":"),
                           p.cast("string"))), 1, 1) != "0",
    )
    aug_text = F.array_join(
        F.transform(keep, lambda p: F.expr("text").substr(p, F.lit(1))), "")
    aug = docs.select(
        "source", F.length("text").alias("n_before"),
        aug_text.alias("aug_text"))
    return (
        aug.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_before").cast("bigint").alias("chars_before"),
            F.sum(F.length("aug_text")).cast("bigint").alias("chars_after"),
            F.min(F.md5("aug_text")).alias("min_aug_md5"),
        )
        .orderBy("source")
    )


@register(
    "tokenizer_fertility_audit",
    """
    WITH d AS (
      SELECT source,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
             CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))
                  AS BIGINT) AS n_subtokens,
             CAST(length(text) AS BIGINT) AS n_chars
      FROM documents)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_words) AS BIGINT) AS total_words,
           CAST(sum(n_subtokens) AS BIGINT) AS total_subtokens,
           round(sum(n_subtokens) * 1.0 / sum(n_words), 6) AS fertility,
           round(sum(n_chars) * 1.0 / sum(n_subtokens), 6)
             AS chars_per_token
    FROM d GROUP BY source ORDER BY source
    """,
    doc="Tokenizer fertility audit per source: subtokens-per-word and "
        "chars-per-token under the BPE-ish regex tokenization (letter "
        "runs / digit runs / single other-chars — the brief's token-"
        "counting recipe). Fertility is THE sizing number for a "
        "training run (token budget = words x fertility) and the drift "
        "alarm when a new source tokenizes pathologically. One regex-"
        "in-codegen pass over the narrow text column, counts are "
        "integers, one small rollup — map-only at 100 TB",
    tags=("llm", "tokenization"),
)
def tokenizer_fertility_audit(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    d = docs.select(
        "source",
        F.size(F.split("text", " ")).cast("bigint").alias("n_words"),
        F.size(F.regexp_extract_all(
            "text", F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), 0))
        .cast("bigint").alias("n_subtokens"),
        F.length("text").cast("bigint").alias("n_chars"),
    )
    return (
        d.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_words").cast("bigint").alias("total_words"),
            F.sum("n_subtokens").cast("bigint").alias("total_subtokens"),
            F.round(F.sum("n_subtokens") * 1.0 / F.sum("n_words"), 6)
            .alias("fertility"),
            F.round(F.sum("n_chars") * 1.0 / F.sum("n_subtokens"), 6)
            .alias("chars_per_token"),
        )
        .orderBy("source")
    )


@register(
    "dataset_card_summary",
    """
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(length(text)) AS BIGINT) AS total_chars,
           CAST(count_if(length(text) < 100) AS BIGINT) AS n_short,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(count(*) - count(DISTINCT md5(text)) AS BIGINT)
             AS n_exact_dups,
           round(count_if(length(text) < 100) * 100.0 / count(*), 6)
             AS pct_short,
           round(avg(length(text) * 1.0), 6) AS mean_chars
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
    doc="Dataset-card summary per source: the one-row-per-source audit "
        "a corpus release ships (sizes, short-doc fraction, language "
        "spread, exact-duplicate count via md5 fingerprints). ONE "
        "aggregate pass — the md5 distinct is the only shuffle-heavy "
        "term and it shuffles 16-byte fingerprints, not text; at "
        "100 TB swap count(DISTINCT md5) for approx_count_distinct as "
        "the column-profile entry documents. The composition target: "
        "every number here is independently available from the "
        "dedicated entries (multimodal_payload_stats, dedup_exact, "
        "monolingual_source_audit) — this is the one-pass rollup of "
        "them",
    tags=("llm", "audit"),
)
def dataset_card_summary(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return (
        docs.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(F.length("text")).cast("bigint").alias("total_chars"),
            F.count_if(F.length("text") < 100).cast("bigint")
            .alias("n_short"),
            F.countDistinct("lang").cast("bigint").alias("n_langs"),
            (F.count("*") - F.countDistinct(F.md5("text"))).cast("bigint")
            .alias("n_exact_dups"),
            F.round(F.count_if(F.length("text") < 100) * 100.0
                    / F.count("*"), 6).alias("pct_short"),
            F.round(F.avg(F.length("text") * 1.0), 6).alias("mean_chars"),
        )
        .orderBy("source")
    )


@register(
    "mann_kendall_trend",
    """
    WITH m AS (
      SELECT date_trunc('month', o_orderdate) AS mon,
             sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY 1),
    p AS (
      SELECT CASE WHEN b.rev > a.rev THEN 1
                  WHEN b.rev < a.rev THEN -1 ELSE 0 END AS s
      FROM m a JOIN m b ON a.mon < b.mon),
    agg AS (SELECT CAST(sum(s) AS BIGINT) AS s_stat FROM p),
    cnt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM m)
    SELECT n AS n_months, s_stat,
           round(CAST(s_stat AS DOUBLE) * 2 / (n * (n - 1)), 6) AS tau,
           round((s_stat - sign(s_stat))
                 / sqrt(n * (n - 1) * (2 * n + 5)
                        / CAST(18 AS DOUBLE)), 6) AS z
    FROM agg CROSS JOIN cnt
    """,
    doc="Mann-Kendall non-parametric trend test over the monthly "
        "revenue series (Mann 1945, Kendall 1975): S = sum of pairwise "
        "sign comparisons, tau = S normalized by the pair count, z with "
        "the standard continuity correction. Monthly sums are exact "
        "DECIMAL(18,2), so every sign() is deterministic and ties are "
        "structurally impossible — the no-ties variance n(n-1)(2n+5)/18 "
        "is exact, not an approximation. The quadratic pair join runs "
        "on the ~80-row month AGGREGATE (theil_sen / kendall_tau "
        "shape): Catalyst plans the inequality join as a broadcast "
        "nested loop of the bounded spine, facts shuffle exactly once "
        "into the month groupBy — scale-safe because months grow with "
        "calendar time, not data volume.",
    tags=("statistics",),
)
def mann_kendall_trend(spark, sf_dir):
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_mk_v")
    return spark.sql("""
      WITH m AS (
        SELECT date_trunc('month', o_orderdate) AS mon,
               sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        FROM orders_mk_v GROUP BY 1),
      p AS (
        SELECT CASE WHEN b.rev > a.rev THEN 1
                    WHEN b.rev < a.rev THEN -1 ELSE 0 END AS s
        FROM m a JOIN m b ON a.mon < b.mon),
      agg AS (SELECT CAST(sum(s) AS BIGINT) AS s_stat FROM p),
      cnt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM m)
      SELECT n AS n_months, s_stat,
             round(CAST(s_stat AS DOUBLE) * 2 / (n * (n - 1)), 6) AS tau,
             round((s_stat - sign(s_stat))
                   / sqrt(n * (n - 1) * (2 * n + 5)
                          / CAST(18 AS DOUBLE)), 6) AS z
      FROM agg CROSS JOIN cnt
    """)


@register(
    "durbin_watson_daily",
    """
    WITH d AS (
      SELECT o_orderdate AS dt,
             sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY 1),
    mn AS (SELECT min(dt) AS d0 FROM d),
    b AS (SELECT CAST(date_diff('day', d0, dt) AS BIGINT) AS x, dt, rev
          FROM d CROSS JOIN mn),
    s AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 sum(x) AS sx, sum(x * x) AS sxx,
                 sum(CAST(x AS DECIMAL(18,2)) * rev) AS sxy,
                 sum(rev) AS sy
          FROM b),
    fit AS (SELECT n,
                   CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE) AS slope,
                   sx, sy FROM s),
    fit2 AS (SELECT n, slope,
                    (CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE)) / n
                      AS icept FROM fit),
    e AS (SELECT b.x, b.dt,
                 CAST(b.rev AS DOUBLE) - (f.icept + f.slope * b.x) AS e,
                 f.n
          FROM b CROSS JOIN fit2 f),
    lagd AS (SELECT n, e,
                    e - lag(e) OVER (ORDER BY dt) AS de
             FROM e)
    SELECT max(n) AS n_days,
           round(sum(de * de) / sum(e * e), 6) AS dw
    FROM lagd
    """,
    doc="Durbin-Watson first-order residual autocorrelation of daily "
        "revenue around its OLS trend (DW~2 = uncorrelated, <2 = "
        "positive autocorrelation). The fit is the closed-form normal "
        "equation computed from EXACT decimal power sums (never "
        "regr_slope's double accumulation — both engines derive the "
        "identical slope/intercept doubles from identical decimals), "
        "residuals and the DW ratio are then plain double expressions. "
        "Facts shuffle once into the day aggregate; the lag window "
        "ORDER BY dt is global but consumes the calendar-bounded DAY "
        "TABLE (~2.4k rows — the cusum/kaplan_meier day-spine shape), "
        "and the fit scalars ride a 1-row broadcast.",
    tags=("statistics",),
)
def durbin_watson_daily(spark, sf_dir):
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_dw_v")
    return spark.sql("""
      WITH d AS (
        SELECT o_orderdate AS dt,
               sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        FROM orders_dw_v GROUP BY 1),
      mn AS (SELECT min(dt) AS d0 FROM d),
      b AS (SELECT CAST(datediff(dt, d0) AS BIGINT) AS x, dt, rev
            FROM d CROSS JOIN mn),
      s AS (SELECT CAST(count(*) AS BIGINT) AS n,
                   sum(x) AS sx, sum(x * x) AS sxx,
                   sum(CAST(x AS DECIMAL(18,2)) * rev) AS sxy,
                   sum(rev) AS sy
            FROM b),
      fit AS (SELECT n,
                     CAST(n * sxy - sx * sy AS DOUBLE)
                       / CAST(n * sxx - sx * sx AS DOUBLE) AS slope,
                     sx, sy FROM s),
      fit2 AS (SELECT n, slope,
                      (CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE)) / n
                        AS icept FROM fit),
      e AS (SELECT b.x, b.dt,
                   CAST(b.rev AS DOUBLE) - (f.icept + f.slope * b.x) AS e,
                   f.n
            FROM b CROSS JOIN fit2 f),
      lagd AS (SELECT n, e,
                      e - lag(e) OVER (ORDER BY dt) AS de
               FROM e)
      SELECT max(n) AS n_days,
             round(sum(de * de) / sum(e * e), 6) AS dw
      FROM lagd
    """)


@register(
    "cohens_d_effect_size",
    """
    WITH s AS (
      SELECT
        CAST(count(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT)
          AS n1,
        sum(CASE WHEN event_type = 'click'
                 THEN CAST(value AS DECIMAL(18,2)) END) AS s1,
        sum(CASE WHEN event_type = 'click'
                 THEN CAST(value AS DECIMAL(18,2))
                      * CAST(value AS DECIMAL(18,2)) END) AS q1,
        CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT)
          AS n2,
        sum(CASE WHEN event_type = 'purchase'
                 THEN CAST(value AS DECIMAL(18,2)) END) AS s2,
        sum(CASE WHEN event_type = 'purchase'
                 THEN CAST(value AS DECIMAL(18,2))
                      * CAST(value AS DECIMAL(18,2)) END) AS q2
      FROM events WHERE event_type IN ('click', 'purchase')),
    m AS (
      SELECT n1, n2,
             CAST(s1 AS DOUBLE) / n1 AS m1,
             CAST(s2 AS DOUBLE) / n2 AS m2,
             (CAST(q1 AS DOUBLE)
              - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n1) / (n1 - 1)
               AS v1,
             (CAST(q2 AS DOUBLE)
              - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / n2) / (n2 - 1)
               AS v2
      FROM s)
    SELECT n1, n2,
           round(m1 - m2, 6) AS mean_diff,
           round((m1 - m2)
                 / sqrt(((n1 - 1) * v1 + (n2 - 1) * v2)
                        / (n1 + n2 - 2)), 6) AS cohens_d,
           round((1.0 - 3.0 / (4.0 * (n1 + n2) - 9.0))
                 * (m1 - m2)
                 / sqrt(((n1 - 1) * v1 + (n2 - 1) * v2)
                        / (n1 + n2 - 2)), 6) AS hedges_g
    FROM m
    """,
    doc="Standardized effect size between two event populations: "
        "Cohen's d on the pooled SD plus Hedges' small-sample "
        "correction g = J*d, J = 1 - 3/(4N-9) (Hedges 1981) — the "
        "companion to welch_t_test (which answers 'is there a "
        "difference'; this answers 'how big'). ONE conditional-count "
        "fact aggregate produces exact decimal power sums; every "
        "downstream value is the same short sequence of double ops on "
        "identical inputs, so parity is exact. Zero joins, single "
        "map-side-combinable shuffle — the moment_skew_kurtosis shape.",
    tags=("statistics",),
)
def cohens_d_effect_size(spark, sf_dir):
    load(spark, sf_dir, "events").createOrReplaceTempView("events_cd_v")
    return spark.sql("""
      WITH s AS (
        SELECT
          CAST(count(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT)
            AS n1,
          sum(CASE WHEN event_type = 'click'
                   THEN CAST(value AS DECIMAL(18,2)) END) AS s1,
          sum(CASE WHEN event_type = 'click'
                   THEN CAST(value AS DECIMAL(18,2))
                        * CAST(value AS DECIMAL(18,2)) END) AS q1,
          CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END)
               AS BIGINT) AS n2,
          sum(CASE WHEN event_type = 'purchase'
                   THEN CAST(value AS DECIMAL(18,2)) END) AS s2,
          sum(CASE WHEN event_type = 'purchase'
                   THEN CAST(value AS DECIMAL(18,2))
                        * CAST(value AS DECIMAL(18,2)) END) AS q2
        FROM events_cd_v WHERE event_type IN ('click', 'purchase')),
      m AS (
        SELECT n1, n2,
               CAST(s1 AS DOUBLE) / n1 AS m1,
               CAST(s2 AS DOUBLE) / n2 AS m2,
               (CAST(q1 AS DOUBLE)
                - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n1) / (n1 - 1)
                 AS v1,
               (CAST(q2 AS DOUBLE)
                - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / n2) / (n2 - 1)
                 AS v2
        FROM s)
      SELECT n1, n2,
             round(m1 - m2, 6) AS mean_diff,
             round((m1 - m2)
                   / sqrt(((n1 - 1) * v1 + (n2 - 1) * v2)
                          / (n1 + n2 - 2)), 6) AS cohens_d,
             round((1.0 - 3.0 / (4.0 * (n1 + n2) - 9.0))
                   * (m1 - m2)
                   / sqrt(((n1 - 1) * v1 + (n2 - 1) * v2)
                          / (n1 + n2 - 2)), 6) AS hedges_g
      FROM m
    """)


@register(
    "runs_test_daily_revenue",
    """
    WITH d AS (
      SELECT o_orderdate AS dt,
             sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY 1),
    med AS (SELECT percentile_cont(0.5)
                     WITHIN GROUP (ORDER BY CAST(rev AS DOUBLE)) AS m
            FROM d),
    s AS (SELECT dt,
                 CASE WHEN CAST(rev AS DOUBLE) > m THEN 1 ELSE 0 END
                   AS above
          FROM d CROSS JOIN med),
    r AS (SELECT above,
                 CASE WHEN lag(above) OVER (ORDER BY dt) IS NULL
                        OR lag(above) OVER (ORDER BY dt) <> above
                      THEN 1 ELSE 0 END AS new_run
          FROM s),
    agg AS (SELECT CAST(sum(new_run) AS BIGINT) AS runs,
                   CAST(sum(above) AS BIGINT) AS n1,
                   CAST(count(*) - sum(above) AS BIGINT) AS n2
            FROM r)
    SELECT n1, n2, runs,
           round((runs - (CAST(2 * n1 * n2 AS DOUBLE) / (n1 + n2) + 1))
                 / sqrt(CAST(2 * n1 * n2 AS DOUBLE)
                        * (2 * n1 * n2 - n1 - n2)
                        / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2)
                           * (n1 + n2 - 1))), 6) AS z
    FROM agg
    """,
    doc="Wald-Wolfowitz runs test for randomness of daily revenue "
        "around its median: R = number of above/below runs, z against "
        "the exact run-count moments. The above/below coding compares "
        "exact decimal day sums (cast to double only against the "
        "double median, identically on both engines), runs are counted "
        "by an integer lag-transition sum, and the z arithmetic is the "
        "same short double sequence on exact BIGINT inputs. The lag "
        "window ORDER BY dt is global but consumes the calendar-bounded "
        "day table (durbin_watson/cusum shape); facts shuffle once.",
    tags=("statistics",),
)
def runs_test_daily_revenue(spark, sf_dir):
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_rt_v")
    return spark.sql("""
      WITH d AS (
        SELECT o_orderdate AS dt,
               sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        FROM orders_rt_v GROUP BY 1),
      med AS (SELECT percentile_cont(0.5)
                       WITHIN GROUP (ORDER BY CAST(rev AS DOUBLE)) AS m
              FROM d),
      s AS (SELECT dt,
                   CASE WHEN CAST(rev AS DOUBLE) > m THEN 1 ELSE 0 END
                     AS above
            FROM d CROSS JOIN med),
      r AS (SELECT above,
                   CASE WHEN lag(above) OVER (ORDER BY dt) IS NULL
                          OR lag(above) OVER (ORDER BY dt) <> above
                        THEN 1 ELSE 0 END AS new_run
            FROM s),
      agg AS (SELECT CAST(sum(new_run) AS BIGINT) AS runs,
                     CAST(sum(above) AS BIGINT) AS n1,
                     CAST(count(*) - sum(above) AS BIGINT) AS n2
              FROM r)
      SELECT n1, n2, runs,
             round((runs - (CAST(2 * n1 * n2 AS DOUBLE) / (n1 + n2) + 1))
                   / sqrt(CAST(2 * n1 * n2 AS DOUBLE)
                          * (2 * n1 * n2 - n1 - n2)
                          / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2)
                             * (n1 + n2 - 1))), 6) AS z
      FROM agg
    """)


@register(
    "cramers_v_dow_status",
    """
    WITH c AS (
      SELECT dayofweek(o_orderdate) AS dow, o_orderstatus AS st,
             CAST(count(*) AS BIGINT) AS n
      FROM orders GROUP BY 1, 2),
    rm AS (SELECT dow, sum(n) AS rn FROM c GROUP BY dow),
    cm AS (SELECT st, sum(n) AS cn FROM c GROUP BY st),
    tot AS (SELECT sum(n) AS nn,
                   CAST(count(DISTINCT dow) AS BIGINT) AS r,
                   CAST(count(DISTINCT st) AS BIGINT) AS k
            FROM c),
    chi AS (
      SELECT CAST(sum(CAST(c.n AS DOUBLE) * c.n * t.nn
                      / (rm.rn * cm.cn)) AS DOUBLE)
               - max(t.nn) AS chi2,
             max(t.nn) AS nn, max(t.r) AS r, max(t.k) AS k
      FROM c JOIN rm ON c.dow = rm.dow
             JOIN cm ON c.st = cm.st
             CROSS JOIN tot t)
    SELECT CAST(nn AS BIGINT) AS n_total,
           round(chi2, 6) AS chi2,
           round(sqrt(chi2 / (nn * (least(r, k) - 1))), 6) AS cramers_v,
           round(sqrt(chi2 / (nn * sqrt(CAST((r - 1) * (k - 1)
                                             AS DOUBLE)))), 6)
             AS tschuprow_t
    FROM chi
    """,
    doc="Cramer's V and Tschuprow's T association strength for the "
        "(day-of-week x order-status) contingency — the normalized "
        "companion to chi2_priority_status's raw test statistic. Chi2 "
        "via the sparse telescoping identity sum(n^2*N/(rm*cm)) - N "
        "(absent cells contribute zero, so no dense cross join); "
        "marginals are exact integer aggregates of the 21-cell table "
        "and every join is over that bounded aggregate, never facts. "
        "Each engine uses its own dayofweek convention — the keys are "
        "bijective, so the contingency structure and every statistic "
        "agree.",
    tags=("statistics",),
)
def cramers_v_dow_status(spark, sf_dir):
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_cv_v")
    return spark.sql("""
      WITH c AS (
        SELECT dayofweek(o_orderdate) AS dow, o_orderstatus AS st,
               CAST(count(*) AS BIGINT) AS n
        FROM orders_cv_v GROUP BY 1, 2),
      rm AS (SELECT dow, sum(n) AS rn FROM c GROUP BY dow),
      cm AS (SELECT st, sum(n) AS cn FROM c GROUP BY st),
      tot AS (SELECT sum(n) AS nn,
                     CAST(count(DISTINCT dow) AS BIGINT) AS r,
                     CAST(count(DISTINCT st) AS BIGINT) AS k
              FROM c),
      chi AS (
        SELECT CAST(sum(CAST(c.n AS DOUBLE) * c.n * t.nn
                        / (rm.rn * cm.cn)) AS DOUBLE)
                 - max(t.nn) AS chi2,
               max(t.nn) AS nn, max(t.r) AS r, max(t.k) AS k
        FROM c JOIN rm ON c.dow = rm.dow
               JOIN cm ON c.st = cm.st
               CROSS JOIN tot t)
      SELECT CAST(nn AS BIGINT) AS n_total,
             round(chi2, 6) AS chi2,
             round(sqrt(chi2 / (nn * (least(r, k) - 1))), 6) AS cramers_v,
             round(sqrt(chi2 / (nn * sqrt(CAST((r - 1) * (k - 1)
                                               AS DOUBLE)))), 6)
               AS tschuprow_t
      FROM chi
    """)


@register(
    "jensen_shannon_halves",
    """
    WITH c AS (
      SELECT event_type,
             CAST(count(CASE WHEN day(ts) <= 15 THEN 1 END) AS DOUBLE)
               AS a,
             CAST(count(CASE WHEN day(ts) > 15 THEN 1 END) AS DOUBLE)
               AS b
      FROM events GROUP BY 1),
    tot AS (SELECT sum(a) AS ta, sum(b) AS tb FROM c),
    pq AS (SELECT a / ta AS p, b / tb AS q FROM c CROSS JOIN tot),
    terms AS (
      SELECT CASE WHEN p > 0
                  THEN p * log2(p / ((p + q) / 2)) ELSE 0 END
           + CASE WHEN q > 0
                  THEN q * log2(q / ((p + q) / 2)) ELSE 0 END AS t2
      FROM pq)
    SELECT CAST((SELECT count(*) FROM c) AS BIGINT) AS n_types,
           round(sum(t2) / 2, 6) AS js_bits,
           round(sqrt(sum(t2) / 2), 6) AS js_distance
    FROM terms
    """,
    doc="Jensen-Shannon divergence (bits) between the event-type "
        "distributions of the month's two halves — the symmetric, "
        "bounded [0,1] companion to kl_divergence_sources (KL is "
        "asymmetric and unbounded; JS's square root is a metric, the "
        "usual drift score). Exact integer counts from ONE conditional "
        "aggregate; the 5-term JS sum is double arithmetic on exact "
        "ratios, round-6 absorbing the summation order. Zero joins of "
        "fact-sized inputs — totals ride a 1-row broadcast.",
    tags=("statistics",),
)
def jensen_shannon_halves(spark, sf_dir):
    load(spark, sf_dir, "events").createOrReplaceTempView("events_js_v")
    return spark.sql("""
      WITH c AS (
        SELECT event_type,
               CAST(count(CASE WHEN day(ts) <= 15 THEN 1 END) AS DOUBLE)
                 AS a,
               CAST(count(CASE WHEN day(ts) > 15 THEN 1 END) AS DOUBLE)
                 AS b
        FROM events_js_v GROUP BY 1),
      tot AS (SELECT sum(a) AS ta, sum(b) AS tb FROM c),
      pq AS (SELECT a / ta AS p, b / tb AS q FROM c CROSS JOIN tot),
      terms AS (
        SELECT CASE WHEN p > 0
                    THEN p * log2(p / ((p + q) / 2)) ELSE 0 END
             + CASE WHEN q > 0
                    THEN q * log2(q / ((p + q) / 2)) ELSE 0 END AS t2
        FROM pq)
      SELECT CAST((SELECT count(*) FROM c) AS BIGINT) AS n_types,
             round(sum(t2) / 2, 6) AS js_bits,
             round(sqrt(sum(t2) / 2), 6) AS js_distance
      FROM terms
    """)


@register(
    "acf_multi_lag_daily",
    """
    WITH d AS (
      SELECT o_orderdate AS dt,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS rev
      FROM orders GROUP BY 1),
    l AS (SELECT rev,
                 lag(rev, 1)  OVER (ORDER BY dt) AS r1,
                 lag(rev, 7)  OVER (ORDER BY dt) AS r7,
                 lag(rev, 14) OVER (ORDER BY dt) AS r14
          FROM d)
    SELECT CAST(count(*) AS BIGINT) AS n_days,
           round(corr(rev, r1), 6)  AS acf_1,
           round(corr(rev, r7), 6)  AS acf_7,
           round(corr(rev, r14), 6) AS acf_14
    FROM l
    """,
    doc="Autocorrelation function of daily revenue at lags 1/7/14 — "
        "the seasonality fingerprint behind the lag-7 choice in "
        "seasonal_naive_mase and seasonal_decompose (a weekly cycle "
        "shows as acf_7 >> acf_1). Day revenues are exact decimal sums "
        "cast once to double; corr() shares its Pearson definition "
        "across engines and the inputs are identical, round-6 absorbs "
        "accumulation order. Lag windows ORDER BY dt globally but over "
        "the calendar-bounded day table only (durbin_watson shape); "
        "facts shuffle once into the day aggregate.",
    tags=("statistics",),
)
def acf_multi_lag_daily(spark, sf_dir):
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_acf_v")
    return spark.sql("""
      WITH d AS (
        SELECT o_orderdate AS dt,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS rev
        FROM orders_acf_v GROUP BY 1),
      l AS (SELECT rev,
                   lag(rev, 1)  OVER (ORDER BY dt) AS r1,
                   lag(rev, 7)  OVER (ORDER BY dt) AS r7,
                   lag(rev, 14) OVER (ORDER BY dt) AS r14
            FROM d)
      SELECT CAST(count(*) AS BIGINT) AS n_days,
             round(corr(rev, r1), 6)  AS acf_1,
             round(corr(rev, r7), 6)  AS acf_7,
             round(corr(rev, r14), 6) AS acf_14
      FROM l
    """)


@register(
    "roc_auc_rank_eval",
    """
    WITH c AS (
      SELECT n_chars AS v, count(*) AS t,
             count(CASE WHEN lang = 'en' THEN 1 END) AS np
      FROM documents GROUP BY 1),
    r AS (
      SELECT np,
             2 * (sum(t) OVER (ORDER BY v) - t) + t + 1 AS mr2
      FROM c),
    s AS (
      SELECT CAST(sum(np * mr2) AS BIGINT) AS s2,
             (SELECT CAST(sum(np) AS BIGINT) FROM c) AS npos,
             (SELECT CAST(sum(t) - sum(np) AS BIGINT) FROM c) AS nneg
      FROM r)
    SELECT npos AS n_pos, nneg AS n_neg,
           round((s2 - npos * (npos + 1.0))
                 / (2.0 * npos * nneg), 6) AS auc
    FROM s
    """,
    doc="ROC-AUC of a document-length score against the lang='en' "
        "label via the rank-sum identity (AUC == normalized "
        "Mann-Whitney U) — the standard eval for quality-classifier "
        "scores without choosing a threshold. Tie-aware doubled "
        "midranks keep every moment an exact BIGINT until the single "
        "final division. The Spark side runs on the distributed "
        "midrank backbone (operators/ranks.py: per-value count table, "
        "range-bucketed prefix sums, no empty-partition window over "
        "facts); the oracle spells the same identity with a window "
        "over the value-count table. Reference has no eval surface; "
        "this is the analytics extension the classifier gate "
        "(quality_classifier_auc) promises.",
    tags=("statistics", "eval"),
)
def roc_auc_rank_eval(spark, sf_dir):
    from ..operators.ranks import doubled_midranks

    d = load(spark, sf_dir, "documents")
    pv = d.groupBy(F.col("n_chars").alias("v")).agg(
        F.count("*").alias("t"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("np"),
    )
    r = doubled_midranks(pv, "v", "t")
    s = r.agg(
        F.sum(F.col("np") * F.col("mr2")).cast("bigint").alias("s2"),
        F.sum("np").cast("bigint").alias("npos"),
        (F.sum("t") - F.sum("np")).cast("bigint").alias("nneg"),
    )
    return s.select(
        F.col("npos").alias("n_pos"),
        F.col("nneg").alias("n_neg"),
        F.round(
            (F.col("s2") - F.col("npos") * (F.col("npos") + F.lit(1.0)))
            / (F.lit(2.0) * F.col("npos") * F.col("nneg")),
            6,
        ).alias("auc"),
    )


@register(
    "calibration_brier_bins",
    """
    WITH p AS (
      SELECT 1.0 / (1.0 + exp(-(n_chars - 300) / 50.0)) AS p,
             CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
      FROM documents)
    SELECT least(CAST(floor(p * 10) AS INT), 9) AS bin,
           CAST(count(*) AS BIGINT) AS n,
           round(avg(p), 6) AS mean_pred,
           round(avg(y), 6) AS frac_pos,
           round(avg((p - y) * (p - y)), 6) AS brier_bin
    FROM p GROUP BY 1 ORDER BY 1
    """,
    doc="Calibration reliability table + per-bin Brier score for a "
        "fixed logistic pseudo-probability of the lang='en' label — "
        "the companion diagnostic to roc_auc_rank_eval (AUC measures "
        "ranking, this measures probability calibration; a "
        "well-calibrated bin has mean_pred ~= frac_pos). ONE "
        "conditional aggregate pass, joinless and windowless — the "
        "cheapest possible shape, trivially map-side-combinable at "
        "100 TB. Fixed logistic constants keep the score a pure "
        "per-row expression (no scalar broadcast); the only libm-"
        "boundary bin edge (n_chars=300 -> p=0.5 exactly) is exact in "
        "both engines because exp(0)=1 exactly.",
    tags=("statistics", "eval"),
)
def calibration_brier_bins(spark, sf_dir):
    load(spark, sf_dir, "documents").createOrReplaceTempView("docs_cal_v")
    return spark.sql("""
      WITH p AS (
        SELECT 1.0 / (1.0 + exp(-(n_chars - 300) / 50.0)) AS p,
               CASE WHEN lang = 'en' THEN CAST(1.0 AS DOUBLE)
                    ELSE CAST(0.0 AS DOUBLE) END AS y
        FROM docs_cal_v)
      SELECT least(CAST(floor(p * 10) AS INT), 9) AS bin,
             CAST(count(*) AS BIGINT) AS n,
             round(avg(p), 6) AS mean_pred,
             round(avg(y), 6) AS frac_pos,
             round(avg((p - y) * (p - y)), 6) AS brier_bin
      FROM p GROUP BY 1 ORDER BY 1
    """)


@register(
    "wasserstein_value_drift",
    """
    WITH s AS (
      SELECT value AS v,
             CASE WHEN day(ts) <= 15 THEN 0 ELSE 1 END AS grp
      FROM events WHERE value IS NOT NULL),
    mm AS (SELECT min(v) AS lo, max(v) AS hi FROM s),
    b AS (
      SELECT least(CAST(floor((v - lo) / (hi - lo) * 200) AS INT),
                   199) AS bin,
             count(CASE WHEN grp = 0 THEN 1 END) AS na,
             count(CASE WHEN grp = 1 THEN 1 END) AS nb
      FROM s CROSS JOIN mm GROUP BY 1),
    tot AS (SELECT sum(na) AS ta, sum(nb) AS tb FROM b),
    e AS (
      SELECT sum(na) OVER (ORDER BY bin) / CAST(ta AS DOUBLE) AS fa,
             sum(nb) OVER (ORDER BY bin) / CAST(tb AS DOUBLE) AS fb
      FROM b CROSS JOIN tot)
    SELECT CAST(count(*) AS BIGINT) AS n_bins,
           round(sum(abs(fa - fb))
                 * (SELECT (hi - lo) / 200 FROM mm), 6) AS w1_binned
    FROM e
    """,
    doc="Binned 1-Wasserstein (earth-mover) distance between the "
        "value distributions of the month's two halves — the "
        "magnitude-aware drift score that KS (sup of ECDF gap) and "
        "PSI (binned likelihood ratio) miss: W1 integrates |F_a - F_b| "
        "so a small shift of a large mass and a large shift of a "
        "small mass both register proportionally. Same grid-ECDF "
        "shape as ks_drift_event_types: one conditional fact "
        "aggregate into <=200 bins, prefix-sum windows on the bin "
        "table only, min/max and bin-width ride 1-row broadcasts. "
        "Bin assignment is pure arithmetic (no libm), so both engines "
        "compute bit-identical doubles.",
    tags=("statistics", "drift"),
)
def wasserstein_value_drift(spark, sf_dir):
    load(spark, sf_dir, "events").createOrReplaceTempView("events_w1_v")
    return spark.sql("""
      WITH s AS (
        SELECT value AS v,
               CASE WHEN day(ts) <= 15 THEN 0 ELSE 1 END AS grp
        FROM events_w1_v WHERE value IS NOT NULL),
      mm AS (SELECT min(v) AS lo, max(v) AS hi FROM s),
      b AS (
        SELECT least(CAST(floor((v - lo) / (hi - lo) * 200) AS INT),
                     199) AS bin,
               count(CASE WHEN grp = 0 THEN 1 END) AS na,
               count(CASE WHEN grp = 1 THEN 1 END) AS nb
        FROM s CROSS JOIN mm GROUP BY 1),
      tot AS (SELECT sum(na) AS ta, sum(nb) AS tb FROM b),
      e AS (
        SELECT sum(na) OVER (ORDER BY bin) / CAST(ta AS DOUBLE) AS fa,
               sum(nb) OVER (ORDER BY bin) / CAST(tb AS DOUBLE) AS fb
        FROM b CROSS JOIN tot)
      SELECT CAST(count(*) AS BIGINT) AS n_bins,
             round(sum(abs(fa - fb))
                   * (SELECT (hi - lo) / 200 FROM mm), 6) AS w1_binned
      FROM e
    """)


@register(
    "mad_robust_scale",
    """
    WITH m AS (
      SELECT o_orderpriority AS p,
             percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice)
               AS med
      FROM orders GROUP BY 1),
    d AS (
      SELECT o.o_orderpriority AS p, m.med,
             abs(o.o_totalprice - m.med) AS ad
      FROM orders o JOIN m ON o.o_orderpriority = m.p)
    SELECT p AS priority,
           CAST(count(*) AS BIGINT) AS n,
           round(min(med), 6) AS median_price,
           round(percentile_cont(0.5) WITHIN GROUP (ORDER BY ad), 6)
             AS mad,
           round(1.4826 * percentile_cont(0.5)
                   WITHIN GROUP (ORDER BY ad), 6) AS sigma_robust
    FROM d GROUP BY p ORDER BY p
    """,
    doc="Median absolute deviation per order priority, with the "
        "1.4826 consistency factor that makes MAD a robust drop-in "
        "for stddev under normality — the outlier-immune scale "
        "estimate behind robust z-scores (anomaly_days_zscore's "
        "documented alternative when a single whale day wrecks the "
        "mean/stddev). Two grouped exact percentile passes; the "
        "5-row median table broadcasts back into the second pass. "
        "percentile_cont shares interpolation semantics across "
        "engines (percentile_cont_within_group precedent). At 100 TB "
        "swap percentile_cont for approx_percentile, as "
        "histogram_equi_depth documents.",
    tags=("statistics",),
)
def mad_robust_scale(spark, sf_dir):
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_mad_v")
    return spark.sql("""
      WITH m AS (
        SELECT o_orderpriority AS p,
               percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice)
                 AS med
        FROM orders_mad_v GROUP BY 1),
      d AS (
        SELECT o.o_orderpriority AS p, m.med,
               abs(o.o_totalprice - m.med) AS ad
        FROM orders_mad_v o JOIN m ON o.o_orderpriority = m.p)
      SELECT p AS priority,
             CAST(count(*) AS BIGINT) AS n,
             round(min(med), 6) AS median_price,
             round(percentile_cont(0.5) WITHIN GROUP (ORDER BY ad), 6)
               AS mad,
             round(1.4826 * percentile_cont(0.5)
                     WITHIN GROUP (ORDER BY ad), 6) AS sigma_robust
      FROM d GROUP BY p ORDER BY p
    """)


@register(
    "hybrid_retrieval_rrf",
    """
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      FROM documents),
    dl AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY 1),
    stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(dl) AS BIGINT) AS total_len
      FROM dl),
    tf AS (
      SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
      FROM toks WHERE tok IN ('join', 'shuffle', 'broadcast')
      GROUP BY 1, 2),
    idf AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
    scored AS (
      SELECT t.doc_id,
             sum(ln((s.n_docs - f.df + 0.5) / (f.df + 0.5) + 1.0)
                 * t.tf * 2.2
                 / (t.tf + 1.2 * (0.25 + 0.75 * d.dl * s.n_docs
                                  * 1.0 / s.total_len))) AS score
      FROM tf t JOIN idf f ON t.tok = f.tok
      JOIN dl d ON t.doc_id = d.doc_id, stats s
      GROUP BY t.doc_id),
    bm AS (
      SELECT doc_id, round(score, 6) AS s FROM scored
      ORDER BY s DESC, doc_id LIMIT 20),
    bmr AS (
      SELECT doc_id,
             CAST(row_number() OVER (ORDER BY s DESC, doc_id) AS BIGINT)
               AS br
      FROM bm),
    qv AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 0),
    cs AS (
      SELECT vec_id AS doc_id,
             round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                          CAST(q AS DOUBLE[])), 4) AS sim
      FROM embeddings, qv WHERE vec_id <> 0
      ORDER BY sim DESC, vec_id LIMIT 20),
    csr AS (
      SELECT doc_id,
             CAST(row_number() OVER (ORDER BY sim DESC, doc_id) AS BIGINT)
               AS vr
      FROM cs)
    SELECT COALESCE(b.doc_id, c.doc_id) AS doc_id,
           round(coalesce(CAST(1.0 AS DOUBLE) / (60 + br), 0)
                 + coalesce(CAST(1.0 AS DOUBLE) / (60 + vr), 0), 6)
             AS rrf,
           br AS bm25_rank, vr AS cos_rank
    FROM bmr b FULL OUTER JOIN csr c ON b.doc_id = c.doc_id
    ORDER BY rrf DESC, doc_id LIMIT 10
    """,
    doc="End-to-end hybrid search: BM25 lexical top-20 (fixed query "
        "{join, shuffle, broadcast}) fused with brute-cosine vector "
        "top-20 (vec_id=0 probe) by reciprocal-rank fusion "
        "(Cormack et al. SIGIR'09, k=60) — the architecture every "
        "RAG retrieval stack runs, assembled from this registry's own "
        "halves (bm25_term_scores + embedding_cosine_topk). Rank "
        "determinism across engines: both shortlists rank by the "
        "ROUNDED score (6dp BM25 / 4dp cosine) with doc_id "
        "tie-breaks, so float accumulation order can't swap adjacent "
        "ranks; RRF terms 1/(60+r) are exact rationals of small "
        "integers. Scale shape: shortlists are ORDER BY + LIMIT "
        "(TakeOrdered); rank windows and the fusion full-outer join "
        "touch 20-row tables only. At 100 TB the cosine half swaps "
        "for probe_ivfpq and the BM25 half for a pruned tf table — "
        "both documented scale paths of their registry entries.",
    tags=("statistics", "retrieval", "eval"),
)
def hybrid_retrieval_rrf(spark, sf_dir):
    from ..operators.similarity import _as_double, cosine

    docs = load(spark, sf_dir, "documents")
    bm = (
        _bm25_scored(docs)
        .select("doc_id", F.round("score", 6).alias("s"))
        .orderBy(F.col("s").desc(), "doc_id")
        .limit(20)
    )
    bmr = bm.select(
        "doc_id",
        F.row_number()
        .over(W.orderBy(F.col("s").desc(), "doc_id"))
        .cast("bigint")
        .alias("br"),
    )
    emb = load(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    q = F.array(*[F.lit(float(x)) for x in qvec])
    cs = (
        emb.filter(F.col("vec_id") != 0)
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(cosine(_as_double("embedding"), q), 4).alias("sim"),
        )
        .orderBy(F.col("sim").desc(), "doc_id")
        .limit(20)
    )
    csr = cs.select(
        "doc_id",
        F.row_number()
        .over(W.orderBy(F.col("sim").desc(), "doc_id"))
        .cast("bigint")
        .alias("vr"),
    )
    fused = bmr.join(csr, "doc_id", "full_outer")
    one = F.lit(1.0)
    rrf = F.round(
        F.coalesce(one / (F.col("br") + 60), F.lit(0.0))
        + F.coalesce(one / (F.col("vr") + 60), F.lit(0.0)),
        6,
    )
    return (
        fused.select(
            "doc_id",
            rrf.alias("rrf"),
            F.col("br").alias("bm25_rank"),
            F.col("vr").alias("cos_rank"),
        )
        .orderBy(F.col("rrf").desc(), "doc_id")
        .limit(10)
    )


@register(
    "classifier_agreement_metrics",
    """
    WITH c AS (
      SELECT
        CAST(count(CASE WHEN lang = 'en' AND n_chars > 300 THEN 1 END)
             AS BIGINT) AS tp,
        CAST(count(CASE WHEN lang <> 'en' AND n_chars > 300 THEN 1 END)
             AS BIGINT) AS fp,
        CAST(count(CASE WHEN lang = 'en' AND n_chars <= 300 THEN 1 END)
             AS BIGINT) AS fn,
        CAST(count(CASE WHEN lang <> 'en' AND n_chars <= 300 THEN 1 END)
             AS BIGINT) AS tn,
        CAST(count(*) AS BIGINT) AS n
      FROM documents),
    m AS (
      SELECT n, tp, fp, fn, tn,
             CAST(tp + tn AS DOUBLE) / n AS po,
             (CAST(tp + fp AS DOUBLE) * (tp + fn)
              + CAST(fn + tn AS DOUBLE) * (fp + tn))
               / (CAST(n AS DOUBLE) * n) AS pe,
             CAST(tp AS DOUBLE) / (tp + fp) AS prec,
             CAST(tp AS DOUBLE) / (tp + fn) AS rec
      FROM c)
    SELECT n,
           round(po, 6) AS accuracy,
           round(prec, 6) AS precision_pos,
           round(rec, 6) AS recall_pos,
           round(2 * prec * rec / (prec + rec), 6) AS f1,
           round((po - pe) / (1 - pe), 6) AS cohens_kappa
    FROM m
    """,
    doc="Thresholded-classifier evaluation card: accuracy / precision "
        "/ recall / F1 of the n_chars>300 rule against the lang='en' "
        "label, plus Cohen's kappa (chance-corrected agreement — the "
        "number that exposes accuracy inflated by class imbalance). "
        "Completes the eval family: roc_auc_rank_eval is "
        "threshold-free, calibration_brier_bins is probability "
        "quality, this is the confusion-matrix view of one operating "
        "point. ONE conditional aggregate over documents — joinless, "
        "windowless, exact integer confusion counts; every derived "
        "metric is scalar algebra on the single stat row.",
    tags=("statistics", "eval"),
)
def classifier_agreement_metrics(spark, sf_dir):
    load(spark, sf_dir, "documents").createOrReplaceTempView("docs_cam_v")
    return spark.sql("""
      WITH c AS (
        SELECT
          CAST(count(CASE WHEN lang = 'en' AND n_chars > 300 THEN 1 END)
               AS BIGINT) AS tp,
          CAST(count(CASE WHEN lang <> 'en' AND n_chars > 300 THEN 1 END)
               AS BIGINT) AS fp,
          CAST(count(CASE WHEN lang = 'en' AND n_chars <= 300 THEN 1 END)
               AS BIGINT) AS fn,
          CAST(count(CASE WHEN lang <> 'en' AND n_chars <= 300 THEN 1 END)
               AS BIGINT) AS tn,
          CAST(count(*) AS BIGINT) AS n
        FROM docs_cam_v),
      m AS (
        SELECT n, tp, fp, fn, tn,
               CAST(tp + tn AS DOUBLE) / n AS po,
               (CAST(tp + fp AS DOUBLE) * (tp + fn)
                + CAST(fn + tn AS DOUBLE) * (fp + tn))
                 / (CAST(n AS DOUBLE) * n) AS pe,
               CAST(tp AS DOUBLE) / (tp + fp) AS prec,
               CAST(tp AS DOUBLE) / (tp + fn) AS rec
        FROM c)
      SELECT n,
             round(po, 6) AS accuracy,
             round(prec, 6) AS precision_pos,
             round(rec, 6) AS recall_pos,
             round(2 * prec * rec / (prec + rec), 6) AS f1,
             round((po - pe) / (1 - pe), 6) AS cohens_kappa
      FROM m
    """)


@register(
    "g_test_independence",
    """
    WITH c AS (
      SELECT o_orderpriority AS p, o_orderstatus AS s,
             CAST(count(*) AS BIGINT) AS n
      FROM orders GROUP BY 1, 2),
    r AS (SELECT p, sum(n) AS rn FROM c GROUP BY 1),
    k AS (SELECT s, sum(n) AS cn FROM c GROUP BY 1),
    t AS (SELECT sum(n) AS tn FROM c)
    SELECT CAST(min(t.tn) AS BIGINT) AS n,
           CAST((SELECT count(*) - 1 FROM r)
                * (SELECT count(*) - 1 FROM k) AS BIGINT) AS df,
           round(2 * sum(c.n * ln(CAST(c.n AS DOUBLE) * t.tn
                                  / (r.rn * k.cn))), 6) AS g_stat
    FROM c JOIN r ON c.p = r.p JOIN k ON c.s = k.s CROSS JOIN t
    """,
    doc="G-test (log-likelihood ratio) of independence for order "
        "priority x status — the companion to chi2_priority_status "
        "that stays calibrated when expected counts are small (G is "
        "additive across partitions of the table, chi2 is not). "
        "Observed-count form 2*sum(O*ln(O*N/(R*C))) needs no dense "
        "expected grid and zero cells drop out naturally; all joins "
        "run on the 15-cell contingency aggregate, marginals and the "
        "grand total broadcast.",
    tags=("statistics",),
)
def g_test_independence(spark, sf_dir):
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_gt_v")
    return spark.sql("""
      WITH c AS (
        SELECT o_orderpriority AS p, o_orderstatus AS s,
               CAST(count(*) AS BIGINT) AS n
        FROM orders_gt_v GROUP BY 1, 2),
      r AS (SELECT p, sum(n) AS rn FROM c GROUP BY 1),
      k AS (SELECT s, sum(n) AS cn FROM c GROUP BY 1),
      t AS (SELECT sum(n) AS tn FROM c)
      SELECT CAST(min(t.tn) AS BIGINT) AS n,
             CAST((SELECT count(*) - 1 FROM r)
                  * (SELECT count(*) - 1 FROM k) AS BIGINT) AS df,
             round(2 * sum(c.n * ln(CAST(c.n AS DOUBLE) * t.tn
                                    / (r.rn * k.cn))), 6) AS g_stat
      FROM c JOIN r ON c.p = r.p JOIN k ON c.s = k.s CROSS JOIN t
    """)


@register(
    "poisson_dispersion_daily",
    """
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_days,
           round(avg(CAST(n AS DOUBLE)), 6) AS mean_count,
           round(var_samp(CAST(n AS DOUBLE)), 6) AS var_count,
           round(var_samp(CAST(n AS DOUBLE))
                 / avg(CAST(n AS DOUBLE)), 6) AS dispersion,
           round((count(*) - 1) * var_samp(CAST(n AS DOUBLE))
                 / avg(CAST(n AS DOUBLE)), 6) AS chi2_stat
    FROM d GROUP BY 1 ORDER BY 1
    """,
    doc="Index-of-dispersion test for daily event arrivals per type: "
        "variance/mean of day counts (Poisson => 1; >1 = bursty/"
        "overdispersed, the signal that a negative-binomial rate model "
        "or burst-aware rate limiting is needed) with the chi-squared "
        "form (n-1)*s2/xbar on n_days-1 df. Counts collapse to the "
        "calendar-bounded (type, day) table in one map-side aggregate; "
        "moments run per type on <=31 rows. var_samp over identical "
        "doubles agrees across engines at round-6.",
    tags=("statistics",),
)
def poisson_dispersion_daily(spark, sf_dir):
    load(spark, sf_dir, "events").createOrReplaceTempView("events_pd_v")
    return spark.sql("""
      WITH d AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS n
        FROM events_pd_v GROUP BY 1, 2)
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_days,
             round(avg(CAST(n AS DOUBLE)), 6) AS mean_count,
             round(var_samp(CAST(n AS DOUBLE)), 6) AS var_count,
             round(var_samp(CAST(n AS DOUBLE))
                   / avg(CAST(n AS DOUBLE)), 6) AS dispersion,
             round((count(*) - 1) * var_samp(CAST(n AS DOUBLE))
                   / avg(CAST(n AS DOUBLE)), 6) AS chi2_stat
      FROM d GROUP BY 1 ORDER BY 1
    """)


_BH_SQL = """
    WITH c AS (
      SELECT event_type,
             CAST(count(CASE WHEN day(ts) <= 15 THEN 1 END)
                  AS BIGINT) AS a,
             CAST(count(CASE WHEN day(ts) > 15 THEN 1 END)
                  AS BIGINT) AS b
      FROM {events} GROUP BY 1),
    t AS (SELECT sum(a) AS ta, sum(b) AS tb FROM c),
    z AS (
      SELECT event_type,
             (CAST(a AS DOUBLE) / ta - CAST(b AS DOUBLE) / tb)
             / sqrt((CAST(a + b AS DOUBLE) / (ta + tb))
                    * (1 - CAST(a + b AS DOUBLE) / (ta + tb))
                    * (CAST(1 AS DOUBLE) / ta
                       + CAST(1 AS DOUBLE) / tb)) AS zv
      FROM c CROSS JOIN t),
    p1 AS (
      SELECT event_type, zv,
             CAST(1 AS DOUBLE) / (1 + 0.2316419 * abs(zv)) AS tt,
             abs(zv) AS az
      FROM z),
    p2 AS (
      SELECT event_type, zv,
             2 * 0.3989422804014327 * exp(-az * az / 2) * tt
               * (0.319381530 + tt * (-0.356563782
                  + tt * (1.781477937 + tt * (-1.821255978
                  + tt * 1.330274429)))) AS pval
      FROM p1),
    r AS (
      SELECT event_type, zv, pval,
             CAST(row_number() OVER (ORDER BY pval, event_type)
                  AS BIGINT) AS rnk,
             CAST(count(*) OVER () AS BIGINT) AS m
      FROM p2),
    k AS (
      SELECT coalesce(max(CASE WHEN pval <= rnk * CAST(0.10 AS DOUBLE) / m
                               THEN rnk END), 0) AS kmax
      FROM r)
    SELECT event_type,
           round(zv, 6) AS z,
           round(pval, 6) AS p_value,
           rnk AS p_rank,
           round(rnk * CAST(0.10 AS DOUBLE) / m, 6) AS bh_critical,
           rnk <= kmax AS rejected
    FROM r CROSS JOIN k ORDER BY rnk
"""


@register(
    "benjamini_hochberg_fdr",
    _BH_SQL.format(events="events"),
    doc="Multiple-testing correction: per-type two-proportion z-tests "
        "(month halves) converted to two-sided p-values and run "
        "through the Benjamini-Hochberg step-up at FDR 0.10 — the "
        "procedure an experimentation platform applies before "
        "declaring any of m simultaneous metrics 'moved'. The normal "
        "CDF is Abramowitz-Stegun 26.2.17 (|err| < 7.5e-8) spelled as "
        "PURE arithmetic + one exp(), so both engines compute "
        "bit-identical p-values — no scipy, no engine-specific erf. "
        "One conditional fact aggregate; ranking, the step-up max-k "
        "scan and the reject flags all run on the m-row (=5) test "
        "table with 1-row broadcasts.",
    tags=("statistics", "eval"),
)
def benjamini_hochberg_fdr(spark, sf_dir):
    load(spark, sf_dir, "events").createOrReplaceTempView("events_bh_v")
    return spark.sql(_BH_SQL.format(events="events_bh_v"))


@register(
    "mde_power_card",
    """
    WITH u AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS nu
               FROM events),
    c AS (
      SELECT event_type,
             CAST(count(DISTINCT user_id) AS BIGINT) AS k
      FROM events GROUP BY 1)
    SELECT event_type,
           min(u.nu) AS n_users,
           k AS converted_users,
           round(CAST(k AS DOUBLE) / min(u.nu), 6) AS base_rate,
           round((1.959963985 + 0.841621234)
                 * sqrt(2 * (CAST(k AS DOUBLE) / min(u.nu))
                        * (1 - CAST(k AS DOUBLE) / min(u.nu))
                        / (min(u.nu) / 2.0)), 6) AS mde_abs,
           round((1.959963985 + 0.841621234)
                 * sqrt(2 * (CAST(k AS DOUBLE) / min(u.nu))
                        * (1 - CAST(k AS DOUBLE) / min(u.nu))
                        / (min(u.nu) / 2.0))
                 / (CAST(k AS DOUBLE) / min(u.nu)), 6) AS mde_rel
    FROM c CROSS JOIN u
    GROUP BY event_type, k ORDER BY event_type
    """,
    doc="Experiment-sizing card: per event type, the minimum "
        "detectable effect (absolute and relative) of a 50/50 split "
        "of the current user base at alpha=0.05 two-sided / 80% power "
        "— the go/no-go number a platform shows before any test "
        "launches (z constants 1.959963985 and 0.841621234 are "
        "literals, so the whole card is pure arithmetic over exact "
        "distinct counts; companion to benjamini_hochberg_fdr, which "
        "judges results AFTER). Two count-distinct aggregates, 1-row "
        "user-total broadcast, no windows.",
    tags=("statistics", "eval"),
)
def mde_power_card(spark, sf_dir):
    load(spark, sf_dir, "events").createOrReplaceTempView("events_mde_v")
    return spark.sql("""
      WITH u AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS nu
                 FROM events_mde_v),
      c AS (
        SELECT event_type,
               CAST(count(DISTINCT user_id) AS BIGINT) AS k
        FROM events_mde_v GROUP BY 1)
      SELECT event_type,
             min(u.nu) AS n_users,
             k AS converted_users,
             round(CAST(k AS DOUBLE) / min(u.nu), 6) AS base_rate,
             round((1.959963985 + 0.841621234)
                   * sqrt(2 * (CAST(k AS DOUBLE) / min(u.nu))
                          * (1 - CAST(k AS DOUBLE) / min(u.nu))
                          / (min(u.nu) / 2.0)), 6) AS mde_abs,
             round((1.959963985 + 0.841621234)
                   * sqrt(2 * (CAST(k AS DOUBLE) / min(u.nu))
                          * (1 - CAST(k AS DOUBLE) / min(u.nu))
                          / (min(u.nu) / 2.0))
                   / (CAST(k AS DOUBLE) / min(u.nu)), 6) AS mde_rel
      FROM c CROSS JOIN u
      GROUP BY event_type, k ORDER BY event_type
    """)


@register(
    "var_cvar_tail_risk",
    """
    WITH v AS (
      SELECT event_type, value AS x FROM events WHERE value IS NOT NULL),
    th AS (
      SELECT event_type,
             percentile_cont(0.95) WITHIN GROUP (ORDER BY x) AS var95
      FROM v GROUP BY 1)
    SELECT v.event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(min(th.var95), 6) AS var_95,
           CAST(count(CASE WHEN v.x >= th.var95 THEN 1 END) AS BIGINT)
             AS n_tail,
           round(avg(CASE WHEN v.x >= th.var95 THEN v.x END), 6)
             AS cvar_95
    FROM v JOIN th ON v.event_type = th.event_type
    GROUP BY v.event_type ORDER BY v.event_type
    """,
    doc="Tail risk per event type: 95th-percentile value-at-risk and "
        "the conditional mean beyond it (CVaR / expected shortfall — "
        "the coherent risk measure VaR alone isn't: VaR says where the "
        "tail starts, CVaR says how bad it is once entered; for ops "
        "these are the p95 latency/cost line and the mean of the "
        "overage). Same broadcast shape as mad_robust_scale: one "
        "grouped exact percentile, the 5-row threshold table joins "
        "back broadcast, tail mean is a conditional aggregate. >= on "
        "the threshold keeps the tail non-empty by construction; "
        "approx_percentile is the documented 100 TB swap.",
    tags=("statistics",),
)
def var_cvar_tail_risk(spark, sf_dir):
    load(spark, sf_dir, "events").createOrReplaceTempView("events_var_v")
    return spark.sql("""
      WITH v AS (
        SELECT event_type, value AS x FROM events_var_v
        WHERE value IS NOT NULL),
      th AS (
        SELECT event_type,
               percentile_cont(0.95) WITHIN GROUP (ORDER BY x) AS var95
        FROM v GROUP BY 1)
      SELECT v.event_type,
             CAST(count(*) AS BIGINT) AS n,
             round(min(th.var95), 6) AS var_95,
             CAST(count(CASE WHEN v.x >= th.var95 THEN 1 END) AS BIGINT)
               AS n_tail,
             round(avg(CASE WHEN v.x >= th.var95 THEN v.x END), 6)
               AS cvar_95
      FROM v JOIN th ON v.event_type = th.event_type
      GROUP BY v.event_type ORDER BY v.event_type
    """)


@register(
    "span_corruption_t5",
    """
    WITH t AS (
      SELECT doc_id, source, string_split(text, ' ') AS w
      FROM documents),
    m AS (
      SELECT doc_id, source, len(w) AS n_words,
             list_transform(generate_series(1, len(w)),
               p -> CASE WHEN substring(md5(doc_id || '#' || p), 1, 1)
                              = '0'
                         THEN 1 ELSE 0 END) AS st,
             w
      FROM t),
    k AS (
      SELECT doc_id, source, n_words, st, w,
             list_transform(generate_series(1, n_words),
               p -> list_max(st[greatest(p - 2, 1):p])) AS msk
      FROM m),
    c AS (
      SELECT source, n_words,
             CAST(list_sum(msk) AS BIGINT) AS n_masked,
             md5(array_to_string(list_filter(
               list_transform(generate_series(1, n_words),
                 p -> CASE WHEN st[p] = 1 THEN '<M>'
                           WHEN msk[p] = 1 THEN ''
                           ELSE w[p] END),
               x -> x <> ''), ' ')) AS corrupted_md5
      FROM k)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_words) AS BIGINT) AS total_words,
           CAST(sum(n_masked) AS BIGINT) AS masked_words,
           round(CAST(sum(n_masked) AS DOUBLE) / sum(n_words), 6)
             AS mask_rate,
           min(corrupted_md5) AS min_corrupted_md5
    FROM c GROUP BY source ORDER BY source
    """,
    doc="T5-style span corruption prep (Raffel et al. 2020 §3.1.4): "
        "deterministic 3-word mask spans start wherever the md5 of "
        "(doc_id, position) lands in a 1/16 band; each start word "
        "becomes one sentinel, span continuations drop (overlapping "
        "spans merge under one sentinel per start — the documented "
        "simplification of T5's numbered sentinels). Reproducibility "
        "is the contract: same corpus => byte-identical corrupted "
        "text on any engine/partitioning, pinned by cross-engine md5 "
        "equality (text_augment_char_noise's contract at span "
        "granularity). Pure higher-order array expressions, map-only "
        "pass + one source rollup.",
    tags=("llm", "augmentation"),
)
def span_corruption_t5(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    n = F.size(w)
    st = F.transform(
        F.sequence(F.lit(1), n),
        lambda p: F.when(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"),
                               F.lit("#"), p.cast("string"))), 1, 1)
            == "0", F.lit(1)).otherwise(F.lit(0)),
    )
    base = docs.select(
        "source", w.alias("w"), n.alias("n_words"), st.alias("st"))
    msk = F.transform(
        F.sequence(F.lit(1), F.col("n_words")),
        lambda p: F.array_max(
            F.slice(F.col("st"), F.greatest(p - 2, F.lit(1)),
                    p - F.greatest(p - 2, F.lit(1)) + 1)),
    )
    k = base.select("source", "n_words", "st", "w", msk.alias("msk"))
    corrupted = F.array_join(
        F.filter(
            F.transform(
                F.sequence(F.lit(1), F.col("n_words")),
                lambda p: F.when(F.element_at("st", p) == 1, F.lit("<M>"))
                .when(F.element_at("msk", p) == 1, F.lit(""))
                .otherwise(F.element_at("w", p)),
            ),
            lambda x: x != "",
        ),
        " ",
    )
    c = k.select(
        "source", "n_words",
        F.aggregate("msk", F.lit(0).cast("bigint"),
                    lambda a, x: a + x).alias("n_masked"),
        F.md5(corrupted).alias("corrupted_md5"),
    )
    return (
        c.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_words").cast("bigint").alias("total_words"),
            F.sum("n_masked").cast("bigint").alias("masked_words"),
            F.round(F.sum("n_masked").cast("double")
                    / F.sum("n_words"), 6).alias("mask_rate"),
            F.min("corrupted_md5").alias("min_corrupted_md5"),
        )
        .orderBy("source")
    )


@register(
    "ljung_box_daily",
    """
    WITH d AS (
      SELECT o_orderdate AS dt,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS rev
      FROM orders GROUP BY 1),
    l AS (
      SELECT rev,
             lag(rev, 1) OVER (ORDER BY dt) AS r1,
             lag(rev, 2) OVER (ORDER BY dt) AS r2,
             lag(rev, 3) OVER (ORDER BY dt) AS r3,
             lag(rev, 4) OVER (ORDER BY dt) AS r4,
             lag(rev, 5) OVER (ORDER BY dt) AS r5,
             lag(rev, 6) OVER (ORDER BY dt) AS r6,
             lag(rev, 7) OVER (ORDER BY dt) AS r7
      FROM d),
    a AS (
      SELECT CAST((SELECT count(*) FROM d) AS BIGINT) AS n,
             corr(rev, r1) AS c1, corr(rev, r2) AS c2,
             corr(rev, r3) AS c3, corr(rev, r4) AS c4,
             corr(rev, r5) AS c5, corr(rev, r6) AS c6,
             corr(rev, r7) AS c7
      FROM l)
    SELECT n, CAST(7 AS BIGINT) AS lags,
           round(n * (n + 2.0)
                 * (c1*c1/(n-1) + c2*c2/(n-2) + c3*c3/(n-3)
                    + c4*c4/(n-4) + c5*c5/(n-5) + c6*c6/(n-6)
                    + c7*c7/(n-7)), 6) AS q_stat
    FROM a
    """,
    doc="Ljung-Box portmanteau statistic over daily revenue (lags "
        "1..7): Q = n(n+2) * sum(rho_k^2 / (n-k)) — the 'is there ANY "
        "autocorrelation' omnibus test that decides whether the "
        "acf_multi_lag_daily numbers mean anything (compare Q to "
        "chi2(7): 14.07 at 5%). Same day-table shape as "
        "durbin_watson: one fact shuffle into the calendar-bounded "
        "day aggregate, lag windows + corr on that table, all seven "
        "correlations in ONE aggregate pass. Sample-ACF purists note "
        "corr-over-lagged-pairs is used on both engines identically, "
        "so parity is exact even where it differs from the "
        "fixed-mean textbook estimator.",
    tags=("statistics",),
)
def ljung_box_daily(spark, sf_dir):
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_lb_v")
    return spark.sql("""
      WITH d AS (
        SELECT o_orderdate AS dt,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS rev
        FROM orders_lb_v GROUP BY 1),
      l AS (
        SELECT rev,
               lag(rev, 1) OVER (ORDER BY dt) AS r1,
               lag(rev, 2) OVER (ORDER BY dt) AS r2,
               lag(rev, 3) OVER (ORDER BY dt) AS r3,
               lag(rev, 4) OVER (ORDER BY dt) AS r4,
               lag(rev, 5) OVER (ORDER BY dt) AS r5,
               lag(rev, 6) OVER (ORDER BY dt) AS r6,
               lag(rev, 7) OVER (ORDER BY dt) AS r7
        FROM d),
      a AS (
        SELECT CAST((SELECT count(*) FROM d) AS BIGINT) AS n,
               corr(rev, r1) AS c1, corr(rev, r2) AS c2,
               corr(rev, r3) AS c3, corr(rev, r4) AS c4,
               corr(rev, r5) AS c5, corr(rev, r6) AS c6,
               corr(rev, r7) AS c7
        FROM l)
      SELECT n, CAST(7 AS BIGINT) AS lags,
             round(n * (n + 2.0)
                   * (c1*c1/(n-1) + c2*c2/(n-2) + c3*c3/(n-3)
                      + c4*c4/(n-4) + c5*c5/(n-5) + c6*c6/(n-6)
                      + c7*c7/(n-7)), 6) AS q_stat
      FROM a
    """)


@register(
    "cross_correlation_types",
    """
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(count(CASE WHEN event_type = 'click' THEN 1 END)
                  AS DOUBLE) AS a,
             CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END)
                  AS DOUBLE) AS b
      FROM events GROUP BY 1),
    l AS (
      SELECT a, b,
             lag(b, 1)  OVER (ORDER BY day) AS bm1,
             lead(b, 1) OVER (ORDER BY day) AS bp1,
             lag(b, 2)  OVER (ORDER BY day) AS bm2,
             lead(b, 2) OVER (ORDER BY day) AS bp2
      FROM d)
    SELECT CAST(count(*) AS BIGINT) AS n_days,
           round(corr(a, bm2), 6) AS ccf_m2,
           round(corr(a, bm1), 6) AS ccf_m1,
           round(corr(a, b), 6) AS ccf_0,
           round(corr(a, bp1), 6) AS ccf_p1,
           round(corr(a, bp2), 6) AS ccf_p2
    FROM l
    """,
    doc="Cross-correlation function between daily click and purchase "
        "counts at lags -2..+2 — the lead/lag diagnostic behind "
        "attribution windows (clicks leading purchases shows as "
        "ccf_p1/ccf_p2 > ccf_m1/ccf_m2). One conditional aggregate "
        "into the 30-row day table; lag/lead windows and all five "
        "correlations run there (durbin_watson/acf shape).",
    tags=("statistics",),
)
def cross_correlation_types(spark, sf_dir):
    load(spark, sf_dir, "events").createOrReplaceTempView("events_ccf_v")
    return spark.sql("""
      WITH d AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(count(CASE WHEN event_type = 'click' THEN 1 END)
                    AS DOUBLE) AS a,
               CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END)
                    AS DOUBLE) AS b
        FROM events_ccf_v GROUP BY 1),
      l AS (
        SELECT a, b,
               lag(b, 1)  OVER (ORDER BY day) AS bm1,
               lead(b, 1) OVER (ORDER BY day) AS bp1,
               lag(b, 2)  OVER (ORDER BY day) AS bm2,
               lead(b, 2) OVER (ORDER BY day) AS bp2
        FROM d)
      SELECT CAST(count(*) AS BIGINT) AS n_days,
             round(corr(a, bm2), 6) AS ccf_m2,
             round(corr(a, bm1), 6) AS ccf_m1,
             round(corr(a, b), 6) AS ccf_0,
             round(corr(a, bp1), 6) AS ccf_p1,
             round(corr(a, bp2), 6) AS ccf_p2
      FROM l
    """)


@register(
    "bleu2_corpus_overlap",
    """
    WITH tok AS (
      SELECT doc_id, source = 'src0' AS is_ref,
             string_split(text, ' ') AS w
      FROM documents WHERE source IN ('src0', 'src1')),
    bg AS (
      SELECT is_ref, w[i] || ' ' || w[i + 1] AS g
      FROM (SELECT is_ref, w, unnest(generate_series(1, len(w) - 1))
                   AS i
            FROM tok WHERE len(w) >= 2) x),
    cc AS (SELECT g, CAST(count(*) AS BIGINT) AS c
           FROM bg WHERE NOT is_ref GROUP BY 1),
    rc AS (SELECT g, CAST(count(*) AS BIGINT) AS r
           FROM bg WHERE is_ref GROUP BY 1),
    lens AS (
      SELECT CAST(sum(CASE WHEN is_ref THEN len(w) END) AS BIGINT)
               AS ref_len,
             CAST(sum(CASE WHEN NOT is_ref THEN len(w) END) AS BIGINT)
               AS cand_len
      FROM tok),
    clip AS (
      SELECT CAST(sum(least(cc.c, coalesce(rc.r, 0))) AS BIGINT)
               AS clipped,
             CAST(sum(cc.c) AS BIGINT) AS total
      FROM cc LEFT JOIN rc ON cc.g = rc.g)
    SELECT total AS cand_bigrams,
           clipped AS clipped_matches,
           round(CAST(clipped AS DOUBLE) / total, 6) AS p2,
           round(CASE WHEN cand_len >= ref_len THEN 1.0
                      ELSE exp(1 - CAST(ref_len AS DOUBLE) / cand_len)
                 END, 6) AS brevity_penalty,
           round(CASE WHEN cand_len >= ref_len THEN 1.0
                      ELSE exp(1 - CAST(ref_len AS DOUBLE) / cand_len)
                 END * CAST(clipped AS DOUBLE) / total, 6) AS bleu2
    FROM clip CROSS JOIN lens
    """,
    doc="Corpus-level BLEU-2 (Papineni et al. 2002, bigram half): "
        "modified precision of src1 'candidates' against the src0 "
        "'reference' pool — clipped counts (candidate bigram credit "
        "capped at its reference frequency) plus the brevity penalty "
        "— the generation-eval primitive alongside the ranking "
        "metrics. Count clipping is exact integer algebra; the one "
        "exp() is round-6 absorbed. Bigram tables shuffle once each; "
        "the clip join runs on vocabulary-bounded gram tables (hash "
        "grams at 100 TB, as the dedup entries do).",
    tags=("statistics", "eval"),
)
def bleu2_corpus_overlap(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    tok = (
        docs.filter(F.col("source").isin("src0", "src1"))
        .select((F.col("source") == "src0").alias("is_ref"),
                F.split("text", " ").alias("w"))
        .filter(F.size("w") >= 2)
    )
    bg = tok.select(
        "is_ref",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("w") - 1),
                lambda i: F.concat(
                    F.element_at("w", i), F.lit(" "),
                    F.element_at("w", i + 1)),
            )
        ).alias("g"),
    )
    cc = (bg.filter(~F.col("is_ref")).groupBy("g")
          .agg(F.count("*").cast("bigint").alias("c")))
    rc = (bg.filter(F.col("is_ref")).groupBy("g")
          .agg(F.count("*").cast("bigint").alias("r")))
    lens = tok.agg(
        F.sum(F.when(F.col("is_ref"), F.size("w"))).cast("bigint")
        .alias("ref_len"),
        F.sum(F.when(~F.col("is_ref"), F.size("w"))).cast("bigint")
        .alias("cand_len"),
    )
    clip = (
        cc.join(rc, "g", "left")
        .agg(
            F.sum(F.least(F.col("c"), F.coalesce(F.col("r"), F.lit(0))))
            .cast("bigint").alias("clipped"),
            F.sum("c").cast("bigint").alias("total"),
        )
    )
    out = clip.crossJoin(F.broadcast(lens))
    bp = F.when(F.col("cand_len") >= F.col("ref_len"), F.lit(1.0)).otherwise(
        F.exp(F.lit(1) - F.col("ref_len").cast("double") / F.col("cand_len"))
    )
    p2 = F.col("clipped").cast("double") / F.col("total")
    return out.select(
        F.col("total").alias("cand_bigrams"),
        F.col("clipped").alias("clipped_matches"),
        F.round(p2, 6).alias("p2"),
        F.round(bp, 6).alias("brevity_penalty"),
        F.round(bp * p2, 6).alias("bleu2"),
    )


@register(
    "k_anonymity_audit",
    """
    WITH g AS (
      SELECT n.n_name AS nation, c.c_mktsegment AS segment,
             CAST(count(*) AS BIGINT) AS k
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1, 2)
    SELECT CAST(count(*) AS BIGINT) AS n_groups,
           CAST(min(k) AS BIGINT) AS min_k,
           CAST(count(CASE WHEN k < 5 THEN 1 END) AS BIGINT)
             AS groups_below_5,
           CAST(sum(CASE WHEN k < 5 THEN k ELSE 0 END) AS BIGINT)
             AS customers_at_risk
    FROM g
    """,
    doc="k-anonymity audit over the (nation, market segment) "
        "quasi-identifier: the smallest equivalence class, how many "
        "classes fall below k=5, and how many customers sit in them — "
        "the privacy pre-check before releasing joined data (a "
        "1-member class re-identifies its customer). One grouped "
        "count over the broadcast dim join, then a 125-row rollup.",
    tags=("statistics", "privacy"),
)
def k_anonymity_audit(spark, sf_dir):
    load(spark, sf_dir, "customer").createOrReplaceTempView("cust_ka_v")
    load(spark, sf_dir, "nation").createOrReplaceTempView("nation_ka_v")
    return spark.sql("""
      WITH g AS (
        SELECT n.n_name AS nation, c.c_mktsegment AS segment,
               CAST(count(*) AS BIGINT) AS k
        FROM cust_ka_v c JOIN nation_ka_v n
          ON c.c_nationkey = n.n_nationkey
        GROUP BY 1, 2)
      SELECT CAST(count(*) AS BIGINT) AS n_groups,
             CAST(min(k) AS BIGINT) AS min_k,
             CAST(count(CASE WHEN k < 5 THEN 1 END) AS BIGINT)
               AS groups_below_5,
             CAST(sum(CASE WHEN k < 5 THEN k ELSE 0 END) AS BIGINT)
               AS customers_at_risk
      FROM g
    """)


@register(
    "dp_noised_counts",
    """
    WITH c AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1),
    u AS (
      SELECT event_type, n,
             (CAST(('0x' || substring(md5('dp:' || event_type), 1, 13))
                   AS BIGINT) + 0.5) / 4503599627370496.0 AS uni
      FROM c)
    SELECT event_type, n,
           round(CASE WHEN uni < 0.5
                      THEN ln(2 * uni)
                      ELSE -ln(2 * (1 - uni)) END, 6) AS laplace_noise,
           round(n + CASE WHEN uni < 0.5
                          THEN ln(2 * uni)
                          ELSE -ln(2 * (1 - uni)) END, 6)
             AS noised_count
    FROM u ORDER BY event_type
    """,
    doc="Differential-privacy-style noised release: per-type counts "
        "plus Laplace(1/eps=1) noise derived from an md5 uniform via "
        "the inverse CDF — the count-release mechanism, made "
        "REPRODUCIBLE for testing by seeding the noise from the key "
        "(a production release swaps the md5 uniform for a real RNG; "
        "the query shape — one aggregate, per-row noise expression — "
        "is identical). The 52-bit md5 slice makes the uniform exact "
        "in double; ln() is round-6 absorbed; sensitivity 1 because "
        "each event contributes to one count.",
    tags=("statistics", "privacy"),
)
def dp_noised_counts(spark, sf_dir):
    load(spark, sf_dir, "events").createOrReplaceTempView("events_dp_v")
    return spark.sql("""
      WITH c AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n
        FROM events_dp_v GROUP BY 1),
      u AS (
        SELECT event_type, n,
               (conv(substring(md5(concat('dp:', event_type)), 1, 13),
                     16, 10) + 0.5) / 4503599627370496.0 AS uni
        FROM c)
      SELECT event_type, n,
             round(CASE WHEN uni < 0.5
                        THEN ln(2 * uni)
                        ELSE -ln(2 * (1 - uni)) END, 6) AS laplace_noise,
             round(n + CASE WHEN uni < 0.5
                            THEN ln(2 * uni)
                            ELSE -ln(2 * (1 - uni)) END, 6)
               AS noised_count
      FROM u ORDER BY event_type
    """)


@register(
    "embedding_participation_ratio",
    """
    WITH e AS (
      SELECT unnest(CAST(embedding AS DOUBLE[])) AS x,
             unnest(generate_series(1, len(embedding))) AS d
      FROM embeddings),
    p AS (
      SELECT d, count(*) AS n, sum(x) AS s1, sum(x * x) AS s2
      FROM e GROUP BY d),
    v AS (
      SELECT max(n) AS n_vec, count(*) AS n_dims,
             sum(s2 / n - (s1 / n) * (s1 / n)) AS tv,
             sum((s2 / n - (s1 / n) * (s1 / n))
                 * (s2 / n - (s1 / n) * (s1 / n))) AS tv2,
             sum((s1 / n) * (s1 / n)) AS mu2,
             sum(s2 / n) AS msq
      FROM p)
    SELECT CAST(n_vec AS BIGINT) AS n_vectors,
           CAST(n_dims AS BIGINT) AS n_dims,
           round(tv, 6) AS total_variance,
           round(tv * tv / tv2, 4) AS participation_ratio,
           round(mu2 / msq, 6) AS anisotropy
    FROM v
    """,
    doc="Embedding-space geometry audit: the participation ratio "
        "(sum var)^2 / sum var^2 of per-dimension variances — the "
        "effective dimensionality of the representation (64 iid dims "
        "=> ~64; a collapsed space => ~1) — plus the anisotropy score "
        "||mean||^2 / E||x||^2, the expected random-pair cosine "
        "(Ethayarajh 2019: contextual embeddings are anisotropic; a "
        "high value means cosine similarities are dominated by the "
        "common direction, and centering is needed before ANN). Scale: "
        "posexplode is map-side and the per-dimension aggregate is "
        "partially combined to n_dims rows per task — one shuffle of "
        "n_dims x tasks tiny rows, then a 1-row reduction; no window, "
        "no join. Variances ride double sums in both engines; round-6/"
        "round-4 absorb accumulation-order noise.",
    tags=("llm", "capability"),
)
def embedding_participation_ratio(spark, sf_dir):
    emb = fixture_df(spark, sf_dir, "embeddings")
    e = emb.select(
        F.posexplode(F.col("embedding").cast("array<double>"))
        .alias("d", "x")
    )
    p = e.groupBy("d").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("s1"),
        F.sum(F.col("x") * F.col("x")).alias("s2"),
    )
    var = F.col("s2") / F.col("n") - (F.col("s1") / F.col("n")) ** 2
    mean2 = (F.col("s1") / F.col("n")) ** 2
    v = p.agg(
        F.max("n").alias("n_vec"),
        F.count("*").alias("n_dims"),
        F.sum(var).alias("tv"),
        F.sum(var * var).alias("tv2"),
        F.sum(mean2).alias("mu2"),
        F.sum(F.col("s2") / F.col("n")).alias("msq"),
    )
    return v.select(
        F.col("n_vec").cast("bigint").alias("n_vectors"),
        F.col("n_dims").cast("bigint").alias("n_dims"),
        F.round("tv", 6).alias("total_variance"),
        F.round(F.col("tv") * F.col("tv") / F.col("tv2"), 4)
        .alias("participation_ratio"),
        F.round(F.col("mu2") / F.col("msq"), 6).alias("anisotropy"),
    )


@register(
    "embedding_centroid_drift",
    """
    WITH e AS (
      SELECT vec_id % 2 AS half,
             unnest(CAST(embedding AS DOUBLE[])) AS x,
             unnest(generate_series(1, len(embedding))) AS d
      FROM embeddings),
    p AS (
      SELECT d,
             sum(CASE WHEN half = 0 THEN x ELSE 0 END)
               / sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS ma,
             sum(CASE WHEN half = 1 THEN x ELSE 0 END)
               / sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS mb
      FROM e GROUP BY d),
    s AS (
      SELECT sum(ma * mb) AS dot, sum(ma * ma) AS na2,
             sum(mb * mb) AS nb2,
             sum((ma - mb) * (ma - mb)) AS dist2
      FROM p),
    c AS (
      SELECT CAST(sum(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_a,
             CAST(sum(CASE WHEN vec_id % 2 = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_b
      FROM embeddings)
    SELECT c.n_a, c.n_b,
           round(sqrt(s.dist2), 6) AS centroid_l2,
           round(s.dot / sqrt(s.na2 * s.nb2), 6) AS centroid_cosine
    FROM s CROSS JOIN c
    """,
    doc="Embedding drift gate between two corpus halves (vec_id "
        "parity stands in for old-vs-new model snapshots): per-"
        "dimension centroid of each half, then the L2 distance and "
        "cosine between the two centroids — the cheap first check "
        "before re-embedding or re-building an ANN index after a "
        "model update (centroid_cosine ~ 1 and centroid_l2 ~ 0 mean "
        "the space hasn't shifted; a drop means stored vectors and "
        "fresh query vectors no longer live in the same space). "
        "Scale: same map-side posexplode + n_dims-row conditional "
        "aggregate as embedding_participation_ratio — the halves are "
        "split by a CASE inside ONE aggregate, not a self-join; "
        "1-row broadcast cross of the count row.",
    tags=("llm", "capability"),
)
def embedding_centroid_drift(spark, sf_dir):
    emb = fixture_df(spark, sf_dir, "embeddings")
    e = emb.select(
        (F.col("vec_id") % 2).alias("half"),
        F.posexplode(F.col("embedding").cast("array<double>"))
        .alias("d", "x"),
    )
    p = e.groupBy("d").agg(
        (F.sum(F.when(F.col("half") == 0, F.col("x")).otherwise(F.lit(0.0)))
         / F.sum(F.when(F.col("half") == 0, F.lit(1)).otherwise(F.lit(0))))
        .alias("ma"),
        (F.sum(F.when(F.col("half") == 1, F.col("x")).otherwise(F.lit(0.0)))
         / F.sum(F.when(F.col("half") == 1, F.lit(1)).otherwise(F.lit(0))))
        .alias("mb"),
    )
    s = p.agg(
        F.sum(F.col("ma") * F.col("mb")).alias("dot"),
        F.sum(F.col("ma") * F.col("ma")).alias("na2"),
        F.sum(F.col("mb") * F.col("mb")).alias("nb2"),
        F.sum((F.col("ma") - F.col("mb")) * (F.col("ma") - F.col("mb")))
        .alias("dist2"),
    )
    c = emb.agg(
        F.sum(F.when(F.col("vec_id") % 2 == 0, 1).otherwise(0))
        .cast("bigint").alias("n_a"),
        F.sum(F.when(F.col("vec_id") % 2 == 1, 1).otherwise(0))
        .cast("bigint").alias("n_b"),
    )
    return s.crossJoin(F.broadcast(c)).select(
        "n_a", "n_b",
        F.round(F.sqrt("dist2"), 6).alias("centroid_l2"),
        F.round(F.col("dot") / F.sqrt(F.col("na2") * F.col("nb2")), 6)
        .alias("centroid_cosine"),
    )


@register(
    "padding_waste_by_bucket",
    """
    WITH t AS (
      SELECT CAST(len(list_filter(
               string_split_regex(lower(text), '[^a-z0-9]+'),
               x -> x <> '')) AS BIGINT) AS n_tok
      FROM documents),
    b AS (
      SELECT n_tok,
             CASE WHEN n_tok < 32 THEN 0 WHEN n_tok < 64 THEN 32
                  WHEN n_tok < 128 THEN 64 WHEN n_tok < 256 THEN 128
                  ELSE 256 END AS bucket_lo
      FROM t)
    SELECT bucket_lo,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(max(n_tok) AS BIGINT) AS max_tokens,
           CAST(sum(n_tok) AS BIGINT) AS total_tokens,
           CAST(count(*) * max(n_tok) AS BIGINT) AS padded_tokens,
           round(100.0 * (count(*) * max(n_tok) - sum(n_tok))
                 / (count(*) * max(n_tok)), 4) AS waste_pct
    FROM b GROUP BY bucket_lo ORDER BY bucket_lo
    """,
    doc="Padding-waste audit for length-bucketed batching: documents "
        "bucketed by token count (word tokens under the corpus "
        "tokenization regex) into power-of-two length bins, and per "
        "bin the fraction of a padded batch that would be PAD tokens "
        "if every doc is padded to the bin's observed max — the "
        "number that decides bucket boundaries for training-batch "
        "packing (complement of sequence_packing: packing removes "
        "padding, this measures what naive bucketing leaves on the "
        "table). Exact integer arithmetic end to end except the "
        "final ratio; one map pass + a 5-group aggregate, no shuffle "
        "beyond it.",
    tags=("llm", "capability"),
)
def padding_waste_by_bucket(spark, sf_dir):
    docs = fixture_df(spark, sf_dir, "documents")
    n_tok = F.size(
        F.filter(
            F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
            lambda x: x != "",
        )
    ).cast("bigint")
    b = docs.select(
        n_tok.alias("n_tok"),
        F.when(n_tok < 32, 0).when(n_tok < 64, 32).when(n_tok < 128, 64)
        .when(n_tok < 256, 128).otherwise(256).cast("bigint")
        .alias("bucket_lo"),
    )
    padded = F.count("*") * F.max("n_tok")
    return (
        b.groupBy("bucket_lo")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.max("n_tok").cast("bigint").alias("max_tokens"),
            F.sum("n_tok").cast("bigint").alias("total_tokens"),
            padded.cast("bigint").alias("padded_tokens"),
            F.round(
                100.0 * (padded - F.sum("n_tok")) / padded, 4
            ).alias("waste_pct"),
        )
        .orderBy("bucket_lo")
    )


@register(
    "triangle_count_brand_graph",
    """
    WITH ob AS (
      SELECT DISTINCT l.l_orderkey AS o, p.p_brand AS b
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
    e AS (
      SELECT DISTINCT a.b AS b1, c.b AS b2
      FROM ob a JOIN ob c ON a.o = c.o AND a.b < c.b),
    tri AS (
      SELECT count(*) AS n_tri
      FROM e e1 JOIN e e2 ON e1.b2 = e2.b1
      JOIN e e3 ON e3.b1 = e1.b1 AND e3.b2 = e2.b2),
    nodes AS (SELECT count(DISTINCT b) AS n_nodes FROM ob),
    edges AS (SELECT count(*) AS n_edges FROM e)
    SELECT CAST(n_nodes AS BIGINT) AS n_nodes,
           CAST(n_edges AS BIGINT) AS n_edges,
           CAST(n_tri AS BIGINT) AS n_triangles,
           round(2.0 * n_edges / n_nodes, 4) AS avg_degree
    FROM nodes CROSS JOIN edges CROSS JOIN tri
    """,
    doc="Triangle count on the brand co-purchase graph (nodes = part "
        "brands, edge = two brands in one order): the clustering "
        "primitive next to pagerank_bipartite_topk — triangles drive "
        "clustering coefficients and community detection. Every "
        "triangle (a<b<c) is counted exactly once because both the "
        "edge table and the two-hop join keep the lexicographic "
        "orientation. Scale: the per-order pair fan-out is capped by "
        "distinct brands per order (<= lines per order, ~7), the edge "
        "table is bounded by the brand-vocabulary square (C(25,2) "
        "here; vocabulary-bounded at any corpus size), and the "
        "triangle join runs over that bounded edge table (broadcast), "
        "never over facts.",
    tags=("analytics", "graph"),
)
def triangle_count_brand_graph(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    pt = load(spark, sf_dir, "part")
    ob = (
        li.join(pt, li.l_partkey == pt.p_partkey)
        .select(F.col("l_orderkey").alias("o"), F.col("p_brand").alias("b"))
        .distinct()
    )
    a, c = ob.alias("a"), ob.alias("c")
    e = (
        a.join(c, (F.col("a.o") == F.col("c.o"))
               & (F.col("a.b") < F.col("c.b")))
        .select(F.col("a.b").alias("b1"), F.col("c.b").alias("b2"))
        .distinct()
    )
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(F.broadcast(e2), F.col("e1.b2") == F.col("e2.b1"))
        .join(
            F.broadcast(e3),
            (F.col("e3.b1") == F.col("e1.b1"))
            & (F.col("e3.b2") == F.col("e2.b2")),
        )
        .agg(F.count("*").alias("n_tri"))
    )
    nodes = ob.agg(F.countDistinct("b").alias("n_nodes"))
    edges = e.agg(F.count("*").alias("n_edges"))
    return (
        nodes.crossJoin(F.broadcast(edges)).crossJoin(F.broadcast(tri))
        .select(
            F.col("n_nodes").cast("bigint").alias("n_nodes"),
            F.col("n_edges").cast("bigint").alias("n_edges"),
            F.col("n_tri").cast("bigint").alias("n_triangles"),
            F.round(2.0 * F.col("n_edges") / F.col("n_nodes"), 4)
            .alias("avg_degree"),
        )
    )


@register(
    "jackknife_ratio_price_per_qty",
    """
    WITH g AS (
      SELECT date_trunc('month', l_shipdate) AS m,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS a,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS b
      FROM lineitem GROUP BY 1),
    t AS (SELECT sum(a) AS s1, sum(b) AS s2,
                 CAST(count(*) AS BIGINT) AS n FROM g),
    l AS (
      SELECT (t.s1 - g.a) / (t.s2 - g.b) AS loo, t.s1, t.s2, t.n
      FROM g CROSS JOIN t),
    s AS (SELECT avg(loo) AS ml FROM l)
    SELECT max(l.n) AS n_groups,
           round(max(l.s1 / l.s2), 6) AS ratio_full,
           round((max(l.n) - 1) * (avg(l.loo) - max(l.s1 / l.s2)), 6)
             AS jk_bias,
           round(sqrt((max(l.n) - 1.0) / max(l.n)
                      * sum((l.loo - s.ml) * (l.loo - s.ml))), 6) AS jk_se
    FROM l CROSS JOIN s
    """,
    doc="Delete-one-group jackknife for a RATIO estimator (revenue "
        "per unit = sum price / sum qty): leave-one-shipmonth-out "
        "replicates give the bias and standard error the classical "
        "formula can't (a ratio is nonlinear; for a plain mean the "
        "jackknife collapses to stddev/sqrt(n), which is why the "
        "entry uses a ratio). Replicates come free from the bounded "
        "month spine: one exact-decimal grouped aggregate over facts "
        "(sum order cannot perturb), a 1-row totals broadcast, and "
        "the ~84-row LOO table — no resampling pass over facts, the "
        "standard trick for grouped/clustered jackknife at scale.",
    tags=("statistics",),
)
def jackknife_ratio_price_per_qty(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    g = li.groupBy(F.date_trunc("month", "l_shipdate").alias("m")).agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double").alias("a"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .cast("double").alias("b"),
    )
    t = g.agg(
        F.sum("a").alias("s1"), F.sum("b").alias("s2"),
        F.count("*").cast("bigint").alias("n"),
    )
    l = g.crossJoin(F.broadcast(t)).select(
        ((F.col("s1") - F.col("a")) / (F.col("s2") - F.col("b")))
        .alias("loo"),
        "s1", "s2", "n",
    )
    s = l.agg(F.avg("loo").alias("ml"))
    return l.crossJoin(F.broadcast(s)).agg(
        F.max("n").alias("n_groups"),
        F.round(F.max(F.col("s1") / F.col("s2")), 6).alias("ratio_full"),
        F.round(
            (F.max("n") - 1)
            * (F.avg("loo") - F.max(F.col("s1") / F.col("s2"))), 6
        ).alias("jk_bias"),
        F.round(
            F.sqrt(
                (F.max("n") - 1.0) / F.max("n")
                * F.sum((F.col("loo") - F.col("ml"))
                        * (F.col("loo") - F.col("ml")))
            ), 6
        ).alias("jk_se"),
    )


@register(
    "regr_funcs_gauntlet",
    """
    WITH m AS (
      SELECT (year(o_orderdate) - 1992) * 12 + month(o_orderdate) - 1
               AS x,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               / 1000000.0 AS y
      FROM orders GROUP BY 1)
    SELECT CAST(regr_count(y, x) AS BIGINT) AS n_months,
           round(regr_avgx(y, x), 6) AS avg_x,
           round(regr_avgy(y, x), 6) AS avg_y,
           round(regr_sxx(y, x), 4) AS sxx,
           round(regr_syy(y, x), 4) AS syy,
           round(regr_sxy(y, x), 4) AS sxy,
           round(regr_slope(y, x), 6) AS slope,
           round(regr_intercept(y, x), 6) AS intercept,
           round(regr_r2(y, x), 6) AS r2
    FROM m
    """,
    doc="The full ANSI linear-regression aggregate family "
        "(regr_count/avgx/avgy/sxx/syy/sxy/slope/intercept/r2) over "
        "monthly revenue vs month index — completing the surface "
        "price_elasticity_slope samples (slope/intercept/r2 only). "
        "The regression inputs are made bit-identical across engines "
        "first (exact DECIMAL month sums cast to double, scaled to "
        "millions), so the regr_* aggregates see the same ~84 doubles "
        "and rounding only has to absorb combine-order noise. One "
        "map-side-combinable aggregate over orders, then a 9-output "
        "aggregate over the bounded month spine.",
    tags=("statistics", "sql-surface"),
)
def regr_funcs_gauntlet(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    m = o.groupBy(
        ((F.year("o_orderdate") - 1992) * 12 + F.month("o_orderdate") - 1)
        .alias("x")
    ).agg(
        (F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
         .cast("double") / 1000000.0).alias("y")
    )
    return m.agg(
        F.expr("regr_count(y, x)").cast("bigint").alias("n_months"),
        F.round(F.expr("regr_avgx(y, x)"), 6).alias("avg_x"),
        F.round(F.expr("regr_avgy(y, x)"), 6).alias("avg_y"),
        F.round(F.expr("regr_sxx(y, x)"), 4).alias("sxx"),
        F.round(F.expr("regr_syy(y, x)"), 4).alias("syy"),
        F.round(F.expr("regr_sxy(y, x)"), 4).alias("sxy"),
        F.round(F.expr("regr_slope(y, x)"), 6).alias("slope"),
        F.round(F.expr("regr_intercept(y, x)"), 6).alias("intercept"),
        F.round(F.expr("regr_r2(y, x)"), 6).alias("r2"),
    )


@register(
    "decile_lift_user_spend",
    """
    WITH u AS (
      SELECT user_id,
             CAST(sum(CAST(coalesce(value, 0) AS DECIMAL(18,6)))
                  AS DOUBLE) AS score,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS buyer
      FROM events GROUP BY user_id),
    pv AS (
      SELECT score, CAST(count(*) AS BIGINT) AS t,
             CAST(sum(buyer) AS BIGINT) AS bs
      FROM u GROUP BY score),
    r AS (
      SELECT score, t, bs,
             coalesce(sum(t) OVER (ORDER BY score DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cg,
             sum(t) OVER () AS n
      FROM pv),
    d AS (
      SELECT CAST(least(10, CAST(floor(10.0 * cg / n) AS BIGINT) + 1)
                  AS BIGINT) AS decile,
             t, bs FROM r),
    o AS (SELECT sum(bs) * 1.0 / sum(t) AS orate FROM pv)
    SELECT decile,
           CAST(sum(t) AS BIGINT) AS n_users,
           CAST(sum(bs) AS BIGINT) AS buyers,
           round(sum(bs) * 1.0 / sum(t), 6) AS buy_rate,
           round((sum(bs) * 1.0 / sum(t)) / max(o.orate), 6) AS lift
    FROM d CROSS JOIN o GROUP BY decile ORDER BY decile
    """,
    doc="Decile lift / gains table: users ranked by total event value "
        "(exact DECIMAL sums, so the ranking key is bit-identical "
        "across engines), cut into value-boundary deciles from the "
        "top, and per decile the purchase rate and its lift over the "
        "base rate — the campaign-targeting readout next to "
        "roc_auc_rank_eval (AUC summarizes the ranking; the lift "
        "table says what acting on the top k/10 buys). Deciles ride "
        "the distributed midrank backbone (operators/ranks.py) over "
        "the per-value count table: a value group's decile is "
        "floor(10 * rows_above / n) via exact integers from the "
        "cumulative brackets — NO global ntile/row_number window "
        "(ties share one decile, so bucket sizes flex around n/10; "
        "value-boundary semantics, deterministic in both engines).",
    tags=("analytics", "capability"),
)
def decile_lift_user_spend(spark, sf_dir):
    from miniodb_spark.operators.ranks import doubled_midranks

    ev = load(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.sum(F.coalesce(F.col("value"), F.lit(0)).cast("decimal(18,6)"))
        .cast("double").alias("score"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .alias("buyer"),
    )
    pv = u.groupBy("score").agg(
        F.count("*").cast("bigint").alias("t"),
        F.sum("buyer").cast("bigint").alias("bs"),
    )
    mr = doubled_midranks(pv, "score")
    tot = pv.agg(
        F.sum("t").cast("bigint").alias("n"),
        (F.sum("bs") * 1.0 / F.sum("t")).alias("orate"),
    )
    j = mr.crossJoin(F.broadcast(tot))
    cum_less = ((F.col("mr2") - F.col("t") - 1) / 2).cast("bigint")
    cg = F.col("n") - (cum_less + F.col("t"))  # rows strictly above
    d = j.select(
        F.least(
            F.lit(10),
            F.floor(F.lit(10.0) * cg / F.col("n")) + 1,
        ).cast("bigint").alias("decile"),
        "t", "bs", "orate",
    )
    return (
        d.groupBy("decile")
        .agg(
            F.sum("t").cast("bigint").alias("n_users"),
            F.sum("bs").cast("bigint").alias("buyers"),
            F.round(F.sum("bs") * 1.0 / F.sum("t"), 6).alias("buy_rate"),
            F.round(
                (F.sum("bs") * 1.0 / F.sum("t")) / F.max("orate"), 6
            ).alias("lift"),
        )
        .orderBy("decile")
    )


@register(
    "time_weighted_user_value",
    """
    WITH s AS (
      SELECT user_id, event_type, value,
             least(coalesce(
               date_diff('second', ts,
                 lead(ts) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id)), 0), 1800) AS w
      FROM events)
    SELECT event_type,
           CAST(count(CASE WHEN w > 0 THEN 1 END) AS BIGINT)
             AS n_intervals,
           CAST(sum(w) AS BIGINT) AS total_weight_s,
           round(sum(value * w) / sum(w), 6) AS tw_mean,
           round(avg(value), 6) AS plain_mean
    FROM s GROUP BY event_type ORDER BY event_type
    """,
    doc="Time-weighted mean event value per type: each event's value "
        "holds until the user's next event (capped at the 30-min "
        "session horizon, same constant as sessionize_30min), so "
        "values that stayed current longer weigh more — the TWAP-"
        "style correction for irregular sampling that a plain avg "
        "gets wrong (both reported side by side). Weights are exact "
        "integer seconds from a USER-partitioned lead (the "
        "interarrival_gap_stats shape — never a global sequence "
        "window); one grouped aggregate after it. date_diff and "
        "unix_timestamp truncate identically; the weighted mean's "
        "float ratio rounds at 6.",
    tags=("analytics",),
)
def time_weighted_user_value(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    w_next = W.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "event_type", "value",
        F.least(
            F.coalesce(
                F.unix_timestamp(F.lead("ts").over(w_next))
                - F.unix_timestamp("ts"),
                F.lit(0),
            ),
            F.lit(1800),
        ).alias("w"),
    )
    return (
        s.groupBy("event_type")
        .agg(
            F.count(F.when(F.col("w") > 0, 1)).cast("bigint")
            .alias("n_intervals"),
            F.sum("w").cast("bigint").alias("total_weight_s"),
            F.round(F.sum(F.col("value") * F.col("w")) / F.sum("w"), 6)
            .alias("tw_mean"),
            F.round(F.avg("value"), 6).alias("plain_mean"),
        )
        .orderBy("event_type")
    )


@register(
    "growth_accounting_daily",
    """
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
    cl AS (
      SELECT d,
             CASE WHEN lag(d) OVER (PARTITION BY user_id ORDER BY d)
                    IS NULL THEN 'new'
                  WHEN lag(d) OVER (PARTITION BY user_id ORDER BY d)
                    = d - INTERVAL 1 DAY THEN 'retained'
                  ELSE 'resurrected' END AS kind
      FROM ud),
    day AS (
      SELECT d,
             CAST(count(*) AS BIGINT) AS dau,
             CAST(sum(CASE WHEN kind = 'new' THEN 1 ELSE 0 END)
                  AS BIGINT) AS new_users,
             CAST(sum(CASE WHEN kind = 'retained' THEN 1 ELSE 0 END)
                  AS BIGINT) AS retained,
             CAST(sum(CASE WHEN kind = 'resurrected' THEN 1 ELSE 0 END)
                  AS BIGINT) AS resurrected
      FROM cl GROUP BY d)
    SELECT CAST(d AS VARCHAR) AS day, dau, new_users, retained,
           resurrected,
           CAST(coalesce(lag(dau) OVER (ORDER BY d), 0) - retained
                AS BIGINT) AS churned
    FROM day ORDER BY day
    """,
    doc="Daily growth accounting (the Social-Capital MAU framework at "
        "day grain): every active user-day is exactly one of new / "
        "retained (active yesterday) / resurrected (active before, "
        "gap > 1 day), and churned(d) = DAU(d-1) - retained(d) closes "
        "the identity DAU(d) = DAU(d-1) + new + resurrected - churned. "
        "Classification is a USER-partitioned lag over distinct "
        "user-days; the only date-ordered window runs on the bounded "
        "day spine (calendar-bounded, the kaplan_meier day-table "
        "pattern). Exact integers end to end; dates stringified for "
        "the comparator.",
    tags=("analytics",),
)
def growth_accounting_daily(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    ud = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    w_u = W.partitionBy("user_id").orderBy("d")
    cl = ud.select(
        "d",
        F.when(F.lag("d").over(w_u).isNull(), "new")
        .when(F.lag("d").over(w_u) == F.date_sub(F.col("d"), 1),
              "retained")
        .otherwise("resurrected").alias("kind"),
    )
    day = cl.groupBy("d").agg(
        F.count("*").cast("bigint").alias("dau"),
        F.sum(F.when(F.col("kind") == "new", 1).otherwise(0))
        .cast("bigint").alias("new_users"),
        F.sum(F.when(F.col("kind") == "retained", 1).otherwise(0))
        .cast("bigint").alias("retained"),
        F.sum(F.when(F.col("kind") == "resurrected", 1).otherwise(0))
        .cast("bigint").alias("resurrected"),
    )
    w_d = W.orderBy("d")  # bounded day spine (calendar, not data)
    return day.select(
        F.col("d").cast("string").alias("day"),
        "dau", "new_users", "retained", "resurrected",
        (F.coalesce(F.lag("dau").over(w_d), F.lit(0)) - F.col("retained"))
        .cast("bigint").alias("churned"),
    ).orderBy("day")


@register(
    "simpson_diversity_sources",
    """
    WITH c AS (
      SELECT lang, source, CAST(count(*) AS BIGINT) AS n
      FROM documents GROUP BY lang, source),
    sh AS (
      SELECT lang, n,
             n * 1.0 / sum(n) OVER (PARTITION BY lang) AS p
      FROM c),
    l AS (
      SELECT lang, sum(n) AS tot, count(*) AS k,
             sum(p * p) AS simpson
      FROM sh GROUP BY lang)
    SELECT lang, CAST(tot AS BIGINT) AS n_docs,
           CAST(k AS BIGINT) AS k_sources,
           round(simpson, 6) AS simpson_index,
           round(1.0 / simpson, 6) AS effective_sources
    FROM l ORDER BY lang
    """,
    doc="Simpson diversity of the source mix per language: sum p_i^2 "
        "over source shares and its inverse — the 'effective number "
        "of sources' (k iff perfectly balanced), the concentration "
        "companion to the entropy-based mixing entries and the same "
        "index HHI uses for revenue (hhi_revenue_concentration). A "
        "skewed source mix inside one language is a training-data "
        "bias the per-source counts alone hide. One grouped count "
        "collapses facts to the (lang, source) table; shares via a "
        "lang-partitioned window over that tiny table.",
    tags=("llm", "analytics"),
)
def simpson_diversity_sources(spark, sf_dir):
    docs = fixture_df(spark, sf_dir, "documents")
    c = docs.groupBy("lang", "source").agg(
        F.count("*").cast("bigint").alias("n"))
    w_l = W.partitionBy("lang")
    p = F.col("n") * 1.0 / F.sum("n").over(w_l)
    l = c.select("lang", "n", (p * p).alias("p2")).groupBy("lang").agg(
        F.sum("n").cast("bigint").alias("n_docs"),
        F.count("*").cast("bigint").alias("k_sources"),
        F.sum("p2").alias("simpson"),
    )
    return l.select(
        "lang", "n_docs", "k_sources",
        F.round("simpson", 6).alias("simpson_index"),
        F.round(1.0 / F.col("simpson"), 6).alias("effective_sources"),
    ).orderBy("lang")


@register(
    "filter_waterfall_card",
    """
    WITH w AS (
      SELECT list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS ws
      FROM documents),
    g AS (
      SELECT CAST(len(ws) AS BIGINT) AS n_tok,
             CASE WHEN len(ws) = 0 THEN 0.0
                  ELSE list_sum(list_transform(ws, x -> len(x))) * 1.0
                       / len(ws) END AS mwl
      FROM w),
    f AS (
      SELECT count(*) AS s0,
             sum(CASE WHEN n_tok >= 30 THEN 1 ELSE 0 END) AS s1,
             sum(CASE WHEN n_tok >= 30 AND n_tok <= 10000
                      THEN 1 ELSE 0 END) AS s2,
             sum(CASE WHEN n_tok >= 30 AND n_tok <= 10000
                      AND mwl >= 3.0 AND mwl <= 10.0
                      THEN 1 ELSE 0 END) AS s3
      FROM g)
    SELECT u.stage, u.label,
           CAST(u.surviving AS BIGINT) AS surviving,
           CAST(u.prev - u.surviving AS BIGINT) AS dropped_here,
           round(u.surviving * 100.0 / u.corpus, 4) AS pct_of_corpus
    FROM (
      SELECT 0 AS stage, 'corpus' AS label, s0 AS surviving,
             s0 AS prev, s0 AS corpus FROM f
      UNION ALL SELECT 1, 'min_length_30', s1, s0, s0 FROM f
      UNION ALL SELECT 2, 'max_length_10k', s2, s1, s0 FROM f
      UNION ALL SELECT 3, 'mean_word_len_3_10', s3, s2, s0 FROM f
    ) u ORDER BY u.stage
    """,
    doc="Filter-waterfall card: how many documents survive each "
        "successive quality gate (min length -> max length -> mean-"
        "word-length plausibility band, the Gopher rules C4/Gopher "
        "apply in sequence) and where the corpus is lost — the "
        "one-page readout every cleaning pipeline publishes before "
        "training (complement of gopher_quality_filter, which scores "
        "docs; this accounts the CUMULATIVE drop per rule). One map "
        "pass computes all gate signals, ONE 1-row conditional "
        "aggregate holds every stage, and the 4-stage card is an "
        "inline union over that row — facts are read once.",
    tags=("llm", "capability"),
)
def filter_waterfall_card(spark, sf_dir):
    docs = fixture_df(spark, sf_dir, "documents")
    ws = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda x: x != ""
    )
    n_tok = F.size(ws).cast("bigint")
    mwl = F.when(F.size(ws) == 0, F.lit(0.0)).otherwise(
        F.aggregate(ws, F.lit(0).cast("bigint"),
                    lambda acc, x: acc + F.length(x)) * 1.0 / F.size(ws)
    )
    g = docs.select(n_tok.alias("n_tok"), mwl.alias("mwl"))
    pass1 = F.col("n_tok") >= 30
    pass2 = pass1 & (F.col("n_tok") <= 10000)
    pass3 = pass2 & (F.col("mwl") >= 3.0) & (F.col("mwl") <= 10.0)
    f = g.agg(
        F.count("*").alias("s0"),
        F.sum(F.when(pass1, 1).otherwise(0)).alias("s1"),
        F.sum(F.when(pass2, 1).otherwise(0)).alias("s2"),
        F.sum(F.when(pass3, 1).otherwise(0)).alias("s3"),
    )
    stages = f.selectExpr(
        "stack(4, "
        "0L, 'corpus', s0, s0, "
        "1L, 'min_length_30', s1, s0, "
        "2L, 'max_length_10k', s2, s1, "
        "3L, 'mean_word_len_3_10', s3, s2) "
        "AS (stage, label, surviving, prev)",
        "s0 AS corpus",
    )
    return stages.select(
        "stage", "label",
        F.col("surviving").cast("bigint").alias("surviving"),
        (F.col("prev") - F.col("surviving")).cast("bigint")
        .alias("dropped_here"),
        F.round(F.col("surviving") * 100.0 / F.col("corpus"), 4)
        .alias("pct_of_corpus"),
    ).orderBy("stage")


@register(
    "pivot_multi_agg_status",
    """
    SELECT o_orderpriority,
           CAST(count(CASE WHEN o_orderstatus = 'F' THEN 1 END)
                AS BIGINT) AS f_n,
           round(CAST(sum(CASE WHEN o_orderstatus = 'F'
                     THEN CAST(o_totalprice AS DECIMAL(18,2)) END)
                 AS DOUBLE) / 1000000.0, 4) AS f_rev_m,
           CAST(count(CASE WHEN o_orderstatus = 'O' THEN 1 END)
                AS BIGINT) AS o_n,
           round(CAST(sum(CASE WHEN o_orderstatus = 'O'
                     THEN CAST(o_totalprice AS DECIMAL(18,2)) END)
                 AS DOUBLE) / 1000000.0, 4) AS o_rev_m,
           CAST(count(CASE WHEN o_orderstatus = 'P' THEN 1 END)
                AS BIGINT) AS p_n,
           round(CAST(sum(CASE WHEN o_orderstatus = 'P'
                     THEN CAST(o_totalprice AS DECIMAL(18,2)) END)
                 AS DOUBLE) / 1000000.0, 4) AS p_rev_m
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    doc="Multi-measure pivot: order COUNT and revenue (exact decimal "
        "sums, scaled to millions) side by side per pivoted status "
        "column — pivot_status_by_priority pivots one measure; real "
        "dashboards want several, and Spark's pivot().agg(m1, m2) "
        "names columns <value>_<alias>, which this entry normalizes "
        "to a stable schema. Explicit pivot VALUES ('F','O','P') keep "
        "the plan a single aggregate (no distinct-values pre-pass); "
        "one shuffle, map-side combined.",
    tags=("sql-surface",),
)
def pivot_multi_agg_status(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                .cast("double") / 1000000.0, 4
            ).alias("rev_m"),
        )
    )
    # Spark's pivot yields NULL for an empty (priority,status) cell
    # while SQL count(CASE ...) yields 0 — coalesce the count columns
    # to 0 so an absent status at a small SF can't diverge. Revenue
    # NULLs already match (SQL sum of an empty set is NULL).
    return piv.select(
        "o_orderpriority",
        F.coalesce(F.col("F_n"), F.lit(0)).cast("bigint").alias("f_n"),
        F.col("F_rev_m").alias("f_rev_m"),
        F.coalesce(F.col("O_n"), F.lit(0)).cast("bigint").alias("o_n"),
        F.col("O_rev_m").alias("o_rev_m"),
        F.coalesce(F.col("P_n"), F.lit(0)).cast("bigint").alias("p_n"),
        F.col("P_rev_m").alias("p_rev_m"),
    ).orderBy("o_orderpriority")


@register(
    "window_nth_value_events",
    """
    SELECT DISTINCT user_id,
           CAST(count(*) OVER w AS BIGINT) AS n_events,
           round(nth_value(value, 3) OVER w, 6) AS third_value,
           round(first_value(value) OVER w, 6) AS first_val,
           round(last_value(value) OVER w, 6) AS last_val
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING
                 AND UNBOUNDED FOLLOWING)
    ORDER BY user_id
    """,
    doc="nth_value window function (the last ranking-family member "
        "the registry lacked) next to first/last over the SAME named "
        "full-partition frame: per user, the 3rd event's value in "
        "(ts, event_id) total order — NULL for users with fewer than "
        "3 events, which pins the no-default-frame trap (the default "
        "RANGE frame would make nth_value grow with the current row; "
        "the explicit unbounded frame makes it a per-user constant, "
        "so DISTINCT collapses to one row per user). User-partitioned "
        "window, never global.",
    tags=("sql-surface",),
)
def window_nth_value_events(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return (
        ev.select(
            "user_id",
            F.count("*").over(w).cast("bigint").alias("n_events"),
            F.round(F.nth_value("value", 3).over(w), 6)
            .alias("third_value"),
            F.round(F.first("value").over(w), 6).alias("first_val"),
            F.round(F.last("value").over(w), 6).alias("last_val"),
        )
        .distinct()
        .orderBy("user_id")
    )


@register(
    "tokenizer_oov_rate",
    """
    WITH tr AS (
      SELECT unnest(list_filter(string_split_regex(lower(text),
                    '[^a-z0-9]+'), x -> x <> '')) AS w
      FROM documents WHERE doc_id % 2 = 0),
    te AS (
      SELECT unnest(list_filter(string_split_regex(lower(text),
                    '[^a-z0-9]+'), x -> x <> '')) AS w
      FROM documents WHERE doc_id % 2 = 1),
    v AS (
      SELECT w FROM (SELECT w, count(*) AS n FROM tr GROUP BY w)
      ORDER BY n DESC, w LIMIT 1000),
    tec AS (SELECT w, CAST(count(*) AS BIGINT) AS n FROM te GROUP BY w),
    j AS (
      SELECT tec.n, CASE WHEN v.w IS NULL THEN 1 ELSE 0 END AS oov
      FROM tec LEFT JOIN v ON tec.w = v.w),
    trn AS (SELECT CAST(count(*) AS BIGINT) AS train_tokens FROM tr)
    SELECT CAST((SELECT count(*) FROM v) AS BIGINT) AS vocab_size,
           max(trn.train_tokens) AS train_tokens,
           CAST(sum(j.n) AS BIGINT) AS test_tokens,
           CAST(sum(CASE WHEN j.oov = 1 THEN j.n ELSE 0 END) AS BIGINT)
             AS oov_tokens,
           round(sum(CASE WHEN j.oov = 1 THEN j.n ELSE 0 END) * 1.0
                 / sum(j.n), 6) AS oov_token_rate,
           CAST(sum(j.oov) AS BIGINT) AS oov_types,
           round(sum(j.oov) * 1.0 / count(*), 6) AS oov_type_rate
    FROM j CROSS JOIN trn
    """,
    doc="Out-of-vocabulary rate of a word tokenizer: vocabulary = top-"
        "1000 words of the train half (doc parity split; (count, word) "
        "total order so both engines pick identical vocabularies), "
        "scored on the held-out half at token AND type granularity — "
        "the number that says what a fixed word vocab misses and why "
        "subword tokenizers (bpe_train_merges) exist; companion to "
        "vocab_coverage_curve (in-corpus coverage) and "
        "tokenizer_fertility_audit (subword cost). Scale: the vocab "
        "shortlist is TakeOrderedAndProject over the train word "
        "counts; the OOV join probes the 1000-row broadcast vocab "
        "from the per-word test counts — facts shuffle once per half "
        "for their word counts, nothing else.",
    tags=("llm", "capability"),
)
def tokenizer_oov_rate(spark, sf_dir):
    docs = fixture_df(spark, sf_dir, "documents")
    words = lambda df: df.select(
        F.explode(
            F.filter(F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
                     lambda x: x != "")
        ).alias("w")
    )
    tr = words(docs.filter(F.col("doc_id") % 2 == 0))
    te = words(docs.filter(F.col("doc_id") % 2 == 1))
    v = (
        tr.groupBy("w").agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "w").limit(1000)
        .select("w", F.lit(1).alias("in_vocab"))
    )
    tec = te.groupBy("w").agg(F.count("*").cast("bigint").alias("n"))
    j = tec.join(F.broadcast(v), "w", "left").select(
        "n", F.when(F.col("in_vocab").isNull(), 1).otherwise(0).alias("oov")
    )
    vs = v.agg(F.count("*").cast("bigint").alias("vocab_size"))
    trn = tr.agg(F.count("*").cast("bigint").alias("train_tokens"))
    oov_n = F.sum(F.when(F.col("oov") == 1, F.col("n")).otherwise(0))
    return (
        j.crossJoin(F.broadcast(vs)).crossJoin(F.broadcast(trn))
        .agg(
            F.max("vocab_size").alias("vocab_size"),
            F.max("train_tokens").alias("train_tokens"),
            F.sum("n").cast("bigint").alias("test_tokens"),
            oov_n.cast("bigint").alias("oov_tokens"),
            F.round(oov_n * 1.0 / F.sum("n"), 6).alias("oov_token_rate"),
            F.sum("oov").cast("bigint").alias("oov_types"),
            F.round(F.sum("oov") * 1.0 / F.count("*"), 6)
            .alias("oov_type_rate"),
        )
    )


@register(
    "hashed_feature_collision_rate",
    """
    WITH w AS (
      SELECT DISTINCT unnest(list_filter(string_split_regex(lower(text),
                      '[^a-z0-9]+'), x -> x <> '')) AS w
      FROM documents),
    b AS (
      SELECT CAST(('0x' || substring(md5(w), 1, 8)) AS BIGINT) % 4096
               AS bucket
      FROM w),
    l AS (SELECT bucket, CAST(count(*) AS BIGINT) AS load FROM b
          GROUP BY bucket)
    SELECT CAST(sum(load) AS BIGINT) AS n_words,
           CAST(count(*) AS BIGINT) AS buckets_used,
           CAST(4096 AS BIGINT) AS n_buckets,
           round(1.0 - count(*) * 1.0 / sum(load), 6)
             AS collision_rate,
           CAST(max(load) AS BIGINT) AS max_bucket_load,
           round(sum(load) * 1.0 / count(*), 4) AS mean_used_load
    FROM l
    """,
    doc="Feature-hashing (hashing-trick) collision audit: the corpus "
        "vocabulary hashed into 4096 buckets via the first 32 md5 "
        "bits (md5 so both engines bucket identically — Spark "
        "xxhash64 and DuckDB hash() disagree), reporting the realized "
        "collision rate and worst bucket load — the check run before "
        "shipping a hashed bag-of-words featurizer, since collisions "
        "silently merge features. Distinct-word table is vocabulary-"
        "bounded; bucketing is a map-side expression; one 4096-group "
        "aggregate.",
    tags=("llm", "capability"),
)
def hashed_feature_collision_rate(spark, sf_dir):
    docs = fixture_df(spark, sf_dir, "documents")
    w = docs.select(
        F.explode(
            F.filter(F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
                     lambda x: x != "")
        ).alias("w")
    ).distinct()
    b = w.select(
        (F.conv(F.substring(F.md5("w"), 1, 8), 16, 10).cast("bigint")
         % 4096).alias("bucket")
    )
    l = b.groupBy("bucket").agg(F.count("*").cast("bigint").alias("load"))
    return l.agg(
        F.sum("load").cast("bigint").alias("n_words"),
        F.count("*").cast("bigint").alias("buckets_used"),
        F.lit(4096).cast("bigint").alias("n_buckets"),
        F.round(1.0 - F.count("*") * 1.0 / F.sum("load"), 6)
        .alias("collision_rate"),
        F.max("load").cast("bigint").alias("max_bucket_load"),
        F.round(F.sum("load") * 1.0 / F.count("*"), 4)
        .alias("mean_used_load"),
    )


@register(
    "nonascii_fraction_by_lang",
    """
    WITH d AS (
      SELECT lang,
             octet_length(encode(text)) AS bytes,
             length(regexp_replace(text, '[^\\x00-\\x7F]', '', 'g'))
               AS ascii_chars
      FROM documents WHERE text IS NOT NULL AND text <> '')
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(1.0 - ascii_chars * 1.0 / bytes), 6)
             AS avg_nonascii_byte_frac,
           round(max(1.0 - ascii_chars * 1.0 / bytes), 6)
             AS max_nonascii_byte_frac,
           CAST(count(CASE WHEN ascii_chars * 2 < bytes THEN 1 END)
                AS BIGINT) AS n_majority_nonascii
    FROM d GROUP BY lang ORDER BY lang
    """,
    doc="Non-ASCII byte fraction per declared language: UTF-8 bytes "
        "minus ASCII characters (an ASCII char is exactly one byte, "
        "so the fraction needs no codepoint-width agreement between "
        "engines — Spark length() counts UTF-16 units, DuckDB "
        "codepoints, but both count ASCII identically and "
        "octet_length is bytes in both). The sanity check behind "
        "lang_id_heuristic: a 'zh' corpus that is 95% ASCII bytes is "
        "mislabeled or transliterated, and an 'en' doc that is "
        "majority non-ASCII is mojibake — both poison training mixes "
        "silently. One map pass, one lang-grouped aggregate.",
    tags=("llm", "capability"),
)
def nonascii_fraction_by_lang(spark, sf_dir):
    docs = fixture_df(spark, sf_dir, "documents")
    d = docs.filter(
        F.col("text").isNotNull() & (F.col("text") != "")
    ).select(
        "lang",
        F.octet_length("text").alias("bytes"),
        F.length(F.regexp_replace("text", "[^\\x00-\\x7F]", ""))
        .alias("ascii_chars"),
    )
    frac = 1.0 - F.col("ascii_chars") * 1.0 / F.col("bytes")
    return (
        d.groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.round(F.avg(frac), 6).alias("avg_nonascii_byte_frac"),
            F.round(F.max(frac), 6).alias("max_nonascii_byte_frac"),
            F.count(F.when(F.col("ascii_chars") * 2 < F.col("bytes"), 1))
            .cast("bigint").alias("n_majority_nonascii"),
        )
        .orderBy("lang")
    )


@register(
    "chow_test_break",
    """
    WITH day AS (
      SELECT date_diff('day', DATE '1992-01-01', o_orderdate) AS x,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               / 1000000.0 AS y,
             CASE WHEN o_orderdate < DATE '1995-07-01'
                  THEN 0 ELSE 1 END AS seg
      FROM orders GROUP BY o_orderdate),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN seg = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n1,
             CAST(sum(CASE WHEN seg = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n2,
             sum(x * 1.0) AS sx, sum(y) AS sy,
             sum(x * 1.0 * x) AS sxx, sum(x * y) AS sxy,
             sum(y * y) AS syy,
             sum(CASE WHEN seg = 0 THEN x * 1.0 ELSE 0 END) AS sx1,
             sum(CASE WHEN seg = 0 THEN y ELSE 0 END) AS sy1,
             sum(CASE WHEN seg = 0 THEN x * 1.0 * x ELSE 0 END) AS sxx1,
             sum(CASE WHEN seg = 0 THEN x * y ELSE 0 END) AS sxy1,
             sum(CASE WHEN seg = 0 THEN y * y ELSE 0 END) AS syy1,
             sum(CASE WHEN seg = 1 THEN x * 1.0 ELSE 0 END) AS sx2,
             sum(CASE WHEN seg = 1 THEN y ELSE 0 END) AS sy2,
             sum(CASE WHEN seg = 1 THEN x * 1.0 * x ELSE 0 END) AS sxx2,
             sum(CASE WHEN seg = 1 THEN x * y ELSE 0 END) AS sxy2,
             sum(CASE WHEN seg = 1 THEN y * y ELSE 0 END) AS syy2
      FROM day),
    r AS (
      SELECT n, n1, n2,
             (syy - sy * sy / n)
               - (sxy - sx * sy / n) * (sxy - sx * sy / n)
                 / (sxx - sx * sx / n) AS ssr_p,
             (syy1 - sy1 * sy1 / n1)
               - (sxy1 - sx1 * sy1 / n1) * (sxy1 - sx1 * sy1 / n1)
                 / (sxx1 - sx1 * sx1 / n1) AS ssr_1,
             (syy2 - sy2 * sy2 / n2)
               - (sxy2 - sx2 * sy2 / n2) * (sxy2 - sx2 * sy2 / n2)
                 / (sxx2 - sx2 * sx2 / n2) AS ssr_2
      FROM s)
    SELECT n AS n_days, n1 AS n_pre, n2 AS n_post,
           round(ssr_p, 4) AS ssr_pooled,
           round(ssr_1 + ssr_2, 4) AS ssr_split,
           round(((ssr_p - ssr_1 - ssr_2) / 2)
                 / ((ssr_1 + ssr_2) / (n - 4)), 4) AS chow_f
    FROM r
    """,
    doc="Chow test for a structural break in the daily-revenue trend "
        "at 1995-07-01: fit y = a + b*x pooled and per segment, "
        "F = ((SSR_p - SSR_1 - SSR_2)/k) / ((SSR_1 + SSR_2)/(n - 2k)) "
        "with k = 2 — the regression-based complement of "
        "cusum_changepoint (CUSUM locates a level shift; Chow tests a "
        "chosen break in slope AND level). All three fits come from "
        "ONE conditional aggregate of raw power sums over the bounded "
        "day spine (segment sums via CASE, pooled = their totals); "
        "daily y is an exact-decimal sum scaled to millions, so both "
        "engines regress identical inputs. Facts are read once.",
    tags=("statistics",),
)
def chow_test_break(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    day = o.groupBy("o_orderdate").agg(
        (F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
         .cast("double") / 1000000.0).alias("y")
    ).select(
        F.datediff("o_orderdate", F.lit("1992-01-01").cast("date"))
        .cast("double").alias("x"),
        "y",
        F.when(F.col("o_orderdate") < F.lit("1995-07-01").cast("date"), 0)
        .otherwise(1).alias("seg"),
    )
    def seg_sums(i):
        c = F.col("seg") == i
        return [
            F.sum(F.when(c, F.col("x")).otherwise(0.0)).alias(f"sx{i+1}"),
            F.sum(F.when(c, F.col("y")).otherwise(0.0)).alias(f"sy{i+1}"),
            F.sum(F.when(c, F.col("x") * F.col("x")).otherwise(0.0))
            .alias(f"sxx{i+1}"),
            F.sum(F.when(c, F.col("x") * F.col("y")).otherwise(0.0))
            .alias(f"sxy{i+1}"),
            F.sum(F.when(c, F.col("y") * F.col("y")).otherwise(0.0))
            .alias(f"syy{i+1}"),
        ]
    s = day.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.when(F.col("seg") == 0, 1).otherwise(0)).cast("bigint")
        .alias("n1"),
        F.sum(F.when(F.col("seg") == 1, 1).otherwise(0)).cast("bigint")
        .alias("n2"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        *seg_sums(0), *seg_sums(1),
    )
    def ssr(sx, sy, sxx, sxy, syy, n):
        Sxx = F.col(sxx) - F.col(sx) * F.col(sx) / F.col(n)
        Sxy = F.col(sxy) - F.col(sx) * F.col(sy) / F.col(n)
        Syy = F.col(syy) - F.col(sy) * F.col(sy) / F.col(n)
        return Syy - Sxy * Sxy / Sxx
    r = s.select(
        "n", "n1", "n2",
        ssr("sx", "sy", "sxx", "sxy", "syy", "n").alias("ssr_p"),
        ssr("sx1", "sy1", "sxx1", "sxy1", "syy1", "n1").alias("ssr_1"),
        ssr("sx2", "sy2", "sxx2", "sxy2", "syy2", "n2").alias("ssr_2"),
    )
    return r.select(
        F.col("n").alias("n_days"),
        F.col("n1").alias("n_pre"),
        F.col("n2").alias("n_post"),
        F.round("ssr_p", 4).alias("ssr_pooled"),
        F.round(F.col("ssr_1") + F.col("ssr_2"), 4).alias("ssr_split"),
        F.round(
            ((F.col("ssr_p") - F.col("ssr_1") - F.col("ssr_2")) / 2)
            / ((F.col("ssr_1") + F.col("ssr_2")) / (F.col("n") - 4)), 4
        ).alias("chow_f"),
    )


@register(
    "asof_join_forward",
    """
    WITH clicks AS (
      SELECT user_id, ts, event_id FROM events
      WHERE event_type = 'click'),
    purchases AS (
      SELECT user_id, ts, value FROM events
      WHERE event_type = 'purchase')
    SELECT c.event_id, c.user_id,
           round(p.value, 6) AS next_purchase_value
    FROM clicks c
    ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND c.ts <= p.ts
    ORDER BY c.event_id
    """,
    doc="FORWARD as-of join: each click matched to the user's NEXT "
        "purchase at-or-after it — the mirror of asof_join_events "
        "(backward) and the second direction pandas merge_asof ships; "
        "attribution pipelines need both (touch -> next conversion "
        "here, conversion -> last touch there). DuckDB expresses it "
        "natively (ASOF LEFT JOIN with ts <= ts); Spark has no asof "
        "operator, so the plan is the union trick reversed: tag both "
        "streams, one USER-partitioned window ordered by "
        "(ts ASC, is_click DESC) takes first(purchase value, "
        "ignorenulls) over the [currentRow, following] frame — one "
        "shuffle, no UDF, no range self-join. Ties (click and purchase "
        "at the same ts) match, per the <= contract: the click sorts "
        "first at equal ts so the same-ts purchase is in its frame.",
    tags=("sql-surface", "capability"),
)
def asof_join_forward(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id",
        F.lit(None).cast("double").alias("pval"),
        F.lit(1).alias("is_click"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts",
        F.lit(None).cast("long").alias("event_id"),
        F.col("value").alias("pval"),
        F.lit(0).alias("is_click"),
    )
    u = clicks.unionByName(purchases)
    # ordered by (ts, is_click DESC): at equal ts the click row (1)
    # sorts BEFORE the purchase row (0), so a same-ts purchase falls
    # INSIDE the click's [currentRow, following] frame — the <= tie
    # contract (DuckDB's ASOF c.ts <= p.ts matches the same-ts
    # purchase). first(ignorenulls) over the frame starting at the
    # current row then finds the next value at-or-after the click.
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("is_click").desc())
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    return (
        u.withColumn(
            "next_purchase_value",
            F.first("pval", ignorenulls=True).over(w),
        )
        .filter(F.col("is_click") == 1)
        .select(
            "event_id", "user_id",
            F.round("next_purchase_value", 6).alias("next_purchase_value"),
        )
        .orderBy("event_id")
    )


@register(
    "split_leakage_exact",
    """
    WITH d AS (
      SELECT doc_id, md5(text) AS h,
             CASE WHEN doc_id % 2 = 0 THEN 'train' ELSE 'test' END
               AS split
      FROM documents),
    h AS (
      SELECT h,
             sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS n_tr,
             sum(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS n_te
      FROM d GROUP BY h),
    t AS (
      SELECT CAST(sum(n_tr) AS BIGINT) AS train_docs,
             CAST(sum(n_te) AS BIGINT) AS test_docs,
             CAST(sum(CASE WHEN n_tr > 0 AND n_te > 0 THEN n_te
                           ELSE 0 END) AS BIGINT) AS leaked_test_docs,
             CAST(sum(CASE WHEN n_tr > 0 AND n_te > 0 THEN 1
                           ELSE 0 END) AS BIGINT) AS leaked_groups
      FROM h)
    SELECT train_docs, test_docs, leaked_test_docs, leaked_groups,
           round(leaked_test_docs * 1.0 / test_docs, 6) AS leakage_rate
    FROM t
    """,
    doc="Train/test split leakage (exact): test documents whose "
        "verbatim text (md5) also appears in the train half of the "
        "parity split — the eval-hygiene number benchmark papers "
        "report before trusting held-out metrics (verbatim leakage "
        "inflates them; benchmark_contamination covers the fuzzier "
        "n-gram case against an external probe set, this is the "
        "in-corpus exact case). One groupBy on the 16-byte md5 "
        "fingerprint with split-conditional counts — the "
        "dedup_exact_groups shuffle shape, text bytes never shuffle.",
    tags=("llm", "capability"),
)
def split_leakage_exact(spark, sf_dir):
    docs = fixture_df(spark, sf_dir, "documents")
    d = docs.select(
        F.md5("text").alias("h"),
        F.when(F.col("doc_id") % 2 == 0, "train").otherwise("test")
        .alias("split"),
    )
    h = d.groupBy("h").agg(
        F.sum(F.when(F.col("split") == "train", 1).otherwise(0))
        .alias("n_tr"),
        F.sum(F.when(F.col("split") == "test", 1).otherwise(0))
        .alias("n_te"),
    )
    leak = F.col("n_tr") > 0
    both = leak & (F.col("n_te") > 0)
    t = h.agg(
        F.sum("n_tr").cast("bigint").alias("train_docs"),
        F.sum("n_te").cast("bigint").alias("test_docs"),
        F.sum(F.when(both, F.col("n_te")).otherwise(0)).cast("bigint")
        .alias("leaked_test_docs"),
        F.sum(F.when(both, 1).otherwise(0)).cast("bigint")
        .alias("leaked_groups"),
    )
    return t.select(
        "train_docs", "test_docs", "leaked_test_docs", "leaked_groups",
        F.round(F.col("leaked_test_docs") * 1.0 / F.col("test_docs"), 6)
        .alias("leakage_rate"),
    )


@register(
    "near_dup_threshold_sensitivity",
    """
    WITH toks0 AS (
      SELECT doc_id,
             unnest(list_distinct(string_split(lower(text), ' '))) AS w
      FROM documents WHERE doc_id < 200),
    dfq AS (SELECT w, count(*) AS c FROM toks0 GROUP BY w),
    toks AS (SELECT t.doc_id, t.w FROM toks0 t JOIN dfq USING (w)
             WHERE c <= 60),
    sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
      FROM toks a JOIN toks b ON a.w = b.w AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    j AS (
      SELECT CAST(common AS DOUBLE) / (sa.sz + sb.sz - common) AS jac
      FROM pairs
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b)
    SELECT t.thr,
           CAST(count(CASE WHEN j.jac >= t.thr THEN 1 END) AS BIGINT)
             AS n_pairs
    FROM j CROSS JOIN (
      SELECT unnest(CAST([0.3, 0.5, 0.7, 0.9] AS DOUBLE[])) AS thr) t
    GROUP BY t.thr ORDER BY t.thr
    """,
    doc="Dedup threshold sensitivity: how many near-dup pairs survive "
        "at Jaccard >= 0.3/0.5/0.7/0.9 — the curve that picks the "
        "production threshold (too low merges distinct docs, too high "
        "ships duplicates; the knee is the operating point). Same "
        "capped inverted-index pair pipeline as "
        "dedup_token_jaccard_capped (doc-freq guard 60, fixture-cap "
        "200 docs mirrored in the oracle); each pair's Jaccard is one "
        "exact integer division, so band membership is identical "
        "across engines; the 4-threshold sweep is a broadcast cross "
        "over the bounded pair table, not four re-runs.",
    tags=("llm", "capability"),
)
def near_dup_threshold_sensitivity(spark, sf_dir):
    from miniodb_spark.operators.dedup import token_jaccard_pairs

    docs = fixture_df(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 200
    )
    pairs = token_jaccard_pairs(docs, threshold=0.3, max_doc_freq=60)
    thr = spark.createDataFrame(
        [(0.3,), (0.5,), (0.7,), (0.9,)], "thr double"
    )
    return (
        pairs.crossJoin(F.broadcast(thr))
        .groupBy("thr")
        .agg(
            F.count(F.when(F.col("jaccard") >= F.col("thr"), 1))
            .cast("bigint").alias("n_pairs")
        )
        .orderBy("thr")
    )


@register(
    "cohort_ltv_matrix",
    """
    WITH first_day AS (
      SELECT user_id, CAST(min(ts) AS DATE) AS cohort FROM events
      GROUP BY user_id),
    rev AS (
      SELECT f.cohort,
             date_diff('day', f.cohort, CAST(e.ts AS DATE)) AS age,
             sum(CAST(e.value AS DECIMAL(18,6))) AS v
      FROM events e JOIN first_day f USING (user_id)
      WHERE e.event_type = 'purchase'
      GROUP BY 1, 2),
    c AS (
      SELECT cohort,
             CAST(age AS BIGINT) AS age,
             CAST(sum(v) OVER (PARTITION BY cohort ORDER BY age)
                  AS DOUBLE) AS cum_rev
      FROM rev),
    sz AS (SELECT cohort, CAST(count(*) AS BIGINT) AS cohort_users
           FROM first_day GROUP BY cohort)
    SELECT CAST(c.cohort AS VARCHAR) AS cohort_day, c.age,
           sz.cohort_users,
           round(c.cum_rev, 6) AS cum_revenue,
           round(c.cum_rev / sz.cohort_users, 6) AS ltv_per_user
    FROM c JOIN sz USING (cohort)
    WHERE c.age <= 14
    ORDER BY cohort_day, age
    """,
    doc="Cohort LTV matrix: cumulative purchase revenue per signup "
        "cohort (first-seen day) by account age, per-user normalized — "
        "the revenue companion of retention_cohorts (users who stay "
        "vs what they're worth) and the curve LTV/CAC reads off. The "
        "cumulative sum runs in exact DECIMAL inside a COHORT-"
        "partitioned window whose row count is bounded by the "
        "calendar (ages per cohort), cast to double only at the "
        "output edge; first-seen via one user aggregate, cohort sizes "
        "broadcast. Ages capped at 14 for a stable matrix shape.",
    tags=("analytics",),
)
def cohort_ltv_matrix(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    first_day = ev.groupBy("user_id").agg(
        F.to_date(F.min("ts")).alias("cohort"))
    rev = (
        ev.filter(F.col("event_type") == "purchase")
        .join(first_day, "user_id")
        .groupBy(
            "cohort",
            F.datediff(F.to_date("ts"), F.col("cohort")).alias("age"),
        )
        .agg(F.sum(F.col("value").cast("decimal(18,6)")).alias("v"))
    )
    w = W.partitionBy("cohort").orderBy("age")
    c = rev.select(
        "cohort", F.col("age").cast("bigint").alias("age"),
        F.sum("v").over(w).cast("double").alias("cum_rev"),
    )
    sz = first_day.groupBy("cohort").agg(
        F.count("*").cast("bigint").alias("cohort_users"))
    return (
        c.join(F.broadcast(sz), "cohort")
        .filter(F.col("age") <= 14)
        .select(
            F.col("cohort").cast("string").alias("cohort_day"), "age",
            "cohort_users",
            F.round("cum_rev", 6).alias("cum_revenue"),
            F.round(F.col("cum_rev") / F.col("cohort_users"), 6)
            .alias("ltv_per_user"),
        )
        .orderBy("cohort_day", "age")
    )


@register(
    "not_in_null_trap",
    """
    WITH nullable_keys AS (
      SELECT o_custkey AS k FROM orders
      UNION ALL SELECT NULL),
    a AS (
      SELECT CAST(count(*) AS BIGINT) AS n_not_in
      FROM customer
      WHERE c_custkey NOT IN (SELECT k FROM nullable_keys)),
    b AS (
      SELECT CAST(count(*) AS BIGINT) AS n_not_exists
      FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM nullable_keys nk
                        WHERE nk.k = c.c_custkey)),
    t AS (SELECT CAST(count(*) AS BIGINT) AS n_customers FROM customer)
    SELECT t.n_customers, a.n_not_in, b.n_not_exists,
           CAST(b.n_not_exists - a.n_not_in AS BIGINT)
             AS rows_lost_to_null_semantics
    FROM t CROSS JOIN a CROSS JOIN b
    """,
    doc="The NOT IN vs NOT EXISTS NULL trap, pinned as data: against a "
        "key list CONTAINING A NULL, `NOT IN` returns zero rows "
        "(x <> NULL is UNKNOWN, so no row ever passes three-valued "
        "logic) while `NOT EXISTS` returns the true anti-join count — "
        "the classic silent-wrong-answer migration bug, and the reason "
        "the engine's anti-joins are written as NOT EXISTS / LEFT ANTI "
        "(q21_waiting_suppliers, join_anti). Both engines agree on the "
        "semantics; the entry proves it by computing both counts side "
        "by side plus the rows lost. Plan: the NOT IN compiles to a "
        "null-aware anti-join, NOT EXISTS to a plain left anti.",
    tags=("sql-surface",),
)
def not_in_null_trap(spark, sf_dir):
    for t in ("orders", "customer"):
        load(spark, sf_dir, t).createOrReplaceTempView(f"nint_{t}")
    return spark.sql("""
      WITH nullable_keys AS (
        SELECT o_custkey AS k FROM nint_orders
        UNION ALL SELECT NULL),
      a AS (
        SELECT CAST(count(*) AS BIGINT) AS n_not_in
        FROM nint_customer
        WHERE c_custkey NOT IN (SELECT k FROM nullable_keys)),
      b AS (
        SELECT CAST(count(*) AS BIGINT) AS n_not_exists
        FROM nint_customer c
        WHERE NOT EXISTS (SELECT 1 FROM nullable_keys nk
                          WHERE nk.k = c.c_custkey)),
      t AS (SELECT CAST(count(*) AS BIGINT) AS n_customers
            FROM nint_customer)
      SELECT t.n_customers, a.n_not_in, b.n_not_exists,
             CAST(b.n_not_exists - a.n_not_in AS BIGINT)
               AS rows_lost_to_null_semantics
      FROM t CROSS JOIN a CROSS JOIN b
    """)


@register(
    "weighted_quartiles_price",
    """
    WITH pv AS (
      SELECT l_extendedprice AS p,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS t
      FROM lineitem GROUP BY l_extendedprice),
    r AS (
      SELECT p, t,
             sum(t) OVER (ORDER BY p) AS cum,
             sum(t) OVER () AS w
      FROM pv)
    SELECT CAST(max(w) AS BIGINT) AS total_weight,
           round(max(CASE WHEN cum - t < ceil(0.25 * w)
                          AND ceil(0.25 * w) <= cum THEN p END), 2)
             AS wp25,
           round(max(CASE WHEN cum - t < ceil(0.50 * w)
                          AND ceil(0.50 * w) <= cum THEN p END), 2)
             AS wp50,
           round(max(CASE WHEN cum - t < ceil(0.75 * w)
                          AND ceil(0.75 * w) <= cum THEN p END), 2)
             AS wp75
    FROM r
    """,
    doc="Weighted quartiles of line price with quantity as the weight "
        "(each unit sold counts once — the 'price of the median unit', "
        "not the median line): discrete order statistics at "
        "ceil(q * W) over integer cumulative weights. Third consumer "
        "of the distributed midrank backbone (operators/ranks.py) "
        "after funnel_latency_percentiles and decile_lift_user_spend: "
        "weights collapse to a per-value count table with t = weight "
        "sum, and the quartile is the value whose cumulative bracket "
        "covers the target — no unpartitioned window over the "
        "price-cardinality table (the oracle keeps the window "
        "formulation; integer weight arithmetic is exact in both).",
    tags=("statistics", "capability"),
)
def weighted_quartiles_price(spark, sf_dir):
    from miniodb_spark.operators.ranks import doubled_midranks

    li = load(spark, sf_dir, "lineitem")
    pv = li.groupBy(F.col("l_extendedprice").alias("p")).agg(
        F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("t")
    )
    mr = doubled_midranks(pv, "p")
    mr = mr.select(
        "p", "t",
        ((F.col("mr2") - F.col("t") - 1) / 2).cast("bigint")
        .alias("cum_less"),
    ).withColumn("cum", F.col("cum_less") + F.col("t"))
    tot = pv.agg(F.sum("t").cast("bigint").alias("w"))
    j = mr.crossJoin(F.broadcast(tot))

    def pick(q):
        target = F.ceil(F.lit(q) * F.col("w")).cast("bigint")
        return F.round(
            F.max(F.when(
                (F.col("cum_less") < target) & (target <= F.col("cum")),
                F.col("p"))), 2)

    return j.agg(
        F.max("w").cast("bigint").alias("total_weight"),
        pick(0.25).alias("wp25"),
        pick(0.50).alias("wp50"),
        pick(0.75).alias("wp75"),
    )


@register(
    "explode_outer_empty_docs",
    """
    WITH tok AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> len(x) >= 12) AS ws
      FROM documents),
    ex AS (
      SELECT t.doc_id, u.w
      FROM tok t LEFT JOIN LATERAL (SELECT unnest(t.ws) AS w) u
        ON true)
    SELECT CAST((SELECT count(*) FROM documents) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT doc_id) AS BIGINT)
             AS n_docs_after_outer,
           CAST(count(DISTINCT CASE WHEN w IS NOT NULL THEN doc_id END)
                AS BIGINT) AS n_docs_with_long_word,
           CAST(count(CASE WHEN w IS NULL THEN 1 END) AS BIGINT)
             AS n_null_rows,
           CAST(count(w) AS BIGINT) AS n_token_rows
    FROM ex
    """,
    doc="explode_outer semantics pinned: exploding each document's "
        "12+-char words keeps EMPTY documents as a NULL-token row "
        "(plain explode silently drops them — the classic row-loss bug "
        "when a later join re-attaches per-doc metadata and short docs "
        "vanish from the corpus counts). DuckDB spells the same thing "
        "LEFT JOIN LATERAL unnest. One map-side generator, one "
        "aggregate; the distinct-doc counts prove outer == corpus and "
        "inner == only docs owning a long word.",
    tags=("sql-surface",),
)
def explode_outer_empty_docs(spark, sf_dir):
    docs = fixture_df(spark, sf_dir, "documents")
    ws = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
        lambda x: F.length(x) >= 12,
    )
    ex = docs.select("doc_id", F.explode_outer(ws).alias("w"))
    tot = docs.agg(F.count("*").cast("bigint").alias("n_docs"))
    return ex.crossJoin(F.broadcast(tot)).agg(
        F.max("n_docs").alias("n_docs"),
        F.countDistinct("doc_id").cast("bigint").alias("n_docs_after_outer"),
        F.countDistinct(F.when(F.col("w").isNotNull(), F.col("doc_id")))
        .cast("bigint").alias("n_docs_with_long_word"),
        F.count(F.when(F.col("w").isNull(), 1)).cast("bigint")
        .alias("n_null_rows"),
        F.count("w").cast("bigint").alias("n_token_rows"),
    )


@register(
    "attribution_model_compare",
    """
    WITH p AS (
      SELECT event_id, user_id, ts, value FROM events
      WHERE event_type = 'purchase' AND value IS NOT NULL),
    t AS (
      SELECT event_id AS t_eid, user_id, ts AS t_ts,
             event_type AS touch_type
      FROM events WHERE event_type IN ('click', 'view')),
    j AS (
      SELECT p.event_id, p.value,
             coalesce(t.touch_type, 'unattributed') AS touch_type,
             t.touch_type AS raw_touch, t.t_ts, t.t_eid
      FROM p LEFT JOIN t
        ON p.user_id = t.user_id
       AND t.t_ts < p.ts AND t.t_ts >= p.ts - INTERVAL 7 DAY),
    w AS (
      SELECT event_id, value, touch_type,
             count(raw_touch) OVER (PARTITION BY event_id) AS n,
             row_number() OVER (PARTITION BY event_id
                                ORDER BY t_ts, t_eid) AS rn_first,
             row_number() OVER (PARTITION BY event_id
                                ORDER BY t_ts DESC, t_eid DESC)
               AS rn_last
      FROM j)
    SELECT touch_type,
           CAST(sum(CAST(value / greatest(n, 1) AS DECIMAL(18,6)))
                AS DOUBLE) AS linear_credit,
           CAST(sum(CASE WHEN rn_first = 1
                         THEN CAST(value AS DECIMAL(18,6)) END)
                AS DOUBLE) AS first_touch_credit,
           CAST(sum(CASE WHEN rn_last = 1
                         THEN CAST(value AS DECIMAL(18,6)) END)
                AS DOUBLE) AS last_touch_credit
    FROM w GROUP BY touch_type ORDER BY touch_type
    """,
    doc="Attribution model shoot-out: linear, first-touch and last-"
        "touch credit per touch type from ONE 7-day lookback join "
        "(the linear_attribution_by_type machinery) — the side-by-side "
        "marketers use to see how much the model choice itself moves "
        "budget. First/last selection is a row_number over the "
        "PER-PURCHASE touch set ((t_ts, touch event_id) total order, "
        "so ties pick the same touch in both engines); fan-in windows "
        "are purchase-partitioned, never global; per-model credits "
        "sum as exact decimal(18,6). All three models conserve value "
        "(unattributed purchases credit a synthetic row).",
    tags=("analytics",),
)
def attribution_model_compare(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    p = (
        ev.filter((F.col("event_type") == "purchase")
                  & F.col("value").isNotNull())
        .select("event_id", "user_id", "ts", "value")
    )
    t = (
        ev.filter(F.col("event_type").isin("click", "view"))
        .select(F.col("user_id").alias("t_user"),
                F.col("ts").alias("t_ts"),
                F.col("event_id").alias("t_eid"),
                F.col("event_type").alias("touch_type"))
    )
    j = p.join(
        t,
        (F.col("user_id") == F.col("t_user"))
        & (F.col("t_ts") < F.col("ts"))
        & (F.col("t_ts") >= F.col("ts") - F.expr("INTERVAL 7 DAY")),
        "left",
    ).select(
        "event_id", "value",
        F.coalesce("touch_type", F.lit("unattributed")).alias("touch_type"),
        F.col("touch_type").alias("raw_touch"), "t_ts", "t_eid",
    )
    wp = W.partitionBy("event_id")
    w = j.select(
        "event_id", "value", "touch_type",
        F.count("raw_touch").over(wp).alias("n"),
        F.row_number().over(wp.orderBy("t_ts", "t_eid")).alias("rn_first"),
        F.row_number()
        .over(wp.orderBy(F.col("t_ts").desc(), F.col("t_eid").desc()))
        .alias("rn_last"),
    )
    dec = lambda c: c.cast("decimal(18,6)")
    return (
        w.groupBy("touch_type")
        .agg(
            F.sum(dec(F.col("value") / F.greatest(F.col("n"), F.lit(1))))
            .cast("double").alias("linear_credit"),
            F.sum(F.when(F.col("rn_first") == 1, dec(F.col("value"))))
            .cast("double").alias("first_touch_credit"),
            F.sum(F.when(F.col("rn_last") == 1, dec(F.col("value"))))
            .cast("double").alias("last_touch_credit"),
        )
        .orderBy("touch_type")
    )


@register(
    "target_encoding_m_estimate",
    """
    WITH c AS (
      SELECT o_orderpriority,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS s
      FROM orders GROUP BY o_orderpriority),
    g AS (SELECT sum(s) / sum(n) AS gmean FROM c)
    SELECT c.o_orderpriority, c.n,
           round(c.s / c.n, 6) AS cat_mean,
           round(g.gmean, 6) AS global_mean,
           round((c.s + 20.0 * g.gmean) / (c.n + 20.0), 6)
             AS encoded_m20
    FROM c CROSS JOIN g ORDER BY c.o_orderpriority
    """,
    doc="Smoothed target encoding (m-estimate, m = 20): the category's "
        "target mean shrunk toward the global mean in proportion to "
        "its support — the leakage-resistant categorical feature "
        "encoding (Micci-Barreca 2001) every tabular-ML pipeline "
        "ships; rare categories collapse to the prior instead of "
        "memorizing noise. One exact-decimal grouped aggregate; the "
        "global mean is a 1-row broadcast over the category table.",
    tags=("analytics", "capability"),
)
def target_encoding_m_estimate(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    c = o.groupBy("o_orderpriority").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double").alias("s"),
    )
    g = c.agg((F.sum("s") / F.sum("n")).alias("gmean"))
    return (
        c.crossJoin(F.broadcast(g))
        .select(
            "o_orderpriority", "n",
            F.round(F.col("s") / F.col("n"), 6).alias("cat_mean"),
            F.round("gmean", 6).alias("global_mean"),
            F.round((F.col("s") + 20.0 * F.col("gmean"))
                    / (F.col("n") + 20.0), 6).alias("encoded_m20"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "conversion_window_sensitivity",
    """
    WITH v AS (
      SELECT user_id, min(ts) AS t_view FROM events
      WHERE event_type = 'view' GROUP BY user_id),
    p AS (
      SELECT e.user_id, min(e.ts) AS t_purchase
      FROM events e JOIN v USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > v.t_view
      GROUP BY e.user_id),
    lat AS (
      SELECT v.user_id,
             date_diff('second', v.t_view, p.t_purchase) AS lat_s
      FROM v LEFT JOIN p USING (user_id)),
    w AS (SELECT unnest(CAST([1, 3, 7] AS BIGINT[])) AS window_days)
    SELECT w.window_days,
           CAST(count(*) AS BIGINT) AS n_viewers,
           CAST(count(CASE WHEN lat.lat_s IS NOT NULL
                      AND lat.lat_s <= w.window_days * 86400 THEN 1 END)
                AS BIGINT) AS n_converted,
           round(count(CASE WHEN lat.lat_s IS NOT NULL
                       AND lat.lat_s <= w.window_days * 86400 THEN 1 END)
                 * 1.0 / count(*), 6) AS conversion_rate
    FROM lat CROSS JOIN w GROUP BY w.window_days ORDER BY w.window_days
    """,
    doc="Conversion-window sensitivity: view->purchase conversion rate "
        "under 1/3/7-day attribution windows from ONE per-user latency "
        "table — the sweep that shows how much the reported conversion "
        "number is an artifact of the window choice (companion to "
        "funnel_conversion, which fixes one window, and to "
        "near_dup_threshold_sensitivity's sweep shape). Latencies are "
        "exact integer seconds; the 3-window sweep is a broadcast "
        "cross over the user-cardinality latency table, not three "
        "re-runs; two user aggregates, no window function at all.",
    tags=("analytics",),
)
def conversion_window_sensitivity(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    v = (ev.filter(F.col("event_type") == "view")
         .groupBy("user_id").agg(F.min("ts").alias("t_view")))
    p = (ev.filter(F.col("event_type") == "purchase")
         .join(v, "user_id")
         .filter(F.col("ts") > F.col("t_view"))
         .groupBy("user_id").agg(F.min("ts").alias("t_purchase")))
    lat = v.join(p, "user_id", "left").select(
        (F.unix_timestamp("t_purchase") - F.unix_timestamp("t_view"))
        .cast("bigint").alias("lat_s"))
    w = spark.createDataFrame([(1,), (3,), (7,)], "window_days long")
    conv = F.count(F.when(
        F.col("lat_s").isNotNull()
        & (F.col("lat_s") <= F.col("window_days") * 86400), 1))
    return (
        lat.crossJoin(F.broadcast(w))
        .groupBy("window_days")
        .agg(
            F.count("*").cast("bigint").alias("n_viewers"),
            conv.cast("bigint").alias("n_converted"),
            F.round(conv * 1.0 / F.count("*"), 6).alias("conversion_rate"),
        )
        .orderBy("window_days")
    )


@register(
    "srm_chi2_check",
    """
    WITH a AS (
      SELECT CAST(('0x' || substring(md5('srm:' || user_id), 1, 8))
                  AS BIGINT) % 2 AS arm
      FROM (SELECT DISTINCT user_id FROM events)),
    c AS (
      SELECT CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_a,
             CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_b
      FROM a),
    s AS (
      SELECT n_a, n_b,
             (n_a - (n_a + n_b) / 2.0) * (n_a - (n_a + n_b) / 2.0)
               / ((n_a + n_b) / 2.0)
             + (n_b - (n_a + n_b) / 2.0) * (n_b - (n_a + n_b) / 2.0)
               / ((n_a + n_b) / 2.0) AS chi2
      FROM c),
    z AS (SELECT n_a, n_b, chi2, sqrt(chi2) AS zz FROM s),
    ph AS (
      SELECT n_a, n_b, chi2,
             1.0 - 0.5 * power(1.0 + 0.196854 * zz + 0.115194 * zz * zz
                   + 0.000344 * zz * zz * zz
                   + 0.019527 * zz * zz * zz * zz, -4) AS phi
      FROM z)
    SELECT n_a, n_b, round(chi2, 6) AS chi2,
           round(2.0 * (1.0 - phi), 6) AS p_value,
           CAST(CASE WHEN 2.0 * (1.0 - phi) < 0.001 THEN 1 ELSE 0 END
                AS BIGINT) AS srm_flag
    FROM ph
    """,
    doc="Sample-ratio-mismatch (SRM) check for a 50/50 md5 split of "
        "users: chi-square GOF with 1 df against equal allocation, "
        "p-value via the Abramowitz-Stegun 26.2.19 polynomial normal "
        "CDF (chi2_1df p = 2(1 - Phi(sqrt(x))); pure arithmetic + one "
        "power, the benjamini_hochberg_fdr trick, so both engines "
        "agree bit-for-bit before rounding) and the p < 0.001 flag "
        "every experimentation platform alerts on — a failed SRM "
        "invalidates the A/B test before any metric is read. One "
        "distinct-user pass, md5 assignment identical across engines, "
        "1-row arithmetic.",
    tags=("statistics",),
)
def srm_chi2_check(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    a = ev.select("user_id").distinct().select(
        (F.conv(F.substring(F.md5(F.concat(F.lit("srm:"),
                                           F.col("user_id"))), 1, 8),
                16, 10).cast("bigint") % 2).alias("arm"))
    c = a.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).cast("bigint")
        .alias("n_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).cast("bigint")
        .alias("n_b"),
    )
    half = (F.col("n_a") + F.col("n_b")) / 2.0
    chi2 = ((F.col("n_a") - half) * (F.col("n_a") - half) / half
            + (F.col("n_b") - half) * (F.col("n_b") - half) / half)
    s = c.select("n_a", "n_b", chi2.alias("chi2"),
                 F.sqrt(chi2).alias("zz"))
    phi = 1.0 - 0.5 * (
        1.0 + 0.196854 * F.col("zz") + 0.115194 * F.col("zz") * F.col("zz")
        + 0.000344 * F.col("zz") ** 3 + 0.019527 * F.col("zz") ** 4
    ) ** (-4)
    p = s.select("n_a", "n_b", "chi2", phi.alias("phi"))
    return p.select(
        "n_a", "n_b",
        F.round("chi2", 6).alias("chi2"),
        F.round(2.0 * (1.0 - F.col("phi")), 6).alias("p_value"),
        F.when(2.0 * (1.0 - F.col("phi")) < 0.001, 1).otherwise(0)
        .cast("bigint").alias("srm_flag"),
    )


@register(
    "keyset_pagination_page3",
    """
    WITH page AS (
      SELECT o_orderkey, o_orderdate, o_totalprice
      FROM orders
      WHERE o_orderkey > (
        SELECT max(o_orderkey) FROM (
          SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 20))
      ORDER BY o_orderkey LIMIT 10)
    SELECT o_orderkey, CAST(o_orderdate AS VARCHAR) AS o_orderdate,
           round(o_totalprice, 2) AS o_totalprice
    FROM page ORDER BY o_orderkey
    """,
    doc="Keyset (seek) pagination: page 3 of a 10-row listing fetched "
        "as WHERE key > last-key-of-page-2 ORDER BY key LIMIT 10 — "
        "the scalable alternative to OFFSET (limit_offset) that "
        "StreamQuery-style cursors should use: OFFSET n scans and "
        "discards n rows every page (O(pages^2) total at depth), "
        "keyset seeks straight to the boundary and the predicate "
        "pushes into the scan. The page-2 boundary itself is a "
        "TakeOrdered top-20 reduced to one scalar, broadcast into the "
        "main scan's filter; both LIMITs are total-ordered by the "
        "unique key so the pages are deterministic.",
    tags=("sql-surface",),
)
def keyset_pagination_page3(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    boundary = (
        o.select("o_orderkey").orderBy("o_orderkey").limit(20)
        .agg(F.max("o_orderkey").alias("b"))
    )
    return (
        o.join(F.broadcast(boundary))
        .filter(F.col("o_orderkey") > F.col("b"))
        .orderBy("o_orderkey").limit(10)
        .select(
            "o_orderkey",
            F.col("o_orderdate").cast("string").alias("o_orderdate"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "dedup_token_savings",
    """
    WITH d AS (
      SELECT source, md5(text) AS h,
             CAST(len(list_filter(
               string_split_regex(lower(text), '[^a-z0-9]+'),
               x -> x <> '')) AS BIGINT) AS n_tok
      FROM documents),
    g AS (
      SELECT source, h, CAST(count(*) AS BIGINT) AS copies,
             max(n_tok) AS n_tok
      FROM d GROUP BY source, h)
    SELECT source,
           CAST(sum(copies) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_unique_docs,
           CAST(sum(copies * n_tok) AS BIGINT) AS total_tokens,
           CAST(sum(n_tok) AS BIGINT) AS unique_tokens,
           CAST(sum((copies - 1) * n_tok) AS BIGINT) AS tokens_saved,
           round(sum((copies - 1) * n_tok) * 1.0
                 / sum(copies * n_tok), 6) AS savings_rate
    FROM g GROUP BY source ORDER BY source
    """,
    doc="Exact-dedup ROI per source: tokens the corpus spends on "
        "verbatim copies (sum over duplicate groups of (copies-1) x "
        "doc tokens) vs what survives keep-one dedup — the number "
        "that justifies (or kills) running the dedup stage, and the "
        "per-source breakdown that finds the crawler producing the "
        "copies (companion to dedup_exact_groups, which lists the "
        "groups, and dataset_card_summary's corpus-level dup count). "
        "One groupBy on (source, 16-byte md5) with exact integer "
        "token arithmetic; text bytes never shuffle.",
    tags=("llm", "capability"),
)
def dedup_token_savings(spark, sf_dir):
    docs = fixture_df(spark, sf_dir, "documents")
    n_tok = F.size(
        F.filter(F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
                 lambda x: x != "")
    ).cast("bigint")
    d = docs.select("source", F.md5("text").alias("h"),
                    n_tok.alias("n_tok"))
    g = d.groupBy("source", "h").agg(
        F.count("*").cast("bigint").alias("copies"),
        F.max("n_tok").alias("n_tok"),
    )
    saved = F.sum((F.col("copies") - 1) * F.col("n_tok"))
    total = F.sum(F.col("copies") * F.col("n_tok"))
    return (
        g.groupBy("source")
        .agg(
            F.sum("copies").cast("bigint").alias("n_docs"),
            F.count("*").cast("bigint").alias("n_unique_docs"),
            total.cast("bigint").alias("total_tokens"),
            F.sum("n_tok").cast("bigint").alias("unique_tokens"),
            saved.cast("bigint").alias("tokens_saved"),
            F.round(saved * 1.0 / total, 6).alias("savings_rate"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# round 13: optimizer-trap depth batch — query shapes that are easy to
# write and easy for a planner to get wrong (r12 verdict next-round #7)
# ---------------------------------------------------------------------------


@register(
    "exists_under_or_customers",
    """
    SELECT c_custkey, c_name
    FROM customer c
    WHERE c_custkey <= 300
      AND (c_acctbal > CAST(9000.0 AS DOUBLE)
           OR EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > CAST(300000.0 AS DOUBLE)))
    ORDER BY c_custkey
    """,
    doc="Correlated EXISTS under OR — the classic decorrelation trap: "
        "a semi-join rewrite is WRONG here (it would drop customers "
        "that fail the EXISTS but pass the balance test), and naive "
        "engines fall back to a per-row subquery. Catalyst plans an "
        "ExistenceJoin (mark join): one hash join that ATTACHES an "
        "'exists' boolean instead of filtering, then evaluates the OR "
        "over the mark — plan-gated in test_plans.py. Both subquery "
        "predicates push into the scans (customer keys, order price). "
        "At 100 TB the mark join shuffles/broadcasts exactly like the "
        "plain semi join — no row expansion, orders side pre-filtered.",
    tags=("sql-surface",),
)
def exists_under_or_customers(spark, sf_dir):
    load(spark, sf_dir, "customer").createOrReplaceTempView(
        "customer_exor_v")
    load(spark, sf_dir, "orders").createOrReplaceTempView(
        "orders_exor_v")
    return spark.sql("""
      SELECT c_custkey, c_name
      FROM customer_exor_v c
      WHERE c_custkey <= 300
        AND (c_acctbal > CAST(9000.0 AS DOUBLE)
             OR EXISTS (SELECT 1 FROM orders_exor_v o
                        WHERE o.o_custkey = c.c_custkey
                          AND o.o_totalprice > CAST(300000.0 AS DOUBLE)))
      ORDER BY c_custkey
    """)


@register(
    "lateral_offset_runnerups",
    """
    SELECT n.n_name, t.c_name, t.c_acctbal
    FROM nation n,
    LATERAL (SELECT c_name, c_acctbal FROM customer c
             WHERE c.c_nationkey = n.n_nationkey
             ORDER BY c_acctbal DESC, c_name LIMIT 2 OFFSET 1) t
    ORDER BY n.n_name, t.c_acctbal DESC, t.c_name
    """,
    doc="Correlated LATERAL with LIMIT + OFFSET: the 2nd- and "
        "3rd-richest customer per nation (runner-up analysis skips the "
        "winner). OFFSET inside a correlated subquery is the "
        "decorrelation edge lateral_topn_per_nation doesn't touch — a "
        "per-group LIMIT can ride a ranked-limit rewrite, but OFFSET "
        "forces the planner to keep per-group ordinal positions "
        "(row_number BETWEEN 2 AND 3 after decorrelation), which "
        "Spark 4 handles without replaying the customer scan per "
        "nation. Tie-break (balance DESC, name) total-orders the "
        "window so both engines pick identical rows.",
    tags=("sql-surface",),
)
def lateral_offset_runnerups(spark, sf_dir):
    load(spark, sf_dir, "nation").createOrReplaceTempView(
        "nation_latoff_v")
    load(spark, sf_dir, "customer").createOrReplaceTempView(
        "customer_latoff_v")
    return spark.sql("""
      SELECT n.n_name, t.c_name, t.c_acctbal
      FROM nation_latoff_v n,
      LATERAL (SELECT c_name, c_acctbal FROM customer_latoff_v c
               WHERE c.c_nationkey = n.n_nationkey
               ORDER BY c_acctbal DESC, c_name LIMIT 2 OFFSET 1) t
      ORDER BY n.n_name, t.c_acctbal DESC, t.c_name
    """)


@register(
    "downcast_safety_audit",
    """
    SELECT 'orders' AS tbl,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(CASE WHEN o_custkey > 2147483647
                             OR o_custkey < -2147483648 THEN 1 END)
                AS BIGINT) AS key_int32_overflow,
           CAST(count(CASE WHEN o_totalprice <>
                    CAST(CAST(o_totalprice AS REAL) AS DOUBLE)
                           THEN 1 END) AS BIGINT) AS price_f32_lossy,
           CAST(count(CASE WHEN abs(o_totalprice) >= 1e10 THEN 1 END)
                AS BIGINT) AS price_dec12_overflow,
           CAST(count(CASE WHEN o_totalprice <>
                             round(o_totalprice, 2) THEN 1 END)
                AS BIGINT) AS price_subcent_scale
    FROM orders
    """,
    doc="Schema-narrowing safety audit — the numeric-overflow-edge "
        "check a pipeline runs BEFORE downcasting a 100 TB table into "
        "a constrained sink schema (int32 keys, float32 features, "
        "DECIMAL(12,2) money): rows whose key exceeds int32, whose "
        "price loses bits through a float32 round-trip (IEEE 754 "
        "single is engine-independent, so the count is deterministic "
        "cross-engine), whose magnitude overflows DECIMAL(12,2), and "
        "whose scale exceeds 2 decimal digits. One map-side pass to a "
        "1-row aggregate — no shuffle beyond the final combine; the "
        "four conditions are pure arithmetic (no libm), so the counts "
        "are bit-exact at any scale.",
    tags=("llm", "capability"),
)
def downcast_safety_audit(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    price = F.col("o_totalprice")
    key = F.col("o_custkey")
    def n(cond):
        return F.count(F.when(cond, 1)).cast("bigint")
    return o.agg(
        F.count("*").cast("bigint").alias("n_rows"),
        n((key > 2147483647) | (key < -2147483648))
        .alias("key_int32_overflow"),
        n(price != price.cast("float").cast("double"))
        .alias("price_f32_lossy"),
        n(F.abs(price) >= 1e10).alias("price_dec12_overflow"),
        n(price != F.round(price, 2)).alias("price_subcent_scale"),
    ).select(F.lit("orders").alias("tbl"), "n_rows",
             "key_int32_overflow", "price_f32_lossy",
             "price_dec12_overflow", "price_subcent_scale")


@register(
    "join_using_full_outer_coalesce",
    """
    WITH c AS (
      SELECT c_custkey AS custkey, c_acctbal
      FROM customer WHERE c_custkey <= 100),
    o AS (
      SELECT o_custkey AS custkey,
             CAST(count(*) AS BIGINT) AS n_orders
      FROM orders WHERE o_custkey BETWEEN 51 AND 150
      GROUP BY o_custkey)
    SELECT custkey,
           CAST(c_acctbal IS NOT NULL AS VARCHAR) AS has_customer,
           coalesce(n_orders, 0) AS n_orders
    FROM c FULL OUTER JOIN o USING (custkey)
    ORDER BY custkey
    """,
    doc="FULL OUTER JOIN ... USING key coalescing: the SQL-standard "
        "rule that the USING column in a full join's output is "
        "coalesce(left.key, right.key) — a NULL key for right-only "
        "rows is the classic porting bug when an ON-clause full join "
        "is rewritten to USING (or vice versa). Left side: customers "
        "1-100; right side: per-customer order counts for 51-150; the "
        "output key must be non-NULL across all three zones "
        "(left-only 1-50, overlap 51-100, right-only 101-150). "
        "Broadcast-sized dims here; at scale the same shape is a "
        "shuffle full join on the key — no expansion, one shuffle.",
    tags=("sql-surface",),
)
def join_using_full_outer_coalesce(spark, sf_dir):
    load(spark, sf_dir, "customer").createOrReplaceTempView(
        "customer_fouse_v")
    load(spark, sf_dir, "orders").createOrReplaceTempView(
        "orders_fouse_v")
    return spark.sql("""
      WITH c AS (
        SELECT c_custkey AS custkey, c_acctbal
        FROM customer_fouse_v WHERE c_custkey <= 100),
      o AS (
        SELECT o_custkey AS custkey,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM orders_fouse_v WHERE o_custkey BETWEEN 51 AND 150
        GROUP BY o_custkey)
      SELECT custkey,
             CAST(c_acctbal IS NOT NULL AS STRING) AS has_customer,
             coalesce(n_orders, CAST(0 AS BIGINT)) AS n_orders
      FROM c FULL OUTER JOIN o USING (custkey)
      ORDER BY custkey
    """)


@register(
    "try_cast_decimal_parse_audit",
    """
    WITH s AS (
      SELECT o_orderkey % 6 AS variant,
             CASE o_orderkey % 6
               WHEN 0 THEN printf('%.2f', o_totalprice)
               WHEN 1 THEN printf('%.3fe1', o_totalprice / 10)
               WHEN 2 THEN 'N/A'
               WHEN 3 THEN ''
               WHEN 4 THEN printf('%.2f', o_totalprice * 1e9)
               ELSE '-' || printf('%.2f', o_totalprice)
             END AS raw
      FROM orders)
    SELECT variant, CAST(count(*) AS BIGINT) AS n,
           CAST(count(TRY_CAST(raw AS DECIMAL(12,2))) AS BIGINT)
             AS n_parsed,
           round(CAST(sum(TRY_CAST(raw AS DECIMAL(12,2))) AS DOUBLE),
                 2) AS parsed_sum
    FROM s GROUP BY variant ORDER BY variant
    """,
    doc="TRY_CAST string->DECIMAL(12,2) parse audit — the decimal "
        "overflow-edge entry (r12 verdict #7): six deterministic "
        "formatting variants of the price column (plain %.2f, exponent "
        "notation, junk token, empty string, a x1e9 value whose integer "
        "digits overflow precision 12, and signed) are parsed with "
        "error-safe casts; the audit reports parse yield and the exact "
        "sum of what parsed, per variant. Pins the agreeing edges "
        "cross-engine: exponent literals parse, junk/empty -> NULL, "
        "integer-digit overflow -> NULL (not an error), scale-reduce "
        "rounds half-away-from-zero. The ONE divergent edge is "
        "deliberately excluded and documented: a value whose ROUNDING "
        "carries it over the precision boundary ('99.995' -> "
        "DECIMAL(4,2)) is NULL in Spark but 100.00 in DuckDB — schema "
        "authors must leave one integer digit of rounding headroom. "
        "One map-side pass, 6-group aggregate; the strings are derived, "
        "never shuffled wide.",
    tags=("sql-surface", "capability"),
)
def try_cast_decimal_parse_audit(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    variant = (F.col("o_orderkey") % 6).alias("variant")
    price = F.col("o_totalprice")
    raw = (
        F.when(F.col("o_orderkey") % 6 == 0,
               F.format_string("%.2f", price))
        .when(F.col("o_orderkey") % 6 == 1,
              F.format_string("%.3fe1", price / 10))
        .when(F.col("o_orderkey") % 6 == 2, F.lit("N/A"))
        .when(F.col("o_orderkey") % 6 == 3, F.lit(""))
        .when(F.col("o_orderkey") % 6 == 4,
              F.format_string("%.2f", price * 1e9))
        .otherwise(F.concat(F.lit("-"),
                            F.format_string("%.2f", price)))
    )
    parsed = F.expr("TRY_CAST(raw AS DECIMAL(12,2))")
    return (
        o.select(variant, raw.alias("raw"))
        .groupBy("variant")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.count(parsed).cast("bigint").alias("n_parsed"),
            F.round(F.sum(parsed).cast("double"), 2).alias("parsed_sum"),
        )
        .orderBy("variant")
    )


@register(
    "user_journey_paths_topk",
    """
    WITH r AS (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events),
    p AS (
      SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
      FROM r WHERE rn <= 8 GROUP BY user_id)
    SELECT path, CAST(count(*) AS BIGINT) AS n_users
    FROM p GROUP BY path ORDER BY n_users DESC, path LIMIT 10
    """,
    doc="Top user-journey path prefixes: each user's first 8 events "
        "(ordered by ts with event_id as the unique tie-break) collapse "
        "to an ordered 'view>click>purchase' path string; paths are "
        "ranked by how many users share them — the sequence-level view "
        "of behavior that the pairwise entries (event_transition_matrix, "
        "markov_transition_entropy) cannot give, and the standard "
        "journey-analysis card in product analytics. Scale shape: ONE "
        "user_id shuffle serves both the ranking window and the "
        "per-user path fold (same partitioning, Catalyst reuses the "
        "exchange); the path GROUP BY partial-aggregates map-side and "
        "its output is at most one row per distinct 8-prefix; top-10 is "
        "TakeOrderedAndProject, never a global sort. The 8-event cap "
        "bounds both the window state and the path string length, so no "
        "power-user skews a partition. Total order under the LIMIT: "
        "(n_users DESC, path ASC) with path unique after grouping.",
    tags=("analytics",),
)
def user_journey_paths_topk(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    first8 = (
        ev.select("user_id", "ts", "event_id", "event_type")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 8)
    )
    # array_sort on struct(rn, ...) orders by the unique per-user rn,
    # making collect_list's nondeterministic arrival order irrelevant
    paths = first8.groupBy("user_id").agg(
        F.concat_ws(
            ">",
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                lambda s: s["event_type"],
            ),
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").cast("bigint").alias("n_users"))
        .orderBy(F.desc("n_users"), "path")
        .limit(10)
    )


@register(
    "hash_bucket_balance_audit",
    """
    WITH b AS (
      SELECT strpos('0123456789abcdef',
                    substring(md5(CAST(l_orderkey AS VARCHAR)), 32, 1)) - 1
               AS bucket
      FROM lineitem),
    per AS (SELECT bucket, count(*) AS n FROM b GROUP BY bucket)
    SELECT CAST(count(*) AS BIGINT) AS n_buckets,
           CAST(sum(n) AS BIGINT) AS n_rows,
           CAST(max(n) AS BIGINT) AS max_bucket,
           CAST(min(n) AS BIGINT) AS min_bucket,
           round(max(n) * 1.0 / avg(n), 6) AS skew_ratio,
           round(stddev_pop(n) / avg(n), 6) AS cv
    FROM per
    """,
    doc="Hash-partition balance audit: rows-per-bucket distribution "
        "when the fact table is hash-distributed on its key (16 "
        "buckets via the last md5 hex digit — engine-portable, no "
        "engine-specific hash). Reports max/mean skew ratio and the "
        "coefficient of variation — the go/no-go numbers for choosing "
        "a bucketing/distribution key before a 100 TB backfill, the "
        "planning-side complement of join_key_skew_audit (which "
        "audits observed join-key frequencies). Scale shape: the "
        "bucket derivation is a map-side expression; the first "
        "aggregate partial-combines to <=16 groups per task; the "
        "second is a 16-row reduction. The scan reads exactly one "
        "column. Both engines agree on md5 hex, so the bucket "
        "assignment itself is cross-engine deterministic.",
    tags=("capability", "scale-audit"),
)
def hash_bucket_balance_audit(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    b = li.select(
        F.expr(
            "locate(substring(md5(CAST(l_orderkey AS STRING)), 32, 1),"
            " '0123456789abcdef') - 1"
        ).alias("bucket")
    )
    per = b.groupBy("bucket").agg(F.count("*").alias("n"))
    return per.agg(
        F.count("*").cast("bigint").alias("n_buckets"),
        F.sum("n").cast("bigint").alias("n_rows"),
        F.max("n").cast("bigint").alias("max_bucket"),
        F.min("n").cast("bigint").alias("min_bucket"),
        F.round(F.max("n") / F.avg("n"), 6).alias("skew_ratio"),
        F.round(F.stddev_pop("n") / F.avg("n"), 6).alias("cv"),
    )


@register(
    "asof_join_nearest",
    """
    WITH u AS (
      SELECT user_id, ts, event_id, CAST(NULL AS DOUBLE) AS pval,
             1 AS is_click
      FROM events WHERE event_type = 'click'
      UNION ALL
      SELECT user_id, ts, NULL, value, 0
      FROM events WHERE event_type = 'purchase'),
    w AS (
      SELECT user_id, ts, event_id, is_click,
        last_value(CASE WHEN is_click = 0 THEN ts END IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY ts, is_click
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bts,
        last_value(pval IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY ts, is_click
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bval,
        first_value(CASE WHEN is_click = 0 THEN ts END IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY ts, is_click
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS fts,
        first_value(pval IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY ts, is_click
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS fval
      FROM u)
    SELECT event_id, user_id,
      round(CASE WHEN bts IS NOT NULL AND (fts IS NULL OR
                 epoch_us(ts) - epoch_us(bts) <= epoch_us(fts) - epoch_us(ts))
            THEN bval ELSE fval END, 6) AS nearest_purchase_value,
      CASE WHEN bts IS NULL AND fts IS NULL THEN NULL
           WHEN bts IS NOT NULL AND (fts IS NULL OR
                epoch_us(ts) - epoch_us(bts) <= epoch_us(fts) - epoch_us(ts))
           THEN 'back' ELSE 'fwd' END AS direction,
      CAST(CASE WHEN bts IS NOT NULL AND (fts IS NULL OR
                epoch_us(ts) - epoch_us(bts) <= epoch_us(fts) - epoch_us(ts))
           THEN epoch_us(ts) - epoch_us(bts)
           ELSE epoch_us(fts) - epoch_us(ts) END AS BIGINT) AS delta_us
    FROM w WHERE is_click = 1 ORDER BY event_id
    """,
    doc="NEAREST as-of join — the third direction, completing the "
        "family (asof_join_events backward, asof_join_forward forward; "
        "pandas calls this merge_asof direction='nearest'): each click "
        "matches the user's purchase with the smallest |delta-ts|, tie "
        "broken toward the EARLIER purchase (a same-ts purchase is a "
        "backward match with delta 0 — pinned by ordering purchases "
        "before clicks at equal ts, the mirror of the forward entry's "
        "r12-ADVICE tie fix). Neither engine has a native nearest asof "
        "operator, so BOTH sides build it the same way from ANSI "
        "windows: one user-partitioned pass computing last/first "
        "IGNORE NULLS over the preceding/following frames, then a CASE "
        "picks the closer side — making the oracle a true independent "
        "check of the tie and null contracts (click with no purchase "
        "either side returns NULL value/direction/delta). Scale shape: "
        "ONE user_id shuffle serves both window directions (same "
        "partitioning and sort; Spark evaluates both frames in one "
        "Window node pair without re-exchanging); no join, no row "
        "expansion; output-edge ORDER BY is the result contract.",
    tags=("sql-surface", "capability"),
)
def asof_join_nearest(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id",
        F.lit(None).cast("double").alias("pval"),
        F.lit(1).alias("is_click"),
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts",
        F.lit(None).cast("long").alias("event_id"),
        F.col("value").alias("pval"),
        F.lit(0).alias("is_click"),
    )
    u = (
        clicks.unionByName(purch)
        .withColumn("ts_us", F.unix_micros("ts"))
        # purchase rows carry their own ts so last/first(ignorenulls)
        # returns the matched purchase's timestamp alongside its value
        .withColumn("pts", F.when(F.col("is_click") == 0, F.col("ts_us")))
    )
    # purchases (0) sort before clicks (1) at equal ts: a same-ts
    # purchase lands in the click's PRECEDING frame -> delta-0 backward
    # match, which the <=-tie CASE then always prefers
    ob = [F.col("ts_us").asc(), F.col("is_click").asc()]
    wb = (
        W.partitionBy("user_id").orderBy(*ob)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wf = (
        W.partitionBy("user_id").orderBy(*ob)
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    r = (
        u.withColumn("bts", F.last("pts", ignorenulls=True).over(wb))
        .withColumn("bval", F.last("pval", ignorenulls=True).over(wb))
        .withColumn("fts", F.first("pts", ignorenulls=True).over(wf))
        .withColumn("fval", F.first("pval", ignorenulls=True).over(wf))
        .filter(F.col("is_click") == 1)
    )
    back = F.col("ts_us") - F.col("bts")
    fwd = F.col("fts") - F.col("ts_us")
    use_back = F.col("bts").isNotNull() & (
        F.col("fts").isNull() | (back <= fwd)
    )
    return r.select(
        "event_id", "user_id",
        F.round(
            F.when(use_back, F.col("bval")).otherwise(F.col("fval")), 6
        ).alias("nearest_purchase_value"),
        F.when(
            F.col("bts").isNull() & F.col("fts").isNull(),
            F.lit(None).cast("string"),
        )
        .when(use_back, F.lit("back"))
        .otherwise(F.lit("fwd"))
        .alias("direction"),
        F.when(use_back, back).otherwise(fwd).cast("bigint").alias(
            "delta_us"
        ),
    ).orderBy("event_id")


@register(
    "rolling_median_7d_revenue",
    """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             sum(value) AS rev
      FROM events WHERE event_type = 'purchase' GROUP BY 1)
    SELECT CAST(day AS TIMESTAMP) AS day, round(rev, 4) AS daily_rev,
           round(median(rev) OVER (ORDER BY day
                 RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW),
                 4) AS med7_rev
    FROM daily ORDER BY day
    """,
    doc="Trailing 7-calendar-day rolling MEDIAN of daily revenue — the "
        "robust (outlier-resistant) smoother ops dashboards pair with "
        "the moving average (window_moving_avg covers the mean; the "
        "median is NOT decomposable, so it needs a different plan). "
        "DuckDB expresses it as a median window over a date RANGE "
        "frame; Spark has no exact-median window function, so the plan "
        "reconstructs the calendar frame explicitly: collapse facts to "
        "the daily spine first (one shuffle; the spine is "
        "calendar-bounded — tens of thousands of rows no matter how "
        "many petabytes of facts feed it), then a BROADCAST self-join "
        "pairs each day with its <=7 trailing days and an exact "
        "percentile(0.5) aggregates per anchor day. O(7 x |days|) "
        "joined rows total, zero fact-table re-scan, no unpartitioned "
        "window over facts. Spark's exact percentile interpolates "
        "exactly like DuckDB's median on DOUBLE. Calendar (RANGE) "
        "semantics, not ROWS: a gap day shortens the window on both "
        "sides identically.",
    tags=("analytics",),
)
def rolling_median_7d_revenue(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.sum("value").alias("rev"))
    )
    right = F.broadcast(
        daily.select(F.col("day").alias("d2"), F.col("rev").alias("rev2"))
    )
    j = daily.join(
        right,
        (F.col("d2") <= F.col("day"))
        & (F.col("d2") >= F.date_sub(F.col("day"), 6)),
    )
    return (
        j.groupBy("day")
        .agg(
            F.round(F.max("rev"), 4).alias("daily_rev"),
            F.round(F.percentile("rev2", 0.5), 4).alias("med7_rev"),
        )
        # TIMESTAMP output on both sides: the driver compares pandas
        # frames, where a Spark date and a DuckDB DATE (datetime64)
        # canonicalize differently (repo convention, see
        # gap_fill_daily_counts)
        .select(
            F.col("day").cast("timestamp").alias("day"),
            "daily_rev", "med7_rev",
        )
        .orderBy("day")
    )


@register(
    "having_above_global_avg",
    """
    SELECT o_custkey, round(sum(o_totalprice), 2) AS spend
    FROM orders GROUP BY o_custkey
    HAVING sum(o_totalprice) > 4 * (SELECT avg(o_totalprice) FROM orders)
    ORDER BY spend DESC, o_custkey LIMIT 20
    """,
    doc="Scalar subquery inside HAVING — the grouped-side twin of "
        "subquery_scalar (which filters fact rows in WHERE): customers "
        "whose total spend exceeds 4x the global mean order price. The "
        "optimizer trap: the scalar must be evaluated ONCE and applied "
        "to post-aggregation groups, not re-evaluated per group and "
        "not pushed below the aggregate. Spark's plan is the repo's "
        "1-row-broadcast pattern made explicit: the global avg is a "
        "separate 1-row aggregate broadcast-crossed into the grouped "
        "table, then a plain filter. Scale shape: two independent "
        "single-pass aggregates over orders (both map-side "
        "combinable), a 1-row broadcast, TakeOrderedAndProject for "
        "the top-20 — no re-scan, no correlated execution. Total "
        "order under the LIMIT: (spend DESC, o_custkey ASC).",
    tags=("sql-surface",),
)
def having_above_global_avg(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    g = o.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("spend_raw"))
    thr = o.agg((4 * F.avg("o_totalprice")).alias("thr"))
    return (
        g.join(F.broadcast(thr))
        .filter(F.col("spend_raw") > F.col("thr"))
        .select("o_custkey", F.round("spend_raw", 2).alias("spend"))
        .orderBy(F.desc("spend"), "o_custkey")
        .limit(20)
    )


@register(
    "quantile_normalize_doc_length",
    """
    WITH d AS (
      SELECT source, lang,
             percent_rank() OVER (PARTITION BY source ORDER BY n_chars)
               AS pr
      FROM documents)
    SELECT source, lang, round(avg(pr), 6) AS mean_pr,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM d GROUP BY source, lang ORDER BY source, lang
    """,
    doc="Quantile normalization across heterogeneous corpus sources: "
        "each document's length becomes its within-source percentile, "
        "making 'does lang X skew long?' comparable across sources "
        "whose absolute length scales differ wildly (web crawl vs "
        "books) — the normalization step mixture-weighting pipelines "
        "apply before cross-source curriculum decisions; the pure-SQL, "
        "exactly-oracled complement of grouped_zscore (the documented "
        "pandas-UDF showcase). The oracle ranks every document row "
        "with percent_rank; the Spark plan NEVER ranks fact rows — "
        "the rank-statistics backbone rule (operators/ranks.py): facts "
        "collapse once to a per-(source, lang, n_chars) count table, "
        "ranks derive from cumulative counts over the per-(source, "
        "n_chars) DOMAIN table (window partitioned by source over "
        "distinct values, ~|domain| rows, never facts), and the mean "
        "percentile per (source, lang) is the count-weighted sum — "
        "tie semantics identical to percent_rank by the identity "
        "pr(v) = |rows < v| / (n - 1). Scale: one fact pass, "
        "domain-bounded window, broadcast source totals; largest task "
        "O(distinct lengths per source).",
    tags=("llm-pipeline", "analytics"),
)
def quantile_normalize_doc_length(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    ct = docs.groupBy("source", "lang", "n_chars").agg(
        F.count("*").alias("t")
    )
    sv = ct.groupBy("source", "n_chars").agg(F.sum("t").alias("tv"))
    w = W.partitionBy("source").orderBy("n_chars")
    sv = (
        sv.withColumn("cumle", F.sum("tv").over(w))
        .withColumn("cum_less", F.col("cumle") - F.col("tv"))
    )
    n_src = sv.groupBy("source").agg(F.sum("tv").alias("n_src"))
    pr = (
        sv.join(F.broadcast(n_src), "source")
        .select(
            "source", "n_chars",
            F.when(F.col("n_src") == 1, F.lit(0.0))
            .otherwise(F.col("cum_less") / (F.col("n_src") - 1))
            .alias("pr"),
        )
    )
    return (
        ct.join(pr, ["source", "n_chars"])
        .groupBy("source", "lang")
        .agg(
            F.round(
                F.sum(F.col("t") * F.col("pr")) / F.sum("t"), 6
            ).alias("mean_pr"),
            F.sum("t").cast("bigint").alias("n_docs"),
        )
        .orderBy("source", "lang")
    )


@register(
    "float_group_key_edges",
    """
    WITH s AS (
      SELECT CASE l_orderkey % 4
               WHEN 0 THEN -0.0 * l_quantity
               WHEN 1 THEN 0.0
               WHEN 2 THEN 'NaN'::DOUBLE
               ELSE 1.5 END AS k
      FROM lineitem)
    SELECT k, CAST(count(*) AS BIGINT) AS n FROM s GROUP BY k ORDER BY k
    """,
    doc="Floating-point GROUP BY key edges — the semantics any exact "
        "dedup or groupBy on a float column silently depends on: "
        "(a) -0.0 normalizes into the 0.0 group (IEEE equality, one "
        "group, NOT two hash buckets), (b) NaN groups with NaN (one "
        "group, though NaN != NaN in comparisons), (c) NaN sorts "
        "GREATEST in ORDER BY. Spark and DuckDB agree on all three — "
        "this entry pins that agreement so a future engine/version "
        "drift surfaces as a driver mismatch instead of a silent "
        "dedup-cardinality change (the md5-based exact-dedup entries "
        "hash the STRING form, where '-0.0' and '0.0' differ — this "
        "entry documents why numeric-key grouping behaves otherwise). "
        "Scale: map-side key derivation, partial agg to <=4 groups.",
    tags=("sql-surface", "capability"),
)
def float_group_key_edges(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    key = (
        F.when(F.col("l_orderkey") % 4 == 0,
               F.lit(-0.0) * F.col("l_quantity"))
        .when(F.col("l_orderkey") % 4 == 1, F.lit(0.0))
        .when(F.col("l_orderkey") % 4 == 2, F.lit(float("nan")))
        .otherwise(F.lit(1.5))
    )
    return (
        li.select(key.alias("k"))
        .groupBy("k")
        .agg(F.count("*").cast("bigint").alias("n"))
        .orderBy("k")
    )


@register(
    "dedup_keep_best_quality",
    """
    WITH fp AS (
      SELECT doc_id, source, n_chars,
             md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'))
               AS fp
      FROM documents),
    r AS (
      SELECT source, n_chars,
             row_number() OVER (PARTITION BY fp
                                ORDER BY n_chars DESC, doc_id) AS rn
      FROM fp)
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_survivors,
           CAST(sum(CASE WHEN rn > 1 THEN n_chars ELSE 0 END) AS BIGINT)
             AS chars_dropped
    FROM r GROUP BY source ORDER BY source
    """,
    doc="Quality-policy survivor selection for exact dedup: within each "
        "verbatim-duplicate group (md5 of whitespace/case-normalized "
        "text) KEEP THE BEST copy — longest n_chars, doc_id as the "
        "deterministic tie-break — instead of the min-id convention the "
        "other dedup entries use. The policy knob matters in practice: "
        "duplicate crawls often differ in truncation, and keep-first "
        "silently prefers whichever shard enumerated first; keep-best "
        "preserves the most complete copy. Reports per source how many "
        "docs survive and how many characters of redundant text the "
        "policy drops (the ROI view dedup_token_savings gives for "
        "keep-one, here under the quality policy). Scale shape: one "
        "fingerprint shuffle; the ranking window partitions by fp "
        "(group size = duplicate multiplicity, never corpus size); the "
        "per-source rollup partial-aggregates map-side; text bytes "
        "never shuffle (only the 16-byte fp and n_chars move).",
    tags=("llm-pipeline",),
)
def dedup_keep_best_quality(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    fp = docs.select(
        "doc_id", "source", "n_chars",
        F.md5(
            F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
        ).alias("fp"),
    )
    w = W.partitionBy("fp").orderBy(
        F.desc("n_chars"), F.col("doc_id").asc()
    )
    ranked = fp.withColumn("rn", F.row_number().over(w))
    return (
        ranked.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("rn") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_survivors"),
            F.sum(F.when(F.col("rn") > 1, F.col("n_chars")).otherwise(0))
            .cast("bigint")
            .alias("chars_dropped"),
        )
        .orderBy("source")
    )


@register(
    "share_of_parent_hierarchy",
    """
    WITH rev AS (
      SELECT r_name, n_name,
             sum(l_extendedprice * (1 - l_discount)) AS rev
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name)
    SELECT r_name, n_name, round(rev, 2) AS nation_rev,
           round(rev / sum(rev) OVER (PARTITION BY r_name), 6)
             AS share_of_region,
           round(sum(rev) OVER (PARTITION BY r_name) / sum(rev) OVER (),
                 6) AS region_share_of_total
    FROM rev ORDER BY r_name, n_name
    """,
    doc="Nested share-of-parent reporting: each nation's revenue share "
        "WITHIN its region and each region's share of the grand total, "
        "in one result — the two-level ratio card every BI rollup "
        "renders (revenue_share_by_nation covers the single-level "
        "share). The oracle uses a bare `OVER ()` for the grand total; "
        "the Spark plan does NOT — the global sum is the repo's 1-row "
        "broadcast-cross pattern, and the only window partitions by "
        "r_name over the dims-bounded (region, nation) aggregate "
        "(25 rows at any SF; |regions| x |nations| forever). Scale "
        "shape: facts reduce through the broadcast-dim star join and "
        "ONE partial-combinable aggregate before any ratio math; no "
        "unpartitioned window anywhere (plan-gated), no second fact "
        "pass for the total.",
    tags=("analytics", "sql-surface"),
)
def share_of_parent_hierarchy(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    rev = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("rev")
        )
    )
    tot = rev.agg(F.sum("rev").alias("tot"))
    wr = W.partitionBy("r_name")
    return (
        rev.join(F.broadcast(tot))
        .select(
            "r_name", "n_name",
            F.round("rev", 2).alias("nation_rev"),
            F.round(F.col("rev") / F.sum("rev").over(wr), 6).alias(
                "share_of_region"
            ),
            F.round(F.sum("rev").over(wr) / F.col("tot"), 6).alias(
                "region_share_of_total"
            ),
        )
        .orderBy("r_name", "n_name")
    )


@register(
    "topk_with_ties_per_group",
    """
    WITH r AS (
      SELECT l_returnflag, l_quantity,
             rank() OVER (PARTITION BY l_returnflag
                          ORDER BY l_quantity DESC) AS rnk
      FROM lineitem)
    SELECT l_returnflag, rnk, l_quantity,
           CAST(count(*) AS BIGINT) AS n_tied
    FROM r WHERE rnk <= 3
    GROUP BY l_returnflag, rnk, l_quantity
    ORDER BY l_returnflag, rnk, l_quantity
    """,
    doc="Top-N WITH TIES per group — the FETCH FIRST 3 ROWS WITH TIES "
        "semantics: RANK() <= 3 keeps EVERY row tied at the boundary "
        "value, where the row_number formulation "
        "(window_row_number_topn) cuts an arbitrary subset of the tie "
        "class — the classic silent-wrongness bug when porting Top-N "
        "reports between engines. Reported as (rank, value, tie-class "
        "size) so the output is deterministic regardless of tie "
        "multiplicity. Scale shape: one returnflag-partitioned window "
        "(the group-key partitioning every per-group rank rides), the "
        "rank filter applies before the tiny tie-class aggregate; "
        "2-column scan.",
    tags=("sql-surface",),
)
def topk_with_ties_per_group(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_returnflag").orderBy(F.desc("l_quantity"))
    return (
        li.select("l_returnflag", "l_quantity")
        .withColumn("rnk", F.rank().over(w))
        .filter(F.col("rnk") <= 3)
        .groupBy("l_returnflag", "rnk", "l_quantity")
        .agg(F.count("*").cast("bigint").alias("n_tied"))
        .orderBy("l_returnflag", "rnk", "l_quantity")
    )


@register(
    "interval_union_coverage",
    """
    WITH sp AS (
      SELECT user_id, epoch_us(ts) AS s,
             epoch_us(ts) + CAST(floor(value * 1000000) AS BIGINT) AS e
      FROM events WHERE event_type = 'view'),
    f AS (
      SELECT user_id, s, e,
             max(e) OVER (PARTITION BY user_id ORDER BY s, e
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS prev_max_e
      FROM sp),
    g AS (
      SELECT user_id, s, e,
             CASE WHEN prev_max_e IS NULL OR s > prev_max_e
                  THEN 1 ELSE 0 END AS new_island
      FROM f),
    h AS (
      SELECT user_id, s, e,
             sum(new_island) OVER (PARTITION BY user_id ORDER BY s, e
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND
                                   CURRENT ROW) AS island
      FROM g),
    i AS (
      SELECT user_id, island, min(s) AS is_s, max(e) AS is_e
      FROM h GROUP BY user_id, island)
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_spans,
           CAST(sum(is_e - is_s) AS BIGINT) AS covered_us
    FROM i GROUP BY user_id ORDER BY user_id
    """,
    doc="Interval UNION per user (merge overlapping spans): each view "
        "event claims [ts, ts + value seconds]; overlapping claims "
        "merge into islands and the user's true covered time is the "
        "sum of island lengths — double-count-free watch-time, the "
        "gaps-and-islands MERGE variant (sessionize_30min SPLITS by "
        "gap; this coalesces by overlap, the other half of the "
        "pattern). Implementation both engines share: running "
        "max-of-end over the user's span order; a span whose start "
        "exceeds every previous end opens a new island; island id is "
        "the running flag sum. Exact integer microsecond arithmetic "
        "end to end — span ends use floor(value*1e6) explicitly "
        "because Spark's double->bigint CAST truncates while DuckDB's "
        "rounds (a cross-engine trap this entry pins away). Scale "
        "shape: ONE user_id exchange serves all three window passes "
        "and the island aggregate (same partitioning, same sort); no "
        "join; per-user state is one running max.",
    tags=("analytics", "sql-surface"),
)
def interval_union_coverage(spark, sf_dir):
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type") == "view"
    )
    sp = ev.select(
        "user_id",
        F.unix_micros("ts").alias("s"),
        (
            F.unix_micros("ts")
            + F.floor(F.col("value") * 1_000_000).cast("bigint")
        ).alias("e"),
    )
    wo = W.partitionBy("user_id").orderBy("s", "e")
    wprev = wo.rowsBetween(W.unboundedPreceding, -1)
    flagged = sp.withColumn(
        "prev_max_e", F.max("e").over(wprev)
    ).withColumn(
        "new_island",
        F.when(
            F.col("prev_max_e").isNull()
            | (F.col("s") > F.col("prev_max_e")),
            1,
        ).otherwise(0),
    )
    isl = flagged.withColumn(
        "island",
        F.sum("new_island").over(
            wo.rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    per_island = isl.groupBy("user_id", "island").agg(
        F.min("s").alias("is_s"), F.max("e").alias("is_e")
    )
    return (
        per_island.groupBy("user_id")
        .agg(
            F.count("*").cast("bigint").alias("n_spans"),
            F.sum(F.col("is_e") - F.col("is_s"))
            .cast("bigint")
            .alias("covered_us"),
        )
        .orderBy("user_id")
    )


@register(
    "interval_month_end_clamp_audit",
    """
    WITH d AS (
      SELECT o_orderdate AS d0,
             o_orderdate + INTERVAL 1 MONTH AS m1,
             (o_orderdate + INTERVAL 1 MONTH) - INTERVAL 1 MONTH AS rt,
             o_orderdate + INTERVAL 1 YEAR AS y1
      FROM orders)
    SELECT day(d0) AS dom, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN day(m1) <> day(d0) THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clamp_1mo,
           CAST(sum(CASE WHEN rt <> d0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_noninvertible,
           CAST(sum(CASE WHEN day(y1) <> day(d0) THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clamp_1yr
    FROM d GROUP BY dom ORDER BY dom
    """,
    doc="INTERVAL month/year arithmetic month-end-clamp audit (r13 "
        "verdict #7 interval-edge batch): per day-of-month, how many "
        "+1 MONTH results clamp to a shorter month's end (day 29/30/31 "
        "into February &co), how many round-trips (+1 MONTH then "
        "-1 MONTH) are NOT the identity — the subtle data-pipeline trap "
        "where a 'shift and shift back' date normalization silently "
        "moves month-end timestamps — and how many +1 YEAR results "
        "clamp (exactly the Feb 29 leap rows; fixture spans 1995-2001 "
        "with leap years 1996/2000). Pins that Spark and DuckDB share "
        "the clamp-to-month-end convention at every edge. One map-side "
        "pass over one column to a 31-group aggregate: partials "
        "combine, nothing but (dom, 4 counters) shuffles at any scale.",
    tags=("sql-surface", "capability"),
)
def interval_month_end_clamp_audit(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    d0 = F.col("o_orderdate")
    m1 = F.expr("o_orderdate + INTERVAL 1 MONTH")
    rt = F.expr("(o_orderdate + INTERVAL 1 MONTH) - INTERVAL 1 MONTH")
    y1 = F.expr("o_orderdate + INTERVAL 1 YEAR")
    clamp = lambda x: F.when(
        F.dayofmonth(x) != F.dayofmonth(d0), 1).otherwise(0)
    return (
        o.select(
            F.dayofmonth(d0).alias("dom"),
            clamp(m1).alias("c1"),
            F.when(rt != d0, 1).otherwise(0).alias("ni"),
            clamp(y1).alias("cy"),
        )
        .groupBy("dom")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("c1").cast("bigint").alias("n_clamp_1mo"),
            F.sum("ni").cast("bigint").alias("n_noninvertible"),
            F.sum("cy").cast("bigint").alias("n_clamp_1yr"),
        )
        .orderBy("dom")
    )


@register(
    "try_to_timestamp_parse_audit",
    """
    WITH s AS (
      SELECT event_id % 6 AS variant,
        CASE event_id % 6
          WHEN 0 THEN strftime(ts, '%Y-%m-%d %H:%M:%S')
          WHEN 1 THEN strftime(ts, '%Y-%m-%d')
          WHEN 2 THEN strftime(ts, '%Y-%m-%dT%H:%M:%S')
          WHEN 3 THEN substr(strftime(ts, '%Y-%m-%d %H:%M:%S'), 1, 5)
                      || '13'
                      || substr(strftime(ts, '%Y-%m-%d %H:%M:%S'), 8)
          WHEN 4 THEN strftime(ts, '%Y-%m-%d %H:%M:%S') || ' junk'
          ELSE '  ' || strftime(ts, '%Y-%m-%d %H:%M:%S') || '  '
        END AS raw
      FROM events)
    SELECT variant, CAST(count(*) AS BIGINT) AS n,
           CAST(count(TRY_CAST(raw AS TIMESTAMP)) AS BIGINT) AS n_parsed,
           min(TRY_CAST(raw AS TIMESTAMP)) AS min_parsed,
           max(TRY_CAST(raw AS TIMESTAMP)) AS max_parsed
    FROM s GROUP BY variant ORDER BY variant
    """,
    doc="TRY_CAST string->TIMESTAMP parse audit — the timestamp twin "
        "of try_cast_decimal_parse_audit (r13 verdict #7): six "
        "deterministic re-renderings of the event time (full ISO, "
        "date-only, 'T'-separated, month corrupted to 13, trailing "
        "junk token, whitespace-padded) are parsed with error-safe "
        "casts; the audit reports parse yield and the min/max of what "
        "parsed, per variant. Pins the agreeing edges cross-engine: "
        "date-only and 'T' forms parse, surrounding whitespace is "
        "trimmed, month-13 and trailing-junk -> NULL (not an error). "
        "The ONE divergent edge is deliberately excluded and "
        "documented: a minute-only literal ('... 06:30') parses in "
        "Spark but is NULL in DuckDB — pipelines must render seconds. "
        "One map-side pass over (event_id, ts) to a 6-group aggregate; "
        "the derived strings never shuffle.",
    tags=("sql-surface", "capability"),
)
def try_to_timestamp_parse_audit(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    iso = F.date_format("ts", "yyyy-MM-dd HH:mm:ss")
    v = F.col("event_id") % 6
    raw = (
        F.when(v == 0, iso)
        .when(v == 1, F.date_format("ts", "yyyy-MM-dd"))
        .when(v == 2, F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss"))
        .when(v == 3, F.concat(F.substring(iso, 1, 5), F.lit("13"),
                               F.substring(iso, 8, 12)))
        .when(v == 4, F.concat(iso, F.lit(" junk")))
        .otherwise(F.concat(F.lit("  "), iso, F.lit("  ")))
    )
    parsed = F.expr("TRY_CAST(raw AS TIMESTAMP)")
    return (
        ev.select(v.alias("variant"), raw.alias("raw"))
        .groupBy("variant")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.count(parsed).cast("bigint").alias("n_parsed"),
            F.min(parsed).alias("min_parsed"),
            F.max(parsed).alias("max_parsed"),
        )
        .orderBy("variant")
    )


@register(
    "iso_week_year_boundary_audit",
    """
    WITH w AS (
      SELECT o_orderdate AS d FROM orders
      WHERE (month(o_orderdate) = 1 AND day(o_orderdate) <= 7)
         OR (month(o_orderdate) = 12 AND day(o_orderdate) >= 25))
    SELECT CAST(isoyear(d) AS INTEGER) AS iso_year,
           CAST(weekofyear(d) AS INTEGER) AS iso_week,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT CAST(d AS DATE)) AS BIGINT) AS n_days,
           CAST(min(d) AS TIMESTAMP) AS first_d,
           CAST(max(d) AS TIMESTAMP) AS last_d
    FROM w GROUP BY iso_year, iso_week ORDER BY iso_year, iso_week
    """,
    doc="ISO week-numbering year-boundary audit: rows within a week of "
        "New Year are attributed to (isoyear, isoweek) — the calendar "
        "edge where Jan 1 can belong to week 52/53 of the PREVIOUS iso "
        "year (1995-01-01 -> 1994-W52) and Dec 29-31 to week 1 of the "
        "NEXT (1997-12-29 -> 1998-W01). Pins that Spark's "
        "extract(YEAROFWEEK)/weekofyear and DuckDB's isoyear/weekofyear "
        "share full ISO-8601 semantics across all seven year boundaries "
        "in the fixture — the correctness precondition for any weekly "
        "rollup joining across engines. Filter is map-side on one "
        "column; the aggregate has at most ~2 groups per boundary.",
    tags=("sql-surface", "capability"),
)
def iso_week_year_boundary_audit(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    w = o.filter(
        ((F.month(d) == 1) & (F.dayofmonth(d) <= 7))
        | ((F.month(d) == 12) & (F.dayofmonth(d) >= 25))
    )
    return (
        w.select(
            F.expr("extract(YEAROFWEEK FROM o_orderdate)")
            .cast("int").alias("iso_year"),
            F.weekofyear(d).cast("int").alias("iso_week"),
            d.alias("d"),
        )
        .groupBy("iso_year", "iso_week")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.countDistinct(F.col("d").cast("date"))
            .cast("bigint").alias("n_days"),
            F.min("d").alias("first_d"),
            F.max("d").alias("last_d"),
        )
        .orderBy("iso_year", "iso_week")
    )


@register(
    "calendar_truncation_grid",
    """
    WITH q AS (
      SELECT CAST(date_trunc('quarter', o_orderdate) AS TIMESTAMP)
               AS quarter,
             date_trunc('week', o_orderdate) AS wk
      FROM orders)
    SELECT quarter, CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT wk) AS BIGINT) AS n_week_starts,
           CAST(min(wk) AS TIMESTAMP) AS first_week,
           CAST(last_day(CAST(quarter AS DATE)) AS TIMESTAMP)
             AS q_month1_end
    FROM q GROUP BY quarter ORDER BY quarter
    """,
    doc="Calendar truncation consistency grid: per quarter bucket, the "
        "count of distinct ISO week starts it spans and the first week "
        "start (which usually lies in the PREVIOUS quarter — Monday "
        "truncation crosses the quarter boundary), plus last_day of the "
        "quarter's first month (pinning last_day on the Feb-of-leap-year "
        "quarters: 1996-02-29 / 2000-02-29). Pins date_trunc "
        "week/quarter and last_day agreement between engines — the trio "
        "every calendar-rollup dashboard composes. Single pass, 27 "
        "quarter groups; count(DISTINCT week) partial-aggregates on "
        "(quarter, week) pairs bounded by ~14 weeks per quarter.",
    tags=("sql-surface", "capability"),
)
def calendar_truncation_grid(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    q = F.date_trunc("quarter", F.col("o_orderdate"))
    wk = F.date_trunc("week", F.col("o_orderdate"))
    return (
        o.select(q.alias("quarter"), wk.alias("wk"))
        .groupBy("quarter")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.countDistinct("wk").cast("bigint").alias("n_week_starts"),
            F.min("wk").alias("first_week"),
        )
        .withColumn(
            "q_month1_end",
            F.last_day(F.col("quarter").cast("date")).cast("timestamp"),
        )
        .select("quarter", "n", "n_week_starts", "first_week",
                "q_month1_end")
        .orderBy("quarter")
    )


@register(
    "integer_division_modulo_sign_audit",
    """
    WITH s AS (
      SELECT (l_orderkey % 97) - 48 AS a,
             CASE l_linenumber % 3
               WHEN 0 THEN 7 WHEN 1 THEN -7 ELSE 13 END AS b
      FROM lineitem)
    SELECT b, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(a // b) AS BIGINT) AS sum_div,
           CAST(sum(a % b) AS BIGINT) AS sum_mod,
           CAST(sum(CASE WHEN a % b <> 0 AND sign(a % b) <> sign(a)
                         THEN 1 ELSE 0 END) AS BIGINT)
             AS n_mod_sign_flip,
           CAST(sum(CASE WHEN (a // b) * b + (a % b) <> a
                         THEN 1 ELSE 0 END) AS BIGINT)
             AS n_identity_broken
    FROM s GROUP BY b ORDER BY b
    """,
    doc="Integer division / modulo sign-convention audit over signed "
        "operands (both negative dividends and negative divisors): "
        "pins that Spark's `div`/`%` and DuckDB's `//`/`%` share "
        "C-style truncate-toward-zero division with dividend-signed "
        "remainder — n_mod_sign_flip is structurally 0 under that "
        "convention (a floor-mod engine would count every "
        "negative-dividend row) and the Euclidean identity "
        "(a div b)*b + a%b = a holds for every row. The silent "
        "corruption class this guards: bucketing signed keys with % "
        "produces NEGATIVE buckets under both engines — pipelines "
        "must pmod/abs first, and this entry is the cross-engine "
        "proof the audit assumption holds. One map-side pass, 3 "
        "divisor groups.",
    tags=("sql-surface", "capability"),
)
def integer_division_modulo_sign_audit(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    a = (F.col("l_orderkey") % 97 - 48).alias("a")
    b = (
        F.when(F.col("l_linenumber") % 3 == 0, 7)
        .when(F.col("l_linenumber") % 3 == 1, -7)
        .otherwise(13)
    ).alias("b")
    s = li.select(a, b)
    dv = F.expr("a div b")
    md = F.col("a") % F.col("b")
    return (
        s.groupBy("b")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(dv).cast("bigint").alias("sum_div"),
            F.sum(md).cast("bigint").alias("sum_mod"),
            F.sum(
                F.when(
                    (md != 0) & (F.signum(md) != F.signum(F.col("a"))), 1
                ).otherwise(0)
            ).cast("bigint").alias("n_mod_sign_flip"),
            F.sum(
                F.when(dv * F.col("b") + md != F.col("a"), 1).otherwise(0)
            ).cast("bigint").alias("n_identity_broken"),
        )
        .orderBy("b")
    )


@register(
    "round_half_boundary_audit",
    """
    WITH s AS (
      SELECT (l_orderkey % 9) - 4 AS a FROM lineitem)
    SELECT a, CAST(count(*) AS BIGINT) AS n,
           round(a + CAST(0.5 AS DOUBLE)) AS r_half_up,
           round(a - CAST(0.5 AS DOUBLE)) AS r_half_down,
           round(a + CAST(0.25 AS DOUBLE), 1) AS r_q1,
           round(a + CAST(0.75 AS DOUBLE), 1) AS r_q3
    FROM s GROUP BY a ORDER BY a
    """,
    doc="round() half-boundary audit on EXACTLY representable "
        "fractions (quarters — the only doubles where the .5 tie is "
        "real rather than a representation artifact): for integer a in "
        "[-4, 4], both engines round a±0.5 away from zero (2.5 -> 3, "
        "-2.5 -> -3: HALF_UP on magnitude, NOT banker's rounding) and "
        "the scaled quarters a+0.25/a+0.75 at one decimal place the "
        "same way. The divergence this would catch: an engine "
        "switching DOUBLE rounding to IEEE half-even (numpy/C default) "
        "breaks every *.5 revenue threshold cross-engine. Values "
        "derived from exact quarters only — a 0.05-style literal "
        "whose double is off-tie would pin representation, not "
        "rounding. Map-side to a 9-group aggregate; the rounded "
        "columns are functions of the group key.",
    tags=("sql-surface", "capability"),
)
def round_half_boundary_audit(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    s = li.select((F.col("l_orderkey") % 9 - 4).alias("a"))
    half = F.lit(0.5).cast("double")
    q1 = F.lit(0.25).cast("double")
    q3 = F.lit(0.75).cast("double")
    return (
        s.groupBy("a")
        .agg(F.count("*").cast("bigint").alias("n"))
        .withColumn("r_half_up", F.round(F.col("a") + half, 0))
        .withColumn("r_half_down", F.round(F.col("a") - half, 0))
        .withColumn("r_q1", F.round(F.col("a") + q1, 1))
        .withColumn("r_q3", F.round(F.col("a") + q3, 1))
        .select("a", "n", "r_half_up", "r_half_down", "r_q1", "r_q3")
        .orderBy("a")
    )


@register(
    "epoch_micros_span_audit",
    """
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           round(1700000000 +
                 CAST(sum(epoch_us(ts) - 1700000000000000) AS DOUBLE)
                 / count(*) / 1000000, 3) AS mean_epoch_s,
           CAST(max(epoch_us(ts)) - min(epoch_us(ts)) AS BIGINT)
             AS span_us
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    doc="Epoch-microsecond instant arithmetic parity: per event type, "
        "the mean wall-clock instant (exact int64 sum of epoch micros, "
        "ONE double rounding at the division) and the exact micro-"
        "second span. Pins that DuckDB's epoch_us equals Spark's "
        "unix_micros after the NTZ->instant normalization every "
        "time-keyed entry rides (base.normalize_event_ts; UTC session "
        "makes the wall clocks identical) — the parity precondition "
        "for sessionization, watermarks and as-of joins. The exact-"
        "int-sum formulation (not avg(double)) removes accumulation-"
        "order nondeterminism from the oracle compare; micros are "
        "REBASED to a 2023-11 epoch before summing because a raw "
        "int64 micro-sum overflows past ~5k rows per group under "
        "ANSI Spark (caught at sf0.1) — the residual sum stays exact "
        "to ~2M rows/group, and beyond that the same rebase composes "
        "with per-partition partial means. Map-side to a 5-group "
        "aggregate.",
    tags=("sql-surface", "capability"),
)
def epoch_micros_span_audit(spark, sf_dir):
    ev = normalize_event_ts(load(spark, sf_dir, "events"))
    us = F.unix_micros(F.col("ts"))
    base = 1_700_000_000_000_000
    return (
        ev.select("event_type", us.alias("us"))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.round(
                F.lit(1_700_000_000)
                + F.sum(F.col("us") - F.lit(base)).cast("double")
                / F.count("*") / F.lit(1000000),
                3,
            ).alias("mean_epoch_s"),
            (F.max("us") - F.min("us")).cast("bigint").alias("span_us"),
        )
        .orderBy("event_type")
    )


@register(
    "like_escape_wildcard_audit",
    """
    WITH s AS (
      SELECT o_orderpriority AS prio,
             o_orderpriority ||
             CASE o_orderkey % 4
               WHEN 0 THEN '100%' WHEN 1 THEN '1_0'
               WHEN 2 THEN '1x0' ELSE '10%x' END AS s
      FROM orders)
    SELECT prio, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN s LIKE '%100!%%' ESCAPE '!'
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_lit_pct,
           CAST(sum(CASE WHEN s LIKE '%1!_0' ESCAPE '!'
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_lit_us,
           CAST(sum(CASE WHEN s LIKE '%1_0' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_wild_us,
           CAST(sum(CASE WHEN s LIKE '%!%%' ESCAPE '!'
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_any_pct
    FROM s GROUP BY prio ORDER BY prio
    """,
    doc="LIKE wildcard-escape audit: strings carrying literal '%' and "
        "'_' are matched with an explicit ESCAPE '!' clause — escaped "
        "'!%'/'!_' match only the literal characters while the bare "
        "'_' pattern matches any byte ('%1_0' catches both '1_0' and "
        "'1x0'). The '!' escape character is chosen deliberately: a "
        "backslash escape would be REWRITTEN by Spark's string-literal "
        "parser before LIKE ever sees it while DuckDB passes it "
        "through verbatim — the one place the same oracle text would "
        "mean different patterns — so portable SQL must pick a "
        "non-backslash escape (documented divergence, excluded by "
        "construction). Map-side regex-free matching into a 5-group "
        "aggregate.",
    tags=("sql-surface", "capability"),
)
def like_escape_wildcard_audit(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    s = F.concat(
        F.col("o_orderpriority"),
        F.when(F.col("o_orderkey") % 4 == 0, F.lit("100%"))
        .when(F.col("o_orderkey") % 4 == 1, F.lit("1_0"))
        .when(F.col("o_orderkey") % 4 == 2, F.lit("1x0"))
        .otherwise(F.lit("10%x")),
    )
    d = o.select(F.col("o_orderpriority").alias("prio"), s.alias("s"))
    like = lambda pat: F.expr(f"s LIKE '{pat}' ESCAPE '!'")
    cnt = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("bigint")
    return (
        d.groupBy("prio")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            cnt(like("%100!%%")).alias("n_lit_pct"),
            cnt(like("%1!_0")).alias("n_lit_us"),
            cnt(F.col("s").like("%1_0")).alias("n_wild_us"),
            cnt(like("%!%%")).alias("n_any_pct"),
        )
        .orderBy("prio")
    )


@register(
    "null_ordering_explicit_audit",
    """
    WITH r AS (
      SELECT event_type, value, event_id,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value ASC NULLS FIRST,
                                         event_id) AS rn_nf,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value ASC NULLS LAST,
                                         event_id) AS rn_nl
      FROM events)
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_null,
           min(CASE WHEN rn_nf = 1 THEN
                 CASE WHEN value IS NULL THEN 'NULL'
                      ELSE printf('%.3f', value) END END)
             AS first_nulls_first,
           min(CASE WHEN rn_nl = 1 THEN
                 CASE WHEN value IS NULL THEN 'NULL'
                      ELSE printf('%.3f', value) END END)
             AS first_nulls_last
    FROM r GROUP BY event_type ORDER BY event_type
    """,
    doc="Explicit NULL-ordering audit: the first row of each event "
        "type under ASC NULLS FIRST vs ASC NULLS LAST window orders "
        "(unique event_id tie-break). Pins that the EXPLICIT forms "
        "agree cross-engine — they must, because the DEFAULTS diverge "
        "(Spark ASC implies NULLS FIRST, DuckDB implies NULLS LAST), "
        "the classic silent-drift edge when porting ranking SQL: every "
        "registry window that orders a nullable key spells its null "
        "placement out, and this entry is the proof both engines honor "
        "it. The NULL label is gated by an explicit IS NULL check, not "
        "printf-of-NULL (Spark format_string renders a null argument "
        "as text while DuckDB printf propagates NULL — a second "
        "documented divergence, excluded by construction). One "
        "event_type exchange shared by both window passes and the "
        "aggregate.",
    tags=("sql-surface", "capability"),
)
def null_ordering_explicit_audit(spark, sf_dir):
    ev = normalize_event_ts(load(spark, sf_dir, "events"))
    wnf = W.partitionBy("event_type").orderBy(
        F.col("value").asc_nulls_first(), "event_id")
    wnl = W.partitionBy("event_type").orderBy(
        F.col("value").asc_nulls_last(), "event_id")
    fmt = F.when(F.col("value").isNull(), F.lit("NULL")).otherwise(
        F.format_string("%.3f", F.col("value")))
    r = ev.select(
        "event_type", "value", "event_id",
        F.row_number().over(wnf).alias("rn_nf"),
        F.row_number().over(wnl).alias("rn_nl"),
        fmt.alias("fmt"),
    )
    return (
        r.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(F.when(F.col("value").isNull(), 1).otherwise(0))
            .cast("bigint").alias("n_null"),
            F.min(F.when(F.col("rn_nf") == 1, F.col("fmt")))
            .alias("first_nulls_first"),
            F.min(F.when(F.col("rn_nl") == 1, F.col("fmt")))
            .alias("first_nulls_last"),
        )
        .orderBy("event_type")
    )


@register(
    "binary_collation_rank_audit",
    """
    WITH s AS (
      SELECT CASE l_orderkey % 10
               WHEN 0 THEN ' lead'   WHEN 1 THEN '0digit'
               WHEN 2 THEN 'APPLE'   WHEN 3 THEN 'Apple'
               WHEN 4 THEN 'B'       WHEN 5 THEN 'Z'
               WHEN 6 THEN 'a'       WHEN 7 THEN 'app'
               WHEN 8 THEN 'apple'   ELSE chr(233) || 'accent'
             END AS tok
      FROM lineitem)
    SELECT tok, CAST(ascii(tok) AS INTEGER) AS first_cp,
           CAST(count(*) AS BIGINT) AS n
    FROM s GROUP BY tok ORDER BY tok
    """,
    doc="Binary (codepoint) collation audit: ten tokens spanning "
        "space < digits < uppercase < lowercase < tilde-range < "
        "multi-byte (chr(233), U+00E9) are emitted in engine sort "
        "order — the ROW ORDER is the assertion, since the driver "
        "hashes rows in result order. Pins that Spark's UTF8_BINARY "
        "default and DuckDB's binary default agree byte-for-byte "
        "('APPLE' < 'Apple' < 'a...', prefixes first, accents after "
        "ASCII) — the stability contract behind keyset-pagination "
        "cursors and the zone map's string brackets: a locale-aware "
        "collation on either side would silently reorder pages and "
        "unsound-skip files. ascii() doubles as the codepoint witness. "
        "Map-side CASE into a 10-group aggregate.",
    tags=("sql-surface", "capability"),
)
def binary_collation_rank_audit(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    k = F.col("l_orderkey") % 10
    tok = (
        F.when(k == 0, " lead").when(k == 1, "0digit")
        .when(k == 2, "APPLE").when(k == 3, "Apple")
        .when(k == 4, "B").when(k == 5, "Z")
        .when(k == 6, "a").when(k == 7, "app")
        .when(k == 8, "apple")
        .otherwise(F.concat(F.expr("chr(233)"), F.lit("accent")))
    )
    return (
        li.select(tok.alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").cast("bigint").alias("n"))
        .withColumn("first_cp", F.ascii("tok").cast("int"))
        .select("tok", "first_cp", "n")
        .orderBy("tok")
    )


@register(
    "between_bounds_semantics_audit",
    """
    WITH s AS (
      SELECT l_returnflag AS rf, l_quantity AS q,
             CASE WHEN l_linenumber % 5 = 0 THEN NULL
                  ELSE l_quantity END AS qn
      FROM lineitem)
    SELECT rf, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN q BETWEEN 10 AND 20
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_between,
           CAST(sum(CASE WHEN q >= 10 AND q <= 20
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_explicit,
           CAST(sum(CASE WHEN q BETWEEN 20 AND 10
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_reversed,
           CAST(sum(CASE WHEN qn BETWEEN 10 AND 20
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_null_in,
           CAST(sum(CASE WHEN qn NOT BETWEEN 10 AND 20
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_null_out,
           CAST(sum(CASE WHEN (qn BETWEEN 10 AND 20) IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_unknown
    FROM s GROUP BY rf ORDER BY rf
    """,
    doc="BETWEEN predicate semantics audit — the cross-engine contract "
        "behind the gate's BETWEEN->range rewrite (round 14): both ends "
        "INCLUSIVE (n_between == n_explicit per group), reversed bounds "
        "are an empty range, never auto-swapped (n_reversed == 0), and "
        "a NULL operand makes the predicate UNKNOWN under three-valued "
        "logic — excluded from both the BETWEEN and NOT BETWEEN counts, "
        "so n_null_in + n_null_out + n_unknown == n per group. The "
        "pipeline trap pinned: filtering with NOT BETWEEN does NOT "
        "return the NULL rows, the dual of not_in_null_trap. One "
        "map-side pass to a 3-group aggregate.",
    tags=("sql-surface", "capability"),
)
def between_bounds_semantics_audit(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    s = li.select(
        F.col("l_returnflag").alias("rf"),
        F.col("l_quantity").alias("q"),
        F.when(F.col("l_linenumber") % 5 == 0, None)
        .otherwise(F.col("l_quantity")).alias("qn"),
    )
    cnt = lambda cond: F.sum(F.when(cond, 1).otherwise(0)).cast("bigint")
    return (
        s.groupBy("rf")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            cnt(F.expr("q BETWEEN 10 AND 20")).alias("n_between"),
            cnt((F.col("q") >= 10) & (F.col("q") <= 20))
            .alias("n_explicit"),
            cnt(F.expr("q BETWEEN 20 AND 10")).alias("n_reversed"),
            cnt(F.expr("qn BETWEEN 10 AND 20")).alias("n_null_in"),
            cnt(F.expr("qn NOT BETWEEN 10 AND 20")).alias("n_null_out"),
            cnt(F.expr("(qn BETWEEN 10 AND 20) IS NULL"))
            .alias("n_unknown"),
        )
        .orderBy("rf")
    )


@register(
    "decimal_exact_sum_audit",
    """
    WITH s AS (
      SELECT l_returnflag AS rf,
             CAST(l_extendedprice AS DECIMAL(14,2)) AS p,
             CAST(l_discount AS DECIMAL(4,2)) AS d
      FROM lineitem)
    SELECT rf, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(p) AS DOUBLE) AS sum_p,
           CAST(sum(p * (CAST(1.00 AS DECIMAL(4,2)) - d)) AS DOUBLE)
             AS sum_net,
           CAST(min(p) AS DOUBLE) AS min_p,
           CAST(max(p) AS DOUBLE) AS max_p
    FROM s GROUP BY rf ORDER BY rf
    """,
    doc="Exact decimal aggregation parity (reference stores prices as "
        "parquet DOUBLE and aggregates in float — "
        "storage/parquet_writer.go value path; this pins the engine's "
        "EXACT alternative): prices cast to DECIMAL(14,2) (lossless — "
        "the fixture doubles carry two decimal places, and the target "
        "scale >= source scale means no rounding can occur on either "
        "engine), discount factor (1.00 - d) and the product kept in "
        "exact decimal (scale 4), summed with NO float drift, and only "
        "the FINAL one-row-per-group values cast to DOUBLE (lossless "
        "below 2**53 in units of 1e-4: sf1's ~6e9 total is 6e13 "
        "ten-thousandths, three orders under the cliff; the sum order "
        "never matters because decimal addition is associative — the "
        "float-sum q1 variant's partial-aggregation tolerance is "
        "exactly what this entry does NOT need). Spark's ANSI decimal "
        "widening (sum of DECIMAL(20,4) -> DECIMAL(30,4)) never "
        "overflows here. Map-side partial aggregation to 3 groups.",
    tags=("sql-surface", "capability"),
)
def decimal_exact_sum_audit(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    s = li.selectExpr(
        "l_returnflag AS rf",
        "CAST(l_extendedprice AS DECIMAL(14,2)) AS p",
        "CAST(l_discount AS DECIMAL(4,2)) AS d",
    )
    return (
        s.groupBy("rf")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("p").cast("double").alias("sum_p"),
            F.sum(F.expr("p * (CAST(1.00 AS DECIMAL(4,2)) - d)"))
            .cast("double").alias("sum_net"),
            F.min("p").cast("double").alias("min_p"),
            F.max("p").cast("double").alias("max_p"),
        )
        .orderBy("rf")
    )


@register(
    "decimal_rescale_halfup_audit",
    """
    WITH s AS (
      SELECT CAST((l_orderkey % 19) - 9 AS DECIMAL(10,0)) AS k,
             CASE l_linenumber % 4
               WHEN 0 THEN CAST(0.05 AS DECIMAL(10,2))
               WHEN 1 THEN CAST(0.25 AS DECIMAL(10,2))
               WHEN 2 THEN CAST(0.55 AS DECIMAL(10,2))
               ELSE CAST(0.75 AS DECIMAL(10,2)) END AS f
      FROM lineitem),
    v AS (
      SELECT k + (CASE WHEN k < 0 THEN -f ELSE f END) AS q FROM s)
    SELECT CAST(q AS DOUBLE) AS q, CAST(count(*) AS BIGINT) AS n,
           CAST(round(q, 1) AS DOUBLE) AS r1,
           CAST(round(q, 0) AS DOUBLE) AS r0
    FROM v GROUP BY q ORDER BY q
    """,
    doc="Decimal RESCALE rounding audit — and a documented cross-"
        "engine divergence the oracle must encode, not mirror: "
        "Spark's decimal(p,2) -> decimal(p,1)/(p,0) CAST rounds "
        "HALF_UP away from zero (probed: 2.25 -> 2.3, -2.25 -> -2.3, "
        "2.35 -> 2.4), but DuckDB's OWN decimal-to-decimal cast "
        "TRUNCATES ties and everything else toward zero (probed: "
        "2.25 -> 2.2, 2.35 -> 2.3) — so the oracle computes the "
        "ground truth with DuckDB's round(q, n), which IS half-away "
        "on decimals, while the Spark side runs the actual CAST. "
        "Operand construction keeps every tie REAL: integer k in "
        "[-9, 9] plus exact decimal fractions {.05, .25, .55, .75} "
        "applied away from zero, all exactly representable at scale "
        "2 — no double-representation artifacts anywhere (group key "
        "cast to DOUBLE only for output, after grouping on the exact "
        "decimal). The corruption class pinned: a pipeline porting "
        "price-band CASTs between the engines silently shifts every "
        "*.x5 boundary row one band down on DuckDB. Map-side pass to "
        "a 76-group aggregate, rounded columns are functions of the "
        "group key.",
    tags=("sql-surface", "capability"),
)
def decimal_rescale_halfup_audit(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    s = li.selectExpr(
        "CAST((l_orderkey % 19) - 9 AS DECIMAL(10,0)) AS k",
        "CASE l_linenumber % 4 "
        "WHEN 0 THEN CAST(0.05 AS DECIMAL(10,2)) "
        "WHEN 1 THEN CAST(0.25 AS DECIMAL(10,2)) "
        "WHEN 2 THEN CAST(0.55 AS DECIMAL(10,2)) "
        "ELSE CAST(0.75 AS DECIMAL(10,2)) END AS f",
    ).selectExpr("k + (CASE WHEN k < 0 THEN -f ELSE f END) AS q")
    return (
        s.groupBy("q")
        .agg(F.count("*").cast("bigint").alias("n"))
        .selectExpr(
            "CAST(q AS DOUBLE) AS q", "n",
            "CAST(CAST(q AS DECIMAL(12,1)) AS DOUBLE) AS r1",
            "CAST(CAST(q AS DECIMAL(12,0)) AS DOUBLE) AS r0",
        )
        .orderBy("q")
    )


@register(
    "string_integer_cast_grammar_audit",
    """
    WITH s AS (
      SELECT o_orderkey % 7 AS variant,
             CASE o_orderkey % 7
               WHEN 0 THEN CAST(o_orderkey AS VARCHAR)
               WHEN 1 THEN '  ' || CAST(o_orderkey AS VARCHAR) || ' '
               WHEN 2 THEN '+' || CAST(o_orderkey AS VARCHAR)
               WHEN 3 THEN printf('%.1f', o_totalprice)
               WHEN 4 THEN CAST(o_orderkey AS VARCHAR) || 'e2'
               WHEN 5 THEN printf('0x%x', o_orderkey)
               ELSE CAST(o_orderkey AS VARCHAR) || '00000000000000000000'
             END AS raw
      FROM orders),
    p AS (
      SELECT variant, raw,
             CASE WHEN regexp_matches(raw, '^\\s*[+-]?[0-9]+\\s*$')
                  THEN TRY_CAST(raw AS BIGINT) END AS v
      FROM s)
    SELECT variant, CAST(count(*) AS BIGINT) AS n,
           CAST(count(v) AS BIGINT) AS n_parsed,
           CAST(sum(v) AS BIGINT) AS sum_parsed
    FROM p GROUP BY variant ORDER BY variant
    """,
    doc="TRY_CAST string->BIGINT grammar audit — a probed, documented "
        "divergence the oracle must ENCODE, not mirror: Spark's "
        "integral cast accepts ONLY (whitespace-trimmed, optionally "
        "signed) digit runs, while DuckDB's integer cast also parses "
        "fractional strings WITH ROUNDING ('2.5' -> 3, '25.0' -> 25), "
        "hex ('0x1A' -> 26) and exponent forms ('1e2' -> 100) — so a "
        "raw TRY_CAST oracle would disagree on three of the seven "
        "variants, and the oracle instead gates DuckDB's cast behind "
        "Spark's grammar (regexp '^\\s*[+-]?digits\\s*$'). Variants: "
        "plain digits, padded, explicit plus (all parse on both), "
        "fractional / exponent / hex (Spark NULL; the corruption class "
        "pinned — an id column of '123.0'-style strings silently "
        "becomes data on one engine and NULLs on the other), and a "
        "27-digit run that passes the grammar but overflows int64 "
        "(TRY_CAST -> NULL on BOTH engines, the overflow edge through "
        "the same gate). One map-side pass, 7-group aggregate.",
    tags=("sql-surface", "capability"),
)
def string_integer_cast_grammar_audit(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    ks = k.cast("string")
    raw = (
        F.when(k % 7 == 0, ks)
        .when(k % 7 == 1, F.concat(F.lit("  "), ks, F.lit(" ")))
        .when(k % 7 == 2, F.concat(F.lit("+"), ks))
        .when(k % 7 == 3, F.format_string("%.1f", F.col("o_totalprice")))
        .when(k % 7 == 4, F.concat(ks, F.lit("e2")))
        .when(k % 7 == 5, F.format_string("0x%x", k))
        .otherwise(F.concat(ks, F.lit("00000000000000000000")))
    )
    s = o.select((k % 7).alias("variant"), raw.alias("raw"))
    v = F.expr("TRY_CAST(raw AS BIGINT)")
    return (
        s.groupBy("variant")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.count(v).cast("bigint").alias("n_parsed"),
            F.sum(v).cast("bigint").alias("sum_parsed"),
        )
        .orderBy("variant")
    )


@register(
    "string_null_position_edges_audit",
    """
    WITH s AS (
      SELECT l_returnflag AS rf, l_linestatus AS ls,
             nullif(l_linestatus, 'F') AS lsn
      FROM lineitem)
    SELECT rf, CAST(count(*) AS BIGINT) AS n,
           CAST(count(rf || '|' || lsn) AS BIGINT) AS n_concat_notnull,
           min(rf || '|' || ls) AS min_concat3,
           min(substr(rf || ls, 1, 2)) AS sub0,
           min(substr(rf || ls, -1, 1)) AS subneg,
           min(substr(rf || ls, -7, 3)) AS subfar
    FROM s GROUP BY rf ORDER BY rf
    """,
    doc="concat-NULL and substr-position edge audit — two probed "
        "divergences the oracle must ENCODE: (1) Spark's concat() "
        "NULL-PROPAGATES (concat('a', NULL, 'b') IS NULL) while "
        "DuckDB's concat() SKIPS NULLs ('ab') — the oracle therefore "
        "uses `||`, which null-propagates on BOTH engines, to express "
        "Spark's concat; n_concat_notnull counts rows whose nullif-ed "
        "middle operand survived. The corruption class: a key built "
        "with concat(col_a, sep, col_b) silently keeps rows with NULL "
        "parts on DuckDB and drops them on Spark. (2) substr at "
        "position 0: Spark treats 0 as 1 with the SAME length "
        "(substr('ABCDE',0,2)='AB') while DuckDB spends one length "
        "unit reaching position 1 ('A') — the Spark side runs the raw "
        "position-0 call and the oracle encodes position 1. Negative "
        "and past-the-start positions agree (subneg/subfar pin the "
        "agreement so a regression in EITHER engine's clamping "
        "surfaces). One map-side pass, 3 returnflag groups; every "
        "output is a function of tiny per-group min/count state.",
    tags=("sql-surface", "capability"),
)
def string_null_position_edges_audit(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    s = li.select(
        F.col("l_returnflag").alias("rf"),
        F.col("l_linestatus").alias("ls"),
        F.expr("nullif(l_linestatus, 'F')").alias("lsn"),
    )
    both = F.concat(F.col("rf"), F.col("ls"))
    return (
        s.groupBy("rf")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.count(F.concat(F.col("rf"), F.lit("|"), F.col("lsn")))
            .cast("bigint").alias("n_concat_notnull"),
            F.min(F.concat(F.col("rf"), F.lit("|"), F.col("ls")))
            .alias("min_concat3"),
            F.min(F.expr("substr(concat(rf, ls), 0, 2)")).alias("sub0"),
            F.min(F.substring(both, -1, 1)).alias("subneg"),
            F.min(F.substring(both, -7, 3)).alias("subfar"),
        )
        .orderBy("rf")
    )


@register(
    "math_domain_edges_audit",
    """
    WITH s AS (
      SELECT l_returnflag AS rf,
             CAST(l_quantity AS DOUBLE) - 25.0 AS x
      FROM lineitem)
    SELECT rf, CAST(count(*) AS BIGINT) AS n,
           CAST(count(CASE WHEN x > 0 THEN ln(x) END) AS BIGINT)
             AS n_ln_defined,
           round(sum(CASE WHEN x > 0 THEN ln(x) END), 3) AS sum_ln,
           CAST(sum(CASE WHEN x < 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_sqrt_nan,
           CAST(max(CASE WHEN x < 0 THEN 1 ELSE 0 END) = 1 AS BOOLEAN)
             AS sum_sqrt_is_nan
    FROM s GROUP BY rf ORDER BY rf
    """,
    doc="Math domain-edge audit — Spark's TRI-STATE out-of-domain "
        "behavior, probed: the log family returns NULL (ln(0), "
        "ln(-1), log10(-2) are NULL even under ANSI), the algebraic "
        "family returns NaN (sqrt(-1), asin(2) are NaN), and DuckDB "
        "ERRORS on both (OutOfRangeException) — so the oracle encodes "
        "Spark's semantics behind CASE domain gates while the Spark "
        "side runs the RAW functions: count(ln(x)) counts only x>0 "
        "rows (NULLs drop from count/sum), sum(sqrt(x)) over any "
        "negative operand is NaN (NaN is COUNTED non-null and "
        "poisons sums — the opposite hazard of the log family, "
        "pinned by sum_sqrt_is_nan via isnan()). The corruption "
        "class: a feature pipeline computing log/sqrt transforms "
        "ships silently shrunken aggregates on Spark and crashes on "
        "DuckDB; the gates here are the portable form. sum_ln is "
        "order-insensitive at 3 decimals (~5e4 magnitude vs ~1e-12 "
        "summation drift). One map-side pass, 3 groups.",
    tags=("sql-surface", "capability"),
)
def math_domain_edges_audit(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    s = li.select(
        F.col("l_returnflag").alias("rf"),
        (F.col("l_quantity").cast("double") - 25.0).alias("x"),
    )
    return (
        s.groupBy("rf")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.count(F.ln(F.col("x"))).cast("bigint").alias("n_ln_defined"),
            F.round(F.sum(F.ln(F.col("x"))), 3).alias("sum_ln"),
            F.sum(F.when(F.isnan(F.sqrt(F.col("x"))), 1).otherwise(0))
            .cast("bigint").alias("n_sqrt_nan"),
            F.isnan(F.sum(F.sqrt(F.col("x")))).alias("sum_sqrt_is_nan"),
        )
        .orderBy("rf")
    )


@register(
    "array_sort_null_placement_audit",
    """
    WITH s AS (
      SELECT l_returnflag AS rf,
             [CAST(l_quantity AS BIGINT) % 10,
              CAST(l_partkey AS BIGINT) % 10,
              CASE WHEN l_linenumber % 2 = 0
                   THEN CAST(l_orderkey AS BIGINT) % 10 END] AS arr
      FROM lineitem),
    v AS (
      SELECT rf,
             list_sort(arr, 'ASC', 'NULLS FIRST') AS sa,
             list_sort(arr, 'DESC', 'NULLS LAST') AS sd
      FROM s)
    SELECT rf, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN sa[1] IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_asc_head_null,
           CAST(sum(CASE WHEN sd[3] IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_desc_tail_null,
           CAST(sum(sa[3]) AS BIGINT) AS sum_asc_last,
           CAST(sum(sd[1]) AS BIGINT) AS sum_desc_head
    FROM v GROUP BY rf ORDER BY rf
    """,
    doc="Array-sort NULL-placement audit — a probed divergence the "
        "oracle must ENCODE: Spark's sort_array puts NULLs FIRST "
        "ascending and LAST descending (SQL NULLS-smallest "
        "convention), while DuckDB's list_sort DEFAULTS to NULLS LAST "
        "ascending — so the oracle spells the placement explicitly "
        "(list_sort(arr, 'ASC', 'NULLS FIRST') / ('DESC', 'NULLS "
        "LAST')) while the Spark side runs bare sort_array(arr) / "
        "sort_array(arr, false). Per row a 3-element array carries "
        "one conditional NULL; the audit pins head/tail NULL counts "
        "under both directions (exactly the even-linenumber rows) and "
        "the element sums at the non-NULL ends (1-based indexing on "
        "both engines, try_element_at on Spark <-> [] on DuckDB, "
        "index 0 avoided — Spark raises INVALID_INDEX_OF_ZERO even "
        "under try_element_at). The corruption class: any "
        "'smallest/largest element' feature computed as "
        "sorted_arr[1]/[n] silently flips between a value and NULL "
        "when ported. One map-side pass, 3 returnflag groups.",
    tags=("sql-surface", "capability"),
)
def array_sort_null_placement_audit(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    s = li.selectExpr(
        "l_returnflag AS rf",
        "array(CAST(l_quantity AS BIGINT) % 10, "
        "CAST(l_partkey AS BIGINT) % 10, "
        "CASE WHEN l_linenumber % 2 = 0 "
        "THEN CAST(l_orderkey AS BIGINT) % 10 END) AS arr",
    ).selectExpr(
        "rf",
        "sort_array(arr) AS sa",
        "sort_array(arr, false) AS sd",
    )
    return (
        s.groupBy("rf")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(F.when(F.expr("try_element_at(sa, 1)").isNull(), 1)
                  .otherwise(0)).cast("bigint").alias("n_asc_head_null"),
            F.sum(F.when(F.expr("try_element_at(sd, 3)").isNull(), 1)
                  .otherwise(0)).cast("bigint").alias("n_desc_tail_null"),
            F.sum(F.expr("try_element_at(sa, 3)")).cast("bigint")
            .alias("sum_asc_last"),
            F.sum(F.expr("try_element_at(sd, 1)")).cast("bigint")
            .alias("sum_desc_head"),
        )
        .orderBy("rf")
    )


@register(
    "regex_engine_capability_audit",
    """
    WITH s AS (
      SELECT l_returnflag AS rf, l_linestatus AS ls,
             l_returnflag || l_linestatus || l_returnflag AS tri
      FROM lineitem)
    SELECT rf, ls, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN substr(tri, 1, 1) = substr(tri, 2, 1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_doubled,
           min(substr(tri, 2, 1)) AS mid_char,
           CAST(sum(CASE WHEN substr(tri, 1, 2) = 'AF'
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_lookahead
    FROM s GROUP BY rf, ls ORDER BY rf, ls
    """,
    doc="Regex ENGINE capability audit — Spark's regexp_* is Java "
        "java.util.regex (backreferences, lookahead, lookbehind all "
        "work) while DuckDB's is RE2, which has NONE of them (probed: "
        "a backreference errors 'invalid escape sequence', a lookahead "
        "silently NO-MATCHES — the nastier failure mode, wrong counts "
        "with no error). The oracle therefore computes the ground "
        "truth with PLAIN STRING OPS over a constructed 3-char string "
        "(rf||ls||rf) where each feature's answer is decidable "
        "exactly: `^(.)\\\\1` (backref: first two chars equal), "
        "`(?<=.)(.)`  (lookbehind capture: the middle char), "
        "`^A(?=F)` (lookahead: prefix 'AF'). The Spark side runs the "
        "REAL patterns. The corruption class: porting a dedup or PII "
        "rule that uses lookarounds to an RE2 engine silently turns "
        "every match into a non-match — counts shrink, nothing "
        "errors. One map-side pass, <=6 (rf, ls) groups.",
    tags=("sql-surface", "capability"),
)
def regex_engine_capability_audit(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    s = li.selectExpr(
        "l_returnflag AS rf", "l_linestatus AS ls",
        "concat(l_returnflag, l_linestatus, l_returnflag) AS tri",
    )
    return (
        s.groupBy("rf", "ls")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(F.when(F.expr(r"rlike(tri, '^(.)\\1')"), 1)
                  .otherwise(0)).cast("bigint").alias("n_doubled"),
            F.min(F.expr(r"regexp_extract(tri, '(?<=.)(.)', 1)"))
            .alias("mid_char"),
            F.sum(F.when(F.expr(r"rlike(tri, '^A(?=F)')"), 1)
                  .otherwise(0)).cast("bigint").alias("n_lookahead"),
        )
        .orderBy("rf", "ls")
    )


@register(
    "unicode_case_mapping_audit",
    """
    WITH s AS (
      SELECT l_returnflag AS rf, l_linestatus AS ls,
             'Straße-' || l_returnflag AS gs,
             'İzmir-' || l_linestatus AS ts
      FROM lineitem)
    SELECT rf, ls, CAST(count(*) AS BIGINT) AS n,
           min(upper(replace(gs, 'ß', 'ss'))) AS upper_sharp_s,
           CAST(min(length(upper(replace(gs, 'ß', 'ss')))) AS BIGINT)
             AS len_upper,
           min(lower(replace(ts, 'İ', 'i' || chr(775)))) AS lower_dotted_i,
           CAST(min(length('🎉-' || rf)) AS BIGINT) AS len_cp,
           min(reverse(reverse(gs))) AS rev_roundtrip
    FROM s GROUP BY rf, ls ORDER BY rf, ls
    """,
    doc="Unicode case-mapping audit — Spark's upper/lower is Java's "
        "FULL case mapping while DuckDB's is not, probed on the two "
        "canonical traps: upper('Straße') = 'STRASSE' (sharp-s "
        "EXPANDS to SS, length grows 6->7) on Spark vs 'STRAẞE' "
        "(U+1E9E capital sharp s, length 6) on DuckDB; "
        "lower('İstanbul') = 'i\\u0307stanbul' (dotted capital I "
        "lowers to i + COMBINING DOT ABOVE) on Spark vs plain "
        "'istanbul' on DuckDB. The oracle ENCODES Java's mapping with "
        "explicit replaces (ß->ss before upper; İ->i+chr(775) before "
        "lower) while the Spark side runs the RAW functions — so the "
        "audit fails if either engine moves its mapping. Parity "
        "columns pin what DOES agree: codepoint length semantics "
        "(non-BMP emoji counts 1) and reverse round-trip on combining "
        "sequences. The corruption class: dedup keys built with "
        "upper()/lower() normalize DIFFERENTLY across engines for "
        "German/Turkish text — same input, different key, silent "
        "split of a duplicate group. One map-side pass, <=6 groups.",
    tags=("sql-surface", "capability", "text"),
)
def unicode_case_mapping_audit(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    s = li.selectExpr(
        "l_returnflag AS rf", "l_linestatus AS ls",
        "concat('Straße-', l_returnflag) AS gs",
        "concat('İzmir-', l_linestatus) AS ts",
    )
    return (
        s.groupBy("rf", "ls")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.min(F.upper(F.col("gs"))).alias("upper_sharp_s"),
            F.min(F.length(F.upper(F.col("gs")))).cast("bigint")
            .alias("len_upper"),
            F.min(F.lower(F.col("ts"))).alias("lower_dotted_i"),
            F.min(F.length(F.concat(F.lit("🎉-"), F.col("rf"))))
            .cast("bigint").alias("len_cp"),
            F.min(F.reverse(F.reverse(F.col("gs")))).alias("rev_roundtrip"),
        )
        .orderBy("rf", "ls")
    )


@register(
    "json_path_extraction_edges_audit",
    """
    WITH s AS (
      SELECT o_orderkey % 6 AS variant,
             CASE o_orderkey % 6
               WHEN 0 THEN '{"k": ' || CAST(o_orderkey AS VARCHAR) || '}'
               WHEN 1 THEN '{"k": ' || CAST(o_orderkey AS VARCHAR)
                           || ', "k": ' || CAST(o_orderkey + 1 AS VARCHAR)
                           || '}'
               WHEN 2 THEN 'oops ' || CAST(o_orderkey AS VARCHAR)
               WHEN 3 THEN '{"k": ' || CAST(o_orderkey AS VARCHAR)
                           || '.50}'
               WHEN 4 THEN '{"k": true}'
               ELSE '{"x": ' || CAST(o_orderkey AS VARCHAR) || '}'
             END AS raw
      FROM orders),
    p AS (
      SELECT variant,
             CASE WHEN json_valid(raw)
                  THEN json_extract_string(raw, '$.k') END AS v
      FROM s)
    SELECT variant, CAST(count(*) AS BIGINT) AS n,
           CAST(count(v) AS BIGINT) AS n_extracted,
           min(v) AS min_v, max(v) AS max_v
    FROM p GROUP BY variant ORDER BY variant
    """,
    doc="JSON path-extraction edge audit over six deterministic "
        "payload shapes: plain scalar, DUPLICATE key (both engines "
        "take the FIRST — probed, not assumed), malformed document, "
        "trailing-zero number ('12345.50' normalizes to '12345.5' on "
        "both), boolean rendering ('true'), and a missing key. The "
        "ONE divergence the oracle must encode: Spark's "
        "get_json_object returns NULL for malformed JSON while "
        "DuckDB's json_extract_string ERRORS — the oracle gates "
        "behind json_valid(). Everything else is a parity PIN (a "
        "regression in either engine's duplicate-key choice or number "
        "normalization surfaces as a hash mismatch). The corruption "
        "class: an events pipeline extracting properties from "
        "occasionally-corrupt payloads crashes outright on one engine "
        "and silently yields NULLs on the other; json_valid gating is "
        "the portable form. One map-side pass, 6 variant groups; "
        "min/max of the extracted string are the only reduced state.",
    tags=("sql-surface", "capability"),
)
def json_path_extraction_edges_audit(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    ks = k.cast("string")
    raw = (
        F.when(k % 6 == 0, F.concat(F.lit('{"k": '), ks, F.lit("}")))
        .when(k % 6 == 1, F.concat(
            F.lit('{"k": '), ks, F.lit(', "k": '),
            (k + 1).cast("string"), F.lit("}")))
        .when(k % 6 == 2, F.concat(F.lit("oops "), ks))
        .when(k % 6 == 3, F.concat(F.lit('{"k": '), ks, F.lit(".50}")))
        .when(k % 6 == 4, F.lit('{"k": true}'))
        .otherwise(F.concat(F.lit('{"x": '), ks, F.lit("}")))
    )
    v = F.get_json_object(F.col("raw"), "$.k")
    return (
        o.select((k % 6).alias("variant"), raw.alias("raw"))
        .select("variant", v.alias("v"))
        .groupBy("variant")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.count("v").cast("bigint").alias("n_extracted"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
        )
        .orderBy("variant")
    )


@register(
    "numeric_int_cast_semantics_audit",
    """
    WITH s AS (SELECT event_type,
      CAST(trunc(value - 245.0) AS INTEGER) AS xi,
      CAST(trunc(floor(value) + 0.5) AS INTEGER) AS hi,
      CAST(trunc(CAST(floor(value) + 0.5 AS DECIMAL(12,1)))
           AS INTEGER) AS hd
      FROM events)
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(xi) AS BIGINT) AS sxi,
           CAST(sum(hi) AS BIGINT) AS shi,
           CAST(sum(hd) AS BIGINT) AS shd,
           CAST(min(xi) AS BIGINT) AS mnxi,
           CAST(max(xi) AS BIGINT) AS mxxi
    FROM s GROUP BY event_type ORDER BY event_type
    """,
    doc="Numeric->INT CAST semantics audit (r16 probed divergence): "
        "Spark's CAST of a non-integral numeric to an integer type "
        "TRUNCATES toward zero for BOTH decimal and double "
        "(CAST(-3.5 AS INT) = -3, CAST(2.5E0 AS INT) = 2), while "
        "DuckDB ROUNDS — half-away-from-zero for DECIMAL "
        "(CAST(-3.5 AS INTEGER) = -4) and half-to-even for DOUBLE "
        "(CAST(2.5E0) = 2 but CAST(-3.5E0) = -4). The corruption "
        "class: any cross-engine pipeline that buckets or ids rows "
        "via an int cast drifts by +-1 on every half and on every "
        "negative fractional value — silently, since both casts "
        "succeed. The oracle ENCODES Spark's semantics with "
        "trunc()-then-cast (integral values cast exactly in both "
        "engines); the Spark side runs the REAL casts on three probe "
        "columns derived from the fixture: a signed fractional "
        "(value - 245), an exact double half (floor(value) + 0.5), "
        "and the same half as DECIMAL(12,1). One map-side pass into "
        "per-event_type aggregates. ANSI note: Spark 4's ANSI CAST "
        "still truncates fractions (only overflow/malformed throw).",
    tags=("sql-surface", "capability"),
)
def numeric_int_cast_semantics_audit(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    s = ev.selectExpr(
        "event_type",
        "CAST(value - 245.0E0 AS INT) AS xi",
        "CAST(floor(value) + 0.5E0 AS INT) AS hi",
        "CAST(CAST(floor(value) + 0.5E0 AS DECIMAL(12,1)) AS INT) AS hd",
    )
    return (
        s.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("xi").cast("bigint").alias("sxi"),
            F.sum("hi").cast("bigint").alias("shi"),
            F.sum("hd").cast("bigint").alias("shd"),
            F.min("xi").cast("bigint").alias("mnxi"),
            F.max("xi").cast("bigint").alias("mxxi"),
        )
        .orderBy("event_type")
    )


@register(
    "concat_null_substr_edge_audit",
    """
    WITH s AS (SELECT l_returnflag AS rf, l_linestatus AS ls,
      'k' || nullif(l_returnflag, 'A') || l_linestatus AS key,
      l_returnflag || l_linestatus || l_returnflag AS tri
      FROM lineitem)
    SELECT rf, ls, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN key IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_null_keys,
           min(key) AS min_key,
           min(substr(tri, 1, 2)) AS zero_start,
           min('') AS neg_len
    FROM s GROUP BY rf, ls ORDER BY rf, ls
    """,
    doc="concat-NULL and substr-edge audit (r16 probed divergences): "
        "(1) Spark's concat() is NULL-propagating — concat('a', NULL, "
        "'b') is NULL — while DuckDB's concat() SKIPS NULLs and "
        "returns 'ab'; in key construction this is the difference "
        "between a row dropping out of a join (NULL key) and it "
        "silently colliding under a shortened key. The Spark side "
        "builds keys with the real concat() over a NULLIF-derived "
        "column; the oracle encodes Spark's semantics with the || "
        "operator, which propagates NULL in both engines. "
        "(2) substr with start 0: Spark treats 0 as 1 and returns "
        "LENGTH chars (substring('AFA',0,2)='AF'); DuckDB counts "
        "position 0 against the length and returns length-1 chars "
        "(substr('hello',0,3)='he') — encoded as substr(tri,1,2). "
        "(3) substr with negative length: Spark returns '' while "
        "DuckDB counts backwards from the start position "
        "(substr('hello',2,-1)='h') — encoded as the constant ''. "
        "One map-side pass into <=6 (rf, ls) groups.",
    tags=("sql-surface", "capability"),
)
def concat_null_substr_edge_audit(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    s = li.selectExpr(
        "l_returnflag AS rf", "l_linestatus AS ls",
        "concat('k', nullif(l_returnflag, 'A'), l_linestatus) AS key",
        "concat(l_returnflag, l_linestatus, l_returnflag) AS tri",
    )
    return (
        s.groupBy("rf", "ls")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(F.when(F.col("key").isNull(), 1).otherwise(0))
            .cast("bigint").alias("n_null_keys"),
            F.min("key").alias("min_key"),
            F.min(F.expr("substring(tri, 0, 2)")).alias("zero_start"),
            F.min(F.expr("substring(tri, 2, -1)")).alias("neg_len"),
        )
        .orderBy("rf", "ls")
    )


@register(
    "timestamp_diff_semantics_audit",
    """
    WITH s AS (SELECT event_type,
      CAST(floor(epoch(TIMESTAMP '2025-06-15 12:34:56' - ts) / 86400)
           AS BIGINT) AS ed,
      CAST(date_diff('day', CAST(ts AS DATE), DATE '2025-06-15')
           AS BIGINT) AS bd
      FROM events)
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(ed) AS BIGINT) AS sed,
           CAST(sum(bd) AS BIGINT) AS sbd,
           CAST(sum(CASE WHEN ed <> bd THEN 1 ELSE 0 END) AS BIGINT)
             AS n_gap
    FROM s GROUP BY event_type ORDER BY event_type
    """,
    doc="Temporal-diff semantics audit (r16 probed divergence): "
        "Spark's timestampdiff(DAY, a, b) counts ELAPSED full 24 h "
        "periods (23:00 -> next-day 01:00 is 0 days) while DuckDB's "
        "date_diff('day', a, b) counts calendar-BOUNDARY crossings "
        "(the same pair is 1 day) — probed on both engines, same for "
        "HOUR. The corruption class: a 'document age in days' or "
        "retention-window filter computed cross-engine drifts by one "
        "near every midnight, shifting rows across bucket and cutoff "
        "edges silently. The Spark side runs the REAL timestampdiff "
        "plus the boundary form (datediff over dates, which both "
        "engines agree on); the oracle encodes elapsed semantics as "
        "floor(epoch-delta / 86400) — exact here since every fixture "
        "ts precedes the fixed reference instant. n_gap counts rows "
        "where the two answers differ: the off-by-one population "
        "itself is cross-checked, not just the sums. One map-side "
        "pass into per-event_type aggregates.",
    tags=("sql-surface", "capability"),
)
def timestamp_diff_semantics_audit(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    s = ev.selectExpr(
        "event_type",
        "CAST(timestampdiff(DAY, ts, TIMESTAMP '2025-06-15 12:34:56')"
        " AS BIGINT) AS ed",
        "CAST(datediff(DATE '2025-06-15', to_date(ts)) AS BIGINT) AS bd",
    )
    return (
        s.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("ed").cast("bigint").alias("sed"),
            F.sum("bd").cast("bigint").alias("sbd"),
            F.sum(F.when(F.col("ed") != F.col("bd"), 1).otherwise(0))
            .cast("bigint").alias("n_gap"),
        )
        .orderBy("event_type")
    )


@register(
    "cast_suffix_grammar_audit",
    """
    WITH s AS (SELECT
      CAST(o_orderkey % 100 AS DOUBLE) AS sd,
      CAST(NULL AS DOUBLE) AS us,
      CAST(NULL AS BIGINT) AS fr,
      o_orderpriority AS pri
      FROM orders)
    SELECT pri, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(sd) AS DOUBLE) AS sum_sd,
           CAST(count(us) AS BIGINT) AS n_us,
           CAST(count(fr) AS BIGINT) AS n_fr,
           CAST(min(sd) AS DOUBLE) AS mn_sd,
           CAST(max(sd) AS DOUBLE) AS mx_sd
    FROM s GROUP BY pri ORDER BY pri
    """,
    doc="String->number CAST grammar audit (r17 probed divergences): "
        "(1) Spark's string->DOUBLE cast accepts JAVA float-literal "
        "SUFFIXES — try_cast('1d'), '1F', '1.5e2d' all parse (the "
        "digits with the suffix stripped) — while DuckDB returns "
        "NULL for every one of them; (2) DuckDB accepts underscore "
        "digit separators ('1_000' -> 1000.0) and hex ints ('0x10' "
        "-> 16) that Spark rejects; (3) a FRACTIONAL string cast to "
        "an integer type is NULL in Spark (try_cast('1.9' AS "
        "BIGINT)) but ROUNDS in DuckDB (-> 2). A cross-engine "
        "ingest that trusts 'the same cast' therefore silently "
        "drops or invents rows depending on which side parsed the "
        "string. The Spark side runs the REAL try_casts on strings "
        "derived from o_orderkey ('<k>d' suffix probe, '<k>_5' "
        "underscore probe, '<k>.9' fractional-int probe); the "
        "oracle ENCODES Spark's grammar: the suffix probe is the "
        "plain numeric value, the other two are NULL columns. "
        "count(us)/count(fr) pin the all-NULL population (0 per "
        "group on both sides only if Spark really rejects every "
        "row). One map-side pass into <=5 priority groups.",
    tags=("sql-surface", "capability"),
)
def cast_suffix_grammar_audit(spark, sf_dir):
    od = load(spark, sf_dir, "orders")
    s = od.selectExpr(
        "try_cast(concat(CAST(o_orderkey % 100 AS STRING), 'd') "
        "AS DOUBLE) AS sd",
        "try_cast(concat(CAST(o_orderkey % 100 AS STRING), '_5') "
        "AS DOUBLE) AS us",
        "try_cast(concat(CAST(o_orderkey % 100 AS STRING), '.9') "
        "AS BIGINT) AS fr",
        "o_orderpriority AS pri",
    )
    return (
        s.groupBy("pri")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("sd").cast("double").alias("sum_sd"),
            F.count("us").cast("bigint").alias("n_us"),
            F.count("fr").cast("bigint").alias("n_fr"),
            F.min("sd").cast("double").alias("mn_sd"),
            F.max("sd").cast("double").alias("mx_sd"),
        )
        .orderBy("pri")
    )


@register(
    "initcap_word_boundary_audit",
    """
    WITH s AS (SELECT p_brand,
      array_to_string(list_transform(str_split(lower(p_name), ' '),
        y -> upper(y[1]) || y[2:]), ' ') AS cap_sp,
      upper((replace(p_name, ' ', '-'))[1])
        || lower((replace(p_name, ' ', '-'))[2:]) AS cap_hy
      FROM part)
    SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
           min(cap_sp) AS mn_cap, max(cap_sp) AS mx_cap,
           min(cap_hy) AS mn_hy,
           CAST(sum(length(cap_sp)) AS BIGINT) AS len_sum
    FROM s GROUP BY p_brand ORDER BY p_brand
    """,
    doc="initcap word-boundary audit (r17 probed divergence): Spark's "
        "initcap() lowercases everything, then capitalizes ONLY "
        "after WHITESPACE — hyphens/underscores are not boundaries "
        "('foo-bar baz_qux' -> 'Foo-bar Baz_qux') — and DuckDB has "
        "no initcap() at all, so any port reaches for an emulation "
        "whose boundary set silently differs (most SQL initcaps, "
        "e.g. Oracle/Postgres, capitalize after EVERY non-alnum: "
        "'Foo-Bar'). The Spark side runs the real initcap over "
        "p_name (space-separated probe; initcap(upper(..)) pins the "
        "lowercase-the-rest rule) and over a hyphenated derivation "
        "(only the FIRST letter capitalizes); the oracle encodes "
        "Spark's whitespace-only rule with str_split/list_transform "
        "and a first-char upper for the hyphen probe. Map-side pass "
        "into ~25 brand groups.",
    tags=("sql-surface", "capability"),
)
def initcap_word_boundary_audit(spark, sf_dir):
    pt = load(spark, sf_dir, "part")
    s = pt.selectExpr(
        "p_brand",
        "initcap(upper(p_name)) AS cap_sp",
        "initcap(replace(p_name, ' ', '-')) AS cap_hy",
    )
    return (
        s.groupBy("p_brand")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.min("cap_sp").alias("mn_cap"),
            F.max("cap_sp").alias("mx_cap"),
            F.min("cap_hy").alias("mn_hy"),
            F.sum(F.length("cap_sp")).cast("bigint").alias("len_sum"),
        )
        .orderBy("p_brand")
    )


@register(
    "sequence_format_semantics_audit",
    """
    WITH s AS (SELECT o_orderkey, o_orderdate,
      list_aggr(generate_series(CAST(o_orderkey % 5 + 3 AS BIGINT),
                                1, -1), 'sum') AS desc_sum,
      CAST(len(generate_series(CAST(o_orderkey % 5 + 3 AS BIGINT),
                               1, -1)) AS INTEGER) AS desc_len,
      CASE WHEN length(strftime(o_orderdate, '%-j')) = 1
           THEN '0' || strftime(o_orderdate, '%-j')
           ELSE strftime(o_orderdate, '%-j') END AS doy
      FROM orders)
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(desc_sum) AS BIGINT) AS sum_desc,
           CAST(sum(desc_len) AS BIGINT) AS len_desc,
           min(doy) AS mn_doy, max(doy) AS mx_doy
    FROM s
    """,
    doc="Sequence-direction + format-padding audit (r17 probed "
        "divergences): (1) Spark's sequence(hi, lo) with NO step "
        "infers a DESCENDING step and returns [hi..lo], while "
        "DuckDB's generate_series(hi, lo) returns EMPTY — a "
        "cross-engine backfill that enumerates 'days back from N' "
        "silently produces zero rows on one side; the oracle "
        "encodes Spark's inference with an explicit -1 step. "
        "(2) date_format pattern 'DD' (Java day-of-year) does NOT "
        "zero-pad to 3 ('65'), while strftime '%j' does ('065') — "
        "string-keyed joins on the formatted value drop every "
        "pre-day-100 row; Java 'DD' still pads to a MINIMUM of two "
        "digits ('01' for Jan 1 — probed), so the oracle encodes "
        "Spark as non-padded '%-j' re-padded to width 2. Aggregated "
        "over sequence sums/lengths and min/max day-of-year "
        "strings; one map-side pass",
    tags=("sql-surface", "capability"),
)
def sequence_format_semantics_audit(spark, sf_dir):
    od = load(spark, sf_dir, "orders")
    s = od.selectExpr(
        "aggregate(sequence(o_orderkey % 5 + 3, 1), 0L, "
        "(a, x) -> a + x) AS desc_sum",
        "size(sequence(o_orderkey % 5 + 3, 1)) AS desc_len",
        "date_format(o_orderdate, 'DD') AS doy",
    )
    return s.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("desc_sum").cast("bigint").alias("sum_desc"),
        F.sum("desc_len").cast("bigint").alias("len_desc"),
        F.min("doy").alias("mn_doy"),
        F.max("doy").alias("mx_doy"),
    )


@register(
    "split_regex_limit_audit",
    """
    WITH s AS (SELECT p_brand,
      length(replace(p_name, ' ', '.')) + 1 AS n_regex,
      len(string_split(p_name, ' ')) AS n_lit,
      CASE WHEN strpos(p_name, ' ') > 0
           THEN substr(p_name, strpos(p_name, ' ') + 1)
           ELSE p_name END AS rest
      FROM part)
    SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(n_regex) AS BIGINT) AS sum_regex,
           CAST(sum(n_lit) AS BIGINT) AS sum_lit,
           min(rest) AS mn_rest, max(rest) AS mx_rest
    FROM s GROUP BY p_brand ORDER BY p_brand
    """,
    doc="split() regex-vs-literal + limit-remainder audit (r17 probed "
        "divergences): (1) Spark's split() delimiter is a REGEX — "
        "split('a.b.c', '.') returns SIX EMPTY STRINGS (every char "
        "matches) while DuckDB's string_split treats '.' literally "
        "and returns ['a','b','c']; a tokenization pipeline ported "
        "across engines silently shreds every dotted field. The "
        "Spark side runs the real split over a dotted p_name "
        "derivation; the oracle encodes the regex semantics as "
        "length+1. The escaped form '[.]' (and any non-metachar "
        "delimiter) agrees with the literal split — sum_lit pins "
        "that. (2) split(s, d, limit) keeps the REMAINDER in the "
        "last element ('a b c' -> ['a', 'b c']) where a naive "
        "truncation drops it; the oracle re-derives the remainder "
        "with strpos/substr. Map-side pass into ~25 brand groups",
    tags=("sql-surface", "capability"),
)
def split_regex_limit_audit(spark, sf_dir):
    pt = load(spark, sf_dir, "part")
    s = pt.selectExpr(
        "p_brand",
        "size(split(replace(p_name, ' ', '.'), '.')) AS n_regex",
        "size(split(p_name, ' ')) AS n_lit",
        "split(p_name, ' ', 2)[1] AS rest",
    )
    return (
        s.groupBy("p_brand")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("n_regex").cast("bigint").alias("sum_regex"),
            F.sum("n_lit").cast("bigint").alias("sum_lit"),
            F.min("rest").alias("mn_rest"),
            F.max("rest").alias("mx_rest"),
        )
        .orderBy("p_brand")
    )


@register(
    "left_right_negative_audit",
    """
    WITH s AS (SELECT o_orderstatus AS st, o_orderpriority,
                      CAST(o_orderkey % 5 AS INTEGER) - 2 AS k
               FROM orders),
    t AS (SELECT st,
                 CASE WHEN k < 0 THEN ''
                      ELSE left(o_orderpriority, k) END AS l,
                 CASE WHEN k < 0 THEN ''
                      ELSE right(o_orderpriority, k) END AS r
          FROM s)
    SELECT st, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(length(l)) AS BIGINT) AS len_l,
           CAST(sum(length(r)) AS BIGINT) AS len_r,
           max(l) AS mx_l, max(r) AS mx_r
    FROM t GROUP BY st ORDER BY st
    """,
    doc="left()/right() negative-length audit (r17 probed divergence): "
        "Spark returns the EMPTY STRING for a negative length while "
        "DuckDB interprets it as 'all but |n| from the other end' — "
        "left('abc', -1) is '' vs 'ab', right('abc', -1) is '' vs "
        "'bc'. A truncation helper whose length is computed (and can "
        "go negative on short inputs) silently keeps most of the "
        "string on one engine and drops it all on the other. The "
        "Spark side runs the real left/right over o_orderpriority "
        "with a key-derived length spanning -2..2; the oracle "
        "encodes Spark's rule with an explicit CASE k < 0 guard "
        "(k = 0 agrees: both return ''). Map-side pass into <=3 "
        "status groups",
    tags=("sql-surface", "capability"),
)
def left_right_negative_audit(spark, sf_dir):
    od = load(spark, sf_dir, "orders")
    s = od.selectExpr(
        "o_orderstatus AS st",
        "left(o_orderpriority, CAST(o_orderkey % 5 AS INT) - 2) AS l",
        "right(o_orderpriority, CAST(o_orderkey % 5 AS INT) - 2) AS r",
    )
    return (
        s.groupBy("st")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(F.length("l")).cast("bigint").alias("len_l"),
            F.sum(F.length("r")).cast("bigint").alias("len_r"),
            F.max("l").alias("mx_l"),
            F.max("r").alias("mx_r"),
        )
        .orderBy("st")
    )


@register(
    "array_null_semantics_audit",
    """
    WITH s AS (SELECT o_orderpriority AS pri,
                      CAST(o_orderkey % 7 AS BIGINT) AS k1,
                      CAST(o_orderkey % 11 AS BIGINT) AS k2,
                      o_orderkey % 3 = 0 AS has_null
               FROM orders),
    t AS (SELECT pri,
                 CASE WHEN has_null THEN NULL ELSE false END AS cmiss,
                 CASE WHEN has_null THEN NULL
                      ELSE CAST(2 AS INTEGER) END AS flat_sz,
                 CAST(CASE WHEN k1 = k2 THEN 2 ELSE 3 END
                      AS INTEGER) AS union_sz
          FROM s)
    SELECT pri, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN cmiss IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_unknown,
           CAST(count(flat_sz) AS BIGINT) AS n_flat,
           CAST(sum(flat_sz) AS BIGINT) AS sum_flat,
           CAST(sum(union_sz) AS BIGINT) AS sum_union
    FROM t GROUP BY pri ORDER BY pri
    """,
    doc="Array-NULL three-valued-logic audit (r17 probed divergences): "
        "(1) array_contains(arr, v) with v ABSENT is NULL in Spark "
        "when the array carries a NULL element ('maybe it was the "
        "null') but FALSE in DuckDB — a membership flag column "
        "silently flips unknown->false cross-engine; (2) flatten() "
        "PROPAGATES a NULL inner array in Spark but skips it in "
        "DuckDB; (3) array_union keeps NULL as a distinct member in "
        "Spark while DuckDB's list_distinct drops it. The Spark side "
        "builds key-derived arrays (a NULL element on every third "
        "key) and runs the REAL functions; the oracle encodes "
        "Spark's rules as explicit CASE guards (n_unknown pins the "
        "unknown population, n_flat/sum_flat the propagated-NULL "
        "flattens, sum_union the NULL-inclusive distinct size). "
        "Map-side pass into <=5 priority groups",
    tags=("sql-surface", "capability"),
)
def array_null_semantics_audit(spark, sf_dir):
    od = load(spark, sf_dir, "orders")
    s = od.selectExpr(
        "o_orderpriority AS pri",
        "array(CAST(o_orderkey % 7 AS BIGINT), "
        " CASE WHEN o_orderkey % 3 = 0 THEN CAST(NULL AS BIGINT) "
        "      ELSE CAST(o_orderkey % 11 AS BIGINT) END) AS a",
        "CAST(o_orderkey % 7 AS BIGINT) AS k1",
        "CAST(o_orderkey % 11 AS BIGINT) AS k2",
        "o_orderkey % 3 = 0 AS has_null",
    ).selectExpr(
        "pri",
        "array_contains(a, CAST(100 AS BIGINT)) AS cmiss",
        "size(flatten(array(array(k1), "
        " CASE WHEN has_null THEN NULL ELSE array(k2) END))) AS flat_sz",
        "size(array_union(array(k1, CAST(NULL AS BIGINT)), array(k2))) "
        " AS union_sz",
    )
    return (
        s.groupBy("pri")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(F.when(F.col("cmiss").isNull(), 1).otherwise(0))
            .cast("bigint").alias("n_unknown"),
            F.count("flat_sz").cast("bigint").alias("n_flat"),
            F.sum("flat_sz").cast("bigint").alias("sum_flat"),
            F.sum("union_sz").cast("bigint").alias("sum_union"),
        )
        .orderBy("pri")
    )


@register(
    "months_between_eom_audit",
    """
    WITH s AS (SELECT o_orderpriority AS pri, o_orderdate AS d2,
                      last_day(o_orderdate) AS d1a,
                      o_orderdate + INTERVAL 1 MONTH AS d1b
               FROM orders),
    t AS (SELECT pri,
      CASE WHEN day(d1a) = day(d2)
                OR (d1a = last_day(d1a) AND d2 = last_day(d2))
           THEN (date_part('year', d1a) - date_part('year', d2)) * 12
                + (date_part('month', d1a) - date_part('month', d2))
           ELSE (date_part('year', d1a) - date_part('year', d2)) * 12
                + (date_part('month', d1a) - date_part('month', d2))
                + (day(d1a) - day(d2)) / 31.0 END AS mb_a,
      CASE WHEN day(d1b) = day(d2)
                OR (d1b = last_day(d1b) AND d2 = last_day(d2))
           THEN (date_part('year', d1b) - date_part('year', d2)) * 12
                + (date_part('month', d1b) - date_part('month', d2))
           ELSE (date_part('year', d1b) - date_part('year', d2)) * 12
                + (date_part('month', d1b) - date_part('month', d2))
                + (day(d1b) - day(d2)) / 31.0 END AS mb_b
      FROM s)
    SELECT pri, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(mb_a * 31) AS BIGINT)) AS BIGINT)
             AS s31_a,
           CAST(sum(CAST(round(mb_b * 31) AS BIGINT)) AS BIGINT)
             AS s31_b,
           CAST(sum(CASE WHEN mb_b = round(mb_b) THEN 1 ELSE 0 END)
                AS BIGINT) AS n_whole_b
    FROM t GROUP BY pri ORDER BY pri
    """,
    doc="months_between end-of-month-rule audit (r17 probed "
        "divergence): Spark's months_between(Mar 31, Feb 29) is "
        "EXACTLY 1.0 — equal day-of-month OR both-last-day-of-month "
        "count as whole months, anything else adds (day1-day2)/31 — "
        "and DuckDB has no months_between at all, so ports reach for "
        "date_diff('month') (boundary counting) or epoch ratios, "
        "both of which drift on every tenure/retention computation "
        "near month ends. The Spark side runs the real function on "
        "two fixture-derived pairs (last_day(d) vs d — always a "
        "fractional-or-whole mix; d + 1 MONTH vs d — whole via "
        "day-equality except when add_months CLAMPS at month end, "
        "where the both-last-day rule rescues exactness); the "
        "oracle encodes the full Spark rule as CASE arithmetic. "
        "Sums go through round(mb*31) — integral by construction "
        "(whole*31 + daydiff) — so no float-summation-order hash "
        "risk. Map-side pass into <=5 priority groups",
    tags=("sql-surface", "capability"),
)
def months_between_eom_audit(spark, sf_dir):
    od = load(spark, sf_dir, "orders")
    s = od.selectExpr(
        "o_orderpriority AS pri",
        "months_between(last_day(o_orderdate), o_orderdate) AS mb_a",
        "months_between(add_months(o_orderdate, 1), o_orderdate) AS mb_b",
    )
    return (
        s.groupBy("pri")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(F.round(F.col("mb_a") * 31).cast("bigint"))
            .cast("bigint").alias("s31_a"),
            F.sum(F.round(F.col("mb_b") * 31).cast("bigint"))
            .cast("bigint").alias("s31_b"),
            F.sum(F.when(F.col("mb_b") == F.round(F.col("mb_b")), 1)
                  .otherwise(0)).cast("bigint").alias("n_whole_b"),
        )
        .orderBy("pri")
    )


@register(
    "try_overflow_boundary_audit",
    """
    WITH s AS (SELECT o_orderpriority AS pri,
                      CAST(o_orderkey % 4 AS BIGINT) AS k4,
                      CAST(o_orderkey % 8 AS BIGINT) AS k8,
                      CAST(o_orderkey % 2 AS BIGINT) AS k2
               FROM orders),
    t AS (SELECT pri,
                 CASE WHEN k8 > k4 THEN NULL
                      ELSE 7 - k4 + k8 END AS ra,
                 CASE WHEN k4 = 0 THEN 1 END AS mok,
                 CASE WHEN k2 = 0
                      THEN CAST(2432902008176640000 AS BIGINT) END AS f
          FROM s)
    SELECT pri, CAST(count(*) AS BIGINT) AS n,
           CAST(count(ra) AS BIGINT) AS n_ta,
           CAST(sum(ra) AS BIGINT) AS sum_ra,
           CAST(count(mok) AS BIGINT) AS n_tm,
           CAST(count(f) AS BIGINT) AS n_fact,
           CAST(min(f) AS BIGINT) AS mn_fact
    FROM t GROUP BY pri ORDER BY pri
    """,
    doc="LONG-overflow boundary audit (r17 probed divergences, the "
        "overflow sibling of try_arithmetic_safety's divide/cast "
        "coverage): Spark's try_add/try_multiply return NULL at the "
        "int64 boundary where ANSI (and DuckDB) RAISE — and DuckDB "
        "has no TRY() expression guard at all, so a ported pipeline "
        "either crashes on the first hot aggregate or silently "
        "widens to HUGEINT; factorial(21) is a third behavior: "
        "Spark returns NULL (a documented non-ANSI carve-out even "
        "with ANSI on) while DuckDB widens to int128 and returns "
        "51090942171709440000. The Spark side runs the REAL "
        "functions against key-derived near-max operands "
        "(max-(k%4) + (k%8) overflows iff k%8 > k%4; "
        "(k%4+1)*2^62 iff k%4>0; factorial(20+k%2) iff k%2=1); the "
        "oracle re-derives the overflow predicate exactly and the "
        "surviving values through a small residual (ta-(max-7)) so "
        "no near-max longs are ever summed. Map-side pass into <=5 "
        "priority groups",
    tags=("sql-surface", "capability"),
)
def try_overflow_boundary_audit(spark, sf_dir):
    od = load(spark, sf_dir, "orders")
    s = od.selectExpr(
        "o_orderpriority AS pri",
        "try_add(9223372036854775807L - (o_orderkey % 4), "
        " o_orderkey % 8) - 9223372036854775800L AS ra",
        "try_multiply((o_orderkey % 4) + 1, "
        " 4611686018427387904L) AS tm",
        "factorial(CAST(20 + o_orderkey % 2 AS INT)) AS f",
    )
    return (
        s.groupBy("pri")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.count("ra").cast("bigint").alias("n_ta"),
            F.sum("ra").cast("bigint").alias("sum_ra"),
            F.count("tm").cast("bigint").alias("n_tm"),
            F.count("f").cast("bigint").alias("n_fact"),
            F.min("f").cast("bigint").alias("mn_fact"),
        )
        .orderBy("pri")
    )
