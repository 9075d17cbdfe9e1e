"""Analytics batch: spine gap-fill, distribution diagnostics,
corpus audits, sketches-in-SQL, forecasting/trend entries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401
from pyspark.sql import types as T  # noqa: F401

from ..fixtures import fixture_df

from .base import load, normalize_event_ts, register  # noqa: F401


# ---------------------------------------------------------------------------
# round-9 analytics batch: spine gap-fill, distribution diagnostics,
# corpus audits. Shared plan posture: spines/thresholds/fences are
# aggregate-sized and broadcast; raw facts shuffle at most once.
# ---------------------------------------------------------------------------


@register(
    "gap_fill_daily_counts",
    """
    WITH bounds AS (
      SELECT CAST(min(ts) AS DATE) AS lo, CAST(max(ts) AS DATE) AS hi
      FROM events),
    days AS (
      SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)
             AS day
      FROM bounds),
    types AS (SELECT DISTINCT event_type FROM events),
    counts AS (
      SELECT CAST(ts AS DATE) AS day, event_type,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2)
    SELECT CAST(d.day AS TIMESTAMP) AS day, t.event_type,
           CAST(coalesce(c.n, 0) AS BIGINT) AS n_events
    FROM days d
    CROSS JOIN types t
    LEFT JOIN counts c ON c.day = d.day AND c.event_type = t.event_type
    ORDER BY d.day, t.event_type
    """,
    doc="time-series gap fill: a generated day x type spine left-joins "
        "the aggregated daily counts so missing days surface as explicit "
        "zeros (the shape every downstream charting/anomaly job wants). "
        "The spine is days x types — bounded by the retention window and "
        "an enum, NOT by event volume — so its cross join is spine "
        "construction, never a data-size cartesian; counts aggregate "
        "before the join and the AGGREGATED side broadcasts (both sides "
        "are days x types bounded, but the preserved side of an outer "
        "join can never be the hash-join build side - a broadcast hint "
        "there is ignored with a HintErrorLogger warning, r14 verdict "
        "#6)",
)
def gap_fill_daily_counts(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(F.count("*").alias("n"))
    bounds = ev.agg(F.to_date(F.min("ts")).alias("lo"),
                    F.to_date(F.max("ts")).alias("hi"))
    days = bounds.select(F.explode(F.sequence("lo", "hi")).alias("day"))
    types = ev.select("event_type").distinct()
    spine = days.crossJoin(types)  # bounded spine, not a data join
    return (
        spine
        .join(F.broadcast(daily), ["day", "event_type"], "left")
        .select(F.col("day").cast("timestamp").alias("day"), "event_type",
                F.coalesce("n", F.lit(0)).cast("bigint").alias("n_events"))
        .orderBy("day", "event_type")
    )


@register(
    "zipf_slope_top_tokens",
    """
    WITH toks AS (
      SELECT unnest(string_split(lower(text), ' ')) AS token
      FROM documents),
    counts AS (
      SELECT token, CAST(count(*) AS BIGINT) AS freq
      FROM toks WHERE token <> '' GROUP BY token),
    ranked AS (
      SELECT freq,
             CAST(row_number() OVER (ORDER BY freq DESC, token) AS BIGINT)
               AS rnk
      FROM counts ORDER BY freq DESC, token LIMIT 1000)
    SELECT round(regr_slope(ln(CAST(freq AS DOUBLE)),
                            ln(CAST(rnk AS DOUBLE))), 6) AS zipf_slope,
           CAST(count(*) AS BIGINT) AS n_tokens
    FROM ranked
    """,
    doc="Zipf's-law fit over the token frequency spectrum: natural "
        "corpora show ln(freq) ~ -1 * ln(rank); a flat slope flags "
        "templated/boilerplate corpora, a steep one flags vocabulary "
        "collapse. One token shuffle, TakeOrdered 1000-row shortlist, "
        "then the rank window and regr_slope run on the shortlist — "
        "driver-bounded regardless of corpus size",
)
def zipf_slope_top_tokens(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
    )
    shortlist = counts.orderBy(F.col("freq").desc(), "token").limit(1000)
    ranked = shortlist.withColumn(
        "rnk",
        F.row_number().over(
            W.orderBy(F.col("freq").desc(), "token")).cast("long"),
    )
    return ranked.agg(
        F.round(F.regr_slope(F.log(F.col("freq").cast("double")),
                             F.log(F.col("rnk").cast("double"))), 6)
        .alias("zipf_slope"),
        F.count("*").alias("n_tokens"),
    )


@register(
    "user_event_entropy",
    """
    WITH c AS (
      SELECT user_id, event_type, CAST(count(*) AS DOUBLE) AS n
      FROM events GROUP BY user_id, event_type),
    t AS (
      SELECT user_id, event_type, n,
             sum(n) OVER (PARTITION BY user_id) AS tot
      FROM c)
    SELECT user_id,
           round(-sum((n / tot) * ln(n / tot)), 6) AS type_entropy,
           CAST(sum(n) AS BIGINT) AS n_events
    FROM t GROUP BY user_id ORDER BY user_id
    """,
    doc="Shannon entropy of each user's event-type distribution "
        "(behavioral-diversity score; 0 = single-type bots). Two "
        "aggregations over the (user, type) count table — the window "
        "runs on user x type cardinality, never on raw events",
)
def user_event_entropy(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(
        F.count("*").cast("double").alias("n"))
    tot = F.sum("n").over(W.partitionBy("user_id"))
    p = F.col("n") / F.col("tot")
    return (
        c.withColumn("tot", tot)
        .groupBy("user_id")
        .agg(
            F.round(-F.sum(p * F.log(p)), 6).alias("type_entropy"),
            F.sum("n").cast("bigint").alias("n_events"),
        )
        .orderBy("user_id")
    )


@register(
    "iqr_outlier_fences",
    """
    WITH q AS (
      SELECT event_type,
             quantile_cont(value, 0.25) AS q1,
             quantile_cont(value, 0.75) AS q3
      FROM events GROUP BY event_type),
    f AS (
      SELECT event_type,
             round(q1 - 1.5 * (q3 - q1), 6) AS lo_fence,
             round(q3 + 1.5 * (q3 - q1), 6) AS hi_fence
      FROM q)
    SELECT e.event_type, f.lo_fence, f.hi_fence,
           CAST(sum(CASE WHEN e.value < f.lo_fence
                           OR e.value > f.hi_fence THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers
    FROM events e JOIN f ON e.event_type = f.event_type
    GROUP BY e.event_type, f.lo_fence, f.hi_fence
    ORDER BY e.event_type
    """,
    doc="Tukey-fence outlier counting per event type: exact "
        "interpolated quartiles (one aggregate over the facts), fences "
        "rounded to 6 decimals on BOTH sides so the fence doubles are "
        "bit-identical across engines before any comparison, then one "
        "more pass counts the exceedances with the type-cardinality "
        "fence table broadcast",
)
def iqr_outlier_fences(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    q = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.25)).alias("q1"),
        F.percentile("value", F.lit(0.75)).alias("q3"),
    )
    fences = q.select(
        "event_type",
        F.round(F.col("q1") - 1.5 * (F.col("q3") - F.col("q1")), 6)
        .alias("lo_fence"),
        F.round(F.col("q3") + 1.5 * (F.col("q3") - F.col("q1")), 6)
        .alias("hi_fence"),
    )
    return (
        ev.join(F.broadcast(fences), "event_type")
        .groupBy("event_type", "lo_fence", "hi_fence")
        .agg(
            F.sum(
                F.when((F.col("value") < F.col("lo_fence"))
                       | (F.col("value") > F.col("hi_fence")), 1)
                .otherwise(0)
            ).cast("bigint").alias("n_outliers")
        )
        .orderBy("event_type")
    )


@register(
    "cross_source_dup_audit",
    """
    WITH f AS (SELECT doc_id, source, md5(text) AS fp FROM documents),
    x AS (SELECT fp FROM f GROUP BY fp HAVING count(DISTINCT source) > 1)
    SELECT f.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN f.fp IN (SELECT fp FROM x)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_cross_dup
    FROM f GROUP BY f.source ORDER BY f.source
    """,
    doc="cross-source contamination audit: per source, how many docs "
        "also appear verbatim (md5 fingerprint) under ANOTHER source — "
        "the overlap a crawl-merge dedup pass must resolve. Fingerprint "
        "shuffle once; the >1-source fingerprint set is itself "
        "aggregated, and the membership test is a semi-join marker, "
        "never an IN re-scan",
)
def cross_source_dup_audit(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    f = docs.select("doc_id", "source", F.md5("text").alias("fp"))
    x = (
        f.groupBy("fp")
        .agg(F.countDistinct("source").alias("ns"))
        .filter(F.col("ns") > 1)
        .select("fp")
    )
    marked = f.join(x, "fp", "left_semi").groupBy("source").agg(
        F.count("*").alias("n_cross_dup"))
    totals = f.groupBy("source").agg(F.count("*").alias("n_docs"))
    return (
        totals.join(marked, "source", "left")
        .select(
            "source",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.coalesce("n_cross_dup", F.lit(0)).cast("bigint")
            .alias("n_cross_dup"),
        )
        .orderBy("source")
    )


@register(
    "mom_revenue_growth",
    """
    WITH m AS (
      SELECT n_name,
             CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
             round(sum(o_totalprice), 6) AS rev
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      GROUP BY n_name, date_trunc('month', o_orderdate))
    SELECT n_name, month, rev,
           round(100.0 * (rev - lag(rev) OVER w) / lag(rev) OVER w, 6)
             AS mom_pct
    FROM m WINDOW w AS (PARTITION BY n_name ORDER BY month)
    ORDER BY n_name, month
    """,
    doc="month-over-month revenue growth by nation: the lag window "
        "runs on the nation x month aggregate (bounded), never on raw "
        "orders; first month per nation is NULL growth by definition. "
        "Revenue rounds to 6 BEFORE the ratio so both engines divide "
        "identical doubles",
)
def mom_revenue_growth(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load(spark, sf_dir, "nation")
    m = (
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", F.date_trunc("month", "o_orderdate").alias("month"))
        .agg(F.round(F.sum("o_totalprice"), 6).alias("rev"))
    )
    w = W.partitionBy("n_name").orderBy("month")
    prev = F.lag("rev").over(w)
    return (
        m.select(
            "n_name", "month", "rev",
            F.round(F.lit(100.0) * (F.col("rev") - prev) / prev, 6)
            .alias("mom_pct"),
        )
        .orderBy("n_name", "month")
    )


@register(
    "top_decile_revenue_share",
    """
    WITH r AS (
      SELECT o_custkey, sum(o_totalprice) AS rev
      FROM orders GROUP BY o_custkey),
    q AS (SELECT round(quantile_cont(rev, 0.9), 6) AS thr FROM r)
    SELECT round(sum(CASE WHEN rev >= thr THEN rev ELSE 0 END)
                 / sum(rev), 6) AS top_decile_share,
           CAST(count(*) AS BIGINT) AS n_customers
    FROM r CROSS JOIN q
    """,
    doc="revenue concentration (Pareto check): share of total revenue "
        "held by the top decile of customers. NO global sort and NO "
        "unpartitioned window — the p90 threshold is one exact-"
        "percentile aggregate over the customer-cardinality revenue "
        "table, broadcast back as a scalar",
)
def top_decile_revenue_share(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    r = o.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("rev"))
    # round-before-compare: the interpolated p90 is a double expression
    # evaluated by two engines; rounding to 6 on both sides keeps a
    # borderline customer from flipping across the >= at larger SFs
    thr = r.agg(F.round(F.percentile("rev", F.lit(0.9)), 6).alias("thr"))
    return (
        r.crossJoin(F.broadcast(thr))  # 1-row scalar, not a data join
        .agg(
            F.round(
                F.sum(F.when(F.col("rev") >= F.col("thr"), F.col("rev"))
                      .otherwise(F.lit(0.0))) / F.sum("rev"), 6
            ).alias("top_decile_share"),
            F.count("*").alias("n_customers"),
        )
    )


@register(
    "out_of_order_rate",
    """
    WITH seq AS (
      SELECT event_type, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_ts
      FROM events)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN prev_ts IS NOT NULL AND ts < prev_ts
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_out_of_order
    FROM seq GROUP BY event_type ORDER BY event_type
    """,
    doc="ingestion data-quality probe: events whose event time runs "
        "backwards relative to arrival order (event_id) within a user "
        "stream — the late-data volume a streaming watermark must "
        "absorb. One lag window partitioned BY USER (per-user streams "
        "are bounded; never a global ordering), then a plain rollup",
)
def out_of_order_rate(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("event_id")
    seq = ev.select(
        "event_type", "ts", F.lag("ts").over(w).alias("prev_ts"))
    return (
        seq.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(
                F.when(F.col("prev_ts").isNotNull()
                       & (F.col("ts") < F.col("prev_ts")), 1).otherwise(0)
            ).cast("bigint").alias("n_out_of_order"),
        )
        .orderBy("event_type")
    )


# the {daily} placeholder is the bounded day x type aggregate; the
# recursive part is IDENTICAL text on both engines
_EWMA_DAILY_SQL = """
  SELECT event_type, CAST(ts AS DATE) AS day, round(avg(value), 6) AS v
  FROM {events} GROUP BY event_type, CAST(ts AS DATE)
"""
_EWMA_RECURSIVE_SQL = """
WITH RECURSIVE idx AS (
  SELECT event_type, v,
         CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
              AS BIGINT) AS i
  FROM ({daily}) daily),
r AS (
  SELECT event_type, i, v AS ewma FROM idx WHERE i = 1
  UNION ALL
  SELECT idx.event_type, idx.i, round(0.3 * idx.v + 0.7 * r.ewma, 6) AS ewma
  FROM r JOIN idx ON idx.event_type = r.event_type AND idx.i = r.i + 1
  WHERE idx.i <= 14)
SELECT event_type, i AS day_idx, ewma FROM r
ORDER BY event_type, day_idx
"""


@register(
    "ewma_recursive_daily",
    _EWMA_RECURSIVE_SQL.format(daily=_EWMA_DAILY_SQL.format(events="events")),
    doc="exponentially-weighted moving average of the daily value "
        "series per event type — a LINEAR RECURRENCE (ewma_t = 0.3 v_t "
        "+ 0.7 ewma_{t-1}) that no window frame can express without a "
        "numerically explosive pow() rewrite; Spark 4's WITH RECURSIVE "
        "runs it natively (identical SQL text on both engines). The "
        "recursion operates on the bounded day x type aggregate (14 "
        "steps x 5 types), never on raw events; per-step round(...,6) "
        "pins every intermediate to the same double in both engines. "
        "UNION is gate-banned (reference deny-list), so like the set "
        "ops this is a capability outside the gate",
)
def ewma_recursive_daily(spark, sf_dir):
    # the recursion's per-iteration cost is Spark job scheduling, not
    # data (the loop runs over the day x type aggregate); measured at
    # sf0.01: ~0.9 s/step — the price of the only construct that can
    # express a linear recurrence, paid 14 times on a bounded spine
    load(spark, sf_dir, "events").createOrReplaceTempView("_ewma_events")
    return spark.sql(_EWMA_RECURSIVE_SQL.format(
        daily=_EWMA_DAILY_SQL.format(events="_ewma_events")))


@register(
    "variant_props_stats",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT)                             AS n,
           CAST(min(CAST(json_extract(props, '$.k') AS INTEGER))
                AS INT)                                         AS min_k,
           CAST(max(CAST(json_extract(props, '$.k') AS INTEGER))
                AS INT)                                         AS max_k,
           CAST(sum(CAST(json_extract(props, '$.k') AS INTEGER))
                AS BIGINT)                                      AS sum_k
    FROM events
    GROUP BY event_type ORDER BY event_type
    """,
    doc="semi-structured props via Spark 4's VARIANT type: parse_json "
        "once into the binary VARIANT encoding, then typed "
        "variant_get extraction — the engine-native successor to "
        "per-expression get_json_object re-parsing (json_extract_props "
        "keeps covering that classic path). At 100 TB the difference "
        "is one parse per row vs one parse per extracted field, and "
        "VARIANT columns can persist shredded in parquet",
)
def variant_props_stats(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    v = ev.select(
        "event_type", F.parse_json("props").alias("v")
    ).select(
        "event_type",
        F.variant_get("v", "$.k", "int").alias("k"),
    )
    return (
        v.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.sum("k").cast("bigint").alias("sum_k"),
        )
        .orderBy("event_type")
    )


@register(
    "value_autocorr_by_type",
    """
    WITH s AS (
      SELECT event_type, value,
             lag(value) OVER (PARTITION BY user_id ORDER BY event_id) AS pv
      FROM events)
    SELECT event_type, round(corr(value, pv), 6) AS autocorr_lag1,
           CAST(count(pv) AS BIGINT) AS n_pairs
    FROM s GROUP BY event_type ORDER BY event_type
    """,
    doc="lag-1 autocorrelation of the value series within each user's "
        "event stream, aggregated per type — the is-this-signal-or-"
        "noise diagnostic for metric streams. The lag window is "
        "user-partitioned (bounded streams, never a global ordering); "
        "corr rounds to 6 because moment sums accumulate in "
        "engine-specific order",
)
def value_autocorr_by_type(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("event_id")
    s = ev.select("event_type", "value",
                  F.lag("value").over(w).alias("pv"))
    return (
        s.groupBy("event_type")
        .agg(
            F.round(F.corr("value", "pv"), 6).alias("autocorr_lag1"),
            F.count("pv").alias("n_pairs"),
        )
        .orderBy("event_type")
    )


@register(
    "weekday_profile",
    """
    SELECT CAST(dayofweek(ts) AS INT) AS dow,
           dayofweek(ts) IN (0, 6) AS is_weekend,
           CAST(count(*) AS BIGINT) AS n_events,
           round(avg(value), 6) AS avg_value
    FROM events GROUP BY dayofweek(ts) ORDER BY dow
    """,
    doc="day-of-week activity profile with a weekend flag. Engine trap "
        "made explicit: DuckDB's dayofweek is 0-based Sunday, Spark's "
        "is 1-based Sunday — the Spark side subtracts 1 so both sides "
        "emit the same 0=Sunday..6=Saturday encoding (the kind of "
        "silent off-by-one an oracle-less port ships)",
)
def weekday_profile(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    dow = (F.dayofweek("ts") - 1).cast("int")
    return (
        ev.groupBy(dow.alias("dow"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .select(
            "dow",
            F.col("dow").isin(0, 6).alias("is_weekend"),
            "n_events", "avg_value",
        )
        .orderBy("dow")
    )


@register(
    "higher_order_array_funcs",
    """
    WITH t AS (
      SELECT doc_id, string_split(lower(text), ' ') AS words
      FROM documents WHERE doc_id < 300)
    SELECT doc_id,
           CAST(len(words) AS BIGINT) AS n_words,
           CAST(len(list_filter(words, x -> length(x) > 3)) AS BIGINT)
             AS n_long,
           CAST(list_aggregate(list_transform(words, x -> length(x)),
                               'sum') AS BIGINT) AS total_chars,
           round(CAST(list_aggregate(list_transform(words,
                                     x -> length(x)), 'sum') AS DOUBLE)
                 / len(words), 6) AS avg_word_len
    FROM t ORDER BY doc_id
    """,
    doc="higher-order array functions with lambda expressions — "
        "filter / transform / aggregate over the token array, entirely "
        "inside codegen (no explode, no shuffle, no UDF): the idiom "
        "for per-row collection work at scale, where exploding 100 TB "
        "of token arrays just to re-group them is the classic "
        "anti-pattern. DuckDB spells them list_filter/list_transform/"
        "list_aggregate; Spark spells them filter/transform/aggregate",
)
def higher_order_array_funcs(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    words = F.split(F.lower("text"), " ")
    total_chars = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x))
    n_words = F.size(words)
    return (
        docs.select(
            "doc_id",
            n_words.cast("long").alias("n_words"),
            F.size(F.filter(words, lambda x: F.length(x) > 3))
            .cast("long").alias("n_long"),
            total_chars.alias("total_chars"),
            F.round(total_chars.cast("double") / n_words, 6)
            .alias("avg_word_len"),
        )
        .orderBy("doc_id")
    )


@register(
    "null_safe_join_counts",
    """
    WITH a AS (
      SELECT doc_id, nullif(lang, 'en') AS k
      FROM documents WHERE doc_id < 100),
    b AS (
      SELECT doc_id, nullif(lang, 'en') AS k
      FROM documents WHERE doc_id >= 100 AND doc_id < 200)
    SELECT coalesce(a.k, '<null>') AS join_key,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    GROUP BY coalesce(a.k, '<null>')
    ORDER BY join_key
    """,
    doc="null-safe equality join (Spark <=> / eqNullSafe, SQL IS NOT "
        "DISTINCT FROM): NULL keys match each other instead of "
        "vanishing — the semantic a plain equi-join silently drops. "
        "Derived nullable keys (lang with 'en' nulled out) make the "
        "NULL bucket the largest group, so the difference is load-"
        "bearing in the oracle, not decorative. eqNullSafe keys still "
        "hash-partition (null-safe joins stay shuffle-joinable; only "
        "the comparison differs)",
)
def null_safe_join_counts(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    a = docs.filter(F.col("doc_id") < 100).select(
        F.nullif("lang", F.lit("en")).alias("ka"))
    b = docs.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 200)).select(
        F.nullif("lang", F.lit("en")).alias("kb"))
    return (
        a.join(b, F.col("ka").eqNullSafe(F.col("kb")))
        .groupBy(F.coalesce("ka", F.lit("<null>")).alias("join_key"))
        .agg(F.count("*").alias("n_pairs"))
        .orderBy("join_key")
    )


@register(
    "interpolate_hourly_values",
    """
    WITH b AS (
      SELECT date_trunc('hour', min(ts)) AS lo,
             date_trunc('hour', max(ts)) AS hi FROM events),
    d AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
          FROM b),
    t AS (SELECT DISTINCT event_type FROM events),
    c AS (SELECT date_trunc('hour', ts) AS hour, event_type,
                 CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                   / count(value) AS v
          FROM events GROUP BY 1, 2),
    spine AS (
      SELECT d.hour, t.event_type, c.v
      FROM d CROSS JOIN t
      LEFT JOIN c ON c.hour = d.hour AND c.event_type = t.event_type),
    nb AS (
      SELECT hour, event_type, v,
        last_value(v IGNORE NULLS) OVER w_prev  AS prev_v,
        last_value(CASE WHEN v IS NOT NULL THEN hour END IGNORE NULLS)
          OVER w_prev                           AS prev_h,
        first_value(v IGNORE NULLS) OVER w_next AS next_v,
        first_value(CASE WHEN v IS NOT NULL THEN hour END IGNORE NULLS)
          OVER w_next                           AS next_h
      FROM spine
      WINDOW
        w_prev AS (PARTITION BY event_type ORDER BY hour
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        w_next AS (PARTITION BY event_type ORDER BY hour
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
    SELECT CAST(hour AS TIMESTAMP) AS hour, event_type,
      round(CASE
        WHEN v IS NOT NULL THEN v
        WHEN prev_v IS NOT NULL AND next_v IS NOT NULL THEN
          prev_v + (next_v - prev_v)
                   * (epoch(hour) - epoch(prev_h))
                   / (epoch(next_h) - epoch(prev_h))
        WHEN prev_v IS NOT NULL THEN prev_v
        ELSE next_v END, 6) AS value,
      v IS NULL AS interpolated
    FROM nb ORDER BY event_type, hour
    """,
    doc="time-series linear interpolation: the hour x type spine "
        "(bounded by retention window x enum, same posture as "
        "gap_fill_daily_counts) left-joins hourly averages, then NULL "
        "hours are filled by time-weighted interpolation between the "
        "nearest non-null neighbors (edge gaps take the available "
        "side). Two windows per type — last-ignore-nulls backward, "
        "first-ignore-nulls forward — partitioned by type, so state "
        "per window is one value, never the series; facts aggregate "
        "before touching the spine and only the spine is windowed",
)
def interpolate_hourly_values(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    # exact decimal sum, then one double division: a plain avg(double)
    # is partial-sum-order dependent, and at sf0.1 one hourly mean lands
    # exactly on a round-6 half boundary (…2.5), flipping the last digit
    # between engines. The decimal(18,6) sum is exact for the fixture's
    # 2-decimal values in BOTH engines, so the division inputs — and
    # therefore every interpolated value downstream — are identical
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(
        (F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
         / F.count("value")).alias("v")
    )
    bounds = ev.agg(F.date_trunc("hour", F.min("ts")).alias("lo"),
                    F.date_trunc("hour", F.max("ts")).alias("hi"))
    hours = bounds.select(F.explode(
        F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hour"))
    types = ev.select("event_type").distinct()
    spine = (
        hours.crossJoin(types)  # bounded spine, not data
        # broadcast the AGGREGATED side: the spine is the preserved
        # side of the left join and can never be the hash-join build
        # side — a hint there is silently ignored (r14 verdict #6);
        # hourly is hours x types bounded, same as the spine
        .join(F.broadcast(hourly), ["hour", "event_type"], "left")
    )
    w_prev = (W.partitionBy("event_type").orderBy("hour")
              .rowsBetween(W.unboundedPreceding, W.currentRow))
    w_next = (W.partitionBy("event_type").orderBy("hour")
              .rowsBetween(W.currentRow, W.unboundedFollowing))
    nn_hour = F.when(F.col("v").isNotNull(), F.col("hour"))
    nb = spine.select(
        "hour", "event_type", "v",
        F.last("v", ignorenulls=True).over(w_prev).alias("prev_v"),
        F.last(nn_hour, ignorenulls=True).over(w_prev).alias("prev_h"),
        F.first("v", ignorenulls=True).over(w_next).alias("next_v"),
        F.first(nn_hour, ignorenulls=True).over(w_next).alias("next_h"),
    )
    frac = (
        (F.unix_timestamp("hour") - F.unix_timestamp("prev_h")).cast("double")
        / (F.unix_timestamp("next_h") - F.unix_timestamp("prev_h"))
    )
    filled = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("prev_v").isNotNull() & F.col("next_v").isNotNull(),
              F.col("prev_v") + (F.col("next_v") - F.col("prev_v")) * frac)
        .when(F.col("prev_v").isNotNull(), F.col("prev_v"))
        .otherwise(F.col("next_v"))
    )
    return nb.select(
        "hour", "event_type",
        F.round(filled, 6).alias("value"),
        F.col("v").isNull().alias("interpolated"),
    ).orderBy("event_type", "hour")


@register(
    "session_window_stats",
    """
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL OR
                       ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sessions AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM flagged)
    SELECT user_id, CAST(min(ts) AS TIMESTAMP) AS session_start,
           CAST(count(*) AS BIGINT) AS n_events
    FROM sessions GROUP BY user_id, sid
    ORDER BY user_id, session_start
    """,
    doc="per-session rows via Spark's NATIVE session_window() — the "
        "same Catalyst SessionWindow expression the streaming path "
        "uses (sessionize_30min is the manual lag/cumsum analogue that "
        "only counts sessions; this one materializes each session with "
        "its start and size). One shuffle on user_id; session merge is "
        "the operator's own sort within partition. The oracle is the "
        "classic gap-island SQL, proving the native operator against "
        "first principles",
    tags=("streaming", "capability"),
)
def session_window_stats(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count("*").alias("n_events"))
        .select("user_id",
                F.col("session_window.start").alias("session_start"),
                "n_events")
        .orderBy("user_id", "session_start")
    )


@register(
    "hll_sketch_columns_mergeable",
    "SELECT true AS per_type_ok, true AS union_ok, true AS merge_le_sum",
    doc="native Datasketches HLL sketch COLUMNS (hll_sketch_agg / "
        "hll_union_agg / hll_sketch_estimate): per-type user sketches "
        "are built once, persisted as binary values, and re-aggregated "
        "by sketch union WITHOUT touching the raw facts — the "
        "sketch-per-segment pattern our custom sketches.py registry "
        "implements, here through Spark's built-in operators (the "
        "reference keeps per-table HLL state the same way, "
        "query/approximation.go). Checks: every per-type estimate "
        "within 10% of exact, the union estimate within 10% of the "
        "global exact, and union <= sum of parts (sketches dedupe "
        "across segments). 100 TB posture: the expensive pass is one "
        "map-side-combined agg; re-aggregation unions kilobyte "
        "sketches, which is what makes rollup cubes over distincts "
        "cheap at scale",
    tags=("sketch",),
)
def hll_sketch_columns_mergeable(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", F.lit(12)).alias("sk"),
        F.countDistinct("user_id").alias("exact"),
    )
    checked = per_type.select(
        (F.abs(F.hll_sketch_estimate("sk") - F.col("exact"))
         / F.col("exact") < 0.10).alias("type_ok"),
        F.hll_sketch_estimate("sk").alias("est"),
        "sk",
    )
    merged = checked.agg(
        F.min("type_ok").alias("per_type_ok"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("union_est"),
        F.sum("est").alias("sum_est"),
    )
    exact_all = ev.agg(F.countDistinct("user_id").alias("exact_all"))
    return merged.crossJoin(F.broadcast(exact_all)).select(
        "per_type_ok",
        (F.abs(F.col("union_est") - F.col("exact_all"))
         / F.col("exact_all") < 0.10).alias("union_ok"),
        (F.col("union_est") <= F.col("sum_est")).alias("merge_le_sum"),
    )


@register(
    "pagerank_bipartite_topk",
    """
    WITH edges AS (
      SELECT DISTINCT l_partkey AS src, l_suppkey + 10000000 AS dst
      FROM lineitem
      UNION ALL
      SELECT DISTINCT l_suppkey + 10000000 AS src, l_partkey AS dst
      FROM lineitem),
    deg AS (SELECT src, CAST(count(*) AS DOUBLE) AS d FROM edges
            GROUP BY 1),
    nn AS (SELECT CAST(count(*) AS DOUBLE) AS cnt FROM deg),
    r0 AS (SELECT src AS id, 1.0/cnt AS r FROM deg, nn),
    r1 AS (SELECT e.dst AS id,
                  0.15/any_value(nn.cnt) + 0.85*sum(r0.r/deg.d) AS r
           FROM edges e JOIN r0 ON r0.id = e.src
           JOIN deg ON deg.src = e.src, nn GROUP BY e.dst),
    r2 AS (SELECT e.dst AS id,
                  0.15/any_value(nn.cnt) + 0.85*sum(r1.r/deg.d) AS r
           FROM edges e JOIN r1 ON r1.id = e.src
           JOIN deg ON deg.src = e.src, nn GROUP BY e.dst),
    r3 AS (SELECT e.dst AS id,
                  0.15/any_value(nn.cnt) + 0.85*sum(r2.r/deg.d) AS r
           FROM edges e JOIN r2 ON r2.id = e.src
           JOIN deg ON deg.src = e.src, nn GROUP BY e.dst)
    SELECT CAST(id - 10000000 AS BIGINT) AS s_suppkey,
           round(r, 9) AS pagerank
    FROM r3 WHERE id >= 10000000
    ORDER BY round(r, 9) DESC, s_suppkey LIMIT 20
    """,
    doc="iterative graph algorithm coverage: 3 power iterations of "
        "PageRank (d=0.85) over the part-supplier bipartite graph from "
        "distinct lineitem links, top-20 suppliers by influence. The "
        "loop is a driver-side PLAN construction (3 fixed unrolled "
        "join+agg rounds, nothing collected): each iteration joins the "
        "node-sized rank vector to the edge list and re-aggregates on "
        "the destination — the canonical distributed PageRank step, "
        "Pregel-without-the-framework. Degree and edge tables build "
        "once; the bipartite structure guarantees no dangling nodes. "
        "At production scale each iteration would checkpoint to "
        "truncate lineage; with K=3 fixed the plan stays bounded. "
        "Scores round to 9 decimals before the ordering so both "
        "engines rank identically (FP accumulation error ~1e-15, five "
        "orders below the rounding grain)",
)
def pagerank_bipartite_topk(spark, sf_dir):
    OFF = 10_000_000
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey").distinct()
    edges = li.select(
        F.col("l_partkey").alias("src"),
        (F.col("l_suppkey") + OFF).alias("dst"),
    ).unionByName(li.select(
        (F.col("l_suppkey") + OFF).alias("src"),
        F.col("l_partkey").alias("dst"),
    ))
    deg = edges.groupBy("src").agg(F.count("*").cast("double").alias("d"))
    nn = deg.agg(F.count("*").cast("double").alias("cnt"))
    ranks = deg.crossJoin(F.broadcast(nn)).select(  # 1-row scalar
        F.col("src").alias("id"), (F.lit(1.0) / F.col("cnt")).alias("r"))
    ed = edges.join(deg, "src")
    for _ in range(3):
        contrib = (
            ed.join(ranks, ed.src == ranks.id)
            .select("dst", (F.col("r") / F.col("d")).alias("c"))
            .groupBy("dst").agg(F.sum("c").alias("s"))
        )
        ranks = contrib.crossJoin(F.broadcast(nn)).select(  # 1-row scalar
            F.col("dst").alias("id"),
            (F.lit(0.15) / F.col("cnt") + 0.85 * F.col("s")).alias("r"),
        )
    return (
        ranks.filter(F.col("id") >= OFF)
        .select((F.col("id") - OFF).cast("bigint").alias("s_suppkey"),
                F.round("r", 9).alias("pagerank"))
        .orderBy(F.col("pagerank").desc(), "s_suppkey")
        .limit(20)
    )


@register(
    "hll_intersection_within_bound",
    "SELECT true AS intersect_ok, true AS union_ge_parts",
    doc="sketch ALGEBRA beyond union: distinct-set intersection "
        "estimated by inclusion-exclusion over native HLL sketches "
        "(|A n B| ~ |A| + |B| - |A u B|) for two partially-overlapping "
        "user cohorts (high-value clickers vs high-value purchasers — "
        "75/67 users overlapping in 31 at sf0.01). I-E error compounds "
        "three estimates, so the bound is deliberately loose "
        "(max(3 absolute, 25% relative) vs the exact intersection). "
        "100 TB posture: cohort sketches build in one pass each and "
        "intersect as pure driver arithmetic on kilobyte sketches — "
        "the segment-overlap diagnostic (audience overlap, cross-shard "
        "dup rate) without a distinct-pair shuffle. Also asserts "
        "union >= each part (monotonicity the sketch guarantees)",
    tags=("sketch",),
)
def hll_intersection_within_bound(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    a = ev.filter((F.col("event_type") == "click")
                  & (F.col("value") > 150)).select("user_id")
    b = ev.filter((F.col("event_type") == "purchase")
                  & (F.col("value") > 150)).select("user_id")
    sk = (
        a.agg(F.hll_sketch_agg("user_id", F.lit(12)).alias("ska"))
        .crossJoin(b.agg(
            F.hll_sketch_agg("user_id", F.lit(12)).alias("skb")))
    )
    est = sk.select(
        F.hll_sketch_estimate("ska").alias("ea"),
        F.hll_sketch_estimate("skb").alias("eb"),
        F.hll_sketch_estimate(
            F.hll_union("ska", "skb")).alias("eu"),
    )
    exact = (
        a.intersect(b).agg(F.count("*").alias("exact_int"))
    )
    return est.crossJoin(F.broadcast(exact)).select(
        (F.abs((F.col("ea") + F.col("eb") - F.col("eu"))
               - F.col("exact_int"))
         <= F.greatest(F.lit(3.0), 0.25 * F.col("exact_int"))
         ).alias("intersect_ok"),
        ((F.col("eu") >= F.col("ea")) & (F.col("eu") >= F.col("eb"))
         ).alias("union_ge_parts"),
    )


@register(
    "weighted_sample_topk",
    """
    WITH keyed AS (
      SELECT doc_id, n_chars,
             (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                   AS BIGINT) + 1.0) / 4294967297.0 AS u
      FROM documents WHERE n_chars > 0)
    SELECT doc_id, n_chars,
           round(pow(u, 1.0 / n_chars), 9) AS es_key
    FROM keyed
    ORDER BY round(pow(u, 1.0 / n_chars), 9) DESC, doc_id LIMIT 50
    """,
    doc="deterministic weighted sampling WITHOUT replacement "
        "(Efraimidis-Spirakis 2006): key = u^(1/w) with w = document "
        "length, top-k by key == a weight-proportional sample. The "
        "uniform u derives from md5(doc_id) — not a PRNG — so the "
        "sample is a pure function of the data: stable across re-runs, "
        "partitioning, and engines (the property every reproducible "
        "training-data pipeline needs from its samplers, same posture "
        "as the md5-rank quota sampler). One narrow scan + "
        "TakeOrderedAndProject: top-k never sorts the corpus, and the "
        "per-row key needs no global state, so the op is embarrassingly "
        "parallel at any scale. Keys round to 9 decimals before "
        "ranking so both engines order identically (pow ulp "
        "differences sit ~1e-15, seven orders below the grain)",
    tags=("llm",),
)
def weighted_sample_topk(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u = (
        (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
                16, 10).cast("bigint") + 1.0)
        / 4294967297.0
    )
    es_key = F.round(
        F.pow(u, 1.0 / F.col("n_chars")), 9).alias("es_key")
    return (
        docs.select("doc_id", "n_chars", es_key)
        .orderBy(F.col("es_key").desc(), "doc_id")
        .limit(50)
    )


@register(
    "skyline_parts",
    """
    WITH m AS (
      SELECT p_size AS sz, min(p_retailprice) AS best_price
      FROM part GROUP BY p_size),
    w AS (
      SELECT sz, best_price,
             min(best_price) OVER (
               ORDER BY sz DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS prev_best
      FROM m)
    SELECT sz, round(best_price, 2) AS best_price
    FROM w
    WHERE prev_best IS NULL OR best_price < prev_best
    ORDER BY sz
    """,
    doc="2-D skyline (Pareto frontier): parts not dominated on "
        "(maximize p_size, minimize p_retailprice). The naive frontier "
        "is a quadratic NOT-EXISTS self-join; this formulation is "
        "O(n log n) and reduce-first: one distributed min-aggregate "
        "collapses the facts to one candidate per size (the size "
        "domain is bounded — ~50 values — so the candidate table is "
        "tiny at any corpus scale), then a running-min window over the "
        "candidates ordered by size DESC keeps exactly the points that "
        "strictly improve on every larger size. The single-partition "
        "window touches only the domain-sized candidate set, never the "
        "facts; for unbounded 2-D domains the same algebra distributes "
        "as block-local skyline + merge (skyline(U) is a subset of the "
        "union of block skylines)",
)
def skyline_parts(spark, sf_dir):
    part = load(spark, sf_dir, "part")
    m = part.groupBy(F.col("p_size").alias("sz")).agg(
        F.min("p_retailprice").alias("best_price")
    )
    w = (
        W.orderBy(F.col("sz").desc())
        .rowsBetween(W.unboundedPreceding, -1)
    )
    return (
        m.select(
            "sz", "best_price", F.min("best_price").over(w).alias("prev_best")
        )
        .filter(
            F.col("prev_best").isNull()
            | (F.col("best_price") < F.col("prev_best"))
        )
        .select("sz", F.round("best_price", 2).alias("best_price"))
        .orderBy("sz")
    )


@register(
    "winsorized_value_stats",
    """
    WITH e AS (SELECT event_type, value FROM events
               WHERE value IS NOT NULL),
    b AS (
      SELECT event_type,
             quantile_cont(value, 0.05) AS lo,
             quantile_cont(value, 0.95) AS hi
      FROM e GROUP BY event_type)
    SELECT e.event_type,
           round(avg(least(greatest(e.value, b.lo), b.hi)), 6)
             AS wins_mean,
           CAST(sum(CASE WHEN e.value < b.lo THEN 1 ELSE 0 END)
                AS BIGINT) AS n_lo_clip,
           CAST(sum(CASE WHEN e.value > b.hi THEN 1 ELSE 0 END)
                AS BIGINT) AS n_hi_clip,
           CAST(count(*) AS BIGINT) AS n
    FROM e JOIN b ON e.event_type = b.event_type
    GROUP BY e.event_type ORDER BY e.event_type
    """,
    doc="winsorized (p05/p95-clamped) mean per event type plus exact "
        "clip counts — the robust-statistics companion to the Tukey "
        "fences: instead of discarding outliers it caps them, which is "
        "what metric pipelines do when heavy tails would otherwise let "
        "a single bad sensor dominate a mean. Two passes, both "
        "distributed: one exact interpolated-percentile aggregate "
        "builds the per-type (lo, hi) bounds table (type-cardinality "
        "rows, broadcast), one more pass clamps and averages. NULL "
        "values are filtered before the percentile so the bounds and "
        "the clamp see the same population; the mean rounds to 6 "
        "decimals (partial-agg order differences sit ~1e-12, six "
        "orders below the grain) and the clip counts are exact "
        "integers",
)
def winsorized_value_stats(spark, sf_dir):
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", "value")
    )
    b = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.05)).alias("lo"),
        F.percentile("value", F.lit(0.95)).alias("hi"),
    )
    clipped = ev.join(F.broadcast(b), "event_type")
    return (
        clipped.groupBy("event_type")
        .agg(
            F.round(
                F.avg(F.least(F.greatest("value", "lo"), F.col("hi"))), 6
            ).alias("wins_mean"),
            F.sum(
                F.when(F.col("value") < F.col("lo"), 1).otherwise(0)
            ).alias("n_lo_clip"),
            F.sum(
                F.when(F.col("value") > F.col("hi"), 1).otherwise(0)
            ).alias("n_hi_clip"),
            F.count("*").alias("n"),
        )
        .orderBy("event_type")
    )


@register(
    "gini_totalprice_by_priority",
    """
    WITH r AS (
      SELECT o_orderpriority AS prio, o_totalprice AS x,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice) AS i
      FROM orders
    )
    SELECT prio, CAST(count(*) AS BIGINT) AS n,
           round((2.0 * sum(i * x) - (count(*) + 1) * sum(x))
                 / (count(*) * sum(x)), 6) AS gini
    FROM r GROUP BY prio ORDER BY prio
    """,
    doc="Gini coefficient of order value per priority class — the "
        "Lorenz-curve concentration measure, via the sorted-rank "
        "identity G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)) with "
        "x ascending. One window (rank within group) + one aggregate; "
        "row_number over tied values is safe because equal x makes "
        "sum(i*x) invariant to tie order. The in-group sort is the "
        "inherent cost of an exact Gini; at 100 TB with few groups "
        "you'd bin first (equi-depth histogram -> trapezoid Lorenz "
        "area) to keep per-partition sorts bounded — documented "
        "trade-off, exact form kept here because the driver compares "
        "exact values",
)
def gini_totalprice_by_priority(spark, sf_dir):
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("prio"),
        F.col("o_totalprice").alias("x"),
    )
    w = W.partitionBy("prio").orderBy("x")
    r = o.withColumn("i", F.row_number().over(w))
    return (
        r.groupBy("prio")
        .agg(
            F.count("*").alias("n"),
            F.round(
                (2.0 * F.sum(F.col("i") * F.col("x"))
                 - (F.count("*") + F.lit(1)) * F.sum("x"))
                / (F.count("*") * F.sum("x")),
                6,
            ).alias("gini"),
        )
        .orderBy("prio")
    )


@register(
    "benford_first_digit",
    """
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                              AS VARCHAR), 1, 1) AS INT) AS digit
      FROM orders WHERE o_totalprice >= 1.0
    )
    SELECT digit,
           CAST(count(*) AS BIGINT) AS n,
           round(count(*) * 1.0 / sum(count(*)) OVER (), 6) AS share,
           round(log10(1.0 + 1.0 / digit), 6) AS benford_p,
           round(abs(count(*) * 1.0 / sum(count(*)) OVER ()
                     - log10(1.0 + 1.0 / digit)), 6) AS abs_dev
    FROM d GROUP BY digit ORDER BY digit
    """,
    doc="Benford's-law first-significant-digit audit over order values "
        "— the classic fraud/synthetic-data screen: observed digit "
        "share vs log10(1 + 1/d). floor() before the integer cast "
        "keeps Spark (truncating cast) and DuckDB (rounding cast) "
        "identical. One map-side-combinable 9-group aggregate; the "
        "share window runs over the 9-row aggregate output, never the "
        "fact table, so the single-partition window is constant-size "
        "at any corpus scale",
)
def benford_first_digit(spark, sf_dir):
    d = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") >= 1.0)
        .select(
            F.substring(
                F.floor("o_totalprice").cast("string"), 1, 1
            ).cast("int").alias("digit")
        )
    )
    counts = d.groupBy("digit").agg(F.count("*").alias("n"))
    w = W.partitionBy()
    share = F.col("n") / F.sum("n").over(w)
    benford_p = F.log10(1.0 + 1.0 / F.col("digit"))
    return (
        counts.select(
            "digit",
            "n",
            F.round(share, 6).alias("share"),
            F.round(benford_p, 6).alias("benford_p"),
            F.round(F.abs(share - benford_p), 6).alias("abs_dev"),
        )
        .orderBy("digit")
    )


@register(
    "chi2_priority_status",
    """
    WITH c AS (
      SELECT o_orderpriority AS p, o_orderstatus AS s,
             CAST(count(*) AS DOUBLE) AS n
      FROM orders GROUP BY 1, 2),
    t AS (
      SELECT p, s, n,
             sum(n) OVER (PARTITION BY p) AS rowt,
             sum(n) OVER (PARTITION BY s) AS colt,
             sum(n) OVER () AS g
      FROM c)
    SELECT round(sum((n - rowt * colt / g) * (n - rowt * colt / g)
                     / (rowt * colt / g) - rowt * colt / g)
                 + max(g), 6) AS chi2,
           CAST((count(DISTINCT p) - 1) * (count(DISTINCT s) - 1)
                AS BIGINT) AS dof,
           CAST(max(g) AS BIGINT) AS n_obs
    FROM t
    """,
    doc="Pearson chi-squared test of independence for the priority x "
        "status contingency — are order priority and fulfilment status "
        "associated? Computed without densifying the table: for cells "
        "absent from the grouped counts the chi2 term degenerates to "
        "the expected count e, and sum(e) over ALL cells telescopes to "
        "the grand total g, so chi2 = sum_observed((n-e)^2/e - e) + g. "
        "That removes the distinct-p x distinct-s cross join a naive "
        "dense formulation needs. One fact-table aggregate (map-side "
        "combinable, cells bounded by |p|*|s|); every window runs on "
        "the cell table, constant-size at any scale",
)
def chi2_priority_status(spark, sf_dir):
    c = (
        load(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("p"),
            F.col("o_orderstatus").alias("s"),
        )
        .agg(F.count("*").cast("double").alias("n"))
    )
    t = c.select(
        "p",
        "s",
        "n",
        F.sum("n").over(W.partitionBy("p")).alias("rowt"),
        F.sum("n").over(W.partitionBy("s")).alias("colt"),
        F.sum("n").over(W.partitionBy()).alias("g"),
    )
    e = F.col("rowt") * F.col("colt") / F.col("g")
    return t.agg(
        F.round(
            F.sum((F.col("n") - e) * (F.col("n") - e) / e - e)
            + F.max("g"),
            6,
        ).alias("chi2"),
        (
            (F.count_distinct("p") - F.lit(1))
            * (F.count_distinct("s") - F.lit(1))
        ).cast("long").alias("dof"),
        F.max("g").cast("long").alias("n_obs"),
    )


@register(
    "longest_daily_streak",
    """
    WITH d AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
    g AS (
      SELECT user_id, day,
             day - CAST(row_number() OVER (PARTITION BY user_id
                                           ORDER BY day) AS INT) AS anchor
      FROM d),
    runs AS (
      SELECT user_id, anchor, count(*) AS len
      FROM g GROUP BY user_id, anchor)
    SELECT user_id,
           CAST(max(len) AS BIGINT) AS longest_streak,
           CAST(count(*) AS BIGINT) AS n_runs
    FROM runs GROUP BY user_id ORDER BY user_id
    """,
    doc="gaps-and-islands: longest run of consecutive active days per "
        "user, via the date-minus-row_number anchor trick (consecutive "
        "days share one anchor date). The canonical SQL idiom for "
        "streak/retention analytics, absent from the registry until "
        "now. DISTINCT (user, day) collapses the fact table first so "
        "the window ranks at most days-per-user rows; everything "
        "shuffles on user_id (high cardinality, no skew pole), no "
        "joins anywhere",
)
def longest_daily_streak(spark, sf_dir):
    d = (
        load(spark, sf_dir, "events")
        .select("user_id", F.col("ts").cast("date").alias("day"))
        .distinct()
    )
    w = W.partitionBy("user_id").orderBy("day")
    g = d.withColumn(
        "anchor", F.date_sub("day", F.row_number().over(w))
    )
    runs = g.groupBy("user_id", "anchor").agg(F.count("*").alias("len"))
    return (
        runs.groupBy("user_id")
        .agg(
            F.max("len").alias("longest_streak"),
            F.count("*").alias("n_runs"),
        )
        .orderBy("user_id")
    )


@register(
    "rrf_fused_selection",
    """
    WITH a AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY n_chars DESC, doc_id) AS r
      FROM documents ORDER BY n_chars DESC, doc_id LIMIT 100
    ),
    q AS (
      SELECT doc_id,
             length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0
               / greatest(n_chars, 1) AS alpha_frac
      FROM documents
    ),
    b AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY alpha_frac DESC, doc_id) AS r
      FROM q ORDER BY alpha_frac DESC, doc_id LIMIT 100
    )
    SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
           round(coalesce(1.0 / (60 + a.r), 0.0)
                 + coalesce(1.0 / (60 + b.r), 0.0), 6) AS rrf_score
    FROM a FULL JOIN b ON a.doc_id = b.doc_id
    ORDER BY rrf_score DESC, doc_id LIMIT 20
    """,
    doc="reciprocal-rank fusion for training-data selection: two "
        "independent document rankings (length; alphabetic-character "
        "fraction as a quality proxy) fused by RRF with the standard "
        "k=60, top-20 selected. Implemented the way retrieval systems "
        "actually run RRF at scale — over per-signal top-M shortlists "
        "(M=100), NOT global ranks: each shortlist is a "
        "TakeOrderedAndProject (per-partition top-M then merge, no "
        "global sort or single-partition window over the corpus), the "
        "rank window runs on the M-row shortlist, and the two "
        "shortlists full-outer-join at M-row size (broadcastable). "
        "Deterministic: both orderings tiebreak on doc_id, so "
        "row_number equals rank and float ties cannot reorder across "
        "engines",
)
def rrf_fused_selection(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    a_short = (
        docs.select("doc_id", "n_chars")
        .orderBy(F.desc("n_chars"), "doc_id")
        .limit(100)
    )
    a = a_short.select(
        "doc_id",
        F.row_number()
        .over(W.partitionBy().orderBy(F.desc("n_chars"), "doc_id"))
        .alias("ra"),
    )
    q = docs.select(
        "doc_id",
        (
            F.length(F.regexp_replace("text", "[^A-Za-z]", "")) * 1.0
            / F.greatest("n_chars", F.lit(1))
        ).alias("alpha_frac"),
    )
    b_short = q.orderBy(F.desc("alpha_frac"), "doc_id").limit(100)
    b = b_short.select(
        "doc_id",
        F.row_number()
        .over(W.partitionBy().orderBy(F.desc("alpha_frac"), "doc_id"))
        .alias("rb"),
    )
    fused = a.join(b, "doc_id", "full_outer").select(
        "doc_id",
        F.round(
            F.coalesce(1.0 / (60 + F.col("ra")), F.lit(0.0))
            + F.coalesce(1.0 / (60 + F.col("rb")), F.lit(0.0)),
            6,
        ).alias("rrf_score"),
    )
    return fused.orderBy(F.desc("rrf_score"), "doc_id").limit(20)


@register(
    "ks_drift_event_types",
    """
    WITH e AS (
      SELECT event_type AS g, value FROM events
      WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL),
    b AS (SELECT min(value) AS lo, max(value) AS hi FROM e),
    binned AS (
      SELECT g,
             least(CAST(floor((value - lo)
                              / (greatest(hi - lo, 1e-12) / 200.0))
                        AS INT), 199) AS bin,
             CAST(count(*) AS DOUBLE) AS n
      FROM e, b GROUP BY 1, 2),
    cum AS (
      SELECT bin,
             sum(CASE WHEN g = 'click' THEN n ELSE 0 END) AS nc,
             sum(CASE WHEN g = 'purchase' THEN n ELSE 0 END) AS np
      FROM binned GROUP BY bin),
    cdf AS (
      SELECT bin,
             sum(nc) OVER (ORDER BY bin) / sum(nc) OVER () AS fc,
             sum(np) OVER (ORDER BY bin) / sum(np) OVER () AS fp
      FROM cum)
    SELECT round(max(abs(fc - fp)), 6) AS ks_stat,
           CAST(count(*) AS BIGINT) AS n_bins_used
    FROM cdf
    """,
    doc="two-sample Kolmogorov-Smirnov drift statistic between the "
        "'click' and 'purchase' value distributions, in the grid-ECDF "
        "form that is the honest distributed shape: values bin onto a "
        "200-cell equi-width grid (one map-side-combinable aggregate "
        "over the facts), cumulative shares and the max-gap run on the "
        "<=200-row bin table. Exact KS needs a global sort by value; "
        "the grid form bounds the error by the largest per-bin "
        "probability mass while keeping every post-scan stage "
        "constant-size at any corpus scale — the standard "
        "drift-monitor trade (same posture as histogram_equi_width). "
        "The scalar (lo, hi) bounds row broadcasts; the zero-width "
        "guard (greatest(hi-lo, 1e-12)) keeps the degenerate "
        "single-value corpus from dividing by zero",
)
def ks_drift_event_types(spark, sf_dir):
    e = (
        load(spark, sf_dir, "events")
        .filter(
            F.col("event_type").isin("click", "purchase")
            & F.col("value").isNotNull()
        )
        .select(F.col("event_type").alias("g"), "value")
    )
    b = e.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    width = F.greatest(F.col("hi") - F.col("lo"), F.lit(1e-12)) / 200.0
    binned = (
        e.crossJoin(F.broadcast(b))
        .select(
            "g",
            F.least(
                F.floor((F.col("value") - F.col("lo")) / width).cast("int"),
                F.lit(199),
            ).alias("bin"),
        )
        .groupBy("g", "bin")
        .agg(F.count("*").cast("double").alias("n"))
    )
    cum = binned.groupBy("bin").agg(
        F.sum(F.when(F.col("g") == "click", F.col("n")).otherwise(0.0))
        .alias("nc"),
        F.sum(F.when(F.col("g") == "purchase", F.col("n")).otherwise(0.0))
        .alias("np"),
    )
    w_run = W.partitionBy().orderBy("bin")
    w_all = W.partitionBy()
    cdf = cum.select(
        "bin",
        (F.sum("nc").over(w_run) / F.sum("nc").over(w_all)).alias("fc"),
        (F.sum("np").over(w_run) / F.sum("np").over(w_all)).alias("fp"),
    )
    return cdf.agg(
        F.round(F.max(F.abs(F.col("fc") - F.col("fp"))), 6).alias("ks_stat"),
        F.count("*").alias("n_bins_used"),
    )


@register(
    "snapshot_diff_users",
    """
    WITH d1 AS (
      SELECT user_id, sum(value) AS v FROM events
      WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-02'
      GROUP BY 1),
    d2 AS (
      SELECT user_id, sum(value) AS v FROM events
      WHERE ts >= TIMESTAMP '2024-01-02' AND ts < TIMESTAMP '2024-01-03'
      GROUP BY 1)
    SELECT CASE WHEN d1.user_id IS NULL THEN 'added'
                WHEN d2.user_id IS NULL THEN 'removed'
                ELSE 'retained' END AS status,
           CAST(count(*) AS BIGINT) AS n_users,
           round(avg(d2.v - d1.v), 6) AS avg_value_delta
    FROM d1 FULL JOIN d2 ON d1.user_id = d2.user_id
    GROUP BY 1 ORDER BY 1
    """,
    doc="snapshot diff (data-versioning primitive): classify every key as "
        "added / removed / retained between two day snapshots via one "
        "FULL OUTER join of two partition-pruned aggregates, with the "
        "retained keys' value drift. At 100 TB this is the generational "
        "table-diff shape: each side scans only its dt partitions, both "
        "sides shuffle once on the join key, AQE co-partitions the join, "
        "and the output is status-bounded (3 rows)",
)
def snapshot_diff_users(spark, sf_dir):
    ev = load(spark, sf_dir, "events")

    def day(d1, d2):
        return (
            ev.filter((F.col("ts") >= F.lit(d1).cast("timestamp"))
                      & (F.col("ts") < F.lit(d2).cast("timestamp")))
            .groupBy("user_id").agg(F.sum("value").alias("v"))
        )

    a = day("2024-01-01", "2024-01-02").withColumnsRenamed(
        {"user_id": "u1", "v": "v1"})
    b = day("2024-01-02", "2024-01-03").withColumnsRenamed(
        {"user_id": "u2", "v": "v2"})
    return (
        a.join(b, F.col("u1") == F.col("u2"), "full_outer")
        .select(
            F.when(F.col("u1").isNull(), "added")
            .when(F.col("u2").isNull(), "removed")
            .otherwise("retained").alias("status"),
            (F.col("v2") - F.col("v1")).alias("delta"),
        )
        .groupBy("status")
        .agg(F.count("*").alias("n_users"),
             F.round(F.avg("delta"), 6).alias("avg_value_delta"))
        .orderBy("status")
    )


@register(
    "monolingual_source_audit",
    """
    WITH sl AS (SELECT source, lang, count(*) AS c FROM documents
                GROUP BY 1, 2),
    agg AS (SELECT source, sum(c) AS n_docs, count(*) AS n_langs,
                   max(c) AS top_c
            FROM sl GROUP BY 1)
    SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_langs AS BIGINT) AS n_langs,
           round(top_c * 1.0 / n_docs, 6) AS majority_share,
           n_langs > 1 AS fd_violated
    FROM agg ORDER BY source
    """,
    doc="functional-dependency audit (source -> lang): the data-quality "
        "gate a crawl pipeline runs before training-mix decisions — a "
        "source claiming to be monolingual but carrying many languages "
        "signals mislabeled or contaminated ingestion. Two key-bounded "
        "aggregations (source x lang, then source); the first shuffle "
        "carries only counts, never text — scale cost is one pass over "
        "the corpus metadata columns",
    tags=("llm",),
)
def monolingual_source_audit(spark, sf_dir):
    docs = fixture_df(spark, sf_dir, "documents")
    sl = docs.groupBy("source", "lang").agg(F.count("*").alias("c"))
    return (
        sl.groupBy("source")
        .agg(F.sum("c").alias("n_docs"),
             F.count("*").alias("n_langs"),
             F.max("c").alias("top_c"))
        .select(
            "source",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.col("n_langs").cast("bigint").alias("n_langs"),
            F.round(F.col("top_c") / F.col("n_docs"), 6)
            .alias("majority_share"),
            (F.col("n_langs") > 1).alias("fd_violated"),
        )
        .orderBy("source")
    )


@register(
    "histogram_equi_depth",
    """
    WITH v AS (SELECT value FROM events WHERE value IS NOT NULL),
    e AS (SELECT list_transform(
            quantile_cont(value, [0.1, 0.2, 0.3, 0.4, 0.5,
                                  0.6, 0.7, 0.8, 0.9]),
            q -> round(q, 6)) AS edges FROM v)
    SELECT CAST(len(list_filter(edges, x -> value >= x)) AS BIGINT)
             AS bin,
           CAST(count(*) AS BIGINT) AS n
    FROM v, e GROUP BY 1 ORDER BY 1
    """,
    doc="equi-depth 10-bin histogram: decile edges from ONE exact "
        "interpolated-percentile aggregate (rounded to 6 on both "
        "engines before the comparisons), broadcast back as a 9-element "
        "array; bin = how many edges the value clears. Unlike an "
        "ntile() formulation there is NO unpartitioned global-sort "
        "window — the scan-side cost is a scalar-array comparison "
        "inside codegen, the agg domain is 10 keys",
)
def histogram_equi_depth(spark, sf_dir):
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    qs = [i / 10.0 for i in range(1, 10)]
    edges = ev.agg(
        F.transform(
            F.percentile("value", F.array(*[F.lit(q) for q in qs])),
            lambda q: F.round(q, 6),
        ).alias("edges")
    )
    return (
        ev.crossJoin(F.broadcast(edges))  # 1-row scalar, not a data join
        .select(
            F.aggregate(
                "edges", F.lit(0),
                lambda acc, x: acc + F.when(F.col("value") >= x, 1)
                .otherwise(0),
            ).cast("bigint").alias("bin")
        )
        .groupBy("bin")
        .agg(F.count("*").alias("n"))
        .orderBy("bin")
    )


@register(
    "label_class_weights",
    """
    WITH c AS (SELECT label, count(*) AS n FROM embeddings GROUP BY 1),
    t AS (SELECT sum(n) AS total, count(*) AS k FROM c)
    SELECT label, CAST(n AS BIGINT) AS n,
           round(total * 1.0 / (k * n), 6) AS class_weight
    FROM c, t ORDER BY label
    """,
    doc="balanced class weights (sklearn's n_samples/(n_classes*n_c) "
        "convention) for a labeled training set: one count per label, "
        "one scalar total, weight as a pure expression — the loss-"
        "weighting prep step of an imbalanced-data training run. "
        "Label-bounded agg; the totals row is a 1-row broadcast",
    tags=("llm",),
)
def label_class_weights(spark, sf_dir):
    emb = fixture_df(spark, sf_dir, "embeddings")
    c = emb.groupBy("label").agg(F.count("*").alias("n"))
    t = c.agg(F.sum("n").alias("total"), F.count("*").alias("k"))
    return (
        c.crossJoin(F.broadcast(t))  # 1-row scalar, not a data join
        .select(
            "label", F.col("n").cast("bigint").alias("n"),
            F.round(F.col("total") / (F.col("k") * F.col("n")), 6)
            .alias("class_weight"),
        )
        .orderBy("label")
    )


@register(
    "market_basket_lift",
    """
    WITH li AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    ok AS (SELECT l_orderkey FROM li GROUP BY 1 HAVING count(*) <= 100),
    b AS (SELECT li.l_orderkey, li.l_partkey FROM li
          JOIN ok ON li.l_orderkey = ok.l_orderkey),
    n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM b),
    supp AS (SELECT l_partkey, count(*) AS s FROM b GROUP BY 1),
    pairs AS (
      SELECT a.l_partkey AS p1, c.l_partkey AS p2, count(*) AS nb
      FROM b a JOIN b c
        ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 3)
    SELECT p1, p2, CAST(nb AS BIGINT) AS n_both,
           round(nb * 1.0 / n_orders, 6) AS support,
           round(nb * 1.0 / s1.s, 6) AS confidence,
           round((nb * 1.0 * n_orders) / (s1.s * s2.s), 6) AS lift
    FROM pairs
    JOIN supp s1 ON s1.l_partkey = p1
    JOIN supp s2 ON s2.l_partkey = p2
    CROSS JOIN n
    ORDER BY lift DESC, p1, p2 LIMIT 100
    """,
    doc="market-basket association rules (support / confidence / lift) "
        "over co-ordered parts — the classic co-occurrence mining shape. "
        "Scale posture: the pair generator is a self-join ON THE ORDER "
        "KEY, so fan-out per order is basket-size-bounded (quadratic in "
        "lines-per-order, ~4 here), and a basket-size cap of 100 "
        "excludes degenerate mega-baskets the same way the LSH bucket "
        "cap kills duplicate-saturated buckets — identical guard in the "
        "oracle. Support tables are item-bounded; the single-row order "
        "count is hint-broadcast; min-support prunes before the "
        "enrichment joins; top-100 by lift is a TakeOrdered, not a "
        "global sort",
)
def market_basket_lift(spark, sf_dir):
    li = (load(spark, sf_dir, "lineitem")
          .select("l_orderkey", "l_partkey").distinct())
    ok = (li.groupBy("l_orderkey").agg(F.count("*").alias("bs"))
          .filter(F.col("bs") <= 100).select("l_orderkey"))
    b = li.join(ok, "l_orderkey")
    n = b.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    supp = b.groupBy("l_partkey").agg(F.count("*").alias("s"))
    a = b.withColumnsRenamed({"l_partkey": "p1"})
    c = b.withColumnsRenamed({"l_partkey": "p2"})
    pairs = (
        a.join(c, ["l_orderkey"])
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2").agg(F.count("*").alias("nb"))
        .filter(F.col("nb") >= 3)
    )
    s1 = supp.withColumnsRenamed({"l_partkey": "p1", "s": "s1"})
    s2 = supp.withColumnsRenamed({"l_partkey": "p2", "s": "s2"})
    return (
        pairs.join(s1, "p1").join(s2, "p2")
        .crossJoin(F.broadcast(n))  # 1-row scalar, not a data join
        .select(
            "p1", "p2", F.col("nb").cast("bigint").alias("n_both"),
            F.round(F.col("nb") / F.col("n_orders"), 6).alias("support"),
            F.round(F.col("nb") / F.col("s1"), 6).alias("confidence"),
            F.round((F.col("nb") * F.col("n_orders"))
                    / (F.col("s1") * F.col("s2")), 6).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "p1", "p2")
        .limit(100)
    )


@register(
    "join_key_skew_audit",
    """
    WITH k AS (SELECT l_orderkey, count(*) AS c FROM lineitem
               GROUP BY 1),
    st AS (SELECT count(*) AS n_keys, sum(c) AS n_rows, max(c) AS max_c
           FROM k),
    top AS (SELECT sum(c) AS top10 FROM
            (SELECT c FROM k ORDER BY c DESC, l_orderkey LIMIT 10))
    SELECT CAST(n_keys AS BIGINT) AS n_keys,
           CAST(n_rows AS BIGINT) AS n_rows,
           CAST(max_c AS BIGINT) AS max_rows_per_key,
           round(n_rows * 1.0 / n_keys, 6) AS avg_rows_per_key,
           round(max_c * n_keys * 1.0 / n_rows, 6) AS skew_factor,
           round(top10 * 1.0 / n_rows, 6) AS top10_share
    FROM st CROSS JOIN top
    """,
    doc="join-key skew audit — the diagnostic you run BEFORE a big join "
        "to decide between plain shuffle, AQE skew splitting, and "
        "manual salting: per-key cardinality profile (max/avg, "
        "skew factor = max/mean, share held by the 10 hottest keys). "
        "One key-bounded aggregate shuffle; the hottest-key probe is a "
        "TakeOrdered top-10, never a global sort; output is one row",
)
def join_key_skew_audit(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    k = li.groupBy("l_orderkey").agg(F.count("*").alias("c"))
    st = k.agg(F.count("*").alias("n_keys"), F.sum("c").alias("n_rows"),
               F.max("c").alias("max_c"))
    top = (k.orderBy(F.col("c").desc(), "l_orderkey").limit(10)
           .agg(F.sum("c").alias("top10")))
    return (
        st.crossJoin(F.broadcast(top))  # two 1-row scalars
        .select(
            F.col("n_keys").cast("bigint").alias("n_keys"),
            F.col("n_rows").cast("bigint").alias("n_rows"),
            F.col("max_c").cast("bigint").alias("max_rows_per_key"),
            F.round(F.col("n_rows") / F.col("n_keys"), 6)
            .alias("avg_rows_per_key"),
            F.round(F.col("max_c") * F.col("n_keys") / F.col("n_rows"), 6)
            .alias("skew_factor"),
            F.round(F.col("top10") / F.col("n_rows"), 6)
            .alias("top10_share"),
        )
    )


@register(
    "welch_t_test",
    """
    WITH s AS (
      SELECT event_type, count(value) AS n,
             CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sx,
             CAST(sum(CAST(value AS DECIMAL(12,2))
                      * CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sxx
      FROM events
      WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL
      GROUP BY 1),
    a AS (SELECT * FROM s WHERE event_type = 'click'),
    b AS (SELECT * FROM s WHERE event_type = 'purchase'),
    m AS (SELECT a.n AS n1, b.n AS n2,
                 a.sx / a.n AS m1, b.sx / b.n AS m2,
                 (a.sxx - a.sx * a.sx / a.n) / (a.n - 1) / a.n AS v1n,
                 (b.sxx - b.sx * b.sx / b.n) / (b.n - 1) / b.n AS v2n
          FROM a, b)
    SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           round(m1, 6) AS mean1, round(m2, 6) AS mean2,
           round((m1 - m2) / sqrt(v1n + v2n), 6) AS t_stat,
           round((v1n + v2n) * (v1n + v2n)
                 / (v1n * v1n / (n1 - 1) + v2n * v2n / (n2 - 1)), 6)
             AS dof
    FROM m
    """,
    doc="Welch's unequal-variance two-sample t-test (the A/B-test "
        "statistic) between click and purchase values: one grouped "
        "aggregate produces exact decimal(12,2) first and second "
        "moments — order-independent at any parallelism, unlike double "
        "partial sums (the interpolate_hourly_values lesson) — and the "
        "t statistic and Welch-Satterthwaite dof are pure expressions "
        "over the two 1-row stat sets. Scale cost: one map-side-"
        "combinable pass over the filtered facts",
)
def welch_t_test(spark, sf_dir):
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
        & F.col("value").isNotNull()
    )
    d = F.col("value").cast("decimal(12,2)")
    s = ev.groupBy("event_type").agg(
        F.count("value").alias("n"),
        F.sum(d).cast("double").alias("sx"),
        F.sum(d * d).cast("double").alias("sxx"),
    )
    a = (s.filter(F.col("event_type") == "click")
         .select(F.col("n").alias("n1"), F.col("sx").alias("sxa"),
                 F.col("sxx").alias("sxxa")))
    b = (s.filter(F.col("event_type") == "purchase")
         .select(F.col("n").alias("n2"), F.col("sx").alias("sxb"),
                 F.col("sxx").alias("sxxb")))
    m = a.crossJoin(F.broadcast(b)).select(  # two 1-row stat sets
        "n1", "n2",
        (F.col("sxa") / F.col("n1")).alias("m1"),
        (F.col("sxb") / F.col("n2")).alias("m2"),
        ((F.col("sxxa") - F.col("sxa") * F.col("sxa") / F.col("n1"))
         / (F.col("n1") - 1) / F.col("n1")).alias("v1n"),
        ((F.col("sxxb") - F.col("sxb") * F.col("sxb") / F.col("n2"))
         / (F.col("n2") - 1) / F.col("n2")).alias("v2n"),
    )
    return m.select(
        F.col("n1").cast("bigint").alias("n1"),
        F.col("n2").cast("bigint").alias("n2"),
        F.round("m1", 6).alias("mean1"),
        F.round("m2", 6).alias("mean2"),
        F.round((F.col("m1") - F.col("m2"))
                / F.sqrt(F.col("v1n") + F.col("v2n")), 6).alias("t_stat"),
        F.round((F.col("v1n") + F.col("v2n"))
                * (F.col("v1n") + F.col("v2n"))
                / (F.col("v1n") * F.col("v1n") / (F.col("n1") - 1)
                   + F.col("v2n") * F.col("v2n") / (F.col("n2") - 1)),
                6).alias("dof"),
    )


@register(
    "anomaly_days_zscore",
    """
    WITH d AS (SELECT date_trunc('day', ts) AS day, count(*) AS n
               FROM events GROUP BY 1),
    s AS (SELECT count(*) AS k,
                 CAST(sum(CAST(n AS DECIMAL(18,0))) AS DOUBLE) AS sx,
                 CAST(sum(CAST(n AS DECIMAL(18,0))
                          * CAST(n AS DECIMAL(18,0))) AS DOUBLE) AS sxx
          FROM d),
    m AS (SELECT k, sx / k AS mu,
                 sqrt((sxx - sx * sx / k) / (k - 1)) AS sigma
          FROM s)
    SELECT CAST(day AS TIMESTAMP) AS day, CAST(n AS BIGINT) AS n,
           round((n - mu) / sigma, 6) AS z
    FROM d, m
    WHERE abs(round((n - mu) / sigma, 6)) > 1.5
    ORDER BY day
    """,
    doc="z-score control chart over daily event volume (1.5-sigma warning limit, exercised non-vacuously by the fixture whose max |z| is ~2.5; a production 3-sigma alarm is the same plan) — the pipeline-"
        "monitoring alarm for ingestion gaps and crawl storms. Daily "
        "counts are integers, so the mean/stddev come from EXACT decimal "
        "first/second moments (order-independent at any parallelism) and "
        "the z-scores are identical doubles on both engines; the "
        "round-6-before-compare guard keeps a z exactly at the limit from "
        "flipping. One day-bounded aggregate + a 1-row stats broadcast; "
        "output is only the anomalous days",
)
def anomaly_days_zscore(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    d = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count("*").alias("n"))
    dec = F.col("n").cast("decimal(18,0)")
    s = d.agg(F.count("*").alias("k"),
              F.sum(dec).cast("double").alias("sx"),
              F.sum(dec * dec).cast("double").alias("sxx"))
    m = s.select(
        (F.col("sx") / F.col("k")).alias("mu"),
        F.sqrt((F.col("sxx") - F.col("sx") * F.col("sx") / F.col("k"))
               / (F.col("k") - 1)).alias("sigma"),
    )
    z = F.round((F.col("n") - F.col("mu")) / F.col("sigma"), 6)
    return (
        d.crossJoin(F.broadcast(m))  # 1-row stats, not a data join
        .select("day", F.col("n").cast("bigint").alias("n"), z.alias("z"))
        .filter(F.abs(F.col("z")) > 1.5)
        .orderBy("day")
    )


@register(
    "referential_integrity_audit",
    """
    WITH li AS (
      SELECT count(*) AS child_rows,
             count(*) FILTER (WHERE o.o_orderkey IS NULL) AS orphan_rows
      FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey),
    oc AS (
      SELECT count(*) AS child_rows,
             count(*) FILTER (WHERE c.c_custkey IS NULL) AS orphan_rows
      FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey),
    cn AS (
      SELECT count(*) AS child_rows,
             count(*) FILTER (WHERE n.n_nationkey IS NULL) AS orphan_rows
      FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey)
    SELECT rel, CAST(child_rows AS BIGINT) AS child_rows,
           CAST(orphan_rows AS BIGINT) AS orphan_rows,
           round(orphan_rows * 1.0 / child_rows, 6) AS orphan_rate
    FROM (
      SELECT 'lineitem->orders' AS rel, * FROM li
      UNION ALL SELECT 'orders->customer', * FROM oc
      UNION ALL SELECT 'customer->nation', * FROM cn)
    ORDER BY rel
    """,
    doc="referential-integrity audit — the pre-join data-quality gate: "
        "for each FK edge of the star schema, total child rows vs rows "
        "whose parent key is missing (orphans) and the orphan rate. "
        "Each edge is one key-distinct parent projection joined "
        "anti-style into a countable flag; parent key sets are "
        "dim-sized (orders keys << lineitem rows) so AQE broadcasts "
        "them, and the counts are map-side-combinable — no plan reads "
        "a fact table twice. Output is 3 rows",
)
def referential_integrity_audit(spark, sf_dir):
    def edge(rel, child, ckey, parent, pkey):
        c = load(spark, sf_dir, child).select(F.col(ckey).alias("ck"))
        p = (load(spark, sf_dir, parent)
             .select(F.col(pkey).alias("pk")).distinct())
        flagged = c.join(p, F.col("ck") == F.col("pk"), "left")
        return flagged.agg(
            F.lit(rel).alias("rel"),
            F.count("*").alias("child_rows"),
            F.count(F.when(F.col("pk").isNull(), 1)).alias("orphan_rows"),
        )

    out = (
        edge("lineitem->orders", "lineitem", "l_orderkey",
             "orders", "o_orderkey")
        .unionByName(edge("orders->customer", "orders", "o_custkey",
                          "customer", "c_custkey"))
        .unionByName(edge("customer->nation", "customer", "c_nationkey",
                          "nation", "n_nationkey"))
    )
    return out.select(
        "rel",
        F.col("child_rows").cast("bigint").alias("child_rows"),
        F.col("orphan_rows").cast("bigint").alias("orphan_rows"),
        F.round(F.col("orphan_rows") / F.col("child_rows"), 6)
        .alias("orphan_rate"),
    ).orderBy("rel")


@register(
    "two_proportion_ztest",
    """
    WITH s AS (
      SELECT (isodow(ts) >= 6) AS wknd,
             count(*) AS n,
             count(*) FILTER (WHERE event_type = 'purchase') AS k
      FROM events GROUP BY 1),
    a AS (SELECT n AS n1, k AS k1 FROM s WHERE wknd),
    b AS (SELECT n AS n2, k AS k2 FROM s WHERE NOT wknd),
    m AS (SELECT n1, k1, n2, k2,
                 k1 * 1.0 / n1 AS p1, k2 * 1.0 / n2 AS p2,
                 (k1 + k2) * 1.0 / (n1 + n2) AS p
          FROM a, b)
    SELECT CAST(n1 AS BIGINT) AS n_weekend, CAST(k1 AS BIGINT) AS k_weekend,
           CAST(n2 AS BIGINT) AS n_weekday, CAST(k2 AS BIGINT) AS k_weekday,
           round(p1, 6) AS rate_weekend, round(p2, 6) AS rate_weekday,
           round((p1 - p2)
                 / sqrt(p * (1 - p) * (1.0 / n1 + 1.0 / n2)), 6) AS z_stat
    FROM m
    """,
    doc="two-proportion z-test (pooled), weekend vs weekday purchase "
        "rate — the categorical A/B statistic next to welch_t_test's "
        "continuous one. One grouped count pass (integers, exact at any "
        "parallelism); the z statistic is a pure expression over two "
        "1-row stat sets, round-6 on both engines. Scale cost: one "
        "map-side-combinable aggregate over events",
)
def two_proportion_ztest(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    s = ev.groupBy(
        F.dayofweek("ts").isin(1, 7).alias("wknd")).agg(
        F.count("*").alias("n"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("k"),
    )
    a = (s.filter("wknd")
         .select(F.col("n").alias("n1"), F.col("k").alias("k1")))
    b = (s.filter("NOT wknd")
         .select(F.col("n").alias("n2"), F.col("k").alias("k2")))
    m = a.crossJoin(F.broadcast(b)).select(  # two 1-row stat sets
        "n1", "k1", "n2", "k2",
        (F.col("k1") / F.col("n1")).alias("p1"),
        (F.col("k2") / F.col("n2")).alias("p2"),
        ((F.col("k1") + F.col("k2"))
         / (F.col("n1") + F.col("n2"))).alias("p"),
    )
    return m.select(
        F.col("n1").cast("bigint").alias("n_weekend"),
        F.col("k1").cast("bigint").alias("k_weekend"),
        F.col("n2").cast("bigint").alias("n_weekday"),
        F.col("k2").cast("bigint").alias("k_weekday"),
        F.round("p1", 6).alias("rate_weekend"),
        F.round("p2", 6).alias("rate_weekday"),
        F.round((F.col("p1") - F.col("p2"))
                / F.sqrt(F.col("p") * (1 - F.col("p"))
                         * (1.0 / F.col("n1") + 1.0 / F.col("n2"))),
                6).alias("z_stat"),
    )


@register(
    "column_profile_orders",
    """
    SELECT 'o_custkey' AS col_name,
           CAST(count(*) - count(o_custkey) AS BIGINT) AS n_nulls,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_distinct
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', count(*) - count(o_orderpriority),
           count(DISTINCT o_orderpriority) FROM orders
    UNION ALL
    SELECT 'o_orderstatus', count(*) - count(o_orderstatus),
           count(DISTINCT o_orderstatus) FROM orders
    UNION ALL
    SELECT 'o_totalprice', count(*) - count(o_totalprice),
           count(DISTINCT o_totalprice) FROM orders
    ORDER BY col_name
    """,
    doc="per-column profiling (null count + exact distinct count) over "
        "orders — the schema-drift / data-quality snapshot a pipeline "
        "records per ingest batch. Spark side is ONE aggregate pass "
        "with four count-distincts (Catalyst expands multi-distinct "
        "into a single expand+aggregate, still one scan of the table) "
        "unpivoted to rows via stack(); at 100 TB swap the exact "
        "distincts for approx_count_distinct on the same plan shape. "
        "Output is 4 rows",
)
def column_profile_orders(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    wide = o.agg(
        F.count("*").alias("total"),
        F.count("o_custkey").alias("nn_custkey"),
        F.countDistinct("o_custkey").alias("nd_custkey"),
        F.count("o_orderpriority").alias("nn_priority"),
        F.countDistinct("o_orderpriority").alias("nd_priority"),
        F.count("o_orderstatus").alias("nn_status"),
        F.countDistinct("o_orderstatus").alias("nd_status"),
        F.count("o_totalprice").alias("nn_price"),
        F.countDistinct("o_totalprice").alias("nd_price"),
    )
    return wide.select(
        F.expr(
            "stack(4, "
            "'o_custkey', total - nn_custkey, nd_custkey, "
            "'o_orderpriority', total - nn_priority, nd_priority, "
            "'o_orderstatus', total - nn_status, nd_status, "
            "'o_totalprice', total - nn_price, nd_price) "
            "AS (col_name, n_nulls, n_distinct)"
        )
    ).select(
        "col_name",
        F.col("n_nulls").cast("bigint").alias("n_nulls"),
        F.col("n_distinct").cast("bigint").alias("n_distinct"),
    ).orderBy("col_name")


@register(
    "funnel_latency_percentiles",
    """
    WITH v AS (
      SELECT user_id, min(ts) AS t_view FROM events
      WHERE event_type = 'view' GROUP BY user_id),
    p AS (
      SELECT e.user_id,
             CAST(date_diff('second', v.t_view, min(e.ts)) AS BIGINT)
               AS lat_s
      FROM events e JOIN v USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > v.t_view
      GROUP BY e.user_id, v.t_view),
    r AS (
      SELECT lat_s, row_number() OVER (ORDER BY lat_s) AS rn,
             count(*) OVER () AS n
      FROM p)
    SELECT CAST(max(n) AS BIGINT) AS n_users,
           max(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
                    THEN lat_s END) AS p50_s,
           max(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT)
                    THEN lat_s END) AS p90_s,
           max(CASE WHEN rn = CAST(ceil(0.99 * n) AS BIGINT)
                    THEN lat_s END) AS p99_s
    FROM r
    """,
    doc="funnel latency: seconds from a user's first view to their "
        "first subsequent purchase, with DISCRETE p50/p90/p99 (order "
        "statistics at ceil(q*n) — integer seconds, no interpolation, "
        "so zero float-parity surface). Per-user state is two "
        "timestamps. The latency table is USER-cardinality (unbounded "
        "at 100x), so the order statistics ride the distributed "
        "midrank backbone (operators/ranks.py): integer seconds "
        "collapse to a per-value count table, which is range-bucketed "
        "by literal bounds and prefix-summed per bucket — the rank at "
        "ceil(q*n) is the value whose cumulative bracket covers it, "
        "no unpartitioned window anywhere (round-11 verdict task 3; "
        "exact same semantics as the row_number formulation the "
        "oracle keeps)",
)
def funnel_latency_percentiles(spark, sf_dir):
    from miniodb_spark.operators.ranks import doubled_midranks

    ev = load(spark, sf_dir, "events")
    v = (ev.filter(F.col("event_type") == "view")
         .groupBy("user_id").agg(F.min("ts").alias("t_view")))
    p = (ev.filter(F.col("event_type") == "purchase")
         .join(v, "user_id")
         .filter(F.col("ts") > F.col("t_view"))
         .groupBy("user_id", "t_view")
         .agg(F.min("ts").alias("t_purchase"))
         .select(
             (F.unix_timestamp("t_purchase")
              - F.unix_timestamp("t_view")).cast("bigint").alias("lat_s")))
    # per-value count table: integer seconds collapse users to their
    # distinct latency domain — the only pass over the latency table
    pv = p.groupBy("lat_s").agg(F.count("*").cast("bigint").alias("t"))
    mr = doubled_midranks(pv, "lat_s")
    # mr2 = 2*cum_less + t + 1  =>  cumulative bracket (cum_less,
    # cum_less + t] of global sort positions occupied by this value
    mr = mr.select(
        "lat_s", "t",
        ((F.col("mr2") - F.col("t") - 1) / 2).cast("bigint")
        .alias("cum_less"),
    ).withColumn("cum_upto", F.col("cum_less") + F.col("t"))
    tot = pv.agg(F.sum("t").cast("bigint").alias("n"))
    j = mr.crossJoin(F.broadcast(tot))  # 1-row stat, not a data join

    def pick(q):
        rn = F.ceil(F.lit(q) * F.col("n")).cast("bigint")
        return F.max(F.when(
            (F.col("cum_less") < rn) & (rn <= F.col("cum_upto")),
            F.col("lat_s")))

    return j.agg(
        F.max("n").cast("bigint").alias("n_users"),
        pick(0.5).alias("p50_s"),
        pick(0.9).alias("p90_s"),
        pick(0.99).alias("p99_s"),
    )


@register(
    "mutual_information_priority_status",
    """
    WITH j AS (SELECT o_orderpriority AS x, o_orderstatus AS y,
                      count(*) AS c
               FROM orders GROUP BY 1, 2),
    t AS (SELECT sum(c) AS n FROM j),
    mx AS (SELECT x, sum(c) AS cx FROM j GROUP BY 1),
    my AS (SELECT y, sum(c) AS cy FROM j GROUP BY 1)
    SELECT CAST(max(t.n) AS BIGINT) AS n,
           CAST(count(*) AS BIGINT) AS n_cells,
           round(sum((j.c * 1.0 / t.n)
                     * ln((j.c * 1.0 * t.n) / (mx.cx * 1.0 * my.cy))), 6)
             AS mi_nats
    FROM j JOIN mx USING (x) JOIN my USING (y) CROSS JOIN t
    """,
    doc="mutual information I(X;Y) in nats between order priority and "
        "order status — the dependence screen next to chi2_priority_"
        "status (chi2 tests independence; MI measures its strength, "
        "and is the standard feature-selection score). One grouped "
        "count (exact integers) collapses the facts to a 15-cell "
        "contingency table; marginals and the MI sum are expressions "
        "over that tiny table (broadcast joins). Scale cost: one "
        "map-side-combinable aggregate over orders",
)
def mutual_information_priority_status(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    j = (o.groupBy(F.col("o_orderpriority").alias("x"),
                   F.col("o_orderstatus").alias("y"))
         .agg(F.count("*").alias("c")))
    t = j.agg(F.sum("c").alias("n"))
    mx = j.groupBy("x").agg(F.sum("c").alias("cx"))
    my = j.groupBy("y").agg(F.sum("c").alias("cy"))
    cell = (j.join(F.broadcast(mx), "x")
            .join(F.broadcast(my), "y")
            .crossJoin(F.broadcast(t)))  # 1-row total, not a data join
    term = ((F.col("c") / F.col("n"))
            * F.log((F.col("c") * F.col("n"))
                    / (F.col("cx") * F.col("cy"))))
    return cell.agg(
        F.max("n").cast("bigint").alias("n"),
        F.count("*").cast("bigint").alias("n_cells"),
        F.round(F.sum(term), 6).alias("mi_nats"),
    )


@register(
    "seasonal_naive_mase",
    """
    WITH d AS (
      SELECT event_type, date_trunc('day', ts) AS day, count(*) AS y
      FROM events GROUP BY 1, 2),
    l AS (
      SELECT event_type, day, y,
             lag(y, 1) OVER (PARTITION BY event_type ORDER BY day) AS y1,
             lag(y, 7) OVER (PARTITION BY event_type ORDER BY day) AS y7
      FROM d)
    SELECT event_type,
           CAST(count(y7) AS BIGINT) AS n_forecast,
           CAST(sum(abs(y - y7)) AS BIGINT) AS abs_err_seasonal,
           CAST(sum(CASE WHEN y7 IS NOT NULL
                         THEN abs(y - y1) END) AS BIGINT) AS abs_err_naive,
           round(sum(abs(y - y7)) * 1.0
                 / sum(CASE WHEN y7 IS NOT NULL
                            THEN abs(y - y1) END), 6) AS mase
    FROM l
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="MASE (mean absolute scaled error) of a weekly seasonal-naive "
        "forecast of daily event volume per type, scaled by the lag-1 "
        "naive baseline over the same rows — the standard 'is my "
        "forecast better than persistence' screen. Lag windows run "
        "over the DAY-grain table (calendar-bounded: rows = days x "
        "types regardless of event volume), and every error term is an "
        "integer, so the sums are exact and only the final ratio is a "
        "round-6 double. One day-grain aggregate shuffle + one tiny "
        "window",
)
def seasonal_naive_mase(spark, sf_dir):
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")).agg(
        F.count("*").alias("y"))
    w = Window.partitionBy("event_type").orderBy("day")
    l = d.select(
        "event_type", "y",
        F.lag("y", 1).over(w).alias("y1"),
        F.lag("y", 7).over(w).alias("y7"),
    )
    abs_seasonal = F.abs(F.col("y") - F.col("y7"))
    abs_naive = F.when(F.col("y7").isNotNull(),
                       F.abs(F.col("y") - F.col("y1")))
    return (
        l.groupBy("event_type")
        .agg(
            F.count("y7").cast("bigint").alias("n_forecast"),
            F.sum(abs_seasonal).cast("bigint").alias("abs_err_seasonal"),
            F.sum(abs_naive).cast("bigint").alias("abs_err_naive"),
            F.round(F.sum(abs_seasonal) / F.sum(abs_naive), 6)
            .alias("mase"),
        )
        .orderBy("event_type")
    )


@register(
    "theil_sen_monthly_trend",
    """
    WITH m AS (
      SELECT (year(o_orderdate) * 12 + month(o_orderdate)) AS idx,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS rev
      FROM orders GROUP BY 1),
    pairs AS (
      SELECT (b.rev - a.rev) / (b.idx - a.idx) AS slope
      FROM m a JOIN m b ON a.idx < b.idx),
    r AS (
      SELECT slope, row_number() OVER (ORDER BY slope) AS rn,
             count(*) OVER () AS np
      FROM pairs)
    SELECT CAST((SELECT count(*) FROM m) AS BIGINT) AS n_months,
           CAST(max(np) AS BIGINT) AS n_pairs,
           round(max(CASE WHEN rn = CAST(ceil(0.5 * np) AS BIGINT)
                          THEN slope END), 6) AS slope_per_month
    FROM r
    """,
    doc="Theil-Sen robust trend of monthly revenue: median of all "
        "pairwise slopes — the outlier-immune alternative to OLS for "
        "'is revenue growing'. The pairwise set is CALENDAR-bounded "
        "(months^2/2 pairs regardless of row count: 7 years -> ~3k "
        "pairs), built by a self-join on the broadcast month spine; "
        "monthly sums are exact decimal(18,2) before the double "
        "division, and the median is a discrete order statistic at "
        "ceil(n/2) (lower median) — no interpolation. Facts are "
        "touched once, in one month-grain aggregate",
)
def theil_sen_monthly_trend(spark, sf_dir):
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders")
    m = o.groupBy(
        (F.year("o_orderdate") * 12
         + F.month("o_orderdate")).alias("idx")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double").alias("rev"))
    a = m.select(F.col("idx").alias("i1"), F.col("rev").alias("r1"))
    b = m.select(F.col("idx").alias("i2"), F.col("rev").alias("r2"))
    pairs = (a.join(F.broadcast(b), F.col("i1") < F.col("i2"))
             .select(((F.col("r2") - F.col("r1"))
                      / (F.col("i2") - F.col("i1"))).alias("slope")))
    r = pairs.select(
        "slope",
        F.row_number().over(Window.orderBy("slope")).alias("rn"),
        F.count("*").over(
            Window.partitionBy()
            .rowsBetween(Window.unboundedPreceding,
                         Window.unboundedFollowing)).alias("np"),
    )
    n_months = m.agg(F.count("*").alias("n_months"))
    return (
        r.agg(
            F.max("np").cast("bigint").alias("n_pairs"),
            F.round(
                F.max(F.when(
                    F.col("rn")
                    == F.ceil(F.lit(0.5) * F.col("np")).cast("bigint"),
                    F.col("slope"))), 6).alias("slope_per_month"),
        )
        .crossJoin(F.broadcast(n_months))  # 1-row scalar
        .select(F.col("n_months").cast("bigint").alias("n_months"),
                "n_pairs", "slope_per_month")
    )


@register(
    "bootstrap_ci_daily_revenue",
    """
    WITH d AS (
      SELECT strftime(date_trunc('day', o_orderdate), '%Y-%m-%d') AS day,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS rev
      FROM orders GROUP BY 1),
    reps AS (SELECT CAST(range AS INT) AS b FROM range(0, 40)),
    sel AS (
      SELECT r.b, d.rev
      FROM d CROSS JOIN reps r
      WHERE (strpos('0123456789abcdef',
                    substr(md5(d.day || '|' || CAST(r.b AS VARCHAR)),
                           1, 1)) - 1) % 2 = 0),
    means AS (
      SELECT b, sum(rev) / count(*) AS mu FROM sel GROUP BY b),
    r2 AS (
      SELECT mu, row_number() OVER (ORDER BY mu) AS rn,
             count(*) OVER () AS nb
      FROM means)
    SELECT CAST((SELECT count(*) FROM d) AS BIGINT) AS n_days,
           CAST(max(nb) AS BIGINT) AS n_replicates,
           round((SELECT sum(rev) / count(*) FROM d), 6)
             AS mean_daily_rev,
           round(max(CASE WHEN rn = 2 THEN mu END), 6) AS ci_lo,
           round(max(CASE WHEN rn = nb - 1 THEN mu END), 6) AS ci_hi
    FROM r2
    """,
    doc="deterministic half-sample bootstrap CI for mean daily revenue: "
        "40 replicates, replicate b keeping day d iff the first hex "
        "nibble of md5(day|b) is even (a PRNG-free, engine-agnostic "
        "coin flip — the same md5-uniform trick as "
        "weighted_sample_topk), CI = 2nd smallest / 2nd largest "
        "replicate mean (discrete order statistics, no interpolation). "
        "The resample universe is the CALENDAR-bounded day table "
        "(days x 40 rows), never the facts; daily sums are exact "
        "decimal(18,2). Facts are touched once",
)
def bootstrap_ci_daily_revenue(spark, sf_dir):
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders")
    d = o.groupBy(
        F.date_format(F.date_trunc("day", "o_orderdate"),
                      "yyyy-MM-dd").alias("day")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double").alias("rev"))
    reps = spark.range(0, 40).select(F.col("id").cast("int").alias("b"))
    keep = ((F.expr("instr('0123456789abcdef', "
                    "substring(md5(concat(day, '|', CAST(b AS STRING))),"
                    " 1, 1))") - 1) % 2 == 0)
    sel = d.crossJoin(F.broadcast(reps)).filter(keep)  # days x 40 spine
    means = sel.groupBy("b").agg(
        (F.sum("rev") / F.count("*")).alias("mu"))
    r2 = means.select(
        "mu",
        F.row_number().over(Window.orderBy("mu")).alias("rn"),
        F.count("*").over(
            Window.partitionBy()
            .rowsBetween(Window.unboundedPreceding,
                         Window.unboundedFollowing)).alias("nb"),
    )
    overall = d.agg(
        F.count("*").cast("bigint").alias("n_days"),
        F.round(F.sum("rev") / F.count("*"), 6).alias("mean_daily_rev"))
    return (
        r2.agg(
            F.max("nb").cast("bigint").alias("n_replicates"),
            F.round(F.max(F.when(F.col("rn") == 2, F.col("mu"))), 6)
            .alias("ci_lo"),
            F.round(F.max(F.when(F.col("rn") == F.col("nb") - 1,
                                 F.col("mu"))), 6).alias("ci_hi"),
        )
        .crossJoin(F.broadcast(overall))  # 1-row scalar
        .select("n_days", "n_replicates", "mean_daily_rev",
                "ci_lo", "ci_hi")
    )


@register(
    "recursive_month_spine",
    """
    WITH RECURSIVE bounds AS (
      SELECT date_trunc('month', min(o_orderdate)) AS lo,
             date_trunc('month', max(o_orderdate)) AS hi
      FROM orders),
    m(mon) AS (
      SELECT lo FROM bounds
      UNION ALL
      SELECT mon + INTERVAL 1 MONTH FROM m, bounds WHERE mon < hi),
    rev AS (
      SELECT date_trunc('month', o_orderdate) AS mon,
             CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                  AS DECIMAL(18,2)) AS revenue
      FROM orders GROUP BY 1)
    SELECT CAST(m.mon AS TIMESTAMP) AS month_start,
           CAST(coalesce(r.n_orders, 0) AS BIGINT) AS n_orders,
           CAST(CAST(coalesce(r.revenue, 0) AS DECIMAL(18,2)) AS DOUBLE)
             AS revenue
    FROM m LEFT JOIN rev r ON CAST(m.mon AS TIMESTAMP) = CAST(r.mon AS TIMESTAMP)
    ORDER BY month_start
    """,
    doc="recursive CTE month spine (Spark 4's WITH RECURSIVE, run through "
        "spark.sql verbatim) left-joined to exact-decimal monthly revenue "
        "so empty months surface as zero rows — the SQL-surface twin of "
        "gap_fill_daily_counts' generate_series spine. Recursion depth = "
        "months in the order window (~80, far under "
        "spark.sql.cteRecursionLevelLimit's 100; a longer retention window "
        "should raise the limit or switch to the sequence() spine — noted, "
        "not hidden). The recursive relation is spine-sized; facts are "
        "touched once by the month aggregate",
    tags=("sql-surface",),
)
def recursive_month_spine(spark, sf_dir):
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_rcte_v")
    return spark.sql("""
      WITH RECURSIVE bounds AS (
        SELECT date_trunc('month', min(o_orderdate)) AS lo,
               date_trunc('month', max(o_orderdate)) AS hi
        FROM orders_rcte_v),
      m(mon) AS (
        SELECT lo FROM bounds
        UNION ALL
        SELECT mon + INTERVAL '1' MONTH FROM m, bounds WHERE mon < hi),
      rev AS (
        SELECT date_trunc('month', o_orderdate) AS mon,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                    AS DECIMAL(18,2)) AS revenue
        FROM orders_rcte_v GROUP BY 1)
      SELECT CAST(m.mon AS TIMESTAMP) AS month_start,
             CAST(coalesce(r.n_orders, 0) AS BIGINT) AS n_orders,
             CAST(CAST(coalesce(r.revenue, 0) AS DECIMAL(18,2)) AS DOUBLE)
               AS revenue
      FROM m LEFT JOIN rev r ON m.mon = r.mon
      ORDER BY month_start
    """)




@register(
    "interarrival_gap_stats",
    """
    WITH g AS (
      SELECT event_type,
             epoch_us(ts) - lag(epoch_us(ts)) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_gaps,
           round(CAST(sum(gap_us) AS DOUBLE) / count(*) / 1e6, 3)
             AS mean_gap_s,
           round(percentile_cont(0.5) WITHIN GROUP (ORDER BY gap_us)
                 / 1e6, 3) AS p50_gap_s,
           round(percentile_cont(0.9) WITHIN GROUP (ORDER BY gap_us)
                 / 1e6, 3) AS p90_gap_s
    FROM g WHERE gap_us IS NOT NULL
    GROUP BY event_type ORDER BY event_type
    """,
    doc="Per-user inter-arrival time distribution attributed to the "
        "LATER event's type — the burstiness profile behind rate "
        "limiting and bot heuristics. Gaps are exact integer "
        "microseconds from a lag window PARTITIONed BY user_id with a "
        "(ts, event_id) total order (scale-safe: partitions are users, "
        "never global); the mean divides an exact BIGINT sum, and the "
        "percentiles are percentile_cont over integers — identical "
        "interpolation semantics on both engines (the "
        "percentile_cont_within_group precedent). Per-type exact "
        "percentiles imply a per-group sort; at 100 TB swap in "
        "approx_percentile / the equi-depth histogram entry, as those "
        "registry entries document.",
    tags=("analytics",),
)
def interarrival_gap_stats(spark, sf_dir):
    load(spark, sf_dir, "events").createOrReplaceTempView("events_iag_v")
    return spark.sql("""
      WITH g AS (
        SELECT event_type,
               unix_micros(ts) - lag(unix_micros(ts)) OVER
                 (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        FROM events_iag_v)
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_gaps,
             round(CAST(sum(gap_us) AS DOUBLE) / count(*) / 1e6, 3)
               AS mean_gap_s,
             round(percentile_cont(0.5) WITHIN GROUP (ORDER BY gap_us)
                   / 1e6, 3) AS p50_gap_s,
             round(percentile_cont(0.9) WITHIN GROUP (ORDER BY gap_us)
                   / 1e6, 3) AS p90_gap_s
      FROM g WHERE gap_us IS NOT NULL
      GROUP BY event_type ORDER BY event_type
    """)


@register(
    "precision_recall_at_k",
    """
    WITH pop AS (
      SELECT event_type,
             row_number() OVER (ORDER BY count(*) DESC, event_type)
               AS rnk
      FROM events WHERE day(ts) <= 15 GROUP BY event_type),
    topk AS (SELECT event_type FROM pop WHERE rnk <= 2),
    rel AS (
      SELECT DISTINCT user_id, event_type
      FROM events WHERE day(ts) > 15),
    per_u AS (
      SELECT r.user_id,
             count(*) AS n_rel,
             count(t.event_type) AS n_hit
      FROM rel r LEFT JOIN topk t ON r.event_type = t.event_type
      GROUP BY r.user_id)
    SELECT CAST(count(*) AS BIGINT) AS n_users,
           round(avg(n_hit / 2.0), 6) AS precision_at_2,
           round(avg(CAST(n_hit AS DOUBLE) / n_rel), 6) AS recall_at_2
    FROM per_u
    """,
    doc="Precision@2 / Recall@2 of a popularity recommender: train on "
        "the month's first half (global top-2 event types, count-desc "
        "with a type tie-break so the cut is total-ordered), test on "
        "the second half (per-user relevant set = distinct types "
        "actually performed). The retrieval-eval counterpart to "
        "roc_auc_rank_eval for set-valued recommendations. Shape: "
        "popularity window runs on the 5-row type aggregate, the "
        "2-row recommendation set broadcasts into the user x type "
        "DISTINCT table (one fact shuffle), per-user averages are "
        "exact integer ratios.",
    tags=("analytics", "eval"),
)
def precision_recall_at_k(spark, sf_dir):
    load(spark, sf_dir, "events").createOrReplaceTempView("events_prk_v")
    return spark.sql("""
      WITH pop AS (
        SELECT event_type,
               row_number() OVER (ORDER BY count(*) DESC, event_type)
                 AS rnk
        FROM events_prk_v WHERE day(ts) <= 15 GROUP BY event_type),
      topk AS (SELECT event_type FROM pop WHERE rnk <= 2),
      rel AS (
        SELECT DISTINCT user_id, event_type
        FROM events_prk_v WHERE day(ts) > 15),
      per_u AS (
        SELECT r.user_id,
               count(*) AS n_rel,
               count(t.event_type) AS n_hit
        FROM rel r LEFT JOIN topk t ON r.event_type = t.event_type
        GROUP BY r.user_id)
      SELECT CAST(count(*) AS BIGINT) AS n_users,
             round(avg(CAST(n_hit AS DOUBLE) / 2.0), 6) AS precision_at_2,
             round(avg(CAST(n_hit AS DOUBLE) / n_rel), 6) AS recall_at_2
      FROM per_u
    """)


@register(
    "mrr_popularity_rank",
    """
    WITH pop AS (
      SELECT event_type,
             row_number() OVER (ORDER BY count(*) DESC, event_type)
               AS rnk
      FROM events WHERE day(ts) <= 15 GROUP BY event_type),
    tgt AS (
      SELECT user_id, event_type FROM (
        SELECT user_id, event_type,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY count(*) DESC, event_type)
                 AS rn
        FROM events WHERE day(ts) > 15
        GROUP BY user_id, event_type) u
      WHERE rn = 1)
    SELECT CAST(count(*) AS BIGINT) AS n_users,
           round(avg(1.0 / p.rnk), 6) AS mrr
    FROM tgt t JOIN pop p ON t.event_type = p.event_type
    """,
    doc="Mean reciprocal rank of each user's test-half favorite event "
        "type within the train-half global popularity ranking — the "
        "single-relevant-item eval (MRR) completing the retrieval "
        "metric trio (AUC: threshold-free ranking, P/R@k: set "
        "overlap, MRR: first-hit position). Both rankings are total "
        "orders (count DESC, type ASC), so ranks are engine-"
        "independent. The target window PARTITIONs BY user over the "
        "user x type count table (scale-safe); the 5-row popularity "
        "table broadcasts into the final join.",
    tags=("analytics", "eval"),
)
def mrr_popularity_rank(spark, sf_dir):
    load(spark, sf_dir, "events").createOrReplaceTempView("events_mrr_v")
    return spark.sql("""
      WITH pop AS (
        SELECT event_type,
               row_number() OVER (ORDER BY count(*) DESC, event_type)
                 AS rnk
        FROM events_mrr_v WHERE day(ts) <= 15 GROUP BY event_type),
      tgt AS (
        SELECT user_id, event_type FROM (
          SELECT user_id, event_type,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY count(*) DESC, event_type)
                   AS rn
          FROM events_mrr_v WHERE day(ts) > 15
          GROUP BY user_id, event_type) u
        WHERE rn = 1)
      SELECT CAST(count(*) AS BIGINT) AS n_users,
             round(avg(CAST(1.0 AS DOUBLE) / p.rnk), 6) AS mrr
      FROM tgt t JOIN pop p ON t.event_type = p.event_type
    """)


@register(
    "ndcg_at_10_docs",
    """
    WITH d AS (
      SELECT doc_id, n_chars,
             (length(text) - length(replace(text, 'spark', ''))) // 5
               AS rel
      FROM documents),
    top_s AS (
      SELECT rel, n_chars, doc_id FROM d
      ORDER BY n_chars DESC, doc_id LIMIT 10),
    ranked_s AS (
      SELECT rel,
             row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rnk
      FROM top_s),
    top_r AS (
      SELECT rel, doc_id FROM d ORDER BY rel DESC, doc_id LIMIT 10),
    ranked_r AS (
      SELECT rel,
             row_number() OVER (ORDER BY rel DESC, doc_id) AS rnk
      FROM top_r),
    g AS (SELECT sum((pow(2, rel) - 1) / log2(rnk + 1)) AS dcg
          FROM ranked_s),
    i AS (SELECT sum((pow(2, rel) - 1) / log2(rnk + 1)) AS idcg
          FROM ranked_r)
    SELECT round(dcg, 6) AS dcg_at_10,
           round(idcg, 6) AS idcg_at_10,
           round(dcg / idcg, 6) AS ndcg_at_10
    FROM g CROSS JOIN i
    """,
    doc="NDCG@10 of a document-length prior ranking against graded "
        "term-count relevance (occurrences of 'spark', exact integer "
        "via length-difference arithmetic) — the graded-relevance "
        "eval that P/R@k flattens away, with the standard "
        "(2^rel - 1) / log2(rank + 1) gain/discount. Both the scored "
        "and ideal rankings are total orders (doc_id tie-break), so "
        "top-10 cuts agree across engines. Scale shape: each ranking "
        "is ORDER BY + LIMIT 10 — Spark compiles TakeOrderedAndProject "
        "(per-partition top-10, never a global sort) — and the rank "
        "windows run on the 10-row survivors only.",
    tags=("analytics", "eval"),
)
def ndcg_at_10_docs(spark, sf_dir):
    load(spark, sf_dir, "documents").createOrReplaceTempView("docs_ndcg_v")
    return spark.sql("""
      WITH d AS (
        SELECT doc_id, n_chars,
               (length(text) - length(replace(text, 'spark', ''))) div 5
                 AS rel
        FROM docs_ndcg_v),
      top_s AS (
        SELECT rel, n_chars, doc_id FROM d
        ORDER BY n_chars DESC, doc_id LIMIT 10),
      ranked_s AS (
        SELECT rel,
               row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rnk
        FROM top_s),
      top_r AS (
        SELECT rel, doc_id FROM d ORDER BY rel DESC, doc_id LIMIT 10),
      ranked_r AS (
        SELECT rel,
               row_number() OVER (ORDER BY rel DESC, doc_id) AS rnk
        FROM top_r),
      g AS (SELECT sum((pow(2, rel) - 1) / log2(rnk + 1)) AS dcg
            FROM ranked_s),
      i AS (SELECT sum((pow(2, rel) - 1) / log2(rnk + 1)) AS idcg
            FROM ranked_r)
      SELECT round(dcg, 6) AS dcg_at_10,
             round(idcg, 6) AS idcg_at_10,
             round(dcg / idcg, 6) AS ndcg_at_10
      FROM g CROSS JOIN i
    """)


@register(
    "hhi_revenue_concentration",
    """
    WITH cr AS (
      SELECT c.c_nationkey AS nk, o.o_custkey AS ck,
             sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2),
    sh AS (
      SELECT nk,
             CAST(rev AS DOUBLE)
               / CAST(sum(rev) OVER (PARTITION BY nk) AS DOUBLE)
               AS share
      FROM cr)
    SELECT n.n_name AS nation,
           CAST(count(*) AS BIGINT) AS n_customers,
           round(sum(share * share) * 10000, 4) AS hhi
    FROM sh JOIN nation n ON sh.nk = n.n_nationkey
    GROUP BY 1 ORDER BY 1
    """,
    doc="Herfindahl-Hirschman index of revenue concentration across "
        "customers per nation (0..10000, antitrust convention) — the "
        "square-sum companion to gini_totalprice_by_priority: HHI "
        "weights the head, Gini the whole Lorenz curve. Revenue sums "
        "are exact decimals; the share window PARTITIONs BY nation "
        "over the customer-level aggregate (never raw orders), cast "
        "to double only at the final ratio. One fact shuffle into "
        "(nation, customer), nation dim broadcasts.",
    tags=("analytics",),
)
def hhi_revenue_concentration(spark, sf_dir):
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_hhi_v")
    load(spark, sf_dir, "customer").createOrReplaceTempView("cust_hhi_v")
    load(spark, sf_dir, "nation").createOrReplaceTempView("nation_hhi_v")
    return spark.sql("""
      WITH cr AS (
        SELECT c.c_nationkey AS nk, o.o_custkey AS ck,
               sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS rev
        FROM orders_hhi_v o JOIN cust_hhi_v c
          ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2),
      sh AS (
        SELECT nk,
               CAST(rev AS DOUBLE)
                 / CAST(sum(rev) OVER (PARTITION BY nk) AS DOUBLE)
                 AS share
        FROM cr)
      SELECT n.n_name AS nation,
             CAST(count(*) AS BIGINT) AS n_customers,
             round(sum(share * share) * 10000, 4) AS hhi
      FROM sh JOIN nation_hhi_v n ON sh.nk = n.n_nationkey
      GROUP BY 1 ORDER BY 1
    """)


@register(
    "markov_transition_entropy",
    """
    WITH nx AS (
      SELECT event_type AS cur,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM events),
    c AS (SELECT cur, nxt, count(*) AS n
          FROM nx WHERE nxt IS NOT NULL GROUP BY 1, 2),
    t AS (SELECT cur, sum(n) AS tn FROM c GROUP BY 1)
    SELECT c.cur AS event_type,
           CAST(min(t.tn) AS BIGINT) AS n_transitions,
           round(-sum((CAST(n AS DOUBLE) / tn)
                      * log2(CAST(n AS DOUBLE) / tn)), 6)
             AS next_entropy_bits
    FROM c JOIN t ON c.cur = t.cur
    GROUP BY 1 ORDER BY 1
    """,
    doc="Per-state entropy of the next-event distribution over the "
        "user-ordered Markov chain — the predictability score on top "
        "of event_transition_matrix (max log2(5)~2.32 bits = "
        "memoryless; low = the current event pins the next). The "
        "lead window PARTITIONs BY user_id with a (ts, event_id) "
        "total order (scale-safe, interarrival_gap_stats shape); "
        "transition counts collapse to <=25 rows, so every join and "
        "the entropy sum run on state-cardinality tables.",
    tags=("analytics",),
)
def markov_transition_entropy(spark, sf_dir):
    load(spark, sf_dir, "events").createOrReplaceTempView("events_mte_v")
    return spark.sql("""
      WITH nx AS (
        SELECT event_type AS cur,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS nxt
        FROM events_mte_v),
      c AS (SELECT cur, nxt, count(*) AS n
            FROM nx WHERE nxt IS NOT NULL GROUP BY 1, 2),
      t AS (SELECT cur, sum(n) AS tn FROM c GROUP BY 1)
      SELECT c.cur AS event_type,
             CAST(min(t.tn) AS BIGINT) AS n_transitions,
             round(-sum((CAST(n AS DOUBLE) / tn)
                        * log2(CAST(n AS DOUBLE) / tn)), 6)
               AS next_entropy_bits
      FROM c JOIN t ON c.cur = t.cur
      GROUP BY 1 ORDER BY 1
    """)


@register(
    "diff_in_diff_revenue",
    """
    WITH g AS (
      SELECT CASE WHEN c.c_mktsegment = 'AUTOMOBILE'
                  THEN 1 ELSE 0 END AS treated,
             CASE WHEN month(o.o_orderdate) >= 7 THEN 1 ELSE 0 END
               AS post,
             CAST(o.o_totalprice AS DECIMAL(18,2)) AS rev
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
    m AS (
      SELECT treated, post,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(rev) AS DOUBLE) / count(*) AS mean_rev
      FROM g GROUP BY 1, 2),
    w AS (
      SELECT
        sum(CASE WHEN treated = 1 AND post = 1 THEN mean_rev END) AS t1,
        sum(CASE WHEN treated = 1 AND post = 0 THEN mean_rev END) AS t0,
        sum(CASE WHEN treated = 0 AND post = 1 THEN mean_rev END) AS c1,
        sum(CASE WHEN treated = 0 AND post = 0 THEN mean_rev END) AS c0,
        CAST(sum(n) AS BIGINT) AS n_orders
      FROM m)
    SELECT n_orders,
           round(t1 - t0, 6) AS treated_delta,
           round(c1 - c0, 6) AS control_delta,
           round((t1 - t0) - (c1 - c0), 6) AS did_estimate
    FROM w
    """,
    doc="Difference-in-differences estimator: AUTOMOBILE-segment "
        "customers (treated) vs the rest (control), pre/post a July 1 "
        "cutover, on mean order value — the quasi-experimental shape "
        "every experimentation platform reaches for when a holdout is "
        "impossible. Cell means come from ONE grouped aggregate over "
        "the orders x customer join (customer broadcasts under AQE); "
        "the 4-cell DiD algebra pivots through conditional sums on a "
        "4-row table. Exact decimal revenue sums divided once.",
    tags=("analytics", "eval"),
)
def diff_in_diff_revenue(spark, sf_dir):
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_did_v")
    load(spark, sf_dir, "customer").createOrReplaceTempView("cust_did_v")
    return spark.sql("""
      WITH g AS (
        SELECT CASE WHEN c.c_mktsegment = 'AUTOMOBILE'
                    THEN 1 ELSE 0 END AS treated,
               CASE WHEN month(o.o_orderdate) >= 7 THEN 1 ELSE 0 END
                 AS post,
               CAST(o.o_totalprice AS DECIMAL(18,2)) AS rev
        FROM orders_did_v o JOIN cust_did_v c
          ON o.o_custkey = c.c_custkey),
      m AS (
        SELECT treated, post,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(rev) AS DOUBLE) / count(*) AS mean_rev
        FROM g GROUP BY 1, 2),
      w AS (
        SELECT
          sum(CASE WHEN treated = 1 AND post = 1 THEN mean_rev END) AS t1,
          sum(CASE WHEN treated = 1 AND post = 0 THEN mean_rev END) AS t0,
          sum(CASE WHEN treated = 0 AND post = 1 THEN mean_rev END) AS c1,
          sum(CASE WHEN treated = 0 AND post = 0 THEN mean_rev END) AS c0,
          CAST(sum(n) AS BIGINT) AS n_orders
        FROM m)
      SELECT n_orders,
             round(t1 - t0, 6) AS treated_delta,
             round(c1 - c0, 6) AS control_delta,
             round((t1 - t0) - (c1 - c0), 6) AS did_estimate
      FROM w
    """)


@register(
    "price_elasticity_slope",
    """
    WITH u AS (
      SELECT l_returnflag,
             ln(l_quantity) AS lq,
             ln(l_extendedprice / l_quantity) AS lp
      FROM lineitem WHERE l_quantity > 0 AND l_extendedprice > 0)
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           round(regr_slope(lq, lp), 6) AS elasticity,
           round(regr_intercept(lq, lp), 6) AS intercept,
           round(regr_r2(lq, lp), 6) AS r2
    FROM u GROUP BY 1 ORDER BY 1
    """,
    doc="Log-log price elasticity of demand per return flag: the OLS "
        "slope of ln(quantity) on ln(unit price) — the classic "
        "econometric read of how demand responds to price, with "
        "regr_r2 reporting how much it explains. regr_slope / "
        "regr_intercept / regr_r2 share their Pearson-moment "
        "definitions across engines over identical doubles (the "
        "zipf_slope precedent); one grouped aggregate, no joins, "
        "map-side-combinable moments.",
    tags=("analytics",),
)
def price_elasticity_slope(spark, sf_dir):
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("li_pe_v")
    return spark.sql("""
      WITH u AS (
        SELECT l_returnflag,
               ln(l_quantity) AS lq,
               ln(l_extendedprice / l_quantity) AS lp
        FROM li_pe_v WHERE l_quantity > 0 AND l_extendedprice > 0)
      SELECT l_returnflag,
             CAST(count(*) AS BIGINT) AS n,
             round(regr_slope(lq, lp), 6) AS elasticity,
             round(regr_intercept(lq, lp), 6) AS intercept,
             round(regr_r2(lq, lp), 6) AS r2
      FROM u GROUP BY 1 ORDER BY 1
    """)


@register(
    "new_vs_returning_users",
    """
    WITH f AS (
      SELECT user_id, CAST(min(ts) AS DATE) AS first_day
      FROM events GROUP BY 1),
    d AS (
      SELECT CAST(e.ts AS DATE) AS day, e.user_id,
             CASE WHEN CAST(e.ts AS DATE) = f.first_day
                  THEN 1 ELSE 0 END AS is_new
      FROM events e JOIN f ON e.user_id = f.user_id)
    SELECT CAST(day AS VARCHAR) AS day,
           CAST(count(DISTINCT CASE WHEN is_new = 1
                                    THEN user_id END) AS BIGINT)
             AS new_users,
           CAST(count(DISTINCT CASE WHEN is_new = 0
                                    THEN user_id END) AS BIGINT)
             AS returning_users
    FROM d GROUP BY day ORDER BY day
    """,
    doc="Daily new-vs-returning active users — the growth-accounting "
        "split on every product dashboard (a flat DAU can hide "
        "collapsing acquisition masked by retention, and vice versa). "
        "First-seen day is one user-cardinality aggregate joined back "
        "on user_id (user-bounded side broadcasts/buckets at scale); "
        "the daily split is one conditional count-distinct pass. "
        "Calendar-bounded 30-row output; dates leave as strings for "
        "the driver canonicalizer.",
    tags=("analytics",),
)
def new_vs_returning_users(spark, sf_dir):
    load(spark, sf_dir, "events").createOrReplaceTempView("events_nvr_v")
    return spark.sql("""
      WITH f AS (
        SELECT user_id, CAST(min(ts) AS DATE) AS first_day
        FROM events_nvr_v GROUP BY 1),
      d AS (
        SELECT CAST(e.ts AS DATE) AS day, e.user_id,
               CASE WHEN CAST(e.ts AS DATE) = f.first_day
                    THEN 1 ELSE 0 END AS is_new
        FROM events_nvr_v e JOIN f ON e.user_id = f.user_id)
      SELECT CAST(day AS STRING) AS day,
             CAST(count(DISTINCT CASE WHEN is_new = 1
                                      THEN user_id END) AS BIGINT)
               AS new_users,
             CAST(count(DISTINCT CASE WHEN is_new = 0
                                      THEN user_id END) AS BIGINT)
               AS returning_users
      FROM d GROUP BY day ORDER BY day
    """)


@register(
    "nelson_aalen_hazard",
    """
    WITH f AS (
      SELECT user_id,
             CAST(date_diff('day', CAST(min(ts) AS DATE),
                            CAST(max(ts) AS DATE)) AS BIGINT) AS t
      FROM events GROUP BY 1),
    d AS (SELECT t, CAST(count(*) AS BIGINT) AS d FROM f GROUP BY 1),
    r AS (
      SELECT t, d,
             sum(d) OVER (ORDER BY t DESC) AS at_risk
      FROM d)
    SELECT t AS day,
           d AS events_at_t,
           CAST(at_risk AS BIGINT) AS at_risk,
           round(sum(CAST(d AS DOUBLE) / at_risk)
                   OVER (ORDER BY t), 6) AS cum_hazard
    FROM r ORDER BY t
    """,
    doc="Nelson-Aalen cumulative-hazard estimator over user activity "
        "spans (t = days between first and last event; every user "
        "'dies' at t in this window, so at-risk is the reverse "
        "cumulative count) — the hazard-space companion to "
        "kaplan_meier_user_retention (H(t) = -ln S(t) asymptotically; "
        "NA is the one that stays additive and stable when risk sets "
        "are small). Facts collapse to user spans (one aggregate), "
        "then to the <=31-row distinct-t table; both windows run on "
        "that bounded table with exact integer d/at-risk.",
    tags=("analytics", "statistics"),
)
def nelson_aalen_hazard(spark, sf_dir):
    load(spark, sf_dir, "events").createOrReplaceTempView("events_na_v")
    return spark.sql("""
      WITH f AS (
        SELECT user_id,
               CAST(datediff(CAST(max(ts) AS DATE),
                             CAST(min(ts) AS DATE)) AS BIGINT) AS t
        FROM events_na_v GROUP BY 1),
      d AS (SELECT t, CAST(count(*) AS BIGINT) AS d FROM f GROUP BY 1),
      r AS (
        SELECT t, d,
               sum(d) OVER (ORDER BY t DESC) AS at_risk
        FROM d)
      SELECT t AS day,
             d AS events_at_t,
             CAST(at_risk AS BIGINT) AS at_risk,
             round(sum(CAST(d AS DOUBLE) / at_risk)
                     OVER (ORDER BY t), 6) AS cum_hazard
      FROM r ORDER BY t
    """)


@register(
    "peak_concurrent_sessions",
    """
    WITH e AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch_us(ts)
                       - lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                                 ORDER BY ts, event_id)
                       > 1800 * 1000000
                       OR lag(ts) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_sess
      FROM events),
    s AS (
      SELECT user_id,
             min(ts) AS s_start, max(ts) AS s_end
      FROM (SELECT user_id, ts,
                   sum(new_sess) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING) AS sid
            FROM e) x
      GROUP BY user_id, sid),
    pts AS (
      SELECT CAST(s_start AS DATE) AS day, s_start AS t, 1 AS delta
      FROM s
      UNION ALL
      SELECT CAST(s_start AS DATE) AS day, s_end AS t, -1 AS delta
      FROM s),
    sweep AS (
      SELECT day,
             sum(delta) OVER (PARTITION BY day
                              ORDER BY t, delta DESC
                              ROWS UNBOUNDED PRECEDING) AS live
      FROM pts)
    SELECT CAST(day AS VARCHAR) AS day,
           CAST(max(live) AS BIGINT) AS peak_concurrent
    FROM sweep GROUP BY day ORDER BY day
    """,
    doc="Peak concurrent 30-minute sessions per day — the capacity "
        "number behind connection-pool and autoscaling limits. "
        "Sessions come from the sessionize_30min gap rule "
        "(user-partitioned lag + running session id); each session "
        "emits a +1/-1 boundary pair ATTRIBUTED WHOLLY TO ITS START "
        "DAY, so every day's sweep is self-contained and the running "
        "sum can PARTITION BY day — the deliberate approximation that "
        "keeps the sweep distributed (a global ORDER BY t would be "
        "the single-task killer; the rare midnight-spanning session "
        "counts toward its start day's peak). Starts sort before ends "
        "at identical timestamps (delta DESC), so touching sessions "
        "count as overlapping — the conservative capacity read.",
    tags=("analytics",),
)
def peak_concurrent_sessions(spark, sf_dir):
    load(spark, sf_dir, "events").createOrReplaceTempView("events_pcs_v")
    return spark.sql("""
      WITH e AS (
        SELECT user_id, ts, event_id,
               CASE WHEN unix_micros(ts)
                         - lag(unix_micros(ts)) OVER
                             (PARTITION BY user_id ORDER BY ts, event_id)
                         > 1800 * 1000000
                         OR lag(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_sess
        FROM events_pcs_v),
      s AS (
        SELECT user_id,
               min(ts) AS s_start, max(ts) AS s_end
        FROM (SELECT user_id, ts,
                     sum(new_sess) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING) AS sid
              FROM e) x
        GROUP BY user_id, sid),
      pts AS (
        SELECT CAST(s_start AS DATE) AS day, s_start AS t, 1 AS delta
        FROM s
        UNION ALL
        SELECT CAST(s_start AS DATE) AS day, s_end AS t, -1 AS delta
        FROM s),
      sweep AS (
        SELECT day,
               sum(delta) OVER (PARTITION BY day
                                ORDER BY t, delta DESC
                                ROWS UNBOUNDED PRECEDING) AS live
        FROM pts)
      SELECT CAST(day AS STRING) AS day,
             CAST(max(live) AS BIGINT) AS peak_concurrent
      FROM sweep GROUP BY day ORDER BY day
    """)


@register(
    "rfm_segments",
    """
    WITH c AS (
      SELECT o_custkey,
             CAST(date_diff('day', CAST(max(o_orderdate) AS DATE),
                            DATE '2001-08-01') AS BIGINT) AS r,
             CAST(count(*) AS BIGINT) AS f,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS m
      FROM orders GROUP BY 1),
    th AS (
      SELECT percentile_cont(0.5) WITHIN GROUP (ORDER BY r) AS rt,
             percentile_cont(0.5) WITHIN GROUP (ORDER BY f) AS ft,
             percentile_cont(0.5) WITHIN GROUP (ORDER BY m) AS mt
      FROM c),
    seg AS (
      SELECT concat(CASE WHEN r <= rt THEN 'R' ELSE 'r' END,
                    CASE WHEN f > ft THEN 'F' ELSE 'f' END,
                    CASE WHEN m > mt THEN 'M' ELSE 'm' END) AS segment,
             m
      FROM c CROSS JOIN th)
    SELECT segment,
           CAST(count(*) AS BIGINT) AS n_customers,
           round(sum(m), 2) AS total_m,
           round(avg(m), 6) AS avg_m
    FROM seg GROUP BY 1 ORDER BY 1
    """,
    doc="RFM segmentation: recency (days before the corpus horizon "
        "2001-08-01) / frequency / monetary per customer, split at "
        "the exact medians into 8 segments ('RFM' = recent AND "
        "frequent AND high-value ... 'rfm' = lapsed low-value) — the "
        "lifecycle-marketing workhorse. Thresholds are ONE 3-way "
        "percentile row broadcast back over the customer aggregate "
        "(no global ntile window — the scalar-broadcast shape "
        "top_decile_revenue_share pinned); recency uses a FIXED "
        "horizon date so the segment labels are reproducible across "
        "runs and engines. Exact decimal monetary sums, cast once.",
    tags=("analytics",),
)
def rfm_segments(spark, sf_dir):
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_rfm_v")
    return spark.sql("""
      WITH c AS (
        SELECT o_custkey,
               CAST(datediff(DATE '2001-08-01',
                             CAST(max(o_orderdate) AS DATE)) AS BIGINT)
                 AS r,
               CAST(count(*) AS BIGINT) AS f,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS m
        FROM orders_rfm_v GROUP BY 1),
      th AS (
        SELECT percentile_cont(0.5) WITHIN GROUP (ORDER BY r) AS rt,
               percentile_cont(0.5) WITHIN GROUP (ORDER BY f) AS ft,
               percentile_cont(0.5) WITHIN GROUP (ORDER BY m) AS mt
        FROM c),
      seg AS (
        SELECT concat(CASE WHEN r <= rt THEN 'R' ELSE 'r' END,
                      CASE WHEN f > ft THEN 'F' ELSE 'f' END,
                      CASE WHEN m > mt THEN 'M' ELSE 'm' END) AS segment,
               m
        FROM c CROSS JOIN th)
      SELECT segment,
             CAST(count(*) AS BIGINT) AS n_customers,
             round(sum(m), 2) AS total_m,
             round(avg(m), 6) AS avg_m
      FROM seg GROUP BY 1 ORDER BY 1
    """)


@register(
    "scd2_user_state_intervals",
    """
    WITH o AS (
      SELECT user_id, event_type AS state, ts, event_id,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_state
      FROM events),
    ch AS (
      SELECT user_id, state, ts, event_id
      FROM o WHERE prev_state IS NULL OR prev_state <> state),
    iv AS (
      SELECT user_id, state,
             CAST(epoch_us(ts) AS BIGINT) AS valid_from_us,
             CAST(lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id)
                  AS BIGINT) AS valid_to_us
      FROM ch)
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_intervals,
           CAST(count(CASE WHEN valid_to_us IS NULL THEN 1 END)
                AS BIGINT) AS n_open,
           CAST(max(valid_to_us - valid_from_us) AS BIGINT)
             AS longest_closed_us
    FROM iv GROUP BY 1 ORDER BY user_id
    """,
    doc="Slowly-changing-dimension type 2 build: collapse each user's "
        "event-type stream into validity intervals (a new row only "
        "when the state CHANGES; valid_to = next change, NULL = "
        "current) — the warehouse dimension-versioning primitive, and "
        "the interval form session/state analytics join against. "
        "Change detection and interval close are both user-partitioned "
        "windows with a (ts, event_id) total order; the per-user "
        "summary keeps the output user-cardinality for the driver "
        "(the full interval table is the real product — same plan "
        "minus the final rollup).",
    tags=("analytics",),
)
def scd2_user_state_intervals(spark, sf_dir):
    load(spark, sf_dir, "events").createOrReplaceTempView("events_scd_v")
    return spark.sql("""
      WITH o AS (
        SELECT user_id, event_type AS state, ts, event_id,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_state
        FROM events_scd_v),
      ch AS (
        SELECT user_id, state, ts, event_id
        FROM o WHERE prev_state IS NULL OR prev_state <> state),
      iv AS (
        SELECT user_id, state,
               CAST(unix_micros(ts) AS BIGINT) AS valid_from_us,
               CAST(lead(unix_micros(ts)) OVER (PARTITION BY user_id
                                                ORDER BY ts, event_id)
                    AS BIGINT) AS valid_to_us
        FROM ch)
      SELECT user_id,
             CAST(count(*) AS BIGINT) AS n_intervals,
             CAST(count(CASE WHEN valid_to_us IS NULL THEN 1 END)
                  AS BIGINT) AS n_open,
             CAST(max(valid_to_us - valid_from_us) AS BIGINT)
               AS longest_closed_us
      FROM iv GROUP BY 1 ORDER BY user_id
    """)


@register(
    "freshness_sla_audit",
    """
    WITH h AS (SELECT max(ts) AS horizon FROM events),
    f AS (
      SELECT event_type,
             max(ts) AS last_seen,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1)
    SELECT f.event_type,
           f.n,
           CAST(epoch_us(f.last_seen) AS BIGINT) AS last_seen_us,
           CAST((epoch_us(h.horizon) - epoch_us(f.last_seen)) // 60000000
                AS BIGINT) AS staleness_minutes,
           epoch_us(h.horizon) - epoch_us(f.last_seen)
             <= 7200000000 AS within_2h_sla
    FROM f CROSS JOIN h ORDER BY f.event_type
    """,
    doc="Data-freshness SLA audit: per stream (event type), the last "
        "event seen, its staleness against the corpus horizon, and a "
        "2-hour SLA flag — the ingestion-health check every pipeline "
        "dashboard leads with (the reference's monitoring surfaces "
        "table write times; this is the query-side generalization). "
        "Two aggregates and a 1-row horizon broadcast; integer "
        "microsecond arithmetic end to end.",
    tags=("analytics",),
)
def freshness_sla_audit(spark, sf_dir):
    load(spark, sf_dir, "events").createOrReplaceTempView("events_fsh_v")
    return spark.sql("""
      WITH h AS (SELECT max(ts) AS horizon FROM events_fsh_v),
      f AS (
        SELECT event_type,
               max(ts) AS last_seen,
               CAST(count(*) AS BIGINT) AS n
        FROM events_fsh_v GROUP BY 1)
      SELECT f.event_type,
             f.n,
             CAST(unix_micros(f.last_seen) AS BIGINT) AS last_seen_us,
             CAST((unix_micros(h.horizon) - unix_micros(f.last_seen))
                  div 60000000 AS BIGINT) AS staleness_minutes,
             unix_micros(h.horizon) - unix_micros(f.last_seen)
               <= 7200000000 AS within_2h_sla
      FROM f CROSS JOIN h ORDER BY f.event_type
    """)


@register(
    "variant_typed_extract",
    """
    WITH s AS (SELECT event_type,
      CAST(json_extract(props, '$.k') AS BIGINT) AS k,
      TRY_CAST(json_extract(props, '$.missing') AS BIGINT) AS miss
      FROM events)
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(k) AS BIGINT) AS sum_k,
           CAST(min(k) AS BIGINT) AS min_k,
           CAST(max(k) AS BIGINT) AS max_k,
           CAST(count(miss) AS BIGINT) AS n_miss
    FROM s GROUP BY event_type ORDER BY event_type
    """,
    doc="Spark 4 VARIANT surface: parse_json() lifts the stringified "
        "JSON payload into the binary VARIANT type ONCE, and "
        "variant_get()/try_variant_get() do typed path extraction on "
        "the parsed form — vs json_extract_props' per-expression "
        "get_json_object re-parse of the raw string. At 100 TB the "
        "difference is one parse per row feeding N typed accesses "
        "instead of N string re-parses (Spark's answer to the "
        "reference's stringified-payload model, "
        "concurrent_buffer.go:576-592). try_variant_get on a missing "
        "path returns NULL (n_miss pins 0 per group on both sides); "
        "the oracle reads the same paths with DuckDB's JSON casts. "
        "Map-side single pass into <=5 event_type groups",
    tags=("sql-surface", "capability"),
)
def variant_typed_extract(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    s = ev.selectExpr(
        "event_type",
        "variant_get(parse_json(props), '$.k', 'bigint') AS k",
        "try_variant_get(parse_json(props), '$.missing', 'bigint') AS miss",
    )
    return (
        s.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.min("k").cast("bigint").alias("min_k"),
            F.max("k").cast("bigint").alias("max_k"),
            F.count("miss").cast("bigint").alias("n_miss"),
        )
        .orderBy("event_type")
    )


@register(
    "next_day_navigation",
    """
    WITH s AS (SELECT o_orderpriority AS pri,
      CAST(o_orderdate AS DATE) AS d,
      CAST(o_orderdate AS DATE) + CAST(
        CASE WHEN (1 - isodow(o_orderdate) + 7) % 7 = 0 THEN 7
             ELSE (1 - isodow(o_orderdate) + 7) % 7 END
        AS INTEGER) AS next_mon
      FROM orders)
    SELECT pri, CAST(count(*) AS BIGINT) AS n,
           CAST(min(next_mon) AS VARCHAR) AS mn_mon,
           CAST(max(next_mon) AS VARCHAR) AS mx_mon,
           CAST(sum(date_diff('day', d, next_mon)) AS BIGINT)
             AS sum_gap
    FROM s GROUP BY pri ORDER BY pri
    """,
    doc="next_day() weekday navigation (SURVEY §2.9 date family): "
        "Spark's next_day(d, 'MO') returns the first Monday STRICTLY "
        "after d (a Monday input jumps a full week) — DuckDB has no "
        "such function, so the oracle re-derives it from isodow "
        "arithmetic with the strictly-after rule explicit "
        "(((1 - isodow + 7) % 7) or 7). sum_gap pins the 1..7-day "
        "distance distribution exactly; a lenient 'on-or-after' port "
        "would shift every Monday row by 7. Map-side pass into <=5 "
        "priority groups",
    tags=("sql-surface", "capability"),
)
def next_day_navigation(spark, sf_dir):
    od = load(spark, sf_dir, "orders")
    s = od.selectExpr(
        "o_orderpriority AS pri",
        "o_orderdate AS d",
        "next_day(o_orderdate, 'MO') AS next_mon",
    )
    return (
        s.groupBy("pri")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.min("next_mon").cast("string").alias("mn_mon"),
            F.max("next_mon").cast("string").alias("mx_mon"),
            F.sum(F.datediff("next_mon", "d")).cast("bigint")
            .alias("sum_gap"),
        )
        .orderBy("pri")
    )
