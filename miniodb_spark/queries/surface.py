"""SQL-surface aggregate showcases: GROUP BY ALL, bitwise/boolean/
conditional aggregates, deterministic mode, and array-slice embedding
fidelity — each a single map-side-combinable aggregate pass (the
cheapest possible 100 TB shape: no joins, no fact-sized windows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401
from pyspark.sql import types as T  # noqa: F401

from .base import load, normalize_event_ts, register  # noqa: F401


@register(
    "group_by_all_shorthand",
    """
    SELECT dayofweek(ts) AS dow, event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)
             AS total_value
    FROM events
    GROUP BY ALL
    ORDER BY dow, event_type
    """,
    doc="GROUP BY ALL shorthand (every non-aggregate select item becomes "
        "a grouping key — supported verbatim by Spark 4 and DuckDB): "
        "day-of-week x event-type counts and exact decimal value totals. "
        "Day-of-week is normalized to DuckDB's 0=Sunday convention "
        "(Spark's dayofweek is 1-based). One map-side-combinable "
        "aggregate; the shorthand resolves at parse time, so the plan is "
        "identical to the explicit GROUP BY",
    tags=("sql-surface",),
)
def group_by_all_shorthand(spark, sf_dir):
    load(spark, sf_dir, "events").createOrReplaceTempView("events_gba_v")
    return spark.sql("""
      SELECT dayofweek(ts) - 1 AS dow, event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)
               AS total_value
      FROM events_gba_v
      GROUP BY ALL
      ORDER BY dow, event_type
    """)


@register(
    "bitmap_presence_agg",
    """
    WITH per_user AS (
      SELECT event_type, user_id,
             bit_or(CAST(1 << dayofweek(ts) AS BIGINT)) AS user_bm
      FROM events
      GROUP BY event_type, user_id)
    SELECT event_type,
           CAST(bit_or(user_bm) AS BIGINT)  AS any_user_bitmap,
           CAST(bit_and(user_bm) AS BIGINT) AS all_users_bitmap,
           CAST(bit_count(bit_and(user_bm)) AS BIGINT)
             AS weekdays_every_user,
           CAST(bit_xor(user_id) AS BIGINT) AS user_xor_checksum
    FROM per_user
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="Bitwise aggregate surface (bit_or / bit_and / bit_xor / "
        "bit_count in both engines): per-user weekday-presence bitmaps "
        "(1 << dow, DuckDB 0=Sunday convention) folded per event type "
        "into any-user and every-user weekday masks plus an order-"
        "invariant XOR checksum of the user set. The presence-bitmap-"
        "then-intersect shape is the classic roaring-bitmap segmentation "
        "pattern ('which weekdays does EVERY user of this event hit'). "
        "Two stacked map-side-combinable aggregates — bitmaps are "
        "8 bytes however many rows they summarize",
    tags=("sql-surface",),
)
def bitmap_presence_agg(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    per_user = (
        ev.groupBy("event_type", "user_id")
        .agg(F.bit_or(
            # shiftleft's bit-count arg is Python-int-only in the column
            # API; the SQL form takes a column expression
            F.expr("CAST(shiftleft(1, dayofweek(ts) - 1) AS BIGINT)")
        ).alias("user_bm"))
    )
    return (
        per_user.groupBy("event_type")
        .agg(
            F.bit_or("user_bm").cast("bigint").alias("any_user_bitmap"),
            F.bit_and("user_bm").cast("bigint").alias("all_users_bitmap"),
            F.bit_count(F.bit_and("user_bm")).cast("bigint")
            .alias("weekdays_every_user"),
            F.bit_xor("user_id").cast("bigint").alias("user_xor_checksum"),
        )
        .orderBy("event_type")
    )


@register(
    "bool_count_if_flags",
    """
    SELECT event_type,
           bool_and(value IS NOT NULL) AS all_valued,
           bool_or(value > 400)        AS any_extreme,
           CAST(count_if(value > 250) AS BIGINT) AS n_over_250,
           CAST(count_if(props IS NULL OR props = '') AS BIGINT)
             AS n_no_props
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="Boolean/conditional aggregate surface: bool_and / bool_or "
        "(Spark's every/any under their portable names) and count_if — "
        "the data-quality flag rollup shape (are all rows valued, did "
        "any row spike, how many crossed a threshold). One aggregate "
        "pass; every flag is a map-side-combinable partial",
    tags=("sql-surface",),
)
def bool_count_if_flags(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.bool_and(F.col("value").isNotNull()).alias("all_valued"),
            F.bool_or(F.col("value") > 400).alias("any_extreme"),
            F.count_if(F.col("value") > 250).cast("bigint")
            .alias("n_over_250"),
            F.count_if(F.col("props").isNull() | (F.col("props") == ""))
            .cast("bigint").alias("n_no_props"),
        )
        .orderBy("event_type")
    )


@register(
    "mode_deterministic",
    """
    WITH c AS (
      SELECT event_type,
             CAST(least(floor(value / 50), 9) AS BIGINT) AS bucket,
             CAST(count(*) AS BIGINT) AS n
      FROM events
      WHERE value IS NOT NULL
      GROUP BY 1, 2),
    r AS (
      SELECT event_type, bucket, n,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY n DESC, bucket) AS rk
      FROM c)
    SELECT event_type, bucket AS modal_bucket, n AS modal_count
    FROM r WHERE rk = 1
    ORDER BY event_type
    """,
    doc="Deterministic mode: the native mode() aggregate is tie-"
        "nondeterministic in BOTH engines, so the modal value-bucket per "
        "event type is derived as count-desc/bucket-asc row_number=1 — "
        "reproducible on any engine and any partitioning. The window "
        "runs on the (type x 10-bucket) aggregate, never the facts; "
        "bucket ids are integer arithmetic (floor of value/50, capped)",
    tags=("sql-surface",),
)
def mode_deterministic(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    c = (
        ev.filter(F.col("value").isNotNull())
        .groupBy(
            "event_type",
            F.least(F.floor(F.col("value") / 50), F.lit(9))
            .cast("bigint").alias("bucket"),
        )
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    w = W.partitionBy("event_type").orderBy(F.col("n").desc(), "bucket")
    return (
        c.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(F.col("event_type"), F.col("bucket").alias("modal_bucket"),
                F.col("n").alias("modal_count"))
        .orderBy("event_type")
    )


@register(
    "matryoshka_cosine_fidelity",
    """
    WITH per_vec AS (
      SELECT label,
             CAST(sqrt(
               list_dot_product(CAST(embedding[1:16] AS DOUBLE[]),
                                CAST(embedding[1:16] AS DOUBLE[]))
               / list_dot_product(CAST(embedding AS DOUBLE[]),
                                  CAST(embedding AS DOUBLE[]))
             ) AS DECIMAL(18,12)) AS cos_fid
      FROM embeddings)
    SELECT label,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(avg(cos_fid), 6) AS DOUBLE) AS avg_cosine_16
    FROM per_vec
    GROUP BY label
    ORDER BY label
    """,
    doc="Matryoshka-truncation fidelity: cosine between each 64-dim "
        "embedding and its first-16-dim prefix (the MRL serving trick — "
        "store one vector, serve any prefix length). cos(full, prefix) "
        "reduces to sqrt(|prefix|^2 / |full|^2), so the whole metric is "
        "two array self-dot-products per row — zero shuffles beyond the "
        "10-group aggregate. Per-row doubles are bit-identical across "
        "engines (same-order 16/64-term sums in double), pinned exact "
        "via DECIMAL(18,12) before the group average; at 100 TB this is "
        "a pure map pass over the vector column, payloads never shuffle",
    tags=("sql-surface", "embedding"),
)
def matryoshka_cosine_fidelity(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    dbl = lambda col: F.transform(col, lambda x: x.cast("double"))
    dot = lambda col: F.aggregate(
        F.zip_with(dbl(col), dbl(col), lambda a, b: a * b),
        F.lit(0.0).cast("double"), lambda acc, x: acc + x)
    per_vec = emb.select(
        "label",
        F.sqrt(dot(F.slice("embedding", 1, 16)) / dot(F.col("embedding")))
        .cast("decimal(18,12)").alias("cos_fid"),
    )
    return (
        per_vec.groupBy("label")
        .agg(F.count("*").cast("bigint").alias("n"),
             F.round(F.avg("cos_fid"), 6).cast("double")
             .alias("avg_cosine_16"))
        .orderBy("label")
    )


@register(
    "embedding_sign_bits_hamming",
    """
    WITH sig AS (
      SELECT vec_id, label,
             list_sum(list_transform(embedding[1:63],
               (x, i) -> CASE WHEN x > 0 THEN (1::BIGINT << (i - 1))
                         ELSE 0::BIGINT END)) AS sig,
             sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                   CAST(embedding AS DOUBLE[]))) AS nrm,
             CAST(embedding AS DOUBLE[]) AS emb
      FROM embeddings),
    probe AS (
      SELECT sig AS psig, nrm AS pnrm, emb AS pemb
      FROM sig ORDER BY vec_id LIMIT 1),
    h AS (
      SELECT label,
             CAST(bit_count(xor(sig, psig)) AS BIGINT) AS hamming,
             CAST(list_dot_product(emb, pemb) / (nrm * pnrm)
                  AS DECIMAL(18,12)) AS cos_probe
      FROM sig, probe)
    SELECT label, CAST(count(*) AS BIGINT) AS n,
           CAST(round(avg(hamming * 1.0), 6) AS DOUBLE) AS avg_hamming,
           round(corr(hamming * 1.0, CAST(cos_probe AS DOUBLE)), 6)
             AS corr_hamming_cosine
    FROM h GROUP BY label ORDER BY label
    """,
    doc="Binary-embedding audit: 63-bit sign signatures (bit i set when "
        "dim i > 0 — the 32x-compression binarization trick), Hamming "
        "distance of every vector to a fixed probe (lowest vec_id) via "
        "bit_count(xor), and the per-label correlation between Hamming "
        "distance and true cosine — the quality check one runs before "
        "switching ANN serving to binary signatures. Strictly linear: "
        "one probe row broadcast against the corpus (no pairwise join "
        "anywhere; the banded-Hamming JOIN path lives in "
        "operators/multimodal.py). Per-row doubles are same-order "
        "sums, decimal-pinned before corr; round-6 on the moments",
    tags=("sql-surface", "embedding"),
)
def embedding_sign_bits_hamming(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    dot = F.aggregate(F.zip_with(dbl, dbl, lambda a, b: a * b),
                      F.lit(0.0), lambda acc, x: acc + x)
    # left-fold acc*2 + bit over the REVERSED 63-dim prefix builds
    # sum(bit_i << (i-1)) without a column-typed shift amount
    # (shiftleft's bit-count arg is Python-int-only in the column API)
    sig_expr = F.aggregate(
        F.reverse(F.slice("embedding", 1, 63)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc * 2 + F.when(x > 0, 1).otherwise(0),
    )
    sig = emb.select(
        "vec_id", "label", sig_expr.alias("sig"),
        F.sqrt(dot).alias("nrm"), dbl.alias("emb"))
    probe = (sig.orderBy("vec_id").limit(1)
             .select(F.col("sig").alias("psig"), F.col("nrm").alias("pnrm"),
                     F.col("emb").alias("pemb")))
    h = (
        sig.crossJoin(F.broadcast(probe))
        .select(
            "label",
            F.bit_count(F.expr("sig ^ psig")).cast("bigint")
            .alias("hamming"),
            (F.aggregate(F.zip_with("emb", "pemb", lambda a, b: a * b),
                         F.lit(0.0), lambda acc, x: acc + x)
             / (F.col("nrm") * F.col("pnrm")))
            .cast("decimal(18,12)").alias("cos_probe"),
        )
    )
    return (
        h.groupBy("label")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.round(F.avg(F.col("hamming") * 1.0), 6).cast("double")
            .alias("avg_hamming"),
            F.round(F.corr(F.col("hamming") * 1.0,
                           F.col("cos_probe").cast("double")), 6)
            .alias("corr_hamming_cosine"),
        )
        .orderBy("label")
    )


@register(
    "percentile_cont_within_group",
    """
    SELECT event_type,
           round(percentile_cont(0.25) WITHIN GROUP (ORDER BY value), 6)
             AS p25,
           round(percentile_cont(0.50) WITHIN GROUP (ORDER BY value), 6)
             AS p50,
           round(percentile_cont(0.90) WITHIN GROUP (ORDER BY value), 6)
             AS p90
    FROM events WHERE value IS NOT NULL
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="Ordered-set aggregate surface: ANSI percentile_cont WITHIN "
        "GROUP, supported verbatim by Spark 4 and DuckDB with the same "
        "linear-interpolation semantics (unlike approx_percentile, "
        "which is engine-specific — that path is the separate "
        "*_within_bound entries). Exact percentiles imply a per-group "
        "sort at scale; the approx/histogram entries document the "
        "100 TB swap. Round-6 guards the interpolation arithmetic",
    tags=("sql-surface",),
)
def percentile_cont_within_group(spark, sf_dir):
    load(spark, sf_dir, "events").createOrReplaceTempView("events_pc_v")
    return spark.sql("""
      SELECT event_type,
             round(percentile_cont(0.25) WITHIN GROUP (ORDER BY value), 6)
               AS p25,
             round(percentile_cont(0.50) WITHIN GROUP (ORDER BY value), 6)
               AS p50,
             round(percentile_cont(0.90) WITHIN GROUP (ORDER BY value), 6)
               AS p90
      FROM events_pc_v WHERE value IS NOT NULL
      GROUP BY event_type
      ORDER BY event_type
    """)


@register(
    "try_arithmetic_safety",
    """
    WITH base AS (
      SELECT e.event_type, e.value,
             t.divisor,
             TRY_CAST(e.props AS DOUBLE) AS props_num
      FROM events e
      JOIN (VALUES ('click', 2), ('view', 0), ('error', 4),
                   ('purchase', 0), ('signup', 8)) t(etype, divisor)
        ON e.event_type = t.etype)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(sum(CAST(value / nullif(divisor, 0)
                               AS DECIMAL(18,6))), 2) AS DOUBLE)
             AS safe_ratio_sum,
           CAST(count_if(divisor = 0) AS BIGINT) AS n_null_division,
           CAST(count_if(props_num IS NULL) AS BIGINT) AS n_uncastable
    FROM base
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="Error-safe arithmetic surface: division by a possibly-zero "
        "VALUES-clause dimension and TRY_CAST of a non-numeric column, "
        "with NULL (never an exception and never Inf) as the contract "
        "on both engines. Spark side uses try_divide + try_cast; the "
        "oracle spells the same semantics as x/nullif(y,0) + TRY_CAST. "
        "The inline VALUES dimension broadcasts; one aggregate pass; "
        "decimal ratio sums are order-invariant",
    tags=("sql-surface",),
)
def try_arithmetic_safety(spark, sf_dir):
    load(spark, sf_dir, "events").createOrReplaceTempView("events_try_v")
    return spark.sql("""
      WITH base AS (
        SELECT e.event_type, e.value,
               t.divisor,
               try_cast(e.props AS DOUBLE) AS props_num
        FROM events_try_v e
        JOIN VALUES ('click', 2), ('view', 0), ('error', 4),
                    ('purchase', 0), ('signup', 8) AS t(etype, divisor)
          ON e.event_type = t.etype)
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(round(sum(CAST(try_divide(value, nullif(divisor, 0))
                                 AS DECIMAL(18,6))), 2) AS DOUBLE)
               AS safe_ratio_sum,
             CAST(count_if(divisor = 0) AS BIGINT) AS n_null_division,
             CAST(count_if(props_num IS NULL) AS BIGINT) AS n_uncastable
      FROM base
      GROUP BY event_type
      ORDER BY event_type
    """)


@register(
    "regexp_extract_all_counts",
    """
    SELECT event_type,
           CAST(sum(len(regexp_extract_all(props, '[0-9]+'))) AS BIGINT)
             AS n_numeric_tokens,
           CAST(max(len(regexp_extract_all(props, '[a-z]+'))) AS BIGINT)
             AS max_word_tokens
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="regexp_extract_all surface: count ALL pattern matches per row "
        "(size of the extracted array) aggregated per event type — the "
        "multi-match companion to the single-match regexp_ops entry. "
        "Regex runs inside codegen on the narrow props column; one "
        "aggregate pass, no explode (array length, not element rows)",
    tags=("sql-surface",),
)
def regexp_extract_all_counts(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.sum(F.size(F.regexp_extract_all("props", F.lit("[0-9]+"), 0)))
            .cast("bigint").alias("n_numeric_tokens"),
            F.max(F.size(F.regexp_extract_all("props", F.lit("[a-z]+"), 0)))
            .cast("bigint").alias("max_word_tokens"),
        )
        .orderBy("event_type")
    )


@register(
    "star_except_projection",
    """
    SELECT * EXCLUDE (props, value)
    FROM events
    ORDER BY event_id
    LIMIT 25
    """,
    doc="Column-exclusion projection shorthand: Spark's SELECT * EXCEPT "
        "and DuckDB's SELECT * EXCLUDE are the same feature under "
        "different keywords — project everything but the named columns "
        "without enumerating the keep-set (the wide-table ergonomic). "
        "Resolves at analysis time to an ordinary pruned projection, so "
        "the scan reads only the surviving columns",
    tags=("sql-surface",),
)
def star_except_projection(spark, sf_dir):
    load(spark, sf_dir, "events").createOrReplaceTempView("events_sx_v")
    return spark.sql("""
      SELECT * EXCEPT (props, value)
      FROM events_sx_v
      ORDER BY event_id
      LIMIT 25
    """)


@register(
    "unpivot_order_by_all",
    """
    SELECT * FROM (
      SELECT o_orderstatus AS status,
             CAST(count(*) AS BIGINT) AS n_orders,
             CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers
      FROM orders GROUP BY ALL)
    UNPIVOT (val FOR metric IN (n_orders, n_customers))
    ORDER BY ALL
    """,
    doc="Native UNPIVOT syntax + ORDER BY ALL shorthand (both parse "
        "verbatim on Spark 4 and DuckDB): the per-status order/customer "
        "counts rotated long — the metrics-table shape the stack()-"
        "based unpivot_part_metrics entry builds by hand, here via the "
        "SQL-standard relational operator. UNPIVOT resolves at analysis "
        "time to the same expand; ORDER BY ALL totalizes the sort "
        "without naming columns. One aggregate + one expand",
    tags=("sql-surface",),
)
def unpivot_order_by_all(spark, sf_dir):
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_upv_v")
    return spark.sql("""
      SELECT * FROM (
        SELECT o_orderstatus AS status,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers
        FROM orders_upv_v GROUP BY ALL)
      UNPIVOT (val FOR metric IN (n_orders, n_customers))
      ORDER BY ALL
    """)


@register(
    "named_window_reuse",
    """
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2)
    SELECT event_type, strftime(day, '%Y-%m-%d') AS day, n,
           CAST(rank() OVER w AS BIGINT) AS day_rank,
           CAST(sum(n) OVER w AS BIGINT) AS running_n
    FROM d
    WINDOW w AS (PARTITION BY event_type ORDER BY day)
    ORDER BY event_type, day
    LIMIT 40
    """,
    doc="Named-window (WINDOW clause) surface: ONE window specification "
        "shared by rank() and a running sum — the deduplication "
        "ergonomic for multi-function analytics, identical syntax and "
        "semantics on both engines, and one physical Window operator "
        "since the spec is shared. Runs on the (type x day) aggregate, "
        "partition spec never empty; day stringified for canon-type "
        "parity (DATE dtype divergence, see seasonal_decompose)",
    tags=("sql-surface",),
)
def named_window_reuse(spark, sf_dir):
    load(spark, sf_dir, "events").createOrReplaceTempView("events_nw_v")
    return spark.sql("""
      WITH d AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS n
        FROM events_nw_v GROUP BY 1, 2)
      SELECT event_type, date_format(day, 'yyyy-MM-dd') AS day, n,
             CAST(rank() OVER w AS BIGINT) AS day_rank,
             CAST(sum(n) OVER w AS BIGINT) AS running_n
      FROM d
      WINDOW w AS (PARTITION BY event_type ORDER BY day)
      ORDER BY event_type, day
      LIMIT 40
    """)


@register(
    "set_bag_intersect_except",
    """
    WITH a AS (SELECT event_type FROM events
               WHERE day(ts) <= 10 AND value > 150),
         b AS (SELECT event_type FROM events
               WHERE day(ts) BETWEEN 11 AND 20 AND value > 150),
         i AS (SELECT * FROM a INTERSECT ALL SELECT * FROM b),
         x AS (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
    SELECT tag, event_type, n FROM (
      SELECT 'both_min' AS tag, event_type,
             CAST(count(*) AS BIGINT) AS n FROM i GROUP BY event_type
      UNION ALL
      SELECT 'first_surplus' AS tag, event_type,
             CAST(count(*) AS BIGINT) AS n FROM x GROUP BY event_type) t
    ORDER BY tag, event_type
    """,
    doc="Bag-semantics set operators: INTERSECT ALL keeps "
        "min(multiplicity), EXCEPT ALL keeps the left surplus — the "
        "complement of set_intersect_except's DISTINCT semantics "
        "(exceptAll().distinct() is NOT subtract(), and this entry is "
        "the proof: surplus multiplicities survive). Spark compiles "
        "both to a count-compare aggregate + generate, so the only "
        "shuffles are on the row key itself — no join of fact-sized "
        "inputs. Reference gate bans set ops outright "
        "(internal/security/sql_sanitizer.go); this is the capability "
        "upgrade's bag half.",
    tags=("sql-surface", "capability"),
)
def set_bag_intersect_except(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    a = ev.filter((F.dayofmonth("ts") <= 10) & (F.col("value") > 150)).select(
        "event_type"
    )
    b = ev.filter(
        F.dayofmonth("ts").between(11, 20) & (F.col("value") > 150)
    ).select("event_type")
    inter = (
        a.intersectAll(b)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .select(F.lit("both_min").alias("tag"), "event_type", "n")
    )
    surplus = (
        a.exceptAll(b)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .select(F.lit("first_surplus").alias("tag"), "event_type", "n")
    )
    return inter.unionAll(surplus).orderBy("tag", "event_type")


@register(
    "array_set_ops_user_types",
    """
    WITH h1 AS (SELECT user_id,
                       list_sort(list_distinct(list(event_type))) AS t1
                FROM events WHERE day(ts) <= 15 GROUP BY user_id),
         h2 AS (SELECT user_id,
                       list_sort(list_distinct(list(event_type))) AS t2
                FROM events WHERE day(ts) > 15 GROUP BY user_id)
    SELECT h1.user_id,
           coalesce(array_to_string(list_sort(list_intersect(t1, t2)),
                                    ','), '') AS common_types,
           coalesce(array_to_string(list_sort(list_filter(t1,
                     x -> NOT list_contains(t2, x))), ','), '')
             AS first_only_types,
           CAST(length(list_distinct(list_concat(t1, t2))) AS BIGINT)
             AS n_union,
           length(list_intersect(t1, t2)) > 0 AS both_active
    FROM h1 JOIN h2 USING (user_id)
    ORDER BY user_id
    """,
    doc="Array set algebra (array_intersect / array_except / "
        "array_union / arrays_overlap) over per-user event-type sets "
        "from the two halves of the month. collect_set builds the sets "
        "map-side; the half-tables join on user_id (both pre-aggregated "
        "to user cardinality, so the join is between shrunken inputs, "
        "never facts); sort_array on every array output makes the "
        "element order engine-independent, and arrays leave the query "
        "as joined CSV strings because the driver's pandas "
        "canonicalizer (sort_values over all columns) cannot order "
        "raw array cells — caught by the round-11 third-session "
        "full-registry soak. DuckDB spells the same algebra with "
        "list_* functions and a lambda for EXCEPT.",
    tags=("sql-surface",),
)
def array_set_ops_user_types(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    h1 = (
        ev.filter(F.dayofmonth("ts") <= 15)
        .groupBy("user_id")
        .agg(F.collect_set("event_type").alias("t1"))
    )
    h2 = (
        ev.filter(F.dayofmonth("ts") > 15)
        .groupBy("user_id")
        .agg(F.collect_set("event_type").alias("t2"))
    )
    return (
        h1.join(h2, "user_id")
        .select(
            "user_id",
            F.array_join(
                F.sort_array(F.array_intersect("t1", "t2")), ","
            ).alias("common_types"),
            F.array_join(
                F.sort_array(F.array_except("t1", "t2")), ","
            ).alias("first_only_types"),
            F.size(F.array_union("t1", "t2")).cast("long").alias("n_union"),
            F.arrays_overlap("t1", "t2").alias("both_active"),
        )
        .orderBy("user_id")
    )


@register(
    "lag_lead_ignore_nulls",
    """
    SELECT user_id, event_id,
           round(lag(v IGNORE NULLS)  OVER w, 2) AS prev_nn,
           round(lead(v IGNORE NULLS) OVER w, 2) AS next_nn
    FROM (SELECT user_id, event_id, ts,
                 CASE WHEN event_type = 'view' THEN NULL
                      ELSE value END AS v
          FROM events WHERE user_id < 60) t
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, event_id
    """,
    doc="IGNORE NULLS navigation: lag/lead skip NULL-masked rows "
        "('view' events carry no value) to reach the nearest non-null "
        "neighbour — the gap-carry-forward idiom interpolation is built "
        "on. Same semantics both engines; DuckDB spells the modifier "
        "inside the call (lag(v IGNORE NULLS)), Spark after it. "
        "Window is PARTITIONed BY user_id (never global) with a (ts, "
        "event_id) total order so ties cannot flip rows between "
        "engines; value is 2-dp money so round(.,2) is the identity "
        "and parity is exact.",
    tags=("sql-surface",),
)
def lag_lead_ignore_nulls(spark, sf_dir):
    load(spark, sf_dir, "events").createOrReplaceTempView("events_lin_v")
    return spark.sql("""
      SELECT user_id, event_id,
             round(lag(v)  IGNORE NULLS OVER w, 2) AS prev_nn,
             round(lead(v) IGNORE NULLS OVER w, 2) AS next_nn
      FROM (SELECT user_id, event_id, ts,
                   CASE WHEN event_type = 'view' THEN NULL
                        ELSE value END AS v
            FROM events_lin_v WHERE user_id < 60) t
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ORDER BY user_id, event_id
    """)


@register(
    "tz_conversion_ny_hours",
    """
    SELECT hour(timezone('America/New_York', timezone('UTC', ts)))
             AS ny_hour,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN CAST(timezone('America/New_York',
                                            timezone('UTC', ts)) AS DATE)
                              <> CAST(ts AS DATE)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_shifted_date
    FROM events
    GROUP BY ny_hour
    ORDER BY ny_hour
    """,
    doc="Time-zone conversion surface: the fixture's UTC instants "
        "rendered as America/New_York wall-clock (Spark "
        "from_utc_timestamp == DuckDB timezone(tz, timestamptz) — both "
        "IANA-rule-driven, so DST shifts agree engine-to-engine; "
        "January pins EST=UTC-5 and every 19:00-23:59Z event lands on "
        "the previous NY calendar day, which n_shifted_date counts). "
        "Pure expression work inside one map-side-combinable aggregate "
        "— zero joins, one shuffle on the 24-row hour key. The oracle "
        "builds the instant explicitly (timezone('UTC', ts)) so neither "
        "engine's session-timezone default participates.",
    tags=("sql-surface",),
)
def tz_conversion_ny_hours(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    ny = F.from_utc_timestamp("ts", "America/New_York")
    return (
        ev.select(
            F.hour(ny).alias("ny_hour"),
            (F.to_date(ny) != F.to_date("ts")).cast("int").alias("shifted"),
        )
        .groupBy("ny_hour")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("shifted").cast("long").alias("n_shifted_date"),
        )
        .orderBy("ny_hour")
    )


@register(
    "map_hof_event_shares",
    """
    WITH c AS (SELECT user_id, event_type, count(*) AS n
               FROM events GROUP BY user_id, event_type),
         t AS (SELECT user_id, sum(n) AS tot FROM c GROUP BY user_id)
    SELECT c.user_id, c.event_type, CAST(c.n AS BIGINT) AS n,
           round(c.n / t.tot, 6) AS share
    FROM c JOIN t ON c.user_id = t.user_id
    WHERE c.n >= 5
    ORDER BY c.user_id, c.event_type
    """,
    doc="Map higher-order functions (the map half of "
        "higher_order_array_funcs): per-user event-type counts packed "
        "with map_from_entries, thresholded with map_filter, reshaped "
        "with transform_values (lambda referencing an outer column), "
        "then exploded back to rows. The map machinery is Spark-side "
        "plan surface; the exploded output is plain columns so the "
        "oracle recomputes it relationally. Two shuffles total — "
        "(user,type) then user, the second a near-no-op since the "
        "first already co-locates by user hash prefix.",
    tags=("sql-surface",),
)
def map_hof_event_shares(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    m = c.groupBy("user_id").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("event_type", "n")))
        ).alias("m"),
        F.sum("n").alias("tot"),
    )
    kept = m.select(
        "user_id",
        "tot",
        F.map_filter("m", lambda k, v: v >= F.lit(5)).alias("mf"),
    )
    shaped = kept.select(
        "user_id",
        F.explode(
            F.transform_values(
                "mf",
                lambda k, v: F.struct(
                    v.alias("n"), F.round(v / F.col("tot"), 6).alias("share")
                ),
            )
        ).alias("event_type", "stats"),
    )
    return shaped.select(
        "user_id",
        "event_type",
        F.col("stats.n").alias("n"),
        F.col("stats.share").alias("share"),
    ).orderBy("user_id", "event_type")


@register(
    "posexplode_word_positions",
    """
    SELECT doc_id, CAST(pos - 1 AS BIGINT) AS pos, parts[pos] AS word
    FROM (SELECT doc_id, string_split(text, ' ') AS parts
          FROM documents WHERE doc_id < 20) t,
         LATERAL (SELECT unnest(generate_series(1, len(parts))) AS pos) u
    WHERE parts[pos] <> ''
    ORDER BY doc_id, pos
    """,
    doc="Positional explode (posexplode — the ordinality-preserving "
        "generator): tokenized words WITH their 0-based positions, the "
        "substrate for positional n-grams / winnowing offsets. Spark's "
        "posexplode emits (pos, col) directly; DuckDB spells the same "
        "thing as a LATERAL generate_series index into the split array. "
        "Positions survive the empty-token filter on both sides (filter "
        "AFTER indexing), so gaps agree. Map-side Generate only — the "
        "single shuffle is the final presentation sort.",
    tags=("sql-surface",),
)
def posexplode_word_positions(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    return (
        docs.select(
            "doc_id",
            F.posexplode(F.split("text", " ")).alias("pos", "word"),
        )
        .filter(F.col("word") != "")
        .select("doc_id", F.col("pos").cast("long").alias("pos"), "word")
        .orderBy("doc_id", "pos")
    )


@register(
    "grouping_id_labels",
    """
    SELECT CASE WHEN GROUPING(o_orderstatus) = 1 THEN 'ALL'
                ELSE o_orderstatus END AS status,
           CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL'
                ELSE o_orderpriority END AS priority,
           CAST(GROUPING(o_orderstatus) * 2
                + GROUPING(o_orderpriority) AS BIGINT) AS lvl,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2)
                AS DOUBLE) AS total
    FROM orders
    GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
    ORDER BY lvl, status, priority
    """,
    doc="GROUPING() disambiguation over ROLLUP: subtotal rows are "
        "labeled 'ALL' and carry an explicit level id "
        "(GROUPING(a)*2+GROUPING(b) — the portable spelling of "
        "grouping_id, identical on both engines), so a NULL-valued "
        "status can never be confused with the status subtotal — the "
        "piece the agg_rollup/cube entries leave implicit. One expand "
        "aggregate, exact decimal totals.",
    tags=("sql-surface",),
)
def grouping_id_labels(spark, sf_dir):
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_gid_v")
    return spark.sql("""
      SELECT CASE WHEN GROUPING(o_orderstatus) = 1 THEN 'ALL'
                  ELSE o_orderstatus END AS status,
             CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL'
                  ELSE o_orderpriority END AS priority,
             CAST(GROUPING(o_orderstatus) * 2
                  + GROUPING(o_orderpriority) AS BIGINT) AS lvl,
             CAST(count(*) AS BIGINT) AS n,
             CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2)
                  AS DOUBLE) AS total
      FROM orders_gid_v
      GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
      ORDER BY lvl, status, priority
    """)


@register(
    "string_agg_ordered",
    """
    SELECT r.r_name AS region,
           CAST(count(*) AS BIGINT) AS n_nations,
           string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations_csv,
           string_agg(DISTINCT n.n_name, '|' ORDER BY n.n_name)
             AS nations_distinct
    FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name ORDER BY r.r_name
    """,
    doc="Deterministic ordered string aggregation — the report/export "
        "surface (string_agg ... ORDER BY in DuckDB/Postgres, "
        "listagg WITHIN GROUP in Spark 4 / ANSI). Unordered "
        "collect_list is non-deterministic under partitioning, so "
        "the entry pins the ORDERED form on both engines plus the "
        "sorted-array spelling (array_join(array_sort(collect_...))) "
        "that works on any Spark version. Dims only — the point is "
        "semantics, not volume; per-group lists must stay bounded at "
        "scale regardless of engine.",
    tags=("sql-surface",),
)
def string_agg_ordered(spark, sf_dir):
    load(spark, sf_dir, "region").createOrReplaceTempView("region_sa_v")
    load(spark, sf_dir, "nation").createOrReplaceTempView("nation_sa_v")
    return spark.sql("""
      SELECT r.r_name AS region,
             CAST(count(*) AS BIGINT) AS n_nations,
             listagg(n.n_name, ',')
               WITHIN GROUP (ORDER BY n.n_name) AS nations_csv,
             array_join(array_sort(collect_set(n.n_name)), '|')
               AS nations_distinct
      FROM region_sa_v r JOIN nation_sa_v n
        ON n.n_regionkey = r.r_regionkey
      GROUP BY r.r_name ORDER BY r.r_name
    """)


@register(
    "string_funcs_gauntlet2",
    """
    SELECT split_part(c_name, '#', 1) AS prefix,
           CAST(count(*) AS BIGINT) AS n,
           min(translate(c_mktsegment, 'AEIOU', 'aeiou')) AS tr_min,
           max(lpad(CAST(c_custkey AS VARCHAR), 8, '0')) AS key_pad_max,
           min(reverse(c_mktsegment)) AS rev_min,
           max(repeat(left(c_mktsegment, 2), 2)) AS rep_max,
           min(right(c_name, 3)) AS tail_min
    FROM customer GROUP BY 1 ORDER BY 1
    """,
    doc="Second string-function gauntlet: split_part / translate / "
        "lpad / reverse / repeat / left / right — the ETL-surface "
        "functions the first gauntlet (string_funcs) didn't pin, each "
        "sharing name AND semantics across Spark and DuckDB so a "
        "reference user's expressions port verbatim. All pure "
        "projections folded into one aggregate over customer; "
        "whole-stage-codegen JVM expressions, zero shuffle beyond the "
        "single group.",
    tags=("sql-surface",),
)
def string_funcs_gauntlet2(spark, sf_dir):
    load(spark, sf_dir, "customer").createOrReplaceTempView("cust_sg2_v")
    return spark.sql("""
      SELECT split_part(c_name, '#', 1) AS prefix,
             CAST(count(*) AS BIGINT) AS n,
             min(translate(c_mktsegment, 'AEIOU', 'aeiou')) AS tr_min,
             max(lpad(CAST(c_custkey AS STRING), 8, '0')) AS key_pad_max,
             min(reverse(c_mktsegment)) AS rev_min,
             max(repeat(left(c_mktsegment, 2), 2)) AS rep_max,
             min(right(c_name, 3)) AS tail_min
      FROM cust_sg2_v GROUP BY 1 ORDER BY 1
    """)


@register(
    "date_funcs_gauntlet",
    """
    SELECT CAST(quarter(o_orderdate) AS BIGINT) AS q,
           CAST(count(*) AS BIGINT) AS n,
           CAST(CAST(min(last_day(o_orderdate)) AS DATE) AS VARCHAR)
             AS first_month_end,
           CAST(CAST(max(last_day(o_orderdate)) AS DATE) AS VARCHAR)
             AS last_month_end,
           CAST(max(dayofyear(o_orderdate)) AS BIGINT) AS max_doy,
           CAST(date_diff('day', min(o_orderdate), max(o_orderdate))
                AS BIGINT) AS span_days
    FROM orders WHERE year(o_orderdate) = 1996
    GROUP BY 1 ORDER BY 1
    """,
    doc="Calendar-function gauntlet over one year of orders: quarter, "
        "last_day (month-end snapping — billing cutoffs), dayofyear, "
        "and day-span arithmetic (Spark datediff(end, start) == "
        "DuckDB date_diff('day', start, end) — note the argument-order "
        "trap this entry pins). 1996 is a leap year, so max_doy=366 "
        "and the Feb month-end land on the 29th — the edge the "
        "functions exist for. One filtered aggregate, 4 rows.",
    tags=("sql-surface",),
)
def date_funcs_gauntlet(spark, sf_dir):
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_dfg_v")
    return spark.sql("""
      SELECT CAST(quarter(o_orderdate) AS BIGINT) AS q,
             CAST(count(*) AS BIGINT) AS n,
             CAST(CAST(min(last_day(o_orderdate)) AS DATE) AS STRING)
               AS first_month_end,
             CAST(CAST(max(last_day(o_orderdate)) AS DATE) AS STRING)
               AS last_month_end,
             CAST(max(dayofyear(o_orderdate)) AS BIGINT) AS max_doy,
             CAST(datediff(max(o_orderdate), min(o_orderdate))
                  AS BIGINT) AS span_days
      FROM orders_dfg_v WHERE year(o_orderdate) = 1996
      GROUP BY 1 ORDER BY 1
    """)


@register(
    "iso_week_revenue",
    """
    SELECT CAST(isoyear(o_orderdate) AS BIGINT) AS iso_year,
           CAST(week(o_orderdate) AS BIGINT) AS iso_week,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2)
                AS DOUBLE) AS revenue
    FROM orders WHERE year(o_orderdate) = 1997
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
    doc="ISO-8601 week buckets (the fiscal/ops reporting calendar): "
        "Spark weekofyear + extract(YEAROFWEEK) == DuckDB week + "
        "isoyear, including the year-boundary weeks where the ISO year "
        "disagrees with the calendar year (1997-01-01 falls in ISO "
        "week 1 of 1997, but Dec 29-31 1997 belong to ISO 1998-W01 — "
        "rows this entry deliberately contains). Exact decimal "
        "revenue; one aggregate, ~53 rows.",
    tags=("sql-surface",),
)
def iso_week_revenue(spark, sf_dir):
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_iso_v")
    return spark.sql("""
      SELECT CAST(extract(YEAROFWEEK FROM o_orderdate) AS BIGINT)
               AS iso_year,
             CAST(weekofyear(o_orderdate) AS BIGINT) AS iso_week,
             CAST(count(*) AS BIGINT) AS n,
             CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2)
                  AS DOUBLE) AS revenue
      FROM orders_iso_v WHERE year(o_orderdate) = 1997
      GROUP BY 1, 2 ORDER BY 1, 2
    """)


@register(
    "distinct_on_latest_event",
    """
    SELECT DISTINCT ON (user_id)
           user_id, event_type AS last_type,
           CAST(epoch_us(ts) AS BIGINT) AS last_ts_us
    FROM events
    ORDER BY user_id, ts DESC, event_id DESC
    """,
    doc="Latest event per user — the portability entry for Postgres/"
        "DuckDB's DISTINCT ON, which Spark does not have: the "
        "translation is the user-partitioned row_number()=1 idiom "
        "(the same plan DISTINCT ON compiles to). (ts, event_id) DESC "
        "makes the pick a total order, so both engines choose the "
        "same row. One user-partitioned window over events, no joins.",
    tags=("sql-surface",),
)
def distinct_on_latest_event(spark, sf_dir):
    load(spark, sf_dir, "events").createOrReplaceTempView("events_don_v")
    return spark.sql("""
      SELECT user_id, event_type AS last_type,
             CAST(unix_micros(ts) AS BIGINT) AS last_ts_us
      FROM (
        SELECT user_id, event_type, ts,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events_don_v) x
      WHERE rn = 1
    """)
