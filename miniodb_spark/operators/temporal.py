"""Temporal join operators: as-of join and event-time range join.

The reference surfaces no temporal joins (its joins are whatever
DuckDB admits, SURVEY §2.4); these are the custom operators a
time-series/feature-store workload needs, built as compositions of
existing DataFrame ops — the (a) strategy from the build brief, no
UDFs:

**As-of join** (for each left row, the most recent right row at or
before its timestamp, per key): implemented with the union trick —
tag both sides, sort-by-time within key via a window, and carry the
last-seen right row forward with ``last(..., ignorenulls=True)``.
One shuffle on the key column, linear in |L|+|R|; no per-key driver
loops, no quadratic time-window join. At 100 TB both sides shuffle
once on the by-key — the same cost as any co-keyed join of the two
inputs.

**Range join** (pairs within a time window per key): expressed as an
equi-join on coarse time *buckets* (each left row probes its own and
the previous bucket) + exact predicate — turning an unbounded
inequality join into a bounded hash join. Output-linear instead of
|L|×|R|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For every left row: columns of the latest right row with
    ``right.ts <= left.ts`` within the same ``by`` key (NULLs when no
    right row precedes it)."""
    value_cols = value_cols or [
        c for c in right.columns if c not in (by, right_ts)
    ]

    lt = left.withColumn("_side", F.lit(1)).withColumn("_ts", F.col(left_ts))
    rt = right.select(
        F.col(by),
        F.col(right_ts).alias("_ts"),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
    ).withColumn("_side", F.lit(0))

    merged = lt.unionByName(rt, allowMissingColumns=True)
    # right rows sort before left rows at equal timestamps (_side 0 < 1),
    # so a right row AT the left timestamp is visible to it ("<=")
    w = (
        W.partitionBy(by)
        .orderBy("_ts", "_side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = merged.select(
        "*",
        *[
            F.last(f"{c}{suffix}", ignorenulls=True).over(w).alias(f"_carry_{c}")
            for c in value_cols
        ],
    )
    out = carried.filter(F.col("_side") == 1).select(
        *[F.col(c) for c in left.columns],
        *[F.col(f"_carry_{c}").alias(f"{c}{suffix}") for c in value_cols],
    )
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_s: float = 0.0,
    upper_s: float = 900.0,
    suffix: str = "_right",
) -> DataFrame:
    """Pairs (l, r) with same ``by`` key and
    ``l.ts - upper <= r.ts <= l.ts - lower``. Bucketed equi-join: bucket
    width = window span, each left row probes 2 buckets."""
    span = max(upper_s - lower_s, 1e-9)
    rb = (F.unix_micros(F.col(right_ts)) / 1e6 / span).cast("long")
    # matching right rows live in [bucket(l.ts - upper), bucket(l.ts - lower)]
    # — at most two adjacent buckets since the window span == bucket width
    blo = ((F.unix_micros(F.col(left_ts)) - F.lit(int(upper_s * 1e6))) / 1e6 / span).cast("long")
    bhi = ((F.unix_micros(F.col(left_ts)) - F.lit(int(lower_s * 1e6))) / 1e6 / span).cast("long")

    lt = left.withColumn("_bucket", F.explode(F.array_distinct(F.array(blo, bhi))))
    rt = right.withColumn("_bucket", rb).select(
        F.col(by).alias("_by_r"),
        F.col(right_ts).alias("_ts_r"),
        *[F.col(c).alias(f"{c}{suffix}") for c in right.columns if c not in (by, right_ts)],
        F.col("_bucket"),
    )

    lo = F.unix_micros(F.col(left_ts)) - F.lit(int(upper_s * 1e6))
    hi = F.unix_micros(F.col(left_ts)) - F.lit(int(lower_s * 1e6))
    joined = lt.join(
        rt,
        (F.col(by) == F.col("_by_r"))
        & (lt["_bucket"] == rt["_bucket"])
        & (F.unix_micros(F.col("_ts_r")) >= lo)
        & (F.unix_micros(F.col("_ts_r")) <= hi),
    )
    return joined.drop("_bucket", "_by_r").dropDuplicates()


def register_queries(register) -> None:
    @register(
        "asof_join_events",
        """
        WITH clicks AS (
          SELECT user_id, ts, value FROM events WHERE event_type = 'click'),
        purchases AS (
          SELECT user_id, ts, event_id, value FROM events
          WHERE event_type = 'purchase')
        SELECT p.event_id,
               p.user_id,
               c.value AS click_value_right
        FROM purchases p
        ASOF LEFT JOIN clicks c
          ON p.user_id = c.user_id AND p.ts >= c.ts
        ORDER BY p.event_id
        """,
        doc="as-of join: each purchase matched to the user's latest preceding "
            "click (union + last-ignorenulls window — one shuffle, no UDF)",
        tags=("temporal", "capability"),
    )
    def asof_join_events(spark, sf_dir):
        from ..queries import load

        ev = load(spark, sf_dir, "events")
        clicks = ev.filter(F.col("event_type") == "click").select(
            "user_id", "ts", F.col("value").alias("click_value")
        )
        purchases = ev.filter(F.col("event_type") == "purchase").select(
            "user_id", "ts", "event_id", "value"
        )
        out = asof_join(purchases, clicks, by="user_id", value_cols=["click_value"])
        return out.select("event_id", "user_id", "click_value_right").orderBy("event_id")

    @register(
        "range_join_events",
        """
        SELECT a.event_id AS view_id, b.event_id AS click_id
        FROM events a JOIN events b
          ON a.user_id = b.user_id
         AND a.event_type = 'view' AND b.event_type = 'click'
         AND b.ts >= a.ts
         AND b.ts <= a.ts + INTERVAL 5 MINUTE
        WHERE a.user_id < 10
        ORDER BY view_id, click_id
        """,
        doc="event-time range join (clicks within 5 min after a view), bucketed "
            "equi-join instead of an unbounded inequality join",
        tags=("temporal", "capability"),
    )
    def range_join_events(spark, sf_dir):
        from ..queries import load

        ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 10)
        views = ev.filter(F.col("event_type") == "view").select(
            "user_id", "ts", F.col("event_id").alias("view_id")
        )
        clicks = ev.filter(F.col("event_type") == "click").select(
            "user_id", "ts", F.col("event_id").alias("click_id")
        )
        # pairs with click.ts in [view.ts, view.ts + 5 min]: lower=-300,upper=0
        # in the (l.ts - upper <= r.ts <= l.ts - lower) formulation
        out = range_join(
            views, clicks, by="user_id", lower_s=-300.0, upper_s=0.0
        )
        return out.select(
            "view_id", F.col("click_id_right").alias("click_id")
        ).orderBy("view_id", "click_id")
