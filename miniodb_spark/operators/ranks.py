"""Distributed tie-aware midranks: the scale backbone for rank
statistics (Mann-Whitney U, Spearman rho, Kruskal-Wallis H).

The naive formulation ranks every fact row with a global-order window
(``rank() OVER (ORDER BY value)``), which Spark executes as ONE task —
a single-partition sort of the whole input. Correct, but the exact
shape that dies at 100 TB. The reference has no rank statistics at all
(its aggregation surface is DuckDB's, minIODB internal/query); these
stats are part of the analytics extension, so the distributed
formulation is ours to choose.

This module implements the classical decomposition:

1. **Per-value count table.** ``groupBy(value).count()`` collapses the
   fact table to its distinct-value domain — one map-side-combinable
   shuffle, the only pass over facts. Every rank statistic we ship is
   a function of per-value counts, so ranks never need to be joined
   back to fact rows.
2. **Explicit range buckets.** Approximate equi-depth split points
   over the value domain (one ``percentile_approx`` action collecting
   at most ``parts - 1`` scalars) become *literals* in the main plan;
   bucket id is then a pure map-side function of the value. Explicit
   literal bounds — rather than ``repartitionByRange`` +
   ``spark_partition_id()`` — make bucket assignment deterministic by
   construction: correctness cannot depend on whether Catalyst reuses
   the range exchange between plan branches (column pruning can
   otherwise specialize the two consumers into *different* exchanges,
   each re-sampling its own boundaries).
3. **Per-bucket prefix sum.** ``sum(t) OVER (PARTITION BY bucket
   ORDER BY value)`` — every window task sees ~|domain|/parts rows;
   no empty partition spec anywhere (plan-gated in
   tests/test_plans.py).
4. **Cross-bucket offsets as one broadcast row.** Bucket totals are
   conditional sums pivoted into a single row (the repo's established
   1-row-stat crossJoin pattern) and the offset for bucket *i* is a
   literal CASE expression summing buckets ``< i`` — at most
   ``parts`` terms, resolved at plan time. No tiny single-task window,
   no driver round-trip beyond the bounds action.

The *doubled* midrank ``mr2(v) = 2 * |{rows < v}| + t_v + 1`` (twice
the conventional midrank) is an exact BIGINT, so every downstream
moment can be summed in integer/decimal arithmetic with no float
accumulation-order hazard — the same trick the oracle SQL uses with
``2*rank() + count(*) OVER (PARTITION BY value) - 1`` (identities:
``rank = |{rows < v}| + 1``).

Cost model at scale: one fact pass for the count table, one bounded
action over the (much smaller) domain table for bounds, one hash
shuffle of the domain table on bucket id, one 1-row broadcast. The
largest single task is O(|domain| / parts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

__all__ = ["doubled_midranks"]

_MAX_PARTS = 64


def doubled_midranks(
    per_value: DataFrame,
    value_col: str,
    t_col: str = "t",
    parts: int | None = None,
) -> DataFrame:
    """Append exact doubled midranks to a per-value count table.

    ``per_value`` must have one row per distinct value: ``value_col``
    (numeric, non-null) and ``t_col`` (count of fact rows at that
    value). Any other columns are carried through untouched. Returns
    the same rows plus ``mr2 = 2 * cum_less + t + 1`` as BIGINT, where
    ``cum_less`` is the number of fact rows with a strictly smaller
    value.

    ``parts`` bounds both the bucket fan-out and the CASE-expression
    width; defaults to ``spark.sql.shuffle.partitions`` capped at 64.
    """
    spark = per_value.sparkSession
    if parts is None:
        parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    parts = max(1, min(int(parts), _MAX_PARTS))

    t = F.col(t_col).cast("bigint")

    bounds: list = []
    if parts > 1:
        qs = [i / parts for i in range(1, parts)]
        row = per_value.agg(
            F.percentile_approx(value_col, qs, 10_000).alias("b")
        ).first()
        raw = row["b"] or []
        # dedupe (skewed domains repeat split points) but keep order
        bounds = sorted(set(b for b in raw if b is not None))

    if bounds:
        barr = F.array(*[F.lit(b) for b in bounds])
        pid = F.size(F.filter(barr, lambda b: b < F.col(value_col)))
    else:
        pid = F.lit(0)
    nb = len(bounds) + 1

    pv = per_value.withColumn("_pid", pid)

    # per-bucket inclusive prefix sum — partition spec is never empty
    w = (
        W.partitionBy("_pid")
        .orderBy(value_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    pv = pv.withColumn("_lcum", F.sum(t).over(w))

    # bucket totals pivoted into ONE row (map-side-combinable agg over
    # the domain table), broadcast; offsets become a literal CASE
    tot = per_value.withColumn("_pid", pid).agg(
        *[
            F.sum(F.when(F.col("_pid") == i, t).otherwise(F.lit(0)))
            .cast("bigint")
            .alias(f"_bt{i}")
            for i in range(nb)
        ]
    )
    off = F.lit(0).cast("bigint")
    if nb > 1:
        case = F.when(F.col("_pid") == 0, F.lit(0).cast("bigint"))
        run = None
        for i in range(1, nb):
            term = F.coalesce(F.col(f"_bt{i - 1}"), F.lit(0))
            run = term if run is None else (run + term)
            case = case.when(F.col("_pid") == i, run)
        off = case

    out = pv.crossJoin(F.broadcast(tot))  # 1-row stats, not a data join
    cum_less = off + F.col("_lcum") - t
    out = out.withColumn("mr2", (2 * cum_less + t + 1).cast("bigint"))
    drop = ["_pid", "_lcum"] + [f"_bt{i}" for i in range(nb)]
    return out.drop(*drop)
