"""Skew mitigation: salted joins and two-phase aggregation.

AQE's skew-join splitting (on by default in our session) handles most
sort-merge skew at runtime; explicit salting remains the right tool
when (a) a shuffled join key has a few pathological heavy hitters and
the other side is small enough to replicate per salt but too big to
broadcast, or (b) a groupBy key is so hot that even partial
aggregation leaves one reducer with most of the data (non-algebraic
aggs like collect_list).

``salted_join``: the skewed (big) side gets a random salt in
[0, salts); the small side is exploded ×salts; the join key becomes
(key, salt) — the heavy key's rows spread over ``salts`` reducers.
``two_phase_agg``: groupBy((key, salt)) partial → groupBy(key) final.
Both are pure DataFrame compositions, results identical to the
unsalted plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted and the small side replicated
    ×``salts``. Output columns = big's ∪ small's (minus the duplicate
    key), exactly like ``big.join(small, on, how)``."""
    salted_big = big.withColumn("_salt", (F.rand(seed=7) * salts).cast("int"))
    replicated_small = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salts)]))
    )
    out = salted_big.join(replicated_small, on=[on, "_salt"], how=how)
    return out.drop("_salt")


def two_phase_agg(
    df: DataFrame,
    key: str,
    agg_col: str,
    salts: int = 8,
) -> DataFrame:
    """Skew-safe count+sum per key: partial agg on (key, salt), final agg
    on key. Returns (key, n, total)."""
    salted = df.withColumn("_salt", (F.rand(seed=7) * salts).cast("int"))
    partial = salted.groupBy(key, "_salt").agg(
        F.count("*").alias("_n"), F.sum(agg_col).alias("_s")
    )
    return partial.groupBy(key).agg(
        F.sum("_n").cast("long").alias("n"), F.sum("_s").alias("total")
    )
