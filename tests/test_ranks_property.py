"""Property tests for the distributed tie-aware midrank backbone
(operators/ranks.py::doubled_midranks) — the scale path behind
mann_whitney_u / spearman_rank_corr / kruskal_wallis_test.

The invariant: for ANY multiset of values and ANY bucket fan-out,
mr2(v) == 2 * rank(v) + t(v) - 1 where rank is the standard
competition rank (1 + #rows strictly smaller) over the underlying
fact rows — i.e. the distributed bucketed-prefix-sum formulation is
value-for-value identical to a naive single-pass ranking.
"""

from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _naive_mr2(values: list[int]) -> dict[int, int]:
    cnt = Counter(values)
    out = {}
    for v, t in cnt.items():
        less = sum(c for u, c in cnt.items() if u < v)
        out[v] = 2 * less + t + 1
    return out


@pytest.fixture(scope="module")
def _spark(spark):
    return spark


@settings(max_examples=12, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(
    values=st.lists(st.integers(min_value=-50, max_value=50),
                    min_size=1, max_size=120),
    parts=st.sampled_from([1, 2, 3, 7, 64]),
)
def test_doubled_midranks_match_naive(_spark, values, parts):
    from pyspark.sql import functions as F

    from miniodb_spark.operators.ranks import doubled_midranks

    df = _spark.createDataFrame([(v,) for v in values], "value long")
    per_value = df.groupBy("value").agg(
        F.count("*").cast("bigint").alias("t"))
    got = {
        r["value"]: r["mr2"]
        for r in doubled_midranks(per_value, "value", parts=parts).collect()
    }
    assert got == _naive_mr2(values)


def test_doubled_midranks_carries_extra_columns(spark):
    """Extra columns on the per-value table (the group-count columns the
    rank stats carry) must survive untouched."""
    from pyspark.sql import functions as F

    from miniodb_spark.operators.ranks import doubled_midranks

    df = spark.createDataFrame(
        [(1, 3, 1), (2, 1, 0), (2, 2, 2), (5, 1, 1)],
        "value long, t long, n1 long",
    )
    per_value = df.groupBy("value").agg(
        F.sum("t").cast("bigint").alias("t"),
        F.sum("n1").cast("bigint").alias("n1"))
    out = {r["value"]: (r["t"], r["n1"], r["mr2"])
           for r in doubled_midranks(per_value, "value", parts=3).collect()}
    # values: 1 (t=3), 2 (t=3), 5 (t=1) -> mr2: 2*0+3+1=4, 2*3+3+1=10, 2*6+1+1=14
    assert out == {1: (3, 1, 4), 2: (3, 2, 10), 5: (1, 1, 14)}
