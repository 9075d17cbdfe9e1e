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


@settings(max_examples=8, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=72),    # hour offset
            st.sampled_from(["a", "b", "c"]),          # key
            st.integers(min_value=-100, max_value=100),  # value
        ),
        min_size=1, max_size=60,
    ),
    cut=st.integers(min_value=0, max_value=60),
)
def test_rollup_merge_partials_equals_batch_recompute(_spark, events, cut):
    """Continuous-rollup algebra (streaming/rollup.py::merge_partials):
    for ANY event set and ANY split into two micro-batches — including
    splits that send late data into already-merged windows — folding
    the two batch partials sequentially equals the single-pass
    aggregate of everything. (The streaming e2e test pins the sink
    wiring; this pins the merge algebra itself.)"""
    import datetime

    from pyspark.sql import functions as F

    from miniodb_spark.streaming.rollup import batch_partials, merge_partials

    t0 = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)
    rows = [(t0 + datetime.timedelta(hours=h), k, float(v))
            for h, k, v in events]
    schema = "ts timestamp, k string, value double"
    cut = min(cut, len(rows))
    b1, b2 = rows[:cut], rows[cut:]

    def partial(rs):
        if not rs:
            return None
        return batch_partials(_spark.createDataFrame(rs, schema),
                              ts_col="ts", value_col="value",
                              window="1 hour", key_cols=("k",))

    state = None
    for rs in (b1, b2):
        p = partial(rs)
        if p is None:
            continue
        if state is None:
            state = p.collect()
        else:
            # re-shape accumulated state as the persisted table the sink
            # reads back (timestamp column = window start)
            persisted = _spark.createDataFrame(
                [(r["window_start"], r["k"], r["n"], r["value_sum"],
                  r["value_min"], r["value_max"]) for r in state],
                "timestamp timestamp, k string, n long, value_sum double, "
                "value_min double, value_max double")
            merged = merge_partials(persisted, p, ("k",)).collect()
            untouched = {(r["window_start"], r["k"]): r for r in state}
            for r in merged:
                untouched.pop((r["window_start"], r["k"]), None)
            state = list(untouched.values()) + merged

    got = {(r["window_start"], r["k"]):
           (r["n"], r["value_sum"], r["value_min"], r["value_max"])
           for r in (state or [])}
    want = {
        (r["window_start"], r["k"]):
            (r["n"], r["value_sum"], r["value_min"], r["value_max"])
        for r in batch_partials(
            _spark.createDataFrame(rows, schema), ts_col="ts",
            value_col="value", window="1 hour", key_cols=("k",)).collect()
    }
    assert set(got) == set(want)
    for key in want:
        gn, gs, glo, ghi = got[key]
        wn, ws, wlo, whi = want[key]
        assert (gn, glo, ghi) == (wn, wlo, whi), (key, got[key], want[key])
        assert abs(gs - ws) < 1e-9, (key, gs, ws)


@settings(max_examples=4, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(
    batches=st.lists(
        st.tuples(
            st.lists(
                st.tuples(
                    st.integers(min_value=0, max_value=5),   # hour
                    st.sampled_from(["a", "b", None]),       # key (+NULL)
                    st.integers(min_value=-9, max_value=9),  # value
                ),
                min_size=0, max_size=5,
            ),
            st.sampled_from(["ok", "after_upsert", "mid_upsert"]),
        ),
        min_size=1, max_size=3,
    ),
)
def test_rollup_restart_recovery_any_crash_point(_spark, batches):
    """Restart-recovery property (r12 verdict #7): for ANY batch
    sequence and ANY crash schedule — a crash after the rollup upsert
    committed but before the batch marker, or MID-upsert between the
    merged ingest and the old-version sweep — replaying the crashed
    batch (what Structured Streaming does, same batch_id) converges to
    exactly the single-pass aggregate of all events. This is the
    last_batch_id stamp's contract: without it, every after_upsert
    crash double-adds its batch on replay."""
    import datetime
    import shutil
    import tempfile

    from miniodb_spark import mutations as mut
    from miniodb_spark.engine import Engine
    from miniodb_spark.streaming.rollup import (
        apply_rollup_batch, batch_partials, read_rollup,
    )

    t0 = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)
    schema = "ts timestamp, k string, value double"

    def df_of(rows):
        return _spark.createDataFrame(
            [(t0 + datetime.timedelta(hours=h), k, float(v))
             for h, k, v in rows], schema)

    store = tempfile.mkdtemp(prefix="rollup_prop_")
    real_commit = type(None)
    try:
        eng = Engine(_spark, store)
        eng.create_table("agg_p")
        all_rows = []
        for bid, (rows, crash) in enumerate(batches):
            all_rows.extend(rows)
            bdf = df_of(rows)
            kw = dict(ts_col="ts", value_col="value", window="1 hour",
                      key_cols=("k",), batch_id=bid, stream_id="rp")
            if crash == "after_upsert" and rows:
                # upsert lands, marker write dies -> replay same batch
                real = eng.catalog.commit_stream_batch
                eng.catalog.commit_stream_batch = lambda *a: (
                    (_ for _ in ()).throw(RuntimeError("crash")))
                try:
                    with pytest.raises(RuntimeError):
                        apply_rollup_batch(eng, "agg_p", bdf, **kw)
                finally:
                    eng.catalog.commit_stream_batch = real
                apply_rollup_batch(eng, "agg_p", df_of(rows), **kw)
            elif crash == "mid_upsert" and rows:
                # merged generation ingested, old-version sweep dies ->
                # two visible versions of touched ids until the replay
                real_dr = mut.delete_rows
                def dying(*a, **k):
                    raise RuntimeError("crash mid-upsert")
                mut.delete_rows = dying
                try:
                    with pytest.raises(RuntimeError):
                        apply_rollup_batch(eng, "agg_p", bdf, **kw)
                finally:
                    mut.delete_rows = real_dr
                apply_rollup_batch(eng, "agg_p", df_of(rows), **kw)
            else:
                apply_rollup_batch(eng, "agg_p", bdf, **kw)
            # a spurious extra replay (marker already written) is a no-op
            assert apply_rollup_batch(eng, "agg_p", df_of(rows), **kw) \
                is False

        got_df = read_rollup(eng, "agg_p", key_cols=("k",))
        got = {} if got_df is None else {
            (r["window_start"], r["k"]):
                (r["n"], r["value_sum"], r["value_min"], r["value_max"])
            for r in got_df.collect()
        }
        if all_rows:
            want = {
                (r["window_start"], r["k"]):
                    (r["n"], r["value_sum"], r["value_min"],
                     r["value_max"])
                for r in batch_partials(
                    df_of(all_rows), ts_col="ts", value_col="value",
                    window="1 hour", key_cols=("k",)).collect()
            }
        else:
            want = {}
        assert got == want, (got, want)
    finally:
        shutil.rmtree(store, ignore_errors=True)
