"""HLL/CMS parity tests, modeled on the reference's suite
(/root/reference/internal/query/approximation_test.go): cardinality
within error bound, mergeability, CMS no-underestimate guarantee."""

import numpy as np
import pytest

from miniodb_spark.sketches import (
    ApproximateQueryEngine,
    CountMinSketch,
    HyperLogLog,
    build_cms,
    build_hll,
)


def _hashes(n, seed=0):
    """Uniform full-range 64-bit hashes (xxhash64-shaped: all 64 bits live)."""
    rng = np.random.RandomState(seed)
    return rng.randint(
        np.iinfo(np.int64).min, np.iinfo(np.int64).max, size=n, dtype=np.int64
    ).view(np.uint64)


def test_hll_accuracy_10k():
    hll = HyperLogLog(12)
    hll.add_hashes(_hashes(10_000))
    est = hll.estimate()
    assert abs(est - 10_000) / 10_000 < 3 * hll.error_bound


def test_hll_small_range_exactish():
    hll = HyperLogLog(12)
    hll.add_hashes(_hashes(100))
    assert abs(hll.estimate() - 100) < 5


def test_hll_merge_equals_union():
    a, b = HyperLogLog(12), HyperLogLog(12)
    h1, h2 = _hashes(5000, 1), _hashes(5000, 2)
    a.add_hashes(h1)
    b.add_hashes(h2)
    union = HyperLogLog(12)
    union.add_hashes(np.concatenate([h1, h2]))
    a.merge(b)
    assert a.estimate() == pytest.approx(union.estimate())


def test_hll_duplicates_dont_inflate():
    hll = HyperLogLog(12)
    h = _hashes(1000)
    for _ in range(5):
        hll.add_hashes(h)
    assert abs(hll.estimate() - 1000) / 1000 < 0.05


def test_hll_serde():
    hll = HyperLogLog(10)
    hll.add_hashes(_hashes(1000))
    back = HyperLogLog.from_bytes(hll.to_bytes())
    assert back.estimate() == pytest.approx(hll.estimate())


def test_hll_precision_bounds():
    with pytest.raises(ValueError):
        HyperLogLog(3)
    with pytest.raises(ValueError):
        HyperLogLog(17)


def test_cms_never_underestimates():
    cms = CountMinSketch(1000, 5)
    h = _hashes(2000)
    counts = np.random.RandomState(7).randint(1, 50, size=2000).astype(np.int64)
    cms.add_hashes(h, counts)
    for i in range(0, 2000, 97):
        assert cms.query_hash(int(h[i])) >= int(counts[i])


def test_cms_overestimate_bounded():
    cms = CountMinSketch(1000, 5)
    h = _hashes(500)
    cms.add_hashes(h)
    over = [cms.query_hash(int(x)) - 1 for x in h[:100]]
    # ε = e/width; error ≤ ε·N with prob 1-e^-depth
    assert max(over) <= cms.epsilon * cms.total + 1


def test_cms_merge():
    a = CountMinSketch(100, 4, seed=9)
    b = CountMinSketch(100, 4, seed=9)
    h = _hashes(50)
    a.add_hashes(h)
    b.add_hashes(h)
    a.merge(b)
    assert a.query_hash(int(h[0])) >= 2
    with pytest.raises(ValueError):
        a.merge(CountMinSketch(101, 4, seed=9))


def test_cms_serde():
    cms = CountMinSketch(64, 3, seed=5)
    cms.add_hashes(_hashes(100))
    back = CountMinSketch.from_bytes(cms.to_bytes())
    assert np.array_equal(back.table, cms.table)
    assert back.total == cms.total


# ---- distributed builders ------------------------------------------------


def test_build_hll_distributed(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    exact = ev.select("user_id").distinct().count()
    hll = build_hll(ev, "user_id")
    assert abs(hll.estimate() - exact) / exact < 3 * hll.error_bound


def test_build_cms_distributed(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    cms = build_cms(ev, "event_type")
    from miniodb_spark.sketches import value_hash

    exact = ev.filter(ev.event_type == "click").count()
    est = cms.query_hash(value_hash("click"))
    assert est >= exact
    assert est <= exact + cms.epsilon * cms.total + 1


def test_registry_roundtrip(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    eng = ApproximateQueryEngine()
    eng.update_from_dataframe("events", ev, ["user_id", "event_type"])
    exact_users = ev.select("user_id").distinct().count()
    assert abs(eng.cardinality("events", "user_id") - exact_users) / exact_users < 0.05
    assert eng.frequency("events", "event_type", "view") > 0
    merged = eng.merged_cardinality([("events", "user_id"), ("events", "event_type")])
    assert merged >= exact_users


def test_registry_persistence_roundtrip(spark, sf_dir, tmp_path):
    """Sketch registry persisted to the shared-store KV: a fresh engine
    (a restarted or different driver) loads identical estimates; loading
    with merge unions the states."""
    from miniodb_spark.fs import LocalFS
    from miniodb_spark.kv import FileKV

    kv = FileKV(LocalFS(), str(tmp_path / "sketches"))
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    a = ApproximateQueryEngine()
    a.update_from_dataframe("events", ev, ["user_id", "event_type"])
    assert a.save(kv) == 7  # hll+cms+mg x2 cols + qd for the numeric one

    # restart: a fresh registry loads identical estimates
    b = ApproximateQueryEngine()
    assert b.load(kv, [("events", "user_id"), ("events", "event_type")]) == 2
    assert b.cardinality("events", "user_id") == a.cardinality("events", "user_id")
    assert (b.frequency("events", "event_type", "click")
            == a.frequency("events", "event_type", "click"))
    # missing keys are skipped without error
    assert b.load(kv, [("nope", "col")]) == 0

    # cross-driver merge: driver C sketched a disjoint id range; after
    # C.save + B.load(merge=True) B's estimate covers the union
    lo = ev.filter(ev.user_id < 5)
    hi = ev.filter(ev.user_id >= 5)
    exact_union = ev.select("user_id").distinct().count()
    c = ApproximateQueryEngine()
    c.update_from_dataframe("events2", lo, ["user_id"])
    c.save(kv)
    d = ApproximateQueryEngine()
    d.update_from_dataframe("events2", hi, ["user_id"])
    d.load(kv, [("events2", "user_id")], merge=True)
    est = d.cardinality("events2", "user_id")
    assert abs(est - exact_union) / exact_union < 0.1


def test_engine_approx_surface_cross_driver(spark, tmp_path, sf_dir):
    """Engine-level approximate queries: sketches built through engine A
    are answerable from engine B on the same root (persisted registry),
    and estimates track exact values."""
    from miniodb_spark.engine import Engine

    root = str(tmp_path / "store")
    a = Engine(spark, root)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    a.ingest_dataframe("ev", ev.selectExpr(
        "CAST(event_id AS STRING) AS id", "ts AS timestamp",
        "user_id", "event_type"))
    a.refresh_sketches("ev", ["user_id", "event_type"])

    exact_users = ev.select("user_id").distinct().count()
    est = a.approx_cardinality("ev", "user_id")
    assert abs(est - exact_users) / exact_users < 0.1

    b = Engine(spark, root)  # fresh driver, no in-memory sketches
    est_b = b.approx_cardinality("ev", "user_id")
    assert est_b == est
    exact_clicks = ev.filter(ev.event_type == "click").count()
    assert b.approx_frequency("ev", "event_type", "click") >= exact_clicks

    import pytest as _pytest
    with _pytest.raises(KeyError):
        b.approx_cardinality("ev", "never_sketched")


def test_misra_gries_guarantee_and_merge(spark):
    from collections import Counter

    from miniodb_spark.sketches import MisraGries, build_mg

    # skewed stream: value i appears 2^i times for i in 0..9
    stream = []
    for i in range(10):
        stream += [f"v{i}"] * (2 ** i)
    exact = Counter(stream)

    mg = MisraGries(k=4)
    mg.add_values(list(exact.keys()), list(exact.values()))
    d = mg.decrements
    assert d > 0  # pruning happened (10 values, 4 counters)
    for v, c in mg.counters.items():
        assert 0 < c <= exact[v]
        assert exact[v] - c <= d
    for v in exact:
        if v not in mg.counters:
            assert exact[v] <= d
    # the top hitters survive
    assert "v9" in mg.counters and "v8" in mg.counters

    # merge of two halves obeys the same guarantee with summed decrements
    a, b = MisraGries(k=4), MisraGries(k=4)
    a.add_values(list(exact.keys()), list(exact.values()))
    b.add_values(["v9", "w", "x", "y", "z"], [100, 60, 50, 40, 30])
    total = Counter(exact) + Counter({"v9": 100, "w": 60, "x": 50, "y": 40, "z": 30})
    a.merge(b)
    assert a.total == sum(total.values())
    for v, c in a.counters.items():
        assert c <= total[v] and total[v] - c <= a.decrements

    # distributed build agrees with the guarantee on a real column
    df = spark.createDataFrame([(v,) for v in stream], "val string").repartition(8)
    mg2 = build_mg(df, "val", k=4)
    assert mg2.total == len(stream)
    for v, c in mg2.counters.items():
        assert c <= exact[v] and exact[v] - c <= mg2.decrements


def test_misra_gries_serialization_roundtrip():
    from miniodb_spark.sketches import MisraGries

    mg = MisraGries(k=3)
    mg.add_values(["a", "b", "c", "d"], [5, 4, 3, 2])
    back = MisraGries.from_bytes(mg.to_bytes())
    assert back.counters == mg.counters
    assert back.decrements == mg.decrements
    assert back.total == mg.total


def _assert_digest_guarantees(qd, sorted_vals, qs=(0.05, 0.25, 0.5, 0.75, 0.95)):
    import numpy as np

    n = len(sorted_vals)
    half_max = qd.rank_error_bound() / 2 + 1e-12
    for q in qs:
        est = qd.quantile(q)
        lb, ub = qd.rank_bracket(est)
        slb, _ = qd.rank_bracket(est, strict=True)
        exact_le = np.searchsorted(sorted_vals, est, side="right") / n
        assert lb - 1e-12 <= exact_le <= ub + 1e-12, (q, lb, exact_le, ub)
        assert slb - half_max <= q <= ub + 1e-12, (q, slb, ub, half_max)


def test_quantile_digest_bracket_guarantees_and_merge(spark):
    import numpy as np

    from miniodb_spark.sketches import QuantileDigest, build_qdigest

    # skewed data: deterministic quadratic-residue spread
    vals = np.array([(i * i) % 9973 for i in range(20000)], dtype=np.float64)
    qd = QuantileDigest(100)
    qd.add_values(vals)
    svals = np.sort(vals)
    _assert_digest_guarantees(qd, svals)

    # merge of two halves keeps the guarantees over the union
    a, b = QuantileDigest(100), QuantileDigest(100)
    a.add_values(vals[:10000])
    b.add_values(vals[10000:])
    a.merge(b)
    assert a.total == 20000
    _assert_digest_guarantees(a, svals, qs=(0.1, 0.5, 0.9))

    # serialization roundtrip + distributed build sanity
    back = QuantileDigest.from_bytes(qd.to_bytes())
    assert back.quantile(0.5) == qd.quantile(0.5)
    assert back.rank_bracket(back.quantile(0.5)) == qd.rank_bracket(qd.quantile(0.5))
    df = spark.createDataFrame([(float(v),) for v in vals[:2000]], "v double")
    dqd = build_qdigest(df.repartition(8), "v", 100)
    assert dqd.total == 2000
    _assert_digest_guarantees(dqd, np.sort(vals[:2000]), qs=(0.5,))


def test_quantile_digest_adversarial_ties_and_tail():
    """The review repro: half zeros + a Pareto tail, merged across 8
    partials — mean-sorted merging interleaves member ranks, which broke
    the old per-centroid-mass 'bound'. The bracket guarantees must hold
    anyway, and the bracket honestly reports the tie mass at v=0."""
    import numpy as np

    from miniodb_spark.sketches import QuantileDigest

    vals = np.concatenate(
        [np.zeros(10000), 1.0 / (1.0 - np.linspace(0, 0.999, 10000)) ** 1.5]
    )
    merged = QuantileDigest(100)
    for part in np.array_split(vals, 8):
        d = QuantileDigest(100)
        d.add_values(part)
        merged.merge(d)
    _assert_digest_guarantees(
        merged, np.sort(vals), qs=(0.05, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
    )
    lb, ub = merged.rank_bracket(0.0)
    assert lb <= 0.5 <= ub  # the tie mass is inside the bracket


def test_engine_topk_and_quantile_cross_driver(spark, tmp_path, sf_dir):
    from miniodb_spark.engine import Engine

    root = str(tmp_path / "store")
    a = Engine(spark, root)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    a.ingest_dataframe("ev", ev.selectExpr(
        "CAST(event_id AS STRING) AS id", "ts AS timestamp",
        "user_id", "event_type", "value"))
    a.refresh_sketches("ev", ["event_type", "value"])

    # MG: the true most-common event_type must be tracked (cardinality
    # is tiny, so MG is exact here) with the exact count as lower bound
    exact = {r["event_type"]: r["n"]
             for r in ev.groupBy("event_type").count()
             .withColumnRenamed("count", "n").collect()}
    top = a.approx_top_values("ev", "event_type", n=3)
    assert top[0][0] == max(exact, key=exact.get)
    assert 0 < top[0][1] <= exact[top[0][0]]

    # quantile digest on value: exact rank inside the provable bracket
    med = a.approx_quantile("ev", "value", 0.5)
    n = ev.filter(ev.value.isNotNull()).count()
    exact_le = ev.filter(ev.value <= med).count() / n
    qd = a.approx._qd[("ev", "value")]
    lb, ub = qd.rank_bracket(med)
    assert lb - 1e-12 <= exact_le <= ub + 1e-12

    # fresh driver answers both from the persisted registry
    b = Engine(spark, root)
    assert b.approx_top_values("ev", "event_type", n=1)[0] == top[0]
    assert b.approx_quantile("ev", "value", 0.5) == med


def test_failed_fallback_does_not_corrupt_live_sketches(spark, tmp_path, sf_dir):
    """Review repro: asking for a quantile on a non-numeric column used
    to KeyError AND double-merge the just-persisted hll/cms/mg copies
    into the live sketches via the load fallback; fill_missing loading
    must leave live counts untouched."""
    import pytest as _pytest

    from miniodb_spark.engine import Engine

    root = str(tmp_path / "store")
    a = Engine(spark, root)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    a.ingest_dataframe("ev", ev.selectExpr(
        "CAST(event_id AS STRING) AS id", "ts AS timestamp", "event_type"))
    a.refresh_sketches("ev", ["event_type"])
    before_freq = a.approx_frequency("ev", "event_type", "click")
    before_top = a.approx_top_values("ev", "event_type", n=3)

    with _pytest.raises(KeyError):
        a.approx_quantile("ev", "event_type", 0.5)  # no digest for strings

    assert a.approx_frequency("ev", "event_type", "click") == before_freq
    assert a.approx_top_values("ev", "event_type", n=3) == before_top


def test_repeated_refresh_does_not_double_counts(spark, tmp_path, sf_dir):
    """Review repro: refresh_sketches is a FULL-TABLE rebuild, so a
    second refresh on unchanged data must leave every estimate exactly
    where it was — merging the rebuild would double counts and persist
    the corruption."""
    from miniodb_spark.engine import Engine

    root = str(tmp_path / "store")
    a = Engine(spark, root)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    a.ingest_dataframe("ev", ev.selectExpr(
        "CAST(event_id AS STRING) AS id", "ts AS timestamp",
        "event_type", "value"))
    a.refresh_sketches("ev", ["event_type", "value"])
    freq1 = a.approx_frequency("ev", "event_type", "click")
    top1 = a.approx_top_values("ev", "event_type", n=3)
    med1 = a.approx_quantile("ev", "value", 0.5)
    total1 = a.approx._qd[("ev", "value")].total

    a.refresh_sketches("ev", ["event_type", "value"])  # unchanged table
    assert a.approx_frequency("ev", "event_type", "click") == freq1
    assert a.approx_top_values("ev", "event_type", n=3) == top1
    assert a.approx_quantile("ev", "value", 0.5) == med1
    assert a.approx._qd[("ev", "value")].total == total1

    # and the fallback-then-refresh sequence on a second driver
    b = Engine(spark, root)
    b.approx_frequency("ev", "event_type", "click")  # loads persisted
    b.refresh_sketches("ev", ["event_type"])         # rebuild, not merge
    assert b.approx_frequency("ev", "event_type", "click") == freq1


def test_mg_int_keys_survive_serialization_roundtrip():
    """Review repro: JSON coerces non-string counter keys to strings,
    so a round-trip used to change key identity and a post-reload
    merge double-counted 5 vs "5". add_values now coerces to str."""
    from miniodb_spark.sketches import MisraGries

    mg = MisraGries(k=8)
    mg.add_values([5, 7, 5], [3, 2, 1])
    assert set(mg.counters) == {"5", "7"}
    back = MisraGries.from_bytes(mg.to_bytes())
    assert back.counters == mg.counters
    back.merge(mg)
    assert back.counters["5"] == 2 * mg.counters["5"]
    assert len(back.counters) == 2


def test_registry_merge_with_pre_mg_persisted_state(spark, sf_dir, tmp_path):
    """Review repro: state loaded from a pre-MG persisted store holds
    hll/cms for a key but no mg/qd; a non-replace update must not
    KeyError mid-merge (which would leave partially-updated state) —
    the missing kinds are simply assigned."""
    from miniodb_spark.sketches import ApproximateQueryEngine

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    eng = ApproximateQueryEngine()
    eng.update_from_dataframe("events", ev, ["value"])
    # simulate pre-MG era state: hll/cms present, mg/qd absent
    del eng._mg[("events", "value")]
    del eng._qd[("events", "value")]
    eng.update_from_dataframe("events", ev, ["value"], replace=False)
    assert ("events", "value") in eng._mg
    assert ("events", "value") in eng._qd
    assert eng.quantile("events", "value", 0.5) is not None


def test_registry_merge_drops_stale_digest_on_dtype_change(spark):
    """Review repro: when a column is refreshed (replace=False) with a
    non-numeric dtype, the old-era QuantileDigest must stop serving —
    only the replace branch used to drop it."""
    from miniodb_spark.sketches import ApproximateQueryEngine

    num = spark.createDataFrame([(i, float(i)) for i in range(20)],
                                "id long, v double")
    txt = num.selectExpr("id", "CAST(v AS STRING) AS v")
    eng = ApproximateQueryEngine()
    eng.update_from_dataframe("t", num, ["v"])
    assert ("t", "v") in eng._qd
    eng.update_from_dataframe("t", txt, ["v"], replace=False)
    assert ("t", "v") not in eng._qd
    with pytest.raises(KeyError):
        eng.quantile("t", "v", 0.5)
