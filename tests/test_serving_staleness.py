"""Serving-index staleness contract (round-10 verdict task 3): derived
ANN serving tables must detect base-table mutations. The reference's
query cache invalidates per table on every write
(internal/query/query_cache.go:364-397); miniodb_spark.serving extends
that nonce contract to write_bucketed / write_ivf / write_ivfpq
artifacts, with probe-side raise-or-warn and a rebuild helper."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from miniodb_spark.operators import similarity as sim
from miniodb_spark.serving import (
    StaleServingIndexError,
    check_index,
    index_meta,
    rebuild_index,
)

US = 1_000_000
T0 = 1_700_000_000 * US


def _vec(seed, dim=8):
    return [float((seed * 31 + i * 7) % 13) - 6.0 for i in range(dim)]


def _ingest_vectors(engine, table, n=40):
    import datetime

    ts = datetime.datetime.fromtimestamp(T0 / US, datetime.timezone.utc)
    rows = [Row(id=f"v{i}", vec_id=i, embedding=_vec(i), timestamp=ts)
            for i in range(n)]
    df = engine.spark.createDataFrame(rows)
    engine.merge_upsert(table, df, key_col="id", ts_col="timestamp")


@pytest.fixture()
def vec_engine(engine):
    _ingest_vectors(engine, "vecs")
    return engine


def test_fresh_index_probes_clean(vec_engine, tmp_path):
    path = str(tmp_path / "idx_bucketed")
    df = vec_engine.read_persisted("vecs")
    sim.write_bucketed(df, path, bits=4,
                       source=vec_engine.index_source("vecs"))
    meta = index_meta(vec_engine.spark, path)
    assert meta is not None and meta["table"] == "vecs"
    assert meta["version"] is not None  # ingest bumped the nonce
    out = sim.probe_bucketed(vec_engine.spark, path, _vec(1), k=3, bits=4)
    assert out.count() == 3


def test_unstamped_index_has_no_contract(vec_engine, tmp_path):
    path = str(tmp_path / "idx_plain")
    sim.write_bucketed(vec_engine.read_persisted("vecs"), path, bits=4)
    assert index_meta(vec_engine.spark, path) is None
    # base mutates; the unstamped index still probes (legacy behavior)
    vec_engine.update("vecs", "v1", {"vec_id": 1, "embedding": _vec(99)},
                      timestamp_us=T0 + US)
    assert sim.probe_bucketed(
        vec_engine.spark, path, _vec(1), k=3, bits=4).count() == 3


def test_mutate_probe_rebuild_loop_bucketed(vec_engine, tmp_path):
    spark = vec_engine.spark
    path = str(tmp_path / "idx")
    sim.write_bucketed(vec_engine.read_persisted("vecs"), path, bits=4,
                       source=vec_engine.index_source("vecs"))
    # 1. mutate the base table -> nonce moves
    _ingest_vectors(vec_engine, "vecs", n=45)
    # 2. probe raises by default...
    with pytest.raises(StaleServingIndexError, match="vecs"):
        sim.probe_bucketed(spark, path, _vec(1), k=3, bits=4)
    # ...or warns when asked to degrade gracefully
    with pytest.warns(UserWarning, match="stale"):
        out = sim.probe_bucketed(spark, path, _vec(1), k=3, bits=4,
                                 on_stale="warn")
        assert out.count() == 3
    # 3. rebuild from the current table state -> fresh again
    rebuild_index(vec_engine, "vecs", path, kind="bucketed", bits=4)
    out = sim.probe_bucketed(spark, path, _vec(44), k=3, bits=4)
    assert out.count() == 3
    # the rebuilt index covers the upserted rows
    full = spark.read.parquet(path)
    assert full.filter(F.col("vec_id") == 44).count() == 1


def test_delete_also_staleness_bumps(vec_engine, tmp_path):
    path = str(tmp_path / "idx_del")
    sim.write_bucketed(vec_engine.read_persisted("vecs"), path, bits=4,
                       source=vec_engine.index_source("vecs"))
    vec_engine.delete("vecs", "v3")
    with pytest.raises(StaleServingIndexError):
        check_index(vec_engine.spark, path)


def test_ivf_and_ivfpq_stamp_and_rebuild(vec_engine, tmp_path):
    spark = vec_engine.spark
    ivf_path = str(tmp_path / "ivf")
    pq_path = str(tmp_path / "ivfpq")
    df = vec_engine.read_persisted("vecs")
    src = vec_engine.index_source("vecs")
    ivf = sim.IVFIndex(n_cells=4).fit(df)
    sim.write_ivf(df, ivf, ivf_path, source=src)
    pq = sim.IVFPQIndex(n_cells=4, m=4, k=8).fit(df)
    sim.write_ivfpq(df, pq, pq_path, source=src)
    assert sim.probe_ivf(spark, ivf_path, ivf, _vec(2), k=3).count() == 3
    assert sim.probe_ivfpq(spark, pq_path, pq, _vec(2), k=3).count() == 3

    vec_engine.update("vecs", "v2", {"vec_id": 2, "embedding": _vec(77)},
                      timestamp_us=T0 + US)
    with pytest.raises(StaleServingIndexError):
        sim.probe_ivf(spark, ivf_path, ivf, _vec(2), k=3)
    with pytest.raises(StaleServingIndexError):
        sim.probe_ivfpq(spark, pq_path, pq, _vec(2), k=3)

    # rebuild retrains (centroids must reflect the current corpus) and
    # returns the new index object for probing
    ivf2 = rebuild_index(vec_engine, "vecs", ivf_path, kind="ivf",
                         n_cells=4)
    pq2 = rebuild_index(vec_engine, "vecs", pq_path, kind="ivfpq",
                        n_cells=4, m=4, k=8)
    assert sim.probe_ivf(spark, ivf_path, ivf2, _vec(2), k=3).count() == 3
    assert sim.probe_ivfpq(spark, pq_path, pq2, _vec(2), k=3).count() == 3


def test_cross_engine_staleness_visible(vec_engine, tmp_path, spark):
    """Two drivers over one store root: driver B's upsert makes driver
    A's index stale — the nonce lives on the SHARED root, not in-process
    (same property the SQL cache test suite pins for results)."""
    from miniodb_spark.engine import Engine

    path = str(tmp_path / "idx_x")
    sim.write_bucketed(vec_engine.read_persisted("vecs"), path, bits=4,
                       source=vec_engine.index_source("vecs"))
    other = Engine(spark, vec_engine.root)
    other.update("vecs", "v5", {"vec_id": 5, "embedding": _vec(55)},
                 timestamp_us=T0 + US)
    with pytest.raises(StaleServingIndexError):
        sim.probe_bucketed(spark, path, _vec(1), k=3, bits=4)


def test_row_api_update_keeps_embedding_typed(vec_engine):
    """Round-13 regression: a row-API update of an embedding row must
    land PERSISTED as a real array<double> — not a JSON string. The
    durable-update re-insert goes through the flush-path shaping, whose
    default stringifies lists; one string-typed generation would merge
    the cumulative column type to string and poison every typed
    consumer (ANN fit/probe). Also pins the upgrade durable update
    brings: the rebuild corpus INCLUDES the just-updated vector (the
    old buffered re-insert was invisible to read_persisted, so a
    rebuild silently trained without it)."""
    import pyspark.sql.types as T

    vec_engine.update("vecs", "v2", {"vec_id": 2, "embedding": _vec(77)},
                      timestamp_us=T0 + US)
    df = vec_engine.read_persisted("vecs")
    dt = df.schema["embedding"].dataType
    assert isinstance(dt, T.ArrayType) and isinstance(
        dt.elementType, T.DoubleType
    ), dt
    got = df.filter(F.col("id") == "v2").select("embedding").collect()
    assert len(got) == 1 and got[0][0] == _vec(77)
