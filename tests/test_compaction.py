"""Tiered compaction tests (reference internal/compaction/manager_test.go:
classify-by-tier, candidate selection, merge correctness)."""

import json
import os

from miniodb_spark.compaction import (
    MAX_FILES_PER_RUN,
    MB,
    compact_table,
    file_tier,
    plan_table,
)

US = 1_000_000
DAY = 86_400 * US
T0 = 1_700_000_000 * US


def test_file_tier_classification():
    assert file_tier(1 * MB) == 0
    assert file_tier(16 * MB) == 1
    assert file_tier(63 * MB) == 1
    assert file_tier(200 * MB) == 2
    assert file_tier(512 * MB) == 3
    assert file_tier(2048 * MB) == 4  # beyond L3: untouched


def _count_parquet(table_dir):
    n = 0
    for root, _, files in os.walk(table_dir):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


def test_compaction_merges_small_files(engine):
    # 8 separate flushes → 8 small L0 files in one dt partition
    for i in range(8):
        engine.write("t", {"v": i}, record_id=f"r{i}", timestamp_us=T0)
        engine.flush("t")
    table_dir = os.path.join(engine.root, "t")
    before = _count_parquet(table_dir)
    assert before == 8

    plans = plan_table(table_dir)
    assert len(plans) == 1 and plans[0].tier == 0 and len(plans[0].files) == 8

    stats = compact_table(engine.spark, table_dir)
    assert stats[0]["inputs"] == 8 and stats[0]["outputs"] == 1
    assert _count_parquet(table_dir) == 1

    # data survives losslessly (no schema collapse)
    rows = json.loads(engine.query("SELECT id, v FROM t"))
    assert sorted(r["v"] for r in rows) == list(range(8))


def test_compaction_respects_min_files(engine):
    for i in range(3):  # below the L0 threshold of 5
        engine.write("t2", {"v": i}, record_id=f"r{i}", timestamp_us=T0)
        engine.flush("t2")
    table_dir = os.path.join(engine.root, "t2")
    assert plan_table(table_dir) == []


def test_compaction_partition_isolation(engine):
    # 5 files in day A, 1 in day B → only day A compacts
    for i in range(5):
        engine.write("t3", {"v": i}, record_id=f"a{i}", timestamp_us=T0)
        engine.flush("t3")
    engine.write("t3", {"v": 99}, record_id="b0", timestamp_us=T0 + DAY)
    engine.flush("t3")
    table_dir = os.path.join(engine.root, "t3")
    plans = plan_table(table_dir)
    assert len(plans) == 1
    assert "dt=" in plans[0].partition_dir
    compact_table(engine.spark, table_dir)
    rows = json.loads(engine.query("SELECT count(*) AS n FROM t3"))
    assert rows[0]["n"] == 6


def test_compaction_caps_files_per_run(engine, tmp_path):
    for i in range(25):
        engine.write("t4", {"v": i}, record_id=f"r{i}", timestamp_us=T0)
        engine.flush("t4")
    plans = plan_table(os.path.join(engine.root, "t4"))
    assert len(plans[0].files) == MAX_FILES_PER_RUN


def test_compaction_with_zorder_clusters_rewrite(engine):
    """compact_table(zorder_by=...) is the OPTIMIZE-ZORDER analog: the
    rewritten partition is Morton-clustered, losslessly."""
    import random

    rng = random.Random(7)
    for i in range(6):
        for j in range(40):
            engine.write("zt", {"u": rng.randint(0, 1000),
                                "m": rng.randint(0, 1000)},
                         record_id=f"r{i}-{j}", timestamp_us=T0)
        engine.flush("zt")
    table_dir = os.path.join(engine.root, "zt")
    assert _count_parquet(table_dir) == 6

    stats = compact_table(engine.spark, table_dir, zorder_by=["u", "m"])
    assert stats and stats[0]["inputs"] == 6
    # lossless
    rows = json.loads(engine.query("SELECT id, u, m FROM zt LIMIT 500"))
    assert len(rows) == 240
    # missing zorder columns are skipped, not fatal
    for i in range(5):
        engine.write("zt2", {"v": i}, record_id=f"s{i}", timestamp_us=T0)
        engine.flush("zt2")
    stats2 = compact_table(engine.spark, os.path.join(engine.root, "zt2"),
                           zorder_by=["nonexistent_col"])
    assert stats2[0]["outputs"] >= 1
    rows2 = json.loads(engine.query("SELECT v FROM zt2"))
    assert len(rows2) == 5


def test_engine_compact_invalidates_cache_and_rest_route(engine):
    """Engine.compact is the maintenance entry point: it must refuse
    unknown tables, rewrite files, and invalidate cached results whose
    inputs it rewrote; the REST route exposes it."""
    import json as _json
    import urllib.request

    import pytest as _pytest

    from miniodb_spark.api import MiniODBService
    from miniodb_spark.rest import RestServer

    with _pytest.raises(ValueError, match="no such table"):
        engine.compact("ghost")

    for i in range(6):
        engine.write("ec", {"v": i}, record_id=f"r{i}", timestamp_us=T0)
        engine.flush("ec")
    # populate the cache, then compact — the cached entry must not be
    # served from files that no longer exist
    first = engine.query("SELECT count(*) AS n FROM ec")
    stats = engine.compact("ec")
    assert stats and stats[0]["inputs"] == 6
    assert engine.query("SELECT count(*) AS n FROM ec") == first

    svc = MiniODBService(engine)
    srv = RestServer(svc, port=0).serve_background()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/v1/tables/ec/optimize",
            data=_json.dumps({"zorder_by": ["v"]}).encode(),
            headers={"Content-Type": "application/json"})
        out = _json.loads(urllib.request.urlopen(req).read())
        assert out["success"] is True  # nothing left to merge is still ok
    finally:
        srv.shutdown()
