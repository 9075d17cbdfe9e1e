"""End-to-end engine slice: write → flush → hybrid query → mutate.

Mirrors the reference's canonical users/orders example
(/root/reference/docs/SOLUTION.md:817-849) per FIXTURES.md §A.
"""

import json

import pytest

from miniodb_spark.gate import SQLGateError

US = 1_000_000
DAY = 86_400 * US
T0 = 1_700_000_000 * US  # 2023-11-14 UTC


def _seed_users(engine, n=30):
    for i in range(n):
        engine.write(
            "users",
            {"name": f"user {i}", "age": 18 + (i % 50), "city": f"city{i % 5}"},
            record_id=f"user-{i:03d}",
            timestamp_us=T0 + (i % 7) * DAY,
        )


def test_write_flush_query_roundtrip(engine):
    _seed_users(engine)
    engine.flush()
    out = json.loads(
        engine.query(
            "SELECT id, name, age FROM users WHERE id = 'user-003' AND age > 20"
        )
    )
    assert out == [{"id": "user-003", "name": "user 3", "age": 21}]


def test_hybrid_query_sees_unflushed_rows(engine):
    _seed_users(engine, n=5)
    engine.flush()
    engine.write("users", {"name": "fresh", "age": 99}, record_id="user-new",
                 timestamp_us=T0)
    # no flush — the buffer union must make it visible
    out = json.loads(engine.query("SELECT id FROM users WHERE age = 99"))
    assert out == [{"id": "user-new"}]


def test_ragged_schema_union(engine):
    engine.write("ev", {"kind": "a", "value": 1}, record_id="e1", timestamp_us=T0)
    engine.flush()
    engine.write("ev", {"kind": "b", "score": 2.5, "ok": True}, record_id="e2",
                 timestamp_us=T0 + DAY)
    engine.flush()
    rows = json.loads(engine.query("SELECT id, kind, value, score, ok FROM ev"))
    by_id = {r["id"]: r for r in rows}
    assert by_id["e1"]["value"] == 1 and "score" not in by_id["e1"]  # null dropped by toJSON
    assert by_id["e2"]["ok"] is True


def test_column_sanitization_on_write(engine):
    engine.write(
        "dyn",
        {"1bad": 7, "中文-key": "v", "id": "payload-id"},
        record_id="r1",
        timestamp_us=T0,
    )
    engine.flush()
    rows = json.loads(engine.query('SELECT id, id_2, _1bad FROM dyn'))
    assert rows == [{"id": "r1", "id_2": "payload-id", "_1bad": 7}]


def test_delete_and_update(engine):
    _seed_users(engine, n=10)
    engine.flush()
    assert engine.delete("users", "user-004") == 1
    rows = json.loads(engine.query("SELECT count(*) AS n FROM users"))
    assert rows[0]["n"] == 9

    engine.update("users", "user-005", {"name": "renamed", "age": 41},
                  timestamp_us=T0)
    engine.flush()
    rows = json.loads(engine.query("SELECT name, age FROM users WHERE id='user-005'"))
    assert rows == [{"name": "renamed", "age": 41}]
    rows = json.loads(engine.query("SELECT count(*) AS n FROM users"))
    assert rows[0]["n"] == 9


def test_cleanup_empty_ids(engine):
    engine.write("t1", {"v": 1}, record_id="keep", timestamp_us=T0)
    # '_' placeholder: simulate empty-id write via direct buffer row
    from miniodb_spark.buffer import BufferRow

    engine._buffer_for("t1").add(BufferRow("_", T0, "t1", {"v": 2}))
    engine.flush()
    assert engine.cleanup_empty_id_records("t1") == 1
    rows = json.loads(engine.query("SELECT id FROM t1"))
    assert rows == [{"id": "keep"}]


def test_query_gate_enforced(engine):
    _seed_users(engine, n=2)
    with pytest.raises(SQLGateError):
        engine.query("DROP TABLE users")
    with pytest.raises(SQLGateError):
        engine.query("SELECT * FROM users; SELECT 1")
    with pytest.raises(SQLGateError):
        engine.query("SELECT * FROM nosuchtable")


def test_limit_injection_and_stream_query(engine):
    _seed_users(engine, n=25)
    engine.flush()
    rows = json.loads(engine.query("SELECT id FROM users", limit=7))
    assert len(rows) == 7
    batch, cursor, more = engine.stream_query("SELECT id FROM users ORDER BY id",
                                              batch_size=10)
    assert len(batch) == 10 and cursor == 10 and more
    batch2, cursor2, more2 = engine.stream_query(
        "SELECT id FROM users ORDER BY id", batch_size=10, cursor=cursor
    )
    assert len(batch2) == 10 and batch2[0]["id"] == "user-010"
    batch3, _, more3 = engine.stream_query(
        "SELECT id FROM users ORDER BY id", batch_size=10, cursor=cursor2
    )
    assert len(batch3) == 5 and not more3


def test_result_cache_roundtrip(engine):
    _seed_users(engine, n=5)
    engine.flush()
    sql = "SELECT city, count(*) AS n FROM users GROUP BY city ORDER BY city"
    a = engine.query(sql)
    assert engine.cache.hits == 0
    b = engine.query(sql)
    assert engine.cache.hits == 1
    assert a == b
    engine.write("users", {"name": "x", "age": 1}, record_id="user-zzz",
                 timestamp_us=T0)
    assert engine.query(sql) is not None
    # write invalidated the cache: second run recomputed (hits unchanged)
    assert engine.cache.hits == 1


def test_dt_partition_layout(engine, tmp_path):
    _seed_users(engine, n=10)
    engine.flush()
    import os

    gen_dir = os.path.join(engine.root, "users", "gen=0")
    parts = sorted(d for d in os.listdir(gen_dir) if d.startswith("dt="))
    assert len(parts) == 7  # seeded across 7 distinct days, one schema generation


def test_unbounded_query_is_capped_and_signals_truncation(spark, tmp_path):
    from miniodb_spark.engine import Engine

    eng = Engine(spark, str(tmp_path / "capstore"), max_result_rows=10)
    _seed_users(eng, n=25)
    eng.flush()
    res = eng.query_full("SELECT id FROM users")
    assert len(json.loads(res.json)) == 10
    assert res.truncated
    assert eng.query_stats["truncated"] == 1
    # a query with its own LIMIT under the cap is untouched
    res = eng.query_full("SELECT id FROM users LIMIT 3")
    assert len(json.loads(res.json)) == 3 and not res.truncated
    # the flag travels with the cache entry: a cache-hit of the capped
    # query must still report truncated (the old engine-level attribute
    # was skipped on the hit path and raced across threads). The query
    # needs medium complexity to be cache-worthy.
    cached_sql = "SELECT id FROM users GROUP BY id ORDER BY id"
    first = eng.query_full(cached_sql)
    assert first.truncated
    hits_before = eng.cache.hits
    res = eng.query_full(cached_sql)
    assert eng.cache.hits == hits_before + 1 and res.truncated


def test_stream_query_never_collects_full_result(spark, tmp_path):
    from miniodb_spark.engine import Engine

    # cap far below the table size: stream_query must still page through
    # everything because it iterates instead of collecting
    eng = Engine(spark, str(tmp_path / "iterstore"), max_result_rows=5)
    _seed_users(eng, n=30)
    eng.flush()
    seen, cursor, more = [], 0, True
    while more:
        batch, cursor, more = eng.stream_query(
            "SELECT id FROM users ORDER BY id", batch_size=12, cursor=cursor
        )
        seen.extend(r["id"] for r in batch)
    assert len(seen) == 30 and seen == sorted(seen)


def test_unflushed_rows_visible_after_restart_without_write(spark, tmp_path):
    """Boot-time WAL replay: rows acked before a crash must be queryable
    on the restarted engine immediately — not only after the next write
    recreates the buffer."""
    from miniodb_spark.engine import Engine

    root = str(tmp_path / "restart_store")
    eng = Engine(spark, root)
    eng.write("t", {"v": 1}, record_id="flushed", timestamp_us=T0)
    eng.flush()
    eng.write("t", {"v": 2}, record_id="acked_unflushed", timestamp_us=T0)
    # no flush: row lives only in buffer + WAL. Simulate crash+restart.
    eng2 = Engine(spark, root)
    rows = json.loads(eng2.query("SELECT id FROM t ORDER BY id"))
    assert [r["id"] for r in rows] == ["acked_unflushed", "flushed"]


def test_complex_types_survive_generation_schema_roundtrip(engine, spark):
    """Bulk DataFrame ingest records generation-schema type names via
    simpleString(); the explicit-schema read must parse complex names
    (array<double>, struct<...>, decimal(p,s)) back to real types — an
    embedding column that comes back as string breaks every derived
    serving index (found by the round-11 staleness-contract tests)."""
    import datetime

    ts = datetime.datetime.fromtimestamp(T0 / US, datetime.timezone.utc)
    df = spark.createDataFrame(
        [("a", [1.0, 2.0], {"k": 1}, ts)],
        "id string, emb array<double>, props struct<k:long>, "
        "timestamp timestamp",
    )
    engine.ingest_dataframe("cx", df)
    out = engine.read_persisted("cx")
    got = {f.name: f.dataType.simpleString() for f in out.schema.fields}
    assert got["emb"] == "array<double>", got
    assert got["props"] == "struct<k:bigint>", got
    row = out.select("emb", "props").first()
    assert row["emb"] == [1.0, 2.0] and row["props"]["k"] == 1


def test_query_with_keyword_bearing_literals(engine):
    """r16 end-to-end pin for the extractor/gate literal-blanking: a
    legitimate query whose string literals contain FROM/JOIN/comment
    tokens must answer normally — previously `'... FROM ghost'`
    fabricated a table reference (SQLGateError: table not found) and
    `'a -- b'` truncated the line at the comment stripper (no table
    referenced)."""
    _seed_users(engine)
    out = json.loads(engine.query(
        "SELECT 'copied FROM ghost' AS note, id FROM users "
        "WHERE id = 'user-001'"))
    assert out == [{"note": "copied FROM ghost", "id": "user-001"}]
    out2 = json.loads(engine.query(
        "SELECT 'a -- b' AS x, count(*) AS n FROM users"))
    assert out2[0]["x"] == "a -- b" and out2[0]["n"] >= 1
    out3 = json.loads(engine.query(
        "SELECT id FROM users WHERE id = 'user-001' "
        "AND 'JOIN x' = 'JOIN x'"))
    assert [r["id"] for r in out3] == ["user-001"]
