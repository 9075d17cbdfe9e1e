import pytest

from miniodb_spark.buffer import WAL, BufferRow, WriteBuffer
from miniodb_spark.cache import QueryResultCache, cache_key, normalize_sql
from miniodb_spark.idgen import IDGenerator, resolve_id


def test_normalize_sql_preserves_literals():
    a = normalize_sql("SELECT  *   FROM Users WHERE name = 'John  DOE'")
    assert a == "select * from users where name = 'John  DOE'"
    assert "''" in normalize_sql("select 'it''s'")


def test_cache_key_stable_under_formatting():
    k1 = cache_key("SELECT * FROM users", ["users"])
    k2 = cache_key("select   *  from USERS", ["users"])
    assert k1 == k2


def test_cache_hit_and_invalidation():
    c = QueryResultCache(ttl_s=60)
    c.put("select * from t", ["t"], "[1]")
    assert c.get("select * from t", ["t"]) == "[1]"
    assert c.invalidate_table("t") == 1
    assert c.get("select * from t", ["t"]) is None


def test_cache_lru_eviction():
    c = QueryResultCache(max_entries=2)
    c.put("q1", ["t"], 1)
    c.put("q2", ["t"], 2)
    c.put("q3", ["t"], 3)
    assert c.get("q1", ["t"]) is None
    assert c.get("q3", ["t"]) == 3


def test_idgen_strategies():
    g = IDGenerator(node_id=3)
    u = g.generate("uuid")
    assert len(u) == 36
    s1, s2 = int(g.generate("snowflake")), int(g.generate("snowflake"))
    assert s2 > s1
    assert g.generate("custom", "ord-") == "ord-000000000001"
    assert resolve_id("abc", "uuid", True, g) == "abc"
    with pytest.raises(ValueError):
        resolve_id(None, "user_provided", True, g)
    with pytest.raises(ValueError):
        resolve_id("bad id!", "uuid", True, g)


def test_wal_replay_and_tombstone(tmp_path):
    wal_path = str(tmp_path / "t.wal")
    buf = WriteBuffer(wal_path, buffer_size=100)
    buf.add(BufferRow("a", 1_000_000, "t", {"x": 1}))
    buf.add(BufferRow("b", 2_000_000, "t", {"x": 2}))
    buf.remove("t", "a")
    buf.wal.close()

    recovered = WriteBuffer(wal_path, buffer_size=100)
    ids = [r.id for r in recovered.rows_for("t")]
    assert ids == ["b"]


def test_wal_corrupt_tail_dropped(tmp_path):
    wal_path = str(tmp_path / "t.wal")
    buf = WriteBuffer(wal_path, buffer_size=100)
    buf.add(BufferRow("a", 1_000_000, "t", {"x": 1}))
    buf.wal.close()
    with open(wal_path, "a") as fh:
        fh.write('{"seq":99,"type":"insert","payload":{}}\t123\n')  # bad crc
    recs = WAL.replay(wal_path)
    assert len(recs) == 1 and recs[0]["payload"]["id"] == "a"


def test_buffer_size_trigger(tmp_path):
    buf = WriteBuffer(str(tmp_path / "t.wal"), buffer_size=2)
    assert buf.add(BufferRow("a", 1, "t", {})) is False
    assert buf.add(BufferRow("b", 2, "t", {})) is True
