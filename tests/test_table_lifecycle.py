"""Table lifecycle durability: DeleteTable must stay deleted.

The reference's DeleteTable removes the table's data, metadata AND its
buffer/WAL state (internal/service/table_management_service.go); boot
replay then has nothing to resurrect. These tests pin the same contract
on the Spark engine: once DeleteTable is acked, neither a restart nor a
later write to the same table name may bring back pre-delete rows.
"""

import json
import os

from miniodb_spark.engine import Engine
from miniodb_spark.gate import SQLGateError

US = 1_000_000
T0 = 1_700_000_000 * US  # 2023-11-14 UTC


def _wal_dir(eng):
    return os.path.join(eng.meta_root, "_system", "wal")


def _wal_files(eng, table):
    d = _wal_dir(eng)
    if not os.path.isdir(d):
        return []
    return sorted(fn for fn in os.listdir(d) if fn.startswith(table + ".wal"))


def test_delete_table_removes_wal_files(spark, tmp_path):
    eng = Engine(spark, str(tmp_path / "store"))
    for i in range(5):
        eng.write("t", {"v": i}, record_id=f"r{i}", timestamp_us=T0)
    # rows are unflushed: they live only in buffer + WAL
    assert _wal_files(eng, "t")
    assert eng.delete_table("t")
    assert _wal_files(eng, "t") == []
    assert "t" not in eng.list_tables()


def test_deleted_table_stays_gone_after_restart(spark, tmp_path):
    """The acked-DeleteTable-undone-on-restart bug: leftover WAL files
    made boot replay re-create the dropped table (via ensure_table) with
    its unflushed pre-delete rows replayed and queryable."""
    root = str(tmp_path / "store")
    eng = Engine(spark, root)
    eng.write("t", {"v": 1}, record_id="flushed", timestamp_us=T0)
    eng.flush()
    eng.write("t", {"v": 2}, record_id="unflushed", timestamp_us=T0)
    assert eng.delete_table("t")

    eng2 = Engine(spark, root)
    assert "t" not in eng2.list_tables()
    try:
        eng2.query("SELECT id FROM t")
        raise AssertionError("deleted table was resurrected by boot replay")
    except SQLGateError:
        pass


def test_write_after_delete_does_not_revive_old_rows(spark, tmp_path):
    """In-session variant: the next write to a deleted table's name opens
    a fresh WriteBuffer on the same WAL path — a leftover log would
    replay the pre-delete rows into the new buffer."""
    eng = Engine(spark, str(tmp_path / "store"))
    for i in range(3):
        eng.write("t", {"v": i}, record_id=f"old{i}", timestamp_us=T0)
    assert eng.delete_table("t")
    eng.write("t", {"v": 99}, record_id="new0", timestamp_us=T0)
    rows = json.loads(eng.query("SELECT id FROM t ORDER BY id"))
    assert [r["id"] for r in rows] == ["new0"]


def test_interrupted_delete_is_healed_at_boot(spark, tmp_path):
    """Crash window inside delete_table: catalog drop committed but the
    WAL files were not yet removed. The catalog is the source of truth —
    boot must finish the cleanup, not resurrect the table."""
    root = str(tmp_path / "store")
    eng = Engine(spark, root)
    eng.write("t", {"v": 1}, record_id="r0", timestamp_us=T0)
    # simulate the partial delete: drop the catalog entry + buffer, but
    # leave the WAL file on disk exactly as a mid-delete crash would
    buf = eng._buffers.pop("t")
    buf.wal.close()
    eng.catalog.drop_table("t")
    assert _wal_files(eng, "t")

    eng2 = Engine(spark, root)
    assert "t" not in eng2.list_tables()
    assert _wal_files(eng2, "t") == []  # stale log garbage-collected


def test_sealed_segment_only_wal_replays_at_boot(spark, tmp_path):
    """Crash between segment-seal (os.replace → .segNNNNNN) and the
    active-file reopen leaves ONLY sealed segments on disk. The boot
    scan must still nominate the table for replay — acked-durable rows
    may never become invisible."""
    root = str(tmp_path / "store")
    eng = Engine(spark, root)
    eng.write("t", {"v": 1}, record_id="sealed_row", timestamp_us=T0)
    buf = eng._buffers.pop("t")
    buf.wal.close()
    wal_path = os.path.join(_wal_dir(eng), "t.wal")
    os.replace(wal_path, wal_path + ".seg000000")  # the crash window

    eng2 = Engine(spark, root)
    rows = json.loads(eng2.query("SELECT id FROM t"))
    assert [r["id"] for r in rows] == ["sealed_row"]
