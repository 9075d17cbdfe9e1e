"""Concurrent write-path smoke: parallel writers on one table must not
lose rows, corrupt the WAL, or double-flush."""

import json
import threading

US = 1_000_000
T0 = 1_700_000_000 * US


def test_parallel_writers_single_table(engine):
    errors = []

    def _writer(tid):
        try:
            for i in range(50):
                engine.write(
                    "conc",
                    {"t": tid, "i": i},
                    record_id=f"w{tid}-{i:03d}",
                    timestamp_us=T0,
                )
        except Exception as exc:  # pragma: no cover
            errors.append(exc)

    threads = [threading.Thread(target=_writer, args=(t,)) for t in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    engine.flush()
    rows = json.loads(engine.query("SELECT count(*) AS n FROM conc"))
    assert rows[0]["n"] == 200
    dedup = json.loads(engine.query("SELECT count(DISTINCT id) AS n FROM conc"))
    assert dedup[0]["n"] == 200


def test_concurrent_write_and_delete(engine):
    for i in range(20):
        engine.write("cd", {"i": i}, record_id=f"r{i}", timestamp_us=T0)
    engine.flush()

    results = {}

    def _deleter():
        results["deleted"] = sum(engine.delete("cd", f"r{i}") for i in range(0, 20, 2))

    def _writer():
        for i in range(20, 30):
            engine.write("cd", {"i": i}, record_id=f"r{i}", timestamp_us=T0)

    td, tw = threading.Thread(target=_deleter), threading.Thread(target=_writer)
    td.start(); tw.start(); td.join(); tw.join()
    engine.flush()
    assert results["deleted"] == 10
    n = json.loads(engine.query("SELECT count(*) AS n FROM cd"))[0]["n"]
    assert n == 20  # 20 original - 10 deleted + 10 new
