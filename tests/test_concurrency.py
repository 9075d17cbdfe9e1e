"""Write-path concurrency: concurrent writers + flusher + deleter must
neither lose acked rows nor resurrect deleted ones."""

import json
import threading

from miniodb_spark.engine import Engine

US = 1_000_000
T0 = 1_700_000_000 * US


def test_concurrent_writes_and_flushes(spark, tmp_path):
    eng = Engine(spark, str(tmp_path / "conc"))
    eng.create_table("t")
    n_threads, per_thread = 4, 50
    errs = []

    def writer(tid):
        try:
            for i in range(per_thread):
                eng.write("t", {"tid": tid, "i": i},
                          record_id=f"w{tid}_{i}", timestamp_us=T0)
                if i % 20 == 10:
                    eng.flush("t")
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=writer, args=(t,)) for t in range(n_threads)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    eng.flush("t")
    assert not errs
    n = json.loads(eng.query("SELECT count(*) AS n FROM t"))[0]["n"]
    assert n == n_threads * per_thread
    # all ids distinct (no duplicate flush of the same row)
    d = json.loads(eng.query("SELECT count(DISTINCT id) AS d FROM t"))[0]["d"]
    assert d == n


def test_delete_during_writes_stays_deleted(spark, tmp_path):
    eng = Engine(spark, str(tmp_path / "conc2"))
    eng.create_table("t")
    for i in range(30):
        eng.write("t", {"i": i}, record_id=f"r{i}", timestamp_us=T0)
    stop = threading.Event()

    def background_writer():
        j = 1000
        while not stop.is_set():
            eng.write("t", {"i": j}, record_id=f"bg{j}", timestamp_us=T0)
            j += 1

    th = threading.Thread(target=background_writer)
    th.start()
    try:
        for i in range(0, 30, 3):
            eng.delete("t", f"r{i}")
    finally:
        stop.set()
        th.join()
    eng.flush("t")
    rows = json.loads(eng.query(
        "SELECT id FROM t WHERE id LIKE 'r%' ORDER BY id", limit=100))
    ids = {r["id"] for r in rows}
    assert not any(f"r{i}" in ids for i in range(0, 30, 3))
    assert all(f"r{i}" in ids for i in range(30) if i % 3 != 0)
