"""Randomized mutation soak (FIXTURES.md §A4): a sequence of
write/update/delete operations applied both to the engine and to a
plain Python dict model; final states must agree exactly. Exercises
buffer removal, tombstones, partition rewrite, update semantics, and
hybrid reads under interleaved flushes."""

import json
import random

from miniodb_spark.catalog import TableConfig

US = 1_000_000
DAY = 86_400 * US
T0 = 1_700_000_000 * US


def test_randomized_mutations_match_model(engine):
    rng = random.Random(42)
    engine.create_table("m", TableConfig(name="m", buffer_size=10_000))
    model: dict[str, dict] = {}

    ids = [f"id{i:03d}" for i in range(40)]
    for step in range(200):
        op = rng.random()
        rid = rng.choice(ids)
        ts = T0 + rng.randrange(5) * DAY
        if op < 0.55:  # write (new id or re-insert after delete)
            if rid not in model:
                payload = {"v": rng.randrange(1000), "grp": rng.choice("abc")}
                engine.write("m", payload, record_id=rid, timestamp_us=ts)
                model[rid] = payload
        elif op < 0.8:  # update
            if rid in model:
                payload = {"v": rng.randrange(1000), "grp": rng.choice("abc")}
                engine.update("m", rid, payload, timestamp_us=ts)
                model[rid] = payload
        else:  # delete
            if rid in model:
                n = engine.delete("m", rid)
                assert n >= 1, f"step {step}: delete {rid} removed nothing"
                del model[rid]
        if rng.random() < 0.15:
            engine.flush("m")
    engine.flush("m")

    rows = json.loads(engine.query("SELECT id, v, grp FROM m"))
    got = {r["id"]: {"v": r["v"], "grp": r["grp"]} for r in rows}
    assert len(rows) == len(got), "duplicate ids in result"
    assert got == model

    # aggregate view agrees too
    agg = json.loads(
        engine.query("SELECT grp, count(*) AS n FROM m GROUP BY grp ORDER BY grp")
    )
    from collections import Counter

    expected = Counter(v["grp"] for v in model.values())
    assert {r["grp"]: r["n"] for r in agg} == dict(expected)


def test_compression_config_applied(engine, tmp_path):
    import os

    engine.create_table("z", TableConfig(name="z", compression="zstd"))
    for i in range(3):
        engine.write("z", {"v": "x" * 500}, record_id=f"r{i}", timestamp_us=T0)
    engine.flush()
    files = []
    for root, _, fns in os.walk(os.path.join(engine.root, "z")):
        files += [f for f in fns if f.endswith(".parquet")]
    assert files and all(".zstd." in f or "zstd" in f for f in files), files
    rows = json.loads(engine.query("SELECT count(*) AS n FROM z"))
    assert rows[0]["n"] == 3
