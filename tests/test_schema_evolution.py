"""Schema generations: cross-file type divergence must never break
reads (the reference delegates this to DuckDB union_by_name coercion;
we model it as catalog-tracked generations — SURVEY §7 risk 1)."""

import json
import os

from miniodb_spark.catalog import merge_type

US = 1_000_000
T0 = 1_700_000_000 * US


def test_merge_type_rules():
    assert merge_type("long", "long") == "long"
    assert merge_type("long", "double") == "double"
    assert merge_type("double", "long") == "double"
    assert merge_type("long", "string") == "string"
    assert merge_type("boolean", "long") == "string"


def test_additive_columns_stay_one_generation(engine):
    engine.write("t", {"a": 1}, record_id="r1", timestamp_us=T0)
    engine.flush()
    engine.write("t", {"a": 2, "b": "x"}, record_id="r2", timestamp_us=T0)
    engine.flush()
    assert len(engine.catalog.gen_schemas("t")) == 1
    rows = json.loads(engine.query("SELECT id, a, b FROM t ORDER BY id"))
    assert rows == [{"id": "r1", "a": 1}, {"id": "r2", "a": 2, "b": "x"}]


def test_long_to_double_conflict_reads_as_double(engine):
    engine.write("t", {"x": 5}, record_id="a", timestamp_us=T0)
    engine.flush()
    engine.write("t", {"x": 2.5}, record_id="b", timestamp_us=T0)
    engine.flush()
    gens = engine.catalog.gen_schemas("t")
    assert len(gens) == 2
    assert gens[0]["x"] == "long" and gens[1]["x"] == "double"
    assert engine.catalog.schema_of("t")["x"] == "double"
    rows = json.loads(engine.query("SELECT id, x FROM t ORDER BY id"))
    assert rows == [{"id": "a", "x": 5.0}, {"id": "b", "x": 2.5}]


def test_type_to_string_conflict(engine):
    engine.write("t", {"x": 5}, record_id="a", timestamp_us=T0)
    engine.flush()
    engine.write("t", {"x": True}, record_id="b", timestamp_us=T0)
    engine.flush()
    assert engine.catalog.schema_of("t")["x"] == "string"
    rows = json.loads(engine.query("SELECT id, x FROM t ORDER BY id"))
    assert rows == [{"id": "a", "x": "5"}, {"id": "b", "x": "true"}]


def test_delete_across_generations(engine):
    engine.write("t", {"x": 5}, record_id="a", timestamp_us=T0)
    engine.write("t", {"x": 6}, record_id="kill", timestamp_us=T0)
    engine.flush()
    engine.write("t", {"x": 2.5}, record_id="kill", timestamp_us=T0)
    engine.flush()
    # 'kill' exists in gen 0 (long) and gen 1 (double)
    assert engine.delete("t", "kill") == 2
    rows = json.loads(engine.query("SELECT id, x FROM t"))
    assert rows == [{"id": "a", "x": 5.0}]


def test_repeated_deletes_no_duplicates(engine):
    for i in range(4):
        engine.write("t", {"v": i}, record_id=f"r{i}", timestamp_us=T0)
    engine.flush()
    assert engine.delete("t", "r0") == 1
    assert engine.delete("t", "r1") == 1  # second rewrite of the same partition
    rows = json.loads(engine.query("SELECT id FROM t ORDER BY id"))
    assert [r["id"] for r in rows] == ["r2", "r3"]


def test_buffer_type_conflict_with_persisted(engine):
    engine.write("t", {"x": 5}, record_id="a", timestamp_us=T0)
    engine.flush()
    engine.write("t", {"x": 2.5}, record_id="b", timestamp_us=T0)  # unflushed
    rows = json.loads(engine.query("SELECT id, x FROM t ORDER BY id"))
    assert rows == [{"id": "a", "x": 5.0}, {"id": "b", "x": 2.5}]


def test_catalog_survives_restart(engine, spark):
    from miniodb_spark.engine import Engine

    engine.write("t", {"x": 5}, record_id="a", timestamp_us=T0)
    engine.flush()
    engine.write("t", {"x": 2.5}, record_id="b", timestamp_us=T0)
    engine.flush()
    reopened = Engine(spark, engine.root)
    assert reopened.catalog.schema_of("t")["x"] == "double"
    rows = json.loads(reopened.query("SELECT count(*) AS n FROM t"))
    assert rows[0]["n"] == 2
