"""Dynamic schema rules (reference concurrent_buffer.go:521-655)."""

from pyspark.sql import types as T

from miniodb_spark.schema import (
    infer_batch_schema,
    infer_spark_type,
    resolve_field_names,
    sanitize_column_name,
)


def test_sanitize():
    assert sanitize_column_name("Name") == "name"
    assert sanitize_column_name("1bad") == "_1bad"
    assert sanitize_column_name("中文-key") == "___key"
    assert sanitize_column_name("") == "_col"
    assert sanitize_column_name("a b.c") == "a_b_c"


def test_system_column_collision_gets_suffix():
    mapping = resolve_field_names(["id", "name"])
    assert mapping["id"] == "id_2"
    assert mapping["name"] == "name"


def test_collision_between_fields_deterministic():
    mapping = resolve_field_names(["a b", "a_b", "a.b"])
    # sorted order: "a b", "a.b", "a_b" → a_b, a_b_2, a_b_3
    assert mapping["a b"] == "a_b"
    assert mapping["a.b"] == "a_b_2"
    assert mapping["a_b"] == "a_b_3"


def test_type_inference():
    assert isinstance(infer_spark_type(True), T.BooleanType)
    assert isinstance(infer_spark_type(3), T.LongType)
    assert isinstance(infer_spark_type(3.5), T.DoubleType)
    assert isinstance(infer_spark_type("s"), T.StringType)
    assert isinstance(infer_spark_type({"a": 1}), T.StringType)
    assert isinstance(infer_spark_type([1, 2]), T.StringType)


def test_batch_schema_union_and_first_seen_type():
    rows = [
        {"id": "a", "timestamp": 1, "table_name": "t", "fields": {"x": 1, "y": "s"}},
        {"id": "b", "timestamp": 2, "table_name": "t", "fields": {"x": 2.5, "z": True}},
    ]
    schema, mapping = infer_batch_schema(rows)
    names = [f.name for f in schema.fields]
    assert names[:3] == ["id", "timestamp", "table_name"]
    assert set(names[3:]) == {"x", "y", "z"}
    by_name = {f.name: f.dataType for f in schema.fields}
    assert isinstance(by_name["x"], T.LongType)  # first-seen value wins
    assert isinstance(by_name["y"], T.StringType)
    assert isinstance(by_name["z"], T.BooleanType)


def test_all_null_column_is_string():
    rows = [{"id": "a", "timestamp": 1, "table_name": "t", "fields": {"v": None}}]
    schema, _ = infer_batch_schema(rows)
    assert isinstance(schema["v"].dataType, T.StringType)
