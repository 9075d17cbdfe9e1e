"""Multi-format sources and sinks (capability upgrade: the reference is
parquet-only)."""

import json

from pyspark.sql import functions as F

US = 1_000_000
T0 = 1_700_000_000 * US


def _seed(engine, n=6):
    for i in range(n):
        engine.write("src", {"v": i, "grp": "ab"[i % 2]}, record_id=f"r{i}",
                     timestamp_us=T0)
    engine.flush()


def test_ingest_csv_and_json(engine, spark, tmp_path):
    base = (
        spark.createDataFrame(
            [(f"x{i}", T0 // US, float(i)) for i in range(5)],
            "id string, epoch long, v double",
        )
        .withColumn("timestamp", F.timestamp_seconds("epoch"))
        .drop("epoch")
    )

    csv_path = str(tmp_path / "in_csv")
    json_path = str(tmp_path / "in_json")
    base.write.option("header", "true").csv(csv_path)
    base.write.json(json_path)

    engine.ingest_path("t_csv", csv_path, fmt="csv")
    engine.ingest_path("t_json", json_path, fmt="json")
    for t in ("t_csv", "t_json"):
        rows = json.loads(engine.query(f"SELECT count(*) AS n FROM {t}"))
        assert rows[0]["n"] == 5, t


def test_export_roundtrip(engine, spark, tmp_path):
    _seed(engine)
    out_parquet = str(tmp_path / "out_pq")
    out_csv = str(tmp_path / "out_csv")
    n = engine.export("SELECT grp, count(*) AS n FROM src GROUP BY grp", out_parquet)
    assert n == 2
    back = spark.read.parquet(out_parquet)
    assert {r["grp"]: r["n"] for r in back.collect()} == {"a": 3, "b": 3}

    engine.export("SELECT id, v FROM src", out_csv, fmt="csv")
    back_csv = spark.read.option("header", "true").csv(out_csv)
    assert back_csv.count() == 6


def test_export_respects_gate(engine):
    _seed(engine, 2)
    import pytest

    from miniodb_spark.gate import SQLGateError

    with pytest.raises(SQLGateError):
        engine.export("DROP TABLE src", "/tmp/nope")
