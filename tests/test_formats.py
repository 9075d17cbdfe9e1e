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


def test_mp4_writer_parser_roundtrip_and_robustness():
    """ISO BMFF writer/parser: exact round-trip of brand, dimensions,
    timescale-exact duration and mdat size; the parser skips unknown
    boxes, survives truncation, handles 64-bit (version 1) mvhd times,
    and rejects non-BMFF payloads."""
    import struct

    from miniodb_spark.operators.multimodal import (
        _box, mp4_bytes, parse_mp4_boxes)

    b = mp4_bytes(640, 360, 30, fps=10, seed=3)
    info = parse_mp4_boxes(b)
    assert (info["brand"], info["width"], info["height"]) == ("isom", 640, 360)
    assert info["timescale"] == 1000 and info["duration_ms"] == 3000
    assert info["mdat_bytes"] == 64 * 30
    assert info["box_types"] == ["ftyp", "moov", "mdat"]

    # unknown top-level box between moov and mdat is skipped, not fatal
    mdat_at = b.rindex(b"mdat") - 4
    weird = b[:mdat_at] + _box(b"free", b"\x00" * 17) + b[mdat_at:]
    info2 = parse_mp4_boxes(weird)
    assert info2["width"] == 640 and info2["mdat_bytes"] == 64 * 30
    assert "free" in info2["box_types"]

    # version-1 mvhd (64-bit creation/modification/duration)
    matrix = struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                         0x40000000)
    mvhd_v1 = _box(b"mvhd", struct.pack(">I", 0x01000000)
                   + struct.pack(">QQ", 0, 0)
                   + struct.pack(">I", 90000) + struct.pack(">Q", 180000)
                   + struct.pack(">I", 0x00010000) + struct.pack(">H", 0x0100)
                   + b"\x00" * 10 + matrix + b"\x00" * 24
                   + struct.pack(">I", 2))
    v1 = (_box(b"ftyp", b"mp42" + b"\x00" * 4 + b"mp42")
          + _box(b"moov", mvhd_v1))
    got = parse_mp4_boxes(v1)
    assert got["brand"] == "mp42"
    assert got["timescale"] == 90000 and got["duration_ms"] == 2000

    # truncation and garbage are None / partial, never an exception
    assert parse_mp4_boxes(b[:6]) is None
    assert parse_mp4_boxes(b"\x00" * 32) is None
    truncated = parse_mp4_boxes(b[:len(b) // 2])
    assert truncated is not None  # ftyp intact -> best-effort parse
