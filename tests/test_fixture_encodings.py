"""load() must be robust to fixture-encoding drift on events.ts.

The driver regenerates /root/testdata between rounds and has already
shipped the events timestamp in two physical encodings (parquet
TIMESTAMP(NANOS) through round 4, TIMESTAMP(MICROS) from round 5).
A third plausible encoding is a raw int64 epoch-ns column. load()
must return the same logical rows for all three — a stale assumption
about the physical type cost round 5 its entire driver window.
"""

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from miniodb_spark.queries import load

BASE_US = 1_700_000_000 * 1_000_000  # 2023-11-14T22:13:20Z, µs


def _events_table(ts_array: pa.Array) -> pa.Table:
    n = len(ts_array)
    return pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([i % 3 for i in range(n)], pa.int64()),
            "event_type": pa.array(["click"] * n),
            "value": pa.array([float(i) for i in range(n)]),
            "props": pa.array(["{}"] * n),
        }
    )


def _write(dir_path, ts_array):
    pq.write_table(_events_table(ts_array), str(dir_path / "events.parquet"))
    return str(dir_path)


@pytest.fixture(scope="module")
def encoded_dirs(tmp_path_factory):
    # sub-second µs offsets included deliberately: double division of
    # epoch-ns truncates ~1/64 of µs-grain values (256 ns ulp at 1.7e18),
    # which whole-second timestamps can never catch. Offset 16 is a
    # pinned corrupting value: int(float((BASE_US+16)*1000)/1000) is
    # BASE_US+15.
    us = [BASE_US + off for off in (0, 16, 80, 144, 999_999, 500_001, 7, 63)]
    root = tmp_path_factory.mktemp("encodings")
    dirs = {}

    d = root / "micros"
    d.mkdir()
    dirs["micros"] = _write(d, pa.array(us, pa.timestamp("us")))

    d = root / "nanos"
    d.mkdir()
    dirs["nanos"] = _write(d, pa.array([u * 1000 for u in us], pa.timestamp("ns")))

    d = root / "int64_ns"
    d.mkdir()
    dirs["int64_ns"] = _write(d, pa.array([u * 1000 for u in us], pa.int64()))

    return dirs


def test_load_events_same_rows_for_all_encodings(spark, encoded_dirs):
    results = {}
    for name, sf_dir in encoded_dirs.items():
        df = load(spark, sf_dir, "events")
        dt = dict(df.dtypes)["ts"]
        # load() normalizes every encoding to TimestampType — downstream
        # instant arithmetic (unix_micros, watermarks) depends on it
        assert dt == "timestamp", f"{name}: ts read as {dt}"
        rows = df.orderBy("event_id").select("event_id", "ts").collect()
        # normalize to naive datetimes for cross-encoding comparison
        results[name] = [(r["event_id"], r["ts"].replace(tzinfo=None)) for r in rows]

    assert results["micros"] == results["nanos"] == results["int64_ns"]
    assert results["micros"][0][1] == datetime.datetime(2023, 11, 14, 22, 13, 20)


def test_load_events_real_fixture_is_timestamp(spark, sf_dir):
    df = load(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    assert df.limit(1).count() == 1
