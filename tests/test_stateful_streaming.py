"""Custom stateful streaming operators (applyInPandasWithState):
cross-batch dedup and running counters."""

import time

import pytest
from pyspark.sql import functions as F


def _write_batch(spark, path, rows, schema="k long, v double"):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(path)


def _drain(query, timeout_s=120):
    query.processAllAvailable()
    query.stop()


def test_dedup_stream_across_batches(spark, tmp_path):
    from miniodb_spark.streaming.stateful import dedup_stream

    src = str(tmp_path / "src")
    sink: list = []
    # batch 1: keys 1,2,2 — batch 2 arrives later with keys 2,3
    _write_batch(spark, src, [(1, 10.0), (2, 20.0), (2, 21.0)])

    stream = spark.readStream.schema("k long, v double").option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    deduped = dedup_stream(stream, "k")

    def _collect(batch_df, batch_id):
        sink.extend(r.asDict() for r in batch_df.collect())

    q = (
        deduped.writeStream.foreachBatch(_collect)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        _write_batch(spark, src, [(2, 22.0), (3, 30.0)])
        q.processAllAvailable()
    finally:
        q.stop()

    keys = sorted(r["k"] for r in sink)
    assert keys == [1, 2, 3]  # each key exactly once, across batches


def test_running_counter_stream(spark, tmp_path):
    from miniodb_spark.streaming.stateful import running_counter_stream

    src = str(tmp_path / "src")
    sink: list = []
    _write_batch(spark, src, [(1, 5.0), (1, 7.0), (2, 1.0)])

    stream = spark.readStream.schema("k long, v double").option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    counted = running_counter_stream(stream, "k", "v")

    def _collect(batch_df, batch_id):
        sink.extend(r.asDict() for r in batch_df.collect())

    q = (
        counted.writeStream.foreachBatch(_collect)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        _write_batch(spark, src, [(1, 3.0)])
        q.processAllAvailable()
    finally:
        q.stop()

    latest = {}
    for r in sink:
        latest[r["k"]] = (r["n"], r["total"])
    assert latest[1] == (3, 15.0)  # 2 rows then +1 across batches
    assert latest[2] == (1, 1.0)


def test_heavy_hitters_stream_across_batches(spark, tmp_path):
    from miniodb_spark.streaming.stateful import heavy_hitters_stream

    src = str(tmp_path / "hh_src")
    sink: list = []
    # shard 0: 'a' dominates across two micro-batches; cardinality (4)
    # exceeds k=3 so MG actually prunes
    _write_batch(spark, src, [(0, "a"), (0, "a"), (0, "b"), (0, "c")],
                 schema="shard long, val string")

    stream = spark.readStream.schema("shard long, val string").option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    hh = heavy_hitters_stream(stream, "shard", "val", k=3)

    def _collect(batch_df, batch_id):
        sink.append([r.asDict() for r in batch_df.collect()])

    q = (
        hh.writeStream.outputMode("update")
        .foreachBatch(_collect)
        .option("checkpointLocation", str(tmp_path / "hh_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        _write_batch(spark, src, [(0, "a"), (0, "a"), (0, "d"), (0, "b")],
                     schema="shard long, val string")
        q.processAllAvailable()
    finally:
        q.stop()

    finals = [rows for rows in sink if rows]
    assert finals, sink
    last = finals[-1]
    by_val = {r["value"]: r for r in last}
    # state carried across batches: totals cover BOTH micro-batches
    assert last[0]["total"] == 8
    # 'a' seen 4 times total; MG lower bound <= exact, within decrements
    assert "a" in by_val
    d = last[0]["decrements"]
    assert 0 < by_val["a"]["lower_bound"] <= 4
    assert 4 - by_val["a"]["lower_bound"] <= d
    # bounded state: never more than k tracked values
    assert len(last) <= 3


def test_heavy_hitters_stream_skips_nulls_and_string_shards(spark, tmp_path):
    from miniodb_spark.streaming.stateful import heavy_hitters_stream

    src = str(tmp_path / "hh2_src")
    sink: list = []
    _write_batch(spark, src,
                 [("h1", "a"), ("h1", None), ("h1", "a"), ("h1", None)],
                 schema="shard string, val string")
    stream = spark.readStream.schema("shard string, val string").option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    hh = heavy_hitters_stream(stream, "shard", "val", k=4)

    def _collect(batch_df, batch_id):
        sink.append([r.asDict() for r in batch_df.collect()])

    q = (
        hh.writeStream.outputMode("update")
        .foreachBatch(_collect)
        .option("checkpointLocation", str(tmp_path / "hh2_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    rows = [r for rows in sink for r in rows]
    assert rows, sink
    assert {r["shard"] for r in rows} == {"h1"}  # string shard key works
    vals = {r["value"] for r in rows}
    assert vals == {"a"}  # nulls not tallied as "None"/"nan"
    assert all(r["total"] == 2 for r in rows)  # total excludes nulls


def test_session_finalize_stream_gap_and_timer(spark, tmp_path):
    """transformWithStateInPandas sessionizer: a later-batch event past
    the gap closes the session input-driven ('gap'); an idle key is
    flushed by its processing-time timer ('timer').

    Gated on google.protobuf exactly like the gRPC wire tests gate on
    grpcio: transformWithState's python<->JVM state server speaks
    protobuf, which this sandbox lacks; the test auto-unskips the
    moment the module appears (meta-tested below)."""
    pytest.importorskip("google.protobuf")
    from miniodb_spark.streaming.stateful import session_finalize_stream

    src = str(tmp_path / "src")
    sink: list = []
    m = 60_000
    # user 1: two events 1 min apart
    _write_batch(spark, src, [(1, 0 * m), (1, 1 * m)], "k long, ts long")

    stream = spark.readStream.schema("k long, ts long").option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    # gap = 30 min of EVENT time for the input-driven close; the
    # processing-time flush timer uses the same gap scaled tiny here?
    # no — one knob: use 30 min, timer fires only via the 0-gap test key
    sessions = session_finalize_stream(stream, "k", "ts", gap_minutes=30)

    def _collect(batch_df, batch_id):
        sink.extend(r.asDict() for r in batch_df.collect())

    q = (
        sessions.writeStream.foreachBatch(_collect)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        # 40 min later in event time -> closes session 1, opens session 2
        _write_batch(spark, src, [(1, 41 * m)], "k long, ts long")
        q.processAllAvailable()
    finally:
        q.stop()

    assert len(sink) == 1, sink
    s0 = sink[0]
    assert (s0["k"], s0["start_ms"], s0["end_ms"], s0["n_events"], s0["via"]) \
        == (1, 0, 1 * m, 2, "gap")


def test_session_finalize_timer_flushes_idle_key(spark, tmp_path):
    pytest.importorskip("google.protobuf")
    from miniodb_spark.streaming.stateful import session_finalize_stream

    src = str(tmp_path / "src")
    sink: list = []
    _write_batch(spark, src, [(7, 123), (7, 456)], "k long, ts long")

    stream = spark.readStream.schema("k long, ts long").option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    # gap 0: the flush timer is already due at the next micro-batch
    sessions = session_finalize_stream(stream, "k", "ts", gap_minutes=0)

    def _collect(batch_df, batch_id):
        sink.extend(r.asDict() for r in batch_df.collect())

    q = (
        sessions.writeStream.foreachBatch(_collect)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        time.sleep(0.2)
        # unrelated key triggers another micro-batch; 7's timer fires
        _write_batch(spark, src, [(8, 999)], "k long, ts long")
        q.processAllAvailable()
        time.sleep(0.2)
        _write_batch(spark, src, [(9, 1)], "k long, ts long")
        q.processAllAvailable()
    finally:
        q.stop()

    flushed = [r for r in sink if r["k"] == 7]
    assert flushed and flushed[0]["via"] == "timer", sink
    assert (flushed[0]["start_ms"], flushed[0]["end_ms"],
            flushed[0]["n_events"]) == (123, 456, 2)


def test_session_finalize_skip_guard_is_the_import_not_a_stale_flag():
    """Same readiness audit as the gRPC wire tests: the
    transformWithState e2e tests must auto-unskip the moment
    google.protobuf appears; the gate is the importorskip itself."""
    import re
    from pathlib import Path

    src = Path(__file__).read_text()
    assert len(re.findall(
        r'pytest\.importorskip\("google\.protobuf"\)', src)) >= 2
