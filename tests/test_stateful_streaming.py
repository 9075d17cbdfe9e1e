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
