"""Watermarked streaming windows: late events beyond the watermark must
be dropped; on-time events aggregate into their event-time window."""

from datetime import datetime, timezone

from pyspark.sql import functions as F

from miniodb_spark.streaming.windows import tumbling


def _ts(h, m=0):
    return datetime(2024, 1, 1, h, m, tzinfo=timezone.utc).replace(tzinfo=None)


def test_watermark_drops_late_events(spark, tmp_path):
    src = str(tmp_path / "src")
    schema = "k long, ts timestamp"

    # batch 1: events at 10:00 and 12:00 → watermark after batch ≈ 12:00 - 30m
    spark.createDataFrame(
        [(1, _ts(10)), (2, _ts(12))], schema
    ).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    win = tumbling(
        stream, "ts", "1 hour",
        aggs=[F.count("*").alias("n")],
        watermark="30 minutes",
    )
    sink: list = []

    def _collect(batch_df, _):
        sink.extend(r.asDict() for r in batch_df.collect())

    q = (
        win.writeStream.foreachBatch(_collect)
        .outputMode("append")  # append only emits windows the watermark closed
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: a LATE event at 09:30 (before watermark 11:30) and an
        # on-time one at 13:00
        spark.createDataFrame(
            [(3, _ts(9, 30)), (4, _ts(13))], schema
        ).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        # batch 3: advance the watermark so 12:00/13:00 windows close
        spark.createDataFrame([(5, _ts(15))], schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    counts = {r["window"]["start"]: r["n"] for r in sink}
    assert counts.get(_ts(10)) == 1  # on-time
    assert counts.get(_ts(12)) == 1
    assert _ts(9, 30) not in counts and counts.get(_ts(9)) is None  # late event dropped
    assert counts.get(_ts(13)) == 1


def test_interval_join_batch_semantics(spark):
    """Batch-mode check of the event-time interval join predicate."""
    from miniodb_spark.streaming.windows import interval_join

    us = 1_000_000
    t0 = 1_700_000_000 * us
    clicks = spark.createDataFrame(
        [(1, t0), (1, t0 + 300 * us), (2, t0)],
        "user_id long, ts_us long",
    ).selectExpr("user_id", "timestamp_micros(ts_us) AS ts")
    views = spark.createDataFrame(
        [(1, t0 + 30 * us),   # within +60s of click 1
         (1, t0 + 200 * us),  # outside both (click1 +60s, click2 -60s)
         (2, t0 - 30 * us)],  # within -60s of user2's click
        "user_id long, ts_us long",
    ).selectExpr("user_id", "timestamp_micros(ts_us) AS v_ts")

    out = interval_join(clicks, views, on="user_id", left_ts="ts",
                        right_ts="v_ts", lower="60 seconds",
                        upper="60 seconds")
    got = {(r["user_id"], r["ts"].timestamp(), r["v_ts"].timestamp())
           for r in out.collect()}
    assert got == {
        (1, t0 / us, (t0 + 30 * us) / us),
        (2, t0 / us, (t0 - 30 * us) / us),
    }


def test_interval_join_streaming_plans_with_watermark(spark, tmp_path, sf_dir):
    """The streaming form must analyze: watermarks on both sides bound
    the join state (Structured Streaming rejects an unbounded
    stream-stream inner join plan at start)."""
    from miniodb_spark.queries import normalize_event_ts
    from miniodb_spark.streaming.windows import interval_join

    import shutil

    src = tmp_path / "src"
    src.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src / "events.parquet")
    schema = spark.read.parquet(str(src)).schema
    left = normalize_event_ts(spark.readStream.schema(schema).parquet(str(src)))
    right = normalize_event_ts(
        spark.readStream.schema(schema).parquet(str(src))
    ).withColumnRenamed("ts", "r_ts").withColumnRenamed("event_id", "r_event_id")

    joined = interval_join(
        left.select("user_id", "ts"),
        right.select("user_id", F.col("r_ts")),
        on="user_id", left_ts="ts", right_ts="r_ts",
        lower="10 minutes", upper="10 minutes",
        watermark="30 minutes",
    )
    q = (
        joined.writeStream.format("memory").queryName("ij_test")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True).start()
    )
    try:
        q.awaitTermination(120)
        assert spark.sql("SELECT count(*) AS n FROM ij_test").first()["n"] > 0
    finally:
        q.stop()
