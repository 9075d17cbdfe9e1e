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
