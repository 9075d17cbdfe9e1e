"""Structured Streaming ingestion into the engine's parquet layout.

The reference's StreamWrite is a client-streaming RPC that funnels
batches through the same buffered write path
(/root/reference/internal/service/miniodb_service.go:1196-1273). The
Spark-native equivalent: any streaming source → ``foreachBatch`` →
``Engine.ingest_dataframe`` (the bulk path — straight partitioned
parquet append, no driver materialization), with checkpointing
providing the WAL/exactly-once semantics the reference built by hand.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..engine import Engine


def stream_ingest(
    engine: Engine,
    stream_df: DataFrame,
    table: str,
    ts_col: str = "timestamp",
    checkpoint_dir: str | None = None,
    trigger_available_now: bool = True,
    publish_cdc: bool = True,
):
    """Start (and by default drain-and-stop) a streaming ingestion into
    ``table``. Returns the StreamingQuery."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        engine.ingest_dataframe(table, batch_df, ts_col=ts_col)
        if publish_cdc and engine.events:
            n = batch_df.count()
            engine.events.publish(
                "batch", table, [], metadata={"batch_id": batch_id, "rows": n}
            )

    writer = stream_df.writeStream.foreachBatch(_sink).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
