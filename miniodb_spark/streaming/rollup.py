"""Continuous aggregate (hypertable-style rollup) over the engine's
parquet layout.

TimescaleDB calls this a *continuous aggregate*; streaming warehouses
call it an incrementally-maintained materialized view: a persisted
table of time-bucketed aggregates that every micro-batch updates
ADDITIVELY, so dashboard queries read the tiny rollup instead of
re-scanning the fact stream. The reference has nothing like it (its
analytics always re-query DuckDB over raw parquet); this is the
capability-upgrade shape the brief's custom-operator list names
("hypertable rollup").

Design:

- **Mergeable partials only.** The per-batch aggregate keeps count /
  sum / min / max — all additively mergeable, so maintenance is
  `merged = combine(persisted[touched], batch_partial)` with no
  re-scan of history. avg is derived at read time (sum/count);
  non-mergeable stats (exact median) are out of scope by construction,
  exactly as in every production continuous aggregate.
- **Late data is just another partial.** A late event's window bucket
  is computed from its own event time, so it merges into the OLD
  window row additively — no watermark surgery, no rewrite of
  neighbors. (Consequence: the rollup is eventually-exact under
  unbounded lateness, stricter than Structured Streaming's own
  watermark-dropped windowed aggregates.)
- **Bounded maintenance work.** Each batch touches only the
  (window, key) rows the batch itself contains — the persisted side is
  read through a broadcast semi-join on those keys, and the upsert
  rides :meth:`Engine.merge_upsert` (generation-based CoW), so a batch
  spanning W windows x K keys rewrites at most the partitions holding
  those W*K rows, never the whole rollup.
- **Effectively-once.** Same batch-registry contract as
  ``stream_ingest``: committed batch_ids are recorded in the engine
  catalog and checkpoint replays are skipped, so a restart never
  double-adds a batch. The residual window is the documented
  crash-between-commit-and-marker single batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..engine import Engine


def rollup_id_col(window_col: str = "window_start",
                  key_cols: tuple = ("grp",)):
    """Deterministic rollup row id: ISO window start + key values."""
    parts = [F.date_format(F.col(window_col), "yyyy-MM-dd'T'HH:mm:ss")]
    for k in key_cols:
        parts.append(F.coalesce(F.col(k).cast("string"), F.lit("\\N")))
    return F.concat_ws("|", *parts)


def batch_partials(batch_df: DataFrame, *, ts_col: str, value_col: str,
                   window: str, key_cols: tuple) -> DataFrame:
    """One mergeable partial row per (window, keys) in the batch."""
    return (
        batch_df.groupBy(
            F.window(F.col(ts_col), window).getField("start")
            .alias("window_start"),
            *key_cols,
        )
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.col(value_col).cast("double")).alias("value_sum"),
            F.min(F.col(value_col).cast("double")).alias("value_min"),
            F.max(F.col(value_col).cast("double")).alias("value_max"),
        )
    )


def merge_partials(persisted: DataFrame | None, part: DataFrame,
                   key_cols: tuple) -> DataFrame:
    """Additively combine a batch's partials with the persisted rollup
    rows they touch. Only the batch's (window, key) rows participate —
    the persisted side is reduced via a broadcast semi-join on the
    bounded partial — so maintenance cost scales with the batch, never
    the rollup's history. Factored out of the sink so the merge algebra
    is property-testable without a streaming runtime.

    The semi-join is NULL-SAFE per key column: ``rollup_id_col`` maps a
    NULL key to the ``\\N`` sentinel, so a NULL-keyed group's persisted
    row shares the id of every later NULL-keyed partial — a null-unsafe
    semi-join would drop the persisted row from the merge and the
    upsert would then OVERWRITE the accumulated n/sum/min/max with the
    batch partial alone (silent data loss for the NULL bucket)."""
    if persisted is None:
        return part
    probe = part.select("window_start", *key_cols).alias("pr")
    old = persisted.select(
        F.col("timestamp").alias("window_start"),
        *[F.col(k) for k in key_cols],
        "n", "value_sum", "value_min", "value_max",
    ).alias("o")
    cond = F.col("o.window_start").eqNullSafe(F.col("pr.window_start"))
    for k in key_cols:
        cond = cond & F.col(f"o.{k}").eqNullSafe(F.col(f"pr.{k}"))
    old = old.join(F.broadcast(probe), cond, "left_semi")
    return (
        old.unionByName(part)
        .groupBy("window_start", *key_cols)
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.sum("value_sum").alias("value_sum"),
            F.min("value_min").alias("value_min"),
            F.max("value_max").alias("value_max"),
        )
    )


def continuous_rollup(
    engine: Engine,
    stream_df: DataFrame,
    rollup_table: str,
    *,
    ts_col: str = "ts",
    value_col: str = "value",
    window: str = "1 hour",
    key_cols: tuple = ("event_type",),
    checkpoint_dir: str | None = None,
    trigger_available_now: bool = True,
    stream_id: str | None = None,
):
    """Maintain ``rollup_table`` as a continuous aggregate of the
    stream. Returns the StreamingQuery. Read the result with
    :func:`read_rollup` (adds the derived avg)."""
    from . import ingest as _  # noqa: F401  (shared contract docs)

    sid = stream_id or f"rollup:{rollup_table}"
    key_cols = tuple(key_cols)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= engine.catalog.last_committed_batch(sid):
            return
        if batch_df.isEmpty():
            engine.catalog.commit_stream_batch(sid, batch_id)
            return
        part = batch_partials(batch_df, ts_col=ts_col, value_col=value_col,
                              window=window, key_cols=key_cols).cache()
        try:
            merged = merge_partials(
                engine.read_persisted(rollup_table), part, key_cols)
            rows = merged.select(
                rollup_id_col("window_start", key_cols).alias("id"),
                F.unix_micros(F.col("window_start")).alias("timestamp_us"),
                "window_start", *key_cols,
                "n", "value_sum", "value_min", "value_max",
            )
            upsert = rows.select(
                "id",
                F.timestamp_micros(F.col("timestamp_us")).alias("timestamp"),
                *key_cols, "n", "value_sum", "value_min", "value_max",
            )
            engine.merge_upsert(rollup_table, upsert, key_col="id")
            engine.catalog.commit_stream_batch(sid, batch_id)
        finally:
            part.unpersist()

    writer = stream_df.writeStream.foreachBatch(_sink).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_rollup(engine: Engine, rollup_table: str,
                key_cols: tuple = ("event_type",)) -> DataFrame | None:
    """The queryable face of the rollup: one row per (window, keys)
    with the derived average. Reading this table replaces a full fact
    scan for any dashboard aggregate it covers."""
    df = engine.read_persisted(rollup_table)
    if df is None:
        return None
    return df.select(
        F.col("timestamp").alias("window_start"),
        *[F.col(k) for k in key_cols],
        "n", "value_sum", "value_min", "value_max",
        (F.col("value_sum") / F.col("n")).alias("value_avg"),
    )
