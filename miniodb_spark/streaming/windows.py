"""Watermarked event-time windows — tumbling, sliding, session.

Capability upgrades over the reference (it has no stream-relational
algebra at all, SURVEY §2.11): thin wrappers over Structured
Streaming's ``window()`` / ``session_window()`` with watermarks for
late-data handling. Each works identically on batch DataFrames (the
window functions are plain Catalyst expressions), which is how the
oracle-checked batch variants in the query registry validate the same
semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _apply_watermark(df: DataFrame, ts_col: str, watermark: str | None) -> DataFrame:
    if watermark and df.isStreaming:
        return df.withWatermark(ts_col, watermark)
    return df


def tumbling(
    df: DataFrame,
    ts_col: str,
    duration: str,
    group_cols: list[str] | None = None,
    aggs: list[Column] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Fixed, non-overlapping event-time windows."""
    df = _apply_watermark(df, ts_col, watermark)
    keys = [F.window(ts_col, duration).alias("window")] + [
        F.col(c) for c in (group_cols or [])
    ]
    return df.groupBy(*keys).agg(*(aggs or [F.count("*").alias("n")]))


def sliding(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    group_cols: list[str] | None = None,
    aggs: list[Column] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Overlapping windows: each event lands in duration/slide windows."""
    df = _apply_watermark(df, ts_col, watermark)
    keys = [F.window(ts_col, duration, slide).alias("window")] + [
        F.col(c) for c in (group_cols or [])
    ]
    return df.groupBy(*keys).agg(*(aggs or [F.count("*").alias("n")]))


def session(
    df: DataFrame,
    ts_col: str,
    gap: str,
    group_cols: list[str] | None = None,
    aggs: list[Column] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Gap-based session windows (dynamic extent): a session closes when
    no event arrives within ``gap``."""
    df = _apply_watermark(df, ts_col, watermark)
    keys = [F.session_window(ts_col, gap).alias("session")] + [
        F.col(c) for c in (group_cols or [])
    ]
    return df.groupBy(*keys).agg(*(aggs or [F.count("*").alias("n")]))


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    lower: str,
    upper: str,
    watermark: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Stream-stream (or batch) event-time interval join: match rows with
    equal ``on`` keys whose timestamps satisfy
    ``left_ts - lower <= right_ts <= left_ts + upper``.

    On streams both sides get the watermark (required for Structured
    Streaming to bound join state — state for rows older than
    watermark+interval is evicted; without it a stream-stream join's
    state grows forever). On batch DataFrames the same predicate plans
    as a regular range-join. Columns are disambiguated with l_/r_
    prefixes only where names collide."""
    lw = _apply_watermark(left, left_ts, watermark).alias("l")
    rw = _apply_watermark(right, right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{on}") == F.col(f"r.{on}"))
        & (F.col(f"r.{right_ts}")
           >= F.col(f"l.{left_ts}") - F.expr(f"INTERVAL {lower}"))
        & (F.col(f"r.{right_ts}")
           <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {upper}"))
    )
    out_cols = [F.col(f"l.{c}") for c in left.columns] + [
        F.col(f"r.{c}").alias(c if c not in left.columns else f"r_{c}")
        for c in right.columns
    ]
    return lw.join(rw, cond, how).select(*out_cols)
