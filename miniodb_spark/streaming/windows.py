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
