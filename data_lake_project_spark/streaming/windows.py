"""Event-time windowing + stateful surface the reference lacks
(SURVEY.md §2.8: "No watermark, no event-time window, no stateful op,
no late-data handling anywhere in the reference"). All built-in
Structured Streaming operators; watermarks bound state so a 100 TB
stream never accumulates unbounded aggregation state.

Every helper works identically on batch DataFrames (Spark's
unified-API guarantee), which is what the batch↔stream equivalence
tests exploit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_watermark(df: DataFrame, ts_col: str, delay: str = "10 minutes") -> DataFrame:
    """Late-data bound: rows later than ``delay`` behind the max seen
    event time are dropped and window state older than that is
    evicted. Batch DataFrames pass through unchanged (watermarks are
    a streaming-only concept but the call is legal on batch)."""
    if df.isStreaming:
        return df.withWatermark(ts_col, delay)
    return df


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    agg_exprs: list[Column],
    keys: list[str] | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Non-overlapping event-time windows: one row per (window, keys)."""
    d = with_watermark(df, ts_col, watermark)
    return d.groupBy(
        F.window(F.col(ts_col), duration).alias("win"), *(keys or [])
    ).agg(*agg_exprs)


def sliding_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    agg_exprs: list[Column],
    keys: list[str] | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Overlapping windows (each event lands in duration/slide windows)."""
    d = with_watermark(df, ts_col, watermark)
    return d.groupBy(
        F.window(F.col(ts_col), duration, slide).alias("win"), *(keys or [])
    ).agg(*agg_exprs)


def session_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    agg_exprs: list[Column],
    keys: list[str] | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Session windows: dynamic extent, closed after ``gap`` of
    inactivity per key."""
    d = with_watermark(df, ts_col, watermark)
    return d.groupBy(
        F.session_window(F.col(ts_col), gap).alias("win"), *(keys or [])
    ).agg(*agg_exprs)


def stream_dedup(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming dedup on key columns; with a watermark the dedup
    state is bounded (keys older than the watermark are evicted) —
    the scalable fix for the reference's at-least-once duplicates
    (``spark_stream.py:217-224``)."""
    if ts_col is not None:
        return with_watermark(df, ts_col, watermark).dropDuplicates(key_cols)
    return df.dropDuplicates(key_cols)
