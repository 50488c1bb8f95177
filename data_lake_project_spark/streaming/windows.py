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


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    horizon: str = "1 hour",
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream join with a bounded time-range
    condition: each left row pairs with right rows for the same key
    whose time falls in ``[left_ts - horizon, left_ts]``.

    This is THE canonical Structured Streaming two-stream join shape:
    without both the watermark and the range bound, each side would
    have to buffer the other's entire history; with them, join state
    is evicted once the watermark passes ``horizon``, so state size
    is O(rate × (horizon + watermark)) per key — independent of
    stream length, which is what makes it runnable forever at 100 TB/
    day. On batch DataFrames the same call degrades to a plain range
    join (unified API), which the equivalence test exploits.

    ``left_ts`` / ``right_ts`` must be distinct column names; the key
    column ``on`` is equality-joined and emitted once.
    """
    l = with_watermark(left, left_ts, watermark).alias("__l")
    r = with_watermark(right, right_ts, watermark).alias("__r")
    lc, rc = F.col(f"__l.{left_ts}"), F.col(f"__r.{right_ts}")
    cond = (
        (F.col(f"__l.{on}") == F.col(f"__r.{on}"))
        & (rc >= lc - F.expr(f"INTERVAL {horizon}"))
        & (rc <= lc)
    )
    joined = l.join(r, cond, how)
    keep = [F.col(f"__l.{on}").alias(on)]
    keep += [F.col(f"__l.{c}") for c in left.columns if c != on]
    keep += [F.col(f"__r.{c}") for c in right.columns if c != on]
    return joined.select(*keep)
