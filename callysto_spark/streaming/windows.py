"""Streaming window helpers: tumbling / sliding / session windows with
watermarks — the event-time operator surface (SURVEY.md §2.5 streaming
rows). Thin, typed wrappers over the native operators so pipelines read
declaratively; the batch twins (oracle-checked) live in
callysto_spark.queries.events.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def tumbling(df: DataFrame, ts: str, size: str, watermark: str | None = None) -> tuple[DataFrame, Column]:
    """Tumbling event-time window; returns (df', window_col)."""
    if watermark:
        df = df.withWatermark(ts, watermark)
    return df, F.window(F.col(ts), size)


def sliding(
    df: DataFrame, ts: str, size: str, hop: str, watermark: str | None = None
) -> tuple[DataFrame, Column]:
    if watermark:
        df = df.withWatermark(ts, watermark)
    return df, F.window(F.col(ts), size, hop)


def session(df: DataFrame, ts: str, gap: str, watermark: str | None = None) -> tuple[DataFrame, Column]:
    """Session window with inactivity gap (native ``session_window``)."""
    if watermark:
        df = df.withWatermark(ts, watermark)
    return df, F.session_window(F.col(ts), gap)


def dedup_within_watermark(df: DataFrame, keys: list[str], ts: str, watermark: str) -> DataFrame:
    """Streaming dedup bounded by watermark state retention."""
    return df.withWatermark(ts, watermark).dropDuplicatesWithinWatermark(keys)
