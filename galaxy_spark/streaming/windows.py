"""Streaming windowing / watermark / dedup helpers (SURVEY.md §2.2:
tumbling/sliding/session windows, late data, stateful dedup).

Thin, typed wrappers over the stock primitives so tasks declare
intent (``tumbling(...)``) and the engine owns the scale-relevant
details: watermarks bound state-store size (without one, a windowed
agg on 100 TB/day of events grows state forever), and dedup uses
``dropDuplicatesWithinWatermark`` so the key set is purged as event
time advances.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_watermark(df: DataFrame, ts_col: str = "ts",
                   delay: str = "10 minutes") -> DataFrame:
    return df.withWatermark(ts_col, delay)


def tumbling(df: DataFrame, ts_col: str, size: str,
             *keys: str, watermark: str | None = None) -> DataFrame:
    """Tumbling-window count+sum aggregation."""
    src = df.withWatermark(ts_col, watermark) if watermark else df
    return (src.groupBy(F.window(ts_col, size).alias("window"), *keys)
            .agg(F.count("*").alias("n_events"),
                 F.sum("value").alias("total_value")))


def sliding(df: DataFrame, ts_col: str, size: str, slide: str,
            *keys: str, watermark: str | None = None) -> DataFrame:
    src = df.withWatermark(ts_col, watermark) if watermark else df
    return (src.groupBy(F.window(ts_col, size, slide).alias("window"), *keys)
            .agg(F.count("*").alias("n_events"),
                 F.sum("value").alias("total_value")))


def session(df: DataFrame, ts_col: str, gap: str,
            *keys: str, watermark: str | None = None) -> DataFrame:
    """Session windows with an inactivity gap (streaming twin of the
    batch gaps-and-islands query ``events_sessionization``)."""
    src = df.withWatermark(ts_col, watermark) if watermark else df
    return (src.groupBy(F.session_window(ts_col, gap).alias("session"), *keys)
            .agg(F.count("*").alias("n_events"),
                 F.sum("value").alias("total_value")))


def dedup_within_watermark(df: DataFrame, keys: list[str],
                           ts_col: str = "ts",
                           delay: str = "10 minutes") -> DataFrame:
    """Stateful streaming dedup with bounded state."""
    return df.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(keys)
