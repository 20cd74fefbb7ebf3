"""Watermark injection (SURVEY.md O29).

The reference never declares a watermark — Confluent Flink applies a
default source strategy implicitly.  Structured Streaming *requires* one
before event-time window aggregation in append mode, so the engine
injects a configurable default to mirror the "it just works" behavior;
rows later than the watermark are dropped in both systems.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

DEFAULT_WATERMARK_DELAY = "10 seconds"


def with_default_watermark(
    df: DataFrame, ts_col: str = "event_time", delay: str | None = None
) -> DataFrame:
    if not df.isStreaming:
        return df
    return df.withWatermark(ts_col, delay or DEFAULT_WATERMARK_DELAY)
