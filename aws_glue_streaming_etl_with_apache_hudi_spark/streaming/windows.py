"""Streaming-native operators: event-time windowed aggregation with
watermarks, session windows, and stream deduplication.

These are the transformations the reference's micro-batch surface implies
once queries move from "upsert then SQL later" to continuous aggregation
(SURVEY.md §2 Part B, streaming row). Each builder works identically on a
batch or streaming DataFrame — Structured Streaming's core design — so
the DuckDB-oracle checks run the same expressions batch-wise
(queries/pipeline.py) and the streaming tests replay files through them.

Scale notes: windowed aggregation state lives in the state store keyed by
(window, group); the watermark bounds state size — without it, state
grows forever. Session windows merge on overlap; ``dropDuplicates`` keeps
one state entry per key until the watermark passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    df: DataFrame,
    ts_col: str = "ts",
    length: str = "1 hour",
    watermark: str = "2 hours",
    group_cols: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Tumbling event-time window counts/sums with late-data drop."""
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, length), *group_cols)
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .select(
            F.col("window.start").alias("window_start"),
            *group_cols,
            "n",
            F.round("total", 2).alias("total"),
        )
    )


def sliding_counts(
    df: DataFrame,
    ts_col: str = "ts",
    length: str = "2 hours",
    slide: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, length, slide))
        .agg(F.count("*").alias("n"))
        .select(F.col("window.start").alias("window_start"), "n")
    )


def session_counts(
    df: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    key_col: str = "user_id",
) -> DataFrame:
    """Session windows: events within ``gap`` of each other merge into one
    session per key. State merges across micro-batches until the watermark
    closes the session."""
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap), F.col(key_col))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col(key_col),
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


def stream_dedup(
    df: DataFrame, keys: list[str], ts_col: str = "ts", watermark: str = "1 hour"
) -> DataFrame:
    """Streaming dropDuplicates: keeps the first arrival per key; the
    watermark lets Spark expire per-key state."""
    return df.withWatermark(ts_col, watermark).dropDuplicates(keys)


def stream_dedup_within_watermark(
    df: DataFrame, keys: list[str], ts_col: str = "ts", watermark: str = "1 hour"
) -> DataFrame:
    """Spark 3.5+ ``dropDuplicatesWithinWatermark``: dedup for
    at-least-once sources whose duplicates arrive CLOSE IN TIME (broker
    redelivery, producer retries). Unlike ``dropDuplicates(keys)`` —
    whose per-key state never expires when the event-time column is not
    part of the key — state here drops once the watermark passes the
    first occurrence's event time + delay, so state size is bounded by
    the redelivery window instead of growing with lifetime key
    cardinality (the 100 TB streaming-state story). The trade, pinned
    in tests/test_streaming_windows.py: a genuine re-occurrence AFTER
    the window is emitted again — exactly-once per window, not per
    lifetime."""
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
