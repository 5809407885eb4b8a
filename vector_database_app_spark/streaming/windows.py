"""Structured Streaming surface over the events table.

Entirely absent in the reference (SURVEY §2.8 — no watermarks, windows, or
state anywhere). Design rule here: every windowed transformation is written
against a plain DataFrame, so the SAME function runs in batch mode (DuckDB
oracle-checkable via date_trunc-style SQL) and in streaming mode
(`readStream` + watermark + incremental state). Tests run both and compare.

Scale notes: event-time windows shuffle on (window, keys); watermarks bound
state so a 100 TB/day stream holds only the open windows; stateful dedup
keys expire with the watermark instead of growing without bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import EVENTS


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (schema must be explicit
    for streaming reads). With Trigger.AvailableNow this processes the
    existing files incrementally and stops — the test harness pattern."""
    return spark.readStream.schema(EVENTS).parquet(f"{sf_dir}/events.parquet")


def tumbling_counts(
    events: DataFrame, duration: str = "1 hour", *, watermark: str | None = None
) -> DataFrame:
    """Tumbling event-time window: count + sum(value) per (window, type).
    Same code batch & stream; pass `watermark` when streaming."""
    src = events.withWatermark("ts", watermark) if watermark else events
    return (
        src.groupBy(F.window("ts", duration).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("win.start").cast("string").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    duration: str = "1 hour",
    slide: str = "30 minutes",
    *,
    watermark: str | None = None,
) -> DataFrame:
    """Sliding window — each event lands in duration/slide windows."""
    src = events.withWatermark("ts", watermark) if watermark else events
    return (
        src.groupBy(F.window("ts", duration, slide).alias("win"), "event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .select(
            F.col("win.start").cast("string").alias("window_start"),
            "event_type",
            "n",
        )
    )


def session_counts(
    events: DataFrame, gap: str = "5 minutes", *, watermark: str | None = None
) -> DataFrame:
    """Session windows per user: events within `gap` of each other merge.
    Streaming requires a watermark (merging state); batch mode works as-is."""
    src = events.withWatermark("ts", watermark) if watermark else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def dedup_within_watermark(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Stateful streaming dedup on event_id; state expires with the
    watermark (reference's dedup is a driver-side hash probe,
    `rag_search/vector_db.py:431-434` — this is its unbounded-stream form)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def run_stream_to_memory(
    stream_df: DataFrame, query_name: str, *, output_mode: str = "complete"
) -> None:
    """Drain a stream with AvailableNow into an in-memory table `query_name`
    (test/smoke harness; production sinks are parquet/Delta with exactly-once
    file commit)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
