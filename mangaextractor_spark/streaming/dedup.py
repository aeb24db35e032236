"""Streaming deduplication: effectively-once event delivery from an
at-least-once source.

Upstream replays (the normal failure mode of log-based delivery)
re-emit events with the same event_id. ``dropDuplicatesWithinWatermark``
keeps per-key state only until the watermark passes the key's event
time, so the state store is bounded by (event rate x watermark) instead
of growing with the whole stream — the scale-correct form of streaming
dedup (a plain ``dropDuplicates`` on a stream retains state forever).

The dedup transformation is stream-agnostic and shared with its batch
twin in tests, so semantics cannot diverge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from .windowed import _events_stream


def deduped_events(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Drop event_id duplicates arriving within the watermark horizon."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def stream_dedup_events(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    watermark: str = "10 minutes",
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    deduped = deduped_events(
        _events_stream(spark, events_dir, max_files_per_trigger), watermark
    )
    writer = (
        deduped.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .format("parquet")
        .option("path", out_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
