"""Streaming analytics over the events table: watermarked windowed
aggregation (late-data semantics) and a custom stateful operator via
``applyInPandasWithState``.

The reference is batch-only; these are the engine's streaming
counterparts of `queries/relational.py`'s event analytics, built the
way a 100 TB event firehose needs them:

- ``stream_windowed_event_stats``: tumbling event-time windows with a
  watermark. The watermark bounds state (windows older than
  max(event_ts) - delay are finalized and evicted) AND defines the
  late-data rule: an event older than the watermark is dropped, not
  silently mis-aggregated. Append output mode emits each window once,
  when it finalizes — the exactly-once-per-window contract a
  downstream Iceberg sink wants.
- ``stream_user_running_totals``: per-user cumulative totals that
  survive across micro-batches AND restarts (state lives in the
  checkpoint), via applyInPandasWithState — the escape hatch for
  stateful logic Spark's built-in windows can't express. State is one
  small (count, sum) pair per user: O(active users), not O(events).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _events_stream(
    spark: SparkSession, events_dir: str, max_files_per_trigger: int | None
):
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(events_dir)


def windowed_event_stats(events: DataFrame, watermark: str, window: str) -> DataFrame:
    """The (stream-agnostic) aggregation: tumbling event-time windows
    per event_type. Shared by the streaming query and its batch twin in
    tests, so the semantics cannot diverge."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def stream_windowed_event_stats(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    watermark: str = "10 minutes",
    window: str = "5 minutes",
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    stats = windowed_event_stats(
        _events_stream(spark, events_dir, max_files_per_trigger), watermark, window
    )
    writer = (
        stats.writeStream.outputMode("append")  # emit each window once, on finalize
        .option("checkpointLocation", checkpoint_dir)
        .format("parquet")
        .option("path", out_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


RUNNING_TOTALS_SCHEMA = "user_id long, n_events long, total_value double"
_STATE_SCHEMA = "n long, total double"


def _update_user_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def stream_user_running_totals(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Per-user cumulative (count, sum) across micro-batches, state in
    the checkpoint: each batch emits the UPDATED totals for users seen
    in that batch."""
    events = _events_stream(spark, events_dir, max_files_per_trigger)
    totals: Any = (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _update_user_totals,
            RUNNING_TOTALS_SCHEMA,
            _STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        batch.write.mode("overwrite").parquet(f"{out_dir}/batch_id={batch_id}")

    writer = (
        totals.writeStream.foreachBatch(write_batch)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
