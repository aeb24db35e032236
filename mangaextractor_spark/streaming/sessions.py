"""Session windows over the event stream — Spark's built-in
``session_window`` (dynamic-gap session aggregation), batch and
streaming from ONE shared transformation.

The batch twin of the hand-rolled gap-sessionization in
``queries/relational.py::event_sessions`` (lag -> boundary flag ->
running sum -> rollup). ``session_window`` is the engine-native form:
Catalyst merges overlapping per-event windows [ts, ts+gap) inside a
special session aggregation — one shuffle on the grouping key, no
per-user ORDER BY window, and (unlike the lag construction) it works
UNCHANGED on an unbounded stream, where the watermark closes a session
once no event can extend it and append mode emits it exactly once.

Boundary semantics (pinned by tests/test_streaming_sessions.py's
exact-gap fixture and the registered oracle): Spark merges
INCLUSIVELY — an event landing exactly at prev_ts + gap still extends
the session; only a strictly larger gap starts a new one. That is the
same `diff > gap` split rule as the hand-rolled event_sessions, so the
lag construction and the engine-native one agree on every input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from .windowed import EVENTS_SCHEMA, _events_stream

GAP = "30 minutes"


def session_stats(events: DataFrame, gap: str = GAP) -> DataFrame:
    """Stream-agnostic session aggregation: one row per (user, session)
    with the session bounds Spark assigns (start = first event,
    end = last event + gap). Shared by the registered batch query and
    the streaming query so semantics cannot diverge. The value sum
    rides DECIMAL inside the aggregation (exact, order-independent)
    and converts to DOUBLE once."""
    return (
        events.groupBy("user_id", F.session_window(F.col("ts"), gap).alias("sw"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("value_sum"),
        )
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "value_sum",
        )
    )


def stream_session_stats(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    gap: str = GAP,
    watermark: str = "1 hour",
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Streaming session windows with a watermark: a session is emitted
    (append mode, exactly once) when the watermark passes its end —
    i.e. when no in-order event can extend it. State per key is the
    open session only, O(active users)."""
    events = _events_stream(spark, events_dir, max_files_per_trigger)
    sessions = session_stats(events.withWatermark("ts", watermark), gap)
    return (
        sessions.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
