"""Stream-STREAM join — the attribution cell of the streaming matrix:
two live event streams (views and purchases here) joined on user_id
within an event-time window, the canonical "which impression led to
this conversion" shape.

This is the one Structured Streaming pattern the rest of the matrix
does not exercise: both join sides are unbounded, so Spark buffers
rows in the state store until the OTHER side can no longer produce a
match. That bound comes from two declarations, both required for
bounded state:

- a watermark on each input (how late a row may arrive), and
- an event-time RANGE predicate in the join condition (how far apart
  matching rows may be).

Together they let the state store evict a buffered view once
`watermark > view.ts + JOIN_WINDOW` — without the range predicate the
state grows forever (Spark accepts the query but warns; at 10^12
events it is a slow OOM). Exactly-once restarts come from the file
sink's transaction log plus the checkpointed join state, and the
batch twin (`batch_attribution_join`, the same predicate on static
frames) is the parity oracle for single-drop availableNow runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

JOIN_WINDOW = "60 minutes"
LATE_LIMIT = "120 minutes"

_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"

_JOIN_COND = (
    "a.user_id = b.user_id AND "
    f"b.ts BETWEEN a.ts - INTERVAL {JOIN_WINDOW} AND a.ts + INTERVAL {JOIN_WINDOW}"
)


def _joined(a: DataFrame, b: DataFrame) -> DataFrame:
    out = a.alias("a").join(b.alias("b"), F.expr(_JOIN_COND))
    return out.select(
        F.col("a.user_id").alias("user_id"),
        F.col("a.event_id").alias("view_id"),
        F.col("b.event_id").alias("purchase_id"),
        (F.unix_micros(F.col("b.ts")) - F.unix_micros(F.col("a.ts"))).alias("gap_us"),
    )


def stream_attribution_join(
    spark: SparkSession,
    views_dir: str,
    purchases_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Join two parquet-file streams (schema: event_id, ts, user_id,
    event_type, value) on user_id within JOIN_WINDOW of event time;
    appends (user_id, view_id, purchase_id, gap_us) rows."""
    a = (
        spark.readStream.schema(_SCHEMA)
        .parquet(views_dir)
        .withWatermark("ts", LATE_LIMIT)
    )
    b = (
        spark.readStream.schema(_SCHEMA)
        .parquet(purchases_dir)
        .withWatermark("ts", LATE_LIMIT)
    )
    writer = (
        _joined(a, b)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def batch_attribution_join(views: DataFrame, purchases: DataFrame) -> DataFrame:
    """The batch twin: identical predicate on static frames (parity
    oracle for single-drop streaming runs)."""
    return _joined(views, purchases)
