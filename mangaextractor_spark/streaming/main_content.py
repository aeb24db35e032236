"""Streaming main-content extraction — the north_rule interleaved
pipeline (queries/main_content.py) as a continuous job.

The batch transformation is stateless and map-side (array higher-order
functions + one Generate, zero exchanges), which makes its streaming
form the easy case of the engine's streaming matrix:

- no state store, no watermark (nothing aggregates across rows);
- the SAME function (``main_content_spans_df``) is applied to the
  micro-batch DataFrame — batch/stream parity is by construction,
  asserted in tests/test_streaming_main_content.py;
- exactly-once comes from Spark's native FILE SINK transaction log
  (per-batch manifest under ``_spark_metadata``): an append-only
  map-side transform needs no foreachBatch-overwrite choreography,
  unlike the OCR pipeline (streaming/ingest.py) whose per-batch
  overwrite-by-batch_id exists because its output is re-derived per
  chunk. One engine, two sink disciplines, each matched to the
  transform's replay semantics.

On a cluster the sink is an Iceberg table append (`.toTable`) with the
same per-batch atomicity.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..queries.main_content import main_content_spans_df
from .ingest import DOCS_SCHEMA


def stream_main_content(
    spark: SparkSession,
    docs_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Continuously extract main-content spans from interleaved-doc
    parquet files landing in ``docs_dir`` into ``out_dir``."""
    reader = spark.readStream.schema(DOCS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    docs = reader.parquet(docs_dir)
    writer = (
        main_content_spans_df(docs)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
