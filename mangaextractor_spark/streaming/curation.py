"""Streaming quality gating — the gopher-rule gate as a continuous
job over documents landing as parquet files.

The gate is pure map-side column arithmetic (queries/corpus_prep.py's
``_gopher_frame`` — the SAME function, so batch/stream parity is by
construction), which makes this the stateless easy case of the
streaming matrix, like streaming/main_content.py: no state store, no
watermark, exactly-once from the native file sink's transaction log.
Every doc flows through with its metrics and keep flag; the sink table
is the curation front-door a continuous ingestion pipeline filters on
downstream (`WHERE keep = 1`), keeping the reject rows queryable for
funnel accounting instead of dropping them in flight.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..queries.corpus_prep import _gopher_frame


def stream_quality_gate(
    spark: SparkSession,
    docs_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Continuously score documents (schema: doc_id long, text string)
    landing in ``docs_dir``; appends (doc_id, metrics..., keep) rows."""
    reader = spark.readStream.schema("doc_id long, text string")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    docs = reader.parquet(docs_dir)
    writer = (
        _gopher_frame(docs)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
