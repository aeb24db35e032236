"""Structured Streaming ingest: continuously-arriving document files ->
extracted span table, exactly-once.

The reference has no streaming (its closest analog is the batch-list
queue, gui/window.py:221-266, and the `concluido/` resume marker);
this module is the engine's forward-looking ingest mode: new document
parquet files landing in a directory are picked up by a file stream,
each micro-batch runs the SAME batch pipeline (pipeline/extract), and
spans append transactionally under a streaming checkpoint — so a
killed stream resumes at the exact batch boundary without duplicating
spans (the streaming twin of pipeline/checkpoint's chunk lineage).

Safe by construction: a document is ONE row of the input table (its
spans are an array), so no document ever straddles a micro-batch and
the per-doc `order` window needs no cross-batch state. Late/updated
docs are handled upstream by the Iceberg snapshot the files come from.

On a cluster the sink is an Iceberg table (`.toTable(...)`) and the
trigger is `processingTime`; tests use `availableNow` (drain existing
files, then stop) with a parquet sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..pipeline.extract import extract_spans

DOCS_SCHEMA = (
    "doc_id string, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
)


def stream_extract(
    spark: SparkSession,
    docs_dir: str,
    media: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    engine: str = "glyph",
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Start the streaming extraction over parquet files in ``docs_dir``.

    ``media`` is the static media table (stream-static join inside
    ``extract_spans``: the span-metadata side broadcasts per batch, the
    media scan is reused). Returns the running query; callers
    ``awaitTermination()`` it.
    """
    reader = spark.readStream.schema(DOCS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    docs_stream = reader.parquet(docs_dir)

    def process_batch(batch_docs: DataFrame, batch_id: int) -> None:
        if batch_docs.isEmpty():
            return
        spans = extract_spans(batch_docs, media, engine=engine)
        spans.write.mode("append").parquet(out_dir)

    writer = (
        docs_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
