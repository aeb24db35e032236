"""Structured Streaming ingest: continuously-arriving document files ->
extracted span table, exactly-once.

The reference has no streaming (its closest analog is the batch-list
queue, gui/window.py:221-266, and the `concluido/` resume marker);
this module is the engine's forward-looking ingest mode: new document
parquet files landing in a directory are picked up by a file stream,
and each micro-batch runs the SAME batch pipeline (pipeline/extract).

Exactly-once = checkpointed batch ids x IDEMPOTENT batch commits: each
micro-batch overwrites its own ``out_dir/batch_id=N`` partition
directory (the same overwrite-by-key trick as the chunk runner,
pipeline/checkpoint.py). foreachBatch alone is only at-least-once — a
crash between a blind append and the checkpoint commit would replay
the batch and duplicate spans; with per-batch overwrite the replay
rewrites the identical directory instead. On a cluster the sink is an
Iceberg table written via ``overwritePartitions`` keyed on batch_id.

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


def batch_committer(media: DataFrame, out_dir: str, engine: str = "glyph"):
    """Idempotent per-micro-batch commit: extract the batch's spans and
    OVERWRITE ``out_dir/batch_id=N``. Replaying a batch (crash between
    sink write and checkpoint commit) rewrites the same directory — no
    duplicates. Module-level so tests can replay a batch directly."""

    def process_batch(batch_docs: DataFrame, batch_id: int) -> None:
        if batch_docs.isEmpty():
            return
        spans = extract_spans(batch_docs, media, engine=engine)
        spans.write.mode("overwrite").parquet(f"{out_dir}/batch_id={batch_id}")

    return process_batch


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

    writer = (
        docs_stream.writeStream.foreachBatch(batch_committer(media, out_dir, engine))
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
