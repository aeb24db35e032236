"""Streaming Bloom-filter decontamination — the batch sketch probed by
a continuous stream, i.e. the STREAM-STATIC join cell of the streaming
matrix (ingest = foreachBatch overwrite; windowed/stateful aggs;
bounded-state dedup; stateless file-sink maps; GroupState packing/HLL;
and now a static broadcast frame joined into every micro-batch).

The register table is built ONCE in batch from the base corpus
(queries/scale_ops.bloom_register_row — one map-side-combined BIT_OR
groupBy folded to a single map<word, bits> row, persist()ed so
micro-batches reuse the materialized sketch instead of re-scanning the
base corpus), then every arriving document probes it entirely map-side
(queries/scale_ops.bloom_probe_frame — the SAME function the batch
parity test runs, so stream/batch agreement is by construction). No
aggregation, no watermark, no state store: exactly-once comes from the
native file sink's transaction log, and a restart resumes from the
checkpoint without reprobing committed files.

At 10^12 docs the static side stays a single broadcast row (the filter
is constant-size in the corpus), so each micro-batch costs one scan of
its own files — the screen a crawl ingest runs BEFORE paying the full
incremental_dedup shuffle for candidates that are certainly fresh
(Bloom misses are definitive; only hits go to the exact check).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..queries.scale_ops import bloom_probe_frame, bloom_register_row


def stream_bloom_gate(
    spark: SparkSession,
    docs_dir: str,
    register_row: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Continuously probe documents (schema: doc_id long, text string)
    landing in ``docs_dir`` against a prebuilt Bloom register row;
    appends (doc_id, content_hash, bloom_hit) rows to ``out_dir``."""
    reader = spark.readStream.schema("doc_id long, text string")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    docs = reader.parquet(docs_dir)
    writer = (
        bloom_probe_frame(docs, register_row)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def build_register_from_parquet(spark: SparkSession, base_dir: str) -> DataFrame:
    """Convenience: fold a base corpus parquet (doc_id, text, ...) into
    the one-row register frame (distinct content hashes first)."""
    from pyspark.sql import functions as F

    base = (
        spark.read.parquet(base_dir)
        .select(F.md5(F.col("text").cast("binary")).alias("content_hash"))
        .distinct()
    )
    return bloom_register_row(base)
