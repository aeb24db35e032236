"""Streaming near-duplicate gate — the MinHash-LSH-band Bloom screen
run continuously over arriving documents (11th cell of the streaming
matrix; the near-dup sibling of the exact-hash bloom_gate).

The register is built ONCE in batch from the base corpus
(queries/minhash_gate.band_register_row — one map-side signature pass
folded to a single constant-size map<word, bits> row, persist()ed),
then every arriving document computes its band signatures and probes
them entirely map-side (queries/minhash_gate.minhash_gate_frame — the
SAME function the batch query and parity test run, so stream/batch
agreement is by construction). No aggregation, no watermark, no state
store: exactly-once comes from the native file sink's transaction
log, and a restart resumes from the checkpoint without regating
committed files.

Semantics at the ingest frontier: a doc whose bands all miss the
register shares no complete LSH band with any base doc — it is
certainly not an LSH near-dup candidate and flows straight to the
corpus; only flagged docs pay the exact near-dup ladder
(minhash_join / dedup_clusters) against the base. At 10^12 base docs
the register is still one broadcast row, so the gate's cost is one
scan of each micro-batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..queries.minhash_gate import minhash_gate_frame


def stream_minhash_gate(
    spark: SparkSession,
    docs_dir: str,
    register_row: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Continuously gate documents (schema: doc_id long, text string)
    landing in ``docs_dir`` against a prebuilt band-signature Bloom
    register; appends (doc_id, n_bands, n_hot_bands,
    near_dup_candidate) rows to ``out_dir``."""
    reader = spark.readStream.schema("doc_id long, text string")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    docs = reader.parquet(docs_dir)
    writer = (
        minhash_gate_frame(docs, register_row)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
