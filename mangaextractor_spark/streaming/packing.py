"""Streaming training-sequence packing — the STATEFUL streaming twin
of queries/corpus_prep.sequence_packing.

Batch packing is a per-bucket prefix sum; the streaming form must
remember, per bucket, where the packed token stream currently ends so
that docs arriving in later micro-batches continue at the right
offset. That running cursor is exactly a ``GroupState``:

- tokens/bucket are computed MAP-SIDE on the micro-batch (words_col +
  phash60, the identical expressions as batch);
- ``groupBy(bucket).applyInPandasWithState`` assigns start offsets by
  cumulative sum from the bucket's stored cursor, then advances it —
  one state row per bucket (PACK_BUCKETS rows total, bounded forever,
  no watermark needed);
- rows within a micro-batch are ordered by doc_id before assignment,
  so a single-batch (availableNow over one drop) run is BIT-IDENTICAL
  to the batch operator — asserted in tests/test_streaming_packing.py
  — and a restart resumes offsets from the checkpointed cursor.

This is the engine's demonstration case for "custom stateful
operator": unlike windowed aggregation (streaming/windowed.py) the
state is not an aggregate but a CURSOR that orders output, which no
built-in streaming aggregation expresses.

At scale the bucket count is the parallelism knob exactly as in batch
(state shards by group key); ordering ACROSS micro-batches follows
arrival order, which is the defining semantic difference from the
batch twin (documented, not hidden).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..queries._portable import phash60, words_col
from ..queries.corpus_prep import PACK_BUCKETS, SEQ_LEN

PACKED_SCHEMA = (
    "doc_id long, bucket int, n_tokens int, start_offset long, seq_id long"
)
_CURSOR_SCHEMA = "next_offset long"


def _tokenized(docs: DataFrame, n_buckets: int = PACK_BUCKETS) -> DataFrame:
    """Map-side token counts + bucket ids — the same expressions as the
    batch operator (queries/corpus_prep.py:_packing_frame), sharing its
    ``n_buckets`` parallelism knob."""
    return docs.select(
        "doc_id",
        F.size(words_col(F.col("text"))).cast("int").alias("n_tokens"),
        (phash60(F.col("doc_id").cast("string")) % n_buckets)
        .cast("int")
        .alias("bucket"),
    )


def _make_packer(seq_len: int):
    """Cursor-state packer for a given sequence length; the token cost
    column is whatever the upstream frame put in ``n_tokens`` (word
    counts for the text twin, multimodal costs for the MM twin)."""

    def _pack_bucket(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        cursor = state.get[0] if state.exists else 0
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values("doc_id", kind="mergesort").reset_index(drop=True)
        ends = pdf["n_tokens"].cumsum()
        starts = cursor + ends.shift(fill_value=0)
        state.update((int(cursor + int(ends.iloc[-1])) if len(pdf) else cursor,))
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "bucket": key[0],
                "n_tokens": pdf["n_tokens"],
                "start_offset": starts.astype("int64"),
                "seq_id": (starts // seq_len).astype("int64"),
            }
        )

    return _pack_bucket


_pack_bucket = _make_packer(SEQ_LEN)


def stream_sequence_packing(
    spark: SparkSession,
    docs_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
    n_buckets: int = PACK_BUCKETS,
) -> StreamingQuery:
    """Continuously pack documents landing as parquet files in
    ``docs_dir`` (schema: doc_id long, text string, ...) into
    per-bucket token streams; emits one packed row per doc per batch.
    ``n_buckets`` mirrors the batch operator's knob — state is one
    cursor row per bucket, so it also bounds the state store size."""
    reader = spark.readStream.schema("doc_id long, text string")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    docs = reader.parquet(docs_dir)
    packed: Any = _tokenized(docs, n_buckets).groupBy("bucket").applyInPandasWithState(
        _pack_bucket,
        PACKED_SCHEMA,
        _CURSOR_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
    return _start_packing_writer(packed, out_dir, checkpoint_dir, available_now)


def _start_packing_writer(
    packed: Any, out_dir: str, checkpoint_dir: str, available_now: bool
) -> StreamingQuery:
    """Shared sink discipline for both packing twins: idempotent
    per-batch overwrite (a replayed batch rewrites its own directory,
    same rule as streaming/ingest.py) under an update-mode foreachBatch
    with the state checkpoint."""

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        batch.write.mode("overwrite").parquet(f"{out_dir}/batch_id={batch_id}")

    writer = (
        packed.writeStream.foreachBatch(write_batch)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# --- multimodal twin ------------------------------------------------------

MM_PACKED_SCHEMA = (
    "doc_id string, bucket int, n_tokens long, start_offset long, seq_id long"
)

SPANS_DDL = (
    "doc_id string, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
)


def stream_mm_packing(
    spark: SparkSession,
    docs_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
    n_buckets: int | None = None,
) -> StreamingQuery:
    """Streaming twin of queries/mm_packing.multimodal_packing:
    interleaved (doc_id, spans[]) documents landing as parquet are
    packed under the MULTIMODAL cost model (text words + image patch
    tokens + sentinels, the identical map-side expressions as the
    batch operator via mm_costs_df), with the same one-cursor-row-per-
    bucket GroupState as the text twin — only the cost frame and the
    sequence length differ. Output column ``n_tokens`` carries the
    multimodal cost (mm_tokens in the batch twin)."""
    from ..queries.mm_packing import MM_PACK_BUCKETS, MM_SEQ_LEN, mm_costs_df

    buckets = n_buckets or MM_PACK_BUCKETS
    reader = spark.readStream.schema(SPANS_DDL)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    docs = reader.parquet(docs_dir)
    frame = mm_costs_df(docs).select(
        "doc_id",
        F.col("mm_tokens").cast("long").alias("n_tokens"),
        (phash60(F.col("doc_id")) % buckets).cast("int").alias("bucket"),
    )
    packed: Any = frame.groupBy("bucket").applyInPandasWithState(
        _make_packer(MM_SEQ_LEN),
        MM_PACKED_SCHEMA,
        _CURSOR_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
    return _start_packing_writer(packed, out_dir, checkpoint_dir, available_now)
