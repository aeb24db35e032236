"""Streaming training-shard manifest — the STATEFUL streaming twin of
queries/corpus_prep.shard_plan.

Every manifest column is an ADDITIVE BIGINT (doc count, token sum,
char sum, fingerprint sum mod 1e9+7) — commutative and associative, so
continuous ingestion is exact: per micro-batch the docs pre-aggregate
by shard map-side, the per-shard partial sums fold into a GroupState
row, and the emitted manifest after ANY sequence of drops equals the
batch shard_plan over the union of everything seen — asserted in
tests/test_streaming_shard.py, including across a query restart (the
sums live in the state checkpoint) and out-of-order arrival (addition
cannot care). load_ratio is deliberately NOT part of the streamed row:
it is a ratio against the global total, which the reader derives from
the latest row per shard (a 16-row frame) — streaming it would make
every shard's row change on every batch for no information.

Plumbing mirrors streaming/hll.py:

- shard assignment / token count / fingerprint are the SAME Column
  expressions as the batch query (queries/corpus_prep.shard_col and
  friends — shared, so the contract cannot diverge);
- ``groupBy(shard).applyInPandasWithState`` adds the batch partials
  into the stored (n_docs, n_tokens, n_chars, fp_sum) state row — one
  row per shard, bounded forever (N_SHARDS keys), no watermark;
- the sink is the idempotent per-batch-overwrite parquet discipline
  (batch_id partition; replayed batches rewrite their own directory).

At scale the state is N_SHARDS rows of four ints — the manifest a
trainer validates against is maintained continuously during ingestion
instead of recomputed by a full corpus pass.
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
from ..queries.corpus_prep import _FP_MOD, shard_col

SHARD_STREAM_SCHEMA = (
    "shard long, n_docs long, n_tokens long, n_chars long, manifest_fp long"
)
_SHARD_STATE_SCHEMA = "n_docs long, n_tokens long, n_chars long, fp_sum long"


def _fold_shard(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n_docs, n_tokens, n_chars, fp_sum = state.get if state.exists else (0, 0, 0, 0)
    for pdf in pdfs:
        n_docs += int(pdf["b_docs"].sum())
        n_tokens += int(pdf["b_tokens"].sum())
        n_chars += int(pdf["b_chars"].sum())
        fp_sum += int(pdf["b_fp"].sum())
    state.update((n_docs, n_tokens, n_chars, fp_sum))
    yield pd.DataFrame(
        {
            "shard": [key[0]],
            "n_docs": [n_docs],
            "n_tokens": [n_tokens],
            "n_chars": [n_chars],
            "manifest_fp": [fp_sum],
        }
    )


def stream_shard_manifest(
    spark: SparkSession,
    docs_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Continuously maintain the per-shard training manifest over
    document parquet files landing in ``docs_dir`` (schema: doc_id
    long, text string, n_chars long); emits the running manifest row
    for every shard the micro-batch touched into ``out_dir``
    (idempotent per-batch overwrite, batch_id partition — read the max
    batch_id per shard for the current manifest)."""
    reader = spark.readStream.schema("doc_id long, text string, n_chars long")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    docs = reader.parquet(docs_dir)
    per_doc = docs.select(
        shard_col().alias("shard"),
        F.lit(1).cast("long").alias("b_docs"),
        F.size(words_col(F.col("text"))).cast("long").alias("b_tokens"),
        F.col("n_chars").cast("long").alias("b_chars"),
        F.pmod(phash60(F.col("doc_id").cast("string")), F.lit(_FP_MOD)).alias("b_fp"),
    )
    merged: Any = per_doc.groupBy("shard").applyInPandasWithState(
        _fold_shard,
        SHARD_STREAM_SCHEMA,
        _SHARD_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        batch.write.mode("overwrite").parquet(f"{out_dir}/batch_id={batch_id}")

    writer = (
        merged.writeStream.foreachBatch(write_batch)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
