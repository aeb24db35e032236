"""Streaming distinct-token cardinality — the STATEFUL streaming twin
of queries/textops.hll_distinct_tokens.

The batch sketch's registers merge by MAX, which makes it the textbook
continuous-ingest statistic: per micro-batch the raw (bucket, rho)
observations fold into a per-language 1024-register state row
(``GroupState``), and the emitted estimate after ANY sequence of drops
equals the batch query over the union of everything seen — asserted in
tests/test_streaming_hll.py, including across a query restart (the
registers live in the state checkpoint) and against out-of-order
arrival (max-merge is commutative, so ingestion order cannot matter).

Plumbing:

- (lang, bucket, rho) observations are computed MAP-SIDE on the
  micro-batch by the SAME Column expressions as batch
  (queries/textops.hll_token_registers — shared, so the contract
  cannot diverge);
- ``groupBy(lang).applyInPandasWithState`` maxes them into the stored
  register array — one state row per language, m=1024 ints, bounded
  forever, no watermark needed;
- the estimate replays the batch arithmetic on python IEEE doubles
  (same literals, same left-associative ops, scaled-BIGINT harmonic
  sum, linear-counting branch), so a single-drop run is BIT-IDENTICAL
  to the batch query's estimate column.

At scale the state is |langs| * m ints — the whole point of sketching
a 10^12-token stream: constant memory per key, shard-by-key
parallelism, and mergeability if streams are later unioned.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..queries._portable import words_col
from ..queries.textops import HLL_M, _HLL_SCALE, _HLL_SUFFIX_BITS, hll_token_registers

HLL_STREAM_SCHEMA = "lang string, n_registers long, hll_estimate double"
_REG_STATE_SCHEMA = "regs array<int>"

# alpha_m * m^2 * 2^51 — the SAME left-associative literal expression
# as queries/textops._HLL_NUMERATOR, evaluated on python IEEE doubles.
_NUMERATOR = (
    0.7213 / (1.0 + 1.079 / float(HLL_M)) * float(HLL_M) * float(HLL_M) * float(_HLL_SCALE)
)


def _estimate(regs: list[int]) -> tuple[int, float]:
    import math

    n_registers = sum(1 for r in regs if r > 0)
    s_total = (HLL_M - n_registers) * _HLL_SCALE + sum(
        1 << (_HLL_SUFFIX_BITS + 1 - r) for r in regs if r > 0
    )
    raw = _NUMERATOR / float(s_total)
    n_zero = HLL_M - n_registers
    if n_zero > 0 and raw <= 2.5 * float(HLL_M):
        return n_registers, float(HLL_M) * math.log(float(HLL_M) / float(n_zero))
    return n_registers, raw


def _merge_lang(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    regs = list(state.get[0]) if state.exists else [0] * HLL_M
    for pdf in pdfs:
        # per-batch pre-reduction, then max-merge into the state row
        for bucket, rho in pdf.groupby("bucket")["rho"].max().items():
            b = int(bucket)
            if rho > regs[b]:
                regs[b] = int(rho)
    state.update((regs,))
    n_registers, est = _estimate(regs)
    yield pd.DataFrame(
        {"lang": [key[0]], "n_registers": [n_registers], "hll_estimate": [round(est, 4)]}
    )


def stream_hll_distinct(
    spark: SparkSession,
    docs_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Continuously estimate per-language distinct tokens over document
    parquet files landing in ``docs_dir`` (schema: doc_id long,
    text string, lang string); emits the running estimate per language
    per micro-batch into ``out_dir`` (idempotent per-batch overwrite,
    batch_id partition — read the max batch_id per lang for the
    current value)."""
    reader = spark.readStream.schema("doc_id long, text string, lang string")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    docs = reader.parquet(docs_dir)
    toks = docs.select("lang", F.explode(words_col(F.col("text"))).alias("token"))
    merged: Any = hll_token_registers(toks).groupBy("lang").applyInPandasWithState(
        _merge_lang,
        HLL_STREAM_SCHEMA,
        _REG_STATE_SCHEMA,
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
