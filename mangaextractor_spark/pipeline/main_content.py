"""Chunked, lineage-tracked execution of the interleaved main-content
pipeline (queries/main_content.py) — the north_rule's resumability
contract ("every stage writes per-partition lineage rows ... a killed
job resumes at partition granularity") applied to the text flagship,
exactly as pipeline/checkpoint.py applies it to the OCR flagship.

The transform itself is map-side (array ops + one explode, zero
exchanges), so the unit of commit is a HASH CHUNK of doc_id: each chunk
writes its spans to ``{out}/spans/chunk=N`` (idempotent overwrite) and
then appends one lineage row (doc range, span counts by kind, dropped
count, wall ms). Resume anti-joins completed chunk ids from the lineage
table, just like the OCR runner.

Scale story (10^12 docs): on a cluster the input is an Iceberg table
bucket-partitioned by doc_id, so a chunk's filter prunes to its bucket
partitions — per-chunk reads cost only their own bytes. Raw unbucketed
parquet would instead re-scan the source once per chunk, so the sandbox
runner mirrors the OCR runner's staging step: ONE pass stamps the chunk
id and writes ``{out}/_staged`` partitioned by chunk (committed via a
manifest marker, so a kill mid-staging re-materializes); every chunk
iteration after that is a pruned directory read. On Iceberg the staging
step disappears — the bucket layout IS the staging.

Reference parity: resume-by-marker mirrors the reference's
`concluido/` directory move (reference core/processor.py:252-254,
331-338); the per-chunk stats mirror its per-directory page/bubble
logging.
"""

from __future__ import annotations

import json
import time
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries.main_content import main_content_spans_df
from .checkpoint import ChunkFailure, _completed, _lineage_dir

MC_LINEAGE_SCHEMA = (
    "run_id string, chunk int, status string, n_docs long, n_spans long, "
    "n_text long, n_image long, n_dropped long, "
    "doc_id_min string, doc_id_max string, wall_ms long"
)


def completed_mc_chunks(spark: SparkSession, out_dir: str) -> set[int]:
    return _completed(spark, out_dir, "mc_done")


def run_main_content(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    n_chunks: int = 8,
    fail_on_chunk: int | None = None,
    run_id: str | None = None,
    input_is_chunked: bool = False,
) -> DataFrame:
    """Execute main-content extraction chunk-by-chunk with lineage;
    returns the final span DataFrame (also at ``{out_dir}/spans``).

    ``docs`` is the north_rule interleaved table
    (doc_id string, spans array<struct<kind,text,media_ref,offset>>).
    ``fail_on_chunk`` injects a failure before that chunk commits (for
    the kill/resume tests). Chunk writes are idempotent overwrites, so
    a chunk that died mid-write is simply redone on resume.

    ``input_is_chunked=True`` declares that ``docs`` already carries an
    int ``chunk`` column in ``[0, n_chunks)`` backed by a pruned layout
    (an Iceberg table bucket-partitioned on doc_id, or a parquet
    directory partitioned by chunk) — the staging rewrite is SKIPPED
    entirely, which is the production shape: the table layout IS the
    staging, and per-chunk filters prune to their own partitions.
    """
    run_id = run_id or uuid.uuid4().hex[:12]
    staged_dir = f"{out_dir}/_staged"
    manifest_path = Path(out_dir) / "_mc_manifest.json"
    if manifest_path.exists():
        stored = json.loads(manifest_path.read_text())
        if stored["n_chunks"] != n_chunks:
            # Same guard as the OCR runner: the staged chunk domain is
            # baked in; resuming with a different n_chunks would drop
            # or re-bucket docs silently.
            raise ChunkFailure(
                f"staging at {staged_dir} was materialized with n_chunks="
                f"{stored['n_chunks']}, but this run requested "
                f"{n_chunks}; rerun with n_chunks={stored['n_chunks']} "
                "or a fresh out_dir."
            )
        if stored.get("input_is_chunked", False) != input_is_chunked:
            raise ChunkFailure(
                f"staging mode at {out_dir} changed between runs "
                "(input_is_chunked flipped); use a fresh out_dir."
            )
    elif input_is_chunked:
        if "chunk" not in docs.columns:
            raise ChunkFailure(
                "input_is_chunked=True but `docs` has no chunk column"
            )
        manifest_path.parent.mkdir(parents=True, exist_ok=True)
        manifest_path.write_text(
            json.dumps({"n_chunks": n_chunks, "input_is_chunked": True})
        )
    else:
        (
            docs.withColumn(
                "chunk", F.pmod(F.xxhash64("doc_id"), F.lit(n_chunks)).cast("int")
            )
            .write.partitionBy("chunk")
            .mode("overwrite")
            .parquet(staged_dir)
        )
        # manifest written LAST = the staging commit marker
        manifest_path.write_text(json.dumps({"n_chunks": n_chunks}))
    staged = docs if input_is_chunked else spark.read.parquet(staged_dir)
    done = completed_mc_chunks(spark, out_dir)
    if done == set(range(n_chunks)):
        return spark.read.parquet(f"{out_dir}/spans")
    # Driver-side cost discipline: the html-chain expression tree costs
    # seconds of py4j construction + analysis, so the transform plan is
    # built ONCE with the chunk id riding through as a passthrough
    # column; each iteration only adds a partition filter (pushed down
    # to the staged scan — pruning is plan-asserted in the tests).
    # Likewise all chunks' input span counts come from ONE upfront job
    # instead of one scan per chunk.
    n_in_by_chunk = {
        r["chunk"]: r["n"]
        for r in staged.groupBy("chunk").agg(F.sum(F.size("spans")).alias("n")).collect()
    }
    spans_all = main_content_spans_df(staged, passthrough=("chunk",))
    for chunk in range(n_chunks):
        if chunk in done:
            continue
        if fail_on_chunk == chunk:
            raise ChunkFailure(f"injected failure before chunk {chunk} committed")
        t0 = time.monotonic()
        spans = spans_all.filter(F.col("chunk") == chunk).drop("chunk")
        spans.write.mode("overwrite").parquet(f"{out_dir}/spans/chunk={chunk}")
        # stats come from what was actually COMMITTED, not the plan
        written = spark.read.parquet(f"{out_dir}/spans/chunk={chunk}")
        st = written.agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.when(F.col("kind") == "text", 1).otherwise(0)).alias("n_text"),
            F.sum(F.when(F.col("kind") == "image", 1).otherwise(0)).alias("n_image"),
            F.min("doc_id").alias("doc_id_min"),
            F.max("doc_id").alias("doc_id_max"),
        ).first()
        n_in = n_in_by_chunk.get(chunk, 0)
        spark.createDataFrame(
            [
                (
                    run_id,
                    chunk,
                    "mc_done",
                    st.n_docs,
                    st.n_spans,
                    st.n_text or 0,
                    st.n_image or 0,
                    (n_in or 0) - st.n_spans,
                    st.doc_id_min or "",
                    st.doc_id_max or "",
                    int((time.monotonic() - t0) * 1000),
                )
            ],
            MC_LINEAGE_SCHEMA,
        ).write.mode("append").parquet(_lineage_dir(out_dir))
    return spark.read.parquet(f"{out_dir}/spans")
