"""Chunked execution with per-partition lineage + resume.

The reference's resume marker is moving a processed directory to
`concluido/` and skipping it on the next run (reference
core/processor.py:252-254,331-338, S7) plus page-identity upsert keys
(db_util.py:59). The engine equivalent: the expensive kernel stage is
executed in content-addressed CHUNKS (chunk = hash-bucket of
media_ref); each completed chunk commits (a) its OCR output to a
chunk-partitioned table and (b) a lineage row with doc ranges, span
counts and bubble stats. A killed run resumes by anti-joining
completed chunk ids — partition-granular resumability per north_rule.

On a cluster both tables are Iceberg (`writeTo(...).append()` with
snapshot isolation); the sandbox uses parquet directories with the
same layout. Chunk writes are idempotent (overwrite-by-chunk), so a
chunk that failed mid-write is simply redone.
"""

from __future__ import annotations

import json
import time
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .extract import number_spans, ocr_pages

LINEAGE_SCHEMA = (
    "run_id string, chunk int, status string, n_pages long, n_docs long, "
    "n_bubbles long, n_empty long, n_failed_pages long, "
    "doc_id_min string, doc_id_max string, wall_ms long"
)


class ChunkFailure(RuntimeError):
    pass


def _lineage_dir(out_dir: str) -> str:
    return f"{out_dir}/_lineage"


def completed_chunks(spark: SparkSession, out_dir: str) -> set[int]:
    return _completed(spark, out_dir, "done")


def covers_completed(spark: SparkSession, out_dir: str) -> bool:
    return bool(_completed(spark, out_dir, "covers_done"))


def _completed(spark: SparkSession, out_dir: str, status: str) -> set[int]:
    path = Path(_lineage_dir(out_dir))
    if not any(path.glob("*.parquet")) and not any(path.glob("**/*.parquet")):
        return set()
    rows = (
        spark.read.parquet(str(path))
        .filter(F.col("status") == status)
        .select("chunk")
        .distinct()
        .collect()
    )
    return {r.chunk for r in rows}


def run_extraction(
    spark: SparkSession,
    docs: DataFrame,
    media: DataFrame,
    out_dir: str,
    n_chunks: int = 8,
    engine: str = "glyph",
    fail_on_chunk: int | None = None,
    run_id: str | None = None,
    furigana: bool = False,
    robust: bool = False,
    include_covers: bool = False,
) -> DataFrame:
    """Execute the pipeline chunk-by-chunk with lineage; returns the
    final numbered span DataFrame (also written to ``{out_dir}/spans``).

    ``fail_on_chunk`` injects a failure before that chunk commits —
    used by the resume tests (kill mid-run, rerun, verify completed
    chunks are skipped and output equals a clean run). ``-1`` injects
    it after all OCR chunks but before the covers commit.

    ``include_covers=True`` additionally runs the S6 cover pipeline:
    capa-marked media rows are staged alongside the page table (so a
    resumed run never rescans the media source for covers either),
    thumbnailed/upserted into ``{out_dir}/covers``, and committed under
    a ``covers_done`` lineage row (chunk = -1) that resume honors like
    any chunk.

    Cover-failure contract (NO RETRY): a cover whose bytes fail to
    decode is committed as a NULL-byte marker row and counted in the
    ``covers_done`` lineage row's ``n_failed`` — a later resume does
    NOT retry it, exactly as a failed page inside a committed OCR chunk
    is not retried. This is deliberate: staged cover bytes are
    immutable (re-decoding the same bytes fails the same way), so an
    automatic retry loop could never terminate on a genuinely corrupt
    cover. Transient-failure recovery is explicit instead: check
    ``n_failed`` in the lineage table and rerun with a fresh
    ``out_dir`` (or delete the ``covers_done`` row + ``covers/`` dir)
    to force reprocessing.
    """
    run_id = run_id or uuid.uuid4().hex[:12]
    spans = docs.select("doc_id", F.explode("spans").alias("sp")).select(
        "doc_id", "sp.kind", "sp.text", "sp.media_ref", "sp.offset"
    )
    # SINGLE-PASS materialization: the docs-media join runs ONCE, writing
    # the page table physically partitioned by chunk; every per-chunk
    # iteration below then reads only its own partition directory
    # (partition pruning), instead of re-scanning the media table and
    # re-executing the join once per chunk (n_chunks x the input IO).
    # The _SUCCESS marker makes the materialization itself resumable: a
    # run killed mid-chunk-loop reuses the committed page table, so a
    # resumed run performs ZERO media scans. (Iceberg: this is the
    # bucket-partitioned staging table; out_dir is per run-config, so
    # the staging content is never stale for its lineage.)
    pages_dir = f"{out_dir}/_pages"
    capa_dir = f"{out_dir}/_capa"
    manifest_path = Path(out_dir) / "_staging_manifest.json"
    if manifest_path.exists():
        # Staging-reuse guard (resume correctness): the chunk domain of
        # the staged page table is baked in at materialization time —
        # resuming with a smaller n_chunks would silently never process
        # pages whose stored chunk >= n_chunks. Fail fast instead of
        # trusting the out_dir-is-per-run-config convention.
        stored = json.loads(manifest_path.read_text())
        if stored["n_chunks"] != n_chunks:
            raise ChunkFailure(
                f"staging at {pages_dir} was materialized with n_chunks="
                f"{stored['n_chunks']}, but this run requested n_chunks="
                f"{n_chunks}; resuming would drop or re-bucket pages. "
                f"Rerun with n_chunks={stored['n_chunks']} or a fresh out_dir."
            )
        if include_covers and not stored.get("covers", False):
            raise ChunkFailure(
                f"staging at {out_dir} was materialized without cover "
                "candidates; rerun with a fresh out_dir to include covers."
            )
    else:
        if include_covers:
            from ..functions.covers import cover_candidates

            cover_candidates(media).select("media_ref", "image_bytes").write.mode(
                "overwrite"
            ).parquet(capa_dir)
        (
            spans.filter(F.col("kind") == "image")
            .select("doc_id", "offset", "media_ref")
            .join(media.select("media_ref", "image_bytes"), "media_ref")
            .withColumn("chunk", F.pmod(F.xxhash64("media_ref"), F.lit(n_chunks)).cast("int"))
            .write.partitionBy("chunk")
            .mode("overwrite")
            .parquet(pages_dir)
        )
        # The manifest is the staging commit marker: written LAST, so a
        # run killed mid-staging re-materializes everything above.
        manifest_path.write_text(json.dumps({"n_chunks": n_chunks, "covers": include_covers}))
    pages = spark.read.parquet(pages_dir)
    done = completed_chunks(spark, out_dir)
    for chunk in range(n_chunks):
        if chunk in done:
            continue
        if fail_on_chunk == chunk:
            raise ChunkFailure(f"injected failure before chunk {chunk} committed")
        t0 = time.monotonic()
        chunk_pages = pages.filter(F.col("chunk") == chunk).drop("chunk")
        # Same auto-selection as extract_spans: the pruned chunk scan is
        # page-granular (needs no byte shuffle) when it has enough
        # splits; under-split chunks take the salted repartition.
        well_split = (
            chunk_pages.rdd.getNumPartitions()
            >= spark.sparkContext.defaultParallelism
        )
        ocr = ocr_pages(
            chunk_pages,
            engine=engine,
            furigana=furigana,
            robust=robust,
            num_partitions=0 if well_split else None,
        )
        # Idempotent commit: overwrite this chunk's directory, then append
        # the lineage row. (Iceberg: REPLACE PARTITION + snapshot append.)
        ocr.write.mode("overwrite").parquet(f"{out_dir}/ocr/chunk={chunk}")
        written = spark.read.parquet(f"{out_dir}/ocr/chunk={chunk}")
        stats = written.agg(
            F.countDistinct("media_ref").alias("n_pages"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.sum(F.when(F.col("bubble_rank") >= 0, 1).otherwise(0)).alias("n_bubbles"),
            F.sum(
                F.when((F.col("text") == "") & (F.col("bubble_rank") >= 0), 1).otherwise(0)
            ).alias("n_empty"),
            F.sum(F.when(F.col("bubble_rank") < 0, 1).otherwise(0)).alias("n_failed"),
            F.min("doc_id").alias("doc_id_min"),
            F.max("doc_id").alias("doc_id_max"),
        ).first()
        wall_ms = int((time.monotonic() - t0) * 1000)
        spark.createDataFrame(
            [
                (
                    run_id,
                    chunk,
                    "done",
                    stats.n_pages,
                    stats.n_docs,
                    stats.n_bubbles or 0,  # SUM over an empty chunk is NULL
                    stats.n_empty or 0,
                    stats.n_failed or 0,
                    stats.doc_id_min,
                    stats.doc_id_max,
                    wall_ms,
                )
            ],
            LINEAGE_SCHEMA,
        ).write.mode("append").parquet(_lineage_dir(out_dir))
    if include_covers and not covers_completed(spark, out_dir):
        if fail_on_chunk == -1:
            raise ChunkFailure("injected failure before covers committed")
        from ..functions.covers import covers

        t0 = time.monotonic()
        capa = spark.read.parquet(capa_dir)
        cov = covers(capa)
        cov.write.mode("overwrite").parquet(f"{out_dir}/covers")
        written = spark.read.parquet(f"{out_dir}/covers")
        cstats = written.agg(
            F.count(F.lit(1)).alias("n_covers"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.sum(F.when(F.col("cover_bytes").isNull(), 1).otherwise(0)).alias("n_failed"),
            F.min("doc_id").alias("doc_id_min"),
            F.max("doc_id").alias("doc_id_max"),
        ).first()
        spark.createDataFrame(
            [
                (
                    run_id,
                    -1,
                    "covers_done",
                    cstats.n_covers,
                    cstats.n_docs,
                    0,
                    0,
                    cstats.n_failed or 0,
                    cstats.doc_id_min or "",
                    cstats.doc_id_max or "",
                    int((time.monotonic() - t0) * 1000),
                )
            ],
            LINEAGE_SCHEMA,
        ).write.mode("append").parquet(_lineage_dir(out_dir))
    ocr_all = spark.read.parquet(f"{out_dir}/ocr")
    final = number_spans(spans, ocr_all.drop("chunk"))
    final.write.mode("overwrite").parquet(f"{out_dir}/spans")
    return spark.read.parquet(f"{out_dir}/spans")
