"""File-mode ingestion: a directory tree of page images -> the engine's
(documents, media) tables.

This is the Spark-native form of the reference's directory scan
(reference core/processor.py:256-299: os.walk, skip tmp/concluido/
capa* subdirs, keep .png/.jpg/.jpeg; page number = position in the
sorted file list, core/parallel_processor.py:157-160) built on the
``binaryFile`` data source — a distributed, split-by-file scan instead
of a driver-side walk. Directory names are parsed into document
identity with the same P1/P2 expressions the oracle-checked queries
use (functions/parsing.py).

At 100 TB the file listing itself is the scale risk of this mode;
production ingests once into the Iceberg media/documents tables
(pipeline/*), and this module is the backfill path that does it.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.parsing import chapter_number, manga_name, volume_number

# Reference skip list: tmp dirs, completed runs, cover folders
# (processor.py:258-262 checks `tmp`, `concluido`, and capa* names).
SKIP_DIR_RE = r"(?i)(^|/)(tmp|concluido|capa[^/]*)(/|$)"


def read_page_images(
    spark: SparkSession, root: str, pattern: str = "*.{png,jpg,jpeg}"
) -> DataFrame:
    """Recursive binaryFile scan of ``root`` -> (media_ref, image_bytes).

    ``media_ref`` is the path relative to ``root`` — stable across
    clusters/mounts, so it can serve as the join key with span rows.
    """
    prefix = "file:" + str(Path(root).resolve()) + "/"
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", pattern)
        .option("recursiveFileLookup", "true")
        .load(str(root))
    )
    media_ref = F.expr(f"substring(path, {len(prefix) + 1})")
    return (
        df.select(media_ref.alias("media_ref"), F.col("content").alias("image_bytes"))
        .filter(~F.col("media_ref").rlike(SKIP_DIR_RE))
    )


def pages_to_documents(pages: DataFrame) -> DataFrame:
    """Group a page-file table into the interleaved documents table
    (doc_id, spans: array<struct<kind,text,media_ref,offset>>).

    Document identity = parsed directory name (P1 manga title + P2
    volume/chapter); page order = 1-based position of the file name in
    its directory's sorted listing (the reference's parallel-path rule,
    parallel_processor.py:157-160). File-mode input has no interleaved
    prose, so every span is kind='image' — the schema stays identical
    to the native table.
    """
    dirname = F.regexp_replace(F.col("media_ref"), r"/[^/]*$", "")
    fname = F.substring_index(F.col("media_ref"), "/", -1)
    parsed = pages.select(
        "media_ref",
        dirname.alias("dir"),
        fname.alias("fname"),
    ).select(
        "media_ref",
        "fname",
        F.concat_ws(
            "/",
            manga_name(F.col("dir")),
            F.coalesce(volume_number(F.col("dir")), F.lit("0")),
            F.coalesce(chapter_number(F.col("dir")), F.lit("0")),
        ).alias("doc_id"),
    )
    w = W.partitionBy("doc_id").orderBy("fname")
    numbered = parsed.withColumn("offset", F.row_number().over(w) - 1)
    span = F.struct(
        F.lit("image").alias("kind"),
        F.lit("").alias("text"),
        F.col("media_ref").alias("media_ref"),
        F.col("offset").alias("offset"),
    )
    return (
        numbered.select("doc_id", F.struct("offset", span.alias("sp")).alias("os"))
        .groupBy("doc_id")
        .agg(F.transform(F.array_sort(F.collect_list("os")), lambda x: x["sp"]).alias("spans"))
    )


def ingest_directory(spark: SparkSession, root: str) -> tuple[DataFrame, DataFrame]:
    """One-call file-mode ingest: returns (documents, media) ready for
    ``pipeline.extract.extract_spans``."""
    media = read_page_images(spark, root)
    docs = pages_to_documents(media.select("media_ref"))
    return docs, media
