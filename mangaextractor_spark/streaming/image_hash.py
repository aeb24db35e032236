"""Streaming perceptual image hashing — the multimodal cell of the
streaming matrix (12th pattern): media files land continuously, each
micro-batch decodes and dHashes its images in one stateless Arrow
pass, and the hash table accrues through the file sink's transaction
log.

This is the ingest half of image dedup at the crawl frontier: the
appended (media_ref, width, height, b0..b7) rows are exactly the
input of the batch pair join (queries/image_dedup.image_dhash_pairs),
so "hash on arrival, pair-join in the nightly compaction" needs no
re-decode — at 10^12 images the expensive decode happens once per
image, ever. Runs the SAME dhash_frame the batch query runs
(stream/batch agreement by construction, the bloom_gate discipline);
mapInPandas is stateless, so append mode needs no watermark or state
store, and a restart resumes from the checkpoint without re-decoding
committed files.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..queries.image_dedup import dhash_frame


def stream_image_dhash(
    spark: SparkSession,
    media_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Continuously hash media (schema: media_ref string, image_bytes
    binary) landing in ``media_dir``; appends (media_ref, width,
    height, b0..b7) rows to ``out_dir``."""
    reader = spark.readStream.schema("media_ref string, image_bytes binary")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    media = reader.parquet(media_dir)
    writer = (
        dhash_frame(media)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
