"""S6 cover pipeline: capa-marked media rows -> one thumbnail cover per
document, upsert-keyed on doc_id.

Reference behavior re-expressed (processor.py:219-233, 287-292;
db_util.py:377-451): files under a ``capa*`` directory are covers and
are skipped by the extraction walk; the FIRST file becomes the
volume's cover, thumbnailed to <= 616px and re-encoded as jpg, then
upserted into the ``_capas`` table keyed by the volume id. Here the
cover key is the doc_id, the marker is a ``capa`` path/fragment
segment, the pick rule is min media_ref (the sorted-first file), and
the sink row carries the thumbnail bytes + typed metadata.

Scale shape: the capa filter prunes the media scan down to ~one row
per document BEFORE any shuffle; the only shuffle is the per-doc
row_number window over that pruned set, and the thumbnail kernel is a
single mapInPandas pass over the winners.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

COVER_MARKER_RE = r"(^|[/#])capa([^/]*)(/|$)"
COVER_MAX_SIDE = 616  # reference PIL thumbnail((616, 616)), processor.py:225

COVERS_SCHEMA = (
    "doc_id string, media_ref string, file_name string, extension string, "
    "cover_bytes binary, orig_w int, orig_h int, thumb_w int, thumb_h int"
)


def cover_candidates(media: DataFrame) -> DataFrame:
    """capa-marked rows + their doc key: '{doc_id}#capa' fragments map
    to doc_id; 'dir/capa*/file' paths map to the capa dir's parent."""
    is_fragment = F.col("media_ref").contains("#capa")
    # Anchored (^|/) so a ROOT-LEVEL 'capa/file.png' maps to the root
    # document '' instead of leaking the full path as a bogus per-file
    # doc; nested 'dir/capa*/file' maps to the capa dir's parent.
    doc_id = F.when(is_fragment, F.substring_index("media_ref", "#", 1)).otherwise(
        F.regexp_replace("media_ref", r"(^|/)capa[^/]*/.*$", "")
    )
    return media.filter(F.col("media_ref").rlike(COVER_MARKER_RE)).withColumn(
        "doc_id", doc_id
    )


def covers(media: DataFrame, max_side: int = COVER_MAX_SIDE) -> DataFrame:
    """One cover row per document: first capa file per doc (min
    media_ref), thumbnailed to <= max_side and re-encoded as a COLOR
    baseline JPEG — the reference converts covers to RGB and saves jpg
    (PIL thumbnail + convert('RGB'), core/processor.py:219-233), and
    real covers are color even when pages are grayscale."""
    cand = cover_candidates(media)
    w = W.partitionBy("doc_id").orderBy("media_ref")
    first = cand.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..fixtures.jpeg import encode_color_jpeg
        from ..functions.multimodal import block_average_downscale
        from ..sources.decode import decode_rgb_image

        for pdf in batches:
            rows = []
            for doc_id, ref, b in zip(pdf["doc_id"], pdf["media_ref"], pdf["image_bytes"]):
                fname = ref.rsplit("/", 1)[-1]
                try:
                    img = decode_rgb_image(bytes(b))
                    thumb = block_average_downscale(img, max_side)
                except Exception:  # noqa: BLE001 — any decode failure (incl. zlib.error)
                    # Failure-marker row (mirrors pipeline/extract.py's
                    # decode handling): one corrupt capa file must not
                    # fail the whole job.
                    rows.append((doc_id, ref, fname, "jpg", None, 0, 0, 0, 0))
                    continue
                rows.append(
                    (
                        doc_id,
                        ref,
                        fname,
                        "jpg",
                        encode_color_jpeg(thumb, quality=90, subsampling="420"),
                        img.shape[1],
                        img.shape[0],
                        thumb.shape[1],
                        thumb.shape[0],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "media_ref", "file_name", "extension", "cover_bytes",
                    "orig_w", "orig_h", "thumb_w", "thumb_h",
                ],
            )

    return first.select("doc_id", "media_ref", "image_bytes").mapInPandas(
        kern, COVERS_SCHEMA
    )


def upsert_covers(existing: DataFrame, incoming: DataFrame) -> DataFrame:
    """The _capas MERGE semantics (reference db_util.py:377-451): an
    incoming cover replaces the existing row with the same doc_id;
    unmatched existing rows survive."""
    return existing.join(incoming.select("doc_id"), "doc_id", "left_anti").unionByName(
        incoming
    )
