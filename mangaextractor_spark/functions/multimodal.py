"""Multimodal column operators: opaque binary media + typed metadata.

Images/audio/video are `BinaryType` columns with struct metadata —
the Spark-side plumbing (schemas, batch shapes, mapInPandas
signatures, partitioning) is real and tested; codec-dependent steps
that need libraries absent from this container are explicit stubs
raising NotImplementedError (clearly marked), mirroring how the
reference gates Windows-only WinOCR (reference modules/ocr.py:51-83)
and skips its Tesseract test when the binary is missing
(tests/test_pipeline.py:22-24).

Real (no external deps):
- ``png_metadata``       parse width/height/bit depth from PNG headers
- ``thumbnail_kernel``   block-average downscale to <=max_side
  (reference P8 cover thumbnail, PIL thumbnail((616,616)) at
  core/processor.py:219-233)
- ``media_md5``          content hash (reference page hash P4)

Stubbed (decode needs libs not in the container):
- ``audio_features``, ``video_frame_sample``
"""

from __future__ import annotations

import hashlib
import struct as _struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PNG_SIG = b"\x89PNG\r\n\x1a\n"

MEDIA_META_SCHEMA = (
    "media_ref string, format string, width int, height int, bit_depth int, "
    "n_channels int, n_bytes long, content_md5 string"
)

THUMBNAIL_SCHEMA = "media_ref string, thumb_png binary, thumb_w int, thumb_h int"

FRAME_SAMPLE_SCHEMA = "media_ref string, frame_idx int, frame_png binary"

AUDIO_FEATURES_SCHEMA = "media_ref string, duration_s double, rms double, n_samples long"


_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # IHDR color type -> samples


def _parse_png_header(b: bytes) -> tuple[int, int, int, int] | None:
    if b[:8] != PNG_SIG or len(b) < 26:
        return None
    w, h, depth, ctype = _struct.unpack(">IIBB", b[16:26])
    return w, h, depth, _PNG_CHANNELS.get(ctype, 0)


def media_metadata(media: DataFrame, hex_hash: bool = False) -> DataFrame:
    """(media_ref, image_bytes) -> typed metadata rows. Header parsing is
    a few bytes per row — stays in one mapInPandas scan, no shuffle.

    ``hex_hash=True`` hashes the UPPERCASE HEX of the bytes instead of
    the raw bytes — the portable form the DuckDB oracle can reproduce
    (its md5() does not accept BLOBs; md5(hex(blob)) is cross-engine)."""

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..sources.decode import jpeg_dimensions

        for pdf in batches:
            rows = []
            for ref, b in zip(pdf["media_ref"], pdf["image_bytes"]):
                b = bytes(b)
                hdr = _parse_png_header(b)
                if hdr:
                    fmt, (w, h, d, nc) = "png", hdr
                else:
                    jh = jpeg_dimensions(b)
                    fmt, (w, h, d, nc) = ("jpeg", jh) if jh else ("unknown", (0, 0, 0, 0))
                payload = b.hex().upper().encode() if hex_hash else b
                rows.append(
                    (ref, fmt, w, h, d, nc, len(b), hashlib.md5(payload).hexdigest())
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_ref", "format", "width", "height", "bit_depth",
                    "n_channels", "n_bytes", "content_md5",
                ],
            )

    return media.select("media_ref", "image_bytes").mapInPandas(kern, MEDIA_META_SCHEMA)


def block_average_downscale(img: np.ndarray, max_side: int) -> np.ndarray:
    """Integer block-average downscale (area interpolation, the same
    family as the reference's INTER_AREA resize at segmentation.py:35-42
    and PIL thumbnail P8). Accepts (h, w) grayscale or (h, w, 3) color
    (channel-wise means)."""
    h, w = img.shape[:2]
    f = max(1, -(-max(h, w) // max_side))  # ceil division
    th, tw = h // f, w // f
    cropped = img[: th * f, : tw * f].astype(np.float64)
    if img.ndim == 3:
        blocks = cropped.reshape(th, f, tw, f, img.shape[2]).mean(axis=(1, 3))
    else:
        blocks = cropped.reshape(th, f, tw, f).mean(axis=(1, 3))
    return blocks.round().clip(0, 255).astype(np.uint8)


def thumbnails(media: DataFrame, max_side: int = 154) -> DataFrame:
    """P8 cover-thumbnail kernel over PNG/JPEG pages; emits PNGs."""

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..fixtures.png import encode_gray_png
        from ..sources.decode import decode_gray_image

        for pdf in batches:
            rows = []
            for ref, b in zip(pdf["media_ref"], pdf["image_bytes"]):
                img = decode_gray_image(bytes(b))
                thumb = block_average_downscale(img, max_side)
                rows.append((ref, encode_gray_png(thumb), thumb.shape[1], thumb.shape[0]))
            yield pd.DataFrame(rows, columns=["media_ref", "thumb_png", "thumb_w", "thumb_h"])

    return media.select("media_ref", "image_bytes").mapInPandas(kern, THUMBNAIL_SCHEMA)


def video_frame_sample(media: DataFrame, every_n: int = 24) -> DataFrame:
    """STUB: video decode needs a codec library not present in this
    container. The Spark plumbing (schema, batch shape, partitioning)
    is the deliverable; the decode call is the only stubbed line."""

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                raise NotImplementedError(
                    "video decode requires pyav/ffmpeg (not in this container); "
                    "plug a decoder into this kernel on a cluster image that has one"
                )
            yield pd.DataFrame(columns=["media_ref", "frame_idx", "frame_png"])

    return media.select("media_ref", "image_bytes").mapInPandas(kern, FRAME_SAMPLE_SCHEMA)


def audio_features(media: DataFrame) -> DataFrame:
    """STUB: audio decode requires soundfile/librosa (not in this
    container); schema and batch plumbing are real."""

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                raise NotImplementedError(
                    "audio decode requires soundfile/librosa (not in this container)"
                )
            yield pd.DataFrame(columns=["media_ref", "duration_s", "rms", "n_samples"])

    return media.select("media_ref", "image_bytes").mapInPandas(kern, AUDIO_FEATURES_SCHEMA)


def media_md5(media: DataFrame) -> DataFrame:
    """P4 content hash as a pure Column expression (JVM-side md5)."""
    return media.select("media_ref", F.md5("image_bytes").alias("content_md5"))
