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

Also real as of round 4 (public container/codec formats, pure numpy):
- ``audio_features``      RIFF/WAVE PCM decode (fixtures/wav.py) +
  exact-arithmetic per-file stats (rms/peak/duration)
- ``video_frame_sample``  MJPEG-AVI container walk (fixtures/avi.py),
  frames decoded by the in-repo T.81 JPEG codec

Still gated with NotImplementedError (genuinely need codec libraries):
compressed audio (mp3/aac/flac) and inter-frame video (h264/vp9/av1).
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

AUDIO_FEATURES_SCHEMA = (
    "media_ref string, n_channels int, sample_rate int, bits int, "
    "n_samples long, duration_s double, rms double, peak long"
)


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
    """Frame sampling over MJPEG-AVI video columns: walk the RIFF
    container (fixtures/avi.py, public AVI spec), keep every
    ``every_n``-th '00dc' frame, decode it with this repo's own T.81
    JPEG codec, and emit a PNG per sampled frame. Single mapInPandas
    scan — a video row never leaves its task, so frame fan-out is
    map-side Generate-like, not a shuffle.

    Inter-frame codecs (h264/vp9/av1) still raise NotImplementedError —
    they need a real codec library; MJPEG is the one video coding fully
    expressible on public knowledge with the codec already in-repo."""

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..fixtures.avi import UnsupportedAviError, iter_avi_frames
        from ..fixtures.png import encode_gray_png
        from ..sources.decode import decode_gray_image

        for pdf in batches:
            rows = []
            for ref, b in zip(pdf["media_ref"], pdf["image_bytes"]):
                b = bytes(b)
                if len(b) >= 12 and b[:4] == b"RIFF" and b[8:12] == b"AVI ":
                    for idx, frame in enumerate(iter_avi_frames(b)):
                        if idx % every_n:
                            continue
                        rows.append((ref, idx, encode_gray_png(decode_gray_image(frame))))
                else:
                    raise NotImplementedError(
                        "only MJPEG-AVI video is decodable without a codec "
                        "library (h264/vp9/av1 need pyav/ffmpeg on the "
                        "cluster image)"
                    )
            yield pd.DataFrame(rows, columns=["media_ref", "frame_idx", "frame_png"])

    return media.select("media_ref", "image_bytes").mapInPandas(kern, FRAME_SAMPLE_SCHEMA)


AUDIO_FEATURES_COLS = [
    "media_ref", "n_channels", "sample_rate", "bits", "n_samples",
    "duration_s", "rms", "peak",
]


def audio_features(media: DataFrame) -> DataFrame:
    """Audio decode + per-file features over RIFF/WAVE PCM columns
    (fixtures/wav.py, public RIFF spec; 8/16-bit PCM — compressed
    codecs raise NotImplementedError, the documented gate).

    Feature arithmetic is cross-engine exact by construction: the
    square-sum accumulates in int64 (exact — 16-bit samples square to
    <2^31, summed over bounded clips), then ONE double division and
    ONE sqrt (a correctly-rounded IEEE-754 primitive, unlike ln/exp),
    so the DuckDB oracle that re-decodes the PCM bytes in SQL matches
    bit-for-bit."""

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        from ..fixtures.wav import UnsupportedWavError, decode_wav, wav_header_fields

        for pdf in batches:
            rows = []
            for ref, b in zip(pdf["media_ref"], pdf["image_bytes"]):
                b = bytes(b)
                try:
                    rate, s = decode_wav(b)
                    ch, _rate, bits, _dsize = wav_header_fields(b)
                except UnsupportedWavError as e:
                    raise NotImplementedError(
                        f"only PCM WAV is decodable without codec libraries: {e}"
                    ) from None
                n = s.shape[0]
                flat = s.astype(np.int64).ravel()
                sq = int((flat * flat).sum())
                rms = math.sqrt(sq / float(flat.size)) if flat.size else 0.0
                peak = int(np.abs(flat).max()) if flat.size else 0
                rows.append(
                    (ref, ch, rate, bits, n, n / float(rate), rms, peak)
                )
            yield pd.DataFrame(rows, columns=AUDIO_FEATURES_COLS)

    return media.select("media_ref", "image_bytes").mapInPandas(kern, AUDIO_FEATURES_SCHEMA)


VIDEO_META_SCHEMA = (
    "media_ref string, n_frames int, width int, height int, fps int, "
    "n_bytes long, content_md5 string"
)


def video_metadata(media: DataFrame) -> DataFrame:
    """Typed metadata per MJPEG-AVI row. Deliberately computes n_frames
    from the REAL container walk (not the avih header field) and
    width/height by DECODING frame 0 with the in-repo JPEG codec (not
    the header dims) — for valid files both equal the header values the
    DuckDB oracle slices, so the hash check exercises the walk and the
    decoder, not just header arithmetic. content_md5 = md5 of the
    uppercase hex (DuckDB md5 takes no BLOBs), as in media_metadata."""

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..fixtures.avi import avi_header, iter_avi_frames
        from ..sources.decode import decode_gray_image

        for pdf in batches:
            rows = []
            for ref, b in zip(pdf["media_ref"], pdf["image_bytes"]):
                b = bytes(b)
                _n_hdr, _w_hdr, _h_hdr, fps = avi_header(b)
                frames = iter_avi_frames(b)
                img0 = decode_gray_image(frames[0])
                rows.append(
                    (
                        ref,
                        len(frames),
                        img0.shape[1],
                        img0.shape[0],
                        fps,
                        len(b),
                        hashlib.md5(b.hex().upper().encode()).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_ref", "n_frames", "width", "height", "fps",
                    "n_bytes", "content_md5",
                ],
            )

    return media.select("media_ref", "image_bytes").mapInPandas(kern, VIDEO_META_SCHEMA)


def media_md5(media: DataFrame) -> DataFrame:
    """P4 content hash as a pure Column expression (JVM-side md5)."""
    return media.select("media_ref", F.md5("image_bytes").alias("content_md5"))
