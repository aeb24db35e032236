"""Format-dispatching page decode — the engine twin of the reference's
``cv2.imread`` accepting ``.png/.jpg/.jpeg`` (reference
core/processor.py:267, modules/detection.py:41).

Both codecs are pure python/numpy (fixtures/png.py, fixtures/jpeg.py):
PNG gray + RGB (BT.601 luma), JPEG baseline + progressive, grayscale +
3-component YCbCr (the Y plane IS the BT.601 luma for JFIF streams).
Anything else raises, which the pipeline kernel converts into a
failure-marker row counted by lineage (pipeline/extract.py).
"""

from __future__ import annotations

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"
JPEG_SIG = b"\xff\xd8"


def decode_gray_image(b: bytes) -> np.ndarray:
    """Encoded page bytes (PNG or JPEG, gray or color) -> uint8 (h, w)."""
    if b[:8] == PNG_SIG:
        from ..fixtures.png import decode_gray_png

        return decode_gray_png(b)
    if b[:2] == JPEG_SIG:
        from ..fixtures.jpeg import decode_gray_jpeg

        return decode_gray_jpeg(b)
    raise ValueError("unsupported image format (not PNG or JPEG)")


def decode_rgb_image(b: bytes) -> np.ndarray:
    """Encoded bytes (PNG or JPEG, gray or color) -> uint8 (h, w, 3)
    RGB; grayscale sources replicate across channels. The cover
    pipeline uses this (the reference saves COLOR cover thumbnails,
    core/processor.py:219-233: PIL RGB convert + jpg save)."""
    if b[:8] == PNG_SIG:
        from ..fixtures.png import decode_rgb_png

        return decode_rgb_png(b)
    if b[:2] == JPEG_SIG:
        from ..fixtures.jpeg import decode_rgb_jpeg

        return decode_rgb_jpeg(b)
    raise ValueError("unsupported image format (not PNG or JPEG)")


def jpeg_dimensions(b: bytes) -> tuple[int, int, int, int] | None:
    """(width, height, precision, n_components) from a JPEG's SOF
    segment, else None. Walks the segment chain — a few dozen bytes of
    header IO per row. Handles 0xFF fill bytes before markers and the
    length-less TEM/RSTn markers (T.81 B.1.1.2)."""
    if b[:2] != JPEG_SIG:
        return None
    i = 2
    while i + 4 <= len(b):
        if b[i] != 0xFF:
            return None
        if b[i + 1] == 0xFF:  # fill byte(s) before the marker
            i += 1
            continue
        marker = b[i + 1]
        if marker in (0xD8, 0xD9, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2  # length-less markers: SOI/EOI/TEM/RSTn
            continue
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if i + 10 > len(b):
                return None
            precision = b[i + 4]
            h = int.from_bytes(b[i + 5 : i + 7], "big")
            w = int.from_bytes(b[i + 7 : i + 9], "big")
            return w, h, precision, b[i + 9]
        i += 2 + int.from_bytes(b[i + 2 : i + 4], "big")
    return None
