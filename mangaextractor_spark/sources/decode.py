"""Format-dispatching page decode — the engine twin of the reference's
``cv2.imread`` accepting ``.png/.jpg/.jpeg`` (reference
core/processor.py:267, modules/detection.py:41).

Both codecs are pure python/numpy (fixtures/png.py, fixtures/jpeg.py);
anything else raises, which the pipeline kernel converts into a
failure-marker row counted by lineage (pipeline/extract.py).
"""

from __future__ import annotations

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"
JPEG_SIG = b"\xff\xd8"


def decode_gray_image(b: bytes) -> np.ndarray:
    """Encoded page bytes (PNG or baseline JPEG) -> uint8 (h, w)."""
    if b[:8] == PNG_SIG:
        from ..fixtures.png import decode_gray_png

        return decode_gray_png(b)
    if b[:2] == JPEG_SIG:
        from ..fixtures.jpeg import decode_gray_jpeg

        return decode_gray_jpeg(b)
    raise ValueError("unsupported image format (not PNG or JPEG)")


def jpeg_dimensions(b: bytes) -> tuple[int, int, int] | None:
    """(width, height, precision) from a JPEG's SOF segment, else None.
    Walks the segment chain — a few dozen bytes of header IO per row."""
    if b[:2] != JPEG_SIG:
        return None
    i = 2
    while i + 4 <= len(b):
        if b[i] != 0xFF:
            return None
        marker = b[i + 1]
        if marker in (0xD8, 0xD9) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            precision = b[i + 4]
            h, w = int.from_bytes(b[i + 5 : i + 7], "big"), int.from_bytes(b[i + 7 : i + 9], "big")
            return w, h, precision
        i += 2 + int.from_bytes(b[i + 2 : i + 4], "big")
    return None
