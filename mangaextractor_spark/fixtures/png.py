"""Minimal deterministic PNG codec (8-bit grayscale) on zlib only.

The container ships no imaging libraries (no PIL/cv2), so page images
are materialized as real PNG bytes via this codec. This keeps the
pipeline's decode stage honest: the Arrow kernel genuinely parses and
inflates image bytes per batch, the same work `cv2.imread`/`imgio.load`
does in the reference (reference modules/detection.py:41,
lib/SickZil-Machine/src/imgio.py:8-20).

Encoder writes filter-0 scanlines at zlib level 6 (fixed -> bytes are
reproducible). Decoder supports sub/up/average/paeth for robustness
but our own files always use filter 0.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_gray_png(img: np.ndarray) -> bytes:
    """uint8 (h, w) -> PNG bytes."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = img.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # 8-bit grayscale
    raw = np.empty((h, w + 1), dtype=np.uint8)
    raw[:, 0] = 0  # filter type 0 per scanline
    raw[:, 1:] = img
    idat = zlib.compress(raw.tobytes(), 6)
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def encode_rgb_png(img: np.ndarray) -> bytes:
    """uint8 (h, w, 3) -> color-type-2 PNG bytes (for color fixtures)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, _ = img.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    raw = np.empty((h, 3 * w + 1), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = img.reshape(h, 3 * w)
    idat = zlib.compress(raw.tobytes(), 6)
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


# K3 grayscale weights — the BT.601 luminance cv2.cvtColor(BGR2GRAY)
# uses (reference modules/cleaning.py:39-43).
_LUMA = np.array([0.299, 0.587, 0.114])


def decode_gray_png(data: bytes) -> np.ndarray:
    """PNG bytes -> uint8 (h, w) grayscale.

    Accepts 8-bit grayscale (0), RGB (2), gray+alpha (4) and RGBA (6);
    color inputs are converted with the same BT.601 luminance rounding
    as the reference's cv2 grayscale() (K3); alpha is ignored (the
    reference reads via cv2.imread which drops it)."""
    return _to_gray(*_decode_png_pixels(data))


def decode_rgb_png(data: bytes) -> np.ndarray:
    """PNG bytes -> uint8 (h, w, 3) RGB: grayscale replicated across
    channels, alpha dropped (cv2.imread default behavior)."""
    px, ctype = _decode_png_pixels(data)
    if ctype in (0, 4):
        g = px[:, :, 0]
        return np.stack([g, g, g], axis=-1)
    return px[:, :, :3].copy()


def _decode_png_pixels(data: bytes) -> tuple[np.ndarray, int]:
    """Shared chunk walk + unfilter: returns ((h, w, nch) uint8, color
    type)."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", body[:10])
            if depth != 8 or ctype not in (0, 2, 4, 6):
                raise ValueError(f"unsupported PNG (depth={depth}, color={ctype})")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("missing IHDR")
    nch = {0: 1, 2: 3, 4: 2, 6: 4}[ctype]
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8).reshape(
        h, nch * w + 1
    )
    filters = raw[:, 0]
    out = raw[:, 1:].astype(np.uint8).copy()
    if (filters == 0).all():
        return out.reshape(h, w, nch), ctype
    # General unfiltering (row-sequential; only needed for foreign
    # files). PNG filters predict per BYTE with lag = bytes-per-pixel.
    bpp = nch
    n = out.shape[1]
    for y in range(h):
        f = filters[y]
        if f == 0:
            continue
        row = out[y].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(n, dtype=np.int32)
        if f == 2:  # up
            out[y] = ((row + prev) % 256).astype(np.uint8)
            continue
        acc = np.zeros(n, dtype=np.int32)
        for x in range(n):
            a = acc[x - bpp] if x >= bpp else 0
            b = prev[x]
            c = prev[x - bpp] if x >= bpp else 0
            if f == 1:
                pred = a
            elif f == 3:
                pred = (a + b) // 2
            else:  # paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            acc[x] = (row[x] + pred) % 256
        out[y] = acc.astype(np.uint8)
    return out.reshape(h, w, nch), ctype


def _to_gray(px: np.ndarray, ctype: int) -> np.ndarray:
    """(h, w, nch) -> (h, w) luminance (K3 grayscale)."""
    if ctype == 0:
        return px[:, :, 0].copy()
    if ctype == 4:  # gray + alpha
        return px[:, :, 0].copy()
    rgb = px[:, :, :3].astype(np.float64)
    return (rgb @ _LUMA).round().clip(0, 255).astype(np.uint8)
