"""Minimal deterministic JPEG codec (8-bit, pure numpy) — no imaging
libraries ship in this container, and the reference's directory scan
accepts ``.png/.jpg/.jpeg`` (reference core/processor.py:267,
modules/detection.py:41 loads any ``cv2.imread``-able JPEG), so the
engine needs a real JPEG path for its binaryFile source to be honest.

Scope (documented):

* **Encoder**: baseline DCT (SOF0) with standard Annex-K tables —
  single-component grayscale (``encode_gray_jpeg``) and 3-component
  YCbCr with 4:4:4 / 4:2:2 / 4:2:0 subsampling
  (``encode_color_jpeg``), interleaved scan, JFIF headers.
* **Decoder**: any 1- or 3-component stream, BASELINE (SOF0, with
  restart markers, interleaved or per-component scans) AND
  PROGRESSIVE (SOF2) — full T.81 G.1.2 successive approximation
  (DC/AC first + refinement scans, EOB runs), enough to decode the
  reference's own 05_117.jpg sample page. Sampling factors up to 2x2
  (covers 4:4:4/4:2:2/4:4:0/4:2:0). ``decode_gray_jpeg`` returns the
  Y plane — for JFIF YCbCr that IS the BT.601 luma, which is exactly
  what libjpeg-based grayscale loads (cv2.imread + BGR2GRAY in the
  reference) produce. ``decode_rgb_jpeg`` gives full color.
  Other SOF processes (lossless, arithmetic, 12-bit) raise
  ``UnsupportedJpegError`` — the same explicit gating used for
  audio/video codecs (functions/multimodal.py). Malformed streams
  (undefined Huffman/quant tables, truncated SOF) raise the same
  domain error, never bare TypeError/KeyError.

Everything here is from the public JPEG (ITU-T T.81) spec: the
quantization tables are Annex K.1/K.2, the Huffman tables Annex K.3.
"""

from __future__ import annotations

import struct
from functools import lru_cache

import numpy as np


class UnsupportedJpegError(ValueError):
    pass


# Annex K.1 luminance quantization table (natural row order).
QUANT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)

# Annex K.2 chrominance quantization table.
QUANT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int32,
)


# Zigzag scan order: ZIGZAG[i] = natural index of the i-th zigzag coef.
def _zigzag_order() -> np.ndarray:
    idx = np.arange(64).reshape(8, 8)
    out = []
    for s in range(15):
        diag = [(i, s - i) for i in range(max(0, s - 7), min(8, s + 1))]
        if s % 2 == 0:
            diag.reverse()
        out.extend(idx[i, j] for i, j in diag)
    return np.array(out, dtype=np.int64)


ZIGZAG = _zigzag_order()

# Annex K.3 standard luminance Huffman tables: (bits[1..16], values).
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# Annex K.3 standard chrominance Huffman tables.
DC_BITS_C = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_VALS_C = list(range(12))
AC_BITS_C = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_VALS_C = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
assert sum(AC_BITS_C) == len(AC_VALS_C)

# BT.601 full-range (JFIF) color transform constants.
_YCC_FWD = np.array(
    [
        [0.299, 0.587, 0.114],
        [-0.168735892, -0.331264108, 0.5],
        [0.5, -0.418687589, -0.081312411],
    ]
)


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the T.81 canonical construction."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


@lru_cache(maxsize=16)
def _peek_tables(key: tuple) -> tuple[np.ndarray, np.ndarray]:
    """16-bit-peek decode LUTs: sym16[peek], len16[peek]."""
    bits, vals = list(key[0]), list(key[1])
    sym16 = np.zeros(1 << 16, dtype=np.int16)
    len16 = np.zeros(1 << 16, dtype=np.int8)
    for sym, (code, length) in _canonical_codes(bits, vals).items():
        lo = code << (16 - length)
        hi = lo + (1 << (16 - length))
        sym16[lo:hi] = sym
        len16[lo:hi] = length
    return sym16, len16


@lru_cache(maxsize=1)
def _dct_matrix() -> np.ndarray:
    k, n = np.mgrid[0:8, 0:8]
    c = np.cos((2 * n + 1) * k * np.pi / 16.0) * np.sqrt(2.0 / 8.0)
    c[0] /= np.sqrt(2.0)
    return c


def _quality_table(quality: int, base: np.ndarray = QUANT_LUMA) -> np.ndarray:
    quality = min(100, max(1, int(quality)))  # IJG convention; 0 is not a scale
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing
        self.acc &= (1 << self.n) - 1  # trim flushed bits or the int grows quadratically

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec
        return bytes(self.buf)


def _plane_to_zz(plane: np.ndarray, qt: np.ndarray, gh: int, gw: int):
    """float64 plane (already level-shifted candidates as uint8) padded
    to the (gh*8, gw*8) block grid -> (zz[gh*gw, 64], lasts[gh*gw])."""
    ph, pw = gh * 8 - plane.shape[0], gw * 8 - plane.shape[1]
    padded = np.pad(plane, ((0, ph), (0, pw)), mode="edge").astype(np.float64) - 128.0
    blocks = padded.reshape(gh, 8, gw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    c = _dct_matrix()
    coef = np.einsum("ij,njk,lk->nil", c, blocks, c)
    q = np.round(coef / qt).astype(np.int64)
    zz = q.reshape(-1, 64)[:, ZIGZAG]
    # lengths of the trailing zero runs, vectorized (python int loops on
    # numpy scalars made the encoder ~30x slower)
    lasts = (63 - np.argmax(zz[:, :0:-1] != 0, axis=1)) * (zz[:, 1:] != 0).any(axis=1)
    return zz.tolist(), lasts.tolist()


def _write_dc(write, dcv: int, prev_dc: int, dc_codes) -> int:
    diff = dcv - prev_dc
    size = abs(diff).bit_length()
    code, length = dc_codes[size]
    write(code, length)
    if size:
        write(diff if diff > 0 else diff + (1 << size) - 1, size)
    return dcv


def _write_ac_band(write, blk, last, ac_codes) -> None:
    """AC coefficients 1..last with trailing EOB — the sequential AC
    coding, which is also a valid progressive first AC scan (Ss=1,
    Se=63, Al=0: each EOB is an EOB-run of one)."""
    zrl, eob = ac_codes[0xF0], ac_codes[0x00]
    run = 0
    for k in range(1, last + 1):
        v = blk[k]
        if v == 0:
            run += 1
            continue
        while run >= 16:
            write(zrl[0], zrl[1])
            run -= 16
        size = abs(v).bit_length()
        code, length = ac_codes[run * 16 + size]
        write(code, length)
        write(v if v > 0 else v + (1 << size) - 1, size)
        run = 0
    if last < 63:
        write(eob[0], eob[1])


def _write_block(write, blk, last, prev_dc, dc_codes, ac_codes) -> int:
    prev_dc = _write_dc(write, blk[0], prev_dc, dc_codes)
    _write_ac_band(write, blk, last, ac_codes)
    return prev_dc


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


_JFIF_APP0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"


def encode_gray_jpeg(img: np.ndarray, quality: int = 90) -> bytes:
    """8-bit grayscale -> baseline JFIF bytes (deterministic)."""
    assert img.dtype == np.uint8 and img.ndim == 2
    h, w = img.shape
    qt = _quality_table(quality)
    gh, gw = -(-h // 8), -(-w // 8)
    zz, lasts = _plane_to_zz(img, qt, gh, gw)
    dc_codes = _canonical_codes(DC_BITS, DC_VALS)
    ac_codes = _canonical_codes(AC_BITS, AC_VALS)
    bwr = _BitWriter()
    write = bwr.write
    prev_dc = 0
    for blk, last in zip(zz, lasts):
        prev_dc = _write_block(write, blk, last, prev_dc, dc_codes, ac_codes)
    scan = bwr.flush()

    out = b"\xff\xd8"  # SOI
    out += _seg(0xFFE0, _JFIF_APP0)
    out += _seg(0xFFDB, b"\x00" + bytes(int(x) for x in qt.reshape(-1)[ZIGZAG]))
    out += _seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00")
    out += _seg(0xFFC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS))
    out += _seg(0xFFC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS))
    out += _seg(0xFFDA, b"\x01\x01\x00\x00\x3f\x00")
    out += scan
    out += b"\xff\xd9"  # EOI
    return out


_SUBSAMPLING = {"444": (1, 1), "422": (2, 1), "440": (1, 2), "420": (2, 2)}


def _box_subsample(plane: np.ndarray, fh: int, fv: int) -> np.ndarray:
    if fh == 1 and fv == 1:
        return plane
    h, w = plane.shape
    padded = np.pad(plane, ((0, -h % fv), (0, -w % fh)), mode="edge")
    return padded.reshape(padded.shape[0] // fv, fv, padded.shape[1] // fh, fh).mean(
        axis=(1, 3)
    )


def encode_color_jpeg(
    rgb: np.ndarray,
    quality: int = 90,
    subsampling: str = "420",
    progressive: bool = False,
) -> bytes:
    """8-bit RGB (h, w, 3) -> 3-component YCbCr JFIF bytes with
    Annex-K luma/chroma tables, deterministic.
    ``subsampling``: "444", "422", "440", or "420".
    ``progressive=True`` writes SOF2 spectral-selection form (one
    interleaved DC scan + one AC scan per component) instead of the
    baseline interleaved scan — the multi-scan shape real web-optimized
    JPEGs use, exercising the progressive decode path."""
    assert rgb.dtype == np.uint8 and rgb.ndim == 3 and rgb.shape[2] == 3
    fh, fv = _SUBSAMPLING[subsampling]
    h, w = rgb.shape[:2]
    qty = _quality_table(quality, QUANT_LUMA)
    qtc = _quality_table(quality, QUANT_CHROMA)

    f = rgb.astype(np.float64)
    y = f @ _YCC_FWD[0]
    cb = f @ _YCC_FWD[1] + 128.0
    cr = f @ _YCC_FWD[2] + 128.0

    mcux, mcuy = -(-w // (8 * fh)), -(-h // (8 * fv))
    zz_y, last_y = _plane_to_zz(y, qty, mcuy * fv, mcux * fh)
    zz_cb, last_cb = _plane_to_zz(_box_subsample(cb, fh, fv), qtc, mcuy, mcux)
    zz_cr, last_cr = _plane_to_zz(_box_subsample(cr, fh, fv), qtc, mcuy, mcux)

    dc_y = _canonical_codes(DC_BITS, DC_VALS)
    ac_y = _canonical_codes(AC_BITS, AC_VALS)
    dc_c = _canonical_codes(DC_BITS_C, DC_VALS_C)
    ac_c = _canonical_codes(AC_BITS_C, AC_VALS_C)
    gw_y = mcux * fh

    out = b"\xff\xd8"
    out += _seg(0xFFE0, _JFIF_APP0)
    out += _seg(0xFFDB, b"\x00" + bytes(int(x) for x in qty.reshape(-1)[ZIGZAG]))
    out += _seg(0xFFDB, b"\x01" + bytes(int(x) for x in qtc.reshape(-1)[ZIGZAG]))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    sof += bytes([1, (fh << 4) | fv, 0, 2, 0x11, 1, 3, 0x11, 1])
    out += _seg(0xFFC2 if progressive else 0xFFC0, sof)
    out += _seg(0xFFC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS))
    out += _seg(0xFFC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS))
    out += _seg(0xFFC4, b"\x01" + bytes(DC_BITS_C) + bytes(DC_VALS_C))
    out += _seg(0xFFC4, b"\x11" + bytes(AC_BITS_C) + bytes(AC_VALS_C))

    if not progressive:
        bwr = _BitWriter()
        write = bwr.write
        prev = [0, 0, 0]
        for my in range(mcuy):
            for mx in range(mcux):
                for by in range(fv):
                    for bx in range(fh):
                        i = (my * fv + by) * gw_y + (mx * fh + bx)
                        prev[0] = _write_block(
                            write, zz_y[i], last_y[i], prev[0], dc_y, ac_y
                        )
                i = my * mcux + mx
                prev[1] = _write_block(write, zz_cb[i], last_cb[i], prev[1], dc_c, ac_c)
                prev[2] = _write_block(write, zz_cr[i], last_cr[i], prev[2], dc_c, ac_c)
        out += _seg(0xFFDA, b"\x03\x01\x00\x02\x11\x03\x11\x00\x3f\x00")
        out += bwr.flush()
        out += b"\xff\xd9"
        return out

    # Progressive spectral selection: interleaved DC scan, then one
    # full-band AC scan per component in non-interleaved block order.
    bwr = _BitWriter()
    write = bwr.write
    prev = [0, 0, 0]
    for my in range(mcuy):
        for mx in range(mcux):
            for by in range(fv):
                for bx in range(fh):
                    i = (my * fv + by) * gw_y + (mx * fh + bx)
                    prev[0] = _write_dc(write, zz_y[i][0], prev[0], dc_y)
            i = my * mcux + mx
            prev[1] = _write_dc(write, zz_cb[i][0], prev[1], dc_c)
            prev[2] = _write_dc(write, zz_cr[i][0], prev[2], dc_c)
    out += _seg(0xFFDA, b"\x03\x01\x00\x02\x11\x03\x11\x00\x00\x00")
    out += bwr.flush()

    ceil = lambda a, b: -(-a // b)
    ch_h, ch_w = ceil(ceil(h, fv), 8), ceil(ceil(w, fh), 8)
    ac_scans = [
        (1, zz_y, last_y, ac_y, ceil(h, 8), ceil(w, 8), gw_y, 0x00),
        (2, zz_cb, last_cb, ac_c, ch_h, ch_w, mcux, 0x11),
        (3, zz_cr, last_cr, ac_c, ch_h, ch_w, mcux, 0x11),
    ]
    for cid, zzp, lastp, ac_codes, nh, nw, stride, td_ta in ac_scans:
        bwr = _BitWriter()
        write = bwr.write
        for gy in range(nh):
            for gx in range(nw):
                i = gy * stride + gx
                _write_ac_band(write, zzp[i], lastp[i], ac_codes)
        out += _seg(0xFFDA, bytes([1, cid, td_ta, 1, 63, 0]))
        out += bwr.flush()
    out += b"\xff\xd9"
    return out


def _extend(v: int, size: int) -> int:
    return v - (1 << size) + 1 if v < (1 << (size - 1)) else v


class _BitReader:
    """Entropy-segment reader over stuffing-stripped bytes, O(1) peeks
    via a per-byte 32-bit window table."""

    def __init__(self, data: bytes) -> None:
        padded = data + b"\x00\x00\x00\x00"
        a = np.frombuffer(padded, dtype=np.uint8).astype(np.uint32)
        self.win = (
            (a[:-3] << 24) | (a[1:-2] << 16) | (a[2:-1] << 8) | a[3:]
        ).tolist()
        self.pos = 0
        self.nbits = len(data) * 8

    def peek16(self) -> int:
        byte, sh = self.pos >> 3, self.pos & 7
        return (self.win[byte] >> (16 - sh)) & 0xFFFF

    def read(self, n: int) -> int:
        byte, sh = self.pos >> 3, self.pos & 7
        v = (self.win[byte] >> (32 - sh - n)) & ((1 << n) - 1)
        self.pos += n
        return v


def _entropy_segments(b: bytes, start: int) -> tuple[list[bytes], int]:
    """Entropy-coded data from ``start`` to the next non-RST marker,
    split at restart markers; returns (segments, index of the marker)."""
    j = start
    segments: list[bytes] = []
    seg_begin = j
    while j < len(b) - 1:
        if b[j] == 0xFF:
            nxt = b[j + 1]
            if nxt == 0x00:
                j += 2
                continue
            segments.append(b[seg_begin:j])
            if 0xD0 <= nxt <= 0xD7:  # RSTn
                j += 2
                seg_begin = j
                continue
            return segments, j
        j += 1
    segments.append(b[seg_begin : j + 1])
    return segments, len(b)


def _parse_jpeg(b: bytes):
    """Walk all segments; returns (sof_marker, h, w, components, scans).

    ``components``: list of dicts {id, h, v, qt} in SOF order.
    Each scan is (ss, se, ah, al, scomps, restart, entropy_segments)
    where ``scomps`` is [(comp_index, dc_tbl|None, ac_tbl|None)] with
    the Huffman-table state at that point (progressive files redefine
    DHT between scans)."""
    try:
        return _parse_jpeg_inner(b)
    except (struct.error, IndexError) as e:
        # truncated segment/header reads stay inside the documented
        # UnsupportedJpegError gating contract
        raise UnsupportedJpegError(f"truncated or malformed JPEG stream: {e}") from e


def _parse_jpeg_inner(b: bytes):
    if b[:2] != b"\xff\xd8":
        raise UnsupportedJpegError("not a JPEG (no SOI)")
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], tuple] = {}
    sof_marker = None
    h = w = 0
    components: list[dict] = []
    restart_interval = 0
    scans = []
    i = 2
    while i < len(b) - 1:
        if b[i] != 0xFF:
            raise UnsupportedJpegError(f"bad marker sync at {i}")
        marker = b[i + 1]
        if marker == 0xFF:  # fill byte before a marker (T.81 B.1.1.2)
            i += 1
            continue
        if marker == 0xD9:
            break
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:
            i += 2
            continue
        ln = struct.unpack(">H", b[i + 2 : i + 4])[0]
        payload = b[i + 4 : i + 2 + ln]
        if marker == 0xDB:
            j = 0
            while j < len(payload):
                pq, tq = payload[j] >> 4, payload[j] & 15
                if pq != 0:
                    raise UnsupportedJpegError("16-bit quant tables unsupported")
                tbl = np.zeros(64, dtype=np.int32)
                tbl[ZIGZAG] = np.frombuffer(payload[j + 1 : j + 65], dtype=np.uint8)
                qtables[tq] = tbl.reshape(8, 8)
                j += 65
        elif marker in (0xC0, 0xC2):
            sof_marker = marker
            if len(payload) < 6:
                raise UnsupportedJpegError("truncated SOF header")
            prec, h, w, ncomp = struct.unpack(">BHHB", payload[:6])
            if prec != 8:
                raise UnsupportedJpegError(f"{prec}-bit precision unsupported")
            if ncomp not in (1, 3):
                raise UnsupportedJpegError(
                    f"{ncomp}-component JPEG unsupported (grayscale or YCbCr)"
                )
            if len(payload) < 6 + 3 * ncomp:
                raise UnsupportedJpegError("truncated SOF component list")
            components = []
            for k in range(ncomp):
                cid = payload[6 + 3 * k]
                hv = payload[7 + 3 * k]
                ch, cv = hv >> 4, hv & 15
                if not (1 <= ch <= 2 and 1 <= cv <= 2):
                    raise UnsupportedJpegError(
                        f"sampling factors {ch}x{cv} beyond 2x2 unsupported"
                    )
                components.append(
                    {"id": cid, "h": ch, "v": cv, "tq": payload[8 + 3 * k]}
                )
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise UnsupportedJpegError(
                f"unsupported SOF marker {marker:02x} (baseline SOF0 and "
                "progressive SOF2 are implemented)"
            )
        elif marker == 0xC4:
            j = 0
            while j < len(payload):
                tc, th = payload[j] >> 4, payload[j] & 15
                bits = tuple(payload[j + 1 : j + 17])
                nvals = sum(bits)
                htables[(tc, th)] = (bits, tuple(payload[j + 17 : j + 17 + nvals]))
                j += 17 + nvals
        elif marker == 0xDD:
            restart_interval = struct.unpack(">H", payload[:2])[0]
        elif marker == 0xDA:
            if not components:
                raise UnsupportedJpegError("SOS before SOF")
            ns = payload[0]
            scomps = []
            for k in range(ns):
                cs, tdta = payload[1 + 2 * k], payload[2 + 2 * k]
                ci = next(
                    (x for x, c in enumerate(components) if c["id"] == cs), None
                )
                if ci is None:
                    raise UnsupportedJpegError(f"scan references unknown component {cs}")
                scomps.append(
                    (ci, htables.get((0, tdta >> 4)), htables.get((1, tdta & 15)))
                )
            ss, se = payload[1 + 2 * ns], payload[2 + 2 * ns]
            ahal = payload[3 + 2 * ns]
            segs, nxt = _entropy_segments(b, i + 2 + ln)
            scans.append(
                (ss, se, ahal >> 4, ahal & 15, scomps, restart_interval, segs)
            )
            i = nxt
            continue
        i += 2 + ln
    if sof_marker is None or not scans:
        raise UnsupportedJpegError("no SOF/scan found")
    for c in components:
        if c["tq"] not in qtables:
            raise UnsupportedJpegError(f"component references undefined quant table {c['tq']}")
        c["qt"] = qtables[c["tq"]]
    return sof_marker, h, w, components, scans


def _geometry(h: int, w: int, components: list[dict]) -> tuple[int, int]:
    """Annotate components with block-grid dims; returns (mcux, mcuy).

    gw/gh: the component's block grid sized to whole MCUs (storage);
    nw/nh: its non-interleaved block dims (T.81 A.2.2) — what a
    single-component scan actually codes."""
    hmax = max(c["h"] for c in components)
    vmax = max(c["v"] for c in components)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    for c in components:
        c["gw"], c["gh"] = mcux * c["h"], mcuy * c["v"]
        c["pw"] = -(-(w * c["h"]) // hmax)
        c["ph"] = -(-(h * c["v"]) // vmax)
        c["nw"], c["nh"] = -(-c["pw"] // 8), -(-c["ph"] // 8)
        c["fx"], c["fy"] = hmax // c["h"], vmax // c["v"]
    return mcux, mcuy


def _require_tables(scomps, need_dc: bool, need_ac: bool):
    out = []
    for ci, dck, ack in scomps:
        if need_dc and dck is None:
            raise UnsupportedJpegError("scan references undefined DC Huffman table")
        if need_ac and ack is None:
            raise UnsupportedJpegError("scan references undefined AC Huffman table")
        out.append(
            (
                ci,
                _peek_tables(dck) if dck is not None else (None, None),
                _peek_tables(ack) if ack is not None else (None, None),
            )
        )
    return out


def _decode_sequential(scans, components, mcux: int, mcuy: int) -> list[np.ndarray]:
    """Baseline decode of every scan; returns per-component zz arrays
    shaped (gh*gw, 64) in interleaved-grid raster order."""
    zz = [np.zeros((c["gh"] * c["gw"], 64), dtype=np.int64) for c in components]
    for ss, se, ah, al, scomps, restart, segments in scans:
        tabs = _require_tables(scomps, True, True)
        interleaved = len(scomps) > 1
        if interleaved:
            units = []
            for si, (ci, _, _) in enumerate(scomps):
                c = components[ci]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        units.append((si, ci, c["v"], c["h"], c["gw"], by, bx))
            n_mcus = mcux * mcuy
        else:
            ci = scomps[0][0]
            c = components[ci]
            n_mcus = c["nh"] * c["nw"]
        done = 0
        for seg_bytes in segments:
            rd = _BitReader(seg_bytes.replace(b"\xff\x00", b"\xff"))
            prev = [0] * len(scomps)
            limit = min(n_mcus, done + restart) if restart else n_mcus
            # The final block's codes may end inside the byte-align
            # flush padding, so don't require 16 whole bits to remain —
            # the reader's zero-padded window makes trailing peeks
            # safe; the block count is the real terminator.
            while done < limit and rd.pos <= rd.nbits + 8:
                if interleaved:
                    my, mx = divmod(done, mcux)
                    for si, ci, cv, ch, gw, by, bx in units:
                        idx = (my * cv + by) * gw + (mx * ch + bx)
                        prev[si] = _decode_block(
                            rd, tabs[si][1], tabs[si][2], zz[ci], idx, prev[si]
                        )
                else:
                    gy, gx = divmod(done, c["nw"])
                    prev[0] = _decode_block(
                        rd, tabs[0][1], tabs[0][2], zz[ci], gy * c["gw"] + gx, prev[0]
                    )
                done += 1
            if done >= n_mcus:
                break
    return zz


def _decode_block(rd, dc_tab, ac_tab, zz, idx, prev_dc) -> int:
    dsym, dlen = dc_tab
    asym, alen = ac_tab
    p = rd.peek16()
    size = int(dsym[p])
    ln = int(dlen[p])
    if ln == 0:
        raise UnsupportedJpegError("invalid Huffman code in scan data")
    rd.pos += ln
    if size:
        prev_dc += _extend(rd.read(size), size)
    row = zz[idx]
    row[0] = prev_dc
    k = 1
    while k < 64:
        p = rd.peek16()
        sym = int(asym[p])
        ln = int(alen[p])
        if ln == 0:
            raise UnsupportedJpegError("invalid Huffman code in scan data")
        rd.pos += ln
        if sym == 0x00:
            break
        if sym == 0xF0:
            k += 16
            continue
        k += sym >> 4
        size = sym & 15
        if k > 63:
            raise UnsupportedJpegError("AC run overflows block")
        row[k] = _extend(rd.read(size), size)
        k += 1
    return prev_dc


def _decode_progressive(scans, components, mcux: int, mcuy: int) -> list[np.ndarray]:
    """T.81 G.1.2 successive-approximation decode. DC scans may be
    interleaved (Ns up to 3); AC scans are single-component per spec.
    Semantics follow the spec (and every mainstream decoder): new AC
    coefficients arrive as ±1<<Al; refinement passes one correction
    bit per already-nonzero coefficient traversed."""
    zz = [[[0] * 64 for _ in range(c["gh"] * c["gw"])] for c in components]
    for ss, se, ah, al, scomps, restart, segments in scans:
        if ss != 0 and len(scomps) > 1:
            # T.81 G.1: progressive AC scans are single-component; an
            # interleaved one must be rejected, not decoded as if it
            # were scomps[0]'s non-interleaved block order.
            raise UnsupportedJpegError("interleaved AC scan in progressive stream")
        if ss == 0:  # DC scan (first or refinement)
            tabs = _require_tables(scomps, ah == 0, False)
            if se != 0:
                raise UnsupportedJpegError(
                    "malformed progressive scan (DC scan must have Se=0)"
                )
            interleaved = len(scomps) > 1
            if interleaved:
                units = []
                for si, (ci, _, _) in enumerate(scomps):
                    c = components[ci]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            units.append((si, ci, c["v"], c["h"], c["gw"], by, bx))
                n_mcus = mcux * mcuy
            else:
                ci = scomps[0][0]
                c = components[ci]
                n_mcus = c["nh"] * c["nw"]
            done = 0
            for seg_bytes in segments:
                rd = _BitReader(seg_bytes.replace(b"\xff\x00", b"\xff"))
                prev = [0] * len(scomps)
                limit = min(n_mcus, done + restart) if restart else n_mcus
                while done < limit:
                    if interleaved:
                        my, mx = divmod(done, mcux)
                        targets = [
                            (si, ci2, (my * cv + by) * gw + (mx * ch + bx))
                            for si, ci2, cv, ch, gw, by, bx in units
                        ]
                    else:
                        gy, gx = divmod(done, c["nw"])
                        targets = [(0, ci, gy * c["gw"] + gx)]
                    for si, ci2, idx in targets:
                        if ah == 0:
                            dsym, dlen = tabs[si][1]
                            p = rd.peek16()
                            size = int(dsym[p])
                            ln = int(dlen[p])
                            if ln == 0:
                                raise UnsupportedJpegError(
                                    "invalid Huffman code in scan data"
                                )
                            rd.pos += ln
                            if size:
                                prev[si] += _extend(rd.read(size), size)
                            zz[ci2][idx][0] = prev[si] << al
                        else:
                            if rd.read(1):
                                zz[ci2][idx][0] |= 1 << al
                    done += 1
            continue
        # AC scan — single component, non-interleaved block order.
        tabs = _require_tables(scomps, False, True)
        ci = scomps[0][0]
        c = components[ci]
        asym, alen = tabs[0][2]
        zzc = zz[ci]
        nw, gw = c["nw"], c["gw"]
        n_blocks = c["nh"] * nw
        p1, m1 = 1 << al, -(1 << al)
        done = 0
        for seg_bytes in segments:
            rd = _BitReader(seg_bytes.replace(b"\xff\x00", b"\xff"))
            eobrun = 0
            limit = min(n_blocks, done + restart) if restart else n_blocks
            while done < limit:
                gy, gx = divmod(done, nw)
                row = zzc[gy * gw + gx]
                if ah == 0:  # first pass for this band
                    if eobrun:
                        eobrun -= 1
                        done += 1
                        continue
                    k = ss
                    while k <= se:
                        p = rd.peek16()
                        sym = int(asym[p])
                        rd.pos += int(alen[p])
                        r, size = sym >> 4, sym & 15
                        if size == 0:
                            if r < 15:
                                eobrun = (1 << r) - 1
                                if r:
                                    eobrun += rd.read(r)
                                break
                            k += 16  # ZRL
                            continue
                        k += r
                        row[k] = _extend(rd.read(size), size) << al
                        k += 1
                else:  # refinement pass
                    k = ss
                    if eobrun == 0:
                        while k <= se:
                            p = rd.peek16()
                            sym = int(asym[p])
                            rd.pos += int(alen[p])
                            r, size = sym >> 4, sym & 15
                            val = 0
                            if size == 0:
                                if r < 15:
                                    eobrun = (1 << r) - 1
                                    if r:
                                        eobrun += rd.read(r)
                                    break
                                # r == 15: pass 16 zero-history coefs
                            else:
                                val = p1 if rd.read(1) else m1
                            while k <= se:
                                if row[k] != 0:
                                    if rd.read(1) and (row[k] & p1) == 0:
                                        row[k] += p1 if row[k] >= 0 else m1
                                else:
                                    if r == 0:
                                        break
                                    r -= 1
                                k += 1
                            if val and k <= se:
                                row[k] = val
                            k += 1
                    if eobrun > 0:
                        while k <= se:
                            if row[k] != 0:
                                if rd.read(1) and (row[k] & p1) == 0:
                                    row[k] += p1 if row[k] >= 0 else m1
                            k += 1
                        eobrun -= 1
                done += 1
    return [np.asarray(z, dtype=np.int64) for z in zz]


def _idct_plane(zzc: np.ndarray, c: dict) -> np.ndarray:
    """Component zz coefficients (gh*gw, 64) -> uint8 plane cropped to
    the component's pixel dims (ph, pw)."""
    coef = np.zeros((zzc.shape[0], 64), dtype=np.float64)
    coef[:, ZIGZAG] = zzc
    coef = coef.reshape(-1, 8, 8) * c["qt"]
    m = _dct_matrix()
    pix = np.einsum("ji,njk,kl->nil", m, coef, m) + 128.0
    img = (
        pix.reshape(c["gh"], c["gw"], 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(c["gh"] * 8, c["gw"] * 8)
    )
    return np.clip(np.round(img), 0, 255).astype(np.uint8)[: c["ph"], : c["pw"]]


def _decode_planes(b: bytes, want: str):
    sof_marker, h, w, components, scans = _parse_jpeg(b)
    mcux, mcuy = _geometry(h, w, components)
    if sof_marker == 0xC0:
        zz = _decode_sequential(scans, components, mcux, mcuy)
    else:
        zz = _decode_progressive(scans, components, mcux, mcuy)
    idx = [0] if want == "luma" else range(len(components))
    planes = {i: _idct_plane(zz[i], components[i]) for i in idx}
    return h, w, components, planes


def _upsample(plane: np.ndarray, c: dict, h: int, w: int) -> np.ndarray:
    if c["fx"] > 1:
        plane = np.repeat(plane, c["fx"], axis=1)
    if c["fy"] > 1:
        plane = np.repeat(plane, c["fy"], axis=0)
    return plane[:h, :w]


def decode_gray_jpeg(b: bytes) -> np.ndarray:
    """JPEG bytes -> uint8 (h, w) luma. For 3-component JFIF streams
    this is the Y plane — the BT.601 luma, matching what a
    libjpeg-grayscale load (the reference's cv2.imread + BGR2GRAY,
    modules/detection.py:41) produces. Baseline (SOF0) and progressive
    (SOF2), 1- or 3-component; other processes raise
    UnsupportedJpegError."""
    h, w, components, planes = _decode_planes(b, "luma")
    return _upsample(planes[0], components[0], h, w)


def decode_rgb_jpeg(b: bytes) -> np.ndarray:
    """JPEG bytes -> uint8 (h, w, 3) RGB (BT.601 full-range inverse
    transform, nearest-neighbor chroma upsampling). Grayscale streams
    are replicated across channels."""
    h, w, components, planes = _decode_planes(b, "all")
    if len(components) == 1:
        g = _upsample(planes[0], components[0], h, w)
        return np.stack([g, g, g], axis=-1)
    y = _upsample(planes[0], components[0], h, w).astype(np.float64)
    cb = _upsample(planes[1], components[1], h, w).astype(np.float64) - 128.0
    cr = _upsample(planes[2], components[2], h, w).astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    bch = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, bch], axis=-1)), 0, 255).astype(np.uint8)
