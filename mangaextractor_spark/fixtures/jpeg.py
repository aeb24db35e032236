"""Minimal deterministic baseline-JPEG codec (8-bit grayscale), pure
numpy — no imaging libraries ship in this container, and the
reference's directory scan accepts ``.png/.jpg/.jpeg``
(reference core/processor.py:267, modules/detection.py:41), so the
engine needs a real JPEG path for its binaryFile source to be honest.

Scope (documented): the encoder writes baseline DCT (SOF0) single
grayscale component with standard Annex-K tables; the decoder handles
any single-component BASELINE stream (restart markers included) AND
single-component PROGRESSIVE (SOF2) streams — full T.81 G.1.2
successive approximation (DC/AC first + refinement scans, EOB runs),
enough to decode the reference's own 05_117.jpg sample page. Color
and other SOF processes raise ``UnsupportedJpegError`` — the same
explicit gating used for audio/video codecs (functions/multimodal.py).

Everything here is from the public JPEG (ITU-T T.81) spec: the
quantization table is Annex K.1, the Huffman tables Annex K.3.
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


@lru_cache(maxsize=8)
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


def _quality_table(quality: int) -> np.ndarray:
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (QUANT_LUMA * scale + 50) // 100
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


def _bit_size(v: int) -> int:
    return int(v).bit_length()


def encode_gray_jpeg(img: np.ndarray, quality: int = 90) -> bytes:
    """8-bit grayscale -> baseline JFIF bytes (deterministic)."""
    assert img.dtype == np.uint8 and img.ndim == 2
    h, w = img.shape
    qt = _quality_table(quality)
    ph, pw = -h % 8, -w % 8
    padded = np.pad(img, ((0, ph), (0, pw)), mode="edge").astype(np.float64) - 128.0
    bh, bw = padded.shape[0] // 8, padded.shape[1] // 8
    blocks = padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    c = _dct_matrix()
    coef = np.einsum("ij,njk,lk->nil", c, blocks, c)
    q = np.round(coef / qt).astype(np.int64)
    zz = q.reshape(-1, 64)[:, ZIGZAG]

    dc_codes = _canonical_codes(DC_BITS, DC_VALS)
    ac_codes = _canonical_codes(AC_BITS, AC_VALS)
    zrl, eob = ac_codes[0xF0], ac_codes[0x00]
    # lengths of the trailing zero runs, vectorized (python int loops on
    # numpy scalars made the encoder ~30x slower)
    lasts = (63 - np.argmax(zz[:, :0:-1] != 0, axis=1)) * (zz[:, 1:] != 0).any(axis=1)
    zz_l = zz.tolist()
    lasts_l = lasts.tolist()
    bwr = _BitWriter()
    write = bwr.write
    prev_dc = 0
    for blk, last in zip(zz_l, lasts_l):
        diff = blk[0] - prev_dc
        prev_dc = blk[0]
        size = abs(diff).bit_length()
        code, length = dc_codes[size]
        write(code, length)
        if size:
            write(diff if diff > 0 else diff + (1 << size) - 1, size)
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
    scan = bwr.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = b"\xff\xd8"  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, b"\x00" + bytes(int(x) for x in qt.reshape(-1)[ZIGZAG]))
    out += seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00")
    out += seg(0xFFC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS))
    out += seg(0xFFC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS))
    out += seg(0xFFDA, b"\x01\x01\x00\x00\x3f\x00")
    out += scan
    out += b"\xff\xd9"  # EOI
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
    """Walk all segments; returns (sof_marker, h, w, qtable, scans) where
    each scan is (ss, se, ah, al, dc_tbl|None, ac_tbl|None, restart,
    entropy_segments) with the table state at that point (progressive
    files redefine DHT between scans)."""
    if b[:2] != b"\xff\xd8":
        raise UnsupportedJpegError("not a JPEG (no SOI)")
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], tuple] = {}
    sof_marker = None
    h = w = comp_q = 0
    restart_interval = 0
    scans = []
    i = 2
    while i < len(b) - 1:
        if b[i] != 0xFF:
            raise UnsupportedJpegError(f"bad marker sync at {i}")
        marker = b[i + 1]
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
            _, h, w, ncomp = struct.unpack(">BHHB", payload[:6])
            if ncomp != 1:
                raise UnsupportedJpegError(
                    "only single-component (grayscale) JPEG supported"
                )
            comp_q = payload[8]
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise UnsupportedJpegError(
                f"unsupported SOF marker {marker:02x} (baseline SOF0 and "
                "progressive SOF2 grayscale are implemented)"
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
            td, ta = payload[2] >> 4, payload[2] & 15
            ss, se, ahal = payload[3], payload[4], payload[5]
            segs, nxt = _entropy_segments(b, i + 2 + ln)
            scans.append(
                (
                    ss, se, ahal >> 4, ahal & 15,
                    htables.get((0, td)), htables.get((1, ta)),
                    restart_interval, segs,
                )
            )
            i = nxt
            continue
        i += 2 + ln
    if sof_marker is None or not scans:
        raise UnsupportedJpegError("no SOF/scan found")
    return sof_marker, h, w, qtables[comp_q], scans


def _decode_sequential(scan, n_blocks: int) -> np.ndarray:
    _, _, _, _, dc_key, ac_key, restart_interval, segments = scan
    dsym, dlen = _peek_tables((dc_key[0], dc_key[1]))
    asym, alen = _peek_tables((ac_key[0], ac_key[1]))
    zz = np.zeros((n_blocks, 64), dtype=np.int64)
    blk = 0
    for seg_bytes in segments:
        rd = _BitReader(seg_bytes.replace(b"\xff\x00", b"\xff"))
        prev_dc = 0
        limit = min(n_blocks, blk + restart_interval) if restart_interval else n_blocks
        # The final block's codes may end inside the byte-align flush
        # padding, so don't require 16 whole bits to remain — the
        # reader's zero-padded window makes trailing peeks safe, and
        # the block count (not the bit count) is the real terminator.
        while blk < limit and rd.pos <= rd.nbits + 8:
            p = rd.peek16()
            size = int(dsym[p])
            rd.pos += int(dlen[p])
            if size:
                prev_dc += _extend(rd.read(size), size)
            zz[blk, 0] = prev_dc
            k = 1
            while k < 64:
                p = rd.peek16()
                sym = int(asym[p])
                rd.pos += int(alen[p])
                if sym == 0x00:
                    break
                if sym == 0xF0:
                    k += 16
                    continue
                k += sym >> 4
                size = sym & 15
                zz[blk, k] = _extend(rd.read(size), size)
                k += 1
            blk += 1
        if blk >= n_blocks:
            break
    return zz


def _decode_progressive(scans, n_blocks: int) -> np.ndarray:
    """T.81 G.1.2 successive-approximation decode for one component:
    DC first/refinement scans, AC first/refinement scans with EOB runs.
    Semantics follow the spec (and every mainstream decoder): new AC
    coefficients arrive as ±1<<Al; refinement passes one correction
    bit per already-nonzero coefficient traversed."""
    zz = [[0] * 64 for _ in range(n_blocks)]
    for ss, se, ah, al, dc_key, ac_key, restart_interval, segments in scans:
        if ss == 0 and se != 0:
            raise UnsupportedJpegError(
                "malformed progressive scan (DC scan must have Se=0)"
            )
        if ss == 0 and se == 0:  # DC scan
            if ah == 0:
                dsym, dlen = _peek_tables((dc_key[0], dc_key[1]))
            blk = 0
            for seg_bytes in segments:
                rd = _BitReader(seg_bytes.replace(b"\xff\x00", b"\xff"))
                prev_dc = 0
                limit = (
                    min(n_blocks, blk + restart_interval)
                    if restart_interval
                    else n_blocks
                )
                while blk < limit:
                    if ah == 0:
                        p = rd.peek16()
                        size = int(dsym[p])
                        rd.pos += int(dlen[p])
                        if size:
                            prev_dc += _extend(rd.read(size), size)
                        zz[blk][0] = prev_dc << al
                    else:
                        if rd.read(1):
                            zz[blk][0] |= 1 << al
                    blk += 1
            continue
        # AC scan
        asym, alen = _peek_tables((ac_key[0], ac_key[1]))
        p1, m1 = 1 << al, -(1 << al)
        blk = 0
        for seg_bytes in segments:
            rd = _BitReader(seg_bytes.replace(b"\xff\x00", b"\xff"))
            eobrun = 0
            limit = (
                min(n_blocks, blk + restart_interval) if restart_interval else n_blocks
            )
            while blk < limit:
                row = zz[blk]
                if ah == 0:  # first pass for this band
                    if eobrun:
                        eobrun -= 1
                        blk += 1
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
                blk += 1
    return np.asarray(zz, dtype=np.int64)


def decode_gray_jpeg(b: bytes) -> np.ndarray:
    """Single-component JPEG bytes -> uint8 (h, w). Baseline (SOF0) and
    progressive (SOF2) streams are supported; color and other SOF
    processes raise UnsupportedJpegError."""
    sof_marker, h, w, qt, scans = _parse_jpeg(b)
    bh, bw = -(-h // 8), -(-w // 8)
    n_blocks = bh * bw
    if sof_marker == 0xC0:
        zz = _decode_sequential(scans[0], n_blocks)
    else:
        zz = _decode_progressive(scans, n_blocks)
    coef = np.zeros((n_blocks, 64), dtype=np.float64)
    coef[:, ZIGZAG] = zz
    coef = coef.reshape(-1, 8, 8) * qt
    c = _dct_matrix()
    pix = np.einsum("ji,njk,kl->nil", c, coef, c) + 128.0
    img = (
        pix.reshape(bh, bw, 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(bh * 8, bw * 8)
    )
    return np.clip(np.round(img), 0, 255).astype(np.uint8)[:h, :w]
