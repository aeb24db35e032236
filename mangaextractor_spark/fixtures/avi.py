"""Minimal RIFF/AVI MJPEG container, pure numpy/struct.

Public-format implementation (Microsoft AVI RIFF spec): 'RIFF' 'AVI '
-> LIST hdrl (avih + one LIST strl with strh/strf) -> LIST movi with
one '00dc' chunk per frame (each a complete baseline JPEG — Motion
JPEG is exactly "a JPEG per frame") -> idx1. Frame DECODE reuses this
repo's own from-scratch T.81 JPEG codec (fixtures/jpeg.py), so the
video path has zero new entropy-coding surface; this module is only
the container walk.

Closes the last video-decode gate in functions/multimodal.py for the
one codec expressible on public knowledge without a codec library.
Inter-frame codecs (h264/vp9/av1) remain explicitly gated.
"""

from __future__ import annotations

import struct

MICROSEC = 1_000_000


class UnsupportedAviError(ValueError):
    """Not a RIFF/AVI file, or not MJPEG-coded."""


def _chunk(cid: bytes, body: bytes) -> bytes:
    return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) % 2 else b"")


def _list(kind: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", kind + body)


def encode_mjpeg_avi(frames: list[bytes], width: int, height: int, fps: int = 24) -> bytes:
    """frames: complete JPEG byte strings (all same dimensions)."""
    if not frames:
        raise UnsupportedAviError("empty frame list")
    avih = struct.pack(
        "<14I",
        MICROSEC // fps,  # dwMicroSecPerFrame
        0,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # dwFlags: AVIF_HASINDEX
        len(frames),  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        0,  # dwSuggestedBufferSize
        width,
        height,
        0, 0, 0, 0,  # dwReserved
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, len(frames), 0, 0, 0)
        + struct.pack("<4H", 0, 0, width, height)  # rcFrame
    )
    # BITMAPINFOHEADER
    strf = struct.pack("<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG", 0, 0, 0, 0, 0)
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_body = b"movi"
    offsets = []
    for f in frames:
        offsets.append(len(movi_body))  # offset of the '00dc' id within movi
        movi_body += _chunk(b"00dc", f)
    movi = _chunk(b"LIST", movi_body)
    idx1 = b"".join(
        b"00dc" + struct.pack("<III", 0x10, off, len(f))
        for off, f in zip(offsets, frames)
    )
    body = b"AVI " + hdrl + movi + _chunk(b"idx1", idx1)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def avi_header(data: bytes) -> tuple[int, int, int, int]:
    """-> (n_frames, width, height, fps) from avih; validates the MJPG
    coding tag in strh (the decoder only speaks Motion JPEG)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise UnsupportedAviError("not a RIFF/AVI file")
    avih = _find_chunk(data, 12, len(data), b"avih")
    if avih is None:
        raise UnsupportedAviError("missing avih header")
    usec, *_rest = struct.unpack("<14I", avih[:56])
    n_frames, width, height = _rest[3], _rest[7], _rest[8]
    strh = _find_chunk(data, 12, len(data), b"strh")
    if strh is None or strh[:4] != b"vids" or strh[4:8] != b"MJPG":
        raise UnsupportedAviError("stream is not MJPG-coded")
    return n_frames, width, height, MICROSEC // usec


def _find_chunk(data: bytes, pos: int, end: int, want: bytes) -> bytes | None:
    """Recursive RIFF walk: descend into LIST chunks, return the first
    `want` chunk body."""
    while pos + 8 <= end:
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body_start = pos + 8
        if cid == want:
            return data[body_start : body_start + size]
        if cid == b"LIST":
            found = _find_chunk(data, body_start + 4, body_start + size, want)
            if found is not None:
                return found
        pos = body_start + size + (size % 2)
    return None


def iter_avi_frames(data: bytes) -> list[bytes]:
    """All '00dc' (compressed video) chunk bodies, in stream order —
    each a complete JPEG for an MJPG stream."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise UnsupportedAviError("not a RIFF/AVI file")
    frames: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        while pos + 8 <= end:
            cid = data[pos : pos + 4]
            (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
            body_start = pos + 8
            if cid == b"LIST":
                walk(body_start + 4, body_start + size)
            elif cid == b"00dc":
                frames.append(data[body_start : body_start + size])
            pos = body_start + size + (size % 2)

    walk(12, len(data))
    return frames
