"""Minimal RIFF/WAVE PCM codec, pure numpy — no external audio libs.

Public-format implementation (RIFF 1991 spec / Microsoft WAVEFORMATEX
layout): 'RIFF' size 'WAVE', a 16-byte 'fmt ' chunk (PCM format tag 1),
then 'data'. The decoder does a REAL chunk walk — unknown chunks (LIST,
fact, cue) are skipped by their declared size, with the word-alignment
pad byte the spec requires for odd sizes — so non-canonical files
decode correctly even though our encoder always emits the canonical
44-byte-header layout (which is what lets the DuckDB oracle slice
header ints at fixed hex offsets; covered-shape note in
queries/multimodal_queries.py).

Supports 16-bit signed and 8-bit unsigned PCM, any channel count.
The reference has no audio path; this closes the repo's last
audio-decode gate (functions/multimodal.py) with a decoder for the
one ubiquitous uncompressed format. Compressed codecs (mp3/aac/flac)
remain explicitly gated — they need real codec libraries.
"""

from __future__ import annotations

import struct

import numpy as np


class UnsupportedWavError(ValueError):
    """Raised for anything that is not a PCM RIFF/WAVE file this
    decoder covers (compressed codecs, float PCM, truncated files)."""


def encode_wav(samples: np.ndarray, sample_rate: int, bits: int = 16) -> bytes:
    """samples: int array shaped (n_samples,) or (n_samples, n_channels);
    values must fit the target width (int16 signed / uint8 unsigned)."""
    s = np.asarray(samples)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    if bits == 16:
        payload = s.astype("<i2").tobytes()
    elif bits == 8:
        payload = s.astype(np.uint8).tobytes()
    else:
        raise UnsupportedWavError(f"bits={bits} (only 8/16 PCM)")
    block_align = ch * bits // 8
    fmt = struct.pack(
        "<HHIIHH", 1, ch, sample_rate, sample_rate * block_align, block_align, bits
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(payload)) + payload
    if len(payload) % 2:
        body += b"\x00"  # RIFF word-alignment pad (outside data size)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """-> (sample_rate, samples[n, ch]) as int32 (sign-corrected for
    8-bit: centered to signed by subtracting 128, so downstream stats
    treat both widths uniformly)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise UnsupportedWavError("not a RIFF/WAVE file")
    pos = 12
    fmt_fields = None
    payload = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise UnsupportedWavError(f"truncated {cid!r} chunk")
        if cid == b"fmt ":
            if size < 16:
                raise UnsupportedWavError("fmt chunk too short")
            fmt_fields = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            payload = body
        # unknown chunks (LIST/fact/cue/...) skipped by declared size
        pos += 8 + size + (size % 2)  # odd sizes carry a pad byte
    if fmt_fields is None or payload is None:
        raise UnsupportedWavError("missing fmt or data chunk")
    tag, ch, rate, _brate, _balign, bits = fmt_fields
    if tag != 1:
        raise UnsupportedWavError(f"format tag {tag} (only PCM=1)")
    if ch < 1:
        raise UnsupportedWavError("zero channels")
    if bits == 16:
        flat = np.frombuffer(payload[: len(payload) // (2 * ch) * 2 * ch], dtype="<i2")
        s = flat.astype(np.int32)
    elif bits == 8:
        flat = np.frombuffer(payload[: len(payload) // ch * ch], dtype=np.uint8)
        s = flat.astype(np.int32) - 128
    else:
        raise UnsupportedWavError(f"{bits}-bit PCM unsupported (8/16 only)")
    return rate, s.reshape(-1, ch)


def wav_header_fields(data: bytes) -> tuple[int, int, int, int]:
    """-> (n_channels, sample_rate, bits, data_size) via the same chunk
    walk as decode (no sample materialization) — the header kernel."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise UnsupportedWavError("not a RIFF/WAVE file")
    pos = 12
    ch = rate = bits = data_size = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if cid == b"fmt " and size >= 16:
            _tag, ch, rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", data[pos + 8 : pos + 24]
            )
        elif cid == b"data":
            data_size = size
        pos += 8 + size + (size % 2)
    if ch is None or data_size is None:
        raise UnsupportedWavError("missing fmt or data chunk")
    return ch, rate, bits, data_size
