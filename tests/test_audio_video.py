"""Round-4 audio/video decode: RIFF/WAVE PCM codec, MJPEG-AVI
container, and the Spark kernels over them. Oracle parity of the
registered queries rides test_queries_oracle."""

from __future__ import annotations

import math
import struct

import numpy as np
import pandas as pd
import pytest

from mangaextractor_spark.fixtures.avi import (
    UnsupportedAviError,
    avi_header,
    encode_mjpeg_avi,
    iter_avi_frames,
)
from mangaextractor_spark.fixtures.jpeg import decode_gray_jpeg, encode_gray_jpeg
from mangaextractor_spark.fixtures.wav import (
    UnsupportedWavError,
    decode_wav,
    encode_wav,
    wav_header_fields,
)


@pytest.mark.parametrize("bits,ch,n", [(16, 1, 1000), (16, 2, 777), (8, 1, 999), (8, 2, 250)])
def test_wav_roundtrip(bits, ch, n):
    rng = np.random.Generator(np.random.PCG64(bits * 1000 + ch * 10 + n))
    if bits == 16:
        s = rng.integers(-32768, 32768, size=(n, ch)).astype(np.int64)
        want = s.astype(np.int32)
    else:
        s = rng.integers(0, 256, size=(n, ch)).astype(np.int64)
        want = s.astype(np.int32) - 128
    b = encode_wav(s, 44100, bits=bits)
    rate, out = decode_wav(b)
    assert rate == 44100
    assert np.array_equal(out, want)
    assert wav_header_fields(b) == (ch, 44100, bits, n * ch * bits // 8)


def test_wav_chunk_walk_skips_unknown_chunks():
    s = np.arange(-500, 500, dtype=np.int64)
    b = encode_wav(s, 8000)
    # splice a LIST chunk (odd size -> pad byte) between fmt and data
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    hacked = b[:36] + extra + b[36:]
    hacked = b"RIFF" + struct.pack("<I", len(hacked) - 8) + hacked[8:]
    rate, out = decode_wav(hacked)
    assert rate == 8000 and np.array_equal(out[:, 0], s)
    # header walk agrees on the non-canonical layout too
    assert wav_header_fields(hacked) == (1, 8000, 16, 2000)


def test_wav_rejects_garbage_and_unsupported():
    with pytest.raises(UnsupportedWavError):
        decode_wav(b"not a wav at all")
    b = bytearray(encode_wav(np.arange(16, dtype=np.int64), 8000))
    b[20] = 3  # format tag 3 = IEEE float PCM: not covered
    with pytest.raises(UnsupportedWavError, match="format tag"):
        decode_wav(bytes(b))
    with pytest.raises(UnsupportedWavError, match="truncated"):
        decode_wav(encode_wav(np.arange(16, dtype=np.int64), 8000)[:-9])


def _frames(n, w=64, h=32, seed=0):
    out = []
    for i in range(n):
        yy, xx = np.mgrid[0:h, 0:w]
        out.append(encode_gray_jpeg(((xx + yy * 3 + seed + i * 11) % 256).astype(np.uint8)))
    return out


def test_avi_roundtrip_and_header():
    frames = _frames(7)
    avi = encode_mjpeg_avi(frames, 64, 32, fps=25)
    assert avi_header(avi) == (7, 64, 32, 25)
    got = iter_avi_frames(avi)
    assert got == frames  # byte-identical JPEG payloads
    assert decode_gray_jpeg(got[3]).shape == (32, 64)


def test_avi_rejects_non_mjpeg():
    avi = bytearray(encode_mjpeg_avi(_frames(2), 64, 32))
    with pytest.raises(UnsupportedAviError):
        avi_header(b"RIFF\x00\x00\x00\x00WEBP")
    # corrupt the strh coding tag -> decoder must refuse
    i = bytes(avi).find(b"MJPG")
    avi[i : i + 4] = b"H264"
    with pytest.raises(UnsupportedAviError, match="MJPG"):
        avi_header(bytes(avi))


def test_video_frame_sample_kernel(spark):
    from mangaextractor_spark.functions.multimodal import video_frame_sample

    frames = _frames(10, seed=5)
    media = spark.createDataFrame(
        pd.DataFrame(
            {"media_ref": ["v1"], "image_bytes": [encode_mjpeg_avi(frames, 64, 32, fps=10)]}
        )
    )
    out = video_frame_sample(media, every_n=4).toPandas().sort_values("frame_idx")
    assert list(out.frame_idx) == [0, 4, 8]
    # sampled frame content equals a direct decode of the planted JPEG
    from mangaextractor_spark.fixtures.png import decode_gray_png

    for _, r in out.iterrows():
        got = decode_gray_png(bytes(r.frame_png))
        want = decode_gray_jpeg(frames[r.frame_idx])
        assert np.array_equal(got, want)


def test_audio_features_kernel_matches_numpy(spark):
    from mangaextractor_spark.functions.multimodal import audio_features

    rng = np.random.Generator(np.random.PCG64(9))
    s = rng.integers(-20000, 20000, size=(4321, 2)).astype(np.int64)
    media = spark.createDataFrame(
        pd.DataFrame({"media_ref": ["a1"], "image_bytes": [encode_wav(s, 16000)]})
    )
    r = audio_features(media).toPandas().iloc[0]
    flat = s.ravel()
    assert (r.n_channels, r.sample_rate, r.bits, r.n_samples) == (2, 16000, 16, 4321)
    assert r.duration_s == 4321 / 16000.0
    assert r.rms == math.sqrt(int((flat * flat).sum()) / float(flat.size))
    assert r.peak == int(np.abs(flat).max())


def test_compressed_codecs_still_gated(spark):
    from mangaextractor_spark.functions.multimodal import audio_features, video_frame_sample

    bogus = spark.createDataFrame(
        pd.DataFrame({"media_ref": ["x"], "image_bytes": [b"\xff\xfbmp3-ish-junk" * 4]})
    )
    with pytest.raises(Exception, match="NotImplementedError|PCM WAV"):
        audio_features(bogus).collect()
    with pytest.raises(Exception, match="NotImplementedError|MJPEG"):
        video_frame_sample(bogus).collect()
