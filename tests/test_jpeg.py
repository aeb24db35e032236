"""Baseline-JPEG codec tests: deterministic roundtrips, format gating,
and the decode dispatcher (the binaryFile source's .jpg/.jpeg glob is
honest only if the pipeline can actually decode them — reference
accepts png/jpg/jpeg at core/processor.py:267)."""

from __future__ import annotations

import numpy as np
import pytest

from mangaextractor_spark.fixtures.jpeg import (
    UnsupportedJpegError,
    decode_gray_jpeg,
    encode_gray_jpeg,
)
from mangaextractor_spark.fixtures.png import encode_gray_png
from mangaextractor_spark.sources.decode import decode_gray_image, jpeg_dimensions


class TestCodec:
    @pytest.mark.parametrize("shape", [(8, 8), (64, 64), (100, 37), (5, 13), (63, 65)])
    def test_roundtrip_bounded_error(self, shape):
        rng = np.random.default_rng(3)
        img = np.clip(rng.normal(180, 25, shape), 0, 255).astype(np.uint8)
        out = decode_gray_jpeg(encode_gray_jpeg(img, quality=90))
        assert out.shape == img.shape
        assert np.abs(out.astype(int) - img.astype(int)).max() < 32

    def test_deterministic_bytes(self):
        img = (np.arange(40 * 56).reshape(40, 56) % 251).astype(np.uint8)
        assert encode_gray_jpeg(img) == encode_gray_jpeg(img)

    def test_glyph_page_ink_mask_survives(self):
        """The pipeline's contract: binarization of a q95 roundtrip must
        not flip any ink pixel on a rendered page."""
        from mangaextractor_spark.fixtures.generator import CorpusSpec, generate_corpus
        from mangaextractor_spark.fixtures.png import decode_gray_png

        corpus = generate_corpus(CorpusSpec(n_docs=2, seed=42))
        for b in corpus["media"]["image_bytes"]:
            img = decode_gray_png(bytes(b))
            rt = decode_gray_jpeg(encode_gray_jpeg(img, quality=95))
            assert not ((img < 128) ^ (rt < 128)).any()

    def test_rejects_malformed_and_color(self):
        img = np.full((16, 16), 128, dtype=np.uint8)
        b = bytearray(encode_gray_jpeg(img))
        i = b.find(b"\xff\xc0")
        b[i + 1] = 0xC2  # SOF2 header on a baseline scan: malformed
        with pytest.raises(UnsupportedJpegError):
            decode_gray_jpeg(bytes(b))
        b = bytearray(encode_gray_jpeg(img))
        i = b.find(b"\xff\xc0")
        b[i + 9] = 3  # claim 3 components
        with pytest.raises(UnsupportedJpegError):
            decode_gray_jpeg(bytes(b))
        b = bytearray(encode_gray_jpeg(img))
        i = b.find(b"\xff\xc0")
        b[i + 1] = 0xC3  # lossless SOF3 stays gated
        with pytest.raises(UnsupportedJpegError):
            decode_gray_jpeg(bytes(b))

    def test_progressive_decode_of_reference_fixture(self):
        """The reference's own sample page (05_117.jpg, grayscale SOF2
        progressive, 6 scans with successive approximation) decodes to
        a plausible manga page: right dims, white-paper dominant,
        real ink mass. Skipped when the reference checkout is absent
        (the repo stays standalone)."""
        import os

        path = "/root/reference/tests/fixtures/images/05_117.jpg"
        if not os.path.exists(path):
            pytest.skip("reference fixture not available")
        img = decode_gray_jpeg(open(path, "rb").read())
        assert img.shape == (1600, 1072)
        frac_white = (img > 200).mean()
        frac_ink = (img < 64).mean()
        assert frac_white > 0.5  # manga paper
        assert 0.01 < frac_ink < 0.5  # real ink, not garbage noise
        # DC sanity: block means span a wide range (not a flat field)
        assert img.std() > 40

    def test_rejects_garbage(self):
        with pytest.raises(UnsupportedJpegError):
            decode_gray_jpeg(b"not a jpeg")


class TestDispatch:
    def test_dispatch_both_formats(self):
        img = (np.arange(24 * 32).reshape(24, 32) % 200).astype(np.uint8)
        assert (decode_gray_image(encode_gray_png(img)) == img).all()
        out = decode_gray_image(encode_gray_jpeg(img, quality=95))
        assert out.shape == img.shape

    def test_dispatch_rejects_unknown(self):
        with pytest.raises(ValueError):
            decode_gray_image(b"GIF89a....")

    def test_jpeg_dimensions(self):
        img = np.zeros((123, 77), dtype=np.uint8)
        assert jpeg_dimensions(encode_gray_jpeg(img)) == (77, 123, 8)
        assert jpeg_dimensions(b"\x89PNGxxxx") is None


def test_mixed_format_corpus_end_to_end(spark):
    """Full Spark pipeline over a corpus with ~half JPEG pages — golden
    span equality in both detection modes."""
    from mangaextractor_spark.fixtures.generator import CorpusSpec, generate_corpus
    from mangaextractor_spark.fixtures.spark_io import (
        docs_to_spark,
        golden_to_spark,
        media_to_spark,
    )
    from mangaextractor_spark.pipeline.extract import extract_spans

    corpus = generate_corpus(CorpusSpec(n_docs=10, seed=55, p_jpeg=0.5))
    n_jpeg = sum(1 for b in corpus["media"]["image_bytes"] if bytes(b)[:2] == b"\xff\xd8")
    assert n_jpeg > 0
    docs = docs_to_spark(spark, corpus["documents"])
    media = media_to_spark(spark, corpus["media"])
    golden = golden_to_spark(spark, corpus["golden_spans"])
    key = ["doc_id", "kind", "text", "media_ref", "order"]
    for robust in (False, True):
        result = extract_spans(docs, media, robust=robust)
        assert result.select(key).exceptAll(golden.select(key)).count() == 0, robust
        assert golden.select(key).exceptAll(result.select(key)).count() == 0, robust
