"""Tests for furigana kernels (reference K18/K19 geometry rule) and
multimodal column plumbing (metadata, thumbnails, stub gating)."""

from __future__ import annotations

import numpy as np
import pytest

from mangaextractor_spark.fixtures.generator import CorpusSpec, generate_corpus
from mangaextractor_spark.fixtures.png import decode_gray_png
from mangaextractor_spark.fixtures.spark_io import media_to_spark
from mangaextractor_spark.functions.multimodal import (
    block_average_downscale,
    media_metadata,
    media_md5,
    thumbnails,
    video_frame_sample,
)
from mangaextractor_spark.kernels.furigana import (
    estimate_furigana_columns,
    remove_furigana,
)


def _columns_mask(widths_and_gaps: list[tuple[int, int]], height: int = 60) -> np.ndarray:
    """Build an ink mask of vertical columns: [(width, gap_after), ...]."""
    total = sum(w + g for w, g in widths_and_gaps) + 4
    m = np.zeros((height, total), dtype=bool)
    x = 2
    for w, g in widths_and_gaps:
        m[5:-5, x : x + w] = True
        x += w + g
    return m


class TestFurigana:
    def test_narrow_right_neighbor_is_furigana(self):
        # wide main column (20px), small gap, narrow ruby column (8px)
        m = _columns_mask([(20, 6), (8, 0)])
        cols = estimate_furigana_columns(m)
        assert cols[30:36].any() or cols.sum() >= 8  # the narrow band marked
        cleaned = remove_furigana(m)
        assert cleaned.sum() < m.sum()
        assert cleaned[:, 2:22].sum() == m[:, 2:22].sum()  # main column intact

    def test_equal_width_columns_not_furigana(self):
        m = _columns_mask([(20, 6), (20, 6), (20, 0)])
        assert not estimate_furigana_columns(m).any()
        assert (remove_furigana(m) == m).all()

    def test_distant_narrow_column_not_furigana(self):
        # gap (60) > 3x own width (8*3=24) -> not furigana
        m = _columns_mask([(20, 60), (8, 0)])
        assert not estimate_furigana_columns(m).any()

    def test_empty_region(self):
        m = np.zeros((30, 30), dtype=bool)
        assert not estimate_furigana_columns(m).any()


class TestDownscale:
    def test_shapes_and_range(self):
        img = (np.arange(200 * 300) % 256).reshape(200, 300).astype(np.uint8)
        t = block_average_downscale(img, 100)
        assert max(t.shape) <= 100
        assert t.dtype == np.uint8

    def test_constant_image_preserved(self):
        img = np.full((120, 90), 77, dtype=np.uint8)
        assert (block_average_downscale(img, 40) == 77).all()


@pytest.fixture(scope="module")
def media_df(spark):
    corpus = generate_corpus(CorpusSpec(n_docs=6, seed=13))
    return media_to_spark(spark, corpus["media"]).cache(), corpus["media"]


class TestMultimodalPlumbing:
    def test_media_metadata(self, spark, media_df):
        df, pdf = media_df
        rows = {r.media_ref: r for r in media_metadata(df).collect()}
        assert len(rows) == len(pdf)
        for _, m in pdf.iterrows():
            r = rows[m["media_ref"]]
            assert (r.format, r.width, r.height, r.bit_depth) == ("png", m["width"], m["height"], 8)
            assert r.content_md5 == m["page_md5"]
            assert r.n_bytes == len(m["image_bytes"])

    def test_media_md5_matches_jvm_side(self, spark, media_df):
        df, pdf = media_df
        rows = {r.media_ref: r.content_md5 for r in media_md5(df).collect()}
        for _, m in pdf.iterrows():
            assert rows[m["media_ref"]] == m["page_md5"]

    def test_thumbnails_decode_and_fit(self, spark, media_df):
        df, pdf = media_df
        out = thumbnails(df, max_side=100).collect()
        assert len(out) == len(pdf)
        for r in out:
            t = decode_gray_png(bytes(r.thumb_png))
            assert t.shape == (r.thumb_h, r.thumb_w)
            assert max(t.shape) <= 100

    def test_video_stub_raises_cleanly(self, spark, media_df):
        df, _ = media_df
        from py4j.protocol import Py4JJavaError

        with pytest.raises(Exception) as ei:
            video_frame_sample(df).collect()
        assert "NotImplementedError" in str(ei.value) or isinstance(
            ei.value, NotImplementedError
        )
