"""Unit tests for the CV kernels — modeled on the reference's
least-mocked, most semantic tests (real numpy in/out:
reference tests/manga_extractor/utils/test_helpers.py:36-175,
modules/test_smoothing.py:5-40, modules/test_furigana.py:10-55).
"""

from __future__ import annotations

import numpy as np
import pytest

from mangaextractor_spark.fixtures.font import (
    ALPHABET,
    decode_text_block,
    glyph_table,
    render_text_block,
)
from mangaextractor_spark.fixtures.generator import CorpusSpec, generate_corpus
from mangaextractor_spark.fixtures.png import decode_gray_png, encode_gray_png
from mangaextractor_spark.kernels.image_ops import (
    average_cc_size,
    binarize,
    close,
    detect_bubbles,
    dilate,
    erode,
    extract_page_regions,
    filter_by_black_white_ratio,
    filter_by_size,
    gaussian_blur,
    is_text_like,
    label_components,
    rlso_close,
    segment_into_lines,
)
from mangaextractor_spark.kernels.ocr import GlyphOcrEngine
from mangaextractor_spark.kernels.ordering import reading_order


class TestFont:
    def test_glyphs_unique_and_cover_rows_cols(self):
        t = glyph_table()
        assert len({g.tobytes() for g in t.values()}) == len(ALPHABET)
        for ch, g in t.items():
            assert g.any(axis=1).all(), f"{ch}: empty row"
            assert g.any(axis=0).all(), f"{ch}: empty col"

    @pytest.mark.parametrize("scale", [1, 2, 3])
    def test_round_trip(self, scale):
        for text in ["A", "HELLO WORLD", "AB1 C2\nXY 99Z"]:
            assert decode_text_block(render_text_block(text, scale)) == text.replace("\n", " ")

    def test_unknown_glyph_decodes_to_question_mark(self):
        blk = render_text_block("AB", 2).copy()
        blk[:, : 5 * 2] = ~blk[:, : 5 * 2]  # corrupt first glyph beyond recognition
        out = decode_text_block(blk)
        assert out != "AB"


class TestPng:
    def test_round_trip(self):
        img = (np.arange(64 * 48).reshape(64, 48) % 251).astype(np.uint8)
        assert (decode_gray_png(encode_gray_png(img)) == img).all()

    def test_rejects_garbage(self):
        with pytest.raises(ValueError):
            decode_gray_png(b"not a png at all")


class TestComponents:
    def test_label_two_blobs(self):
        m = np.zeros((20, 20), dtype=bool)
        m[2:5, 2:6] = True
        m[10:15, 10:14] = True
        st = label_components(m)
        assert st.n == 2
        boxes = sorted(zip(st.x1, st.y1, st.x2, st.y2))
        assert boxes == [(2, 2, 6, 5), (10, 10, 14, 15)]
        assert sorted(st.area.tolist()) == [12, 20]

    def test_diagonal_is_8_connected(self):
        m = np.zeros((4, 4), dtype=bool)
        m[0, 0] = m[1, 1] = m[2, 2] = True
        assert label_components(m).n == 1

    def test_paint_reconstructs_exact_pixels(self):
        rng = np.random.default_rng(7)
        m = rng.random((30, 30)) > 0.7
        st = label_components(m)
        assert (st.paint(m.shape, np.ones(st.n, dtype=bool)) == m).all()

    def test_size_and_ratio_filters(self):
        m = np.zeros((40, 60), dtype=bool)
        m[1:3, 1:3] = True  # tiny: sqrt(4)=2
        m[10:20, 10:20] = True  # 10x10: sqrt(100)=10
        m[25:29, 25:55] = True  # 4x30
        st = label_components(m)
        avg = average_cc_size(st)
        keep = filter_by_size(st, avg)
        assert keep.sum() >= 1
        ratio_keep = filter_by_black_white_ratio(st, 0.9, 1.0)
        assert ratio_keep.all()  # all solid rects


class TestMorphology:
    def test_close_fills_small_hole(self):
        m = np.ones((15, 15), dtype=bool)
        m[7, 7] = False
        assert close(m, 3, 3).all()

    def test_dilate_erode_shapes(self):
        m = np.zeros((10, 10), dtype=bool)
        m[4:6, 4:6] = True
        assert dilate(m, 3, 3).sum() == 16
        assert erode(dilate(m, 3, 3), 3, 3).sum() == 4

    def test_rlso_bridges_gap(self):
        # reference modules/test_smoothing.py:5-40 semantics: two ink
        # runs separated by a small gap merge into one component.
        m = np.zeros((5, 30), dtype=bool)
        m[2, 2:8] = True
        m[2, 12:18] = True  # gap of 4
        out = rlso_close(m, average_size=8.0)  # bridge <= 6
        st = label_components(out)
        assert st.n == 1

    def test_rlso_preserves_large_gap(self):
        m = np.zeros((5, 60), dtype=bool)
        m[2, 2:8] = True
        m[2, 40:46] = True
        out = rlso_close(m, average_size=8.0)
        assert label_components(out).n == 2


class TestSegmentation:
    def test_segment_into_lines(self):
        blk = render_text_block("AB\nCD\nEF", 2)
        rows = segment_into_lines(blk, axis=0, threshold=0)
        assert len(rows) == 3

    def test_text_like_accepts_text_rejects_blob(self):
        text = render_text_block("HELLO WORLD", 2)
        assert is_text_like(text)
        blob = np.ones((40, 40), dtype=bool)
        assert not is_text_like(blob)

    def test_gaussian_blur_smooths(self):
        img = np.zeros((30, 30))
        img[15, 15] = 100.0
        out = gaussian_blur(img, 2.0)
        assert out.max() < 10.0
        assert abs(out.sum() - 100.0) < 1.0

    def test_tiled_blur_bit_identical_to_untiled(self):
        """The row-tiled blur (bandwidth fix for the 840x1200 robust
        ladder) must be BIT-identical to the reference untiled
        separable form — same tap order, halo clamping == edge pad —
        across tile-boundary shapes and adaptive-sigma values."""
        from mangaextractor_spark.kernels import image_ops as io_

        def untiled(img, sigma):
            r = max(1, int(3 * sigma + 0.5))
            x = np.arange(-r, r + 1, dtype=np.float64)
            k = np.exp(-(x * x) / (2 * sigma * sigma))
            k /= k.sum()
            k = k.astype(np.float32)
            out = np.asarray(img, dtype=np.float32)
            out = io_._conv1d(out, k, axis=1)
            return io_._conv1d(out, k, axis=0)

        rng = np.random.default_rng(7)
        for shape in [(1200, 840), (64, 40), (65, 40), (5, 5), (130, 30)]:
            img = rng.integers(0, 256, shape, dtype=np.uint8)
            for sigma in (0.1, 0.52, 0.8, 1.3):
                assert np.array_equal(gaussian_blur(img, sigma), untiled(img, sigma))

    def test_binarize_threshold(self):
        img = np.array([[0, 189, 190, 255]], dtype=np.uint8)
        assert binarize(img).tolist() == [[True, True, False, False]]


class TestReadingOrder:
    def test_rtl_ttb(self):
        # two columns: right column first (top then bottom), then left
        rects = [(10, 10, 50, 40), (100, 10, 150, 40), (100, 60, 150, 90), (10, 60, 50, 90)]
        ranks = reading_order(rects)
        assert ranks == [2, 0, 1, 3]

    def test_single_column(self):
        rects = [(10, 60, 90, 90), (10, 10, 90, 40)]
        assert reading_order(rects) == [1, 0]

    def test_empty(self):
        assert reading_order([]) == []


class TestPageExtraction:
    def test_detect_and_decode_full_corpus(self):
        corpus = generate_corpus(CorpusSpec(n_docs=12, seed=7))
        eng = GlyphOcrEngine()
        regions = corpus["golden_regions"]
        for _, m in corpus["media"].iterrows():
            img = decode_gray_png(m["image_bytes"])
            regs = extract_page_regions(img)
            texts = eng.decode_batch([r.ink for r in regs])
            got = [t for _, t in sorted(zip([r.reading_rank for r in regs], texts)) if t]
            gt = regions[regions.media_ref == m["media_ref"]]
            exp = [
                r.glyph_text
                for r in sorted(gt.itertuples(), key=lambda r: r.reading_rank)
                if r.glyph_text
            ]
            assert got == exp, m["media_ref"]

    def test_detection_iou_against_ground_truth(self):
        corpus = generate_corpus(CorpusSpec(n_docs=6, seed=11))
        regions = corpus["golden_regions"]
        for _, m in corpus["media"].iterrows():
            img = decode_gray_png(m["image_bytes"])
            rects = detect_bubbles(img)
            gt = regions[regions.media_ref == m["media_ref"]]
            assert len(rects) == len(gt)
            for row in gt.itertuples():
                best = max(
                    (_iou((row.x1, row.y1, row.x2, row.y2), r) for r in rects), default=0.0
                )
                assert best >= 0.5, (m["media_ref"], row.bubble_idx, best)

    def test_blank_page_yields_no_regions(self):
        img = np.full((200, 150), 180, dtype=np.uint8)
        assert extract_page_regions(img) == []


def _iou(a, b):
    ax1, ay1, ax2, ay2 = a
    bx1, by1, bx2, by2 = b
    ix = max(0, min(ax2, bx2) - max(ax1, bx1))
    iy = max(0, min(ay2, by2) - max(ay1, by1))
    inter = ix * iy
    union = (ax2 - ax1) * (ay2 - ay1) + (bx2 - bx1) * (by2 - by1) - inter
    return inter / union if union else 0.0


def test_tall_narrow_bubble_detected():
    """Regression: a 1-column page grid yields bubbles with w/h ~0.19;
    the aspect gate must keep them (found by a 512-doc sweep where 21
    pages lost their narrowest bubble)."""
    import numpy as np

    from mangaextractor_spark.kernels.image_ops import detect_bubbles

    img = np.full((600, 420), 180, dtype=np.uint8)
    img[96:507, 310:388] = 255  # 78 x 411 -> aspect 0.19
    img[96:98, 310:388] = 0
    img[505:507, 310:388] = 0
    img[96:507, 310:312] = 0
    img[96:507, 386:388] = 0
    rects = detect_bubbles(img)
    assert len(rects) == 1
    x1, y1, x2, y2 = rects[0]
    assert (x2 - x1, y2 - y1) == (74, 407)


class TestCannyHull:
    """K9: edge mask + per-component convex hull fill (reference
    form_canny_mask, modules/cleaning.py:51-68)."""

    def test_strong_edge_kept_weak_isolated_dropped(self):
        from mangaextractor_spark.kernels.image_ops import sobel_edges

        img = np.full((40, 60), 255, dtype=np.uint8)
        img[10:20, 10:20] = 0  # strong step: |grad| >> 255
        img[25:35, 40:50] = 215  # weak step: contrast 40 -> mag < 255
        edges = sobel_edges(img)
        assert edges[8:22, 8:22].any()  # strong square outlined
        assert not edges[23:37, 38:52].any()  # weak-only component dropped

    def test_weak_attached_to_strong_survives(self):
        from mangaextractor_spark.kernels.image_ops import sobel_edges

        img = np.full((30, 80), 255, dtype=np.uint8)
        img[14:16, 5:40] = 0  # strong bar
        img[14:16, 40:70] = 205  # weak continuation, touches the strong edge
        edges = sobel_edges(img)
        assert edges[13:17, 38:66].any()  # hysteresis keeps the weak tail

    def test_hull_fills_concavities(self):
        from mangaextractor_spark.kernels.image_ops import convex_hull_mask

        mask = np.zeros((30, 30), dtype=bool)
        mask[5:25, 5:10] = True  # L shape
        mask[20:25, 5:25] = True
        hull = convex_hull_mask(mask)
        assert hull[mask].all()
        # row 10: mask covers x 5..9 only; the hull edge (9,5)->(24,20)
        # extends the row to x <= 14 — the concavity gets filled
        assert hull[10, 12]
        assert not hull[10, 20]  # beyond the hull edge stays clear
        assert not hull[2, 2]  # outside stays clear

    def test_ring_becomes_disk(self):
        from mangaextractor_spark.kernels.image_ops import convex_hull_mask

        mask = np.zeros((40, 40), dtype=bool)
        mask[10:30, 10:30] = True
        mask[13:27, 13:27] = False  # hollow square outline
        hull = convex_hull_mask(mask)
        assert hull[10:30, 10:30].all()

    def test_form_canny_mask_covers_glyph_ink(self):
        """The ladder's contract: every ink pixel of rendered text must
        be inside the hull mask of its own edges."""
        from mangaextractor_spark.kernels.image_ops import form_canny_mask

        block = render_text_block("ABC", 2)
        img = np.full((block.shape[0] + 20, block.shape[1] + 20), 255, dtype=np.uint8)
        img[10 : 10 + block.shape[0], 10 : 10 + block.shape[1]][block] = 0
        cmask = form_canny_mask(img)
        ink = img < 128
        assert cmask[ink].all()

    def test_mask_gates_the_edges(self):
        from mangaextractor_spark.kernels.image_ops import form_canny_mask

        img = np.full((40, 40), 255, dtype=np.uint8)
        img[10:20, 10:20] = 0
        gate = np.zeros((40, 40), dtype=bool)  # gate excludes everything
        assert not form_canny_mask(img, mask=gate).any()


class TestColorPng:
    """K3 grayscale: color PNGs decode through the BT.601 luminance
    conversion the reference's cv2 grayscale() applies (cleaning.py:39)."""

    def test_rgb_decodes_to_luma(self):
        from mangaextractor_spark.fixtures.png import decode_gray_png, encode_rgb_png

        rgb = np.zeros((10, 12, 3), dtype=np.uint8)
        rgb[..., 0] = 200  # red
        rgb[2:5, 3:7] = [10, 250, 30]
        got = decode_gray_png(encode_rgb_png(rgb))
        exp = (
            (rgb.astype(np.float64) @ np.array([0.299, 0.587, 0.114]))
            .round().clip(0, 255).astype(np.uint8)
        )
        assert (got == exp).all()

    def test_gray_path_unchanged(self):
        img = (np.arange(64 * 48).reshape(64, 48) % 251).astype(np.uint8)
        assert (decode_gray_png(encode_gray_png(img)) == img).all()

    def test_color_page_through_pipeline_kernel(self):
        """A color-encoded rendered page still segments + decodes."""
        from mangaextractor_spark.fixtures.png import encode_rgb_png
        from mangaextractor_spark.sources.decode import decode_gray_image

        corpus = generate_corpus(CorpusSpec(n_docs=2, seed=42))
        m = corpus["media"].iloc[0]
        gray = decode_gray_png(bytes(m["image_bytes"]))
        rgb = np.stack([gray, gray, gray], axis=-1)
        back = decode_gray_image(encode_rgb_png(rgb))
        assert (back == gray).all()


class TestTextOnly:
    def test_text_only_image_keeps_ink_whitens_rest(self):
        """K2: original pixels under kept text ink, white elsewhere;
        the composite alone still decodes the page's text."""
        from mangaextractor_spark.kernels.image_ops import (
            extract_page_regions,
            text_only_image,
        )

        corpus = generate_corpus(CorpusSpec(n_docs=2, seed=42))
        m = corpus["media"].iloc[0]
        img = decode_gray_png(bytes(m["image_bytes"]))
        out = text_only_image(img)
        kept = out != 255
        assert kept.any()
        assert (out[kept] == img[kept]).all()  # original values preserved
        # the composite is itself a clean page: robust extraction over it
        # yields the same text sequence as over the original
        a = [decode_text_block(r.ink) for r in
             sorted(extract_page_regions(img, robust=True), key=lambda r: r.reading_rank)]
        b = [decode_text_block(r.ink) for r in
             sorted(extract_page_regions(out, robust=True), key=lambda r: r.reading_rank)]
        assert a == b and any(a)


class TestHullComponentCap:
    """K9 pathological-speckle guard: beyond HULL_COMPONENT_CAP the
    hull pass falls back to per-component bbox fills (a superset of
    each hull) with bounded wall time."""

    def test_speckle_storm_bounded_and_exact_for_points(self):
        import time

        from mangaextractor_spark.kernels.image_ops import convex_hull_mask

        mask = np.zeros((600, 600), dtype=bool)
        mask[::3, ::3] = True  # 40k isolated 1px components >> cap
        t0 = time.perf_counter()
        out = convex_hull_mask(mask)
        assert time.perf_counter() - t0 < 2.0
        # 1px components: bbox == hull == the pixel, so the fallback is
        # not just bounded but exact here
        assert (out == mask).all()

    def test_fallback_is_superset_of_hull(self):
        from mangaextractor_spark.kernels.image_ops import convex_hull_mask

        rng = np.random.default_rng(8)
        mask = np.zeros((160, 160), dtype=bool)
        for _ in range(12):
            y, x = rng.integers(5, 140, 2)
            mask[y : y + rng.integers(3, 14), x : x + rng.integers(3, 14)] = True
            mask[y + 2, x - 2 : x + 2] = True  # non-rectangular bumps
        hulls = convex_hull_mask(mask)  # below cap: real hulls
        boxes = convex_hull_mask(mask, component_cap=0)  # forced fallback
        assert (boxes | hulls == boxes).all()  # bbox fill covers hull fill
        assert (hulls | mask == hulls).all()
