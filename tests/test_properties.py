"""Property-based tests (hypothesis) for the pure kernels — a test
style the reference lacks entirely (SURVEY §5.4); these pin the
algebraic invariants the pipeline relies on.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from mangaextractor_spark.fixtures.png import decode_gray_png, encode_gray_png
from mangaextractor_spark.kernels.image_ops import (
    close,
    dilate,
    erode,
    label_components,
)
from mangaextractor_spark.kernels.ordering import reading_order

imgs = arrays(np.uint8, st.tuples(st.integers(1, 48), st.integers(1, 48)))
masks = arrays(np.bool_, st.tuples(st.integers(1, 32), st.integers(1, 32)))
odd_k = st.integers(1, 4).map(lambda i: 2 * i - 1)  # 1,3,5,7


@settings(max_examples=60, deadline=None)
@given(imgs)
def test_png_roundtrip(img):
    assert (decode_gray_png(encode_gray_png(img)) == img).all()


@settings(max_examples=60, deadline=None)
@given(masks)
def test_component_areas_partition_the_mask(mask):
    stats = label_components(mask)
    assert stats.area.sum() == np.count_nonzero(mask)
    painted = stats.paint(mask.shape, np.ones(stats.n, dtype=bool))
    assert (painted == mask).all()


def _flood_count(mask: np.ndarray) -> int:
    """Reference 8-connected component count by BFS."""
    seen = np.zeros_like(mask, dtype=bool)
    h, w = mask.shape
    n = 0
    for sy in range(h):
        for sx in range(w):
            if mask[sy, sx] and not seen[sy, sx]:
                n += 1
                stack = [(sy, sx)]
                seen[sy, sx] = True
                while stack:
                    y, x = stack.pop()
                    for dy in (-1, 0, 1):
                        for dx in (-1, 0, 1):
                            yy, xx = y + dy, x + dx
                            if 0 <= yy < h and 0 <= xx < w and mask[yy, xx] and not seen[yy, xx]:
                                seen[yy, xx] = True
                                stack.append((yy, xx))
    return n


@settings(max_examples=40, deadline=None)
@given(masks)
def test_component_count_matches_flood_fill(mask):
    assert label_components(mask).n == _flood_count(mask)


def _brute_window(mask, k, axis, op, pad):
    """Reference windowed any/all by explicit python slicing."""
    r_lo, r_hi = (k - 1) // 2, k // 2
    out = np.empty_like(mask)
    n = mask.shape[axis]
    for i in range(n):
        lo, hi = i - r_lo, i + r_hi + 1
        sl = [slice(None), slice(None)]
        sl[axis] = slice(max(lo, 0), min(hi, n))
        win = mask[tuple(sl)]
        border = lo < 0 or hi > n
        osl = [slice(None), slice(None)]
        osl[axis] = i
        if op == "max":
            out[tuple(osl)] = win.any(axis=axis) | (border and pad)
        else:
            out[tuple(osl)] = win.all(axis=axis) & (not border or pad)
    return out


@settings(max_examples=40, deadline=None)
@given(masks, odd_k, odd_k)
def test_dilate_erode_match_brute_force(mask, kh, kw):
    d = _brute_window(_brute_window(mask, kw, 1, "max", False), kh, 0, "max", False)
    assert (dilate(mask, kh, kw) == d).all()
    e = _brute_window(_brute_window(mask, kw, 1, "min", True), kh, 0, "min", True)
    assert (erode(mask, kh, kw) == e).all()


@settings(max_examples=40, deadline=None)
@given(masks, odd_k, odd_k)
def test_morphology_ordering_and_idempotence(mask, kh, kw):
    c = close(mask, kh, kw)
    assert (c | mask == c).all(), "closing is extensive"
    assert (dilate(mask, kh, kw) | mask == dilate(mask, kh, kw)).all()
    assert (erode(mask, kh, kw) & mask == erode(mask, kh, kw)).all()
    assert (close(c, kh, kw) == c).all(), "closing is idempotent"


rects = st.lists(
    st.tuples(
        st.integers(0, 200), st.integers(0, 200), st.integers(1, 60), st.integers(1, 60)
    ).map(lambda t: (t[0], t[1], t[0] + t[2], t[1] + t[3])),
    min_size=0,
    max_size=12,
)


@settings(max_examples=80, deadline=None)
@given(rects, st.randoms(use_true_random=False))
def test_reading_order_is_permutation_and_input_order_invariant(rs, rnd):
    ranks = reading_order(rs)
    assert sorted(ranks) == list(range(len(rs)))
    idx = list(range(len(rs)))
    rnd.shuffle(idx)
    shuffled = [rs[i] for i in idx]
    ranks2 = reading_order(shuffled)
    # rank of a given rect must not depend on input order (ties included:
    # the tie-break uses only geometry)
    by_rect = {}
    for r, k in zip(rs, ranks):
        by_rect.setdefault(r, []).append(k)
    by_rect2 = {}
    for r, k in zip(shuffled, ranks2):
        by_rect2.setdefault(r, []).append(k)
    for r in by_rect:
        assert sorted(by_rect[r]) == sorted(by_rect2[r])


@settings(max_examples=30, deadline=None)
@given(arrays(np.uint8, st.tuples(st.integers(8, 40), st.integers(8, 40))))
def test_jpeg_roundtrip_bounded(img):
    """Any 8-bit image survives a q90 JPEG roundtrip within a bounded
    error and exact shape."""
    from mangaextractor_spark.fixtures.jpeg import decode_gray_jpeg, encode_gray_jpeg

    out = decode_gray_jpeg(encode_gray_jpeg(img, quality=90))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 64  # worst-case blocky noise


@settings(max_examples=30, deadline=None)
@given(arrays(np.uint8, st.tuples(st.integers(1, 24), st.integers(1, 24), st.just(3))))
def test_color_png_luma_roundtrip(rgb):
    """Color PNG decode == BT.601 luminance of the pixels, exactly."""
    from mangaextractor_spark.fixtures.png import encode_rgb_png

    got = decode_gray_png(encode_rgb_png(rgb))
    exp = (
        (rgb.astype(np.float64) @ np.array([0.299, 0.587, 0.114]))
        .round().clip(0, 255).astype(np.uint8)
    )
    assert (got == exp).all()


@settings(max_examples=40, deadline=None)
@given(st.lists(st.text(alphabet="ABC XYZ()\\", min_size=0, max_size=30), max_size=5))
def test_pdf_text_roundtrip(lines):
    """PDF writer/extractor round-trip any printable lines incl. the
    escape characters."""
    from mangaextractor_spark.fixtures.pdf import build_simple_pdf, extract_pdf_text

    assert extract_pdf_text(build_simple_pdf(lines)) == " ".join(lines)


@settings(max_examples=20, deadline=None)
@given(
    arrays(np.uint8, st.tuples(st.integers(8, 40), st.integers(8, 40), st.just(3))),
    st.sampled_from(["444", "422", "440", "420"]),
    st.booleans(),
)
def test_color_jpeg_roundtrip_properties(rgb, sub, progressive):
    """Any RGB image, any subsampling, baseline or progressive: decode
    preserves shape; the gray decode equals the Y plane the encoder
    computed (within quantization error); progressive and baseline
    layouts of the same coefficients decode byte-identically."""
    from mangaextractor_spark.fixtures.jpeg import (
        decode_gray_jpeg,
        decode_rgb_jpeg,
        encode_color_jpeg,
    )

    b = encode_color_jpeg(rgb, quality=92, subsampling=sub, progressive=progressive)
    back = decode_rgb_jpeg(b)
    assert back.shape == rgb.shape
    g = decode_gray_jpeg(b)
    luma = rgb.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    assert np.abs(g.astype(np.float64) - luma).max() <= 64
    other = encode_color_jpeg(rgb, quality=92, subsampling=sub, progressive=not progressive)
    assert (decode_rgb_jpeg(other) == back).all()


@settings(max_examples=25, deadline=None)
@given(st.binary(min_size=0, max_size=400))
def test_jpeg_decoder_garbage_raises_domain_errors(data):
    """Arbitrary bytes never escape the documented gating contract:
    decode either succeeds or raises UnsupportedJpegError/ValueError —
    no TypeError/KeyError/ZeroDivisionError/IndexError leaks."""
    from mangaextractor_spark.fixtures.jpeg import UnsupportedJpegError, decode_gray_jpeg

    blob = b"\xff\xd8" + data  # force the SOI path deeper than the sig check
    try:
        decode_gray_jpeg(blob)
    except UnsupportedJpegError:
        pass  # the only permitted failure mode
