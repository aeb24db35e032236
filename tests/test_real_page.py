"""Box-level sanity of the robust cleaning ladder on the reference's
own real sample page.

The reference ships 05_117.jpg (1600x1072 progressive grayscale scan)
with a 14-line golden transcript
(/root/reference/tests/fixtures/images/05_117.txt) used by its
skip-guarded integration test (tests/manga_extractor/test_pipeline.py).
Real OCR is absent from this container, so the parity check here is
geometric: decode the real scan with the pure-numpy codec, run
``segment_text_regions`` (K16 robust mode), and assert the detected
text blocks land in the page's known speech-bubble text zones — and
never in the blank page margins. Zone rectangles were fixed by
inspecting the rendered detection overlay against the scan; each is a
generous window around one transcript bubble.

Skipped when the reference checkout is absent (the repo stays
standalone).
"""

from __future__ import annotations

import os

import pytest

REF_PAGE = "/root/reference/tests/fixtures/images/05_117.jpg"
REF_TXT = "/root/reference/tests/fixtures/images/05_117.txt"

# Full-resolution (x1, y1, x2, y2) windows around five of the page's
# speech-bubble text columns (vertical Japanese text). Each must
# contain the CENTER of at least one detected text block.
TEXT_ZONES = [
    (820, 40, 1020, 360),  # top-right: three-column opening bubble
    (650, 80, 760, 300),  # top panel reply bubble
    (600, 540, 730, 790),  # middle panel right bubble
    (250, 550, 460, 870),  # middle panel left multi-column bubble
    (430, 1050, 560, 1340),  # bottom panel bubble
]

# Outer blank-margin band of the scan (the paper gutter outside all
# panels): no detected region may reach into it.
MARGIN_X, MARGIN_Y = 30, 50


@pytest.mark.skipif(not os.path.exists(REF_PAGE), reason="reference fixture absent")
def test_robust_ladder_on_reference_scan():
    import numpy as np

    from mangaextractor_spark.fixtures.jpeg import decode_gray_jpeg
    from mangaextractor_spark.kernels.image_ops import segment_text_regions

    img = decode_gray_jpeg(open(REF_PAGE, "rb").read())
    assert img.shape == (1600, 1072)
    h, w = img.shape

    boxes, cleaned = segment_text_regions(img)
    # the 14-line transcript lives in ~10 bubbles; the ladder finds
    # those plus signage text — demand a healthy floor, not a ceiling
    assert len(boxes) >= 12, boxes

    # every detected block stays inside the panel area (no margin hits)
    for x1, y1, x2, y2 in boxes:
        assert x1 >= MARGIN_X and x2 <= w - MARGIN_X, (x1, y1, x2, y2)
        assert y1 >= MARGIN_Y and y2 <= h - MARGIN_Y, (x1, y1, x2, y2)
        # each block carries real ink from the cleaned mask
        assert cleaned[y1:y2, x1:x2].mean() > 0.05

    # each known text zone is hit by at least one block center
    centers = [((x1 + x2) / 2, (y1 + y2) / 2) for x1, y1, x2, y2 in boxes]
    for zx1, zy1, zx2, zy2 in TEXT_ZONES:
        assert any(
            zx1 <= cx <= zx2 and zy1 <= cy <= zy2 for cx, cy in centers
        ), (zx1, zy1, zx2, zy2)


@pytest.mark.skipif(not os.path.exists(REF_TXT), reason="reference fixture absent")
def test_reference_transcript_shape():
    """The golden transcript the zones were derived from: 14 non-empty
    Japanese lines (the reference's own parity target,
    test_pipeline.py)."""
    lines = [
        ln.strip()
        for ln in open(REF_TXT, encoding="utf-8").read().splitlines()
        if ln.strip()
    ]
    assert len(lines) == 14
    assert any(any("぀" <= ch <= "ヿ" for ch in ln) for ln in lines)
