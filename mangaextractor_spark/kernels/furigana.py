"""Furigana estimation/removal kernels (reference K18/K19).

The reference detects furigana (small ruby text columns printed beside
vertical main text) by comparing connected-component column widths: a
column is furigana if a wider column exists to its left within
``3.0 x width`` and its own width is ``< 0.65 x`` that column's width
(reference modules/furigana.py:51-101; gaussian column blur constants
FURIGANA_VERTICAL_SIGMA_MULTIPLIER=2.5 / binary threshold 240 at
core/defaults.py:20-24). Removal masks those columns out before OCR
(furigana.py:103-110), and the OCR loop retries on the unfiltered
image when the filtered crop comes back empty (ocr.py:147-167).

This engine keeps the same column-geometry rule as a pure numpy
kernel; it is OFF by default exactly as in the reference
(``Operation.furigana=False``, core/classes.py:81).
"""

from __future__ import annotations

import numpy as np

from .image_ops import CCStats, average_cc_size, close, label_components

WIDTH_RATIO = 0.65  # furigana col narrower than 0.65x its base column
NEIGHBOR_DISTANCE = 3.0  # base column must lie within 3.0x width to the left
VERTICAL_SIGMA_MULTIPLIER = 2.5  # reference core/defaults.py:20


def column_components(ink: np.ndarray) -> CCStats:
    """Label vertical text columns: bridge intra-column glyph gaps with
    a VERTICAL morphological closing sized from the average glyph size
    (the closing twin of the reference's gaussian column blur,
    sigma = FURIGANA_VERTICAL_SIGMA_MULTIPLIER x average_size,
    modules/furigana.py:15-49), then take connected components — each
    text column becomes one blob whose bbox width is the column width."""
    base = label_components(ink)
    if base.n == 0:
        return base
    avg = average_cc_size(base)
    k = max(3, int(2 * VERTICAL_SIGMA_MULTIPLIER * avg)) | 1
    return label_components(close(ink, k, 1))


def estimate_furigana_columns(ink: np.ndarray) -> np.ndarray:
    """Return a bool mask over columns marking estimated furigana.

    Rule (furigana.py:51-101 semantics): for each detected column blob,
    find the nearest blob to its LEFT whose gap is within
    NEIGHBOR_DISTANCE x own width; if that blob is wider such that
    own_width < WIDTH_RATIO x left_width, mark this column as furigana.
    """
    stats = column_components(ink)
    mask = np.zeros(ink.shape[1], dtype=bool)
    if stats.n == 0:
        return mask
    order = np.argsort(stats.x1)
    for idx, ci in enumerate(order):
        w = stats.x2[ci] - stats.x1[ci]
        for cj in reversed(order[:idx].tolist()):  # nearest left first
            gap = stats.x1[ci] - stats.x2[cj]
            if gap > NEIGHBOR_DISTANCE * w:
                break
            left_w = stats.x2[cj] - stats.x1[cj]
            if w < WIDTH_RATIO * left_w:
                mask[stats.x1[ci] : stats.x2[ci]] = True
                break
    return mask


def remove_furigana(ink: np.ndarray) -> np.ndarray:
    """K19: zero out estimated furigana columns (returns a new mask)."""
    cols = estimate_furigana_columns(ink)
    out = ink.copy()
    out[:, cols] = False
    return out
