"""Perceptual difference-hash (dHash) for image-level deduplication.

The 64-bit dHash (Krawetz's difference hash, the standard cheap
perceptual fingerprint LAION-style image pipelines dedup with): the
image is reduced to a 9x8 grid of cell means and each bit records
whether a cell is brighter than its right neighbor — robust to
resizing, recompression, and uniform brightness shifts, while a ~1%
pixel perturbation flips only a few bits, so near-duplicate frames sit
within a small Hamming radius.

Exactness discipline (what makes the hash ORACLE-checkable, unlike a
cv2.resize-based dHash): the 9x8 reduction uses integer cell
boundaries ``cell_col(x) = x*9 // w`` / ``cell_row(y) = y*8 // h`` and
the brighter-than test cross-multiplies exact integer sums
(``sum_l * area_r > sum_r * area_l``) instead of dividing — every
operation is integer arithmetic a SQL engine reproduces bit-for-bit
from the same pixels. The 64 bits are packed as 8 row-bands of 8 bits
(band k = bit row k), which is also exactly the pigeonhole unit the
banded Hamming join needs: two hashes within Hamming distance 7 agree
on at least one whole band.

Reference: none (capability beyond the reference). Public algorithm:
dHash as described by N. Krawetz ("Kind of Like That", 2013);
pigeonhole banding as in the SimHash dedup (Manku WWW'07).
"""

from __future__ import annotations

import numpy as np

N_COLS = 9  # grid columns (9 columns -> 8 horizontal differences)
N_ROWS = 8  # grid rows = bands
N_BANDS = N_ROWS
BAND_BITS = N_COLS - 1  # bits per band

# Hamming threshold for the near-dup pair join. With 8 bands, any pair
# within distance BAND_BITS - 1 = 7 shares at least one unchanged band
# (pigeonhole), so the banded equi-join loses no pair under the
# threshold.
HAM_T = 7

# Hot-band cap (the SKETCH_BUCKET_CAP discipline from
# queries/_scale_notes.py): near-flat images all hash to band value 0,
# and a single degenerate band value must never fan a band bucket into
# O(n^2) candidate pairs. Buckets larger than this are dropped from
# candidate generation — mirrored in the oracle, exercised by the
# fixture's flat-image family.
IMG_BAND_CAP = 16


def cell_sums(img: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(sums, areas) of the 9x8 integer grid, exact int64."""
    h, w = img.shape
    ix = (np.arange(w, dtype=np.int64) * N_COLS) // w
    iy = (np.arange(h, dtype=np.int64) * N_ROWS) // h
    cell = (iy[:, None] * N_COLS + ix[None, :]).ravel()
    sums = np.bincount(cell, weights=img.ravel(), minlength=N_ROWS * N_COLS)
    areas = np.bincount(cell, minlength=N_ROWS * N_COLS)
    return sums.astype(np.int64).reshape(N_ROWS, N_COLS), areas.reshape(N_ROWS, N_COLS)


def dhash_bands(img: np.ndarray) -> list[int]:
    """The 8 row-bands of the 64-bit dHash, each an int in [0, 255]:
    band r bit c = 1 iff cell (r, c) is brighter per-pixel than cell
    (r, c+1), compared by exact cross-multiplication."""
    sums, areas = cell_sums(img)
    left_s, right_s = sums[:, :-1], sums[:, 1:]
    left_a, right_a = areas[:, :-1], areas[:, 1:]
    bits = (left_s * right_a) > (right_s * left_a)
    weights = 1 << np.arange(BAND_BITS, dtype=np.int64)
    return [int(v) for v in bits @ weights]


def hamming(bands_a: list[int], bands_b: list[int]) -> int:
    return sum(bin(a ^ b).count("1") for a, b in zip(bands_a, bands_b))
