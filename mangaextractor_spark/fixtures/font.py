"""Deterministic 5x7 bitmap glyph font for synthetic manga pages.

The reference validates OCR against a golden page + expected-text pair
(reference tests/fixtures/images/05_117.jpg + .txt); we synthesize the
same kind of fixture with a font whose glyphs are generated from md5
bits, then *forced* to satisfy the decoding invariants:

- every row and every column of the 5x7 cell contains >=1 ink pixel
  (so projection-profile segmentation recovers exact cell boundaries:
  inter-glyph gaps are the only empty columns, inter-line gaps the
  only empty rows);
- the ink is one 8-connected component (real type is a connected
  stroke; disconnected specks would fragment CC statistics and get
  size-filtered by the cleaning ladder as noise);
- all glyph patterns are unique (exact template match decodes).

Glyph legibility is irrelevant — the pipeline's OCR stage is pluggable
(reference modules/ocr.py:85-100 shells out to Tesseract; tests run a
deterministic decoder instead, mirroring how the reference's own
integration test skips when Tesseract is absent,
tests/test_pipeline.py:22-24).
"""

from __future__ import annotations

import hashlib
from functools import lru_cache

import numpy as np

ALPHABET = "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
GLYPH_W, GLYPH_H = 5, 7
# Layout constants (in glyph cells): 1 empty column between glyphs,
# 3 empty columns for a word space, 1 empty row between text lines.
GLYPH_GAP = 1
SPACE_GAP = 3
LINE_GAP = 1


def _components(g: np.ndarray) -> list[list[tuple[int, int]]]:
    """8-connected ink components of a small glyph cell (BFS)."""
    seen = np.zeros_like(g)
    comps: list[list[tuple[int, int]]] = []
    for r0 in range(g.shape[0]):
        for c0 in range(g.shape[1]):
            if not g[r0, c0] or seen[r0, c0]:
                continue
            stack, comp = [(r0, c0)], []
            seen[r0, c0] = True
            while stack:
                r, c = stack.pop()
                comp.append((r, c))
                for dr in (-1, 0, 1):
                    for dc in (-1, 0, 1):
                        rr, cc = r + dr, c + dc
                        if (
                            0 <= rr < g.shape[0]
                            and 0 <= cc < g.shape[1]
                            and g[rr, cc]
                            and not seen[rr, cc]
                        ):
                            seen[rr, cc] = True
                            stack.append((rr, cc))
            comps.append(comp)
    return comps


def _connect(g: np.ndarray) -> None:
    """Bridge ink pieces until the glyph is one 8-connected component:
    repeatedly join the first component to its chebyshev-nearest other
    component along a diagonal-stepping (8-connected) path."""
    while True:
        comps = _components(g)
        if len(comps) <= 1:
            return
        best = None
        for comp in comps[1:]:
            for r1, c1 in comps[0]:
                for r2, c2 in comp:
                    d = max(abs(r1 - r2), abs(c1 - c2))
                    if best is None or d < best[0]:
                        best = (d, r1, c1, r2, c2)
        _, r, c, r2, c2 = best
        while (r, c) != (r2, c2):
            r += (r2 > r) - (r2 < r)
            c += (c2 > c) - (c2 < c)
            g[r, c] = True


@lru_cache(maxsize=1)
def glyph_table() -> dict[str, np.ndarray]:
    """char -> bool (7,5) ink mask."""
    table: dict[str, np.ndarray] = {}
    seen: set[bytes] = set()
    for ch in ALPHABET:
        digest = hashlib.md5(f"glyph:{ch}".encode()).digest()
        bits = np.unpackbits(np.frombuffer(digest, dtype=np.uint8))[: GLYPH_W * GLYPH_H]
        g = bits.reshape(GLYPH_H, GLYPH_W).astype(bool)
        # Force the coverage invariants deterministically.
        for r in range(GLYPH_H):
            if not g[r].any():
                g[r, r % GLYPH_W] = True
        for c in range(GLYPH_W):
            if not g[:, c].any():
                g[c % GLYPH_H, c] = True
        _connect(g)
        key = g.tobytes()
        while key in seen:  # vanishing probability; deterministic fixup:
            # add one ink pixel adjacent to existing ink (preserves
            # connectivity and row/column coverage) and retry
            done = False
            for r in range(GLYPH_H):
                for c in range(GLYPH_W):
                    if not g[r, c] and g[max(0, r - 1) : r + 2, max(0, c - 1) : c + 2].any():
                        g[r, c] = True
                        done = True
                        break
                if done:
                    break
            key = g.tobytes()
        seen.add(key)
        table[ch] = g
    return table


@lru_cache(maxsize=1)
def _decode_table() -> dict[bytes, str]:
    return {g.tobytes(): ch for ch, g in glyph_table().items()}


def render_text_block(text: str, scale: int) -> np.ndarray:
    """Render text (lines split on '\\n', words on ' ') into a bool ink
    mask at integer scale (each font pixel -> scale x scale block)."""
    table = glyph_table()
    lines = text.split("\n")
    line_masks = []
    for line in lines:
        cols: list[np.ndarray] = []
        for wi, word in enumerate(line.split(" ")):
            if wi > 0:
                cols.append(np.zeros((GLYPH_H, SPACE_GAP), dtype=bool))
            for gi, ch in enumerate(word):
                if gi > 0:
                    cols.append(np.zeros((GLYPH_H, GLYPH_GAP), dtype=bool))
                cols.append(table[ch])
        line_masks.append(
            np.concatenate(cols, axis=1) if cols else np.zeros((GLYPH_H, 0), dtype=bool)
        )
    width = max((m.shape[1] for m in line_masks), default=0)
    rows: list[np.ndarray] = []
    for i, m in enumerate(line_masks):
        if i > 0:
            rows.append(np.zeros((LINE_GAP, width), dtype=bool))
        padded = np.zeros((GLYPH_H, width), dtype=bool)
        padded[:, : m.shape[1]] = m
        rows.append(padded)
    block = np.concatenate(rows, axis=0) if rows else np.zeros((0, 0), dtype=bool)
    return np.kron(block, np.ones((scale, scale), dtype=bool))


def _runs(profile: np.ndarray) -> list[tuple[int, int]]:
    """[start, end) runs of True in a 1-D boolean profile."""
    idx = np.flatnonzero(profile)
    if idx.size == 0:
        return []
    breaks = np.flatnonzero(np.diff(idx) > 1)
    starts = np.concatenate(([idx[0]], idx[breaks + 1]))
    ends = np.concatenate((idx[breaks] + 1, [idx[-1] + 1]))
    return list(zip(starts.tolist(), ends.tolist()))


def decode_text_block(ink: np.ndarray) -> str:
    """Inverse of render_text_block given an ink mask that tightly or
    loosely contains a rendered block: projection-profile line/glyph
    segmentation, block-reduce each cell to 5x7, exact template match.
    Unknown glyph cells decode to '?'. Lines join with ' '."""
    ink = np.asarray(ink, dtype=bool)
    row_runs = _runs(ink.any(axis=1))
    out_lines: list[str] = []
    table = _decode_table()
    for y0, y1 in row_runs:
        strip = ink[y0:y1]
        col_runs = _runs(strip.any(axis=0))
        if not col_runs:
            continue
        # glyph height = y1-y0 = 7*scale (invariant: all rows inked)
        scale = max(1, round((y1 - y0) / GLYPH_H))
        chars: list[str] = []
        prev_end: int | None = None
        for x0, x1 in col_runs:
            if prev_end is not None:
                gap = x0 - prev_end
                if gap >= (GLYPH_GAP + 1) * scale:  # word space (3*scale, with slack)
                    chars.append(" ")
            prev_end = x1
            cell = strip[:, x0:x1]
            chars.append(_match_glyph(cell, scale, table))
        out_lines.append("".join(chars))
    return " ".join(out_lines)


def _match_glyph(cell: np.ndarray, scale: int, table: dict[bytes, str]) -> str:
    h, w = cell.shape
    if round(w / scale) != GLYPH_W or round(h / scale) != GLYPH_H:
        return "?"
    # Block-reduce by majority vote over each scale x scale block.
    hh, ww = GLYPH_H * scale, GLYPH_W * scale
    padded = np.zeros((hh, ww), dtype=bool)
    padded[: min(h, hh), : min(w, ww)] = cell[:hh, :ww]
    blocks = padded.reshape(GLYPH_H, scale, GLYPH_W, scale).sum(axis=(1, 3))
    g = blocks > (scale * scale) / 2
    return table.get(g.tobytes(), "?")


def render_text_block_vertical(text: str, scale: int) -> np.ndarray:
    """Tategaki rendering: each '\\n' line becomes a COLUMN of glyphs
    stacked top-to-bottom; columns run RIGHT-TO-LEFT (the first line is
    the rightmost column), as in Japanese vertical manga text (the
    reference drives this via verticalText -> 'jpn_vert',
    modules/ocr.py:20-30). Word spaces become larger vertical gaps."""
    table = glyph_table()
    col_masks = []
    for line in text.split("\n"):
        cells: list[np.ndarray] = []
        for wi, word in enumerate(line.split(" ")):
            if wi > 0:
                cells.append(np.zeros((SPACE_GAP, GLYPH_W), dtype=bool))
            for gi, ch in enumerate(word):
                if gi > 0:
                    cells.append(np.zeros((GLYPH_GAP, GLYPH_W), dtype=bool))
                cells.append(table[ch])
        col_masks.append(
            np.concatenate(cells, axis=0) if cells else np.zeros((0, GLYPH_W), dtype=bool)
        )
    height = max((m.shape[0] for m in col_masks), default=0)
    cols: list[np.ndarray] = []
    for i, m in enumerate(col_masks):  # first line rightmost -> build reversed
        if i > 0:
            cols.append(np.zeros((height, GLYPH_GAP), dtype=bool))
        padded = np.zeros((height, GLYPH_W), dtype=bool)
        padded[: m.shape[0], :] = m
        cols.append(padded)
    block = (
        np.concatenate(list(reversed(cols)), axis=1)
        if cols
        else np.zeros((0, 0), dtype=bool)
    )
    return np.kron(block, np.ones((scale, scale), dtype=bool))


def decode_text_block_vertical(ink: np.ndarray) -> str:
    """Inverse of render_text_block_vertical: column runs read RIGHT to
    LEFT, glyph cells within a column top to bottom, larger vertical
    gaps decode to word spaces. Lines join with ' ' (same convention as
    the horizontal decoder)."""
    ink = np.asarray(ink, dtype=bool)
    col_runs = _runs(ink.any(axis=0))
    out_lines: list[str] = []
    table = _decode_table()
    for x0, x1 in reversed(col_runs):  # rightmost column first
        strip = ink[:, x0:x1]
        row_runs = _runs(strip.any(axis=1))
        if not row_runs:
            continue
        scale = max(1, round((x1 - x0) / GLYPH_W))
        chars: list[str] = []
        prev_end: int | None = None
        for y0, y1 in row_runs:
            if prev_end is not None and y0 - prev_end >= (GLYPH_GAP + 1) * scale:
                chars.append(" ")
            prev_end = y1
            chars.append(_match_glyph(strip[y0:y1, :], scale, table))
        out_lines.append("".join(chars))
    return " ".join(out_lines)
