"""Deterministic synthetic corpus generator — the 05_117.jpg analog.

Renders N-document corpora of manga-style pages: screentone-ish
background, white rectangular speech bubbles with black borders at
known grid positions, deterministic 5x7 block-glyph text inside, all
encoded as real PNG bytes addressed by ``media_ref``. Emits:

- ``documents``  (doc_id, spans: list of span dicts) — the interleaved
  text+image input table per BASELINE.json input_hint;
- ``media``      (media_ref, image_bytes, width, height, page_md5);
- ``golden_spans`` (doc_id, kind, text, media_ref, order) — computed
  from the generation parameters (NOT by running the pipeline);
- ``golden_regions`` (media_ref, bubble_idx, x1..y2, glyph_text,
  reading_rank) for kernel-level unit tests.

Page-count skew is zipf-ish by design: most docs get 1-5 pages, a few
get many — exercising the salted-repartition path (north_rule).
Everything derives from (seed, doc index): regenerating any subset is
reproducible, which is what makes partition-granular resume testable.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np
import pandas as pd

from ..kernels.ordering import reading_order
from .font import ALPHABET, GLYPH_H, GLYPH_W, render_text_block, render_text_block_vertical
from .png import encode_gray_png

BG_LO, BG_HI = 150, 215  # screentone range; bubbles are 255, ink is 0
BORDER = 2
WHITE_THRESHOLD = 240  # bubble interior detection threshold (kernels share it)

_VOCAB = [
    "KAWA", "YAMA", "SORA", "HOSHI", "KUMO", "TORI", "NEKO", "INU",
    "HANA", "MORI", "UMI", "KAZE", "YUKI", "TSUKI", "HIKARI", "MIZU",
    "AME", "KURO", "SHIRO", "AKAI", "AOI", "MIDORI", "GIN", "KIN",
]


@dataclass(frozen=True)
class CorpusSpec:
    n_docs: int = 64
    seed: int = 42
    page_w: int = 420
    page_h: int = 600
    scale: int = 2  # glyph pixel scale
    max_pages: int = 24
    p_text_span: float = 0.6
    p_bubble: float = 0.75
    p_empty_bubble: float = 0.12
    vertical_text: bool = False  # tategaki columns (jpn_vert analog)
    p_furigana: float = 0.0  # vertical mode: chance of a ruby side column
    # Noisy-scan knobs (defaults = clean corpus). These produce pages
    # where the whiteness-CC fast path demonstrably fails and only the
    # robust cleaning-ladder mode (extract_page_regions(robust=True))
    # reproduces the golden spans:
    bubble_fill: int = 255  # <240 = off-white bubbles, invisible to the whiteness mask
    p_speckle: float = 0.0  # per-lattice-site chance of a 1px dark speck inside bubbles
    border_art: bool = False  # large black blobs in page margins (robust must reject)
    p_jpeg: float = 0.0  # per-page chance of JPEG (q95) instead of PNG encoding
    # Among JPEG pages: chance of a 3-component YCbCr 4:2:0 encoding
    # (half baseline, half progressive) with a constant-chroma tint that
    # preserves the page's BT.601 luma — real-world manga scans are
    # routinely saved as color JPEG even when visually grayscale
    # (reference loads them via cv2.imread, modules/detection.py:41).
    p_color_jpeg: float = 0.0
    # Per-doc chance of a COVER page: a 2x-upscaled rendered page stored
    # as media_ref "{doc_id}#capa", NOT referenced by any span — the
    # analog of the reference's capa/ directories, which its extraction
    # walk skips but its cover pipeline thumbnails and upserts
    # (processor.py:287-292, db_util.py:377-451).
    p_cover: float = 0.0
    # Encode covers as COLOR (type-2) PNGs with the luma-preserving
    # tint — real manga covers are color even for grayscale interiors.
    color_covers: bool = False


def _doc_rng(spec: CorpusSpec, doc_idx: int) -> np.random.Generator:
    return np.random.Generator(np.random.PCG64(hash((spec.seed, doc_idx)) & 0x7FFFFFFF))


def _n_pages(rng: np.random.Generator, spec: CorpusSpec) -> int:
    # zipf-ish skew: P(n) ~ n^-1.6 truncated at max_pages
    weights = np.arange(1, spec.max_pages + 1, dtype=np.float64) ** -1.6
    return int(rng.choice(np.arange(1, spec.max_pages + 1), p=weights / weights.sum()))


def _prose(rng: np.random.Generator) -> str:
    n = int(rng.integers(3, 9))
    return " ".join(_VOCAB[int(i)] for i in rng.integers(0, len(_VOCAB), n))


def _bubble_word(rng: np.random.Generator) -> str:
    n = int(rng.integers(2, 6))
    return "".join(ALPHABET[int(i)] for i in rng.integers(0, len(ALPHABET), n))


def _render_page(
    rng: np.random.Generator, spec: CorpusSpec
) -> tuple[np.ndarray, list[dict]]:
    """Render one page; returns (uint8 image, bubble records)."""
    w, h, s = spec.page_w, spec.page_h, spec.scale
    # Screentone: 3px checker + deterministic per-page noise.
    yy, xx = np.mgrid[0:h, 0:w]
    checker = (((xx // 3) + (yy // 3)) % 2).astype(np.uint8)
    noise = rng.integers(0, 16, size=(h, w), dtype=np.uint8)
    img = (BG_LO + checker * 40 + noise).clip(0, BG_HI).astype(np.uint8)

    n_cols = int(rng.integers(1, 4))
    n_rows = int(rng.integers(1, 4))
    cell_w, cell_h = w // n_cols, h // n_rows
    bubbles: list[dict] = []
    for gc in range(n_cols):
        for gr in range(n_rows):
            if rng.random() > spec.p_bubble:
                continue
            cx1, cy1 = gc * cell_w, gr * cell_h
            margin_x = max(8, cell_w // 8)
            margin_y = max(8, cell_h // 8)
            bx1 = cx1 + margin_x + int(rng.integers(0, max(1, cell_w // 10)))
            by1 = cy1 + margin_y + int(rng.integers(0, max(1, cell_h // 10)))
            bx2 = cx1 + cell_w - margin_x - int(rng.integers(0, max(1, cell_w // 10)))
            by2 = cy1 + cell_h - margin_y - int(rng.integers(0, max(1, cell_h // 10)))
            if bx2 - bx1 < 40 or by2 - by1 < 30:
                continue
            img[by1:by2, bx1:bx2] = spec.bubble_fill
            img[by1 : by1 + BORDER, bx1:bx2] = 0
            img[by2 - BORDER : by2, bx1:bx2] = 0
            img[by1:by2, bx1 : bx1 + BORDER] = 0
            img[by1:by2, bx2 - BORDER : bx2] = 0

            text = ""
            ink_rect = None  # tight bbox of rendered ink (the ordering key)
            if rng.random() > spec.p_empty_bubble:
                pad = 3 * s + BORDER
                avail_w = (bx2 - bx1) - 2 * pad
                avail_h = (by2 - by1) - 2 * pad
                if spec.vertical_text:
                    # chars stack vertically per column; lines = columns
                    max_chars = avail_h // ((GLYPH_H + 1) * s)
                    max_lines = avail_w // ((GLYPH_W + 1) * s)
                else:
                    max_chars = avail_w // ((GLYPH_W + 1) * s)
                    max_lines = avail_h // ((GLYPH_H + 1) * s)
                if max_chars >= 2 and max_lines >= 1:
                    n_lines = int(rng.integers(1, min(3, max_lines) + 1))
                    lines = []
                    for _ in range(n_lines):
                        words, used = [], 0
                        while True:
                            cand = _bubble_word(rng)
                            need = len(cand) + (1 if words else 0)
                            if used + need > max_chars:
                                break
                            words.append(cand)
                            used += need
                            if rng.random() < 0.4:
                                break
                        if words:
                            lines.append(" ".join(words))
                    text = "\n".join(lines)
            has_ruby = False
            if text:
                render = render_text_block_vertical if spec.vertical_text else render_text_block
                block = render(text, s)
                ty, tx = by1 + 3 * s + BORDER, bx1 + 3 * s + BORDER
                region = img[ty : ty + block.shape[0], tx : tx + block.shape[1]]
                region[block[: region.shape[0], : region.shape[1]]] = 0
                ink_rect = (tx, ty, tx + region.shape[1], ty + region.shape[0])
                if spec.vertical_text and rng.random() < spec.p_furigana:
                    # Ruby (furigana) side column: half-scale glyphs to the
                    # RIGHT of the main text, within 3x its width — exactly
                    # the geometry the K18 rule detects (narrow column with
                    # a wider base column to its left). NOT in the golden
                    # text: the pipeline must strip it (furigana=True).
                    ruby_s = max(1, s // 2)
                    ruby = render_text_block_vertical(_bubble_word(rng), ruby_s)
                    gap = 2 * ruby_s
                    rx = tx + block.shape[1] + gap
                    ry = ty
                    if (
                        rx + ruby.shape[1] <= bx2 - BORDER - 2
                        and ry + ruby.shape[0] <= by2 - BORDER - 2
                        and ruby.shape[1] < 0.65 * 5 * s
                    ):
                        rr = img[ry : ry + ruby.shape[0], rx : rx + ruby.shape[1]]
                        rr[ruby[: rr.shape[0], : rr.shape[1]]] = 0
                        has_ruby = True
                        ink_rect = (
                            min(ink_rect[0], rx),
                            min(ink_rect[1], ry),
                            max(ink_rect[2], rx + rr.shape[1]),
                            max(ink_rect[3], ry + rr.shape[0]),
                        )
            bubbles.append(
                {"x1": bx1, "y1": by1, "x2": bx2, "y2": by2,
                 "glyph_text": text.replace("\n", " "), "has_ruby": has_ruby,
                 "ink_rect": ink_rect}
            )
    if spec.p_speckle > 0:
        _add_speckle(img, rng, spec, bubbles)
    if spec.border_art:
        _add_border_art(img, rng, bubbles)
    # Reading order is defined over the TIGHT INK RECTS of the non-empty
    # text regions (north_star: "sort detected text regions"), so every
    # detector — whiteness-CC or cleaning ladder — that finds the same
    # text derives the same sequence. Empty bubbles never emit spans;
    # they get stable trailing ranks so region tables remain total.
    nonempty = [b for b in bubbles if b["ink_rect"] is not None]
    for b, r in zip(nonempty, reading_order([b["ink_rect"] for b in nonempty])):
        b["reading_rank"] = r
    nxt = len(nonempty)
    for b in bubbles:
        if b["ink_rect"] is None:
            b["reading_rank"] = nxt
            nxt += 1
        del b["ink_rect"]
    return img, bubbles


def _tint_rgb(gray: np.ndarray) -> np.ndarray:
    """Deterministic sepia-ish RGB page whose BT.601 luma equals the
    gray page (constant chroma Cb=134, Cr=121 via the inverse JFIF
    transform; clipping near pure black/white perturbs luma by <4,
    far inside every kernel threshold)."""
    y = gray.astype(np.float64)
    cb, cr = 6.0, -7.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


def _add_speckle(
    img: np.ndarray, rng: np.random.Generator, spec: CorpusSpec, bubbles: list[dict]
) -> None:
    """1px dark specks on a 4px lattice inside bubble interiors, kept
    >= 4px clear of any existing ink so they can never merge with glyph
    (or border) components — the robust ladder's size filter must drop
    them as isolated specks, not as text damage."""
    ink = img < 128
    for b in bubbles:
        y0, y1 = b["y1"] + BORDER + 3, b["y2"] - BORDER - 3
        x0, x1 = b["x1"] + BORDER + 3, b["x2"] - BORDER - 3
        for y in range(y0, y1, 4):
            for x in range(x0, x1, 4):
                if rng.random() >= spec.p_speckle:
                    continue
                if ink[max(0, y - 4) : y + 5, max(0, x - 4) : x + 5].any():
                    continue
                img[y, x] = int(rng.integers(30, 90))
                ink[y, x] = True


def _add_border_art(img: np.ndarray, rng: np.random.Generator, bubbles: list[dict]) -> None:
    """Large black blobs (r=45 discs) pinned to page corners when they
    clear every bubble by >= 6px. Far above the size filter's 4x-average
    cutoff, so the robust ladder must reject them outright; the
    whiteness path never sees them (they are not white)."""
    h, w = img.shape
    r = 45
    yy, xx = np.mgrid[-r : r + 1, -r : r + 1]
    disc = (yy * yy + xx * xx) <= r * r
    for cy, cx in ((r + 1, r + 1), (h - r - 2, w - r - 2), (r + 1, w - r - 2)):
        clear = all(
            cx + r < b["x1"] - 6 or cx - r > b["x2"] + 6
            or cy + r < b["y1"] - 6 or cy - r > b["y2"] + 6
            for b in bubbles
        )
        if not clear:
            continue
        region = img[cy - r : cy + r + 1, cx - r : cx + r + 1]
        region[disc[: region.shape[0], : region.shape[1]]] = 0


def generate_corpus(
    spec: CorpusSpec, processes: int | None = None
) -> dict[str, pd.DataFrame]:
    """Generate the corpus; ``processes>1`` fans doc generation out over
    a multiprocessing pool (docs are independent by construction)."""
    if processes and processes > 1:
        from multiprocessing import Pool

        with Pool(processes) as pool:
            results = pool.starmap(
                _generate_doc,
                [(spec, di) for di in range(spec.n_docs)],
                chunksize=max(1, spec.n_docs // (processes * 4)),
            )
    else:
        results = [_generate_doc(spec, di) for di in range(spec.n_docs)]
    docs_rows, media_rows, golden_rows, region_rows = [], [], [], []
    for d, m, g, r in results:
        docs_rows.append(d)
        media_rows.extend(m)
        golden_rows.extend(g)
        region_rows.extend(r)
    return {
        "documents": pd.DataFrame(docs_rows),
        "media": pd.DataFrame(media_rows),
        "golden_spans": pd.DataFrame(golden_rows),
        "golden_regions": pd.DataFrame(region_rows),
    }


def _generate_doc(spec: CorpusSpec, di: int) -> tuple[dict, list, list, list]:
    media_rows: list[dict] = []
    golden_rows: list[dict] = []
    region_rows: list[dict] = []
    rng = _doc_rng(spec, di)
    doc_id = f"manga{di % 37:03d}/vol{(di // 7) % 9 + 1:02d}/ch{di:04d}"
    n_pages = _n_pages(rng, spec)
    spans: list[dict] = []
    emitted: list[tuple[str, str]] = []  # (text, media_ref) in final order
    offset = 0
    for p in range(n_pages):
        if rng.random() < spec.p_text_span:
            prose = _prose(rng)
            spans.append(
                {"kind": "text", "text": prose, "media_ref": "", "offset": offset}
            )
            emitted.append((prose, ""))
            offset += 1
        media_ref = f"{doc_id}#p{p + 1}"
        img, bubbles = _render_page(rng, spec)
        # Short-circuit keeps the rng stream untouched when p_jpeg=0, so
        # pre-existing corpora (and their goldens) are bit-identical.
        if spec.p_jpeg > 0 and rng.random() < spec.p_jpeg:
            if spec.p_color_jpeg > 0 and rng.random() < spec.p_color_jpeg:
                from .jpeg import encode_color_jpeg

                png = encode_color_jpeg(
                    _tint_rgb(img),
                    quality=95,
                    subsampling="420",
                    progressive=bool(rng.integers(0, 2)),
                )
            else:
                from .jpeg import encode_gray_jpeg

                png = encode_gray_jpeg(img, quality=95)
        else:
            png = encode_gray_png(img)
        media_rows.append(
            {
                "media_ref": media_ref,
                "image_bytes": png,
                "width": img.shape[1],
                "height": img.shape[0],
                "page_md5": hashlib.md5(png).hexdigest(),
            }
        )
        for bi, b in enumerate(bubbles):
            region_rows.append({"media_ref": media_ref, "bubble_idx": bi, **b})
        spans.append(
            {"kind": "image", "text": "", "media_ref": media_ref, "offset": offset}
        )
        offset += 1
        for b in sorted(
            (b for b in bubbles if b["glyph_text"]), key=lambda b: b["reading_rank"]
        ):
            emitted.append((b["glyph_text"], media_ref))
    if spec.p_cover > 0 and rng.random() < spec.p_cover:
        cover_img, _ = _render_page(rng, spec)
        cover_img = np.kron(cover_img, np.ones((2, 2), dtype=np.uint8))
        if spec.color_covers:
            from .png import encode_rgb_png

            cpng = encode_rgb_png(_tint_rgb(cover_img))
        else:
            cpng = encode_gray_png(cover_img)
        media_rows.append(
            {
                "media_ref": f"{doc_id}#capa",
                "image_bytes": cpng,
                "width": cover_img.shape[1],
                "height": cover_img.shape[0],
                "page_md5": hashlib.md5(cpng).hexdigest(),
            }
        )
    for order, (text, media_ref) in enumerate(emitted):
        golden_rows.append(
            {
                "doc_id": doc_id,
                "kind": "text",
                "text": text,
                "media_ref": media_ref,
                "order": order,
            }
        )
    return {"doc_id": doc_id, "spans": spans}, media_rows, golden_rows, region_rows
