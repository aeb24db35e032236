"""Pluggable OCR engines (K21/K22 analog).

The reference shells out to Tesseract per crop (reference
modules/ocr.py:85-100) or WinOCR (:51-83), and its own integration
test skips when the binary is absent (tests/test_pipeline.py:22-24).
This engine keeps the same pluggable seam but batch-first:
``decode_batch`` takes a list of ink masks so a real engine can batch
across an entire Arrow batch (the unit of work), not per crop.

- ``GlyphOcrEngine``: deterministic template-match decoder for the
  synthetic 5x7 glyph font — exact, dependency-free; what tests and
  bench use (span equality is bit-exact).
- ``TesseractOcrEngine``: real OCR, gated behind an import-try; raises
  a clear error when pytesseract is unavailable (as in this sandbox).
"""

from __future__ import annotations

from typing import Protocol

import numpy as np

from ..fixtures.font import decode_text_block


class OcrEngine(Protocol):
    def decode_batch(self, ink_masks: list[np.ndarray]) -> list[str]: ...


class GlyphOcrEngine:
    def decode_batch(self, ink_masks: list[np.ndarray]) -> list[str]:
        return [decode_text_block(m) for m in ink_masks]


def tesseract_lang(language: str, vertical_text: bool | None = None) -> str:
    """P6 language -> tesseract config mapping, faithful to reference
    modules/ocr.py:20-30: ja resolves by the verticalText tri-state
    (None -> both models), en -> eng, pt -> por; anything else falls
    through to tesseract's default (no -l)."""
    if language == "ja":
        if vertical_text is None:
            return "jpn+jpn_vert"
        return "jpn_vert" if vertical_text else "jpn"
    return {"en": "eng", "pt": "por"}.get(language, "")


class TesseractOcrEngine:
    def __init__(self, lang: str = "jpn+jpn_vert"):
        try:
            import pytesseract  # noqa: F401
        except ImportError as e:  # pragma: no cover - not in sandbox
            raise RuntimeError(
                "pytesseract not installed; use GlyphOcrEngine (deterministic) "
                "or install tesseract on the cluster image"
            ) from e
        self.lang = lang

    def decode_batch(self, ink_masks: list[np.ndarray]) -> list[str]:  # pragma: no cover
        import pytesseract

        out = []
        for m in ink_masks:
            img = np.where(m, 0, 255).astype(np.uint8)
            out.append(pytesseract.image_to_string(img, config=f"-l {self.lang}").strip())
        return out


_ENGINES = {"glyph": GlyphOcrEngine, "tesseract": TesseractOcrEngine}


def get_engine(name: str = "glyph") -> OcrEngine:
    return _ENGINES[name]()


class GlyphVerticalOcrEngine:
    """Vertical-text decoder (the jpn_vert analog of the glyph engine:
    the reference maps verticalText -> tesseract 'jpn_vert',
    modules/ocr.py:20-30)."""

    def decode_batch(self, ink_masks: list[np.ndarray]) -> list[str]:
        from ..fixtures.font import decode_text_block_vertical

        return [decode_text_block_vertical(m) for m in ink_masks]


_ENGINES["glyph_vertical"] = GlyphVerticalOcrEngine
