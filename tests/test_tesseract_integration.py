"""Skip-guarded REAL-Tesseract integration test.

Mirrors the reference's own gating (reference
tests/manga_extractor/test_pipeline.py:22-24 skips when the tesseract
binary / TF model are absent): in this sandbox pytesseract is not
installed so the test skips cleanly; on a cluster image with
pytesseract + the tesseract binary it exercises the REAL
``TesseractOcrEngine.decode_batch`` path end-to-end on a rendered
fixture crop (batch contract + non-empty recognition on real text).
"""

from __future__ import annotations

import shutil

import pytest


def test_tesseract_engine_on_rendered_crop():
    pytest.importorskip("pytesseract")
    if shutil.which("tesseract") is None:
        pytest.skip("tesseract binary not on PATH")

    import numpy as np

    from mangaextractor_spark.fixtures.font import render_text_block
    from mangaextractor_spark.kernels.ocr import TesseractOcrEngine, tesseract_lang

    # high-contrast crop: fixture block glyphs upscaled enough for a
    # real OCR engine (6px stroke), plus an empty mask in the batch
    block = render_text_block("HELLO WORLD", 6)
    eng = TesseractOcrEngine(lang=tesseract_lang("en"))
    out = eng.decode_batch([block, np.zeros((40, 40), dtype=bool)])
    assert len(out) == 2
    assert all(isinstance(t, str) for t in out)
    assert out[0].strip() != ""  # real engine reads SOMETHING from real text
    assert out[1].strip() == ""


def test_tesseract_engine_unavailable_raises_clearly():
    """In environments WITHOUT pytesseract, constructing the engine
    raises the documented RuntimeError (the explicit gate the kernel's
    engine registry relies on) — the inverse guard of the test above."""
    try:
        import pytesseract  # noqa: F401

        pytest.skip("pytesseract installed; gate not reachable")
    except ImportError:
        pass
    from mangaextractor_spark.kernels.ocr import TesseractOcrEngine

    with pytest.raises(RuntimeError, match="pytesseract"):
        TesseractOcrEngine()
