"""Tesseract seam tests with a mocked pytesseract — covers the engine's
batching/shape contract and the P6 language->config mapping without
the binary (the reference's own test skip-guards the same way,
reference tests/test_pipeline.py:22-24)."""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest

from mangaextractor_spark.kernels.ocr import get_engine, tesseract_lang


@pytest.fixture()
def fake_pytesseract(monkeypatch):
    calls: list[tuple[np.ndarray, str]] = []
    mod = types.ModuleType("pytesseract")

    def image_to_string(img, config=""):
        calls.append((img, config))
        return f"  text{len(calls)} \n"

    mod.image_to_string = image_to_string
    monkeypatch.setitem(sys.modules, "pytesseract", mod)
    return calls


def test_decode_batch_contract(fake_pytesseract):
    eng = get_engine("tesseract")
    masks = [np.zeros((7, 5), dtype=bool), np.ones((3, 9), dtype=bool)]
    masks[0][2, 3] = True
    out = eng.decode_batch(masks)

    assert out == ["text1", "text2"]  # order preserved, stripped
    assert len(fake_pytesseract) == 2
    for (img, config), mask in zip(fake_pytesseract, masks):
        # ink -> black (0), background -> white (255), uint8, same shape
        assert img.dtype == np.uint8 and img.shape == mask.shape
        assert (img[mask] == 0).all() and (img[~mask] == 255).all()
        assert "-l jpn+jpn_vert" in config  # reference ja default (ocr.py:20-24)


def test_empty_batch(fake_pytesseract):
    assert get_engine("tesseract").decode_batch([]) == []
    assert fake_pytesseract == []


def test_language_config_mapping():
    # reference modules/ocr.py:20-30 truth table
    assert tesseract_lang("ja", None) == "jpn+jpn_vert"
    assert tesseract_lang("ja", True) == "jpn_vert"
    assert tesseract_lang("ja", False) == "jpn"
    assert tesseract_lang("en") == "eng"
    assert tesseract_lang("pt") == "por"
    assert tesseract_lang("de") == ""


def test_engine_errors_without_pytesseract(monkeypatch):
    monkeypatch.setitem(sys.modules, "pytesseract", None)
    import builtins

    real_import = builtins.__import__

    def failing(name, *a, **k):
        if name == "pytesseract":
            raise ImportError(name)
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", failing)
    with pytest.raises(RuntimeError, match="pytesseract not installed"):
        get_engine("tesseract")
