"""Minimal deterministic PDF writer + text extractor (pure python).

North_rule names 'PDF/layout parse' among the extraction surfaces;
this is the data-plane slice of it: single-page PDFs with UNCOMPRESSED
content streams (text positioned with Td/TL/T*, one ``(...) Tj`` show
operator per line), written by the fixture generator and parsed back
by a real object-walk extractor — the pipeline's mapInPandas kernel
uses the extractor, the DuckDB oracle extracts the same show-operator
strings by regexp over the byte stream.

Scope (documented, gated): uncompressed streams, literal (non-hex)
ASCII strings with the standard ``\\( \\) \\\\`` escapes. FlateDecode
or hex strings raise ``UnsupportedPdfError`` — the explicit-gate
pattern used by the other codecs.
"""

from __future__ import annotations

import re

_ESC = {"(": "\\(", ")": "\\)", "\\": "\\\\"}


class UnsupportedPdfError(ValueError):
    pass


def _escape(line: str) -> str:
    return "".join(_ESC.get(c, c) for c in line)


def build_simple_pdf(lines: list[str]) -> bytes:
    """Single-page letter PDF showing ``lines`` top-down at 12pt."""
    shows = " T* ".join(f"({_escape(ln)}) Tj" for ln in lines) or "() Tj"
    content = f"BT /F1 12 Tf 72 752 Td 14 TL {shows} ET".encode("latin-1")
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>",
        b"<< /Length " + str(len(content)).encode() + b" >>\nstream\n" + content + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj ".encode() + body + b" endobj\n"
    xref_at = len(out)
    out += b"xref\n0 " + str(len(objs) + 1).encode() + b"\n"
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        b"trailer << /Size " + str(len(objs) + 1).encode() + b" /Root 1 0 R >>\n"
        b"startxref\n" + str(xref_at).encode() + b"\n%%EOF"
    )
    return bytes(out)


_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.S)
_SHOW_RE = re.compile(rb"\(((?:[^()\\]|\\.)*)\)\s*Tj")
_UNESC = {b"\\(": b"(", b"\\)": b")", b"\\\\": b"\\"}


def extract_pdf_text(b: bytes) -> str:
    """All ``(...) Tj`` show strings across content streams, in stream
    order, joined by single spaces."""
    if not b.startswith(b"%PDF-"):
        raise UnsupportedPdfError("not a PDF")
    parts: list[bytes] = []
    for m in _STREAM_RE.finditer(b):
        stream = m.group(1)
        if b"FlateDecode" in b[max(0, m.start() - 200) : m.start()]:
            raise UnsupportedPdfError(
                "compressed content streams unsupported (plug zlib/Flate on a full deploy)"
            )
        for sm in _SHOW_RE.finditer(stream):
            s = sm.group(1)
            for esc, ch in _UNESC.items():
                s = s.replace(esc, ch)
            parts.append(s)
    return " ".join(p.decode("latin-1") for p in parts)


def pdf_page_count(b: bytes) -> int:
    m = re.search(rb"/Count\s+(\d+)", b)
    return int(m.group(1)) if m else 0
