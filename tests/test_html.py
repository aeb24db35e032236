"""HTML main-content operator semantics (beyond the oracle parity)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mangaextractor_spark.functions.html import html_main_text, html_title

CASES = [
    # boilerplate regions vanish wholesale, case-insensitively
    (
        "<html><head><title>T</title><style>p{x}</style></head>"
        "<body><NAV>menu junk</NAV><p>keep me</p>"
        "<footer>legal junk</footer></body></html>",
        "T",
        "keep me",
    ),
    # entities unescape; &amp;lt; stays &lt; (single pass, amp last)
    (
        "<body><p>a &lt;tag&gt; &amp; more &amp;lt;literal</p></body>",
        "",
        'a <tag> & more &lt;literal',
    ),
    # multi-line script with attributes dies; whitespace collapses
    (
        "<script type='x'>\nvar a = '<p>sneaky</p>';\n</script>  real\n\ntext ",
        "",
        "real text",
    ),
    # aside + header dropped, nested inline tags stripped
    (
        "<header>top</header><article>big <b>bold</b> idea</article><aside>ads</aside>",
        "",
        "big bold idea",
    ),
]


def test_html_operators(spark):
    df = spark.createDataFrame([(h,) for h, *_ in CASES], "html string")
    rows = df.select(
        "html",
        html_title(F.col("html")).alias("t"),
        html_main_text(F.col("html")).alias("m"),
    ).collect()
    got = {r.html: (r.t, r.m) for r in rows}
    for html, t, m in CASES:
        assert got[html] == (t, m), html


class TestPdf:
    def test_roundtrip_with_escapes(self):
        from mangaextractor_spark.fixtures.pdf import build_simple_pdf, extract_pdf_text

        lines = ["plain line", "(paren) start", "back\\slash", "a)b(c"]
        assert extract_pdf_text(build_simple_pdf(lines)) == " ".join(lines)

    def test_page_count_and_gating(self):
        from mangaextractor_spark.fixtures.pdf import (
            UnsupportedPdfError,
            build_simple_pdf,
            extract_pdf_text,
            pdf_page_count,
        )
        import pytest as _pytest

        b = build_simple_pdf(["x"])
        assert pdf_page_count(b) == 1
        with _pytest.raises(UnsupportedPdfError):
            extract_pdf_text(b"not a pdf")
        flate = b.replace(b"<< /Length", b"<< /Filter /FlateDecode /Length")
        with _pytest.raises(UnsupportedPdfError):
            extract_pdf_text(flate)

    def test_empty_document(self):
        from mangaextractor_spark.fixtures.pdf import build_simple_pdf, extract_pdf_text

        assert extract_pdf_text(build_simple_pdf([])) == ""
