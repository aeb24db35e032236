"""HTML boilerplate-strip query (north_rule: 'HTML boilerplate strip
... DOM heuristics' as data-plane operators).

Synthetic HTML pages are built deterministically from the `documents`
table IN BOTH ENGINES (the same construction trick as the parsing
queries' paths): entity-escaped body text wrapped in an article,
plus title/head/style/nav/footer boilerplate that must NOT survive.
The operator chain (drop boilerplate regions -> strip tags ->
unescape entities -> collapse whitespace, functions/html.py) is pure
codegen'd Column expressions — a 100 TB pass is one scan, no shuffle,
no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.html import html_main_sql, html_main_text, html_title, html_title_sql
from ..session import load_table, spread
from . import register

_ESC_SQL = (
    "REPLACE(REPLACE(REPLACE(text, '&', '&amp;'), '<', '&lt;'), '>', '&gt;')"
)
_HTML_SQL = (
    "'<html><head><title> Doc &quot;' || CAST(doc_id AS VARCHAR) || '&quot; </title>"
    "<style>p { color: red }</style></head><body>"
    "<NAV class=\"menu\">HOME | ABOUT | NAVJUNK</NAV>"
    "<article><p>' || " + _ESC_SQL + " || '</p></article>"
    "<footer>FOOTERJUNK &copy; 2026</footer></body></html>'"
)


def _html_col() -> F.Column:
    esc = F.replace(F.col("text"), F.lit("&"), F.lit("&amp;"))
    esc = F.replace(esc, F.lit("<"), F.lit("&lt;"))
    esc = F.replace(esc, F.lit(">"), F.lit("&gt;"))
    return F.concat(
        F.lit('<html><head><title> Doc &quot;'),
        F.col("doc_id").cast("string"),
        F.lit('&quot; </title><style>p { color: red }</style></head><body>'),
        F.lit('<NAV class="menu">HOME | ABOUT | NAVJUNK</NAV>'),
        F.lit("<article><p>"),
        esc,
        F.lit("</p></article><footer>FOOTERJUNK &copy; 2026</footer></body></html>"),
    )


@register(
    "html_main_content",
    f"""
    WITH pages AS (SELECT doc_id, {_HTML_SQL} AS html FROM documents)
    SELECT doc_id,
           {html_title_sql("html")} AS title,
           {html_main_sql("html")} AS main_text
    FROM pages ORDER BY doc_id
    """,
    doc="HTML main-content extraction: case-insensitive wholesale "
    "removal of script/style/nav/header/footer/aside regions, tag "
    "strip, predefined-entity unescape (&amp; last), whitespace "
    "collapse, plus <title> extraction — all RE2-compatible codegen'd "
    "expressions mirrored verbatim in the oracle. The synthetic pages "
    "plant boilerplate text (NAVJUNK/FOOTERJUNK/CSS) that must vanish "
    "and entity-escaped body text that must round-trip exactly.",
    tags=("text", "extract"),
)
def html_main_content(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    pages = d.select("doc_id", _html_col().alias("html"))
    return pages.select(
        "doc_id",
        html_title(F.col("html")).alias("title"),
        html_main_text(F.col("html")).alias("main_text"),
    ).orderBy("doc_id")


# --- PDF text extraction (north_rule: 'PDF/layout parse') -----------------

# In DuckDB's BLOB -> VARCHAR cast, a literal backslash byte renders as
# the four characters '\x5C', so the PDF string-escape prefix becomes
# that sequence. The content grammar below admits escaped parens /
# escaped backslash / any non-paren char; unescape replaces the
# rendered forms. (Covered-shape note: fixture text is printable ASCII,
# so no other bytes render escaped inside the show strings.)
_PDF_CONTENT = r"(?:\\x5C\(|\\x5C\)|\\x5C\\x5C|[^()])*"
_PDF_SHOW_RE = r"\((" + _PDF_CONTENT + r")\) Tj"


def _pdf_oracle(path: str) -> str:
    unesc = "array_to_string(regexp_extract_all(s, '{re}', 1), ' ')".format(re=_PDF_SHOW_RE)
    unesc = f"REPLACE({unesc}, '\\x5C(', '(')"
    unesc = f"REPLACE({unesc}, '\\x5C)', ')')"
    unesc = f"REPLACE({unesc}, '\\x5C\\x5C', '\\')"
    return f"""
    WITH p AS (
      SELECT doc_id, CAST(pdf_bytes AS VARCHAR) AS s
      FROM read_parquet('{path}')
    )
    SELECT doc_id, {unesc} AS text,
           CAST(regexp_extract(s, '/Count ([0-9]+)', 1) AS INTEGER) AS n_pages
    FROM p ORDER BY doc_id
    """


from ..fixtures.shared import pdf_fixture_path  # noqa: E402

_PDF_PARQUET = pdf_fixture_path()


@register(
    "pdf_extract_text",
    _pdf_oracle(_PDF_PARQUET),
    doc="PDF text extraction over minimal uncompressed PDFs (fixture-"
    "generated, shared parquet): the Spark side walks content streams "
    "and show operators with real escape handling in one mapInPandas "
    "scan (fixtures/pdf.py:extract_pdf_text; FlateDecode explicitly "
    "gated); the oracle recovers the same '(...) Tj' strings by regexp "
    "over the byte stream, handling DuckDB's \\x5C rendering of the "
    "escape character. Page count from the /Count entry on both sides.",
    tags=("extract", "multimodal"),
)
def pdf_extract_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    def kern(batches):
        from ..fixtures.pdf import extract_pdf_text, pdf_page_count

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "text": [extract_pdf_text(bytes(b)) for b in pdf["pdf_bytes"]],
                    "n_pages": [pdf_page_count(bytes(b)) for b in pdf["pdf_bytes"]],
                }
            )

    return (
        spark.read.parquet(_PDF_PARQUET)
        .mapInPandas(kern, "doc_id string, text string, n_pages int")
    )


# --- density-based DOM heuristics (north_rule: 'DOM heuristics') ----------

from ..functions.html import (  # noqa: E402
    DENSITY_MIN_CHARS,
    dom_dense_blocks,
    dom_density_main_sql,
    dom_blocks_sql,
    escape_sql,
    escape_text,
)

_DENS_ESC_SQL_1 = escape_sql("substring(text, 1, 100)")
_DENS_ESC_SQL_2 = escape_sql("substring(text, 101, 80)")

_DENS_HTML_SQL = (
    "'<html><body>"
    '<p class="nav"><a href="#">Home</a> | <a href="#">About</a> | <a href="#">Contact</a></p>'
    "<p>' || " + _DENS_ESC_SQL_1 + " || '</p>"
    "<p>ok</p>"
    "<p>' || " + _DENS_ESC_SQL_2 + " || ' see <a href=\"#\">this link</a> for details</p>"
    "</body></html>'"
)


def _density_html_col() -> F.Column:
    return F.concat(
        F.lit(
            '<html><body><p class="nav"><a href="#">Home</a> | '
            '<a href="#">About</a> | <a href="#">Contact</a></p><p>'
        ),
        escape_text(F.substring("text", 1, 100)),
        F.lit("</p><p>ok</p><p>"),
        escape_text(F.substring("text", 101, 80)),
        F.lit(' see <a href="#">this link</a> for details</p></body></html>'),
    )


@register(
    "dom_density_content",
    f"""
    WITH pages AS (SELECT doc_id, {_DENS_HTML_SQL} AS html FROM documents),
    feat AS (
      SELECT doc_id,
             {dom_blocks_sql("html")} AS blocks
      FROM pages
    )
    SELECT doc_id,
           CAST(len(blocks) AS INTEGER) AS n_blocks,
           CAST(len(list_filter(blocks, s ->
             s.text_len >= {DENSITY_MIN_CHARS} AND s.link_len * 2 <= s.text_len))
             AS INTEGER) AS n_kept,
           COALESCE(array_to_string(list_transform(list_filter(blocks, s ->
             s.text_len >= {DENSITY_MIN_CHARS} AND s.link_len * 2 <= s.text_len),
             s -> s.text), ' '), '') AS main_text
    FROM feat ORDER BY doc_id
    """,
    doc="Density-based DOM heuristic (the jusText/Boilerpipe-family "
    "signal, public algorithms): per <p> block, cleaned text length vs "
    "cleaned link-text length; keep long, link-sparse blocks. The keep "
    "rule is the INTEGER comparison 2*link_len <= text_len — exact on "
    "both engines, no float ratio. Synthetic pages plant a link-dense "
    "nav block (dropped), a too-short block (dropped), a clean content "
    "block and a content block with an inline link (both kept). All "
    "array higher-order functions over one scan — zero shuffles.",
    tags=("text", "extract"),
)
def dom_density_content(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    pages = d.select("doc_id", _density_html_col().alias("html"))
    feat = pages.select("doc_id", dom_dense_blocks(F.col("html")).alias("blocks"))
    kept = F.filter(
        F.col("blocks"),
        lambda s: (s["text_len"] >= DENSITY_MIN_CHARS)
        & (s["link_len"] * 2 <= s["text_len"]),
    )
    return feat.select(
        "doc_id",
        F.size("blocks").alias("n_blocks"),
        F.size(kept).alias("n_kept"),
        F.array_join(F.transform(kept, lambda s: s["text"]), " ").alias("main_text"),
    ).orderBy("doc_id")
