"""Metadata-parsing scalar operators, re-expressed as Catalyst Column
expressions (JVM-side, codegen'd — no Python in the hot path).

Behavior parity targets in the reference (cited, not copied):
- P1 directory -> manga name: strip ``[tag]`` brackets, keep the part
  before `` - ``, drop trailing volume/chapter words
  (reference src/manga_extractor/core/processor.py:19-40).
- P2 directory -> (volume, chapter, scan, is_extra) keyword parsing
  with digits-only extraction ``[^0-9.]`` kept as STRING
  (reference core/processor.py:43-94 — volume/chapter stay strings).
- P3 filename ``_v01_c03`` style volume/chapter extraction
  (reference core/processor.py:114-151).
- P5 OCR text normalization: strip special chars, collapse whitespace,
  ``str.capitalize()`` (reference modules/ocr.py:33-48).

Every expression here has an ANSI-SQL twin in
``mangaextractor_spark/queries/`` so the DuckDB oracle can verify it;
regexes are restricted to the Java-regex ∩ RE2 common subset
(``(?i)``, ``\\b``, character classes — no backrefs, no lookaround).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Regexes shared verbatim between Spark (Java regex) and DuckDB (RE2).
BRACKET_TAG_RE = r"\[[^\]]*\]"
TRAILING_META_RE = r"(?i)\s*(volume|capitulo|capítulo|extra)\b.*$"
VOLUME_NUM_RE = r"(?i)volume\s*([0-9.]+)"
CHAPTER_NUM_RE = r"(?i)cap[ií]tulo\s*([0-9.]+)"
EXTRA_RE = r"(?i)\bextra\b"
FIRST_BRACKET_RE = r"\[([^\]]*)\]"
FILE_VOL_RE = r"(?i)[_\-(] ?v([0-9]+)"
FILE_CHAP_RE = r"(?i)[_\-] ?c([0-9]+)"
SPECIAL_CHARS_RE = r"[^0-9A-Za-zÀ-ɏ　-ヿ一-鿿 ]"


def manga_name(path: Column) -> Column:
    """P1: folder name -> manga title (processor.py:19-40 semantics)."""
    no_tags = F.regexp_replace(path, BRACKET_TAG_RE, "")
    before_dash = F.split(no_tags, " - ").getItem(0)
    stripped = F.regexp_replace(before_dash, TRAILING_META_RE, "")
    return F.trim(stripped)


def volume_number(path: Column) -> Column:
    """P2: 'Volume 03.5' -> '03.5' (kept as string, processor.py:80-87)."""
    return F.nullif(F.regexp_extract(path, VOLUME_NUM_RE, 1), F.lit(""))


def chapter_number(path: Column) -> Column:
    return F.nullif(F.regexp_extract(path, CHAPTER_NUM_RE, 1), F.lit(""))


def is_extra(path: Column) -> Column:
    return F.regexp_like(path, F.lit(EXTRA_RE))


def scan_tag(path: Column) -> Column:
    """P2: first ``[...]`` bracket group = scan group name."""
    return F.nullif(F.regexp_extract(path, FIRST_BRACKET_RE, 1), F.lit(""))


def file_volume(fname: Column) -> Column:
    """P3: '_v01'/'-v01'/'(v01' style volume in a filename."""
    return F.nullif(F.regexp_extract(fname, FILE_VOL_RE, 1), F.lit(""))


def file_chapter(fname: Column) -> Column:
    return F.nullif(F.regexp_extract(fname, FILE_CHAP_RE, 1), F.lit(""))


def normalize_ocr_text(text: Column, lang: Column | None = None) -> Column:
    """P5: strip special characters, collapse whitespace, capitalize
    (``str.capitalize()`` = first char upper, rest lower — NOT initcap;
    reference modules/ocr.py:41-48). Japanese additionally removes all
    whitespace (ocr.py:37-40); the lang branch mirrors that."""
    cleaned = F.regexp_replace(text, SPECIAL_CHARS_RE, "")
    collapsed = F.trim(F.regexp_replace(cleaned, r"\s+", " "))
    capitalized = F.concat(
        F.upper(F.substring(collapsed, 1, 1)),
        F.lower(F.substring(collapsed, 2, 1 << 30)),
    )
    if lang is None:
        return capitalized
    ja = F.regexp_replace(cleaned, r"\s+", "")
    return F.when(lang == "ja", ja).otherwise(capitalized)
