"""Metadata-parsing scalar operators, re-expressed as Catalyst Column
expressions (JVM-side, codegen'd — no Python in the hot path).

Faithful re-expressions of the reference algorithms (cited, not
copied; each quirk is deliberate and covered by
tests/test_parsing_parity.py, which ports the reference's own golden
cases):
- P1 directory -> manga name (reference core/processor.py:19-40):
  basename, recycle-bin guard, uppercase-only language-tag stripping,
  first-scan-group removal, ``' - '`` replaced (not split), truncation
  at the LAST ``volume``/``capítulo``/``capitulo`` substring (no word
  boundary; ``extra`` never truncates), double-space collapse, strip.
- P2 directory -> (volume, chapter, scan, is_extra)
  (core/processor.py:43-94): parsed only when ``volume`` co-occurs
  with a chapter keyword (or a trailing ``extra``); slices between
  LAST-occurrence keyword positions; digits-only ``[^0-9.]``; STRING
  values with '0' defaults.
- P3 filename ``_v01_c03`` extraction (core/processor.py:114-151):
  segment-to-next-delimiter slicing per branch, numeric-only fallback.
- P5 OCR text filter (modules/ocr.py:33-48): the exact special-char
  lists (punctuation survives), whitespace handling and
  ``str.capitalize()`` per language.

Every expression here has an ANSI-SQL twin in
``mangaextractor_spark/queries/`` so the DuckDB oracle can verify it;
regexes are restricted to the Java-regex ∩ RE2 common subset
(``(?i)``/``(?s)``, character classes — no backrefs, no lookaround).
The rindex trick used throughout: the length of ``^(.*)kw.*$``'s
greedy first group equals the last-occurrence index of ``kw``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# P5 OCR filter character classes, verbatim from the reference
# (modules/ocr.py:35-37): a fixed list of symbols; the ja variant ALSO
# strips ASCII digits/letters. Everything else (punctuation like .,!?)
# survives — the filter is an allowlist complement, not "non-word".
SPECIAL_CHARS_RE = (
    r"[\\+/§◎*)@<>#%(&=$_\-^«¢~「」〃ゝゞヽヾ一●▲・ヽ÷①↓®▽■◆『£〆∴∞▼™↑←]"
)
SPECIAL_CHARS_JA_RE = (
    r"[\\+/§◎*)@<>#%(&=$_\-^0-9A-Za-z:;«¢~「」〃ゝゞヽヾ一●▲・ヽ÷①↓®▽■◆『£〆∴∞▼™↑←]"
)

_JPN_TAGS = ("[JPN]", "[JAP]", "[JNP]")


def _basename(path: Column) -> Column:
    return F.element_at(F.split(path, r"[/\\]"), -1)


def _rpos0(s: Column, kw: str) -> Column:
    """0-based index of the LAST occurrence of literal ``kw`` in ``s``
    (callers lowercase both), or -1. Greedy-prefix trick: the length of
    `^(.*)kw.*$`'s first group is exactly rindex(kw)."""
    return F.when(
        s.contains(kw),
        F.length(F.regexp_replace(s, r"(?s)^(.*)" + kw + r".*$", "$1")),
    ).otherwise(F.lit(-1))


def _strip_brackets(base: Column) -> Column:
    """Reference bracket handling (processor.py:25-30): the [JPN]/[JAP]/
    [JNP] tags are removed by EXACT UPPERCASE match when the uppercased
    name contains one (a real quirk: '[jpn]' survives); otherwise the
    first [scan group (text from '[' up to before ']') is removed, then
    every stray '[' and ']'."""
    upper_has_tag = None
    for t in _JPN_TAGS:
        c = F.upper(base).contains(t)
        upper_has_tag = c if upper_has_tag is None else (upper_has_tag | c)
    detagged = base
    for t in _JPN_TAGS:
        detagged = F.replace(detagged, F.lit(t), F.lit(""))
    i1 = F.instr(base, "[")
    i2 = F.instr(base, "]")
    scan_text = F.when(i2 > i1, F.substring(base, i1, i2 - i1)).otherwise(F.lit(""))
    unscanned = F.when(scan_text != "", F.replace(base, scan_text, F.lit(""))).otherwise(base)
    unscanned = F.replace(F.replace(unscanned, F.lit("["), F.lit("")), F.lit("]"), F.lit(""))
    return (
        F.when(upper_has_tag, detagged)
        .when(i1 > 0, unscanned)
        .otherwise(base)
    )


def manga_name(path: Column) -> Column:
    """P1 getDirectoryName, faithful to processor.py:19-40: basename;
    '' for recycle-bin paths; bracket stripping (see _strip_brackets);
    ' - ' -> ' '; truncate at the LAST 'volume' (elif 'capítulo', elif
    'capitulo') — substring match, case-insensitive via lowercase
    positions, NO word boundary, and 'extra' does NOT truncate; then
    one '  '->' ' pass and strip."""
    base = _basename(path)
    folder = _strip_brackets(base)
    folder = F.replace(folder, F.lit(" - "), F.lit(" "))
    low = F.lower(folder)
    truncated = (
        F.when(low.contains("volume"), F.substring(folder, 1, _rpos0(low, "volume")))
        .when(low.contains("capítulo"), F.substring(folder, 1, _rpos0(low, "capítulo")))
        .when(low.contains("capitulo"), F.substring(folder, 1, _rpos0(low, "capitulo")))
        .otherwise(folder)
    )
    cleaned = F.trim(F.replace(truncated, F.lit("  "), F.lit(" ")))
    return F.when(F.lower(base).contains("$recycle.bin"), F.lit("")).otherwise(cleaned)


def _digits(seg: Column) -> Column:
    """Reference's `re.sub(r'[^0-9.]', '', seg)` with the '0' default
    (processor.py:80-90)."""
    return F.coalesce(F.nullif(F.regexp_replace(seg, r"[^0-9.]", ""), F.lit("")), F.lit("0"))


def _info_parts(path: Column) -> tuple[Column, Column, Column]:
    """(volume, chapter, is_extra) per getDirectoryInformation
    (processor.py:43-94): parse ONLY when 'volume' co-occurs with
    'capítulo'/'capitulo', or with 'extra' after the last 'volume';
    slices are taken between LAST-occurrence keyword positions of the
    lowercased name, digits-only, default '0'."""
    s = F.lower(_basename(path))
    pv = _rpos0(s, "volume")
    pca = _rpos0(s, "capítulo")
    pcb = _rpos0(s, "capitulo")
    pe = _rpos0(s, "extra")
    cond = s.contains("volume") & (
        s.contains("capítulo") | s.contains("capitulo") | (s.contains("extra") & (pv < pe))
    )

    def seg(a: Column, b: Column) -> Column:
        # python s[a:b] (0-based, may be empty when b<=a)
        return F.substring(s, a + 1, F.greatest(b - a, F.lit(0)))

    tail = lambda a: F.substring(s, a + 1, F.lit(1 << 30))  # noqa: E731
    vol = (
        F.when(s.contains("capítulo"), _digits(seg(pv, pca)))
        .when(s.contains("capitulo"), _digits(seg(pv, pcb)))
        .otherwise(_digits(seg(pv, pe)))
    )
    chap = (
        F.when(s.contains("capítulo"), _digits(tail(pca)))
        .when(s.contains("capitulo"), _digits(tail(pcb)))
        .otherwise(_digits(tail(pe)))
    )
    extra = ~s.contains("capítulo") & ~s.contains("capitulo")
    volume = F.when(cond, vol).otherwise(F.lit("0"))
    chapter = F.when(cond, chap).otherwise(F.lit("0"))
    is_ex = F.when(cond, extra).otherwise(F.lit(False))
    return volume, chapter, is_ex


def volume_number(path: Column) -> Column:
    """P2: volume as STRING with '0' default (processor.py:58-87)."""
    return _info_parts(path)[0]


def chapter_number(path: Column) -> Column:
    return _info_parts(path)[1]


def is_extra(path: Column) -> Column:
    return _info_parts(path)[2]


def scan_tag(path: Column) -> Column:
    """P2 scan group: first ``[...]`` content, trimmed — but NOT when
    the name carries a [JPN]/[JAP]/[JNP] language tag
    (processor.py:46-51). NULL when absent/empty (the reference keeps
    '' + isScan=False; NULL is this engine's empty)."""
    base = _basename(path)
    has_tag = None
    for t in _JPN_TAGS:
        c = F.upper(base).contains(t)
        has_tag = c if has_tag is None else (has_tag | c)
    i1 = F.instr(base, "[")
    i2 = F.instr(base, "]")
    # (i1 > 0): a ']' without any '[' is not a scan group — the reference
    # indexes '[' first and would raise (processor.py:48), so names like
    # "weird] name" must yield NULL, not the text before ']'.
    scan = F.when(
        (~has_tag) & (i1 > 0) & (i2 > i1 + 1),
        F.trim(F.substring(base, i1 + 1, i2 - i1 - 1)),
    )
    return F.nullif(scan, F.lit(""))


def _numeric_fallback(name: Column, letter: str) -> Column:
    """Reference fallback branch (processor.py:128-131, 146-148): when
    ``' v<word>'`` / ``' c<word>'`` appears, take the FIRST ``v\\w+``
    run, drop the letter, accept only if fully numeric."""
    cand = F.replace(
        F.regexp_extract(name, letter + r"(\w+)", 1), F.lit(letter), F.lit("")
    )
    return F.when(
        F.regexp_like(name, F.lit(" " + letter + r"\w+"))
        & F.regexp_like(cand, F.lit("^[0-9]+$")),
        cand,
    )


def file_volume(fname: Column) -> Column:
    """P3 filename volume, faithful (reference core/processor.py:115-131):
    the segment after the first '_v'/'-v'/'(v' up to the next '_'/'-'/')'
    (missing closing delimiter = parse failure -> NULL; the reference
    raises and routes the file to naoreconhecidos/ — per-field NULL is
    this engine's equivalent), else the ' v<digits>' fallback; digits
    only ([^0-9] stripped — volumes here are INTEGER strings)."""
    name = F.lower(_basename(fname))
    seg = (
        F.when(name.contains("_v"), F.nullif(F.regexp_extract(name, r"_(v[^_]*)_", 1), F.lit("")))
        .when(name.contains("-v"), F.nullif(F.regexp_extract(name, r"-(v[^-]*)-", 1), F.lit("")))
        .when(name.contains("(v"), F.nullif(F.regexp_extract(name, r"\((v[^)]*)\)", 1), F.lit("")))
        .otherwise(_numeric_fallback(name, "v"))
    )
    return F.nullif(F.regexp_replace(seg, r"[^0-9]", ""), F.lit(""))


def file_chapter(fname: Column) -> Column:
    """P3 filename chapter, faithful (reference core/processor.py:133-148):
    '_c'/'_ch' segment to the next '_', '-c'/'-ch' to the next '-',
    '- c' to the next '(', else the ' c<digits>' fallback."""
    name = F.lower(_basename(fname))
    seg = (
        F.when(
            name.contains("_ch") | name.contains("_c"),
            F.nullif(F.regexp_extract(name, r"_(c[^_]*)_", 1), F.lit("")),
        )
        .when(
            name.contains("-ch") | name.contains("-c"),
            F.nullif(F.regexp_extract(name, r"-(c[^-]*)-", 1), F.lit("")),
        )
        .when(
            name.contains("- c"),
            F.nullif(F.regexp_extract(name, r"-( c[^(]*)\(", 1), F.lit("")),
        )
        .otherwise(_numeric_fallback(name, "c"))
    )
    return F.nullif(F.regexp_replace(seg, r"[^0-9]", ""), F.lit(""))


def normalize_ocr_text(text: Column, lang: Column | None = None) -> Column:
    """P5 filterText, faithful (reference modules/ocr.py:33-48): remove
    the fixed special-character list (ja: also ASCII digits/letters and
    ':'/';'); then ja removes ALL whitespace, other languages collapse
    whitespace and ``str.capitalize()`` (first char upper, REST lower —
    NOT initcap). Punctuation like .,!? survives, as in the reference."""
    cleaned = F.regexp_replace(text, SPECIAL_CHARS_RE, "")
    collapsed = F.trim(F.regexp_replace(cleaned, r"\s+", " "))
    capitalized = F.concat(
        F.upper(F.substring(collapsed, 1, 1)),
        F.lower(F.substring(collapsed, 2, 1 << 30)),
    )
    if lang is None:
        return capitalized
    ja = F.regexp_replace(
        F.regexp_replace(text, SPECIAL_CHARS_JA_RE, ""), r"\s+", ""
    )
    return F.when(lang == "ja", ja).otherwise(capitalized)
