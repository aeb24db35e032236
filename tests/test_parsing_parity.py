"""Behavior-parity tests for P1/P2 directory parsing against the
reference's own golden cases (reference tests/manga_extractor/core/
test_processor.py:7-41) plus quirk cases derived from the reference
algorithm (core/processor.py:19-94). The expectations below are the
spec; the Column implementation must reproduce them bit-for-bit.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mangaextractor_spark.functions import parsing as P

# (path, manga_name) — first four are the reference's own test cases.
NAME_CASES = [
    ("C:/Manga [JPN] - Volume 01", "Manga"),
    ("E:/Manga [ScanName] Volume 05", "Manga"),
    ("$Recycle.Bin", ""),
    ("C:/Users/Scan/Manga_Name_Extra", "Manga_Name_Extra"),
    # quirks faithful to processor.py:19-40
    ("Foo - Bar", "Foo Bar"),  # ' - ' replaced, not split
    ("Volume Manga Volume 2", "Volume Manga"),  # truncate at LAST 'volume'
    ("Manga Extra 3", "Manga Extra 3"),  # 'extra' never truncates the name
    ("Minha Manga Capitulo 7", "Minha Manga"),
    ("[jpn] Manga Volume 2", "[jpn] Manga"),  # lowercase tag survives (uppercase-only replace)
    ("Plain Name", "Plain Name"),
]

# (path, volume, chapter, is_extra, scan)
INFO_CASES = [
    ("Manga [Scan] Volume 1 Capítulo 10", "1", "10", False, "Scan"),
    ("Manga Volume 1 Extra 1", "1", "1", True, None),
    ("Manga Volume 05 Capitulo 12", "05", "12", False, None),
    ("Manga Volume 03 Extra 04", "03", "04", True, None),
    ("C:/Manga/[Scan_Name]", "0", "0", False, "Scan_Name"),
    # extra BEFORE volume -> the extra condition (rindex(volume) <
    # rindex(extra)) fails -> nothing parsed
    ("Manga Extra 2 Volume 1", "0", "0", False, None),
    # volume alone parses nothing (needs capitulo or a trailing extra)
    ("Manga Volume 9", "0", "0", False, None),
    ("Manga [JPN] Volume 2 Capitulo 3", "2", "3", False, None),  # language tag is not a scan
    ("Manga Volume 1.5 Capitulo 2.5", "1.5", "2.5", False, None),
    # ']' with no '[' at all: the reference indexes '[' first and fails
    # (processor.py:48) — must NOT emit the text before ']' as a group
    ("Weird] Name Volume 1 Capitulo 2", "1", "2", False, None),
]


@pytest.fixture(scope="module")
def name_results(spark):
    df = spark.createDataFrame([(p,) for p, _ in NAME_CASES], "path string")
    rows = df.select("path", P.manga_name(F.col("path")).alias("name")).collect()
    return {r.path: r.name for r in rows}


def test_directory_name_parity(name_results):
    for path, expected in NAME_CASES:
        assert name_results[path] == expected, path


@pytest.fixture(scope="module")
def info_results(spark):
    df = spark.createDataFrame([(p,) for p, *_ in INFO_CASES], "path string")
    rows = df.select(
        "path",
        P.volume_number(F.col("path")).alias("volume"),
        P.chapter_number(F.col("path")).alias("chapter"),
        P.is_extra(F.col("path")).alias("is_extra"),
        P.scan_tag(F.col("path")).alias("scan"),
    ).collect()
    return {r.path: (r.volume, r.chapter, r.is_extra, r.scan) for r in rows}


def test_directory_information_parity(info_results):
    for path, vol, chap, extra, scan in INFO_CASES:
        assert info_results[path] == (vol, chap, extra, scan), path


# (fname, volume, chapter) — reference core/processor.py:115-151 semantics
FILE_CASES = [
    ("Manga_v01_c03_x.png", "01", "03"),
    ("Manga_vol2_c7_p.jpg", "2", "7"),  # segment-to-next-'_' keeps 'vol2' -> digits '2'
    ("Manga-v04-c05-x.png", "04", "05"),
    # '(v' branch; the ' c' fallback FAILS here because findall('c\\w+')
    # first hits the 'c' inside 'Scan' -> 'an' -> non-numeric (a real
    # reference quirk, processor.py:146-148)
    ("Scan(v9)page c12.png", "9", None),
    ("Manga v12 c34.png", "12", "34"),  # both fallbacks (numeric only)
    ("Manga v1x c3y.png", None, None),  # fallback rejects non-numeric
    ("Manga_v01_c03.png", "01", None),  # no closing '_' after chapter -> failure
    ("plain.png", None, None),
]


def test_filename_parse_parity(spark):
    df = spark.createDataFrame([(f,) for f, *_ in FILE_CASES], "fname string")
    rows = df.select(
        "fname",
        P.file_volume(F.col("fname")).alias("v"),
        P.file_chapter(F.col("fname")).alias("c"),
    ).collect()
    got = {r.fname: (r.v, r.c) for r in rows}
    for fname, v, c in FILE_CASES:
        assert got[fname] == (v, c), fname


# (text, lang, expected) — reference modules/ocr.py:33-48: only the fixed
# symbol list is removed (punctuation survives); ja also strips ASCII
# alnum and all whitespace; others collapse whitespace + capitalize()
TEXT_CASES = [
    ("Hello,  WORLD! one", None, "Hello, world! one"),
    ("a+b=c (x) 100%", None, "Abc x 100"),
    ("keep.periods, and?!", None, "Keep.periods, and?!"),
    ("ル ビ ABC 123 ・ テスト", "ja", "ルビテスト"),
    ("Mixed Case Text", "en", "Mixed case text"),
]


def test_normalize_ocr_text_parity(spark):
    df = spark.createDataFrame(TEXT_CASES, "text string, lang string, expected string")
    rows = df.select(
        "text",
        "expected",
        P.normalize_ocr_text(F.col("text"), F.col("lang")).alias("got"),
    ).collect()
    for r in rows:
        assert r.got == r.expected, r.text
