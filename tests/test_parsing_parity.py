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
