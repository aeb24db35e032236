"""Metadata-parsing queries (reference P1-P3, P4, P5).

Synthetic folder/file names are built deterministically from the
`part` table in BOTH engines, then parsed back — exercising the same
regex cascade the reference applies to manga directory names
(reference core/processor.py:19-94 and :114-151).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import parsing as P
from ..session import load_table
from . import register

# path: "[Scan-BRAND] <name> - Volume <v> Capitulo <c>" or, every 7th
# part, the extra-chapter form "... - Volume <v> Extra <c>" (exercises
# the reference's extra branch, processor.py:73-80).
_PATH_SQL = (
    "'[Scan-' || p_brand || '] ' || p_name || ' - Volume ' || CAST(p_size AS VARCHAR)"
    " || CASE WHEN p_partkey % 7 = 0 THEN ' Extra ' ELSE ' Capitulo ' END"
    " || CAST(p_partkey % 50 AS VARCHAR)"
)
# filename: "<brand>_v<size>_c<partkey%50>_page.png" — the trailing
# segment matters: the reference's slicing needs a closing '_' after the
# chapter token or the whole file fails to parse (processor.py:134-136).
_FILE_SQL = (
    "p_brand || '_v' || CAST(p_size AS VARCHAR) || '_c' || CAST(p_partkey % 50 AS VARCHAR)"
    " || '_page.png'"
)


def _path_col() -> F.Column:
    return F.concat(
        F.lit("[Scan-"),
        F.col("p_brand"),
        F.lit("] "),
        F.col("p_name"),
        F.lit(" - Volume "),
        F.col("p_size").cast("string"),
        F.when(F.col("p_partkey") % 7 == 0, F.lit(" Extra ")).otherwise(F.lit(" Capitulo ")),
        (F.col("p_partkey") % 50).cast("string"),
    )


@register(
    "parse_directory_name",
    f"""
    WITH t AS (SELECT p_partkey, {_PATH_SQL} AS path FROM part),
    d AS (
      SELECT p_partkey, path,
             REPLACE(REGEXP_REPLACE(path, '^\\[[^\\]]*\\]', ''), ' - ', ' ') AS f
      FROM t
    ),
    pos AS (
      SELECT p_partkey, path, f,
             CASE WHEN STRPOS(LOWER(f), 'volume') > 0
                  THEN LENGTH(REGEXP_REPLACE(LOWER(f), '(?s)^(.*)volume.*$', '\\1'))
                  ELSE LENGTH(f) END AS cut
      FROM d
    )
    SELECT p_partkey, path,
           TRIM(REPLACE(SUBSTR(f, 1, cut), '  ', ' ')) AS manga_name
    FROM pos ORDER BY p_partkey
    """,
    doc="P1 getDirectoryName, faithful (reference core/processor.py:19-40): "
    "strip the first [scan] group, replace ' - ' with ' ', truncate at the "
    "LAST case-insensitive 'volume' substring (greedy-prefix regex = "
    "rindex), collapse double spaces, trim. Pure codegen'd projection — "
    "no shuffle.",
    tags=("parse",),
)
def parse_directory_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").withColumn("path", _path_col())
    return (
        p.select("p_partkey", "path", P.manga_name(F.col("path")).alias("manga_name"))
        .orderBy("p_partkey")
    )


@register(
    "parse_volume_chapter",
    # NOTE covered-shape restriction: this oracle (and parse_directory_
    # name's) implements the reference cascade only for the shapes the
    # synthetic part-derived paths produce — 'Volume N Capitulo/Extra N'
    # with one leading [scan] group and no JPN/JAP/JNP language tag. The
    # Spark expressions implement the FULL semantics (tag exclusion,
    # capítulo/capitulo fallbacks, last-bracket-anywhere); those branches
    # are covered by tests/test_parsing_parity.py golden cases instead.
    # If the synthetic path template ever changes, extend this SQL too.
    f"""
    WITH t AS (SELECT p_partkey, {_PATH_SQL} AS path FROM part),
    pos AS (
      SELECT p_partkey, path, LOWER(path) AS s,
             LENGTH(REGEXP_REPLACE(LOWER(path), '(?s)^(.*)volume.*$', '\\1')) AS pv,
             CASE WHEN STRPOS(LOWER(path), 'capitulo') > 0
                  THEN LENGTH(REGEXP_REPLACE(LOWER(path), '(?s)^(.*)capitulo.*$', '\\1'))
                  ELSE LENGTH(REGEXP_REPLACE(LOWER(path), '(?s)^(.*)extra.*$', '\\1')) END AS pk,
             STRPOS(LOWER(path), 'capitulo') > 0 AS has_cap
      FROM t
    )
    SELECT p_partkey,
           COALESCE(NULLIF(REGEXP_REPLACE(SUBSTR(s, pv + 1, GREATEST(pk - pv, 0)),
                                          '[^0-9.]', '', 'g'), ''), '0') AS volume,
           COALESCE(NULLIF(REGEXP_REPLACE(SUBSTR(s, pk + 1), '[^0-9.]', '', 'g'), ''), '0')
             AS chapter,
           NOT has_cap AS is_extra,
           NULLIF(TRIM(REGEXP_EXTRACT(path, '\\[([^\\]]*)\\]', 1)), '') AS scan
    FROM pos ORDER BY p_partkey
    """,
    doc="P2 getDirectoryInformation, faithful (reference "
    "core/processor.py:43-94): volume = digits of the lowercased name "
    "between the LAST 'volume' and the LAST 'capitulo' (or 'extra' in the "
    "extra-chapter branch, where is_extra=true); chapter = digits after "
    "that keyword; '0' defaults; scan = first [group], trimmed, minus "
    "language tags.",
    tags=("parse",),
)
def parse_volume_chapter(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").withColumn("path", _path_col())
    return (
        p.select(
            "p_partkey",
            P.volume_number(F.col("path")).alias("volume"),
            P.chapter_number(F.col("path")).alias("chapter"),
            P.is_extra(F.col("path")).alias("is_extra"),
            P.scan_tag(F.col("path")).alias("scan"),
        )
        .orderBy("p_partkey")
    )


@register(
    "parse_filename",
    f"""
    WITH t AS (SELECT p_partkey, {_FILE_SQL} AS fname FROM part),
    l AS (SELECT p_partkey, fname, LOWER(fname) AS nm FROM t)
    SELECT p_partkey, fname,
           NULLIF(REGEXP_REPLACE(REGEXP_EXTRACT(nm, '_(v[^_]*)_', 1), '[^0-9]', '', 'g'), '')
             AS file_volume,
           NULLIF(REGEXP_REPLACE(REGEXP_EXTRACT(nm, '_(c[^_]*)_', 1), '[^0-9]', '', 'g'), '')
             AS file_chapter
    FROM l ORDER BY p_partkey
    """,
    doc="P3 filename volume/chapter parse, faithful: the '_v'/'_c' "
    "segment up to the NEXT '_' then digits-only (reference "
    "core/processor.py:115-151; the synthetic names all take the "
    "underscore branch — the other delimiters are covered by the "
    "parity unit tests).",
    tags=("parse",),
)
def parse_filename(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").withColumn(
        "fname",
        F.concat(
            F.col("p_brand"),
            F.lit("_v"),
            F.col("p_size").cast("string"),
            F.lit("_c"),
            (F.col("p_partkey") % 50).cast("string"),
            F.lit("_page.png"),
        ),
    )
    return (
        p.select(
            "p_partkey",
            "fname",
            P.file_volume(F.col("fname")).alias("file_volume"),
            P.file_chapter(F.col("fname")).alias("file_chapter"),
        )
        .orderBy("p_partkey")
    )


@register(
    "restructure_plan",
    f"""
    WITH t AS (SELECT p_partkey, p_brand, {_FILE_SQL} AS fname FROM part),
    l AS (SELECT p_partkey, p_brand, fname, LOWER(fname) AS nm FROM t),
    parsed AS (
      SELECT p_partkey, p_brand, fname,
        NULLIF(REGEXP_REPLACE(REGEXP_EXTRACT(nm, '_(v[^_]*)_', 1), '[^0-9]', '', 'g'), '')
          AS v,
        NULLIF(REGEXP_REPLACE(REGEXP_EXTRACT(nm, '_(c[^_]*)_', 1), '[^0-9]', '', 'g'), '')
          AS c
      FROM l
    )
    SELECT p_partkey, fname,
           CASE WHEN v IS NOT NULL AND c IS NOT NULL
                THEN p_brand || ' - Volume ' || v || ' Capitulo ' || c
                ELSE 'naoreconhecidos' END AS target_dir
    FROM parsed ORDER BY p_partkey
    """,
    doc="S10 restructure tool, write side (reference core/processor.py:"
    "100-165): each file's target folder is '{name} - Volume {v} "
    "Capitulo {c}' from the P3 filename parse, with unparseable files "
    "routed to 'naoreconhecidos' — as a declarative old-path -> "
    "new-path PLAN. Executing it is a partitioned write by target_dir "
    "(no driver-side file loop); pure codegen'd projection, no shuffle.",
    tags=("parse", "tool"),
)
def restructure_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").withColumn(
        "fname",
        F.concat(
            F.col("p_brand"),
            F.lit("_v"),
            F.col("p_size").cast("string"),
            F.lit("_c"),
            (F.col("p_partkey") % 50).cast("string"),
            F.lit("_page.png"),
        ),
    )
    v = P.file_volume(F.col("fname"))
    c = P.file_chapter(F.col("fname"))
    target = F.when(
        v.isNotNull() & c.isNotNull(),
        F.concat(F.col("p_brand"), F.lit(" - Volume "), v, F.lit(" Capitulo "), c),
    ).otherwise(F.lit("naoreconhecidos"))
    return (
        p.select("p_partkey", "fname", target.alias("target_dir"))
        .orderBy("p_partkey")
    )


@register(
    "page_md5",
    """
    SELECT doc_id, md5(text) AS page_hash, n_chars
    FROM documents
    ORDER BY doc_id
    """,
    doc="P4 page identity hash — md5 of content bytes "
    "(reference core/processor.py:198-206); in the extraction pipeline this "
    "runs as F.md5 over the binary image column.",
    tags=("parse", "hash"),
)
def page_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", F.md5(F.col("text").cast("binary")).alias("page_hash"), "n_chars").orderBy(
        "doc_id"
    )


@register(
    "normalize_ocr_text",
    r"""
    SELECT doc_id,
           UPPER(SUBSTR(norm, 1, 1)) || LOWER(SUBSTR(norm, 2)) AS norm_text
    FROM (
      SELECT doc_id,
             TRIM(REGEXP_REPLACE(
               REGEXP_REPLACE(SUBSTR(text, 1, 80),
                 '[\\+/§◎*)@<>#%(&=$_\-^«¢~「」〃ゝゞヽヾ一●▲・ヽ÷①↓®▽■◆『£〆∴∞▼™↑←]',
                 '', 'g'),
               '\s+', ' ', 'g')) AS norm
      FROM documents
    )
    ORDER BY doc_id
    """,
    doc="P5 filterText, faithful: remove the reference's exact special-"
    "character list (punctuation like .,!? SURVIVES), collapse "
    "whitespace, Python-style capitalize (modules/ocr.py:33-48).",
    tags=("parse", "text"),
)
def normalize_ocr_text_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            P.normalize_ocr_text(F.substring(F.col("text"), 1, 80)).alias("norm_text"),
        )
        .orderBy("doc_id")
    )
