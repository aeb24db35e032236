"""Cross-engine (Spark <-> DuckDB) deterministic building blocks.

- ``phash60``: a 60-bit hash both engines compute identically:
  the first 15 hex chars of md5, parsed as an integer. Used by
  minhash / simhash / fingerprint oracles so the DuckDB check is
  bit-exact. (At production scale the same signatures are computed in
  one Arrow pass — see functions/dedup kernels — but the SQL form is
  what the oracle verifies.)
- ``words_col`` / ``WORDS_SQL``: identical tokenization
  (lowercase, strip non-alnum, split, drop empties) on both sides.
- ``shingles3`` / shingle SQL: word 3-gram shingles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def phash60(col: Column) -> Column:
    """60-bit portable hash (Spark side)."""
    return F.conv(F.substring(F.md5(col.cast("binary")), 1, 15), 16, 10).cast("long")


def phash60_sql(expr: str) -> str:
    """60-bit portable hash (DuckDB side)."""
    return f"TRY_CAST('0x' || SUBSTR(md5({expr}), 1, 15) AS BIGINT)"


def words_col(text: Column) -> Column:
    """Lowercased alnum word tokens, no empties."""
    split = F.split(F.trim(F.regexp_replace(F.lower(text), "[^a-z0-9]+", " ")), " ")
    return F.filter(split, lambda w: w != "")


WORDS_SQL = (
    "list_filter(string_split(TRIM(REGEXP_REPLACE(LOWER({t}), '[^a-z0-9]+', ' ', 'g')), ' '),"
    " w -> w <> '')"
)


def shingles3(words: Column) -> Column:
    """Word 3-gram shingles joined by single spaces (empty array if <3 words)."""
    make = F.transform(
        F.sequence(F.lit(0), F.size(words) - 3),
        lambda i: F.concat_ws(" ", F.slice(words, i + 1, 3)),
    )
    return F.when(F.size(words) >= 3, make).otherwise(F.array().cast("array<string>"))


def shingles_sql(table: str = "documents", text: str = "text", id_col: str = "doc_id") -> str:
    """DuckDB CTE body producing DISTINCT (doc_id, s) shingle rows."""
    ws = WORDS_SQL.format(t=text)
    return f"""
    WITH w AS (SELECT {id_col} AS doc_id, {ws} AS ws FROM {table}),
    sh AS (
      SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
      FROM w, UNNEST(generate_series(1, len(ws) - 2)) AS t(i)
      WHERE len(ws) >= 3
    )
    """
