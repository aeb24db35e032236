"""Unicode NFC normalization — the first transform of every text
corpus pipeline, and an operator Spark's built-in function surface
lacks entirely (no NFC/NFD in pyspark.sql.functions).

A web crawl mixes precomposed ('café', U+00E9) and decomposed
('cafe' + U+0301) encodings of identical text; exact-dedup hashes,
shingles, and tokenizers all diverge on them unless normalization runs
first. The Spark side is an Arrow-batched pandas UDF over
``unicodedata.normalize('NFC', ...)`` — the documented acceptable
Python path (vectorized batches, map-side only, zero shuffle); the
DuckDB oracle uses its native ``nfc_normalize``, so parity
additionally cross-checks CPython's unicodedata against DuckDB's
utf8proc on the exercised code points.

Exercise discipline: the synthetic corpus is pure ASCII (NFC is the
identity on it — a vacuous test), so both engines apply the SAME
deterministic injection first: docs with doc_id % 3 == 0 get a
precomposed suffix, doc_id % 3 == 1 the canonically-equivalent
DECOMPOSED suffix (combining acute, U+0301). After NFC the two forms
are byte-identical, and only the decomposed class reports changed =
true — asserted in tests, visible in the rollup.

At 10^12 docs: one scan, the UDF is the only non-JVM stage and
carries ~len(text) bytes per row each way; the rollup is one
map-side-combined groupBy over (lang, changed).

Reference: none (capability beyond the reference). Public behavior:
Unicode Standard Annex #15 canonical composition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from ..session import load_table, spread
from . import register
from ._portable import phash60, phash60_sql

# Canonically-equivalent suffix pair: precomposed vs combining mark.
_PRE = " caf\u00e9"  # precomposed U+00E9
_DEC = " cafe\u0301"  # decomposed: e + combining acute U+0301


# DataType object, not a DDL string: the string form parses through the
# active session, which would make REGISTRY import require Spark (the
# driver imports the registry before creating one).
@pandas_udf(StringType())
def _nfc(s):
    import unicodedata

    return s.map(lambda x: unicodedata.normalize("NFC", x) if x is not None else None)


def _injected(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents")).select("doc_id", "lang", "text")
    raw = (
        F.when(F.col("doc_id") % 3 == 0, F.concat(F.col("text"), F.lit(_PRE)))
        .when(F.col("doc_id") % 3 == 1, F.concat(F.col("text"), F.lit(_DEC)))
        .otherwise(F.col("text"))
    )
    return d.select("doc_id", "lang", raw.alias("raw"))


# DuckDB-side injection twin (chr(233) = U+00E9, chr(769) = U+0301).
_INJ_SQL = """
SELECT doc_id, lang,
       CASE WHEN doc_id % 3 = 0 THEN text || ' caf' || chr(233)
            WHEN doc_id % 3 = 1 THEN text || ' cafe' || chr(769)
            ELSE text END AS raw
FROM documents
"""

_STATS_SQL = f"""
WITH d AS ({_INJ_SQL}),
n AS (SELECT doc_id, lang, raw, nfc_normalize(raw) AS norm FROM d)
SELECT doc_id,
       raw <> norm AS changed,
       CAST(length(raw) AS BIGINT) AS raw_chars,
       CAST(length(norm) AS BIGINT) AS norm_chars,
       {phash60_sql("raw")} AS raw_hash,
       {phash60_sql("norm")} AS norm_hash
FROM n ORDER BY doc_id
"""


@register(
    "unicode_normalization_stats",
    _STATS_SQL,
    doc="Per-doc NFC normalization audit: changed flag, char counts "
    "before/after, and portable 60-bit hashes of both forms (the "
    "norm_hash is what exact-dedup SHOULD key on — the raw_hash of a "
    "decomposed doc differs from its precomposed twin, the norm_hash "
    "does not). Spark runs Arrow-batched unicodedata NFC (no NFC "
    "exists in the built-in function surface); the oracle runs "
    "DuckDB's utf8proc nfc_normalize — parity cross-checks the two "
    "implementations on the injected composed/decomposed pair. "
    "Map-side only; zero shuffle.",
    tags=("textops", "normalize"),
)
def unicode_normalization_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _injected(spark, sf_dir).withColumn("norm", _nfc(F.col("raw")))
    return (
        n.select(
            "doc_id",
            (F.col("raw") != F.col("norm")).alias("changed"),
            F.length("raw").cast("long").alias("raw_chars"),
            F.length("norm").cast("long").alias("norm_chars"),
            phash60(F.col("raw")).alias("raw_hash"),
            phash60(F.col("norm")).alias("norm_hash"),
        )
        .orderBy("doc_id")
    )


_ROLLUP_SQL = f"""
WITH d AS ({_INJ_SQL}),
n AS (SELECT doc_id, lang, raw, nfc_normalize(raw) AS norm FROM d)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(*) FILTER (WHERE raw <> norm) AS BIGINT) AS n_changed,
       CAST(SUM(length(raw) - length(norm)) AS BIGINT) AS chars_removed
FROM n GROUP BY lang ORDER BY lang
"""


@register(
    "normalization_rollup",
    _ROLLUP_SQL,
    doc="Per-language NFC impact rollup (n_docs, n_changed, total "
    "chars removed by composition) — the data-quality gauge that "
    "decides whether a crawl slice needs the normalization pass "
    "before dedup. One map-side-combined groupBy over (lang); exact "
    "integer counts.",
    tags=("textops", "normalize", "quality"),
)
def normalization_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _injected(spark, sf_dir).withColumn("norm", _nfc(F.col("raw")))
    return (
        n.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_if(F.col("raw") != F.col("norm")).alias("n_changed"),
            F.sum(F.length("raw") - F.length("norm")).cast("long").alias("chars_removed"),
        )
        .orderBy("lang")
    )
