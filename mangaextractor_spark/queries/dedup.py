"""Deduplication operators for training-data pipelines.

The reference's only dedup is page identity ``(id_capitulo, nome,
hash_pagina)`` (reference database/db_util.py:59, Q8); a 100 TB corpus
engine needs the full ladder: exact hash, n-gram Jaccard, MinHash+LSH,
SimHash. All are expressed as shuffles on content-derived keys —
shingle joins co-partition by shingle, LSH turns O(n^2) similarity
into an equi-join on band buckets (the 100 TB-scale path: candidate
pairs only, never a cross join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..session import load_table
from . import register
from ._portable import phash60, phash60_sql, shingles3, shingles_sql, words_col

N_PERMS = 8
BAND_SIZE = 4  # => 2 bands


def _shingle_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.explode(shingles3(words_col(F.col("text")))).alias("s"))
        .distinct()
    )


@register(
    "dedup_exact",
    """
    SELECT md5(text) AS content_hash, COUNT(*) AS n_docs, MIN(doc_id) AS keeper
    FROM documents
    GROUP BY md5(text)
    ORDER BY content_hash
    """,
    doc="Exact dedup by content hash; keeper = min doc_id. The Q8 "
    "hash_pagina identity (reference db_util.py:59) generalized to "
    "hash-groupBy — one shuffle on the hash, map-side combine.",
    tags=("dedup",),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5(F.col("text").cast("binary")).alias("content_hash"))
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keeper"))
        .orderBy("content_hash")
    )


@register(
    "ngram_jaccard_pairs",
    shingles_sql()
    + """
    , sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS n_common
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT a_id, b_id, n_common,
           ROUND(n_common * 1.0 / (sa.n + sb.n - n_common), 6) AS jaccard
    FROM inter
    JOIN sz sa ON sa.doc_id = a_id
    JOIN sz sb ON sb.doc_id = b_id
    WHERE n_common * 1.0 / (sa.n + sb.n - n_common) >= 0.2
    ORDER BY a_id, b_id
    """,
    doc="Near-dup pairs by word-3-gram Jaccard >= 0.2. Inverted-index join "
    "on the shingle (co-partitions by shingle — no cross join); at 100 TB "
    "frequent shingles are the skew risk -> the LSH variant below is the "
    "scale path.",
    tags=("dedup", "join"),
)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = _shingle_df(spark, sf_dir)
    sz = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sz.alias("sa")
    sb = sz.alias("sb")
    jac = F.col("n_common") * F.lit(1.0) / (F.col("sa.n") + F.col("sb.n") - F.col("n_common"))
    return (
        inter.join(sa, F.col("a_id") == F.col("sa.doc_id"))
        .join(sb, F.col("b_id") == F.col("sb.doc_id"))
        .filter(jac >= 0.2)
        .select("a_id", "b_id", "n_common", F.round(jac, 6).alias("jaccard"))
        .orderBy("a_id", "b_id")
    )


_MINHASH_SQL = (
    shingles_sql()
    + f"""
    SELECT doc_id, p AS perm,
           MIN({phash60_sql("CAST(p AS VARCHAR) || ':' || s")}) AS minhash
    FROM sh CROSS JOIN UNNEST(generate_series(0, {N_PERMS - 1})) AS t(p)
    GROUP BY doc_id, p
    ORDER BY doc_id, perm
    """
)


@register(
    "minhash_signatures",
    _MINHASH_SQL,
    doc=f"MinHash signatures ({N_PERMS} permutations) over word-3-gram "
    "shingles, portable 60-bit hash. One shuffle: groupBy(doc_id, perm) "
    "with map-side min combine. The Arrow-kernel twin computes all perms "
    "in one pass for the 100 TB path.",
    tags=("dedup", "sketch"),
)
def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = _shingle_df(spark, sf_dir)
    perms = F.explode(F.sequence(F.lit(0), F.lit(N_PERMS - 1))).alias("perm")
    h = phash60(F.concat(F.col("perm").cast("string"), F.lit(":"), F.col("s")))
    return (
        sh.select("doc_id", "s", perms)
        .select("doc_id", "perm", h.alias("h"))
        .groupBy("doc_id", "perm")
        .agg(F.min("h").alias("minhash"))
        .orderBy("doc_id", "perm")
    )


@register(
    "minhash_lsh_pairs",
    shingles_sql()
    + f"""
    , mh AS (
      SELECT doc_id, p AS perm,
             MIN({phash60_sql("CAST(p AS VARCHAR) || ':' || s")}) AS minhash
      FROM sh CROSS JOIN UNNEST(generate_series(0, {N_PERMS - 1})) AS t(p)
      GROUP BY doc_id, p
    ),
    sig AS (
      SELECT doc_id, perm // {BAND_SIZE} AS band,
             STRING_AGG(CAST(minhash AS VARCHAR), '-' ORDER BY perm) AS band_sig
      FROM mh GROUP BY doc_id, perm // {BAND_SIZE}
    )
    SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
    FROM sig a JOIN sig b
      ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
    ORDER BY a_id, b_id
    """,
    doc="LSH candidate pairs: band the minhash signature "
    f"({N_PERMS // BAND_SIZE} bands x {BAND_SIZE} rows), equi-join on "
    "(band, band_signature). This is how near-dup scales to 100 TB: the "
    "quadratic similarity search becomes a shuffle on band buckets.",
    tags=("dedup", "sketch", "join"),
)
def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    mh = minhash_signatures(spark, sf_dir)
    sig = (
        mh.withColumn("band", (F.col("perm") / BAND_SIZE).cast("long"))
        .groupBy("doc_id", "band")
        .agg(
            F.concat_ws(
                "-",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("perm", "minhash"))),
                    lambda x: x["minhash"].cast("string"),
                ),
            ).alias("band_sig")
        )
    )
    a = sig.alias("a")
    b = sig.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .distinct()
        .orderBy("a_id", "b_id")
    )


@register(
    "simhash",
    f"""
    WITH w AS (
      SELECT doc_id, {phash60_sql('tok')} AS h
      FROM (
        SELECT DISTINCT doc_id, UNNEST({{ws}}) AS tok FROM documents
      )
    ),
    bits AS (
      SELECT doc_id, b,
             SUM(CASE WHEN SUBSTR(LPAD(BIN(h), 60, '0'), 60 - b, 1) = '1'
                      THEN 1 ELSE -1 END) AS s
      FROM w CROSS JOIN UNNEST(generate_series(0, 15)) AS t(b)
      GROUP BY doc_id, b
    )
    SELECT doc_id,
           CAST(SUM(CASE WHEN s > 0 THEN CAST(ROUND(POW(2, b)) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
    FROM bits GROUP BY doc_id ORDER BY doc_id
    """.replace("{ws}", "list_filter(string_split(TRIM(REGEXP_REPLACE(LOWER(text), '[^a-z0-9]+', ' ', 'g')), ' '), x -> x <> '')"),
    doc="16-bit SimHash over distinct word tokens (portable hash; bit b "
    "read from the zero-padded binary string so Spark and DuckDB agree "
    "without shift-by-column support). Majority vote per bit position.",
    tags=("dedup", "sketch"),
)
def simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = (
        d.select("doc_id", F.explode(words_col(F.col("text"))).alias("tok"))
        .distinct()
        .select("doc_id", phash60(F.col("tok")).alias("h"))
    )
    bits = (
        toks.select("doc_id", "h", F.explode(F.sequence(F.lit(0), F.lit(15))).alias("b"))
        .withColumn(
            "bitval",
            F.lpad(F.bin(F.col("h")), 60, "0").substr(F.lit(60) - F.col("b"), F.lit(1)),
        )
        .groupBy("doc_id", "b")
        .agg(F.sum(F.when(F.col("bitval") == "1", 1).otherwise(-1)).alias("s"))
    )
    return (
        bits.groupBy("doc_id")
        .agg(
            F.sum(
                F.when(F.col("s") > 0, F.round(F.pow(F.lit(2), F.col("b"))).cast("long")).otherwise(
                    F.lit(0)
                )
            ).alias("simhash")
        )
        .orderBy("doc_id")
    )
