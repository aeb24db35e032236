"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

The real surface lives in ``mangaextractor_spark.queries`` (registry
of QueryDef: Spark program + ANSI-SQL oracle); this module is a thin
adapter.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from mangaextractor_spark.queries import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the document-pipeline rollup on sf0.001 — parse +
    normalize + quality + hash-dedup over `documents`, joined into one
    per-language summary (exercises scan, projection-heavy codegen,
    aggregation, and join in a single plan)."""
    from pyspark.sql import functions as F

    from mangaextractor_spark.functions.parsing import normalize_ocr_text
    from mangaextractor_spark.queries._portable import words_col
    from mangaextractor_spark.session import load_table

    sf_dir = "/root/testdata/sf0.001"
    d = load_table(spark, sf_dir, "documents")
    enriched = d.select(
        "doc_id",
        "lang",
        F.md5(F.col("text").cast("binary")).alias("content_hash"),
        F.size(words_col(F.col("text"))).alias("n_tokens"),
        F.length("text").alias("n_chars_actual"),
        normalize_ocr_text(F.substring("text", 1, 40)).alias("norm_head"),
    )
    return (
        enriched.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("content_hash").alias("n_unique"),
            F.sum("n_tokens").alias("total_tokens"),
            F.max("n_chars_actual").alias("max_chars"),
        )
        .orderBy("lang")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: qd.spark for name, qd in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: qd.oracle for name, qd in REGISTRY.items() if qd.oracle is not None}
