"""The flagship extraction pipeline exposed on the driver surface.

Non-SQL-expressible (Arrow image kernels), so there is no DuckDB
oracle — the driver records a rows-only check; exact span-sequence
correctness is asserted by tests/test_pipeline_e2e.py against the
golden fixture table (kind, text, media_ref, order equality).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import register


@register(
    "extract_manga_spans",
    None,
    doc="Full manga extraction pipeline on a deterministic synthetic "
    "corpus (seed=42): interleaved doc spans -> page decode -> bubble "
    "segmentation -> OCR -> RTL/TTB ordering -> numbered span table.",
    tags=("extraction", "pipeline"),
)
def extract_manga_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..fixtures.generator import CorpusSpec, generate_corpus
    from ..fixtures.spark_io import docs_to_spark, media_to_spark
    from ..pipeline.extract import extract_spans

    corpus = generate_corpus(CorpusSpec(n_docs=16, seed=42))
    docs = docs_to_spark(spark, corpus["documents"])
    media = media_to_spark(spark, corpus["media"])
    return extract_spans(docs, media)
