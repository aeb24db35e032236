"""Bridge: generator pandas outputs -> Spark DataFrames with explicit
schemas (schema-on-write; the reference creates fixed schemas via a
stored procedure, db_util.py:17 — here StructTypes are the contract).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

SPAN_STRUCT = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("offset", T.IntegerType(), False),
    ]
)

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN_STRUCT), False),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("image_bytes", T.BinaryType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("page_md5", T.StringType(), False),
    ]
)

GOLDEN_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("order", T.IntegerType(), False),
    ]
)


def docs_to_spark(spark: SparkSession, docs_pdf: pd.DataFrame) -> DataFrame:
    rows = [
        (
            r["doc_id"],
            [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]],
        )
        for _, r in docs_pdf.iterrows()
    ]
    return spark.createDataFrame(rows, DOCUMENTS_SCHEMA)


def media_to_spark(spark: SparkSession, media_pdf: pd.DataFrame) -> DataFrame:
    rows = [
        (r["media_ref"], bytes(r["image_bytes"]), int(r["width"]), int(r["height"]), r["page_md5"])
        for _, r in media_pdf.iterrows()
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def golden_to_spark(spark: SparkSession, golden_pdf: pd.DataFrame) -> DataFrame:
    rows = [
        (r["doc_id"], r["kind"], r["text"], r["media_ref"], int(r["order"]))
        for _, r in golden_pdf.iterrows()
    ]
    return spark.createDataFrame(rows, GOLDEN_SCHEMA)
