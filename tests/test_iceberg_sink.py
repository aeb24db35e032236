"""Iceberg sink surface: SQL generation, availability gating, and the
parquet fallback's merge semantics (which must equal the MERGE the
cluster path would issue)."""

from __future__ import annotations

import pandas as pd
import pytest

from mangaextractor_spark.storage.iceberg import (
    catalog_names,
    iceberg_available,
    merge_delete_sql,
    merge_into_sql,
    upsert,
    write_bucket_partitioned,
)


def test_merge_sql_generation():
    sql = merge_into_sql(
        "wh.db.orders", "updates_v", ["o_orderkey"], ["o_orderkey", "o_totalprice", "o_comment"]
    )
    assert sql == (
        "MERGE INTO wh.db.orders t USING updates_v s ON t.o_orderkey = s.o_orderkey "
        "WHEN MATCHED THEN UPDATE SET t.o_totalprice = s.o_totalprice, "
        "t.o_comment = s.o_comment "
        "WHEN NOT MATCHED THEN INSERT (o_orderkey, o_totalprice, o_comment) "
        "VALUES (s.o_orderkey, s.o_totalprice, s.o_comment)"
    )
    dsql = merge_delete_sql("wh.db.pages", "doomed_v", ["id_capitulo", "nome"])
    assert dsql == (
        "MERGE INTO wh.db.pages t USING doomed_v s "
        "ON t.id_capitulo = s.id_capitulo AND t.nome = s.nome "
        "WHEN MATCHED THEN DELETE"
    )


def test_sandbox_has_no_catalog(spark):
    assert catalog_names(spark) == []
    assert not iceberg_available(spark)


def test_upsert_fallback_latest_wins(spark, tmp_path):
    tgt = str(tmp_path / "orders")
    base = spark.createDataFrame(
        pd.DataFrame({"k": [1, 2, 3], "v": ["a", "b", "c"]})
    )
    out1 = upsert(spark, "ignored.tbl", base, ["k"], fallback_dir=tgt)
    assert sorted((r.k, r.v) for r in out1.collect()) == [(1, "a"), (2, "b"), (3, "c")]
    updates = spark.createDataFrame(
        pd.DataFrame({"k": [2, 4], "v": ["B2", "d"]})
    )
    rows2 = sorted((r.k, r.v) for r in upsert(
        spark, "ignored.tbl", updates, ["k"], fallback_dir=tgt
    ).collect())
    assert rows2 == [(1, "a"), (2, "B2"), (3, "c"), (4, "d")]
    # a replay of the same updates is idempotent (MERGE semantics)
    rows3 = sorted((r.k, r.v) for r in upsert(
        spark, "ignored.tbl", updates, ["k"], fallback_dir=tgt
    ).collect())
    assert rows3 == rows2


def test_upsert_requires_fallback_without_catalog(spark):
    df = spark.range(1).withColumnRenamed("id", "k")
    with pytest.raises(ValueError, match="fallback_dir"):
        upsert(spark, "wh.db.t", df, ["k"])


def test_bucket_partitioned_path_fallback(spark, tmp_path):
    out = str(tmp_path / "bucketed")
    df = spark.range(0, 200).withColumnRenamed("id", "doc_id")
    write_bucket_partitioned(df, out, "doc_id", n_buckets=8)
    back = spark.read.parquet(out)
    assert back.count() == 200
    assert back.select("_bucket").distinct().count() == 8
