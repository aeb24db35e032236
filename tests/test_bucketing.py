"""Bucketed layout: the zero-shuffle co-location proof, straight from
the physical plan."""

from __future__ import annotations

import pytest

from mangaextractor_spark.storage.bucketing import (
    co_located_join,
    plan_exchanges,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucket_db(spark, sf_small, tmp_path_factory):
    loc = tmp_path_factory.mktemp("warehouse")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bucketdb LOCATION '{loc}'")
    orders = spark.read.parquet(f"{sf_small}/orders.parquet")
    cust = spark.read.parquet(f"{sf_small}/customer.parquet")
    write_bucketed(orders, "bucketdb.orders_b", "o_custkey", 8, sort_col="o_custkey")
    write_bucketed(
        cust.withColumnRenamed("c_custkey", "o_custkey"),
        "bucketdb.cust_b",
        "o_custkey",
        8,
        sort_col="o_custkey",
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield "bucketdb"
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    spark.sql("DROP DATABASE bucketdb CASCADE")


def test_bucketed_join_has_no_exchange(spark, bucket_db, sf_small):
    orders = spark.read.parquet(f"{sf_small}/orders.parquet")
    cust = spark.read.parquet(f"{sf_small}/customer.parquet")
    joined = co_located_join(spark, f"{bucket_db}.orders_b", f"{bucket_db}.cust_b", "o_custkey")
    n = joined.count()
    assert n == orders.join(cust, orders.o_custkey == cust.c_custkey).count() > 0
    assert plan_exchanges(joined) == 0  # co-located: no shuffle at all

    # negative control: the identical join over plain parquet scans
    plain = orders.join(cust.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey")
    plain.count()
    assert plan_exchanges(plain) >= 2  # both sides exchange


def test_bucketed_aggregation_has_no_exchange(spark, bucket_db):
    agg = spark.table(f"{bucket_db}.orders_b").groupBy("o_custkey").count()
    agg.count()
    assert plan_exchanges(agg) == 0  # bucket distribution satisfies the groupBy
