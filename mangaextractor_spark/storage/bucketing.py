"""Bucketed-table layout: co-located joins and aggregations.

At 100 TB the dominant cost of repeated joins on a stable key
(media_ref page lookups, custkey order joins, doc_id span assembly) is
re-shuffling the fact table every query. Bucketing pre-hashes rows
into a fixed number of files per key ONCE at write time; every later
equi-join or aggregation on the bucket column runs with NO Exchange on
the bucketed side (Catalyst recognizes the child distribution). This
module is the local-warehouse form; on a cluster the same layout is an
Iceberg `bucket(N, col)` partition transform.

The zero-shuffle property is asserted against the physical plan in
tests/test_bucketing.py — including the negative control (the same
join un-bucketed DOES exchange both sides).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_col: str | None = None,
) -> None:
    """Persist ``df`` as a managed bucketed table. ``sort_col`` also
    sorts within buckets (enables sort-merge joins with neither
    Exchange NOR per-task Sort)."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        w = w.sortBy(sort_col)
    w.format("parquet").saveAsTable(table)


def plan_exchanges(df: DataFrame) -> int:
    """Count shuffle Exchanges in the physical plan (AQE-resolved)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange hashpartitioning") + plan.count(
        "Exchange rangepartitioning"
    )


def co_located_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket column."""
    return spark.table(left_table).join(spark.table(right_table), on)
