"""Iceberg sink surface: the cluster-side write path, sandbox-gated.

Everywhere else this repo MODELS Iceberg semantics on parquet layouts
(chunk-partition overwrites in pipeline/checkpoint.py, managed
bucketed tables in storage/bucketing.py, windowed latest-wins merges
in queries/relational.py). This module is the missing deployment half:
the code that actually issues ``MERGE INTO`` / ``writeTo(...)
.partitionedBy(bucket(N, col))`` / ``overwritePartitions`` against a
configured Spark v2 catalog — with an explicit availability gate and a
parquet fallback that preserves the exact same semantics, so the same
call sites run in this sandbox (no Iceberg jars on the classpath) and
on a real cluster unchanged.

Reference parity: the MERGE shape re-expresses the reference's
select-then-update/insert upsert chains (reference
database/db_util.py:454-671, S5/Q6) as one atomic set operation.
"""

from __future__ import annotations

import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def catalog_names(spark: SparkSession) -> list[str]:
    """Names of configured Spark v2 catalogs (``spark.sql.catalog.X``
    keys). Empty in this sandbox — the availability gate. Reads the
    RUNTIME SQL conf (``SET``) rather than the SparkContext's static
    SparkConf, so catalogs registered after session start via
    ``spark.conf.set`` are seen too."""
    names = set()
    for row in spark.sql("SET").collect():
        k = row["key"]
        parts = k.split(".")
        if len(parts) == 4 and k.startswith("spark.sql.catalog."):
            names.add(parts[3])
    return sorted(names)


def iceberg_available(spark: SparkSession) -> bool:
    return bool(catalog_names(spark))


def merge_into_sql(
    target: str, source_view: str, keys: list[str], cols: list[str]
) -> str:
    """The MERGE INTO statement for latest-wins upsert: matched rows
    take every non-key column from the source, unmatched source rows
    insert. Exactly the semantics of the reference's per-row
    select-then-update/insert (db_util.py:454-671) and of this repo's
    merge_upsert_orders oracle."""
    non_keys = [c for c in cols if c not in keys]
    on = " AND ".join(f"t.{k} = s.{k}" for k in keys)
    sets = ", ".join(f"t.{c} = s.{c}" for c in non_keys)
    ins_cols = ", ".join(cols)
    ins_vals = ", ".join(f"s.{c}" for c in cols)
    return (
        f"MERGE INTO {target} t USING {source_view} s ON {on} "
        f"WHEN MATCHED THEN UPDATE SET {sets} "
        f"WHEN NOT MATCHED THEN INSERT ({ins_cols}) VALUES ({ins_vals})"
    )


def merge_delete_sql(target: str, source_view: str, keys: list[str]) -> str:
    """MERGE ... WHEN MATCHED THEN DELETE — the cascading re-process
    delete (reference db_util.py:576-581, Q7) as one statement."""
    on = " AND ".join(f"t.{k} = s.{k}" for k in keys)
    return f"MERGE INTO {target} t USING {source_view} s ON {on} WHEN MATCHED THEN DELETE"


def upsert(
    spark: SparkSession,
    target: str,
    updates: DataFrame,
    keys: list[str],
    fallback_dir: str | None = None,
) -> DataFrame:
    """Latest-wins upsert of ``updates`` into ``target``.

    Catalog present: one atomic ``MERGE INTO`` (snapshot isolation from
    Iceberg). Sandbox fallback: anti-join + union over the parquet
    directory, committed by directory swap — the same two-phase shape
    as an Iceberg snapshot commit (write new data files, then one
    atomic metadata pointer move)."""
    # MERGE INTO errors when one target row matches multiple source
    # rows; enforce the same contract on BOTH paths so the fallback
    # cannot silently insert duplicate keys where the catalog path
    # would have raised.
    dup = updates.groupBy(*keys).count().filter(F.col("count") > 1).limit(1).collect()
    if dup:
        raise ValueError(
            f"updates contain duplicate merge keys (e.g. {tuple(dup[0])[:-1]}); "
            "MERGE semantics require one source row per key"
        )
    if iceberg_available(spark):
        view = f"_updates_{uuid.uuid4().hex[:8]}"
        updates.createOrReplaceTempView(view)
        try:
            spark.sql(merge_into_sql(target, view, keys, updates.columns))
        finally:
            # don't leak one per-call view registration per upsert in a
            # long-lived session
            spark.catalog.dropTempView(view)
        return spark.table(target)
    if fallback_dir is None:
        raise ValueError("no catalog configured and no fallback_dir given")
    out = Path(fallback_dir)
    leftovers = [
        str(p)
        for p in out.parent.glob(out.name + "__*")
        if p.is_dir()
    ] if out.parent.exists() else []
    if leftovers:
        # A crash between the swap renames strands data in __old_* /
        # __commit_* siblings; rebuilding from scratch here would
        # silently drop every previously-upserted row. Refuse and let
        # the operator recover (rename the __old_* dir back).
        raise ValueError(
            f"interrupted upsert detected at {fallback_dir}: leftover "
            f"swap directories {leftovers}; restore or remove them first"
        )
    if (out / "_SUCCESS").exists():
        existing = spark.read.parquet(fallback_dir)
        merged = existing.join(
            updates.select(*keys).distinct(), keys, "left_anti"
        ).unionByName(updates)
    elif out.exists() and any(out.rglob("*.parquet")):
        # Parquet data with no _SUCCESS marker: either a half-written
        # Spark commit or a directory written by a non-Spark tool
        # (pyarrow writes no marker). Treating it as empty would
        # silently DESTROY it in the swap below — refuse, like the
        # leftover-swap guard.
        raise ValueError(
            f"{fallback_dir} contains parquet files but no _SUCCESS "
            "marker; refusing to discard data this upsert did not "
            "write. Remove the directory or add a _SUCCESS marker if "
            "it is a complete dataset."
        )
    else:
        merged = updates
    tmp = f"{fallback_dir}__commit_{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(tmp)
    # atomic-enough swap (single filesystem rename pair; Iceberg's
    # analog is the metadata-pointer CAS)
    old = f"{fallback_dir}__old_{uuid.uuid4().hex[:8]}"
    if out.exists():
        out.rename(old)
    Path(tmp).rename(fallback_dir)
    if Path(old).exists():
        import shutil

        shutil.rmtree(old)
    # the session caches file listings per path; the swap replaced them
    spark.catalog.refreshByPath(fallback_dir)
    return spark.read.parquet(fallback_dir)


def write_bucket_partitioned(
    df: DataFrame,
    table_or_dir: str,
    bucket_col: str,
    n_buckets: int = 16,
    spark: SparkSession | None = None,
) -> None:
    """Create-or-replace the table bucket-partitioned on ``bucket_col``.

    Catalog present: ``writeTo(...).partitionedBy(bucket(N, col))`` —
    the Iceberg partition transform that makes every later equi-join /
    agg on the column shuffle-free. Fallback: the managed bucketed
    table of storage/bucketing.py (same zero-Exchange property,
    asserted in tests/test_bucketing.py) when given a table name, or a
    hash-partitioned parquet layout when given a path."""
    spark = spark or df.sparkSession
    if iceberg_available(spark):
        df.writeTo(table_or_dir).partitionedBy(
            F.bucket(n_buckets, F.col(bucket_col))
        ).createOrReplace()
        return
    if "/" in table_or_dir:
        (
            df.withColumn(
                "_bucket", F.pmod(F.xxhash64(bucket_col), F.lit(n_buckets)).cast("int")
            )
            .write.partitionBy("_bucket")
            .mode("overwrite")
            .parquet(table_or_dir)
        )
        return
    from .bucketing import write_bucketed

    write_bucketed(df, table_or_dir, bucket_col, n_buckets)
