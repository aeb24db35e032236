#!/usr/bin/env python
"""spark-submit entry point for the CORPUS CURATION pipeline: the dedup
and quality ladder as one command over a documents table.

Cluster launch (north_rule: multi-executor, --py-files):

    cd <repo> && zip -r /tmp/mangaextractor_spark.zip mangaextractor_spark
    spark-submit \
      --master yarn --deploy-mode cluster \
      --num-executors 1000 --executor-cores 4 --executor-memory 16g \
      --py-files /tmp/mangaextractor_spark.zip \
      --conf spark.sql.adaptive.enabled=true \
      scripts/submit_curate.py \
      --docs catalog.db.documents --out /warehouse/curated

The same script runs locally against a parquet path:

    python scripts/submit_curate.py --docs /data/documents.parquet \
        --out /tmp/curated --cores 8

Stages (each a scale-shaped building block from the query registry):

1. gopher quality gate   — map-side column arithmetic (corpus_prep)
2. exact dedup           — content-hash keeper election (groupBy + join-back)
3. near-dup dedup        — MinHash-LSH candidates -> connected components
                           -> keep-min-per-cluster; drop set broadcast
4. repeated-8-gram scrub — cross-doc boilerplate substrings removed,
                           text rebuilt from surviving tokens
5. train/val/test split  — deterministic hash buckets (90/5/5), map-side
6. shard emit            — salted-hash doc -> shard assignment written
                           as a partition column (WebDataset-style
                           consumption unit), with a per-shard manifest
                           (counts + order-insensitive content
                           fingerprint + token-balance ratio) re-derived
                           FROM THE WRITTEN TABLE at <out>_manifest

Output: one parquet table (doc_id, lang, source, split, shard,
clean_text, n_kept, n_dropped) partitioned by (split, shard) and
written idempotently (overwrite), the shard manifest beside it, plus
ONE JSON funnel line on stdout with per-stage counts — the lineage
summary a scheduler ingests. Re-running the identical command
reproduces the identical table (every stage is deterministic; no
sampling anywhere).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True, help="documents parquet path or table")
    ap.add_argument("--out", required=True, help="output parquet directory")
    ap.add_argument("--cores", type=int, default=8, help="local[N] when not on a cluster")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from mangaextractor_spark.queries.corpus_prep import (
        _gopher_frame,
        shard_col,
        shard_manifest,
    )
    from mangaextractor_spark.queries.dedup import (
        connected_components,
        hashed_shingles_from,
        lsh_band_pairs,
        scrub_repeated_ngrams,
    )
    from mangaextractor_spark.session import get_spark

    active = SparkSession.getActiveSession()
    spark = active or get_spark(app_name="curate", cores=args.cores)
    spark.sparkContext.setLogLevel("ERROR")

    if args.docs.endswith(".parquet") or "/" in args.docs:
        docs = spark.read.parquet(args.docs)
    else:
        docs = spark.table(args.docs)
    docs = docs.select("doc_id", "text", "lang", "source")

    funnel: dict[str, int] = {"n_input": docs.count()}

    # 1. quality gate (map-side; keep flag from the gopher rules)
    gated = (
        _gopher_frame(docs.select("doc_id", "text"))
        .filter(F.col("keep") == 1)
        .select("doc_id")
        .join(docs, "doc_id")
    )
    gated = gated.persist()  # feeds three dedup stages below
    funnel["n_quality"] = gated.count()

    # 2. exact dedup: keeper = min doc_id per content hash
    hashed = gated.select(
        "doc_id", F.md5(F.col("text").cast("binary")).alias("h")
    )
    keep = hashed.groupBy("h").agg(F.min("doc_id").alias("doc_id")).select("doc_id")
    exact = gated.join(keep, "doc_id")
    funnel["n_exact_unique"] = exact.count()

    # 3. near-dup dedup over the exact survivors: LSH -> CC -> keep-min.
    pairs = lsh_band_pairs(hashed_shingles_from(exact))
    labels, _ = connected_components(pairs)
    drops = labels.filter(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    survivors = exact.join(F.broadcast(drops), "doc_id", "left_anti")
    funnel["n_neardup_unique"] = survivors.count()

    # 4. scrub cross-document repeated 8-grams from the survivors
    scrubbed = scrub_repeated_ngrams(survivors.select("doc_id", "text"))

    # 5. deterministic 90/5/5 split on the doc id hash
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 15), 16, 10).cast(
            "long"
        ),
        F.lit(100),
    )
    split = (
        F.when(bucket < 90, F.lit("train"))
        .when(bucket < 95, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    # 6. deterministic shard assignment (the WebDataset-style emit
    # unit a trainer consumes); written as a partition column so each
    # shard is its own directory of files
    curated = (
        survivors.select("doc_id", "lang", "source")
        .join(scrubbed, "doc_id")
        .select(
            "doc_id", "lang", "source", split.alias("split"),
            shard_col().alias("shard"),
            "clean_text", "n_kept", "n_dropped",
        )
    )
    curated.write.mode("overwrite").partitionBy("split", "shard").parquet(args.out)

    # re-derive the shard manifest FROM THE WRITTEN TABLE (the trainer's
    # validation view: counts + order-insensitive content fingerprint
    # per shard, token-balance ratio vs perfect) and publish it beside
    # the data — rerunning the manifest on what a trainer later reads
    # must reproduce these exact rows.
    out = spark.read.parquet(args.out)
    manifest = shard_manifest(
        out.select(
            "shard",
            F.col("n_kept").cast("long").alias("n_tokens"),
            F.length("clean_text").cast("long").alias("n_chars"),
            F.pmod(
                F.conv(
                    F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 15),
                    16,
                    10,
                ).cast("long"),
                F.lit(1_000_000_007),
            ).alias("fp"),
        )
    )
    manifest.coalesce(1).write.mode("overwrite").parquet(args.out + "_manifest")

    funnel["n_written"] = out.count()
    funnel["n_tokens_kept"] = out.agg(F.sum("n_kept")).first()[0] or 0
    funnel["n_tokens_scrubbed"] = out.agg(F.sum("n_dropped")).first()[0] or 0
    funnel["n_shards"] = spark.read.parquet(args.out + "_manifest").count()
    print(json.dumps({"metric": "curation_funnel", **funnel}))


if __name__ == "__main__":
    main()
