"""Streaming Bloom decontamination gate: stream/batch parity (shared
bloom_probe_frame against the shared register row), exactly-once
restart via the file-sink log, and the no-false-negative guarantee."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from mangaextractor_spark.queries.scale_ops import (
    BLOOM_BITS,
    BLOOM_K,
    bloom_probe_frame,
    bloom_register_row,
)
from mangaextractor_spark.streaming.bloom_gate import stream_bloom_gate


def _base_and_inc(spark, sf_small):
    d = spark.read.parquet(f"{sf_small}/documents.parquet").select("doc_id", "text")
    base = (
        d.filter(F.col("doc_id") % 5 != 4)
        .select(F.md5(F.col("text").cast("binary")).alias("content_hash"))
        .distinct()
    )
    inc = d.filter(F.col("doc_id") % 5 == 4)
    return base, inc


def _run(spark, docs_dir, reg, out, ckpt):
    q = stream_bloom_gate(spark, docs_dir, reg, out, ckpt)
    q.awaitTermination(120)
    return spark.read.parquet(out)


def test_stream_bloom_equals_batch_probe(spark, sf_small, tmp_path):
    base, inc = _base_and_inc(spark, sf_small)
    reg = bloom_register_row(base)
    docs_dir = str(tmp_path / "in")
    inc.coalesce(1).write.parquet(docs_dir)
    got = _run(spark, docs_dir, reg, str(tmp_path / "out"), str(tmp_path / "ck"))
    want = bloom_probe_frame(inc, reg)
    g = {r["doc_id"]: (r["content_hash"], r["bloom_hit"]) for r in got.collect()}
    w = {r["doc_id"]: (r["content_hash"], r["bloom_hit"]) for r in want.collect()}
    assert g == w and len(g) == inc.count()


def test_stream_bloom_no_false_negatives_and_restart(spark, sf_small, tmp_path):
    """Drop 1: fresh docs. Drop 2 (after restart): exact copies of base
    docs — every one of them MUST hit (the Bloom guarantee); the sink
    log must not reprobe drop 1."""
    d = spark.read.parquet(f"{sf_small}/documents.parquet").select("doc_id", "text")
    base, inc = _base_and_inc(spark, sf_small)
    reg = bloom_register_row(base)
    docs_dir, out, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")

    inc.coalesce(1).write.mode("append").parquet(docs_dir)
    _run(spark, docs_dir, reg, out, ckpt)

    # drop 2: base-corpus texts under new doc_ids = guaranteed members
    copies = (
        d.filter(F.col("doc_id") % 5 == 0)
        .select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    )
    copies.coalesce(1).write.mode("append").parquet(docs_dir)
    got = _run(spark, docs_dir, reg, out, ckpt).toPandas()

    assert len(got) == inc.count() + copies.count()
    assert got["doc_id"].is_unique, "file-sink log must dedupe replayed batches"
    member_rows = got[got["doc_id"] >= 1_000_000]
    assert member_rows["bloom_hit"].all(), "false negative: impossible for a Bloom filter"


def test_register_row_is_constant_size(spark, sf_small):
    base, _ = _base_and_inc(spark, sf_small)
    reg = bloom_register_row(base).collect()
    assert len(reg) == 1
    bloom = reg[0]["bloom"]
    assert len(bloom) <= BLOOM_BITS // 32
    # python recompute of one register word proves the bit layout
    some_hash = sorted(
        hashlib.md5(r["text"].encode()).hexdigest()
        for r in spark.read.parquet(f"{sf_small}/documents.parquet")
        .filter(F.col("doc_id") % 5 != 4)
        .select("text")
        .collect()
    )[0]
    pos = int(hashlib.md5(f"{some_hash}:0".encode()).hexdigest()[:15], 16) % BLOOM_BITS
    assert (bloom[pos // 32] >> (pos % 32)) & 1 == 1
