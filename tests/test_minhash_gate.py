"""Near-dup Bloom gate: stream/batch parity (the shared
minhash_gate_frame against the shared register), the no-false-negative
containment vs the exact LSH candidate join, and exactly-once restart
via the file-sink log. Oracle parity for the registered batch query
rides test_queries_oracle.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from mangaextractor_spark.queries import REGISTRY
from mangaextractor_spark.queries.minhash_gate import (
    band_key_frame,
    band_register_row,
    minhash_gate_frame,
)
from mangaextractor_spark.queries.minhash_join import _side_col
from mangaextractor_spark.streaming.minhash_gate import stream_minhash_gate


def _sides(spark, sf_small):
    d = (
        spark.read.parquet(f"{sf_small}/documents.parquet")
        .select("doc_id", "text", _side_col().alias("side"))
    )
    base = d.filter(F.col("side") == "base").select("doc_id", "text")
    queries = d.filter(F.col("side") == "query").select("doc_id", "text")
    return base, queries


def test_gate_no_false_negatives_vs_exact_join(spark, sf_small):
    """Every query doc the exact banded join pairs with a base doc MUST
    be flagged by the gate (a Bloom filter cannot miss a member band;
    the gate has no bucket cap, so it is a superset even of capped
    join candidates)."""
    base, queries = _sides(spark, sf_small)
    reg = band_register_row(base)
    flagged = {
        r["doc_id"]
        for r in minhash_gate_frame(queries, reg).collect()
        if r["near_dup_candidate"]
    }
    exact_q_ids = {
        r["q_id"] for r in REGISTRY["minhash_join"].spark(spark, sf_small).collect()
    }
    assert exact_q_ids, "fixture must produce at least one exact candidate pair"
    assert exact_q_ids <= flagged, exact_q_ids - flagged


def test_gate_short_docs_get_empty_bands(spark):
    df = spark.createDataFrame(
        [(1, "one two"), (2, ""), (3, "alpha beta gamma delta")],
        "doc_id long, text string",
    )
    keys = {r["doc_id"]: r["band_keys"] for r in band_key_frame(df).collect()}
    assert keys[1] == [] and keys[2] == []
    assert len(keys[3]) == 2 and all(":" in k for k in keys[3])


def test_stream_gate_equals_batch_and_restart(spark, sf_small, tmp_path):
    """Drop 1: the query-side docs — per-doc rows must equal the batch
    frame bit-for-bit. Drop 2 (restart): exact copies of base docs
    under new ids — every band a copy has is IN the register, so all
    bands hot; the sink log must not regate drop 1."""
    base, queries = _sides(spark, sf_small)
    reg = band_register_row(base)
    docs_dir, out, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")

    queries.coalesce(1).write.mode("append").parquet(docs_dir)
    q = stream_minhash_gate(spark, docs_dir, reg, out, ckpt)
    q.awaitTermination(120)
    got = {
        r["doc_id"]: (r["n_bands"], r["n_hot_bands"], r["near_dup_candidate"])
        for r in spark.read.parquet(out).collect()
    }
    want = {
        r["doc_id"]: (r["n_bands"], r["n_hot_bands"], r["near_dup_candidate"])
        for r in minhash_gate_frame(queries, reg).collect()
    }
    assert got == want and len(got) == queries.count()

    copies = base.limit(20).select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    copies.coalesce(1).write.mode("append").parquet(docs_dir)
    q = stream_minhash_gate(spark, docs_dir, reg, out, ckpt)
    q.awaitTermination(120)
    pdf = spark.read.parquet(out).toPandas()
    assert len(pdf) == queries.count() + copies.count()
    assert pdf["doc_id"].is_unique, "file-sink log must dedupe replayed batches"
    member = pdf[pdf["doc_id"] >= 1_000_000]
    with_bands = member[member["n_bands"] > 0]
    assert (with_bands["n_hot_bands"] == with_bands["n_bands"]).all(), (
        "false negative: a copied base doc's bands are register members"
    )


def test_register_is_one_row(spark, sf_small):
    base, _ = _sides(spark, sf_small)
    reg = band_register_row(base).collect()
    assert len(reg) == 1 and len(reg[0]["bloom"]) >= 1
