"""Streaming gopher gate: batch/stream parity (shared _gopher_frame)
and exactly-once restart via the file-sink log."""

from __future__ import annotations

from mangaextractor_spark.queries.corpus_prep import gopher_quality_filter
from mangaextractor_spark.streaming.curation import stream_quality_gate


def _run(spark, docs_dir, out, ckpt):
    q = stream_quality_gate(spark, docs_dir, out, ckpt)
    q.awaitTermination(120)
    return spark.read.parquet(out)


def test_stream_gate_equals_batch(spark, sf_small, tmp_path):
    docs_dir = str(tmp_path / "in")
    spark.read.parquet(f"{sf_small}/documents.parquet").select(
        "doc_id", "text"
    ).coalesce(1).write.parquet(docs_dir)
    got = _run(
        spark, docs_dir, str(tmp_path / "out"), str(tmp_path / "ck")
    ).toPandas()
    want = gopher_quality_filter(spark, sf_small).toPandas()
    g = got.sort_values("doc_id").reset_index(drop=True)
    assert list(g["doc_id"]) == list(want["doc_id"])
    assert list(g["keep"]) == list(want["keep"])
    assert list(g["n_words"]) == list(want["n_words"])
    assert list(g["stop_hits"]) == list(want["stop_hits"])


def test_stream_gate_restart_is_exactly_once(spark, sf_small, tmp_path):
    src = spark.read.parquet(f"{sf_small}/documents.parquet").select("doc_id", "text")
    docs_dir, out, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")
    src.filter("doc_id < 250").coalesce(1).write.mode("append").parquet(docs_dir)
    _run(spark, docs_dir, out, ckpt)
    src.filter("doc_id >= 250").coalesce(1).write.mode("append").parquet(docs_dir)
    got = _run(spark, docs_dir, out, ckpt).toPandas()
    assert len(got) == src.count()
    assert got["doc_id"].is_unique, "file-sink log must dedupe replayed batches"
