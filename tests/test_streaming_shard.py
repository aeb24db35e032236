"""Streaming shard manifest: single-drop batch parity, additive-state
continuity across micro-batches and restarts, order insensitivity."""

from __future__ import annotations

import pandas as pd

from mangaextractor_spark.queries.corpus_prep import shard_plan
from mangaextractor_spark.streaming.shard_manifest import stream_shard_manifest

_COLS = ["n_docs", "n_tokens", "n_chars", "manifest_fp"]


def _run(spark, docs_dir, out, ckpt):
    q = stream_shard_manifest(spark, docs_dir, out, ckpt)
    q.awaitTermination(120)
    return spark.read.parquet(out).toPandas()


def _latest(pdf: pd.DataFrame) -> dict[int, tuple]:
    pdf = pdf.sort_values("batch_id").groupby("shard").tail(1)
    return {int(r.shard): tuple(int(getattr(r, c)) for c in _COLS) for r in pdf.itertuples()}


def _batch_expect(spark, sf_small) -> dict[int, tuple]:
    want = shard_plan(spark, sf_small).toPandas()
    return {int(r.shard): tuple(int(getattr(r, c)) for c in _COLS) for r in want.itertuples()}


def test_single_drop_equals_batch(spark, sf_small, tmp_path):
    docs_dir = str(tmp_path / "in")
    spark.read.parquet(f"{sf_small}/documents.parquet").select(
        "doc_id", "text", "n_chars"
    ).coalesce(1).write.parquet(docs_dir)
    got = _latest(_run(spark, docs_dir, str(tmp_path / "out"), str(tmp_path / "ck")))
    assert got == _batch_expect(spark, sf_small)


def test_sums_survive_restart_and_ignore_order(spark, sf_small, tmp_path):
    src = spark.read.parquet(f"{sf_small}/documents.parquet").select(
        "doc_id", "text", "n_chars"
    )
    docs_dir, out, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")

    # drop the SECOND half first — addition makes arrival order moot
    src.filter("doc_id % 2 = 1").coalesce(1).write.mode("append").parquet(docs_dir)
    _run(spark, docs_dir, out, ckpt)
    src.filter("doc_id % 2 = 0").coalesce(1).write.mode("append").parquet(docs_dir)
    # fresh query against the SAME checkpoint: state resumes, only the
    # new files replay
    got = _latest(_run(spark, docs_dir, out, ckpt))
    assert got == _batch_expect(spark, sf_small)
