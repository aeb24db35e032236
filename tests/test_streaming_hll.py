"""Streaming HLL: single-drop batch parity, register continuity across
micro-batches and restarts, order insensitivity (max-merge)."""

from __future__ import annotations

import pandas as pd

from mangaextractor_spark.queries.textops import hll_distinct_tokens
from mangaextractor_spark.streaming.hll import stream_hll_distinct


def _run(spark, docs_dir, out, ckpt):
    q = stream_hll_distinct(spark, docs_dir, out, ckpt)
    q.awaitTermination(120)
    return spark.read.parquet(out).toPandas()


def _latest(pdf: pd.DataFrame) -> dict[str, tuple]:
    pdf = pdf.sort_values("batch_id").groupby("lang").tail(1)
    return {
        r.lang: (int(r.n_registers), float(r.hll_estimate)) for r in pdf.itertuples()
    }


def _batch_expect(spark, sf_small) -> dict[str, tuple]:
    want = hll_distinct_tokens(spark, sf_small).toPandas()
    return {
        r.lang: (int(r.n_registers), float(r.hll_estimate)) for r in want.itertuples()
    }


def test_single_drop_equals_batch(spark, sf_small, tmp_path):
    docs_dir = str(tmp_path / "in")
    spark.read.parquet(f"{sf_small}/documents.parquet").select(
        "doc_id", "text", "lang"
    ).coalesce(1).write.parquet(docs_dir)
    got = _latest(_run(spark, docs_dir, str(tmp_path / "out"), str(tmp_path / "ck")))
    assert got == _batch_expect(spark, sf_small)


def test_registers_survive_restart_and_ignore_order(spark, sf_small, tmp_path):
    src = spark.read.parquet(f"{sf_small}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    docs_dir, out, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")

    # drop the SECOND half first — max-merge makes arrival order moot
    src.filter("doc_id % 2 = 1").coalesce(1).write.mode("append").parquet(docs_dir)
    _run(spark, docs_dir, out, ckpt)
    src.filter("doc_id % 2 = 0").coalesce(1).write.mode("append").parquet(docs_dir)
    got = _latest(_run(spark, docs_dir, out, ckpt))  # restarted query

    # after both drops the state equals one batch pass over everything
    assert got == _batch_expect(spark, sf_small)
