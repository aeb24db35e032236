"""Streaming sequence packing: batch parity on a single drop, cursor
continuity across micro-batches and restarts."""

from __future__ import annotations

import pandas as pd

from mangaextractor_spark.queries.corpus_prep import sequence_packing
from mangaextractor_spark.streaming.packing import stream_sequence_packing


def _run(spark, docs_dir, out, ckpt):
    q = stream_sequence_packing(spark, docs_dir, out, ckpt)
    q.awaitTermination(120)
    return spark.read.parquet(out).drop("batch_id")


def _canon(pdf: pd.DataFrame):
    cols = ["doc_id", "bucket", "n_tokens", "start_offset", "seq_id"]
    return sorted(map(tuple, pdf[cols].values.tolist()))


def test_single_drop_equals_batch(spark, sf_small, tmp_path):
    docs_dir = str(tmp_path / "in")
    spark.read.parquet(f"{sf_small}/documents.parquet").coalesce(1).write.parquet(docs_dir)
    got = _run(spark, docs_dir, str(tmp_path / "out"), str(tmp_path / "ck")).toPandas()
    want = sequence_packing(spark, sf_small).toPandas()
    assert _canon(got) == _canon(want)


def test_cursor_continuity_across_batches_and_restart(spark, sf_small, tmp_path):
    src = spark.read.parquet(f"{sf_small}/documents.parquet").select("doc_id", "text")
    a = src.filter("doc_id % 2 = 0")
    b = src.filter("doc_id % 2 = 1")
    docs_dir, out, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")

    a.coalesce(1).write.mode("append").parquet(docs_dir)
    _run(spark, docs_dir, out, ckpt)
    # second drop -> RESTARTED query resumes the per-bucket cursor from
    # the state checkpoint
    b.coalesce(1).write.mode("append").parquet(docs_dir)
    got = _run(spark, docs_dir, out, ckpt).toPandas()

    assert len(got) == src.count(), "every doc packed exactly once"
    assert got["doc_id"].is_unique
    for _, grp in got.groupby("bucket"):
        grp = grp.sort_values("start_offset")
        # contiguous, non-overlapping token stream from offset 0
        assert grp["start_offset"].iloc[0] == 0
        expect_next = grp["start_offset"] + grp["n_tokens"]
        assert (grp["start_offset"].iloc[1:].values == expect_next.iloc[:-1].values).all()
        assert (grp["seq_id"] == grp["start_offset"] // 256).all()


# --- multimodal twin ------------------------------------------------------

from mangaextractor_spark.queries import REGISTRY
from mangaextractor_spark.queries.main_content import interleaved_docs
from mangaextractor_spark.queries.mm_packing import MM_SEQ_LEN
from mangaextractor_spark.streaming.packing import stream_mm_packing


def _run_mm(spark, docs_dir, out, ckpt):
    q = stream_mm_packing(spark, docs_dir, out, ckpt)
    q.awaitTermination(120)
    return spark.read.parquet(out).drop("batch_id")


def test_mm_single_drop_equals_batch(spark, sf_small, tmp_path):
    docs_dir = str(tmp_path / "in")
    interleaved_docs(spark, sf_small).coalesce(1).write.parquet(docs_dir)
    got = _run_mm(spark, docs_dir, str(tmp_path / "out"), str(tmp_path / "ck")).toPandas()
    want = REGISTRY["multimodal_packing"].spark(spark, sf_small).toPandas()
    cols = ["doc_id", "bucket", "start_offset", "seq_id"]
    want = want.rename(columns={"mm_tokens": "n_tokens"})
    assert sorted(map(tuple, got[cols + ["n_tokens"]].values.tolist())) == sorted(
        map(tuple, want[cols + ["n_tokens"]].values.tolist())
    )


def test_mm_cursor_continuity_across_restart(spark, sf_small, tmp_path):
    src = interleaved_docs(spark, sf_small)
    a = src.filter("CAST(doc_id AS LONG) % 2 = 0")
    b = src.filter("CAST(doc_id AS LONG) % 2 = 1")
    docs_dir, out, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")

    a.coalesce(1).write.mode("append").parquet(docs_dir)
    _run_mm(spark, docs_dir, out, ckpt)
    b.coalesce(1).write.mode("append").parquet(docs_dir)
    got = _run_mm(spark, docs_dir, out, ckpt).toPandas()

    assert len(got) == src.count(), "every doc packed exactly once"
    assert got["doc_id"].is_unique
    for _, grp in got.groupby("bucket"):
        grp = grp.sort_values("start_offset")
        assert grp["start_offset"].iloc[0] == 0
        expect_next = grp["start_offset"] + grp["n_tokens"]
        assert (grp["start_offset"].iloc[1:].values == expect_next.iloc[:-1].values).all()
        assert (grp["seq_id"] == grp["start_offset"] // MM_SEQ_LEN).all()
