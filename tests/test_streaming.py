"""Streaming ingest tests: file-stream micro-batches through the same
extraction pipeline, exactly-once under a checkpoint, output equal to
the one-shot batch run.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mangaextractor_spark.fixtures.generator import CorpusSpec, generate_corpus
from mangaextractor_spark.fixtures.spark_io import docs_to_spark, media_to_spark
from mangaextractor_spark.pipeline.extract import extract_spans
from mangaextractor_spark.streaming.ingest import stream_extract


@pytest.fixture(scope="module")
def corpus():
    return generate_corpus(CorpusSpec(n_docs=10, seed=11))


def _write_doc_files(corpus, docs_dir, n_files=3):
    """Split the documents table over several parquet files (several
    micro-batches with maxFilesPerTrigger=1)."""
    docs = corpus["documents"]
    rows = [
        {"doc_id": r["doc_id"], "spans": r["spans"]} for _, r in docs.iterrows()
    ]
    docs_dir.mkdir(parents=True, exist_ok=True)
    schema = pa.schema(
        [
            ("doc_id", pa.string()),
            (
                "spans",
                pa.list_(
                    pa.struct(
                        [
                            ("kind", pa.string()),
                            ("text", pa.string()),
                            ("media_ref", pa.string()),
                            ("offset", pa.int32()),  # input_hint: offset:int32
                        ]
                    )
                ),
            ),
        ]
    )
    per = (len(rows) + n_files - 1) // n_files
    for i in range(n_files):
        chunk = rows[i * per : (i + 1) * per]
        if chunk:
            pq.write_table(
                pa.Table.from_pylist(chunk, schema=schema), str(docs_dir / f"part-{i}.parquet")
            )


def _collect_sorted(df):
    return sorted(
        (r.doc_id, r.kind, r.text, r.media_ref, r.order)
        for r in df.select("doc_id", "kind", "text", "media_ref", "order").collect()
    )


def test_stream_equals_batch(spark, corpus, tmp_path):
    docs_dir = tmp_path / "docs_in"
    _write_doc_files(corpus, docs_dir)
    media = media_to_spark(spark, corpus["media"])

    out = str(tmp_path / "spans_out")
    q = stream_extract(
        spark,
        str(docs_dir),
        media,
        out,
        str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    q.awaitTermination(300)

    streamed = spark.read.parquet(out)
    batch = extract_spans(docs_to_spark(spark, corpus["documents"]), media)
    assert _collect_sorted(streamed) == _collect_sorted(batch)


def test_stream_restart_is_exactly_once(spark, corpus, tmp_path):
    """Re-starting a drained stream over the same checkpoint must not
    re-emit any batch (the streaming resume analog of the chunk test)."""
    docs_dir = tmp_path / "docs_in"
    _write_doc_files(corpus, docs_dir)
    media = media_to_spark(spark, corpus["media"])
    out = str(tmp_path / "spans_out")
    ckpt = str(tmp_path / "ckpt")

    q = stream_extract(spark, str(docs_dir), media, out, ckpt)
    q.awaitTermination(300)
    n1 = spark.read.parquet(out).count()
    assert n1 > 0

    q2 = stream_extract(spark, str(docs_dir), media, out, ckpt)
    q2.awaitTermination(300)
    assert spark.read.parquet(out).count() == n1


def test_batch_replay_does_not_duplicate(spark, corpus, tmp_path):
    """The crash-replay scenario foreachBatch can hit: the same batch id
    delivered twice (sink write committed, checkpoint commit lost).
    The idempotent per-batch overwrite must leave output unchanged."""
    from mangaextractor_spark.streaming.ingest import batch_committer

    media = media_to_spark(spark, corpus["media"])
    docs = docs_to_spark(spark, corpus["documents"])
    out = str(tmp_path / "replay_out")
    commit = batch_committer(media, out)

    commit(docs, 0)
    first = _collect_sorted(spark.read.parquet(out))
    assert len(first) > 0
    commit(docs, 0)  # replayed batch
    assert _collect_sorted(spark.read.parquet(out)) == first
    commit(docs.limit(2), 1)  # a genuinely new batch still appends
    assert spark.read.parquet(out).count() > len(first)
