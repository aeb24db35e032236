"""Streaming main-content extraction: batch/stream parity and restart
exactly-once via the native file-sink log."""

from __future__ import annotations

import pandas as pd

from mangaextractor_spark.queries.main_content import main_content_spans_df
from mangaextractor_spark.streaming.main_content import stream_main_content

SPANS_SCHEMA = (
    "doc_id string, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
)


def _docs(spark, doc_ids):
    rows = [
        (
            d,
            [
                ("html", f"<nav>junk</nav><p>content of {d} long enough to keep</p>", "", 0),
                ("text", f"plain {d}", "", 10),
                ("image", "", f"img/{d}", 20),
            ],
        )
        for d in doc_ids
    ]
    return spark.createDataFrame(rows, SPANS_SCHEMA)


def _canon(pdf: pd.DataFrame):
    return sorted(map(tuple, pdf[["doc_id", "kind", "text", "media_ref", "order"]].values.tolist()))


def test_stream_equals_batch(spark, tmp_path):
    docs_dir, out, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")
    batch1 = _docs(spark, [f"a{i}" for i in range(6)])
    batch1.write.mode("append").parquet(docs_dir)
    q = stream_main_content(spark, docs_dir, out, ckpt)
    q.awaitTermination(120)
    got = spark.read.parquet(out).toPandas()
    want = main_content_spans_df(batch1).toPandas()
    assert _canon(got) == _canon(want)


def test_restart_is_exactly_once(spark, tmp_path):
    docs_dir, out, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")
    _docs(spark, ["x1", "x2"]).write.mode("append").parquet(docs_dir)
    stream_main_content(spark, docs_dir, out, ckpt).awaitTermination(120)
    n1 = spark.read.parquet(out).count()
    # restart with no new files: the checkpoint + sink log must not
    # re-emit anything
    stream_main_content(spark, docs_dir, out, ckpt).awaitTermination(120)
    assert spark.read.parquet(out).count() == n1
    # new files after restart land incrementally
    _docs(spark, ["x3"]).write.mode("append").parquet(docs_dir)
    stream_main_content(spark, docs_dir, out, ckpt).awaitTermination(120)
    got = spark.read.parquet(out).toPandas()
    assert set(got.doc_id) == {"x1", "x2", "x3"}
    assert len(got) == n1 + 3
