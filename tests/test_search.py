"""BM25 retrieval tests: ranking semantics on a hand-built corpus and
bit-exact oracle parity (driver-style compare on a private table)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from mangaextractor_spark.queries import REGISTRY


@pytest.fixture(scope="module")
def tiny_corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("bm25")
    rows = [
        # doc 1: short, both q1 terms ("hash join") repeatedly -> top
        {"doc_id": 1, "text": "hash join hash join hash join"},
        # doc 2: both terms once, diluted by length
        {"doc_id": 2, "text": "hash join " + "filler " * 40},
        # doc 3: only one q1 term
        {"doc_id": 3, "text": "hash table lookup structure"},
        # doc 4: no q1 terms at all -> absent from q1 results
        {"doc_id": 4, "text": "window agg order by clause"},
    ]
    pd.DataFrame(rows).to_parquet(d / "documents.parquet")
    return str(d)


def test_bm25_ranking_semantics(spark, tiny_corpus):
    q = REGISTRY["bm25_topk"]
    out = (
        q.spark(spark, tiny_corpus)
        .toPandas()
        .sort_values(["query_id", "rank"])
    )
    q1 = out[out.query_id == "q1"]
    assert list(q1.doc_id) == [1, 2, 3]  # both-terms-dense > diluted > single-term
    assert 4 not in set(q1.doc_id)
    assert list(q1["rank"]) == [1, 2, 3]
    assert q1.score.is_monotonic_decreasing
    # q2 ("window agg order"): only doc 4 matches
    q2 = out[out.query_id == "q2"]
    assert list(q2.doc_id) == [4]


def test_bm25_oracle_parity_tiny(spark, tiny_corpus):
    q = REGISTRY["bm25_topk"]
    sdf = q.spark(spark, tiny_corpus).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{tiny_corpus}/documents.parquet'"
    )
    odf = con.execute(q.oracle).df()
    con.close()
    got = sorted(map(tuple, sdf[["query_id", "doc_id", "score", "rank"]].values.tolist()))
    want = sorted(map(tuple, odf[["query_id", "doc_id", "score", "rank"]].values.tolist()))
    assert got == want  # bit-exact scores, not approx


def test_bm25_df_is_not_a_window_over_term(spark, tiny_corpus):
    """Round-3 verdict item 1: document frequency must come from a
    groupBy + broadcast join-back, not Window.partitionBy(term) — a
    window carries every posting of a term into one task (no partial
    aggregation, no AQE skew split). The only Window left in the plan
    is the final per-query row_number ranking."""
    q = REGISTRY["bm25_topk"]
    df = q.spark(spark, tiny_corpus)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    windows = [ln for ln in plan.splitlines() if "Window [" in ln]
    assert len(windows) == 1, f"expected exactly the rank window, got: {windows}"
    assert "row_number" in windows[0]
    assert "count" not in windows[0]  # df no longer rides a window
