"""Independent-recompute checks for semantic_dedup and rrf_fusion.

The oracle-parity harness (tests/test_queries_oracle.py) already
verifies both against their DuckDB twins; these tests re-derive the
same answers with numpy/pandas from the raw parquet so a shared
misunderstanding between the Spark program and its SQL oracle cannot
hide (both could state the same wrong rule).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from mangaextractor_spark.queries import REGISTRY
from mangaextractor_spark.queries.hybrid import FUSED_TOP_K, QUERY_VECS, RRF_K
from mangaextractor_spark.queries.similarity import K_CLUSTERS, SEM_DEDUP_SIM

SF = "/root/testdata/sf0.01"


def _embeddings() -> tuple[np.ndarray, np.ndarray]:
    t = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    t = t.sort_values("vec_id").reset_index(drop=True)
    ids = t["vec_id"].to_numpy(dtype=np.int64)
    mat = np.vstack(t["embedding"].to_numpy()).astype(np.float64)
    return ids, mat


def _cos(mat: np.ndarray) -> np.ndarray:
    n = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    return np.round(n @ n.T, 6)


def test_semantic_dedup_matches_numpy(spark):
    ids, mat = _embeddings()
    sims = _cos(mat)
    # Assignment: argmax cosine vs the first K seeds, ties to smaller cid.
    seed_sims = sims[:, :K_CLUSTERS]
    cluster = np.argmax(seed_sims, axis=1)  # argmax takes the FIRST max => smaller cid

    removed = set()
    for b in range(len(ids)):
        same = np.nonzero(cluster == cluster[b])[0]
        smaller = same[same < b]
        if len(smaller) and (sims[b, smaller] >= SEM_DEDUP_SIM).any():
            removed.add(int(ids[b]))

    got = REGISTRY["semantic_dedup"].spark(spark, SF).toPandas()
    assert len(got) == len(ids)
    got_removed = set(got.loc[~got["kept"], "vec_id"])
    assert got_removed == removed
    gc = dict(zip(got["vec_id"], got["cluster_id"]))
    for i, vid in enumerate(ids):
        assert gc[vid] == cluster[i], vid
    # The operator must actually split: some removed, most kept.
    assert 0 < len(removed) < len(ids) // 2


def test_rrf_fusion_matches_pandas_recompute(spark):
    lex = REGISTRY["bm25_topk"].spark(spark, SF).toPandas()
    ids, mat = _embeddings()
    sims = _cos(mat)

    rows = []
    for qid, qvec in QUERY_VECS:
        s = sims[qvec].copy()
        order = sorted(
            (i for i in range(len(ids)) if i != qvec),
            key=lambda i: (-s[i], ids[i]),
        )[:10]
        rows += [(qid, int(ids[i]), r + 1) for r, i in enumerate(order)]
    dense = pd.DataFrame(rows, columns=["query_id", "cand_id", "rk"])

    lexr = lex.rename(columns={"doc_id": "cand_id"})[["query_id", "cand_id", "rank"]]
    fused = lexr.merge(dense, on=["query_id", "cand_id"], how="outer")
    fused["rrf"] = fused["rank"].map(
        lambda r: 0.0 if pd.isna(r) else 1.0 / (RRF_K + int(r))
    ) + fused["rk"].map(lambda r: 0.0 if pd.isna(r) else 1.0 / (RRF_K + int(r)))

    got = REGISTRY["rrf_fusion"].spark(spark, SF).toPandas()
    for qid in {q for q, _ in QUERY_VECS}:
        f = fused[fused["query_id"] == qid].sort_values(
            ["rrf", "cand_id"], ascending=[False, True]
        )
        want = list(f.head(FUSED_TOP_K)["cand_id"])
        g = got[got["query_id"] == qid].sort_values("rank")
        assert list(g["cand_id"]) == want, qid
        np.testing.assert_allclose(
            g["rrf_score"].to_numpy(), f.head(FUSED_TOP_K)["rrf"].to_numpy(), rtol=0, atol=0
        )
    # Fusion must use both legs: some fused top-10 entry is dense-only.
    merged = got.merge(lexr, on=["query_id", "cand_id"], how="left", indicator=True)
    assert (merged["_merge"] == "left_only").any()


def test_semantic_dedup_plan_has_no_window(spark):
    """Every stage is a join or an aggregate — assignment is the
    broadcast-array argmax (no per-centroid fan-out), the pair stage is
    an AQE-splittable equi-join on cluster_id, and the keep mask joins
    the removed-id set back as a broadcast dimension. Nothing may ride
    a window (see queries/_scale_notes.py)."""
    df = REGISTRY["semantic_dedup"].spark(spark, SF)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "Window [" not in plan
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in phys  # removed-id keep-mask join-back


def test_rrf_fusion_windows_are_prebounded(spark):
    """rrf_fusion keeps exactly two rank windows (dense leg + fused
    re-rank). The dense one must be fed by the Arrow pre-top-k
    (MapInPandas) so its partition size is operator-bounded, never
    corpus-sized; the fused one ranks only the joined candidate lists
    (<= k_lex + k_dense rows per query by construction)."""
    df = REGISTRY["rrf_fusion"].spark(spark, SF)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    windows = [ln for ln in plan.splitlines() if "Window [" in ln]
    assert len(windows) == 3, windows  # bm25 rank + dense rank + fused rank
    assert all("row_number" in w for w in windows)
    assert plan.count("MapInPandas") >= 2  # bm25 + dense pre-top-k stages
