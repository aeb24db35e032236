"""Product-quantization family: encoding correctness against an
independent numpy recompute, compression/ADC invariants, recall of the
IVF-PQ search vs the exact brute-force baseline, and the plan-shape
guarantees the 100 TB story rests on (broadcast codebook, no broadcast
of the data-dependent candidate subtree). Oracle parity for both
queries rides the registry-wide harness in test_queries_oracle.py."""

from __future__ import annotations

import math

import numpy as np
import pytest

from mangaextractor_spark.queries import REGISTRY
from mangaextractor_spark.queries.pq import (
    CB_MAX,
    CB_MOD,
    M_SUBSPACES,
    RESCORE_C,
    SUBDIM,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def codes(spark):
    return REGISTRY["pq_codes"].spark(spark, SF).collect()


def _normed_vectors() -> dict[int, np.ndarray]:
    import duckdb

    rows = duckdb.sql(
        f"SELECT vec_id, CAST(embedding AS DOUBLE[]) FROM '{SF}/embeddings.parquet'"
    ).fetchall()
    out = {}
    for vid, emb in rows:
        v = np.array(emb, dtype=np.float64)
        # sequential-sum norm, matching the engines' fold order
        out[vid] = v / math.sqrt(_seq_dot(v, v))
    return out


def _seq_dot(a, b) -> float:
    acc = 0.0
    for x, y in zip(a.tolist(), b.tolist()):
        acc = acc + x * y
    return acc


def test_pq_codes_match_numpy_recompute(codes):
    """Argmin codeword per (vector, subspace) — recomputed from the
    parquet with plain python/numpy, including the e6 fixing and the
    min-code_id tie-break."""
    vecs = _normed_vectors()
    cb_ids = [i for i in sorted(vecs) if i % CB_MOD == 1 and i < CB_MAX]
    assert len(cb_ids) >= 8  # enough codewords even at sf0.001
    got = {(r.vec_id, r.m): (r.code, r.qdist_e6) for r in codes}
    assert len(got) == len(vecs) * M_SUBSPACES
    for vid in list(sorted(vecs))[:40]:
        for m in range(M_SUBSPACES):
            s = vecs[vid][m * SUBDIM : (m + 1) * SUBDIM]
            best = None
            for cid in cb_ids:
                c = vecs[cid][m * SUBDIM : (m + 1) * SUBDIM]
                d = _seq_dot(s, s) + _seq_dot(c, c) - 2 * _seq_dot(s, c)
                d_e6 = int(np.floor(d * 1_000_000 + 0.5))
                if best is None or (d_e6, cid) < best:
                    best = (d_e6, cid)
            assert got[(vid, m)] == (best[1], best[0]), (vid, m)


def test_pq_compression_invariants(codes):
    """Codes are valid codebook ids; quantization distances are
    non-negative; a codeword encodes to itself with distance 0."""
    for r in codes:
        assert r.code % CB_MOD == 1 and r.code < CB_MAX
        assert r.qdist_e6 >= 0
        if r.vec_id % CB_MOD == 1 and r.vec_id < CB_MAX:
            assert r.code == r.vec_id and r.qdist_e6 == 0


def test_ivf_pq_shape_and_recall(spark):
    """Search output is well-formed and finds at least 40% of the
    exact top-k (deterministic constant on the fixed testdata; PQ at
    8x compression + NPROBE=4 loses more than uncompressed IVF's 0.5
    floor, which is the documented accuracy<->bytes trade)."""
    truth: dict[int, set[int]] = {}
    for r in REGISTRY["embedding_topk"].spark(spark, SF).collect():
        truth.setdefault(r.q_id, set()).add(r.neighbor_id)
    rows = REGISTRY["ivf_pq_ann_topk"].spark(spark, SF).collect()
    got: dict[int, set[int]] = {}
    for r in rows:
        assert 1 <= r.rank <= 3 and r.adist_e6 >= 0
        got.setdefault(r.q_id, set()).add(r.neighbor_id)
    assert all(len(v) <= 3 for v in got.values())
    hits = sum(len(got.get(q, set()) & s) for q, s in truth.items())
    total = sum(len(s) for s in truth.values())
    assert hits / total >= 0.4, f"ivf_pq recall {hits}/{total}"


def test_ivf_pq_plan_no_candidate_broadcast(spark):
    """With auto-broadcast off, the only broadcast exchanges left in
    the plan are the construction-bounded sides this module broadcasts
    by hint (centroids, probes, codebook, query distance table, query
    vectors) — every data-dependent subtree (the vec_id-keyed
    aggregates: per-vector cell assignment, per-(vector, m) codes, the
    per-(q, vector) ADC sums) must reach its join via shuffle, never a
    forced broadcast that would OOM at corpus scale."""
    import re

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        df = REGISTRY["ivf_pq_ann_topk"].spark(spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        # The head of each BroadcastExchange segment is the top of the
        # broadcast subtree; none of the hinted bounded sides is an
        # aggregate keyed by vec_id, so any HashAggregate(keys=[vec_id
        # there means an unbounded intermediate was force-broadcast.
        for seg in re.split(r"BroadcastExchange", plan)[1:]:
            assert "HashAggregate(keys=[vec_id" not in seg[:400], seg[:400]
        # With broadcasts disabled for non-hinted joins, the
        # candidate-codes equi-join on vec_id must shuffle.
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        # And the codes/ADC aggregates keep partial (map-side) halves.
        assert "partial_min_by" in plan and "partial_sum" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
