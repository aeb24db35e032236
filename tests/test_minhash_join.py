"""Two-table MinHash join family: side-split discipline, banding
invariants, best-match reduction, and containment bounds."""

from __future__ import annotations

import hashlib

from mangaextractor_spark.queries import REGISTRY
from mangaextractor_spark.queries.dedup import BAND_SIZE, N_PERMS
from mangaextractor_spark.queries.minhash_join import _SIDE_MOD

SF = "/root/testdata/sf0.01"


def _side(doc_id: int) -> str:
    h = int(hashlib.md5(f"{doc_id}-side".encode()).hexdigest()[:15], 16)
    return "query" if h % _SIDE_MOD == 0 else "base"


def test_join_pairs_cross_sides_and_band_floor(spark):
    rows = REGISTRY["minhash_join"].spark(spark, SF).collect()
    assert len(rows) > 0
    for r in rows:
        # strictly cross-corpus: never base x base or query x query
        assert _side(r.q_id) == "query" and _side(r.b_id) == "base"
        # a band collision aligns BAND_SIZE whole permutations, so any
        # candidate matches at least one full band's worth
        assert BAND_SIZE <= r.n_match <= N_PERMS
        assert r.est_jaccard == r.n_match / N_PERMS


def test_best_match_is_argmax_of_join(spark):
    pairs = REGISTRY["minhash_join"].spark(spark, SF).collect()
    best = {r.q_id: r for r in REGISTRY["minhash_join_best_match"].spark(spark, SF).collect()}
    expect: dict[int, tuple[int, int]] = {}
    for r in pairs:
        cur = expect.get(r.q_id)
        cand = (-r.n_match, r.b_id)  # max n_match, tie -> smaller b_id
        if cur is None or cand < cur:
            expect[r.q_id] = cand
    assert set(best) == set(expect)
    for q_id, (neg_m, b_id) in expect.items():
        assert (best[q_id].b_id, best[q_id].n_match) == (b_id, -neg_m)


def test_containment_bounds_and_candidate_set(spark):
    pairs = {(r.q_id, r.b_id) for r in REGISTRY["minhash_join"].spark(spark, SF).collect()}
    rows = REGISTRY["cross_snapshot_containment"].spark(spark, SF).collect()
    assert {(r.q_id, r.b_id) for r in rows} == pairs  # same LSH candidates
    for r in rows:
        assert 0 < r.n_q
        assert 0 <= r.n_common <= r.n_q
        assert r.containment == r.n_common / r.n_q


def test_one_signature_pass_reused(spark):
    """The signature subtree must be persisted and shared: the scored
    frame references it three times (cap agg + two enrich joins); an
    InMemoryTableScan in the plan proves the single-pass discipline."""
    df = REGISTRY["minhash_join"].spark(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan
