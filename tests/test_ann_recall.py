"""ANN quality gates: the approximate similarity paths must find at
least half of the exact brute-force top-k (the testdata is fixed, so
these recalls are deterministic constants — measured 0.688 for the
multi-table LSH and 0.625 for multi-probe IVF at sf0.01)."""

from __future__ import annotations

import pytest

from mangaextractor_spark.queries import REGISTRY

SF = "/root/testdata/sf0.01"
FLOOR = 0.5


@pytest.fixture(scope="module")
def truth(spark):
    out: dict[int, set[int]] = {}
    for r in REGISTRY["embedding_topk"].spark(spark, SF).collect():
        out.setdefault(r.q_id, set()).add(r.neighbor_id)
    return out


@pytest.mark.parametrize("name", ["lsh_ann_topk", "ivf_ann_topk"])
def test_ann_recall_floor(spark, truth, name):
    got: dict[int, set[int]] = {}
    for r in REGISTRY[name].spark(spark, SF).collect():
        got.setdefault(r.q_id, set()).add(r.neighbor_id)
    hits = sum(len(got.get(q, set()) & s) for q, s in truth.items())
    total = sum(len(s) for s in truth.values())
    assert hits / total >= FLOOR, f"{name} recall {hits}/{total}"


def test_hard_negatives_cross_label_only(spark, sf_small):
    from mangaextractor_spark.queries.similarity import N_QUERIES, TOP_K, hard_negatives

    out = hard_negatives(spark, sf_small).toPandas()
    # negatives always carry a DIFFERENT label than their anchor
    assert (out["q_label"] != out["neg_label"]).all()
    # exactly TOP_K per anchor (corpus has >= TOP_K cross-label rows)
    per = out.groupby("q_id").size()
    assert (per == TOP_K).all()
    assert per.index.min() >= 0 and per.index.max() < N_QUERIES
    # ranks are 1..k dense and ordered by sim desc within each anchor
    for _, grp in out.groupby("q_id"):
        grp = grp.sort_values("rank")
        assert list(grp["rank"]) == list(range(1, len(grp) + 1))
        assert (grp["sim"].diff().dropna() <= 1e-12).all()


def test_cluster_balanced_sample_caps_every_cluster(spark, sf_small):
    from mangaextractor_spark.queries.similarity import (
        CLUSTER_CAP,
        K_CLUSTERS,
        cluster_balanced_sample,
        kmeans_assign,
    )

    out = cluster_balanced_sample(spark, sf_small).toPandas()
    per = out.groupby("cluster_id").size()
    assert (per <= CLUSTER_CAP).all()
    # a cluster with >= CAP members contributes exactly CAP picks
    sizes = kmeans_assign(spark, sf_small).toPandas().set_index("cluster_id")["n_members"]
    for cid, n_mem in sizes.items():
        assert per.get(cid, 0) == min(n_mem, CLUSTER_CAP)
    assert out["cluster_id"].between(0, K_CLUSTERS - 1).all()
    # the pick is a uniform salted-hash draw: no vec_id appears twice
    assert out["vec_id"].is_unique
