"""Stop-shingle cap: a viral shingle (df > POSTING_CAP) must not
explode into quadratic pairs, on BOTH engines identically.

Fixture: 80 docs of the form 'alpha beta gamma end{i}' — every pair
shares exactly the one viral shingle 'alpha beta gamma' and would pass
jaccard = 1/3 >= 0.2 without the cap (C(80,2) = 3160 pairs from one
posting list — the skew scenario). Plus one genuine near-dup pair that
shares only non-viral shingles and must survive the cap.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from mangaextractor_spark.queries import REGISTRY
from mangaextractor_spark.queries.dedup import POSTING_CAP

N_VIRAL = 80


@pytest.fixture(scope="module")
def skew_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("skewdocs")
    rows = [
        {"doc_id": f"viral{i:03d}", "text": f"alpha beta gamma end{i}"}
        for i in range(N_VIRAL)
    ]
    rows.append({"doc_id": "pair_a", "text": "red green blue cyan magenta"})
    rows.append({"doc_id": "pair_b", "text": "red green blue cyan yellow"})
    pd.DataFrame(rows).to_parquet(d / "documents.parquet")
    return str(d)


def test_viral_shingle_capped_identically(spark, skew_dir):
    assert N_VIRAL > POSTING_CAP  # the fixture must actually trip the cap
    qd = REGISTRY["ngram_jaccard_pairs"]
    sdf = qd.spark(spark, skew_dir).toPandas()

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{skew_dir}/documents.parquet'"
    )
    odf = con.execute(qd.oracle).df()
    con.close()

    # No quadratic blow-up: the 3160 viral pairs are gone on both sides,
    # the genuine near-dup pair (2 shared non-viral shingles of 3 each,
    # jaccard = 0.5) survives.
    got = sorted(zip(sdf["a_id"], sdf["b_id"], sdf["jaccard"]))
    want = sorted(zip(odf["a_id"], odf["b_id"], odf["jaccard"]))
    assert got == want
    assert got == [("pair_a", "pair_b", 0.5)]


def test_dedup_clusters_transitive_chain(spark, tmp_path_factory):
    """A ~ B and B ~ C without A ~ C directly: connected components must
    still place all three in ONE cluster keyed by the min doc_id —
    identically on Spark (iterative propagation) and DuckDB (recursive
    closure)."""
    import duckdb

    from mangaextractor_spark.queries import REGISTRY

    d = tmp_path_factory.mktemp("chain")
    # Deterministic chain under the fixed minhash bands: B is the base
    # text; A differs only in the FIRST word, C only in the LAST. The
    # banding yields exactly {(a,b), (b,c)} — verified candidates — so
    # a ~ c holds ONLY through transitivity.
    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu "
        "nu xi omicron pi rho sigma tau upsilon"
    )
    rows = [
        {"doc_id": "a", "text": "start0 " + base.split(" ", 1)[1]},
        {"doc_id": "b", "text": base},
        {"doc_id": "c", "text": base.rsplit(" ", 1)[0] + " end0"},
        {"doc_id": "z", "text": "totally different content here now friend"},
    ]
    import pandas as pd

    pd.DataFrame(rows).to_parquet(d / "documents.parquet")
    pairs = sorted(
        (r.a_id, r.b_id)
        for r in REGISTRY["minhash_lsh_pairs"].spark(spark, str(d)).collect()
    )
    assert pairs == [("a", "b"), ("b", "c")]  # the chain, no direct a~c
    qd = REGISTRY["dedup_clusters"]
    sdf = qd.spark(spark, str(d)).toPandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'")
    odf = con.execute(qd.oracle).df()
    con.close()
    got = sorted(zip(sdf.doc_id, sdf.cluster_id, sdf.cluster_size, sdf.is_keeper))
    want = sorted(zip(odf.doc_id, odf.cluster_id, odf.cluster_size, odf.is_keeper))
    assert got == want
    assert got == [("a", "a", 3, True), ("b", "a", 3, False), ("c", "a", 3, False)]


def test_connected_components_log_rounds(spark):
    """Round-complexity proof for the large-star/small-star upgrade: a
    diameter-256 chain (the adversarial shape for min-label
    propagation, which needs O(256) rounds) must converge within
    ~2*log2(n)+2 alternation rounds, with every node labeled by the
    chain head. A second disjoint component checks labels don't leak."""
    import math

    import pandas as pd

    from mangaextractor_spark.queries.dedup import connected_components

    n = 257
    ids = [f"n{i:04d}" for i in range(n)]
    chain = pd.DataFrame({"a_id": ids[:-1], "b_id": ids[1:]})
    other = pd.DataFrame({"a_id": ["z1", "z2"], "b_id": ["z2", "z3"]})
    pairs = spark.createDataFrame(pd.concat([chain, other], ignore_index=True))
    labels, rounds = connected_components(pairs)
    got = labels.toPandas().set_index("doc_id")["cluster_id"]
    assert len(got) == n + 3
    assert (got[ids] == "n0000").all()
    assert (got[["z1", "z2", "z3"]] == "z1").all()
    assert rounds <= 2 * math.ceil(math.log2(n)) + 2, rounds


def test_connected_components_random_graphs_match_union_find(spark):
    """large-star/small-star vs a plain union-find oracle on random
    edge lists (multiple shapes: sparse forests, dense blobs, rings)."""
    import numpy as np
    import pandas as pd

    from mangaextractor_spark.queries.dedup import connected_components

    rng = np.random.default_rng(7)
    for trial in range(4):
        n = int(rng.integers(10, 60))
        m = int(rng.integers(1, n * 2))
        a = rng.integers(0, n, m)
        b = rng.integers(0, n, m)
        ids = [f"v{i:03d}" for i in range(n)]
        pairs = pd.DataFrame(
            {"a_id": [ids[i] for i in a], "b_id": [ids[i] for i in b]}
        )
        pairs = pairs[pairs.a_id != pairs.b_id]
        if pairs.empty:
            continue
        labels, rounds = connected_components(spark.createDataFrame(pairs))
        got = dict(labels.toPandas().values.tolist())
        # union-find oracle
        parent = list(range(n))
        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x
        for x, y in zip(a.tolist(), b.tolist()):
            if x == y:
                continue
            rx, ry = find(x), find(y)
            if rx != ry:
                parent[max(rx, ry)] = min(rx, ry)
        want = {}
        for i in range(n):
            r = find(i)
            if any((x == i and y != i) or (y == i and x != i) for x, y in zip(a.tolist(), b.tolist())):
                want[ids[i]] = ids[min(j for j in range(n) if find(j) == r)]
        assert got == want, (trial, rounds)
        assert rounds <= 12


# ---- repeated_ngram_stats: viral boilerplate gram (round-3 item 2) ----

BOILER = "b1 b2 b3 b4 b5 b6 b7 b8"  # exactly one token 8-gram
N_BOILER_DOCS = 10


@pytest.fixture(scope="module")
def viral_gram_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("viralgram")
    rows = [
        # 3 grams each; gram #1 (the boilerplate) shared by all 10 docs
        {"doc_id": f"boil{i:02d}", "text": f"{BOILER} u{i}a u{i}b"}
        for i in range(N_BOILER_DOCS)
    ]
    # unique doc: nothing repeated across docs
    rows.append({"doc_id": "uniq", "text": "x1 x2 x3 x4 x5 x6 x7 x8"})
    # internal repetition only: same gram 3x within ONE doc -> df=1,
    # must NOT count as repeated (the signal is cross-document)
    rows.append({"doc_id": "selfrep", "text": "r r r r r r r r r r"})
    pd.DataFrame(rows).to_parquet(d / "documents.parquet")
    return str(d)


def test_viral_gram_stats_and_plan(spark, viral_gram_dir):
    qd = REGISTRY["repeated_ngram_stats"]
    df = qd.spark(spark, viral_gram_dir)

    # Scale shape: gram df must be a groupBy + equi-join back (AQE can
    # skew-split an equi-join exchange), never a window over h (pins a
    # viral gram's postings on one task). No Window may appear at all.
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "Window" not in plan, f"window-over-h reintroduced:\n{plan}"

    out = df.toPandas().set_index("doc_id")
    for i in range(N_BOILER_DOCS):
        r = out.loc[f"boil{i:02d}"]
        assert (r.n_grams, r.n_repeated) == (3, 1)
        assert r.repeated_frac == 1.0 / 3.0
    assert (out.loc["uniq"].n_grams, out.loc["uniq"].n_repeated) == (1, 0)
    # internal-only repetition is not cross-document repetition
    assert (out.loc["selfrep"].n_grams, out.loc["selfrep"].n_repeated) == (3, 0)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{viral_gram_dir}/documents.parquet'"
    )
    odf = con.execute(qd.oracle).df().set_index("doc_id")
    con.close()
    for doc_id, r in out.iterrows():
        o = odf.loc[doc_id]
        assert (r.n_grams, r.n_repeated, r.repeated_frac) == (
            o.n_grams, o.n_repeated, o.repeated_frac
        ), doc_id


def test_repeated_ngram_scrub_removes_only_cross_doc_repeats(spark, viral_gram_dir):
    """The REMOVAL twin of repeated_ngram_stats: the boilerplate 8-gram's
    token positions are scrubbed from every doc carrying it; unique and
    internally-repeated (df=1) grams survive untouched."""
    qd = REGISTRY["repeated_ngram_scrub"]
    df = qd.spark(spark, viral_gram_dir)

    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "Window" not in plan, f"window-over-h reintroduced:\n{plan}"

    out = df.toPandas().set_index("doc_id")
    for i in range(N_BOILER_DOCS):
        r = out.loc[f"boil{i:02d}"]
        assert r.clean_text == f"u{i}a u{i}b"
        assert (r.n_kept, r.n_dropped) == (2, 8)
    assert out.loc["uniq"].clean_text == "x1 x2 x3 x4 x5 x6 x7 x8"
    assert out.loc["uniq"].n_dropped == 0
    # within-doc repetition is NOT cross-document repetition: kept whole
    assert out.loc["selfrep"].clean_text == " ".join(["r"] * 10)
    assert out.loc["selfrep"].n_dropped == 0

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{viral_gram_dir}/documents.parquet'"
    )
    odf = con.execute(qd.oracle).df().set_index("doc_id")
    con.close()
    for doc_id, r in out.iterrows():
        o = odf.loc[doc_id]
        assert (r.clean_text, r.n_kept, r.n_dropped) == (
            o.clean_text, o.n_kept, o.n_dropped
        ), doc_id


def test_dedup_ladder_funnel_consistent_with_components(spark, sf_small):
    """The funnel's totals must tie out against the standalone queries
    it composes: dedup_exact (distinct hashes) and the monotone
    total >= exact >= near-dup chain."""
    funnel = {r["lang"]: r for r in REGISTRY["dedup_ladder_funnel"].spark(spark, sf_small).collect()}
    n_total = sum(r["n_total"] for r in funnel.values())
    n_exact = sum(r["n_exact_keepers"] for r in funnel.values())
    n_near = sum(r["n_neardup_survivors"] for r in funnel.values())
    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    assert n_total == docs.count()
    assert n_exact == REGISTRY["dedup_exact"].spark(spark, sf_small).count()
    assert 0 < n_near <= n_exact <= n_total
    for r in funnel.values():
        assert 0 <= r["n_neardup_survivors"] <= r["n_exact_keepers"] <= r["n_total"]


def test_simhash_hamming_pairs_matches_bruteforce(spark, sf_small):
    """Candidates from banding + stop-bucket cap + popcount filter must
    equal the python recompute of the same construction; and without
    the cap the banded set must be a SUBSET of brute force (pigeonhole:
    banding never invents pairs, only the cap removes them)."""
    import hashlib
    import re
    from collections import Counter

    import pyarrow.parquet as pq

    from mangaextractor_spark.queries.dedup import (
        SIMHASH_BAND_BITS,
        SIMHASH_BAND_CAP,
        SIMHASH_HAM_MAX,
        SIMHASH_N_BANDS,
        SIMHASH_WIDE_BITS,
        simhash_hamming_pairs,
    )

    got = {(r["a_id"], r["b_id"]): r["hamming"]
           for r in simhash_hamming_pairs(spark, sf_small).collect()}

    docs = pq.read_table(f"{sf_small}/documents.parquet").to_pandas()
    sigs = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        toks = list(dict.fromkeys(
            w for w in re.sub(r"[^a-z0-9]+", " ", text.lower()).strip().split(" ") if w
        ))
        if not toks:
            continue
        hs = [int(hashlib.md5(t.encode()).hexdigest()[:15], 16) for t in toks]
        sig = 0
        for b in range(SIMHASH_WIDE_BITS):
            vote = sum(1 if (h >> b) & 1 else -1 for h in hs)
            if vote > 0:
                sig |= 1 << b
        sigs[doc_id] = sig

    mask = (1 << SIMHASH_BAND_BITS) - 1
    bucket: Counter = Counter()
    for sig in sigs.values():
        for k in range(SIMHASH_N_BANDS):
            bucket[(k, (sig >> (SIMHASH_BAND_BITS * k)) & mask)] += 1
    ids = sorted(sigs)
    expect, brute = {}, {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            ham = bin(sigs[a] ^ sigs[b]).count("1")
            if ham > SIMHASH_HAM_MAX:
                continue
            brute[(a, b)] = ham
            for k in range(SIMHASH_N_BANDS):
                va = (sigs[a] >> (SIMHASH_BAND_BITS * k)) & mask
                vb = (sigs[b] >> (SIMHASH_BAND_BITS * k)) & mask
                if va == vb and bucket[(k, va)] <= SIMHASH_BAND_CAP:
                    expect[(a, b)] = ham
                    break
    assert got == expect and len(got) > 0
    # banding + cap only ever UNDER-reports vs brute force, never invents
    assert set(got) <= set(brute)
    assert all(brute[k] == v for k, v in got.items())


def test_simhash_hamming_pairs_no_window_banded_join(spark, sf_small):
    from mangaextractor_spark.queries.dedup import simhash_hamming_pairs

    plan = (
        simhash_hamming_pairs(spark, sf_small)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
