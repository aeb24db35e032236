"""Semantics + plan-shape tests for the round-4 analytics additions:
exact histogram quantiles, incremental (cross-snapshot) dedup, and the
k-means assignment step.

Each value test recomputes the operator's DEFINITION independently in
pandas/numpy (not via the SQL oracle — test_queries_oracle already
covers engine parity), so a shared mistake in both engine programs
cannot hide.
"""

from __future__ import annotations

import hashlib
import math
import re

import numpy as np
import pandas as pd
import pyarrow.parquet as pq


def _words(text: str) -> list[str]:
    return [w for w in re.sub(r"[^a-z0-9]+", " ", text.lower()).strip().split(" ") if w]


def test_length_quantiles_matches_type1_definition(spark, sf_small):
    from mangaextractor_spark.queries.textops import QUANTILE_POINTS, length_quantiles

    got = {r["lang"]: r for r in length_quantiles(spark, sf_small).collect()}

    docs = pq.read_table(f"{sf_small}/documents.parquet").to_pandas()
    docs["n"] = docs["text"].map(lambda t: len(_words(t)))
    for lang, grp in docs.groupby("lang"):
        ns = sorted(grp["n"].tolist())
        row = got[lang]
        assert row["n_docs"] == len(ns)
        for name, num, den in QUANTILE_POINTS:
            k = -(-len(ns) * num // den)  # ceil(p * n)
            assert row[name] == ns[k - 1], (lang, name)


def test_length_quantiles_window_rides_the_histogram(spark, sf_medium):
    """The cumulative window's input must be the (lang, n) aggregate,
    never raw document rows: the Window operator sits ABOVE a
    HashAggregate in the plan."""
    from mangaextractor_spark.queries.textops import length_quantiles

    plan = (
        length_quantiles(spark, sf_medium)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" in plan
    w_pos = plan.index("Window")
    assert "HashAggregate" in plan[w_pos:], "window input is not pre-aggregated"


def test_incremental_dedup_semantics(spark, sf_small):
    from mangaextractor_spark.queries.dedup import incremental_dedup

    out = incremental_dedup(spark, sf_small).collect()

    docs = pq.read_table(f"{sf_small}/documents.parquet").to_pandas()
    docs["h"] = docs["text"].map(lambda t: hashlib.md5(t.encode()).hexdigest())
    base_hashes = set(docs.loc[docs.doc_id % 5 != 4, "h"])
    inc = docs[docs.doc_id % 5 == 4]
    fresh = inc[~inc.h.isin(base_hashes)]
    expect = (
        fresh.groupby("h")
        .agg(doc_id=("doc_id", "min"), n=("doc_id", "size"))
        .reset_index()
    )
    got = {r["content_hash"]: (r["doc_id"], r["n_dups_in_increment"]) for r in out}
    assert got == {r.h: (r.doc_id, r.n) for r in expect.itertuples()}
    # every survivor is from the increment, and none was ever in the base
    assert all(d % 5 == 4 for d, _ in got.values())
    assert not (set(got) & base_hashes)


def test_kmeans_assign_matches_numpy(spark, sf_small):
    from mangaextractor_spark.queries.similarity import K_CLUSTERS, kmeans_assign

    out = {r["cluster_id"]: r for r in kmeans_assign(spark, sf_small).collect()}

    def dot(a, b):
        # sequential-sum doubles: the exact accumulation order Spark's
        # F.aggregate and DuckDB's list_dot_product use (numpy's @ is
        # pairwise/SIMD and can differ in ulps)
        s = 0.0
        for x, y in zip(a, b):
            s += x * y
        return s

    tbl = pq.read_table(f"{sf_small}/embeddings.parquet").to_pandas()
    tbl = tbl.sort_values("vec_id").reset_index(drop=True)
    embs = {
        int(r.vec_id): [float(np.float32(x)) for x in r.embedding] for r in tbl.itertuples()
    }
    cents = [(cid, embs[cid], math.sqrt(dot(embs[cid], embs[cid]))) for cid in range(K_CLUSTERS)]

    agg: dict[int, list] = {}
    for vid, v in embs.items():
        nrm = math.sqrt(dot(v, v))
        best = None
        for cid, c, cnrm in cents:  # ascending cid; strict > keeps the smaller cid on ties
            sim = round(dot(v, c) / (nrm * cnrm), 6)
            if best is None or sim > best[0]:
                best = (sim, cid)
        sim, cid = best
        a = agg.setdefault(cid, [0, vid, 0])
        a[0] += 1
        a[1] = min(a[1], vid)
        a[2] += int(round(sim * 1_000_000))
    assert set(out) == set(agg)
    for cid, (n, mn, s) in agg.items():
        r = out[cid]
        assert (r["n_members"], r["min_vec_id"], r["sum_sim_e6"]) == (n, mn, s), cid
    assert sum(r["n_members"] for r in out.values()) == len(embs)


def test_kmeans_assignment_is_map_side(spark, sf_medium):
    """No per-centroid join fan-out: the corpus side must reach the
    argmax without a hash-partitioned exchange — the only hash shuffle
    is the k-row cluster rollup, and the centroid array arrives as a
    broadcast single row."""
    from mangaextractor_spark.queries.similarity import kmeans_assign

    plan = kmeans_assign(spark, sf_medium)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan  # 1-row centroid-array build
    assert plan.count("Exchange hashpartitioning") == 1  # the rollup only
    assert "hashpartitioning(vec_id" not in plan


def test_kmeans_fit_matches_python_lloyds(spark, sf_small):
    """Two full Lloyd's iterations recomputed independently in python:
    sequential-sum dot products, argmax with smaller-cid ties, and the
    quantized-BIGINT centroid mean the engine programs use."""
    from mangaextractor_spark.queries.similarity import K_CLUSTERS, kmeans_fit

    out = {r["cluster_id"]: r for r in kmeans_fit(spark, sf_small).collect()}

    def dot(a, b):
        s = 0.0
        for x, y in zip(a, b):
            s += x * y
        return s

    tbl = pq.read_table(f"{sf_small}/embeddings.parquet").to_pandas()
    embs = {
        int(r.vec_id): [float(np.float32(x)) for x in r.embedding] for r in tbl.itertuples()
    }
    nrms = {vid: math.sqrt(dot(v, v)) for vid, v in embs.items()}
    dims = len(next(iter(embs.values())))

    def assign(cents):
        # cents: sorted list of (cid, c_emb, c_nrm)
        a = {}
        for vid, v in embs.items():
            best = None
            for cid, c, cnrm in cents:
                sim = round(dot(v, c) / (nrms[vid] * cnrm), 6)
                if best is None or sim > best[0]:
                    best = (sim, cid)
            a[vid] = best
        return a

    def update(a):
        sums: dict[int, list[int]] = {}
        counts: dict[int, int] = {}
        for vid, (_, cid) in a.items():
            s = sums.setdefault(cid, [0] * dims)
            counts[cid] = counts.get(cid, 0) + 1
            for d, x in enumerate(embs[vid]):
                s[d] += int(round(x * 1_000_000))
        cents = []
        for cid in sorted(sums):
            c = [s / (counts[cid] * 1_000_000.0) for s in sums[cid]]
            cents.append((cid, c, math.sqrt(dot(c, c))))
        return cents

    c0 = [(cid, embs[cid], nrms[cid]) for cid in range(K_CLUSTERS)]
    a2 = assign(update(assign(c0)))

    agg: dict[int, list] = {}
    for vid, (sim, cid) in a2.items():
        a = agg.setdefault(cid, [0, vid, 0, 0])
        a[0] += 1
        a[1] = min(a[1], vid)
        a[2] += int(round(sim * 1_000_000))
        a[3] += int(round(embs[vid][0] * 1_000_000))
    assert set(out) == set(agg)
    for cid, (n_mem, mn, ssim, sq0) in agg.items():
        r = out[cid]
        next_c0 = int(round(sq0 / (n_mem * 1_000_000.0) * 1_000_000))
        assert (
            r["n_members"], r["min_vec_id"], r["sum_sim_e6"], r["next_c0_e6"]
        ) == (n_mem, mn, ssim, next_c0), cid


def test_events_sliding_1h_matches_pandas(spark, sf_small):
    """RANGE-frame semantics recomputed independently: for each event,
    count/sum over the same user's events in (ts - 1h, ts] inclusive of
    both endpoints per SQL RANGE ... PRECEDING AND CURRENT ROW."""
    import datetime as dt
    import decimal

    from mangaextractor_spark.queries.relational import events_sliding_1h

    out = {r["event_id"]: r for r in events_sliding_1h(spark, sf_small).collect()}

    ev = pq.read_table(f"{sf_small}/events.parquet").to_pandas()
    hour = dt.timedelta(hours=1)
    for user, grp in ev.groupby("user_id"):
        rows = list(grp.itertuples())
        for r in rows:
            inside = [
                x for x in rows if r.ts - hour <= x.ts <= r.ts
            ]
            got = out[r.event_id]
            assert got["n_1h"] == len(inside), r.event_id
            exact = sum(
                decimal.Decimal(str(round(x.value, 4))) for x in inside
            )
            assert got["value_1h"] == float(exact), r.event_id


def test_hll_distinct_tokens_matches_python_hll(spark, sf_small):
    """Registers and estimate recomputed independently: portable 60-bit
    md5 hash, bucket/rho bit ops, scaled-BIGINT harmonic sum, linear
    counting in the small range."""
    from mangaextractor_spark.queries.textops import (
        HLL_B,
        HLL_M,
        hll_distinct_tokens,
    )

    out = {r["lang"]: r for r in hll_distinct_tokens(spark, sf_small).collect()}

    docs = pq.read_table(f"{sf_small}/documents.parquet").to_pandas()
    suffix_bits = 60 - HLL_B
    mask = (1 << suffix_bits) - 1
    regs: dict[str, dict[int, int]] = {}
    exact: dict[str, set] = {}
    for r in docs.itertuples():
        for tok in _words(r.text):
            exact.setdefault(r.lang, set()).add(tok)
            h = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)
            bucket, rest = h >> suffix_bits, h & mask
            rho = suffix_bits + 1 - rest.bit_length() if rest else suffix_bits + 1
            lr = regs.setdefault(r.lang, {})
            lr[bucket] = max(lr.get(bucket, 0), rho)
    for lang, lr in regs.items():
        s = (HLL_M - len(lr)) * (1 << (suffix_bits + 1)) + sum(
            1 << (suffix_bits + 1 - rho) for rho in lr.values()
        )
        raw = (
            0.7213 / (1.0 + 1.079 / float(HLL_M)) * float(HLL_M) * float(HLL_M)
            * float(1 << (suffix_bits + 1))
        ) / float(s)
        n_zero = HLL_M - len(lr)
        est = (
            float(HLL_M) * math.log(float(HLL_M) / float(n_zero))
            if n_zero > 0 and raw <= 2.5 * HLL_M
            else raw
        )
        row = out[lang]
        assert row["n_exact"] == len(exact[lang])
        assert row["n_registers"] == len(lr)
        assert row["hll_estimate"] == round(est, 4), lang
        # the sketch is a real estimator: within 10% here
        assert abs(row["rel_err_e6"]) < 100_000, (lang, row["rel_err_e6"])


def test_cm_heavy_hitters_matches_python_sketch(spark, sf_small):
    """Count-Min recomputed independently: salted portable hashes,
    integer counters, min-over-rows estimate, CM >= truth invariant."""
    from collections import Counter

    from mangaextractor_spark.queries.textops import (
        CM_D,
        CM_W,
        TOP_HITTERS,
        cm_heavy_hitters,
    )

    rows = cm_heavy_hitters(spark, sf_small).collect()

    docs = pq.read_table(f"{sf_small}/documents.parquet").to_pandas()
    toks = [t for txt in docs["text"] for t in _words(txt)]
    truth = Counter(toks)
    counters: Counter = Counter()
    def cell(tok, i):
        h = int(hashlib.md5(f"cm{i}:{tok}".encode()).hexdigest()[:15], 16)
        return (i, h % CM_W)
    for t in toks:
        for i in range(CM_D):
            counters[cell(t, i)] += 1
    top = sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:TOP_HITTERS]
    expect = [
        (tok, n, min(counters[cell(tok, i)] for i in range(CM_D)))
        for tok, n in top
    ]
    got = [(r["token"], r["n_true"], r["cm_estimate"]) for r in rows]
    assert got == expect
    assert all(r["overestimate"] >= 0 for r in rows)  # CM never undercounts


def test_regional_revenue_broadcasts_dimensions(spark, sf_medium):
    """The dimension chain must broadcast — the fact table never
    shuffles on a dimension key."""
    from mangaextractor_spark.queries.relational import regional_revenue

    plan = (
        regional_revenue(spark, sf_medium)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("BroadcastHashJoin") >= 3
    assert "hashpartitioning(c_custkey" not in plan
    assert "hashpartitioning(l_suppkey" not in plan


def test_length_mad_matches_type1_definition(spark, sf_small):
    from mangaextractor_spark.queries.textops import length_mad

    got = {r["lang"]: r for r in length_mad(spark, sf_small).collect()}

    def med1(vals):  # type-1 median: element at rank ceil(n/2)
        vals = sorted(vals)
        return vals[(len(vals) + 1) // 2 - 1]

    docs = pq.read_table(f"{sf_small}/documents.parquet").to_pandas()
    docs["n"] = docs["text"].map(lambda t: len(_words(t)))
    for lang, grp in docs.groupby("lang"):
        ns = grp["n"].tolist()
        m = med1(ns)
        mad = med1([abs(x - m) for x in ns])
        row = got[lang]
        assert (row["n_docs"], row["median"], row["mad"]) == (len(ns), m, mad), lang


def test_near_dup_pagerank_matches_python(spark, sf_small):
    """Integer-PageRank logic recomputed independently over the same
    candidate graph (pairs come from minhash_lsh_pairs, which has its
    own oracle + tests — the independence boundary here is the rank
    arithmetic)."""
    from mangaextractor_spark.queries.dedup import (
        PR_ITERS,
        PR_TOP,
        minhash_lsh_pairs,
        near_dup_pagerank,
    )

    got = [(r["node"], r["deg"], r["pr"]) for r in near_dup_pagerank(spark, sf_small).collect()]

    pairs = [(r.a_id, r.b_id) for r in minhash_lsh_pairs(spark, sf_small).collect()]
    adj: dict[int, list[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    deg = {n: len(vs) for n, vs in adj.items()}
    pr = {n: 1_000_000 for n in adj}
    for _ in range(PR_ITERS):
        s = {n: 0 for n in adj}
        for n, vs in adj.items():
            c = pr[n] // deg[n]
            for v in vs:
                s[v] += c
        pr = {n: 150_000 + (850 * s[n]) // 1000 for n in adj}
    expect = sorted(((n, deg[n], pr[n]) for n in adj), key=lambda t: (-t[2], t[0]))[:PR_TOP]
    assert got == expect
    # rank mass sanity: every node's rank stays within the damped band
    assert all(p >= 150_000 for _, _, p in got)


def test_minhash_jaccard_accuracy_matches_python(spark, sf_small):
    """Signature-match counts and true Jaccard recomputed from raw text
    (portable hash + XOR permutation mixes, distinct 3-shingle sets)."""
    from mangaextractor_spark.queries.dedup import (
        N_PERMS,
        XOR_CONSTS,
        minhash_jaccard_accuracy,
    )

    rows = minhash_jaccard_accuracy(spark, sf_small).collect()
    assert rows, "fixture corpus must yield candidate pairs"

    docs = pq.read_table(f"{sf_small}/documents.parquet").to_pandas()

    def shingle_hashes(text):
        ws = _words(text)
        return [
            int(hashlib.md5(" ".join(ws[i : i + 3]).encode()).hexdigest()[:15], 16)
            for i in range(len(ws) - 2)
        ]

    hls = {int(r.doc_id): shingle_hashes(r.text) for r in docs.itertuples()}
    for r in rows:
        ha, hb = hls[r["a_id"]], hls[r["b_id"]]
        sig_a = [min(h ^ XOR_CONSTS[p] for h in ha) for p in range(N_PERMS)]
        sig_b = [min(h ^ XOR_CONSTS[p] for h in hb) for p in range(N_PERMS)]
        n_match = sum(1 for x, y in zip(sig_a, sig_b) if x == y)
        sa, sb = set(ha), set(hb)
        true_j = round(len(sa & sb) / len(sa | sb), 6)
        assert r["n_match"] == n_match, (r["a_id"], r["b_id"])
        assert r["est_jaccard"] == round(n_match / N_PERMS, 6)
        assert r["true_jaccard"] == true_j
        assert r["err_e6"] == int(round((round(n_match / N_PERMS, 6) - true_j) * 1_000_000))


def test_unpivot_adds_no_exchange_after_pivot(spark, sf_medium):
    """Unpivot is a per-row expansion (Expand/Generate), never a
    shuffle: exactly the pivot aggregation's exchange may appear."""
    from mangaextractor_spark.queries.relational import orders_priority_unpivot

    plan = (
        orders_priority_unpivot(spark, sf_medium)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the Expand (melt) node exists, and everything ABOVE it adds no
    # hash exchange — only the presentation sort's range partitioning;
    # the two hash exchanges below it belong to the pivot aggregation
    assert "Expand" in plan
    above = plan[: plan.index("Expand")]
    assert "Exchange hashpartitioning" not in above
    assert "Window" not in plan
