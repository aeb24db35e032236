"""Property-level invariants for the corpus-preparation operators
(queries/corpus_prep.py), beyond the DuckDB oracle parity that
tests/test_queries_oracle.py already enforces.

Each test recomputes the operator's defining invariant from the raw
`documents` table in pandas, so a regression in the Spark expressions
fails here with a readable message instead of only a value-hash
mismatch in the driver.
"""

from __future__ import annotations

import pytest

from mangaextractor_spark.queries.corpus_prep import (
    CHUNK_STRIDE,
    CHUNK_WORDS,
    PACK_BUCKETS,
    SEQ_LEN,
    chunk_spans,
    gopher_quality_filter,
    interleaved_stats,
    sequence_packing,
)


@pytest.fixture(scope="module")
def docs_pd(spark, sf_small):
    return (
        spark.read.parquet(f"{sf_small}/documents.parquet")
        .select("doc_id", "text")
        .toPandas()
        .set_index("doc_id")
    )


def test_chunk_spans_covers_every_word(spark, sf_small, docs_pd):
    out = chunk_spans(spark, sf_small).toPandas()
    assert out.groupby("doc_id").size().min() >= 1  # >=1 chunk even for tiny docs
    for doc_id, grp in out.groupby("doc_id"):
        words = docs_pd.loc[doc_id, "text"].split()
        grp = grp.sort_values("chunk_id")
        assert list(grp["chunk_id"]) == list(range(len(grp)))
        # chunk i is exactly words[i*stride : i*stride + CHUNK_WORDS]
        for _, row in grp.iterrows():
            start = row["chunk_id"] * CHUNK_STRIDE
            expect = words[start : start + CHUNK_WORDS]
            assert row["chunk_text"].split() == expect
            assert row["n_chunk_words"] == len(expect)
        # the last chunk reaches the final word -> full coverage
        last = grp.iloc[-1]
        assert last["chunk_id"] * CHUNK_STRIDE + last["n_chunk_words"] == len(words)


def test_chunk_spans_overlap_is_stride_complement(spark, sf_small):
    out = chunk_spans(spark, sf_small).toPandas()
    multi = out[out.groupby("doc_id")["chunk_id"].transform("max") > 0]
    some = multi[multi["n_chunk_words"] == CHUNK_WORDS].head(20)
    assert len(some) > 0, "fixture corpus should contain multi-chunk docs"
    by_doc = out.set_index(["doc_id", "chunk_id"])["chunk_text"]
    for _, row in some.iterrows():
        nxt = by_doc.get((row["doc_id"], row["chunk_id"] + 1))
        if nxt is None:
            continue
        tail = row["chunk_text"].split()[CHUNK_STRIDE:]
        assert nxt.split()[: len(tail)] == tail


def test_sequence_packing_prefix_sums_and_partition(spark, sf_small, docs_pd):
    out = sequence_packing(spark, sf_small).toPandas()
    # every doc appears exactly once and bucket ids are in range
    assert sorted(out["doc_id"]) == sorted(docs_pd.index)
    assert out["bucket"].between(0, PACK_BUCKETS - 1).all()
    for _, grp in out.groupby("bucket"):
        grp = grp.sort_values("doc_id")
        running = 0
        for _, row in grp.iterrows():
            assert row["start_offset"] == running
            assert row["seq_id"] == running // SEQ_LEN
            running += row["n_tokens"]
    # token counts match whitespace tokenization of the source text
    joined = out.set_index("doc_id").join(docs_pd)
    assert (joined["n_tokens"] == joined["text"].str.split().str.len()).all()


def test_packing_n_buckets_knob(spark, sf_small):
    """Round-4 verdict item 3: n_buckets is a parameter of the packing
    frame, not a module constant. Packing the same corpus at 4 and 16
    buckets must cover the identical member set with identical token
    counts, and the per-bucket seq-boundary rule (prefix sum in doc_id
    order, split at SEQ_LEN) must hold at every setting."""
    from mangaextractor_spark.queries.corpus_prep import _packing_frame

    frames = {}
    for nb in (4, 16):
        out = _packing_frame(spark, sf_small, n_buckets=nb).toPandas()
        assert out["bucket"].between(0, nb - 1).all()
        for _, grp in out.groupby("bucket"):
            grp = grp.sort_values("doc_id")
            running = 0
            for _, row in grp.iterrows():
                assert row["start_offset"] == running
                assert row["seq_id"] == running // SEQ_LEN
                running += row["n_tokens"]
        frames[nb] = out.set_index("doc_id")["n_tokens"].sort_index()
    # identical member sets + identical per-doc token counts across knobs
    assert frames[4].equals(frames[16])


def test_gopher_keep_flag_recomputable(spark, sf_small, docs_pd):
    from mangaextractor_spark.queries.corpus_prep import (
        MAX_MEAN_WLEN,
        MAX_SYMBOL_RATIO,
        MAX_WORDS,
        MIN_ALPHA_FRAC,
        MIN_MEAN_WLEN,
        MIN_STOP_HITS,
        MIN_WORDS,
    )

    out = gopher_quality_filter(spark, sf_small).toPandas().set_index("doc_id")
    assert set(out["keep"].unique()) == {0, 1}, "gate must split the corpus, not be constant"
    for doc_id, row in out.iterrows():
        keep = (
            MIN_WORDS <= row["n_words"] <= MAX_WORDS
            and MIN_MEAN_WLEN <= row["mean_word_len"] <= MAX_MEAN_WLEN
            and row["alpha_frac"] >= MIN_ALPHA_FRAC
            and row["symbol_ratio"] <= MAX_SYMBOL_RATIO
            and row["stop_hits"] >= MIN_STOP_HITS
        )
        assert row["keep"] == int(keep), f"{doc_id}: keep flag disagrees with its inputs"


def test_interleaved_stats_kind_counts_sum(spark, sf_small):
    out = interleaved_stats(spark, sf_small).toPandas()
    assert (out["n_spans"] == out["n_html"] + out["n_text"] + out["n_image"]).all()
    assert (out["total_text_chars"] >= 0).all()
    assert (out["max_offset"] >= 0).all()


def test_map_side_ops_have_no_hash_exchange(spark, sf_small):
    """gopher / chunk / interleaved_stats must stay shuffle-free up to
    the deterministic orderBy (whose range exchange is oracle-compare
    plumbing, not part of the operator)."""
    for fn in (gopher_quality_filter, chunk_spans, interleaved_stats):
        plan = fn(spark, sf_small)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, f"{fn.__name__} shuffles:\n{plan}"


def test_sequence_packing_single_bucket_exchange(spark, sf_small):
    plan = sequence_packing(spark, sf_small)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "bucket" in plan


def test_source_rollup_consistent_with_gopher(spark, sf_small):
    from mangaextractor_spark.queries.corpus_prep import source_quality_rollup

    roll = source_quality_rollup(spark, sf_small).toPandas()
    gq = gopher_quality_filter(spark, sf_small).toPandas()
    assert roll["n_docs"].sum() == len(gq)
    assert roll["n_kept"].sum() == gq["keep"].sum()
    assert ((roll["keep_rate"] >= 0) & (roll["keep_rate"] <= 1)).all()
    assert (roll["n_dup"] <= roll["n_docs"]).all()


def test_extracted_dedup_partitions_corpus(spark, sf_small, docs_pd):
    from mangaextractor_spark.queries.corpus_prep import extracted_dedup_groups

    g = extracted_dedup_groups(spark, sf_small).toPandas()
    assert g["n_docs"].sum() == len(docs_pd)
    assert g["content_hash"].is_unique


def test_packed_sequences_matches_packing(spark, sf_small):
    from mangaextractor_spark.queries.corpus_prep import (
        packed_sequences,
        sequence_packing,
    )

    packs = sequence_packing(spark, sf_small).toPandas()
    seqs = packed_sequences(spark, sf_small).toPandas()
    assert seqs["n_docs"].sum() == len(packs)
    expect = (
        packs.groupby(["bucket", "seq_id"])["n_tokens"].sum().reset_index(name="tok")
    )
    merged = seqs.merge(expect, on=["bucket", "seq_id"])
    assert len(merged) == len(seqs)
    assert (merged["seq_tokens"] == merged["tok"]).all()
    for _, row in seqs.head(20).iterrows():
        members = [int(m) for m in row["doc_ids"].split(",")]
        assert members == sorted(members)  # doc_id is numeric in both engines
        assert len(members) == row["n_docs"]


def test_token_rarity_recomputable(spark, sf_small, docs_pd):
    import re
    from collections import Counter

    from mangaextractor_spark.queries.corpus_prep import (
        VOCAB_K,
        token_rarity_quality,
    )

    def toks(t):
        return [w for w in re.sub(r"[^a-z0-9]+", " ", t.lower()).split() if w]

    counts = Counter()
    for t in docs_pd["text"]:
        counts.update(toks(t))
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:VOCAB_K]
    rank = {w: i + 1 for i, (w, _) in enumerate(top)}
    assert len(counts) > VOCAB_K, "fixture must have an OOV tail"

    out = token_rarity_quality(spark, sf_small).toPandas().set_index("doc_id")
    assert len(out) == len(docs_pd)
    for doc_id, row in out.head(50).iterrows():
        ws = toks(docs_pd.loc[doc_id, "text"])
        assert row["n_tokens"] == len(ws)
        assert row["n_oov"] == sum(1 for w in ws if w not in rank)
        expect_mean = sum(rank.get(w, VOCAB_K + 1) for w in ws) / len(ws)
        assert abs(row["mean_rank"] - expect_mean) < 1e-12


def test_token_rarity_vocab_window_is_bounded(spark, sf_small):
    """The only window in the plan must run AFTER the top-K limit —
    i.e. over at most VOCAB_K rows — never over the corpus-sized
    token-count frame (the _scale_notes.py window rule)."""
    from mangaextractor_spark.queries.corpus_prep import token_rarity_quality

    plan = token_rarity_quality(spark, sf_small)._jdf.queryExecution().executedPlan().toString()
    assert "GlobalLimit" in plan or "TakeOrdered" in plan, plan
    i_win = plan.find("Window")
    assert i_win != -1
    # the window's subtree must contain the limit (window above limit)
    assert "Limit" in plan[i_win:] or "TakeOrdered" in plan[i_win:], plan


def test_rank_windows_ride_on_pre_topk(spark, sf_small):
    """The ranking windows in bm25/brute-force-ANN must consume the
    per-partition pre-top-k (MapInPandas) output, never the raw
    corpus-sized candidate set — queries/_topk.py."""
    from mangaextractor_spark.queries import REGISTRY

    for name in ("bm25_topk", "embedding_topk", "lsh_ann_topk", "ivf_ann_topk"):
        plan = (
            REGISTRY[name]
            .spark(spark, sf_small)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        i_win = plan.find("Window")
        assert i_win != -1, name
        assert "MapInPandas" in plan[i_win:], f"{name}: window not fed by pre-top-k:\n{plan}"


def test_shard_plan_partitions_the_corpus(spark, sf_small):
    from mangaextractor_spark.queries.corpus_prep import N_SHARDS, shard_plan

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    n_docs = docs.count()
    out = shard_plan(spark, sf_small).toPandas()
    # every document lands in exactly one shard, none invented
    assert out["n_docs"].sum() == n_docs
    assert out["shard"].between(0, N_SHARDS - 1).all()
    assert out["shard"].is_unique
    # load_ratio is token share vs perfect balance: mean 1.0 by identity
    assert abs(out["load_ratio"].mean() - 1.0) < 1e-9
    # append-stability: re-running on a PREFIX of the corpus must give
    # every prefix doc the same shard (pure per-row assignment)
    full = out.set_index("shard")["manifest_fp"]
    assert (full >= 0).all()


def test_shard_plan_assignment_is_append_stable(spark, sf_small, tmp_path):
    from mangaextractor_spark.queries.corpus_prep import shard_plan

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    half_dir = str(tmp_path / "half")
    docs.filter("doc_id % 2 = 0").write.parquet(f"{half_dir}/documents.parquet")
    half = shard_plan(spark, half_dir).toPandas().set_index("shard")
    full = shard_plan(spark, sf_small).toPandas().set_index("shard")
    # growing the corpus only ADDS docs to shards — per-shard counts of
    # the half corpus never exceed the full corpus's
    joined = half.join(full, lsuffix="_half", rsuffix="_full")
    assert (joined["n_docs_half"] <= joined["n_docs_full"]).all()
    assert (joined["n_tokens_half"] <= joined["n_tokens_full"]).all()


def test_new_topk_queries_ride_pre_topk(spark, sf_small):
    """hard_negatives / cluster_balanced_sample rank windows must also
    consume the per-partition pre-top-k, like every other top-k."""
    from mangaextractor_spark.queries import REGISTRY

    for name in ("hard_negatives", "cluster_balanced_sample"):
        plan = (
            REGISTRY[name]
            .spark(spark, sf_small)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        i_win = plan.find("Window")
        assert i_win != -1, name
        assert "MapInPandas" in plan[i_win:], f"{name}: window not fed by pre-top-k:\n{plan}"


def test_shard_plan_aggregates_map_side(spark, sf_small):
    """shard_plan must be ONE partial-aggregated groupBy on the shard
    key plus a broadcast single-row total derived from the PERSISTED
    per-shard frame — no window, and the corpus is scanned/tokenized
    once (both the manifest branch and the total branch must consume
    the cache, not re-execute the FileScan subtree)."""
    from mangaextractor_spark.queries.corpus_prep import shard_plan

    plan = (
        shard_plan(spark, sf_small)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan
    assert "partial_sum" in plan
    assert plan.count("InMemoryTableScan") == 2, plan
