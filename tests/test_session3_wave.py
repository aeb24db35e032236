"""Semantics + plan gates for the round-5 third-session operators:
``bpe_encode_stats`` (corpus-wide encode under the learned merges) and
``epoch_mixture_plan`` (data-constrained repeat schedule).

Oracle parity runs in test_queries_oracle.py (registry-driven); these
tests recompute both semantics independently in plain Python/pandas and
pin the scale claims to the physical plan.
"""

from __future__ import annotations

import math
import re
from collections import Counter

import pandas as pd

from mangaextractor_spark.queries import REGISTRY

SF = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _words(t: str) -> list[str]:
    return [w for w in re.sub(r"[^a-z0-9]+", " ", t.lower()).split() if w]


def _textbook_bpe_segs(vocab: Counter, rounds: int) -> dict[str, list[str]]:
    """Sennrich alg. 1 with the registry's tie-break (lexicographic on
    'a b'), returning the FINAL segmentation after all merges applied."""
    segs = {w: list(w) for w in vocab}
    for _ in range(rounds):
        pc = Counter()
        for w, f in vocab.items():
            s = segs[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += f
        (a, b), _cnt = min(pc.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}"))
        for w in segs:
            s, out, i = segs[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            segs[w] = out
    return segs


def test_bpe_encode_stats_matches_textbook_encode(spark):
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    vocab = Counter()
    per_lang_words: dict[str, list[str]] = {}
    for t, lang in zip(docs.text, docs.lang):
        ws = _words(t)
        vocab.update(ws)
        per_lang_words.setdefault(lang, []).extend(ws)
    segs = _textbook_bpe_segs(vocab, 4)
    n_tok = {w: len(s) for w, s in segs.items()}

    rows = {r.lang: r for r in REGISTRY["bpe_encode_stats"].spark(spark, SF).collect()}
    assert set(rows) == set(per_lang_words)
    for lang, ws in per_lang_words.items():
        r = rows[lang]
        want_words = len(ws)
        want_tokens = sum(n_tok[w] for w in ws)
        want_chars = sum(len(w) for w in ws)
        assert (r.n_words, r.n_tokens, r.n_chars) == (want_words, want_tokens, want_chars)
        assert r.fertility == want_tokens / want_words
        assert r.chars_per_token == want_chars / want_tokens
        # A merge can only shrink a word's token count: 1 <= fertility
        # <= chars/word; compression >= 1 char per token.
        assert 1.0 <= r.fertility
        assert r.chars_per_token >= 1.0


def test_bpe_encode_stats_plan_is_vocab_sided(spark):
    df = REGISTRY["bpe_encode_stats"].spark(spark, SF)
    df.collect()
    plan = _plan(df)
    # The encode never ranks or windows the corpus; the per-round argmax
    # is a TakeOrdered (limit 1), not a global sort materialization.
    assert "Window" not in plan


def test_epoch_mixture_plan_matches_exact_recompute(spark):
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    toks = Counter()
    for t, src in zip(docs.text, docs.source):
        toks[src] += len(_words(t))
    w_e6 = {s: math.floor(math.sqrt(float(n)) * 1_000_000) for s, n in toks.items()}
    tot_w = sum(w_e6.values())
    tot_toks = sum(toks.values())

    rows = {r.source: r for r in REGISTRY["epoch_mixture_plan"].spark(spark, SF).collect()}
    assert set(rows) == set(toks)
    for s in toks:
        r = rows[s]
        req = (2 * tot_toks * w_e6[s]) // tot_w
        assert (r.tokens_avail, r.w_e6, r.requested_tokens) == (toks[s], w_e6[s], req)
        assert r.epochs == -(-req // toks[s])  # ceiling division
        assert r.epochs >= 1
        assert r.repeat_factor == req / toks[s]
    # Floor divisions under-allocate by < 1 token per source.
    assert 0 <= 2 * tot_toks - sum(r.requested_tokens for r in rows.values()) < len(rows)


def test_epoch_mixture_plan_single_corpus_scan(spark):
    df = REGISTRY["epoch_mixture_plan"].spark(spark, SF)
    df.collect()
    plan = _plan(df)
    # One corpus scan feeds the per-source aggregate; the weight table
    # and the 1-row total meet in a broadcast, never a shuffle join.
    assert plan.count("FileScan parquet") == 0  # branches read the checkpointed weights
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "Window" not in plan
