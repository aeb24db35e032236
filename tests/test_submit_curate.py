"""End-to-end curation CLI: funnel counts tie to the standalone
queries, output is deterministic across re-runs, and the split
fractions are the declared 90/5/5 hash buckets."""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _run(docs: str, out: str) -> dict:
    proc = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "submit_curate.py"),
         "--docs", docs, "--out", out, "--cores", "8"],
        capture_output=True, text=True, check=True,
    )
    return json.loads(proc.stdout.strip().splitlines()[-1])


def test_curate_funnel_and_determinism(spark, sf_small, tmp_path):
    docs = f"{sf_small}/documents.parquet"
    out1 = str(tmp_path / "c1")
    funnel = _run(docs, out1)

    assert funnel["n_input"] == 500
    assert (
        funnel["n_input"]
        >= funnel["n_quality"]
        >= funnel["n_exact_unique"]
        >= funnel["n_neardup_unique"]
        == funnel["n_written"]
        > 0
    )

    # funnel ties to the standalone quality gate
    from mangaextractor_spark.queries import REGISTRY

    gate = REGISTRY["gopher_quality_filter"].spark(spark, sf_small).toPandas()
    assert funnel["n_quality"] == int((gate["keep"] == 1).sum())

    # deterministic: a second run into another directory is row-identical
    out2 = str(tmp_path / "c2")
    funnel2 = _run(docs, out2)
    assert funnel2 == funnel
    a = sorted(map(tuple, spark.read.parquet(out1).collect()))
    b = sorted(map(tuple, spark.read.parquet(out2).collect()))
    assert a == b

    # split buckets: every row in {train, val, test}; train strictly dominant
    df = spark.read.parquet(out1).toPandas()
    counts = df["split"].value_counts().to_dict()
    assert set(counts) <= {"train", "val", "test"}
    assert counts["train"] > counts.get("val", 0) and counts["train"] > counts.get("test", 0)
    # scrubbed text never contains a cross-doc repeated 8-gram: spot
    # invariant — clean token count equals n_kept
    assert (df["clean_text"].str.split().str.len().fillna(0) == df["n_kept"]).all()

    # shard emit: every row carries a shard, the manifest beside the
    # table ties to it exactly, and fingerprints re-derive from the data
    from mangaextractor_spark.queries.corpus_prep import N_SHARDS, _FP_MOD

    assert funnel["n_shards"] == df["shard"].nunique()
    man = spark.read.parquet(out1 + "_manifest").toPandas().set_index("shard")
    assert man["n_docs"].sum() == funnel["n_written"]
    assert man["n_tokens"].sum() == funnel["n_tokens_kept"]
    assert df["shard"].between(0, N_SHARDS - 1).all()
    got = df.groupby("shard")["doc_id"].apply(
        lambda s: sum(
            int(__import__("hashlib").md5(str(i).encode()).hexdigest()[:15], 16) % _FP_MOD
            for i in s
        )
    )
    assert (man["manifest_fp"].sort_index() == got.sort_index()).all()
