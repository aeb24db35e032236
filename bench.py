#!/usr/bin/env python
"""Benchmark harness.

Default mode (what the driver runs): headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` (default 32); prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}``.

Also included per query set: the extraction pipeline (pages/sec on a
deterministic synthetic corpus) — the BASELINE.json target metric.

``--extract-only --cores N`` runs just the extraction throughput probe
(used by the scaling harness, which compares local[8] vs local[32] in
separate JVMs — the sandbox stand-in for N vs 4N executors).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

HEADLINE = [
    "pricing_summary",
    "top_revenue_orders",
    "range_selfjoin",
    "window_first_orders",
    "running_value_per_user",
    "events_hourly",
    "dedup_exact",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "simhash",
    "doc_fingerprint",
    "embedding_topk",
    "langid_confusion",
    "token_counts",
]

BENCH_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "96"))


def _spark(cores: int):
    from mangaextractor_spark.session import get_spark

    s = get_spark(app_name=f"bench-{cores}", cores=cores, shuffle_partitions=cores)
    s.sparkContext.setLogLevel("ERROR")
    return s


def _force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def extraction_probe(spark, n_docs: int = BENCH_DOCS) -> dict:
    """Pages/sec end-to-end (corpus generation excluded from timing)."""
    from mangaextractor_spark.fixtures.generator import CorpusSpec, generate_corpus
    from mangaextractor_spark.fixtures.spark_io import docs_to_spark, media_to_spark
    from mangaextractor_spark.pipeline.extract import extract_spans

    corpus = generate_corpus(CorpusSpec(n_docs=n_docs, seed=42))
    n_pages = len(corpus["media"])
    docs = docs_to_spark(spark, corpus["documents"]).cache()
    media = media_to_spark(spark, corpus["media"]).cache()
    docs.count(), media.count()  # materialize inputs outside the timer
    t0 = time.monotonic()
    _force(extract_spans(docs, media))
    dt = time.monotonic() - t0
    return {"n_pages": n_pages, "sec": round(dt, 3), "pages_per_sec": round(n_pages / dt, 2)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--extract-only", action="store_true")
    ap.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--docs", type=int, default=BENCH_DOCS)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = _spark(args.cores)

    if args.extract_only:
        out = extraction_probe(spark, args.docs)
        out["cores"] = args.cores
        print(json.dumps(out))
        return

    from mangaextractor_spark.queries import REGISTRY

    timings: dict[str, float] = {}
    for name in HEADLINE:
        df = REGISTRY[name].spark(spark, sf_dir)
        t0 = time.monotonic()
        _force(df)
        timings[name] = round(time.monotonic() - t0, 3)

    probe = extraction_probe(spark, args.docs)
    timings["extract_pipeline"] = probe["sec"]

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "extract_pages_per_sec": probe["pages_per_sec"],
                "extract_n_pages": probe["n_pages"],
                "cores": args.cores,
            }
        )
    )


if __name__ == "__main__":
    main()
