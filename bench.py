#!/usr/bin/env python
"""Benchmark harness.

Default mode (what the driver runs): headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` (default 32); prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}``.

Included in the query set: ``extract_pipeline`` — the manga extraction
pipeline's steady-state wall time over a deterministic synthetic
corpus; pages/sec is reported alongside (the BASELINE.json target
metric).

Other modes:
- ``--extract-only --cores N [--corpus DIR]``: just the extraction
  probe, optionally reading a pre-materialized parquet corpus.
  Used by the scaling harness (fresh JVM per parallelism level).
- ``--scaling``: materialize a larger corpus once, run the probe in
  two subprocess JVMs at local[8] and local[32] (the sandbox stand-in
  for N vs 4N executors per the driver note), print both throughputs
  and the scaling efficiency.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
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
    "dedup_clusters",
    "repeated_ngram_stats",
    "bm25_topk",
    "main_content_spans",
    "doc_fingerprint",
    "embedding_topk",
    "lsh_ann_topk",
    "ivf_ann_topk",
    "dedup_embedding_cosine",
    "merge_upsert_orders",
    "langid_confusion",
    "token_counts",
]

BENCH_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "128"))
SCALE_DOCS = int(os.environ.get("SPARK_GRAFT_SCALE_DOCS", "2048"))


def _spark(cores: int):
    from mangaextractor_spark.session import get_spark

    s = get_spark(app_name=f"bench-{cores}", cores=cores, shuffle_partitions=cores)
    s.sparkContext.setLogLevel("ERROR")
    return s


def _force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def _materialize_corpus(
    corpus_dir: str, n_docs: int, page_w: int = 420, page_h: int = 600
) -> str:
    """Generate (in parallel) and write docs+media parquet once; reused
    across JVMs so scaling runs time the pipeline, not generation.
    Each (n_docs, dims) combination gets its OWN subdirectory — a
    shared directory with per-combination markers once let a 4096-doc
    corpus silently serve a 2048-doc run. Returns the corpus path."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mangaextractor_spark.fixtures.generator import CorpusSpec, generate_corpus

    sub = Path(corpus_dir) / f"{n_docs}-{page_w}x{page_h}"
    # v2: connected-glyph font + ink-rect ordering (fixtures changed)
    marker = sub / ".complete-v2"
    if marker.exists():
        return str(sub)
    corpus = generate_corpus(
        CorpusSpec(n_docs=n_docs, seed=42, page_w=page_w, page_h=page_h),
        processes=os.cpu_count(),
    )
    sub.mkdir(parents=True, exist_ok=True)
    docs = corpus["documents"]
    docs_tbl = pa.Table.from_pylist(
        [{"doc_id": r["doc_id"], "spans": r["spans"]} for _, r in docs.iterrows()]
    )
    pq.write_table(docs_tbl, f"{sub}/documents.parquet", row_group_size=256)
    media_tbl = pa.Table.from_pandas(corpus["media"], preserve_index=False)
    # Small row groups (~12 MB of PNG bytes) so the scan splits across
    # tasks — a single-row-group file can only be read by one task,
    # which serializes everything upstream of the first shuffle. (The
    # Iceberg analog: write.target-file-size / row-group sizing.)
    pq.write_table(media_tbl, f"{sub}/media.parquet", row_group_size=100)
    marker.touch()
    return str(sub)


def _load_corpus(spark, corpus_dir: str):
    docs = spark.read.parquet(f"{corpus_dir}/documents.parquet")
    media = spark.read.parquet(f"{corpus_dir}/media.parquet")
    return docs, media


def extraction_probe(spark, corpus_dir: str, runs: int = 2, robust: bool = False) -> dict:
    """Steady-state pages/sec: run the pipeline ``runs`` times, report
    the best (JVM/codegen/Python-worker warmup excluded — a production
    job amortizes those over hours). ``robust=True`` times the full
    K4-K15 cleaning-ladder mode (the quality path for real scans);
    the default times the whiteness-CC fast path."""
    from mangaextractor_spark.pipeline.extract import extract_spans

    docs, media = _load_corpus(spark, corpus_dir)
    docs = docs.cache()
    media = media.cache()
    n_pages = media.count()
    docs.count()
    times = []
    for _ in range(runs):
        t0 = time.monotonic()
        _force(extract_spans(docs, media, robust=robust))
        times.append(time.monotonic() - t0)
    dt = min(times)
    return {
        "n_pages": n_pages,
        "sec": round(dt, 3),
        "cold_sec": round(times[0], 3),
        "pages_per_sec": round(n_pages / dt, 2),
    }


def run_default(args) -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = _spark(args.cores)
    from mangaextractor_spark.queries import REGISTRY

    # Warm the JVM/codegen paths AND the Python workers once so timings
    # reflect steady state (the first mapInPandas job otherwise pays
    # 32x python-process spawn + numpy/pandas import inside its timing).
    _force(REGISTRY["pricing_summary"].spark(spark, sf_dir))

    def _identity(batches):
        yield from batches

    _force(
        spark.range(0, 64, 1, spark.sparkContext.defaultParallelism).mapInPandas(
            _identity, "id long"
        )
    )

    # Two full passes over the set, min per query: identical plans on
    # this box swing 5-15x in bursts (JIT/GC/host noise), and the bursts
    # outlast back-to-back repeats — interleaving whole passes
    # decorrelates them. Steady state is what a long-running cluster job
    # amortizes to.
    timings: dict[str, float] = {}
    for _pass in range(2):
        for name in HEADLINE:
            df = REGISTRY[name].spark(spark, sf_dir)
            t0 = time.monotonic()
            _force(df)
            dt = round(time.monotonic() - t0, 3)
            timings[name] = min(timings.get(name, float("inf")), dt)

    corpus_root = os.environ.get("SPARK_GRAFT_CORPUS_DIR", "/tmp/spark_graft_bench_corpus")
    corpus_dir = _materialize_corpus(corpus_root, args.docs)
    probe = extraction_probe(spark, corpus_dir)
    timings["extract_pipeline"] = probe["sec"]
    probe_r = extraction_probe(spark, corpus_dir, robust=True)
    timings["extract_pipeline_robust"] = probe_r["sec"]

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
                "extract_robust_pages_per_sec": probe_r["pages_per_sec"],
                "extract_n_pages": probe["n_pages"],
                "cores": args.cores,
            }
        )
    )


def run_extract_only(args) -> None:
    corpus_dir = args.corpus
    if corpus_dir and not (Path(corpus_dir) / ".complete-v2").exists():
        # never silently benchmark a DIFFERENT corpus than the one asked for
        raise SystemExit(
            f"--corpus {corpus_dir} has no .complete-v2 marker; "
            "point at a directory materialized by this bench (or omit --corpus)"
        )
    if not corpus_dir:
        corpus_dir = _materialize_corpus(
            os.environ.get("SPARK_GRAFT_CORPUS_DIR", "/tmp/spark_graft_bench_corpus"),
            args.docs,
        )
    spark = _spark(args.cores)
    out = extraction_probe(spark, corpus_dir, robust=args.robust)
    out["cores"] = args.cores
    out["robust"] = args.robust
    print(json.dumps(out))


def run_scaling(args) -> None:
    # Realistic manga-scan page dims (~1200px tall, like the reference's
    # fixture pages): per-page kernel compute then dominates the fixed
    # JVM/Arrow costs, so the measured ratio reflects how the KERNEL
    # scales with cores, which is what the N->4N criterion is about.
    # --robust times the cleaning-ladder mode instead; it uses the
    # 420x600 corpus so the (much heavier) ladder still finishes in
    # bench-sized wall time — the Spark plan is identical either way,
    # only the per-page kernel constant changes.
    if args.robust:
        corpus_dir = _materialize_corpus(
            os.environ.get("SPARK_GRAFT_SCALE_DIR_SMALL", "/tmp/spark_graft_scale_corpus_420"),
            args.docs,
            page_w=420,
            page_h=600,
        )
    else:
        corpus_dir = _materialize_corpus(
            os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/spark_graft_scale_corpus"),
            args.docs,
            page_w=840,
            page_h=1200,
        )
    results = {}
    for cores in (args.n, args.n * 4):
        proc = subprocess.run(
            [
                sys.executable,
                __file__,
                "--extract-only",
                "--cores",
                str(cores),
                "--docs",
                str(args.docs),
                "--corpus",
                corpus_dir,
            ]
            + (["--robust"] if args.robust else []),
            capture_output=True,
            text=True,
            check=True,
        )
        results[cores] = json.loads(proc.stdout.strip().splitlines()[-1])
    lo, hi = results[args.n], results[args.n * 4]
    eff = (hi["pages_per_sec"] / lo["pages_per_sec"]) / 4.0
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency",
                "value": round(eff, 3),
                "unit": "ratio",
                "n_cores": args.n,
                "4n_cores": args.n * 4,
                "pages_per_sec_n": lo["pages_per_sec"],
                "pages_per_sec_4n": hi["pages_per_sec"],
                "n_pages": hi["n_pages"],
                "robust": args.robust,
            }
        )
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--extract-only", action="store_true")
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--docs", type=int, default=None)
    ap.add_argument("--corpus", type=str, default=None)
    # Default N=4: at N=8 the 4N=32 level schedules 32 JVM task threads
    # PLUS 32 Python workers onto the 32-core sandbox (2x oversubscribed)
    # while the N=8 level is not — an asymmetry a real cluster avoids by
    # sizing spark.executor.cores around pyspark workers. 4 vs 16 keeps
    # both levels un-oversubscribed, i.e. the same per-core conditions a
    # N- vs 4N-executor comparison would have.
    ap.add_argument("--n", type=int, default=4, help="scaling mode: small core count N")
    ap.add_argument("--robust", action="store_true", help="time the cleaning-ladder mode")
    args = ap.parse_args()

    if args.scaling:
        args.docs = args.docs or SCALE_DOCS
        run_scaling(args)
    elif args.extract_only:
        args.docs = args.docs or SCALE_DOCS
        run_extract_only(args)
    else:
        args.docs = args.docs or BENCH_DOCS
        run_default(args)


if __name__ == "__main__":
    main()
