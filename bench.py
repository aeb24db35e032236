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
- ``--mode main_content``: probe/scale the north_rule flagship
  instead — interleaved (doc_id, spans[]) main-content extraction
  (HTML boilerplate strip + per-kind dispatch, queries/main_content.py)
  over a deterministic synthetic interleaved corpus; reports docs/sec.
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
    "regional_revenue",
    "range_selfjoin",
    "window_first_orders",
    "running_value_per_user",
    "events_sliding_1h",
    "events_hourly",
    "funnel_steps",
    "retention_cohorts",
    "dedup_exact",
    "join_skew_report",
    "event_overlap_pairs",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "minhash_join",
    "near_dup_bloom_gate",
    "jaccard_prefix_join",
    "image_dhash_pairs",
    "cross_snapshot_containment",
    "simhash",
    "simhash_hamming_pairs",
    "dedup_clusters",
    "dedup_ladder_funnel",
    "near_dup_pagerank",
    "repeated_ngram_stats",
    "repeated_ngram_scrub",
    "bigram_lm_quality",
    "bloom_decontamination",
    "per_source_cap",
    "event_rate_anomaly",
    "lang_top_tokens",
    "zorder_layout",
    "file_skipping_stats",
    "compaction_plan",
    "dq_audit",
    "temperature_sampling_weights",
    "range_partition_stats",
    "bpe_pair_counts",
    "feature_hash_vectors",
    "bm25_topk",
    "main_content_spans",
    "caption_candidates",
    "mm_token_costs",
    "multimodal_packing",
    "mm_seq_manifest",
    "resolution_bucketing",
    "mm_epoch_mixture",
    "html_table_extract",
    "html_link_graph",
    "host_rank",
    "robots_gate",
    "snapshot_drift",
    "extracted_dedup_groups",
    "chunk_spans",
    "sequence_packing",
    "shard_plan",
    "source_quality_rollup",
    "token_rarity_quality",
    "quality_classifier_scores",
    "vocab_coverage",
    "doc_fingerprint",
    "hll_distinct_tokens",
    "cm_heavy_hitters",
    "embedding_topk",
    "hard_negatives",
    "lsh_ann_topk",
    "ivf_ann_topk",
    "pq_codes",
    "ivf_pq_ann_topk",
    "dedup_embedding_cosine",
    "kmeans_assign",
    "kmeans_fit",
    "cluster_balanced_sample",
    "semantic_dedup",
    "rrf_fusion",
    "incremental_dedup",
    "length_quantiles",
    "merge_upsert_orders",
    "large_volume_customers",
    "parts_supplier_counts",
    "dominant_supplier_share",
    "prospective_customers",
    "min_cost_part_supplier",
    "order_priority_late_check",
    "important_parts_value",
    "customer_order_distribution",
    "top_revenue_supplier",
    "small_quantity_revenue",
    "sole_late_suppliers",
    "forecast_revenue_change",
    "nation_volume_shipping",
    "market_share",
    "nation_profit_rollup",
    "shipmode_priority_counts",
    "promo_revenue_share",
    "disjunctive_discount_revenue",
    "exact_substring_spans",
    "token_pmi_pairs",
    "semantic_decontamination",
    "source_overlap_matrix",
    "bpe_fit",
    "bpe_encode_stats",
    "epoch_mixture_plan",
    "webdataset_ingest",
    "webdataset_samples",
    "webdataset_emit",
    "ann_recall_eval",
    "priority_sample",
    "scd2_type_history",
    "langid_confusion",
    "token_counts",
    "unicode_normalization_stats",
    "normalization_rollup",
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


def _materialize_interleaved_corpus(corpus_dir: str, n_docs: int) -> str:
    """Deterministic interleaved (doc_id, spans[]) corpus for the
    main-content probe — the north_rule input shape at bench scale.

    Eight spans per doc in a deterministically permuted array order
    (array_sort must really sort): three HTML spans wrapping generated
    word text in nav/style/footer boilerplate, two plain text spans,
    two image spans (media_ref only), and one pure-boilerplate HTML
    span that must extract to '' and be dropped. ~2.5 KB of span text
    per doc. Seeded numpy generation, no external data.
    """
    import multiprocessing as mp

    import pyarrow as pa
    import pyarrow.parquet as pq

    sub = Path(corpus_dir) / f"mc-{n_docs}"
    marker = sub / ".complete-v2"
    if marker.exists():
        return str(sub)
    # deterministic per fixed-size chunk (chunk i seeds RandomState
    # 42+i), so the corpus is identical regardless of worker count
    chunks = list(range(0, n_docs, _MC_CHUNK))
    with mp.Pool(min(len(chunks), os.cpu_count() or 8)) as pool:
        tables = pool.starmap(
            _mc_chunk_table, [(start, min(_MC_CHUNK, n_docs - start)) for start in chunks]
        )
    tbl = pa.concat_tables(tables)
    sub.mkdir(parents=True, exist_ok=True)
    # enough row groups that a 32-task scan splits the file
    pq.write_table(tbl, f"{sub}/interleaved.parquet", row_group_size=max(256, n_docs // 256))
    marker.touch()
    return str(sub)


_MC_CHUNK = 25_000


def _mc_chunk_table(start: int, count: int):
    import numpy as np
    import pyarrow as pa

    rng = np.random.RandomState(42 + start // _MC_CHUNK)
    vocab = np.array([f"w{i:03d}" for i in range(929)])
    # words per doc: 3 html bodies x 80 + 2 text spans x 60 = 360
    w = vocab[rng.randint(0, len(vocab), size=(count, 360))]
    rows = []
    for j in range(count):
        d = start + j
        ws = w[j]
        body = [" ".join(ws[i * 80 : (i + 1) * 80].tolist()) for i in range(3)]
        txt = [" ".join(ws[240 + i * 60 : 240 + (i + 1) * 60].tolist()) for i in range(2)]
        spans = [
            {
                "kind": "html",
                "text": (
                    '<html><head><title>t</title><style>.x{color:red}</style></head>'
                    '<body><nav id="menu">HOME | ABOUT | NAVJUNK</nav><article><p>'
                    + body[i]
                    + "</p></article><footer>(c) FOOTERJUNK</footer></body></html>"
                ),
                "media_ref": "",
                "offset": i * 40,
            }
            for i in range(3)
        ]
        spans += [
            {"kind": "text", "text": txt[i], "media_ref": "", "offset": 120 + i * 40}
            for i in range(2)
        ]
        spans += [
            {"kind": "image", "text": "", "media_ref": f"img/{d}/{i}", "offset": 200 + i * 40}
            for i in range(2)
        ]
        spans.append(
            {"kind": "html", "text": "<nav>ONLY JUNK</nav>", "media_ref": "", "offset": 280}
        )
        # deterministic permutation so order must be recomputed from offset
        perm = [(d + 3 * i) % 8 for i in range(8)]
        rows.append({"doc_id": str(d), "spans": [spans[p] for p in perm]})
    return pa.Table.from_pylist(rows)


def main_content_probe(spark, corpus_dir: str, runs: int = 6) -> dict:
    """Steady-state docs/sec for the interleaved main-content pipeline
    (map-side array ops + explode; zero exchanges).

    Best of ``runs``: this host's documented steal bursts last tens of
    seconds and can slow an identical run 10-40x; per-run cost here is
    a few seconds, so six repeats straddle a burst where the image
    probes' two repeats (tens of seconds each) cannot."""
    from mangaextractor_spark.queries.main_content import main_content_spans_df

    docs = spark.read.parquet(f"{corpus_dir}/interleaved.parquet").cache()
    n_docs = docs.count()
    times = []
    for _ in range(runs):
        t0 = time.monotonic()
        _force(main_content_spans_df(docs))
        times.append(time.monotonic() - t0)
    dt = min(times)
    return {
        "n_docs": n_docs,
        "sec": round(dt, 3),
        "cold_sec": round(times[0], 3),
        "docs_per_sec": round(n_docs / dt, 2),
    }


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
            # time the BUILDER too: iterative operators (dedup_clusters,
            # kmeans_fit, near_dup_pagerank) run eager localCheckpoint
            # rounds inside it — timing only the final action would hide
            # almost all of their work (near_dup_pagerank read 0.04 s
            # while its LSH-pair subtree ran off the clock)
            t0 = time.monotonic()
            df = REGISTRY[name].spark(spark, sf_dir)
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
    if args.mode == "main_content":
        corpus_dir = args.corpus or _materialize_interleaved_corpus(
            os.environ.get("SPARK_GRAFT_MC_DIR", "/tmp/spark_graft_mc_corpus"), args.docs
        )
        spark = _spark(args.cores)
        out = main_content_probe(spark, corpus_dir)
        out["cores"] = args.cores
        out["mode"] = "main_content"
        print(json.dumps(out))
        return
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
    if args.mode == "main_content":
        corpus_dir = _materialize_interleaved_corpus(
            os.environ.get("SPARK_GRAFT_MC_DIR", "/tmp/spark_graft_mc_corpus"), args.docs
        )
    elif args.robust and not args.big_pages:
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
                "--mode",
                args.mode,
            ]
            + (["--robust"] if args.robust else []),
            capture_output=True,
            text=True,
            check=True,
        )
        results[cores] = json.loads(proc.stdout.strip().splitlines()[-1])
    lo, hi = results[args.n], results[args.n * 4]
    rate_key = "docs_per_sec" if args.mode == "main_content" else "pages_per_sec"
    eff = (hi[rate_key] / lo[rate_key]) / 4.0
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency",
                "value": round(eff, 3),
                "unit": "ratio",
                "mode": args.mode,
                "n_cores": args.n,
                "4n_cores": args.n * 4,
                f"{rate_key}_n": lo[rate_key],
                f"{rate_key}_4n": hi[rate_key],
                "n_items": hi.get("n_pages", hi.get("n_docs")),
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
    ap.add_argument(
        "--big-pages",
        action="store_true",
        help="with --robust --scaling: use the realistic 840x1200 scan corpus "
        "instead of the bench-sized 420x600 one (longer wall time, same plan)",
    )
    ap.add_argument(
        "--mode",
        choices=["extract", "main_content"],
        default="extract",
        help="which pipeline the probe/scaling run times",
    )
    args = ap.parse_args()

    if args.mode == "main_content" and args.docs is None:
        # String work per doc is ~1000x cheaper than an image page, so
        # the corpus must be large enough that per-core work dominates
        # the ~1 s fixed per-job cost (measured: at 200k docs the
        # 16-core run is 2.4 s and fixed overhead caps efficiency at
        # ~0.69; at 800k the run is ~7 s and the overhead amortizes).
        default = "800000" if args.scaling else "200000"
        args.docs = int(os.environ.get("SPARK_GRAFT_MC_DOCS", default))
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
