#!/usr/bin/env python
"""Spark-FREE scaling control for the robust cleaning ladder.

Runs the exact per-page kernel (decode + segment_text_regions) over a
bench corpus with a multiprocessing Pool of N and 4N workers — no JVM,
no Arrow, no scheduler. If this control scales like the Spark job, the
Spark plan is not the bottleneck; the residue is host memory bandwidth
shared by all cores (a single-box artifact an N -> 4N EXECUTOR
scale-out does not have, since each node brings its own memory
controllers).

Usage: python scripts/robust_scaling_control.py [--n 4] [--corpus DIR]
Prints one JSON line with pages/s at both levels + the efficiency.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from multiprocessing import Pool
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _work(blob: bytes) -> int:
    from mangaextractor_spark.kernels.image_ops import extract_page_regions
    from mangaextractor_spark.sources.decode import decode_gray_image

    return len(extract_page_regions(decode_gray_image(blob), robust=True))


def run(blobs: list[bytes], procs: int) -> float:
    with Pool(procs) as pool:
        pool.map(_work, blobs[:64], chunksize=8)  # warm imports
        t0 = time.monotonic()
        pool.map(_work, blobs, chunksize=16)
        dt = time.monotonic() - t0
    return len(blobs) / dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument(
        "--corpus", default="/tmp/spark_graft_scale_corpus_420/2048-420x600"
    )
    args = ap.parse_args()
    import pyarrow.parquet as pq

    media = pq.read_table(f"{args.corpus}/media.parquet", columns=["image_bytes"])
    blobs = [b.as_py() for b in media["image_bytes"]]
    lo = run(blobs, args.n)
    hi = run(blobs, args.n * 4)
    print(
        json.dumps(
            {
                "metric": "robust_kernel_control_efficiency",
                "value": round((hi / lo) / 4.0, 3),
                "pages_per_sec_n": round(lo, 1),
                "pages_per_sec_4n": round(hi, 1),
                "n_procs": args.n,
                "n_pages": len(blobs),
            }
        )
    )


if __name__ == "__main__":
    main()
