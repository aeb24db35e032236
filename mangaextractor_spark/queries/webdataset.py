"""WebDataset tar-shard ingestion queries (oracle-checked).

Both engines see the SAME samples through independent paths: the Spark
side lists the fixture shards with ``binaryFile`` and walks each tar
with the from-scratch ustar parser (sources/tar.py, one shard = one
task); the DuckDB oracle reads ``manifest.parquet``, which
fixtures/shared.py:tar_fixture_dir computed from the source payloads
BEFORE tar-ing. A hash match therefore proves the whole chain:
shard listing, ustar header walk (names, sizes, checksums, block
arithmetic), payload extraction (md5 over every byte), and the
WebDataset sample grouping rule.

Reference analogue: the reference ingests loose page-image FILES from
a directory walk (core/processor.py:256-299 — sources/binary_files.py
is that operator); tar shards are what the same corpus looks like
after training-scale packaging (shard_plan emits the manifest that
assigns docs to these shards).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..fixtures.shared import tar_fixture_dir
from ..sources.tar import component_ext, read_tar_members, sample_key
from . import register
from ._portable import phash60, phash60_sql

_TAR_DIR = tar_fixture_dir()
_MANIFEST = os.path.join(_TAR_DIR, "manifest.parquet")

_INGEST_SQL = f"""
SELECT shard, member, n_bytes, md5hex
FROM read_parquet('{_MANIFEST}')
ORDER BY shard, member
"""


@register(
    "webdataset_ingest",
    _INGEST_SQL,
    doc="Tar-shard member inventory: one row per regular member of "
    "every shard, with exact payload size and md5. The Spark side is "
    "the REAL parse (binaryFile shard listing -> Arrow-batched ustar "
    "walk, checksums verified); the oracle is the pre-tar manifest, "
    "so equality proves the parser byte-for-byte. Scale: one shard = "
    "one task = one sequential read (the WebDataset contract); no "
    "shuffle at all — the ORDER BY is presentation-only.",
    tags=("source", "multimodal"),
)
def webdataset_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_tar_members(spark, _TAR_DIR).orderBy("shard", "member")


_SAMPLES_SQL = f"""
SELECT shard,
       SPLIT_PART(member, '.', 1) AS sample,
       CAST(COUNT(*) AS BIGINT) AS n_components,
       STRING_AGG(REGEXP_REPLACE(member, '^[^.]*\\.', ''), ',' ORDER BY member)
         AS components,
       CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
       BIT_XOR({phash60_sql("member || ':' || md5hex")}) AS content_sig
FROM read_parquet('{_MANIFEST}')
GROUP BY 1, 2
ORDER BY shard, sample
"""


@register(
    "webdataset_samples",
    _SAMPLES_SQL,
    doc="WebDataset sample assembly: members grouped by (shard, key "
    "before the first dot) — webdataset's own grouping rule — with "
    "component list, total bytes, and an order-insensitive XOR "
    "content signature over (member, md5) so a trainer can verify a "
    "sample arrived whole. Scale: every member of a sample lives in "
    "ONE shard (= one task) by construction, so partial aggregation "
    "completes map-side and the exchange carries only finished group "
    "rows — one per sample, never the members.",
    tags=("source", "multimodal", "agg"),
)
def webdataset_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = read_tar_members(spark, _TAR_DIR)
    return (
        m.groupBy("shard", sample_key(F.col("member")).alias("sample"))
        .agg(
            F.count(F.lit(1)).alias("n_components"),
            F.array_join(
                F.sort_array(F.collect_list(component_ext(F.col("member")))), ","
            ).alias("components"),
            F.sum("n_bytes").alias("total_bytes"),
            F.bit_xor(phash60(F.concat("member", F.lit(":"), "md5hex"))).alias(
                "content_sig"
            ),
        )
        .orderBy("shard", "sample")
    )


# -- the emit side: write shards, prove them by re-parse ----------------------

_EMIT_SQL = f"""
SELECT {phash60_sql("'shard:' || CAST(doc_id AS VARCHAR)")} % 16 AS shard,
       LPAD(CAST(doc_id AS VARCHAR), 12, '0') || '.txt' AS member,
       CAST(strlen(text) AS BIGINT) AS n_bytes,
       md5(text) AS md5hex
FROM documents
ORDER BY shard, member
"""


@register(
    "webdataset_emit",
    _EMIT_SQL,
    doc="Training-shard EMIT, proven by round trip: documents are "
    "assigned to shards with shard_plan's exact salted-hash rule, each "
    "shard group is packed into a real ustar archive by the "
    "from-scratch WRITER (sources/tar.py:build_ustar — deterministic "
    "bytes, stdlib-readable by test), and the emitted inventory is "
    "what the from-scratch PARSER reads BACK out of those archive "
    "bytes. The oracle computes the same inventory from the documents "
    "table directly, so a hash match proves writer and parser agree "
    "byte-for-byte on every payload through a full encode/decode "
    "cycle. Scale: one shuffle on the shard key (the write's natural "
    "partitioning — exactly what a production emit pays), then each "
    "shard builds map-side in its own applyInPandas group; shard "
    "count is the declared knob (shard_plan.N_SHARDS), so group size "
    "is corpus/N_SHARDS by construction.",
    tags=("source", "pipeline", "training"),
)
def webdataset_emit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..session import load_table
    from ..sources.tar import build_ustar, parse_ustar
    from .corpus_prep import shard_col

    def kern(pdf):
        import hashlib

        import pandas as pd

        members = sorted(
            (f"{int(i):012d}.txt", t.encode("utf-8"))
            for i, t in zip(pdf["doc_id"], pdf["text"])
        )
        blob = build_ustar(members)
        shard = int(pdf["shard"].iloc[0])
        return pd.DataFrame(
            [
                (shard, name, len(payload), hashlib.md5(payload).hexdigest())
                for name, payload in parse_ustar(blob)
            ],
            columns=["shard", "member", "n_bytes", "md5hex"],
        )

    d = load_table(spark, sf_dir, "documents").select(
        shard_col().alias("shard"), "doc_id", "text"
    )
    return (
        d.groupBy("shard")
        .applyInPandas(kern, "shard long, member string, n_bytes long, md5hex string")
        .orderBy("shard", "member")
    )
