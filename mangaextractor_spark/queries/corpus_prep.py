"""Training-corpus preparation operators: quality gating, interleaved
span statistics, retrieval chunking, and training-sequence packing.

These extend the LLM-data-pipeline surface (SURVEY.md §2 "beyond the
reference" block) over the same `documents` table and the north_rule
interleaved (doc_id, spans[]) shape. Every query has a DuckDB oracle;
determinism rules from queries/__init__.py apply (exact integer
arithmetic everywhere, each ratio is ONE double division of exact
ints, dense tie-broken orderings).

Scale notes (100 TB):

- ``gopher_quality_filter`` / ``chunk_spans`` / ``interleaved_stats``
  are pure map-side column/array expressions — zero exchanges, scan
  -> project -> (explode) -> sink; doc-count scaling is embarrassingly
  parallel and a monster doc costs only its own task.
- ``sequence_packing`` is the one inherently sequential op (token
  packing needs a running prefix sum), so it runs per HASH BUCKET:
  the window partitions by bucket, and the bucket count is the
  explicit parallelism knob (PACK_BUCKETS here; at 100 TB you size
  buckets to ~64k docs each so a window partition is one healthy
  task's worth of rows — see queries/_scale_notes.py for why windows
  must never carry unbounded key fan-out). Packing across buckets is
  independent by construction, which is exactly how production
  sequence packing shards (pack within worker, never globally).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..session import load_table, spread
from . import register
from ._portable import WORDS_SQL, phash60, phash60_sql, words_col

# Gopher-style quality gates (Rae et al. 2021, public): word-count
# bounds, mean-word-length band, alpha-word fraction, symbol-to-word
# ratio, minimum distinct stopword hits.
MIN_WORDS, MAX_WORDS = 50, 100_000
MIN_MEAN_WLEN, MAX_MEAN_WLEN = 3.0, 10.0
MIN_ALPHA_FRAC = 0.8
MAX_SYMBOL_RATIO = 0.1
# Gopher's published threshold is 2 distinct stopword hits; the
# synthetic corpus lexicon is SQL jargon where no doc reaches 2, which
# would make the gate degenerate (constant keep=0) — 1 keeps the rule
# shape and splits the corpus ~50/50, so the oracle actually exercises
# both branches. On a real web corpus set this back to 2.
MIN_STOP_HITS = 1
STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]

# chunk_spans: retrieval-index chunking (words per chunk / stride).
CHUNK_WORDS, CHUNK_STRIDE = 64, 48

# sequence_packing: target training-sequence length in tokens, and the
# bucket-parallelism knob (each bucket packs independently).
SEQ_LEN = 256
PACK_BUCKETS = 8


_GOPHER_SQL = f"""
WITH w AS (
  SELECT doc_id, text, {WORDS_SQL.format(t="text")} AS ws FROM documents
),
m AS (
  SELECT doc_id,
         len(ws) AS n_words,
         list_sum(list_transform(ws, x -> length(x))) AS total_chars,
         len(list_filter(ws, x -> regexp_matches(x, '[a-z]'))) AS n_alpha_words,
         len(list_filter({STOPWORDS!r}, s -> list_contains(ws, s))) AS stop_hits,
         (length(text) - length(replace(text, '#', '')))
           + (length(text) - length(replace(text, '...', ''))) // 3 AS n_symbols
  FROM w
)
SELECT doc_id, n_words,
       CASE WHEN n_words > 0 THEN CAST(total_chars AS DOUBLE) / n_words END
         AS mean_word_len,
       CASE WHEN n_words > 0 THEN CAST(n_alpha_words AS DOUBLE) / n_words END
         AS alpha_frac,
       CASE WHEN n_words > 0 THEN CAST(n_symbols AS DOUBLE) / n_words END
         AS symbol_ratio,
       stop_hits,
       CAST(CASE WHEN n_words BETWEEN {MIN_WORDS} AND {MAX_WORDS}
                  AND CAST(total_chars AS DOUBLE) / n_words >= {MIN_MEAN_WLEN}
                  AND CAST(total_chars AS DOUBLE) / n_words <= {MAX_MEAN_WLEN}
                  AND CAST(n_alpha_words AS DOUBLE) / n_words >= {MIN_ALPHA_FRAC}
                  AND CAST(n_symbols AS DOUBLE) / n_words <= {MAX_SYMBOL_RATIO}
                  AND stop_hits >= {MIN_STOP_HITS}
             THEN 1 ELSE 0 END AS INT) AS keep
FROM m
ORDER BY doc_id
"""


@register(
    "gopher_quality_filter",
    _GOPHER_SQL,
    doc="Gopher-rule quality gating (Rae et al. 2021): word-count "
    "bounds, mean-word-length band, alpha-word fraction, symbol-to-"
    "word ratio, distinct-stopword floor — all as exact-integer column "
    "expressions with one double division per ratio. Map-side only "
    "(scan -> project); at 100 TB this is the cheapest possible shape: "
    "zero exchanges, and the keep flag rides with the row for the "
    "downstream filter. Reference analog: the reference gates OCR text "
    "by character whitelists (modules/ocr.py); these are the corpus-"
    "scale equivalents a training pipeline needs.",
    tags=("curation", "quality"),
)
def gopher_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    ws = words_col(F.col("text"))
    stops = F.array(*[F.lit(s) for s in STOPWORDS])
    m = d.select(
        "doc_id",
        F.size(ws).alias("n_words"),
        F.aggregate(ws, F.lit(0).cast("long"), lambda a, x: a + F.length(x)).alias(
            "total_chars"
        ),
        F.size(F.filter(ws, lambda x: x.rlike("[a-z]"))).alias("n_alpha_words"),
        F.size(F.filter(stops, lambda s: F.array_contains(ws, s))).alias("stop_hits"),
        (
            (F.length("text") - F.length(F.regexp_replace("text", "#", "")))
            + F.floor(
                (F.length("text") - F.length(F.regexp_replace("text", r"\.\.\.", "")))
                / F.lit(3)
            )
        ).alias("n_symbols"),
    )
    nw = F.col("n_words")
    mean_wlen = F.when(nw > 0, F.col("total_chars") / nw)
    alpha_frac = F.when(nw > 0, F.col("n_alpha_words") / nw)
    symbol_ratio = F.when(nw > 0, F.col("n_symbols") / nw)
    keep = (
        nw.between(MIN_WORDS, MAX_WORDS)
        & (mean_wlen >= MIN_MEAN_WLEN)
        & (mean_wlen <= MAX_MEAN_WLEN)
        & (alpha_frac >= MIN_ALPHA_FRAC)
        & (symbol_ratio <= MAX_SYMBOL_RATIO)
        & (F.col("stop_hits") >= MIN_STOP_HITS)
    )
    return m.select(
        "doc_id",
        "n_words",
        mean_wlen.alias("mean_word_len"),
        alpha_frac.alias("alpha_frac"),
        symbol_ratio.alias("symbol_ratio"),
        "stop_hits",
        F.when(keep, 1).otherwise(0).cast("int").alias("keep"),
    ).orderBy("doc_id")


def _interleaved_stats_sql() -> str:
    from .main_content import _SPANS_SQL

    return f"""
WITH docs AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, {_SPANS_SQL} AS spans
  FROM documents
)
SELECT doc_id,
       CAST(len(spans) AS INT) AS n_spans,
       CAST(len(list_filter(spans, s -> s.kind = 'html')) AS INT) AS n_html,
       CAST(len(list_filter(spans, s -> s.kind = 'text')) AS INT) AS n_text,
       CAST(len(list_filter(spans, s -> s.kind = 'image')) AS INT) AS n_image,
       CAST(list_sum(list_transform(spans, s -> length(s.text))) AS BIGINT)
         AS total_text_chars,
       CAST(list_max(list_transform(spans, s -> s."offset")) AS INT) AS max_offset
FROM docs
ORDER BY doc_id
"""


@register(
    "interleaved_stats",
    _interleaved_stats_sql(),
    doc="Per-document span-kind statistics over the north_rule "
    "interleaved (doc_id, spans array<struct<kind,text,media_ref,"
    "offset>>) input shape: span counts by kind, total text bytes, max "
    "offset — all array aggregates computed map-side on the UNEXPLODED "
    "array cell (zero exchanges; the lineage/metrics precursor every "
    "stage of the north_rule pipeline logs per partition). Input table "
    "synthesized deterministically from `documents` exactly as "
    "main_content_spans does.",
    tags=("interleaved", "stats"),
)
def interleaved_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .main_content import interleaved_docs

    docs = interleaved_docs(spark, sf_dir)
    spans = F.col("spans")
    return docs.select(
        "doc_id",
        F.size(spans).cast("int").alias("n_spans"),
        F.size(F.filter(spans, lambda s: s["kind"] == "html")).cast("int").alias("n_html"),
        F.size(F.filter(spans, lambda s: s["kind"] == "text")).cast("int").alias("n_text"),
        F.size(F.filter(spans, lambda s: s["kind"] == "image")).cast("int").alias("n_image"),
        F.aggregate(spans, F.lit(0).cast("long"), lambda a, s: a + F.length(s["text"]))
        .cast("long")
        .alias("total_text_chars"),
        F.array_max(F.transform(spans, lambda s: s["offset"])).cast("int").alias("max_offset"),
    ).orderBy("doc_id")


_CHUNK_SQL = f"""
WITH w AS (
  SELECT doc_id, {WORDS_SQL.format(t="text")} AS ws FROM documents
),
n AS (
  SELECT doc_id, ws, len(ws) AS n_words,
         CASE WHEN len(ws) <= {CHUNK_WORDS} THEN 1
              ELSE 1 + (len(ws) - {CHUNK_WORDS} + {CHUNK_STRIDE} - 1) // {CHUNK_STRIDE}
         END AS n_chunks
  FROM w
)
SELECT doc_id,
       CAST(i - 1 AS INT) AS chunk_id,
       CAST(len(ws[(i - 1) * {CHUNK_STRIDE} + 1 :
                   (i - 1) * {CHUNK_STRIDE} + {CHUNK_WORDS}]) AS INT)
         AS n_chunk_words,
       array_to_string(ws[(i - 1) * {CHUNK_STRIDE} + 1 :
                          (i - 1) * {CHUNK_STRIDE} + {CHUNK_WORDS}], ' ')
         AS chunk_text
FROM n, UNNEST(generate_series(1, n_chunks)) AS g(i)
ORDER BY doc_id, chunk_id
"""


@register(
    "chunk_spans",
    _CHUNK_SQL,
    doc=f"Sliding-window retrieval chunking: {CHUNK_WORDS}-word chunks "
    f"at stride {CHUNK_STRIDE} (overlapping), at least one chunk per "
    "doc. Chunk starts come from a map-side sequence + slice over the "
    "token array, then ONE explode — no shuffle anywhere, so at 100 TB "
    "this is scan-bound; chunk counts are exact integers (no float "
    "ceil). This is the indexing front-end for embedding_topk / "
    "bm25_topk over long documents.",
    tags=("curation", "retrieval"),
)
def chunk_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    ws = words_col(F.col("text"))
    w = d.select("doc_id", ws.alias("ws"), F.size(ws).alias("n_words"))
    n_chunks = F.when(F.col("n_words") <= CHUNK_WORDS, F.lit(1).cast("long")).otherwise(
        1
        + F.floor(
            (F.col("n_words") - CHUNK_WORDS + CHUNK_STRIDE - 1) / F.lit(CHUNK_STRIDE)
        )
    )
    w = w.select("doc_id", "ws", n_chunks.alias("n_chunks"))
    chunk = F.explode(F.sequence(F.lit(0).cast("long"), F.col("n_chunks") - 1)).alias(
        "chunk_id"
    )
    e = w.select("doc_id", "ws", chunk)
    sliced = F.slice(
        F.col("ws"), (F.col("chunk_id") * CHUNK_STRIDE + 1).cast("int"), CHUNK_WORDS
    )
    return e.select(
        "doc_id",
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.size(sliced).cast("int").alias("n_chunk_words"),
        F.concat_ws(" ", sliced).alias("chunk_text"),
    ).orderBy("doc_id", "chunk_id")


_PACK_SQL = f"""
WITH t AS (
  SELECT doc_id,
         len({WORDS_SQL.format(t="text")}) AS n_tokens,
         {phash60_sql("CAST(doc_id AS VARCHAR)")} % {PACK_BUCKETS} AS bucket
  FROM documents
),
c AS (
  SELECT doc_id, bucket, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) - n_tokens AS start_offset
  FROM t
)
SELECT doc_id, CAST(bucket AS INT) AS bucket, CAST(n_tokens AS INT) AS n_tokens,
       CAST(start_offset AS BIGINT) AS start_offset,
       CAST(start_offset // {SEQ_LEN} AS BIGINT) AS seq_id
FROM c
ORDER BY bucket, doc_id
"""


@register(
    "sequence_packing",
    _PACK_SQL,
    doc=f"Training-sequence packing: concatenate token streams per "
    f"hash bucket and split at {SEQ_LEN}-token boundaries — each doc "
    "gets (bucket, start_offset, seq_id) via a prefix sum over its "
    "bucket. Packing is the one inherently sequential curation op, so "
    "parallelism is BY BUCKET: the window partitions on bucket and "
    f"PACK_BUCKETS ({PACK_BUCKETS} here) is the explicit scale knob — "
    "at 100 TB you size buckets to ~64k docs so each window partition "
    "is one healthy task (the window-partition pin in "
    "queries/_scale_notes.py is the unbounded-fan-out case; here the "
    "partition size is capped by construction). Integer arithmetic "
    "end to end.",
    tags=("curation", "packing"),
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    t = d.select(
        "doc_id",
        F.size(words_col(F.col("text"))).alias("n_tokens"),
        (phash60(F.col("doc_id").cast("string")) % PACK_BUCKETS).alias("bucket"),
    )
    w = Window.partitionBy("bucket").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = t.withColumn("start_offset", F.sum("n_tokens").over(w) - F.col("n_tokens"))
    return c.select(
        "doc_id",
        F.col("bucket").cast("int").alias("bucket"),
        F.col("n_tokens").cast("int").alias("n_tokens"),
        F.col("start_offset").cast("long").alias("start_offset"),
        F.floor(F.col("start_offset") / F.lit(SEQ_LEN)).cast("long").alias("seq_id"),
    ).orderBy("bucket", "doc_id")
