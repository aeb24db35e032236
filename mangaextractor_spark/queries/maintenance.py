"""Table-maintenance and corpus-governance operators: the small-file
compaction planner (the Iceberg ``rewrite_data_files`` bin-packing
decision computed as data), a column-level data-quality audit (the
pre-ingest profiling pass every 100 TB pipeline runs before trusting a
new crawl snapshot), and temperature-based multilingual sampling
weights (the mT5/XLM-R ``p_l ∝ n_l^alpha`` rebalance computed with one
double sqrt per language and integer arithmetic after it).

These complete the storage-layout trio started in ``scale_ops``
(``zorder_layout`` chooses the sort order, ``file_skipping_stats``
measures the pruning it buys, ``compaction_plan`` decides which
physical files to rewrite) and the sampling pair in ``curation``
(``stratified_sample`` applies fixed per-language rates;
``temperature_sampling_weights`` derives principled rates from corpus
counts).

Determinism rules as everywhere (queries/__init__.py): sums of exact
integers, one double operation where a double is unavoidable (sqrt is
IEEE-754 correctly rounded in both the JVM and DuckDB, so
floor(sqrt(x) * 1e6) is bit-identical across engines), integer floor
division for every ratio.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..session import load_table
from . import register
from ._portable import WORDS_SQL, phash60, phash60_sql, words_col

# -- compaction planner --------------------------------------------------

# Simulated write granularity: each (source, bucket) cell is one
# physical file of the ingested corpus. 8 buckets/source keeps the
# sf0.01 manifest small enough to eyeball while still producing
# multi-file bins.
COMPACT_BUCKETS = 8
# Target rewritten-file size. Real deployments use 128-512 MB; the
# synthetic corpus's per-file byte counts are ~1 KB at sf0.01, so the
# constant is scaled to produce 2-4 files per bin there (the DECISION
# SHAPE is what's under test; the constant is a knob).
TARGET_BYTES = 2048

_COMPACT_SQL = f"""
WITH manifest AS (
  SELECT source,
         {phash60_sql("CAST(doc_id AS VARCHAR)")} % {COMPACT_BUCKETS} AS file_id,
         CAST(SUM(n_chars) AS BIGINT) AS bytes,
         COUNT(*) AS n_rows
  FROM documents GROUP BY 1, 2
),
packed AS (
  SELECT source, file_id, bytes, n_rows,
         (CAST(SUM(bytes) OVER (
             PARTITION BY source ORDER BY file_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
          ) AS BIGINT) - bytes) // {TARGET_BYTES} AS bin_id
  FROM manifest
)
SELECT source, bin_id,
       COUNT(*) AS n_files,
       CAST(SUM(bytes) AS BIGINT) AS bin_bytes,
       CAST(SUM(n_rows) AS BIGINT) AS bin_rows,
       MIN(file_id) AS file_lo, MAX(file_id) AS file_hi
FROM packed
GROUP BY source, bin_id
ORDER BY source, bin_id
"""


@register(
    "compaction_plan",
    _COMPACT_SQL,
    doc="Small-file compaction planner — the Iceberg "
    "`rewrite_data_files` / Delta OPTIMIZE bin-packing decision "
    "computed as data: derive the per-file manifest (source, file_id, "
    "bytes, rows) from the corpus, then pack files in manifest order "
    "into rewrite bins by start-offset binning (bin = running-bytes-"
    f"before-this-file DIV {TARGET_BYTES}), the streaming one-pass "
    "approximation of first-fit that every table-format compactor "
    "uses because it needs no backtracking. Output is the rewrite "
    "plan: one row per (source, bin) with file span and byte totals. "
    "Scale shape: the manifest build is one corpus scan into a "
    "map-side-combined groupBy; EVERYTHING downstream — including the "
    "running-sum window — rides the manifest, which is file-count-"
    "sized (thousands of rows per source at 10^12 docs, the same data "
    "a real compactor reads from Iceberg metadata, never the corpus), "
    "so the window partition is bounded by files-per-source and the "
    "corpus-sized-window hazard of queries/_scale_notes.py does not "
    "apply. Reference parity: the restructure tool "
    "(/root/reference/src/GerenciarArquivos.py) plans physical file "
    "moves from a directory manifest the same way.",
    tags=("layout", "storage"),
)
def compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    manifest = (
        d.select(
            "source",
            F.pmod(
                phash60(F.col("doc_id").cast("string")), F.lit(COMPACT_BUCKETS)
            ).alias("file_id"),
            "n_chars",
        )
        .groupBy("source", "file_id")
        .agg(
            F.sum("n_chars").cast("long").alias("bytes"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
    w = (
        Window.partitionBy("source")
        .orderBy("file_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = manifest.select(
        "source",
        "file_id",
        "n_rows",
        "bytes",
        F.expr(
            f"(CAST(sum(bytes) OVER (PARTITION BY source ORDER BY file_id "
            f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) "
            f"- bytes) DIV {TARGET_BYTES}"
        ).alias("bin_id"),
    )
    _ = w  # window spelled in SQL above for exact parity with the oracle
    return (
        packed.groupBy("source", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("bytes").cast("long").alias("bin_bytes"),
            F.sum("n_rows").cast("long").alias("bin_rows"),
            F.min("file_id").alias("file_lo"),
            F.max("file_id").alias("file_hi"),
        )
        .orderBy("source", "bin_id")
    )


# -- data-quality audit ----------------------------------------------------

# Per column: a min/max template rendered around the NATIVE aggregate
# (so numeric order is numeric, not lexicographic) through an
# engine-stable string format. o_totalprice is profiled in exact cents
# (ROUND(x*100) — both engines round the same double away from zero);
# o_orderdate through an explicit format string.
_DQ_COLS_SPARK = {
    "o_orderkey": "CAST({m}(o_orderkey) AS STRING)",
    "o_custkey": "CAST({m}(o_custkey) AS STRING)",
    "o_orderstatus": "{m}(o_orderstatus)",
    "o_totalprice": "CAST({m}(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS STRING)",
    "o_orderdate": "DATE_FORMAT({m}(o_orderdate), 'yyyy-MM-dd HH:mm:ss')",
    "o_orderpriority": "{m}(o_orderpriority)",
}
_DQ_COLS_DUCK = {
    "o_orderkey": "CAST({m}(o_orderkey) AS VARCHAR)",
    "o_custkey": "CAST({m}(o_custkey) AS VARCHAR)",
    "o_orderstatus": "{m}(o_orderstatus)",
    "o_totalprice": "CAST({m}(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS VARCHAR)",
    "o_orderdate": "STRFTIME({m}(o_orderdate), '%Y-%m-%d %H:%M:%S')",
    "o_orderpriority": "{m}(o_orderpriority)",
}


def _dq_basic_exprs(cols: dict[str, str]) -> list[str]:
    parts = []
    for i, (c, tpl) in enumerate(sorted(cols.items())):
        parts += [
            f"CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS nn{i}",
            f"{tpl.format(m='MIN')} AS mn{i}",
            f"{tpl.format(m='MAX')} AS mx{i}",
        ]
    return parts


def _dq_distinct_exprs(cols: dict[str, str]) -> list[str]:
    return [
        f"CAST(COUNT(DISTINCT {c}) AS BIGINT) AS nd{i}"
        for i, c in enumerate(sorted(cols))
    ]


_DQ_SQL = f"""
WITH a AS (
  SELECT * FROM
    (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
            {", ".join(_dq_basic_exprs(_DQ_COLS_DUCK))} FROM orders)
    CROSS JOIN
    (SELECT {", ".join(_dq_distinct_exprs(_DQ_COLS_DUCK))} FROM orders)
)
SELECT * FROM (
  {" UNION ALL ".join(
      f"SELECT '{c}' AS column_name, n_rows, nn{i} AS n_nulls, nd{i} AS n_distinct, "
      f"mn{i} AS min_value, mx{i} AS max_value FROM a"
      for i, c in enumerate(sorted(_DQ_COLS_DUCK))
  )}
) ORDER BY column_name
"""


@register(
    "dq_audit",
    _DQ_SQL,
    doc="Column-level data-quality audit of the orders table — the "
    "profiling pass a pipeline runs on every new snapshot before "
    "trusting it downstream (Deequ/Great-Expectations shape): per "
    "column, row count, null count, exact distinct count, and min/max "
    "rendered through engine-stable formats (doubles as exact cents, "
    "timestamps through an explicit format string). Scale shape: TWO "
    "deliberate scans. Nulls and min/max are plain partial-aggregating "
    "functions in one codegen HashAggregate pass; the six exact "
    "COUNT(DISTINCT) columns share a SECOND Expand-based aggregate "
    "(Spark's multi-distinct rewrite: expanded 6x map-side, each "
    "distinct stream partially aggregated before its shuffle). Fusing "
    "the two into one statement measured 2.7x SLOWER (3.2 s vs 1.2 s "
    "at sf0.1): mixing multi-distinct groups with string-buffered "
    "min/max forces the whole job onto a first()-wrapped row-based "
    "SortAggregate, so the split is the faster plan at every scale "
    "despite the extra scan — the two 1-row results meet in a free "
    "cross join (and approx_count_distinct would fold everything back "
    "into one pass when 2% error is acceptable; hll_distinct_tokens "
    "is this repo's mergeable-sketch variant). The wide one-row "
    "aggregate is melted to long form with stack() — a row-generating "
    "expression, zero extra exchanges above the aggregates "
    "(plan-asserted in tests).",
    tags=("quality", "storage"),
)
def dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    basic = o.selectExpr(
        "CAST(COUNT(*) AS BIGINT) AS n_rows",
        *_dq_basic_exprs(_DQ_COLS_SPARK),
    )
    distinct = o.selectExpr(*_dq_distinct_exprs(_DQ_COLS_SPARK))
    agg = basic.crossJoin(F.broadcast(distinct))
    names = sorted(_DQ_COLS_SPARK)
    stack = ", ".join(
        f"'{c}', nn{i}, nd{i}, mn{i}, mx{i}" for i, c in enumerate(names)
    )
    return agg.selectExpr(
        "n_rows",
        f"stack({len(names)}, {stack}) AS "
        "(column_name, n_nulls, n_distinct, min_value, max_value)",
    ).select(
        "column_name", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value"
    ).orderBy("column_name")


# -- temperature sampling weights -------------------------------------------

# alpha = 0.5: w_l = n_l^0.5, the mT5 temperature-sampling midpoint
# between proportional (alpha=1) and uniform (alpha=0). The only double
# op is sqrt (correctly rounded per IEEE-754 in both engines); the
# fixed-point scale makes everything after it exact integers.
TEMP_SCALE = 1_000_000
SAMPLE_BUDGET = 100_000

_TEMP_SQL = f"""
WITH c AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang),
w AS (
  SELECT lang, n_docs,
         CAST(FLOOR(SQRT(CAST(n_docs AS DOUBLE)) * {TEMP_SCALE}) AS BIGINT) AS w_e6
  FROM c
),
t AS (SELECT CAST(SUM(w_e6) AS BIGINT) AS tot FROM w)
SELECT w.lang, w.n_docs, w.w_e6,
       ({TEMP_SCALE} * w.w_e6) // t.tot AS share_e6,
       ({SAMPLE_BUDGET} * w.w_e6) // t.tot AS expected_docs
FROM w CROSS JOIN t
ORDER BY w.lang
"""


@register(
    "temperature_sampling_weights",
    _TEMP_SQL,
    doc="Temperature-based multilingual sampling weights (mT5/XLM-R "
    "p_l ∝ n_l^alpha with alpha=0.5): per language, the corpus count, "
    "the fixed-point weight floor(sqrt(n)*1e6), its share of the "
    "weight total, and the expected document allocation for a "
    f"{SAMPLE_BUDGET}-doc budget — the principled up-weighting of tail "
    "languages that stratified_sample applies as fixed rates. sqrt is "
    "the single double operation (IEEE correctly rounded, so "
    "bit-identical between the JVM and DuckDB); shares and "
    "allocations are integer floor divisions of exact BIGINTs, so the "
    "output is order- and engine-independent. Scale shape: one "
    "map-side-combined groupBy over the corpus; everything after "
    "rides the |languages|-row weight table (a cross join against a "
    "ONE-row total — broadcast, zero shuffle).",
    tags=("text", "pipeline"),
)
def temperature_sampling_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    w = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs")).select(
        "lang",
        "n_docs",
        F.floor(F.sqrt(F.col("n_docs").cast("double")) * TEMP_SCALE)
        .cast("long")
        .alias("w_e6"),
    )
    tot = w.agg(F.sum("w_e6").cast("long").alias("tot"))
    return (
        w.crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "n_docs",
            "w_e6",
            F.expr(f"({TEMP_SCALE} * w_e6) DIV tot").alias("share_e6"),
            F.expr(f"({SAMPLE_BUDGET} * w_e6) DIV tot").alias("expected_docs"),
        )
        .orderBy("lang")
    )


# -- cross-snapshot drift report ---------------------------------------------

# The "previous snapshot" is the deterministic 80% hash slice of the
# corpus (buckets 0-7 of 10): the current snapshot = base + the newest
# 20% of documents, exactly the shape of promoting a fresh crawl over
# the ingested base. Same salted-hash membership rule as
# train_val_split/stratified_sample, so the slice is recomputable per
# row with no snapshot state.
DRIFT_BUCKETS = 10
DRIFT_BASE = 8
_DRIFT_SALT = "drift-v1"

_DRIFT_SQL = f"""
WITH d AS (
  SELECT lang, n_chars,
         {phash60_sql("'" + _DRIFT_SALT + "' || CAST(doc_id AS VARCHAR)")}
           % {DRIFT_BUCKETS} AS bucket
  FROM documents
),
b AS (
  SELECT lang,
         CAST(SUM(CASE WHEN bucket < {DRIFT_BASE} THEN 1 ELSE 0 END) AS BIGINT) AS base_n,
         COUNT(*) AS cur_n,
         CAST(SUM(CASE WHEN bucket < {DRIFT_BASE} THEN n_chars ELSE 0 END) AS BIGINT) AS base_chars,
         CAST(SUM(n_chars) AS BIGINT) AS cur_chars
  FROM d GROUP BY lang
),
t AS (
  SELECT CAST(SUM(base_n) AS BIGINT) AS bt, CAST(SUM(cur_n) AS BIGINT) AS ct
  FROM b
)
SELECT b.lang, b.base_n, b.cur_n,
       (1000000 * b.base_n) // t.bt AS base_share_e6,
       (1000000 * b.cur_n) // t.ct AS cur_share_e6,
       (1000000 * b.cur_n) // t.ct - (1000000 * b.base_n) // t.bt AS share_drift_e6,
       CASE WHEN b.base_n > 0 THEN (100 * b.base_chars) // b.base_n END AS base_meanlen_e2,
       (100 * b.cur_chars) // b.cur_n AS cur_meanlen_e2
FROM b CROSS JOIN t
ORDER BY b.lang
"""


@register(
    "snapshot_drift",
    _DRIFT_SQL,
    doc="Cross-snapshot drift report — the health check run before "
    "promoting a new crawl over the ingested base corpus: per "
    "language, document counts and e6-scaled corpus shares in the "
    "base vs the current snapshot, the share drift, and e2-scaled "
    "mean lengths (a composition shift or a length-distribution shift "
    "is the first symptom of a broken extractor or a spam flood "
    "upstream; this is the population-stability view with pure "
    "integer arithmetic — no PSI logarithms to drift across engines). "
    "The base membership is a salted-hash slice recomputable per row "
    "(the train_val_split rule), so no snapshot manifest is consulted. "
    "Scale shape: ONE corpus scan into one map-side-combined "
    "conditional groupBy; the totals are a 1-row aggregate broadcast "
    "back onto the |languages|-row frame — zero joins against corpus "
    "rows, zero windows.",
    tags=("quality", "pipeline"),
)
def snapshot_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    bucket = F.pmod(
        phash60(F.concat(F.lit(_DRIFT_SALT), F.col("doc_id").cast("string"))),
        F.lit(DRIFT_BUCKETS),
    )
    is_base = bucket < DRIFT_BASE
    b = d.groupBy("lang").agg(
        F.sum(F.when(is_base, 1).otherwise(0)).cast("long").alias("base_n"),
        F.count(F.lit(1)).alias("cur_n"),
        F.sum(F.when(is_base, F.col("n_chars")).otherwise(0))
        .cast("long")
        .alias("base_chars"),
        F.sum("n_chars").cast("long").alias("cur_chars"),
    )
    t = b.agg(
        F.sum("base_n").cast("long").alias("bt"),
        F.sum("cur_n").cast("long").alias("ct"),
    )
    return (
        b.crossJoin(F.broadcast(t))
        .select(
            "lang",
            "base_n",
            "cur_n",
            F.expr("(1000000 * base_n) DIV bt").alias("base_share_e6"),
            F.expr("(1000000 * cur_n) DIV ct").alias("cur_share_e6"),
            F.expr(
                "(1000000 * cur_n) DIV ct - (1000000 * base_n) DIV bt"
            ).alias("share_drift_e6"),
            F.expr(
                "CASE WHEN base_n > 0 THEN (100 * base_chars) DIV base_n END"
            ).alias("base_meanlen_e2"),
            F.expr("(100 * cur_chars) DIV cur_n").alias("cur_meanlen_e2"),
        )
        .orderBy("lang")
    )


# -- epoch mixture plan --------------------------------------------------
#
# Data-constrained training schedule (Muennighoff et al. 2023,
# "Scaling Data-Constrained Language Models", arXiv:2305.16264): when
# the token budget exceeds what a source can supply at its mixture
# weight, the source is REPEATED for whole epochs. Given per-source
# token counts and alpha=0.5 temperature weights (the same rule as
# temperature_sampling_weights, over sources x tokens instead of
# languages x docs), compute each source's requested token allocation
# for a budget of BUDGET_EPOCHS x the whole corpus, and the number of
# whole epochs of that source needed to serve it.
BUDGET_EPOCHS = 2  # training budget = 2x total corpus tokens
_MIX_WS = WORDS_SQL.format(t="text")

_MIX_SQL = f"""
WITH c AS (
  SELECT source, CAST(SUM(len({_MIX_WS})) AS BIGINT) AS tokens_avail
  FROM documents GROUP BY source
),
w AS (
  SELECT source, tokens_avail,
         CAST(FLOOR(SQRT(CAST(tokens_avail AS DOUBLE)) * {TEMP_SCALE}) AS BIGINT) AS w_e6
  FROM c
),
t AS (
  SELECT CAST(SUM(w_e6) AS BIGINT) AS tot_w,
         CAST(SUM(tokens_avail) AS BIGINT) AS tot_toks
  FROM w
)
SELECT w.source, w.tokens_avail, w.w_e6,
       ({BUDGET_EPOCHS} * t.tot_toks * w.w_e6) // t.tot_w AS requested_tokens,
       (({BUDGET_EPOCHS} * t.tot_toks * w.w_e6) // t.tot_w + w.tokens_avail - 1)
         // w.tokens_avail AS epochs,
       CAST(({BUDGET_EPOCHS} * t.tot_toks * w.w_e6) // t.tot_w AS DOUBLE)
         / CAST(w.tokens_avail AS DOUBLE) AS repeat_factor
FROM w CROSS JOIN t
ORDER BY w.source
"""


@register(
    "epoch_mixture_plan",
    _MIX_SQL,
    doc="Data-constrained repeat schedule (Muennighoff et al. 2023): "
    "per SOURCE, the available token supply, its alpha=0.5 "
    "temperature weight floor(sqrt(tokens)*1e6), the token allocation "
    f"a {BUDGET_EPOCHS}x-corpus training budget requests from it, the "
    "whole EPOCHS of the source needed to serve that allocation "
    "(ceiling division — the repeat count a data loader materializes), "
    "and the effective repeat factor. Complements "
    "temperature_sampling_weights (which rebalances a FIXED-size "
    "sample) by answering the budget question: which sources run out "
    "and must repeat. Exactness: one corpus scan with a map-side-"
    "combined SUM of per-doc token counts; sqrt is the single double "
    "op (IEEE correctly rounded in both engines); allocation and "
    "epochs are BIGINT floor/ceiling divisions of exact operands; "
    "repeat_factor is ONE double division at the end. Scale shape: "
    "everything after the scan rides the |sources|-row weight table "
    "crossed with a ONE-row broadcast total — zero further shuffle.",
    tags=("text", "pipeline", "sampling"),
)
def epoch_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    c = d.groupBy("source").agg(
        F.sum(F.size(words_col(F.col("text")))).cast("long").alias("tokens_avail")
    )
    w = c.select(
        "source",
        "tokens_avail",
        F.floor(F.sqrt(F.col("tokens_avail").cast("double")) * TEMP_SCALE)
        .cast("long")
        .alias("w_e6"),
    ).localCheckpoint()  # |sources| rows; one corpus scan feeds both branches
    tot = w.agg(
        F.sum("w_e6").cast("long").alias("tot_w"),
        F.sum("tokens_avail").cast("long").alias("tot_toks"),
    )
    req = f"({BUDGET_EPOCHS} * tot_toks * w_e6) DIV tot_w"
    return (
        w.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "tokens_avail",
            "w_e6",
            F.expr(req).alias("requested_tokens"),
            F.expr(f"({req} + tokens_avail - 1) DIV tokens_avail").alias("epochs"),
            (
                F.expr(req).cast("double") / F.col("tokens_avail").cast("double")
            ).alias("repeat_factor"),
        )
        .orderBy("source")
    )
