"""Training-corpus curation operators: decontamination, PII scrub,
stratified sampling, paragraph-level dedup.

These are the corpus-hygiene passes a large-scale training-data
pipeline runs between raw extraction and tokenization — the layer the
dedup ladder (queries/dedup.py) and quality metrics (queries/textops.py)
feed into. All four are oracle-checked: every computation is either a
pure Column expression or a groupBy with map-side combine, mirrored
verbatim in DuckDB SQL.

Scale notes (100 TB framing):

- ``decontamination_overlap`` — the eval-set n-gram collision check
  (the published GPT-3 / PaLM decontamination procedure: drop training
  docs sharing a 13-gram with an eval benchmark). The eval side is
  tiny by construction (benchmarks are thousands of docs, the corpus
  is billions), so its distinct gram set is BROADCAST and the corpus
  is scanned once; the only aggregation is per-doc overlap counting,
  map-side combined. No corpus-vs-corpus join ever happens.
- ``pii_scrub`` — pure regexp Column expressions (RE2-compatible so
  the oracle is verbatim-identical): one codegen'd scan, zero
  shuffles, zero Python.
- ``stratified_sample`` — per-language hash-bucket rates: map-side
  only, recomputable per row (no sampling state, no driver RNG), so
  a 100 TB corpus is rebalanced in one scan with zero shuffles and
  the decision for any row can be re-derived independently.
- ``paragraph_dedup`` — C4/RefinedWeb-style line-level exact dedup
  across the corpus: shuffle ONLY the (gram-hash, doc, pos) triples
  (tiny vs the text), keep the lexicographically-first occurrence,
  reassemble surviving paragraphs map-side after one equi-join back.
  First-wins is a real groupBy MIN (map-side combined, AQE-splittable
  on skew), never a window over the hash — see queries/_scale_notes.py
  for why a window would pin viral boilerplate paragraphs on one task.

Reference parity: the reference has no corpus-curation layer (it is a
per-page OCR tool); these operators are the north_rule's web-scale
"training-data pipeline" surface, built on the same documents table
and portable-hash toolkit as the dedup ladder.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_table, spread
from . import register
from ._portable import WORDS_SQL, phash60, phash60_sql, words_col

# --- decontamination ------------------------------------------------------

DECONTAM_K = 13  # the published eval-overlap gram size (GPT-3 appendix C)
_EVAL_MOD = 20  # doc_id % 20 == 0 -> the synthetic "benchmark" slice

_WS_SQL = WORDS_SQL.format(t="text")


def _gram_hashes(ws: Column, k: int) -> Column:
    """Positional token-k-gram portable hashes; empty when the doc is
    shorter than k tokens (F.sequence would otherwise count DOWN for a
    negative span and fabricate grams)."""
    grams = F.transform(
        F.sequence(F.lit(0), F.size(ws) - k),
        lambda i: phash60(F.concat_ws(" ", F.slice(ws, i + 1, k))),
    )
    return F.when(F.size(ws) >= k, grams).otherwise(F.array().cast("array<long>"))


_GRAM_SQL = (
    "list_transform(generate_series(1, len(ws) - {km1}), i -> "
    + phash60_sql("array_to_string(ws[i : i + {km1}], ' ')")
    + ")"
).format(km1=DECONTAM_K - 1)

_DECONTAM_SQL = f"""
WITH w AS (
  SELECT doc_id, {_WS_SQL} AS ws FROM documents
),
g AS (
  SELECT doc_id, {_GRAM_SQL} AS gs FROM w
),
eval_grams AS (
  SELECT DISTINCT h FROM g, UNNEST(gs) AS t(h) WHERE doc_id % {_EVAL_MOD} = 0
),
train AS (SELECT doc_id, gs FROM g WHERE doc_id % {_EVAL_MOD} <> 0),
hits AS (
  SELECT t.doc_id, COUNT(DISTINCT h) AS n_overlap
  FROM train t, UNNEST(gs) AS u(h)
  JOIN eval_grams e USING (h)
  GROUP BY t.doc_id
)
SELECT t.doc_id,
       CAST(len(gs) AS BIGINT) AS n_grams,
       CAST(COALESCE(n_overlap, 0) AS BIGINT) AS n_overlap,
       COALESCE(n_overlap, 0) > 0 AS contaminated
FROM train t LEFT JOIN hits USING (doc_id)
ORDER BY t.doc_id
"""


@register(
    "decontamination_overlap",
    _DECONTAM_SQL,
    doc=f"Eval-set decontamination (the published GPT-3/PaLM "
    f"procedure): flag training documents sharing any token "
    f"{DECONTAM_K}-gram with the benchmark slice (here the "
    f"deterministic doc_id % {_EVAL_MOD} == 0 subset stands in for the "
    "eval suite). The eval gram set is orders of magnitude smaller "
    "than the corpus, so it is collected into a BROADCAST hash set and "
    "the 100 TB training side is scanned exactly once; per-doc overlap "
    "is a distinct-count groupBy with map-side combine. Docs shorter "
    f"than {DECONTAM_K} tokens carry zero grams and can never be "
    "flagged — both engines agree by construction.",
    tags=("dedup", "text", "pipeline"),
)
def decontamination_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    g = d.select("doc_id", _gram_hashes(words_col(F.col("text")), DECONTAM_K).alias("gs"))
    eval_grams = (
        g.filter(F.col("doc_id") % _EVAL_MOD == 0)
        .select(F.explode("gs").alias("h"))
        .distinct()
    )
    train = g.filter(F.col("doc_id") % _EVAL_MOD != 0)
    hits = (
        train.select("doc_id", F.explode("gs").alias("h"))
        .join(F.broadcast(eval_grams), "h")
        .groupBy("doc_id")
        .agg(F.countDistinct("h").alias("n_overlap"))
    )
    return (
        train.select("doc_id", F.size("gs").cast("long").alias("n_grams"))
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            F.coalesce(F.col("n_overlap"), F.lit(0)).cast("long").alias("n_overlap"),
            (F.coalesce(F.col("n_overlap"), F.lit(0)) > 0).alias("contaminated"),
        )
        .orderBy("doc_id")
    )


# --- PII scrub ------------------------------------------------------------

# RE2-compatible AND Java-regex-identical patterns (no lookaround, no
# backrefs) so the oracle runs the verbatim expression.
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_IP_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
_PHONE_RE = r"\b555-[0-9]{4}\b"

# Deterministic PII planting (both engines build the identical dirty
# text): every 3rd doc gains an email, every 4th a phone, every 5th an
# IPv4 — so the fixture has docs with 0, 1, 2 and 3 PII kinds.
_DIRTY_SQL = (
    "text"
    " || CASE WHEN doc_id % 3 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now' ELSE '' END"
    " || CASE WHEN doc_id % 4 = 0 THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' today' ELSE '' END"
    " || CASE WHEN doc_id % 5 = 0 THEN ' host 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7 up' ELSE '' END"
)


def _dirty_col() -> Column:
    did = F.col("doc_id")
    return F.concat(
        F.col("text"),
        F.when(
            did % 3 == 0,
            F.concat(F.lit(" contact user"), did.cast("string"), F.lit("@example.com now")),
        ).otherwise(F.lit("")),
        F.when(
            did % 4 == 0,
            F.concat(
                F.lit(" call 555-"),
                F.lpad((did % 10000).cast("string"), 4, "0"),
                F.lit(" today"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 5 == 0,
            F.concat(F.lit(" host 10.0."), (did % 256).cast("string"), F.lit(".7 up")),
        ).otherwise(F.lit("")),
    )


_PII_SQL = f"""
WITH dirty AS (SELECT doc_id, {_DIRTY_SQL} AS t FROM documents)
SELECT doc_id,
       regexp_replace(regexp_replace(regexp_replace(t,
         '{_EMAIL_RE}', '<EMAIL>', 'g'),
         '{_IP_RE}', '<IP>', 'g'),
         '{_PHONE_RE}', '<PHONE>', 'g') AS text_scrubbed,
       CAST(len(regexp_extract_all(t, '{_EMAIL_RE}')) AS INTEGER) AS n_emails,
       CAST(len(regexp_extract_all(t, '{_IP_RE}')) AS INTEGER) AS n_ips,
       CAST(len(regexp_extract_all(t, '{_PHONE_RE}')) AS INTEGER) AS n_phones
FROM dirty ORDER BY doc_id
"""


@register(
    "pii_scrub",
    _PII_SQL,
    doc="PII redaction (emails, IPv4 addresses, phone-like numbers) "
    "with per-kind counts — the compliance pass every published web "
    "corpus applies (C4, RefinedWeb). Patterns are RE2-compatible AND "
    "Java-regex-identical (no lookaround/backrefs) so the oracle runs "
    "the verbatim expressions; email is scrubbed before IP before "
    "phone so overlapping matches resolve identically. Pure codegen'd "
    "regexp Columns: one scan, zero shuffles, zero Python — the "
    "correct 100 TB shape for a per-row rewrite.",
    tags=("text", "pipeline"),
)
def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    t = _dirty_col()
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, _EMAIL_RE, "<EMAIL>"), _IP_RE, "<IP>"
        ),
        _PHONE_RE,
        "<PHONE>",
    )
    return d.select(
        "doc_id",
        scrubbed.alias("text_scrubbed"),
        F.size(F.regexp_extract_all(t, F.lit(_EMAIL_RE), F.lit(0))).alias("n_emails"),
        F.size(F.regexp_extract_all(t, F.lit(_IP_RE), F.lit(0))).alias("n_ips"),
        F.size(F.regexp_extract_all(t, F.lit(_PHONE_RE), F.lit(0))).alias("n_phones"),
    ).orderBy("doc_id")


# --- stratified sampling --------------------------------------------------

# Per-language keep rates out of 100: downsample the head language,
# keep the tail — the standard language-rebalance before tokenization.
SAMPLE_RATES = {"en": 20}
SAMPLE_DEFAULT_RATE = 60
_SALT = "strat:"  # decorrelates the bucket from train_val_split's

_RATE_SQL = "CASE lang WHEN 'en' THEN 20 ELSE 60 END"

_STRAT_SQL = f"""
WITH b AS (
  SELECT doc_id, lang,
         {phash60_sql("'" + _SALT + "' || CAST(doc_id AS VARCHAR)")} % 100 AS bucket
  FROM documents
)
SELECT doc_id, lang FROM b
WHERE bucket < {_RATE_SQL}
ORDER BY doc_id
"""


@register(
    "stratified_sample",
    _STRAT_SQL,
    doc="Language-stratified deterministic sampling: keep 20% of the "
    "head language (en) and 60% of every tail language by salted hash "
    "bucket of the doc id — the rebalance pass between curation and "
    "tokenization. Like train_val_split, membership is a pure map-side "
    "Column expression recomputable for any row in isolation: no "
    "sampling state, no driver RNG, no shuffle — one scan at 100 TB, "
    "and re-running on a grown corpus never flips prior decisions. "
    "The salt decorrelates this bucket from the split bucket so "
    "sampling is independent of the train/val/test assignment.",
    tags=("text", "pipeline"),
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    bucket = F.pmod(
        phash60(F.concat(F.lit(_SALT), F.col("doc_id").cast("string"))), F.lit(100)
    )
    rate = F.when(F.col("lang") == "en", SAMPLE_RATES["en"]).otherwise(
        SAMPLE_DEFAULT_RATE
    )
    return d.filter(bucket < rate).select("doc_id", "lang").orderBy("doc_id")


# --- paragraph-level exact dedup ------------------------------------------

PARA_TOKENS = 10  # synthetic paragraph = 10-token chunk (docs have no \n)


def _paras_col(ws: Column) -> Column:
    n = F.ceil(F.size(ws) / F.lit(PARA_TOKENS)).cast("int")
    paras = F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: F.concat_ws(" ", F.slice(ws, i * PARA_TOKENS + 1, PARA_TOKENS)),
    )
    return F.when(F.size(ws) > 0, paras).otherwise(F.array().cast("array<string>"))


_PARAS_SQL = (
    "list_transform(generate_series(1, CAST(CEIL(len(ws) / {p}.0) AS INT)), "
    "i -> array_to_string(ws[(i - 1) * {p} + 1 : (i - 1) * {p} + {p}], ' '))"
).format(p=PARA_TOKENS)

_PARA_SQL = f"""
WITH w AS (SELECT doc_id, {_WS_SQL} AS ws FROM documents),
p AS (
  SELECT doc_id, i - 1 AS pos, paras[i] AS para,
         {phash60_sql("paras[i]")} AS h
  FROM (SELECT doc_id, {_PARAS_SQL} AS paras FROM w),
       UNNEST(generate_series(1, len(paras))) AS t(i)
),
first_seen AS (SELECT h, MIN(doc_id * 1000 + pos) AS keep_key FROM p GROUP BY h),
surv AS (
  SELECT p.doc_id, p.pos, p.para
  FROM p JOIN first_seen USING (h)
  WHERE p.doc_id * 1000 + p.pos = keep_key
),
agg AS (
  SELECT doc_id, COUNT(*) AS n_kept,
         STRING_AGG(para, ' ' ORDER BY pos) AS text_dedup
  FROM surv GROUP BY doc_id
)
SELECT w.doc_id,
       CAST(len({_PARAS_SQL}) AS INTEGER) AS n_paras,
       CAST(COALESCE(n_kept, 0) AS INTEGER) AS n_kept,
       COALESCE(text_dedup, '') AS text_dedup
FROM w LEFT JOIN agg USING (doc_id)
ORDER BY w.doc_id
"""


@register(
    "paragraph_dedup",
    _PARA_SQL,
    doc=f"C4/RefinedWeb-style paragraph-level exact dedup across the "
    f"whole corpus (paragraph = {PARA_TOKENS}-token chunk; the real "
    "corpus splits on newlines, the fixture text has none): every "
    "paragraph occurrence except the lexicographically-first (doc_id, "
    "pos) is dropped, and surviving paragraphs are reassembled in "
    "order. Only the (hash, doc, pos) triples shuffle — tiny vs the "
    "text; first-wins is groupBy MIN with map-side combine joined back "
    "on the hash (AQE-skew-splittable; a window over h would pin a "
    "viral boilerplate paragraph on one task, queries/_scale_notes.py), "
    "and reassembly is a per-doc sort_array over collected survivors.",
    tags=("dedup", "text", "pipeline"),
)
def paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    w = d.select("doc_id", words_col(F.col("text")).alias("ws"))
    paras = w.select("doc_id", _paras_col(F.col("ws")).alias("paras"))
    p = paras.select(
        "doc_id", F.posexplode("paras").alias("pos", "para")
    ).withColumn("h", phash60(F.col("para")))
    key = F.col("doc_id") * 1000 + F.col("pos")
    first_seen = p.groupBy("h").agg(F.min(key).alias("keep_key"))
    surv = p.join(first_seen, "h").filter(key == F.col("keep_key"))
    agg = surv.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "para"))),
                lambda s: s["para"],
            ),
            " ",
        ).alias("text_dedup"),
    )
    return (
        paras.select("doc_id", F.size("paras").alias("n_paras"))
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            "n_paras",
            F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
            F.coalesce(F.col("text_dedup"), F.lit("")).alias("text_dedup"),
        )
        .orderBy("doc_id")
    )


# --- per-source frequency cap ----------------------------------------------

# Max documents kept per source. The Common-Crawl-style "domain cap":
# without it a handful of template-heavy hosts dominate the corpus (the
# C4 / Gopher / RefinedWeb pipelines all apply one). 10 cuts every
# uniform 25-doc fixture source so the fixture exercises the cut.
SOURCE_CAP = 10

_CAP_SQL = f"""
WITH h AS (
  SELECT source, doc_id,
         {phash60_sql("CAST(doc_id AS VARCHAR)")} AS hkey
  FROM documents
),
r AS (
  SELECT source, doc_id, hkey,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY hkey, doc_id)
           AS cap_rank
  FROM h
)
SELECT source, doc_id, CAST(cap_rank AS BIGINT) AS cap_rank
FROM r WHERE cap_rank <= {SOURCE_CAP}
ORDER BY source, cap_rank
"""


@register(
    "per_source_cap",
    _CAP_SQL,
    doc=f"Deterministic per-source document cap (keep at most "
    f"{SOURCE_CAP} docs per source, chosen by portable 60-bit hash of "
    "doc_id with doc_id tiebreak) — the domain-frequency cap every "
    "published web-corpus pipeline applies so template farms cannot "
    "dominate the training mix. Hash selection makes the survivor set "
    "a uniform sample that is recomputable per row (no RNG state) and "
    "STABLE under corpus growth for the docs whose rank stays under "
    "the cap. Scale shape: a mega-source is a corpus-sized group, so "
    "ranking rides the bounded pre-top-k (queries/_topk.py — each task "
    "keeps <= cap rows per source) before the exact rank window over "
    "<= cap x n_partitions survivors; no corpus-sized window "
    "partition ever forms.",
    tags=("curation", "sampling", "pipeline"),
)
def per_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ._topk import topk_per_group

    d = load_table(spark, sf_dir, "documents").select(
        "source",
        "doc_id",
        phash60(F.col("doc_id").cast("string")).alias("hkey"),
    )
    pre = topk_per_group(
        d, ["source"], ["hkey", "doc_id"], [True, True], SOURCE_CAP
    )
    w = W.partitionBy("source").orderBy("hkey", "doc_id")
    return (
        pre.withColumn("cap_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("cap_rank") <= SOURCE_CAP)
        .select("source", "doc_id", "cap_rank")
        .orderBy("source", "cap_rank")
    )


# --- weighted sampling without replacement (priority sampling) -------------

PRIO_SALT = "prio:"  # decorrelates u from the stratified/split buckets
PRIO_K = 200
_U_MOD = 1 << 30  # u in [2^30, 2^31): 30 random bits, never zero
_PRIO_SCALE = 1 << 32  # w * 2^32 // u stays far inside BIGINT

_PRIO_SQL = f"""
WITH p AS (
  SELECT doc_id, lang, n_chars,
         ({phash60_sql("'" + PRIO_SALT + "' || CAST(doc_id AS VARCHAR)")}
          % {_U_MOD}) + {_U_MOD} AS u
  FROM documents
)
SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS weight,
       CAST((n_chars * {_PRIO_SCALE}) // u AS BIGINT) AS priority
FROM p
ORDER BY priority DESC, doc_id
LIMIT {PRIO_K}
"""


@register(
    "priority_sample",
    _PRIO_SQL,
    doc=f"Weighted sampling WITHOUT replacement via priority sampling "
    "(Duffield, Lund, Thorup, JACM 2007): each doc gets priority w/u "
    "with u uniform and w = n_chars, and the top-k priorities are the "
    "sample — inclusion probability is ~proportional to size, the "
    "standard 'sample tokens, not documents' mixing step. Completes "
    "the sampling family (stratified keep-rates, temperature weights, "
    "cluster-balanced): those reweight or stratify; this draws a "
    "bounded-k weighted sample in ONE pass. Determinism: u is the "
    "salted portable 60-bit hash folded into [2^30, 2^31), and the "
    f"priority is exact integer floor((w * 2^32) / u) — identical "
    "BIGINT in Spark (div) and DuckDB (//), no float anywhere, ties "
    "broken by doc_id. Scale: a pure map-side expression per row "
    "(recomputable in isolation, stable under corpus growth for "
    "unseen rows) feeding TakeOrderedAndProject — per-partition top-k "
    "then a k-row driver merge, never a global sort; w*2^32 bounds: "
    "a 2^25-char doc stays 2^57 < 2^63.",
    tags=("text", "pipeline", "sampling", "topk"),
)
def priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    u = (
        F.pmod(
            phash60(F.concat(F.lit(PRIO_SALT), F.col("doc_id").cast("string"))),
            F.lit(_U_MOD),
        )
        + F.lit(_U_MOD)
    )
    return (
        d.select(
            "doc_id",
            "lang",
            F.col("n_chars").cast("long").alias("weight"),
            u.alias("u"),
        )
        .select(
            "doc_id",
            "lang",
            "weight",
            F.expr(f"(weight * {_PRIO_SCALE}L) div u").alias("priority"),
        )
        .orderBy(F.desc("priority"), "doc_id")
        .limit(PRIO_K)
    )


# --- cross-source overlap audit --------------------------------------------

_SOURCE_OVERLAP_SQL = f"""
WITH w AS (SELECT source, {_WS_SQL} AS ws FROM documents),
sh AS (
  SELECT DISTINCT source,
         {phash60_sql("ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]")} AS h
  FROM w, UNNEST(generate_series(1, len(ws) - 2)) AS t(i)
  WHERE len(ws) >= 3
),
per AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_sh FROM sh GROUP BY 1),
pairs AS (
  SELECT a.source AS s1, b.source AS s2, CAST(COUNT(*) AS BIGINT) AS n_common
  FROM sh a JOIN sh b ON a.h = b.h AND a.source < b.source
  GROUP BY 1, 2
)
SELECT p.s1, p.s2, p.n_common, p1.n_sh AS n_s1, p2.n_sh AS n_s2,
       CAST(p.n_common AS DOUBLE) / CAST(p1.n_sh AS DOUBLE) AS containment_s1,
       CAST(p.n_common AS DOUBLE) / CAST(p2.n_sh AS DOUBLE) AS containment_s2,
       CAST(p.n_common AS DOUBLE) / CAST(p1.n_sh + p2.n_sh - p.n_common AS DOUBLE)
         AS jaccard
FROM pairs p
JOIN per p1 ON p1.source = p.s1
JOIN per p2 ON p2.source = p.s2
ORDER BY s1, s2
"""


@register(
    "source_overlap_matrix",
    _SOURCE_OVERLAP_SQL,
    doc="Cross-source contamination audit: for every source pair, the "
    "count of shared distinct word-3-gram shingles plus both "
    "directional containments and the Jaccard — the matrix a curation "
    "run reads to decide which mirror/scrape sources to collapse "
    "before document-level dedup even starts (CCNet/RefinedWeb audit "
    "their dumps exactly this way). Scale: the corpus is scanned once "
    "into DISTINCT (source, shingle-hash) pairs (map-side distinct "
    "within doc, one combine-capable shuffle); the self-join on the "
    "hash fans out at most C(S,2) rows per shingle where S is the "
    "SOURCE cardinality — the rollup dimension (20 here), not the "
    "corpus — so the join output is bounded by the matrix being "
    "built. With an unbounded domain key, pre-bucket to the top-S "
    "volume domains first (per_source_cap's election machinery). "
    "Ratios are single double divisions of exact BIGINTs — "
    "bit-stable cross-engine.",
    tags=("dedup", "audit", "text"),
)
def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ._portable import shingles3

    d = spread(load_table(spark, sf_dir, "documents"))
    sh = (
        d.select("source", words_col(F.col("text")).alias("ws"))
        .select("source", F.explode(shingles3(F.col("ws"))).alias("s"))
        .select("source", phash60(F.col("s")).alias("h"))
        .distinct()
        .persist()
    )
    per = sh.groupBy("source").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("source").alias("s1"), "h")
    b = sh.select(F.col("source").alias("s2"), "h")
    pairs = (
        a.join(b, "h")
        .filter(F.col("s1") < F.col("s2"))
        .groupBy("s1", "s2")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    p1 = per.select(F.col("source").alias("k1"), F.col("n_sh").alias("n_s1"))
    p2 = per.select(F.col("source").alias("k2"), F.col("n_sh").alias("n_s2"))
    c = F.col("n_common").cast("double")
    return (
        pairs.join(F.broadcast(p1), F.col("s1") == F.col("k1"))
        .join(F.broadcast(p2), F.col("s2") == F.col("k2"))
        .select(
            "s1",
            "s2",
            "n_common",
            "n_s1",
            "n_s2",
            (c / F.col("n_s1").cast("double")).alias("containment_s1"),
            (c / F.col("n_s2").cast("double")).alias("containment_s2"),
            (c / (F.col("n_s1") + F.col("n_s2") - F.col("n_common")).cast("double")).alias(
                "jaccard"
            ),
        )
        .orderBy("s1", "s2")
    )
