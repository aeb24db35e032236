"""Multimodal token accounting & packing — the training-loader math for
INTERLEAVED text+image documents (the graft cell's payload), as three
oracle-checked operators.

A vision-language training stack does not pack word counts: every image
in an interleaved document enters the sequence as a grid of ViT patch
tokens (ceil(w/P) * ceil(h/P) at patch size P, plus begin/end image
sentinels), so document cost is text tokens + patch tokens and the
packing/batching layer must use THAT cost model (Alayrac et al. 2022
Flamingo §2.2 interleaved sequences; Dehghani et al. 2023 NaViT's
variable-resolution patch packing; McKinzie et al. 2024 MM1 interleaved
data mixing). This module re-expresses the three loader-side operators
over the north_rule interleaved spans table:

- ``mm_token_costs``   — per-document multimodal token accounting over
  the EXTRACTED main-content spans (you pack what you train on, so the
  html boilerplate strip runs first — same per-kind dispatch as
  ``main_content_spans``);
- ``multimodal_packing`` — the packing assignment under the multimodal
  cost model (the MM twin of ``sequence_packing``; images make per-doc
  costs heavy-tailed, which is exactly why the cost model matters —
  and the per-doc cost is BOUNDED by construction here, max resolution
  caps patch count, so hash buckets stay balanced);
- ``resolution_bucketing`` — NaViT/SDXL-style aspect-ratio bucketing:
  each image is assigned the nearest of five canonical aspect buckets
  by EXACT integer cross-multiplication (no float log-ratio), with
  native-vs-canonical patch totals per bucket.

Image dimensions derive deterministically from ``media_ref`` (the
fixture carries no real decoder output at sf scale; production wires
``functions/multimodal.decode`` metadata in instead — same columns,
same downstream math). All arithmetic is BIGINT-exact and identical in
Spark and DuckDB; ratios are one double division of exact operands.

Scale shape (the 10^12-doc plan): costs are array higher-order
functions applied map-side — zero exchanges before the final sort;
packing is the one prefix-sum window, partitioned by a construction-
bounded hash bucket exactly as ``sequence_packing`` (the documented
knob in queries/_scale_notes.py); bucketing's rollup is one map-side-
combined groupBy over a 5-row key space.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..session import load_table, spread
from . import register
from ._portable import WORDS_SQL, phash60, phash60_sql, words_col
from .main_content import (
    _SPANS_SQL,
    _spans_col,
    interleaved_docs,
    survivors_col,
    survivors_sql,
)

# --- deterministic image geometry & cost model ---------------------------

PATCH = 14  # ViT-L/14 patch size
IMG_EXTRA = 2  # begin/end-of-image sentinel tokens
W_MIN, W_MOD = 224, 1057  # native width  in [224, 1280]
H_MIN, H_MOD = 224, 841  # native height in [224, 1064]

MM_SEQ_LEN = 8192
MM_PACK_BUCKETS = 8

# Aspect ladder (name, bw, bh, canonical w, canonical h). Canonical
# resolutions are SDXL-style ~1MP per bucket. bh values {16,4,1,3,9}
# have LCM 144; WEIGHT = 144 // bh makes |w*bh - h*bw| * WEIGHT an
# exact common-denominator comparison of |w/h - bw/bh| across buckets
# (the h factor cancels, see resolution_bucketing doc).
ASPECT_LADDER = [
    ("9:16", 9, 16, 756, 1344),
    ("3:4", 3, 4, 864, 1152),
    ("1:1", 1, 1, 1024, 1024),
    ("4:3", 4, 3, 1152, 864),
    ("16:9", 16, 9, 1344, 756),
]
_WEIGHTS = [144 // bh for _, _, bh, _, _ in ASPECT_LADDER]


def _img_w(ref: Column) -> Column:
    return F.lit(W_MIN) + (phash60(ref) % W_MOD)


def _img_h(ref: Column) -> Column:
    return F.lit(H_MIN) + (phash60(F.concat(ref, F.lit("#h"))) % H_MOD)


def _img_w_sql(ref: str) -> str:
    return f"{W_MIN} + {phash60_sql(ref)} % {W_MOD}"


def _img_h_sql(ref: str) -> str:
    return f"{H_MIN} + {phash60_sql(f'{ref} || ' + repr('#h'))} % {H_MOD}"


def _patches(w: Column, h: Column) -> Column:
    """ceil(w/PATCH) * ceil(h/PATCH) as exact integers (floor of a
    double division is exact here: operands are < 2^11)."""
    pw = F.floor((w + (PATCH - 1)) / PATCH)
    ph = F.floor((h + (PATCH - 1)) / PATCH)
    return (pw * ph).cast("long")


def _patches_sql(w: str, h: str) -> str:
    return f"((({w}) + {PATCH - 1}) // {PATCH}) * ((({h}) + {PATCH - 1}) // {PATCH})"


# --- per-doc cost frame (shared by mm_token_costs & multimodal_packing) --


def _survivors() -> Column:
    """Extracted main-content spans — THE shared rule from
    main_content.survivors_col (order irrelevant for accounting)."""
    return survivors_col(F.col("spans"))


def mm_costs_df(docs: DataFrame, passthrough: tuple[str, ...] = ()) -> DataFrame:
    """(doc_id, spans[]) -> (doc_id, n_text_spans, n_images,
    text_tokens, patch_tokens, mm_tokens) over any north_rule-shaped
    frame — entirely map-side (zero Exchange/Window; plan-tested), the
    accounting twin of main_content_spans_df. ``passthrough`` columns
    ride along unchanged (same contract as main_content_spans_df)."""
    surv = _survivors()
    texts = F.filter(surv, lambda s: s["kind"] == "text")
    imgs = F.filter(surv, lambda s: s["kind"] == "image")
    text_tokens = F.aggregate(
        texts,
        F.lit(0).cast("long"),
        lambda acc, s: acc + F.size(words_col(s["text"])),
    )
    patch_tokens = F.aggregate(
        imgs,
        F.lit(0).cast("long"),
        lambda acc, s: acc
        + _patches(_img_w(s["media_ref"]), _img_h(s["media_ref"]))
        + IMG_EXTRA,
    )
    return docs.select(
        "doc_id",
        *passthrough,
        F.size(texts).cast("int").alias("n_text_spans"),
        F.size(imgs).cast("int").alias("n_images"),
        text_tokens.alias("text_tokens"),
        patch_tokens.alias("patch_tokens"),
        (text_tokens + patch_tokens).alias("mm_tokens"),
    )


def _costs_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mm_costs_df(interleaved_docs(spark, sf_dir))


def _extract_cte(extra: str = "") -> str:
    """The shared docs -> surv -> costs oracle pipeline; ``extra`` is a
    comma-led column list (e.g. ", source") threaded through every
    stage — the SQL twin of mm_costs_df's ``passthrough``."""
    return f"""
docs AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id{extra}, {_SPANS_SQL} AS spans
  FROM documents
),
surv AS (
  SELECT doc_id{extra},
         {survivors_sql("spans")} AS sv
  FROM docs
),
costs AS (
  SELECT doc_id{extra},
         CAST(len(list_filter(sv, s -> s.kind = 'text')) AS INT) AS n_text_spans,
         CAST(len(list_filter(sv, s -> s.kind = 'image')) AS INT) AS n_images,
         CAST(COALESCE(list_sum(list_transform(
             list_filter(sv, s -> s.kind = 'text'),
             s -> len({WORDS_SQL.format(t="s.text")}))), 0) AS BIGINT) AS text_tokens,
         CAST(COALESCE(list_sum(list_transform(
             list_filter(sv, s -> s.kind = 'image'),
             s -> {_patches_sql(_img_w_sql("s.media_ref"), _img_h_sql("s.media_ref"))}
                  + {IMG_EXTRA})), 0) AS BIGINT) AS patch_tokens
  FROM surv
)
"""


_EXTRACT_CTE = _extract_cte()

_MM_COSTS_SQL = f"""
WITH {_EXTRACT_CTE}
SELECT doc_id, n_text_spans, n_images, text_tokens, patch_tokens,
       text_tokens + patch_tokens AS mm_tokens,
       CAST(patch_tokens AS DOUBLE) / (text_tokens + patch_tokens)
         AS image_token_share
FROM costs ORDER BY doc_id
"""


@register(
    "mm_token_costs",
    _MM_COSTS_SQL,
    doc="Per-document multimodal token accounting over the extracted "
    "main-content spans: text spans cost their word count, image spans "
    f"cost ceil(w/{PATCH})*ceil(h/{PATCH}) ViT patches + {IMG_EXTRA} "
    "sentinels, with (w, h) derived deterministically from media_ref "
    "(production swaps in decoder metadata — same columns, same math). "
    "image_token_share is the loader-side diagnostic every interleaved "
    "mixing recipe watches (MM1: image tokens dominate compute, so the "
    "text:image token ratio — not doc ratio — is the mixing knob). "
    "Scale shape: the whole query is array higher-order functions "
    "applied map-side — ZERO exchanges before the output sort (plan-"
    "tested); a monster doc costs only its own row. All counts BIGINT-"
    "exact; the share is one double division of exact operands.",
    tags=("multimodal", "packing", "curation"),
)
def mm_token_costs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _costs_frame(spark, sf_dir)
    return c.select(
        "*",
        (
            F.col("patch_tokens").cast("double")
            / (F.col("text_tokens") + F.col("patch_tokens"))
        ).alias("image_token_share"),
    ).orderBy("doc_id")


_MM_PACK_SQL = f"""
WITH {_EXTRACT_CTE},
t AS (
  SELECT doc_id, text_tokens + patch_tokens AS mm_tokens,
         {phash60_sql("doc_id")} % {MM_PACK_BUCKETS} AS bucket
  FROM costs
),
c AS (
  SELECT doc_id, bucket, mm_tokens,
         SUM(mm_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
                              ROWS UNBOUNDED PRECEDING) - mm_tokens AS start_offset
  FROM t
)
SELECT doc_id, CAST(bucket AS INT) AS bucket,
       CAST(mm_tokens AS BIGINT) AS mm_tokens,
       CAST(start_offset AS BIGINT) AS start_offset,
       CAST(start_offset // {MM_SEQ_LEN} AS BIGINT) AS seq_id,
       CAST((start_offset + mm_tokens - 1) // {MM_SEQ_LEN}
            - start_offset // {MM_SEQ_LEN} + 1 AS INT) AS n_seqs_spanned
FROM c ORDER BY bucket, doc_id
"""


@register(
    "multimodal_packing",
    _MM_PACK_SQL,
    doc=f"Training-sequence packing under the MULTIMODAL cost model: "
    f"concatenate per-doc mm_tokens (text words + image patches) per "
    f"hash bucket and split at {MM_SEQ_LEN}-token boundaries — the MM "
    "twin of sequence_packing. The cost model is the point: one "
    "hi-res image (~7k patches at 1280x1064) outweighs most documents' "
    "text, so packing by word count would overfill sequences by an "
    "image-share-sized factor. n_seqs_spanned flags docs crossing a "
    "sequence boundary — the image-splitting hazard an interleaved "
    "loader must mask or shift (Flamingo masks cross-image attention "
    "at boundaries). Scale shape: identical to sequence_packing — the "
    "prefix-sum window partitions by a construction-bounded hash "
    f"bucket ({MM_PACK_BUCKETS} here; size buckets to ~64k docs at "
    "100 TB, queries/_scale_notes.py), and the per-doc cost is itself "
    "bounded (max resolution caps patches), so buckets stay balanced. "
    "Integer arithmetic end to end.",
    tags=("multimodal", "packing", "curation"),
)
def multimodal_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _costs_frame(spark, sf_dir).select(
        "doc_id",
        "mm_tokens",
        (phash60(F.col("doc_id")) % MM_PACK_BUCKETS).alias("bucket"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = t.withColumn("start_offset", F.sum("mm_tokens").over(w) - F.col("mm_tokens"))
    return c.select(
        "doc_id",
        F.col("bucket").cast("int").alias("bucket"),
        F.col("mm_tokens").cast("long").alias("mm_tokens"),
        F.col("start_offset").cast("long").alias("start_offset"),
        F.floor(F.col("start_offset") / F.lit(MM_SEQ_LEN)).cast("long").alias("seq_id"),
        (
            F.floor((F.col("start_offset") + F.col("mm_tokens") - 1) / F.lit(MM_SEQ_LEN))
            - F.floor(F.col("start_offset") / F.lit(MM_SEQ_LEN))
            + 1
        )
        .cast("int")
        .alias("n_seqs_spanned"),
    ).orderBy("bucket", "doc_id")


# --- per-sequence manifest with boundary-split image accounting ----------

_SPAN_COSTS_CTE = f"""
spansc AS (
  SELECT doc_id, list_transform(sv, s -> struct_pack(
           kind := s.kind,
           cost := CASE WHEN s.kind = 'image'
                        THEN {_patches_sql(_img_w_sql("s.media_ref"), _img_h_sql("s.media_ref"))}
                             + {IMG_EXTRA}
                        ELSE CAST(len({WORDS_SQL.format(t="s.text")}) AS BIGINT)
                   END)) AS sc
  FROM surv
),
t AS (
  SELECT doc_id, sc,
         CAST(COALESCE(list_sum(list_transform(sc, x -> x.cost)), 0) AS BIGINT)
           AS mm_tokens,
         {phash60_sql("doc_id")} % {MM_PACK_BUCKETS} AS bucket
  FROM spansc
),
c AS (
  SELECT doc_id, sc, bucket, mm_tokens,
         CAST(SUM(mm_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
                                   ROWS UNBOUNDED PRECEDING) - mm_tokens
              AS BIGINT) AS start_offset
  FROM t
)
"""

_MM_MANIFEST_SQL = f"""
WITH {_EXTRACT_CTE.rstrip()},
{_SPAN_COSTS_CTE.strip().rstrip()},
fills AS (
  SELECT bucket, seq_id,
         COUNT(*) AS n_docs,
         SUM(LEAST((seq_id + 1) * {MM_SEQ_LEN}, start_offset + mm_tokens)
             - GREATEST(seq_id * {MM_SEQ_LEN}, start_offset)) AS tokens_filled
  FROM (SELECT * FROM c WHERE mm_tokens > 0) cz,
       UNNEST(generate_series(start_offset // {MM_SEQ_LEN},
                              (start_offset + mm_tokens - 1) // {MM_SEQ_LEN}))
       AS g(seq_id)
  GROUP BY bucket, seq_id
),
imgs AS (
  SELECT bucket,
         start_offset
           + COALESCE(list_sum(list_transform(sc[1:i-1], x -> x.cost)), 0) AS gstart,
         sc[i].cost AS block
  FROM c, UNNEST(generate_series(1, len(sc))) AS u(i)
  WHERE sc[i].kind = 'image'
),
imgg AS (
  SELECT bucket, gstart // {MM_SEQ_LEN} AS seq_id,
         COUNT(*) AS n_images,
         SUM(CASE WHEN gstart // {MM_SEQ_LEN}
                       <> (gstart + block - 1) // {MM_SEQ_LEN}
                  THEN 1 ELSE 0 END) AS n_split_images
  FROM imgs GROUP BY bucket, gstart // {MM_SEQ_LEN}
)
SELECT CAST(f.bucket AS INT) AS bucket,
       CAST(f.seq_id AS BIGINT) AS seq_id,
       CAST(f.n_docs AS BIGINT) AS n_docs,
       CAST(f.tokens_filled AS BIGINT) AS tokens_filled,
       CAST(f.tokens_filled AS DOUBLE) / {MM_SEQ_LEN} AS fill_ratio,
       CAST(COALESCE(i.n_images, 0) AS BIGINT) AS n_images,
       CAST(COALESCE(i.n_split_images, 0) AS BIGINT) AS n_split_images
FROM fills f LEFT JOIN imgg i ON f.bucket = i.bucket AND f.seq_id = i.seq_id
ORDER BY bucket, seq_id
"""


@register(
    "mm_seq_manifest",
    _MM_MANIFEST_SQL,
    doc="Per-sequence loader manifest for multimodal packing, with "
    "EXACT boundary-split accounting: for every (bucket, seq_id) the "
    "docs resident, the tokens actually filled (documents crossing a "
    f"boundary contribute their overlap with [seq*{MM_SEQ_LEN}, "
    f"(seq+1)*{MM_SEQ_LEN}) — not their start), and the images whose "
    "patch block STARTS in the sequence, splitting out n_split_images "
    "— patch grids that cross a sequence boundary, which a training "
    "loader must shift or attention-mask because half an image grid "
    "is not a valid ViT input (the packing loaders in Flamingo/NaViT "
    "re-slot such images). Image positions come from a within-doc "
    "prefix over the span-cost array (array HOFs, map-side; O(k^2) in "
    "spans-per-doc, k bounded by the doc's own span count). Scale "
    "shape: the one prefix-sum window is the same construction-bounded "
    "bucket partition as multimodal_packing; fills explode to one row "
    "per doc-sequence overlap (<= 1 + mm_tokens/SEQ_LEN rows per doc, "
    "cost-bounded); both rollups are map-side-combined groupBys on "
    f"(bucket, seq_id) whose cardinality is total_tokens/{MM_SEQ_LEN} "
    "— uniformly spread by construction, no skew exposure.",
    tags=("multimodal", "packing", "curation"),
)
def mm_seq_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = interleaved_docs(spark, sf_dir)
    surv = _survivors()
    sc = F.transform(
        surv,
        lambda s: F.struct(
            s["kind"].alias("kind"),
            F.when(
                s["kind"] == "image",
                _patches(_img_w(s["media_ref"]), _img_h(s["media_ref"])) + IMG_EXTRA,
            )
            .otherwise(F.size(words_col(s["text"])).cast("long"))
            .alias("cost"),
        ),
    )
    t = docs.select(
        "doc_id",
        sc.alias("sc"),
    ).select(
        "doc_id",
        "sc",
        F.aggregate("sc", F.lit(0).cast("long"), lambda a, x: a + x["cost"]).alias(
            "mm_tokens"
        ),
        (phash60(F.col("doc_id")) % MM_PACK_BUCKETS).alias("bucket"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = t.withColumn(
        "start_offset", F.sum("mm_tokens").over(w) - F.col("mm_tokens")
    ).persist()  # feeds fills AND imgs — one packing pass, not two

    L = MM_SEQ_LEN
    s0 = F.floor(F.col("start_offset") / L)
    s1 = F.floor((F.col("start_offset") + F.col("mm_tokens") - 1) / L)
    # mm_tokens > 0 guard: a zero-cost doc occupies no sequence. Without
    # it, a 0-cost doc whose start_offset sits exactly on a boundary
    # gives s1 = s0 - 1, and Spark's sequence() would DESCEND ([s0,
    # s0-1], emitting a spurious seq_id - 1 row) while DuckDB's
    # generate_series yields nothing — a silent engine divergence. The
    # fixture always plants an image span so every doc has cost here,
    # but mm_costs_df is generic over north_rule-shaped inputs.
    fills = (
        c.filter(F.col("mm_tokens") > 0)
        .select(
            "bucket",
            "start_offset",
            "mm_tokens",
            F.explode(F.sequence(s0, s1)).alias("seq_id"),
        )
        .groupBy("bucket", "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.least(
                    (F.col("seq_id") + 1) * L,
                    F.col("start_offset") + F.col("mm_tokens"),
                )
                - F.greatest(F.col("seq_id") * L, F.col("start_offset"))
            ).alias("tokens_filled"),
        )
    )
    e = c.select(
        "bucket", "start_offset", "sc", F.posexplode("sc").alias("i", "s")
    ).filter(F.col("s.kind") == "image")
    gstart = F.col("start_offset") + F.aggregate(
        F.slice("sc", 1, F.col("i")), F.lit(0).cast("long"), lambda a, x: a + x["cost"]
    )
    imgs = e.select(
        "bucket",
        gstart.alias("gstart"),
        F.col("s.cost").alias("block"),
    )
    imgg = (
        imgs.select(
            "bucket",
            F.floor(F.col("gstart") / L).alias("seq_id"),
            (
                F.floor(F.col("gstart") / L)
                != F.floor((F.col("gstart") + F.col("block") - 1) / L)
            )
            .cast("int")
            .alias("split"),
        )
        .groupBy("bucket", "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.sum("split").alias("n_split_images"),
        )
    )
    out = (
        fills.join(imgg, ["bucket", "seq_id"], "left")
        .select(
            F.col("bucket").cast("int").alias("bucket"),
            F.col("seq_id").cast("long").alias("seq_id"),
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("tokens_filled").cast("long").alias("tokens_filled"),
            (F.col("tokens_filled").cast("double") / L).alias("fill_ratio"),
            F.coalesce(F.col("n_images"), F.lit(0)).cast("long").alias("n_images"),
            F.coalesce(F.col("n_split_images"), F.lit(0))
            .cast("long")
            .alias("n_split_images"),
        )
        .orderBy("bucket", "seq_id")
    )
    return out


# --- aspect-ratio bucketing ----------------------------------------------

# Bucket selection: argmin over the ladder of |w/h - bw/bh|, computed
# exactly. |w/h - bw_i/bh_i| < |w/h - bw_j/bh_j|
#   <=> |w*bh_i - h*bw_i| / (h*bh_i) < |w*bh_j - h*bw_j| / (h*bh_j)
#   <=> |w*bh_i - h*bw_i| * (144/bh_i) < |w*bh_j - h*bw_j| * (144/bh_j)
# (h > 0 cancels; 144 = lcm of the bh values). Packing the bucket index
# into the low 3 bits of the scaled score gives a single BIGINT argmin
# with a deterministic smallest-index tie-break; scores are < 2^23 so
# the *8 shift is exact.


def _bucket_key_terms_sql(w: str, h: str) -> list[str]:
    return [
        f"(ABS(({w}) * {bh} - ({h}) * {bw}) * {wt} * 8 + {i})"
        for i, ((_, bw, bh, _, _), wt) in enumerate(zip(ASPECT_LADDER, _WEIGHTS))
    ]


def _bucket_idx(w: Column, h: Column) -> Column:
    keys = [
        F.abs(w * bh - h * bw) * wt * 8 + i
        for i, ((_, bw, bh, _, _), wt) in enumerate(zip(ASPECT_LADDER, _WEIGHTS))
    ]
    return (F.least(*keys) % 8).cast("int")


_CANON_PATCHES = [
    ((cw + PATCH - 1) // PATCH) * ((ch + PATCH - 1) // PATCH)
    for _, _, _, cw, ch in ASPECT_LADDER
]

_BUCKET_CASE_SQL = {
    col: "CASE idx "
    + " ".join(
        f"WHEN {i} THEN {val!r}" if isinstance(val, str) else f"WHEN {i} THEN {val}"
        for i, val in enumerate(vals)
    )
    + " END"
    for col, vals in {
        "bucket_name": [n for n, *_ in ASPECT_LADDER],
        "bw": [bw for _, bw, *_ in ASPECT_LADDER],
        "bh": [bh for _, _, bh, *_ in ASPECT_LADDER],
        "canon_w": [cw for *_, cw, _ in ASPECT_LADDER],
        "canon_h": [ch for *_, ch in ASPECT_LADDER],
        "canon_patches": _CANON_PATCHES,
    }.items()
}

_RES_BUCKET_SQL = f"""
WITH docs AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, {_SPANS_SQL} AS spans
  FROM documents
),
imgs AS (
  SELECT s.media_ref AS media_ref,
         {_img_w_sql("s.media_ref")} AS w,
         {_img_h_sql("s.media_ref")} AS h
  FROM docs, UNNEST(list_filter(spans, s -> s.kind = 'image')) AS u(s)
),
keyed AS (
  SELECT media_ref, w, h,
         CAST(LEAST({", ".join(_bucket_key_terms_sql("w", "h"))}) % 8 AS INT) AS idx,
         {_patches_sql("w", "h")} AS native_patches
  FROM imgs
)
SELECT CAST(idx AS INT) AS idx,
       {_BUCKET_CASE_SQL["bucket_name"]} AS bucket_name,
       CAST({_BUCKET_CASE_SQL["bw"]} AS INT) AS bw,
       CAST({_BUCKET_CASE_SQL["bh"]} AS INT) AS bh,
       CAST({_BUCKET_CASE_SQL["canon_w"]} AS INT) AS canon_w,
       CAST({_BUCKET_CASE_SQL["canon_h"]} AS INT) AS canon_h,
       COUNT(*) AS n_images,
       CAST(SUM(native_patches) AS BIGINT) AS total_native_patches,
       CAST(COUNT(*) * {_BUCKET_CASE_SQL["canon_patches"]} AS BIGINT)
         AS total_canonical_patches,
       CAST(SUM(native_patches) AS DOUBLE) / COUNT(*) AS mean_native_patches
FROM keyed
GROUP BY idx
ORDER BY idx
"""


@register(
    "resolution_bucketing",
    _RES_BUCKET_SQL,
    doc="NaViT/SDXL-style aspect-ratio bucketing for variable-"
    "resolution image batching: every image is assigned the nearest of "
    f"{len(ASPECT_LADDER)} canonical aspect buckets "
    f"({', '.join(n for n, *_ in ASPECT_LADDER)}) so a batch resizes "
    "to ONE canonical resolution (no padding waste, no distortion "
    "beyond the bucket quantum). Nearest-aspect is an EXACT integer "
    "argmin — |w/h - bw/bh| compared via cross-multiplication with a "
    "common denominator (lcm of the bh values), never a float "
    "log-ratio, so the assignment is bit-stable cross-engine; the "
    "bucket index rides the low 3 bits of the scaled score for a "
    "single-BIGINT argmin with smallest-index tie-break. Scale shape: "
    "geometry and assignment are map-side expressions off the span "
    "array (one Generate, no join), and the rollup is a map-side-"
    "combined groupBy onto a 5-row key space — scan-bound at 100 TB.",
    tags=("multimodal", "packing", "layout"),
)
def resolution_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = interleaved_docs(spark, sf_dir)
    imgs = docs.select(
        F.explode(
            F.filter(F.col("spans"), lambda s: s["kind"] == "image")
        ).alias("s")
    ).select(F.col("s.media_ref").alias("media_ref"))
    keyed = imgs.select(
        "media_ref",
        _img_w(F.col("media_ref")).alias("w"),
        _img_h(F.col("media_ref")).alias("h"),
    ).select(
        "media_ref",
        "w",
        "h",
        _bucket_idx(F.col("w"), F.col("h")).alias("idx"),
        _patches(F.col("w"), F.col("h")).alias("native_patches"),
    )

    def by_idx(vals, cast: str) -> Column:
        expr: Column = F.lit(None)
        for i, v in enumerate(vals):
            expr = F.when(F.col("idx") == i, F.lit(v)).otherwise(expr)
        return expr.cast(cast)

    names = [n for n, *_ in ASPECT_LADDER]
    bws = [bw for _, bw, *_ in ASPECT_LADDER]
    bhs = [bh for _, _, bh, *_ in ASPECT_LADDER]
    cws = [cw for *_, cw, _ in ASPECT_LADDER]
    chs = [ch for *_, ch in ASPECT_LADDER]
    return (
        keyed.groupBy("idx")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.sum("native_patches").alias("total_native_patches"),
        )
        .select(
            F.col("idx").cast("int").alias("idx"),
            by_idx(names, "string").alias("bucket_name"),
            by_idx(bws, "int").alias("bw"),
            by_idx(bhs, "int").alias("bh"),
            by_idx(cws, "int").alias("canon_w"),
            by_idx(chs, "int").alias("canon_h"),
            F.col("n_images").cast("long").alias("n_images"),
            F.col("total_native_patches").cast("long").alias("total_native_patches"),
            (F.col("n_images") * by_idx(_CANON_PATCHES, "long"))
            .cast("long")
            .alias("total_canonical_patches"),
            (
                F.col("total_native_patches").cast("double")
                / F.col("n_images").cast("double")
            ).alias("mean_native_patches"),
        )
        .orderBy("idx")
    )


# --- multimodal epoch mixture --------------------------------------------

# Muennighoff et al. 2023's data-constrained repeat schedule, priced in
# MULTIMODAL tokens: an interleaved training budget is consumed by
# sequence tokens (text words + image patches), so an image-heavy
# source exhausts its supply in fewer documents and must repeat
# earlier. Same alpha=0.5 temperature rule and BUDGET_EPOCHS as
# maintenance.epoch_mixture_plan — only the cost basis changes.
MM_BUDGET_EPOCHS = 2
MM_TEMP_SCALE = 1_000_000

_MM_MIX_SQL = f"""
WITH {_extract_cte(", source").strip()},
c AS (
  SELECT source,
         CAST(SUM(text_tokens + patch_tokens) AS BIGINT) AS mm_avail,
         CAST(SUM(text_tokens) AS BIGINT) AS text_tokens,
         CAST(SUM(patch_tokens) AS BIGINT) AS patch_tokens
  FROM costs GROUP BY source
),
w AS (
  SELECT c.*,
         CAST(FLOOR(SQRT(CAST(mm_avail AS DOUBLE)) * {MM_TEMP_SCALE}) AS BIGINT)
           AS w_e6
  FROM c
),
t AS (
  SELECT CAST(SUM(w_e6) AS BIGINT) AS tot_w,
         CAST(SUM(mm_avail) AS BIGINT) AS tot_toks
  FROM w
)
,
r AS (
  SELECT w.*,
         CAST(({MM_BUDGET_EPOCHS} * CAST(t.tot_toks AS HUGEINT) * w.w_e6)
              // t.tot_w AS BIGINT) AS requested_tokens
  FROM w CROSS JOIN t
)
SELECT source, mm_avail, text_tokens, patch_tokens,
       CAST(patch_tokens AS DOUBLE) / mm_avail AS image_token_share,
       w_e6, requested_tokens,
       (requested_tokens + mm_avail - 1) // mm_avail AS epochs,
       CAST(requested_tokens AS DOUBLE) / CAST(mm_avail AS DOUBLE)
         AS repeat_factor
FROM r ORDER BY source
"""


@register(
    "mm_epoch_mixture",
    _MM_MIX_SQL,
    doc="Data-constrained repeat schedule (Muennighoff et al. 2023) "
    "priced in MULTIMODAL tokens: per source, the mm-token supply "
    "(text words + image patch tokens over the extracted interleaved "
    "spans), its image_token_share, the alpha=0.5 temperature weight "
    f"floor(sqrt(mm_tokens)*1e6), the allocation a {MM_BUDGET_EPOCHS}x"
    "-corpus budget requests, and the whole-epoch repeat count. The "
    "mm cost basis is the point (MM1: image tokens dominate compute): "
    "under word-count supply an image-heavy source looks small and "
    "gets a small weight, then its actual sequence output overruns "
    "the budget by its patch share — pricing supply in mm tokens "
    "makes allocation and consumption the same unit. Exactness and "
    "scale shape identical to epoch_mixture_plan: one corpus scan "
    "into a map-side-combined per-source SUM, sqrt as the single "
    "IEEE double op, BIGINT floor/ceiling allocation, the weight "
    "table localCheckpointed once and crossed with a 1-row broadcast "
    "total — zero shuffle after the scan.",
    tags=("multimodal", "pipeline", "sampling"),
)
def mm_epoch_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    docs = d.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        "source",
        _spans_col().alias("spans"),
    )
    costs = mm_costs_df(docs, passthrough=("source",))
    c = costs.groupBy("source").agg(
        F.sum("mm_tokens").cast("long").alias("mm_avail"),
        F.sum("text_tokens").cast("long").alias("text_tokens"),
        F.sum("patch_tokens").cast("long").alias("patch_tokens"),
    )
    w = c.select(
        "*",
        F.floor(F.sqrt(F.col("mm_avail").cast("double")) * MM_TEMP_SCALE)
        .cast("long")
        .alias("w_e6"),
    ).localCheckpoint()  # |sources| rows; one corpus scan feeds both branches
    tot = w.agg(
        F.sum("w_e6").cast("long").alias("tot_w"),
        F.sum("mm_avail").cast("long").alias("tot_toks"),
    )
    # Overflow headroom (_scale_notes BIGINT-product rule): the 3-factor
    # product 2 * tot_toks * w_e6 grows as ~2e6 * T^1.5 and would wrap
    # int64 near T ~ 2.8e8 mm tokens. Both engines therefore compute it
    # in 38-digit exact integer arithmetic — HUGEINT in the oracle,
    # DECIMAL(38,0) here, where the floor division is expressed as the
    # exact-divisible form (p - p % tw) / tw so the decimal quotient is
    # integral (no scale rounding can touch it) before the BIGINT cast.
    req = (
        f"CAST((CAST({MM_BUDGET_EPOCHS} AS DECIMAL(38,0)) * tot_toks * w_e6"
        f" - CAST({MM_BUDGET_EPOCHS} AS DECIMAL(38,0)) * tot_toks * w_e6"
        f" % tot_w) / tot_w AS BIGINT)"
    )
    return (
        w.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "mm_avail",
            "text_tokens",
            "patch_tokens",
            (
                F.col("patch_tokens").cast("double") / F.col("mm_avail")
            ).alias("image_token_share"),
            "w_e6",
            F.expr(req).alias("requested_tokens"),
            F.expr(f"({req} + mm_avail - 1) DIV mm_avail").alias("epochs"),
            (F.expr(req).cast("double") / F.col("mm_avail").cast("double")).alias(
                "repeat_factor"
            ),
        )
        .orderBy("source")
    )
