"""Multimodal token accounting & packing: cost-model invariants,
aspect-bucket selection on handcrafted geometries, packing boundary
rules, and the zero-exchange plan property of the cost frame. Oracle
parity at sf0.01 rides the test_queries_oracle parametrization like
every registered query (all three were additionally hash-green vs
DuckDB at sf0.001 on first fresh run)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mangaextractor_spark.queries import REGISTRY
from mangaextractor_spark.queries.mm_packing import (
    ASPECT_LADDER,
    IMG_EXTRA,
    MM_PACK_BUCKETS,
    MM_SEQ_LEN,
    PATCH,
    _bucket_idx,
    _costs_frame,
    _img_h,
    _img_w,
    _patches,
    mm_costs_df,
)


def test_patch_cost_formula(spark):
    """ceil-division patch grid on exact corner cases: an exact
    multiple of PATCH, one below, one above."""
    rows = [(PATCH * 10, PATCH * 5), (PATCH * 10 - 1, PATCH * 5 + 1), (1, 1)]
    df = spark.createDataFrame(rows, "w int, h int").select(
        _patches(F.col("w"), F.col("h")).alias("p")
    )
    got = [r.p for r in df.collect()]
    want = [
        ((w + PATCH - 1) // PATCH) * ((h + PATCH - 1) // PATCH) for w, h in rows
    ]
    assert got == want == [50, 60, 1]


def test_bucket_selection_on_known_geometries(spark):
    """Each canonical resolution maps to its own bucket; squarish and
    extreme geometries map to the nearest aspect."""
    cases = [(cw, ch, i) for i, (_, _, _, cw, ch) in enumerate(ASPECT_LADDER)]
    cases += [
        (1000, 1001, 2),  # near-square -> 1:1
        (100, 1000, 0),  # extreme portrait -> 9:16 (nearest in ladder)
        (1000, 100, 4),  # extreme landscape -> 16:9
        (760, 1340, 0),  # just off 9:16 canonical
    ]
    df = spark.createDataFrame(
        [(w, h) for w, h, _ in cases], "w int, h int"
    ).select("w", "h", _bucket_idx(F.col("w"), F.col("h")).alias("idx"))
    got = [r.idx for r in df.collect()]
    assert got == [i for _, _, i in cases]


def test_bucket_argmin_matches_integer_reference(spark):
    """The packed-key argmin agrees with the same integer math computed
    in plain Python (including the smallest-index tie-break from the
    low bits) across a geometry sweep."""
    cases = [(w, h) for w in (14, 100, 756, 1280) for h in (12, 224, 1000, 1064)]

    def ref_idx(w: int, h: int) -> int:
        keys = [
            abs(w * bh - h * bw) * (144 // bh) * 8 + i
            for i, (_, bw, bh, _, _) in enumerate(ASPECT_LADDER)
        ]
        return min(keys) % 8

    df = spark.createDataFrame(cases, "w int, h int").select(
        "w", "h", _bucket_idx(F.col("w"), F.col("h")).alias("idx")
    )
    for r in df.collect():
        assert r.idx == ref_idx(r.w, r.h), (r.w, r.h)


def test_costs_frame_invariants(spark, sf_small):
    pdf = _costs_frame(spark, sf_small).toPandas()
    # fixture: every doc carries exactly one image span that survives
    assert (pdf["n_images"] == 1).all()
    assert (pdf["mm_tokens"] == pdf["text_tokens"] + pdf["patch_tokens"]).all()
    # patch cost bounded by construction: geometry caps the grid
    max_patches = ((1280 + PATCH - 1) // PATCH) * ((1064 + PATCH - 1) // PATCH)
    assert (pdf["patch_tokens"] <= max_patches + IMG_EXTRA).all()
    assert (pdf["patch_tokens"] >= IMG_EXTRA + 1).all()


def test_costs_frame_zero_exchange_plan(spark):
    """Accounting is array HOFs applied map-side: scan -> project, no
    Exchange, no Window, no Generate even — a monster interleaved doc
    costs only its own row. (The registered query adds only spread()'s
    documented round-robin repartition for toy-file parallelism.)"""
    df = spark.createDataFrame(
        [("d1", [("text", "hi", "", 0), ("image", "", "img/d1/0", 1)])],
        "doc_id string, "
        "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    plan = mm_costs_df(df)._jdf.queryExecution().optimizedPlan().toString()
    assert "Exchange" not in plan
    assert "Window" not in plan
    assert "Repartition" not in plan


def test_packing_boundary_rule(spark, sf_small):
    pdf = REGISTRY["multimodal_packing"].spark(spark, sf_small).toPandas()
    # prefix-sum consistency per bucket: offsets are the running sum
    for _, g in pdf.groupby("bucket"):
        g = g.sort_values("doc_id")
        run = 0
        for _, r in g.iterrows():
            assert r["start_offset"] == run
            run += r["mm_tokens"]
    # seq_id is the boundary rule; n_seqs_spanned >= 1 and agrees
    assert (pdf["seq_id"] == pdf["start_offset"] // MM_SEQ_LEN).all()
    spans = (
        (pdf["start_offset"] + pdf["mm_tokens"] - 1) // MM_SEQ_LEN
        - pdf["start_offset"] // MM_SEQ_LEN
        + 1
    )
    assert (pdf["n_seqs_spanned"] == spans).all()
    assert (pdf["n_seqs_spanned"] >= 1).all()
    assert set(pdf["bucket"].unique()) <= set(range(MM_PACK_BUCKETS))


def test_image_share_dominates_word_count(spark, sf_small):
    """The family's raison d'etre: patch tokens dominate the budget on
    this corpus (images are ~1MP, text ~100 words), so packing by word
    count alone would be off by the image-share factor."""
    pdf = REGISTRY["mm_token_costs"].spark(spark, sf_small).toPandas()
    assert (pdf["image_token_share"] > 0.5).mean() > 0.9
    assert pdf["image_token_share"].between(0, 1).all()


def test_resolution_rollup_consistency(spark, sf_small):
    costs = _costs_frame(spark, sf_small).toPandas()
    rb = REGISTRY["resolution_bucketing"].spark(spark, sf_small).toPandas()
    # every image lands in exactly one bucket
    assert rb["n_images"].sum() == costs["n_images"].sum()
    # native patch total across buckets == per-doc patch total minus sentinels
    assert (
        rb["total_native_patches"].sum()
        == (costs["patch_tokens"] - IMG_EXTRA * costs["n_images"]).sum()
    )
    # canonical totals are n_images * the bucket constant
    for _, r in rb.iterrows():
        cw, ch = r["canon_w"], r["canon_h"]
        canon = ((cw + PATCH - 1) // PATCH) * ((ch + PATCH - 1) // PATCH)
        assert r["total_canonical_patches"] == r["n_images"] * canon


def test_seq_manifest_conservation_and_boundaries(spark, sf_small):
    costs = _costs_frame(spark, sf_small).toPandas()
    man = REGISTRY["mm_seq_manifest"].spark(spark, sf_small).toPandas()
    # token conservation: every token lands in exactly one sequence
    assert man["tokens_filled"].sum() == costs["mm_tokens"].sum()
    # every image starts in exactly one sequence
    assert man["n_images"].sum() == costs["n_images"].sum()
    assert (man["n_split_images"] <= man["n_images"]).all()
    # within a bucket, every sequence except the last is filled exactly
    for _, g in man.groupby("bucket"):
        last = g["seq_id"].max()
        full = g[g["seq_id"] < last]
        assert (full["tokens_filled"] == MM_SEQ_LEN).all()
        assert (g[g["seq_id"] == last]["tokens_filled"] <= MM_SEQ_LEN).all()
    # the packing assignment's start sequences all appear in the manifest
    pack = REGISTRY["multimodal_packing"].spark(spark, sf_small).toPandas()
    man_keys = set(zip(man["bucket"], man["seq_id"]))
    assert set(zip(pack["bucket"], pack["seq_id"])) <= man_keys
    # boundary splits exist on this corpus (images ~ 5-7k patches vs
    # 8192-token sequences), so the diagnostic is exercised, not vacuous
    assert man["n_split_images"].sum() > 0


def test_geometry_is_deterministic(spark):
    """Same media_ref -> same (w, h) across sessions/plans (pure hash)."""
    df = spark.createDataFrame([("img/42/0",)], "media_ref string").select(
        _img_w(F.col("media_ref")).alias("w"), _img_h(F.col("media_ref")).alias("h")
    )
    a = df.collect()[0]
    b = df.collect()[0]
    assert (a.w, a.h) == (b.w, b.h)
    assert 224 <= a.w <= 1280 and 224 <= a.h <= 1064


def test_mm_epoch_mixture_invariants(spark, sf_small):
    from mangaextractor_spark.queries.mm_packing import MM_BUDGET_EPOCHS

    pdf = REGISTRY["mm_epoch_mixture"].spark(spark, sf_small).toPandas()
    costs = _costs_frame(spark, sf_small).toPandas()
    # supply conservation vs the per-doc frame (source-blind total)
    assert pdf["mm_avail"].sum() == costs["mm_tokens"].sum()
    assert (pdf["mm_avail"] == pdf["text_tokens"] + pdf["patch_tokens"]).all()
    # allocations serve the whole budget up to per-source floor loss (one floor division per source)
    budget = MM_BUDGET_EPOCHS * pdf["mm_avail"].sum()
    assert budget - len(pdf) < pdf["requested_tokens"].sum() <= budget
    # epochs is the ceiling of the repeat factor
    import numpy as np

    assert (
        pdf["epochs"]
        == -(-pdf["requested_tokens"] // pdf["mm_avail"])
    ).all()
    assert (pdf["repeat_factor"] <= pdf["epochs"]).all()
    assert pdf["image_token_share"].between(0, 1).all()
