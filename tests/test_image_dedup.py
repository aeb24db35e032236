"""Perceptual-hash image dedup: kernel invariants (brightness shift,
self-distance, near-dup radius), fixture-driven pair semantics (the
planted variants must pair; the flat family must hit the hot-band
cap), and the decode-path guarantee (the Spark query hashes DECODED
bytes, so any decode drift breaks oracle parity — which rides
test_queries_oracle.py)."""

from __future__ import annotations

import numpy as np

from mangaextractor_spark.kernels.phash import (
    HAM_T,
    IMG_BAND_CAP,
    N_BANDS,
    cell_sums,
    dhash_bands,
    hamming,
)
from mangaextractor_spark.queries import REGISTRY


class TestKernel:
    def test_cell_sums_cover_image_exactly(self):
        rng = np.random.default_rng(3)
        for shape in [(40, 48), (41, 49), (8, 9), (128, 160)]:
            img = rng.integers(0, 256, shape, dtype=np.uint8)
            sums, areas = cell_sums(img)
            assert sums.sum() == img.sum(dtype=np.int64)
            assert areas.sum() == img.size
            assert areas.min() >= 1

    def test_uniform_brightness_shift_invariance(self):
        rng = np.random.default_rng(5)
        img = rng.integers(60, 180, (64, 80), dtype=np.uint8)
        shifted = np.clip(img.astype(np.int64) + 40, 0, 255).astype(np.uint8)
        assert dhash_bands(img) == dhash_bands(shifted)

    def test_flat_image_hashes_to_zero(self):
        assert dhash_bands(np.full((48, 64), 128, dtype=np.uint8)) == [0] * N_BANDS

    def test_small_perturbation_small_distance(self):
        rng = np.random.default_rng(9)
        yy, xx = np.mgrid[0:100, 0:120]
        img = ((xx + yy) % 256).astype(np.uint8)
        pert = img.astype(np.int64)
        mask = rng.random(img.shape) < 0.02
        pert = np.clip(pert + mask * rng.integers(-8, 9, img.shape), 0, 255).astype(np.uint8)
        d = hamming(dhash_bands(img), dhash_bands(pert))
        assert d <= HAM_T
        # while an unrelated image is far away
        other = ((xx * 3 + 2 * yy * yy) % 256).astype(np.uint8)
        assert hamming(dhash_bands(img), dhash_bands(other)) > HAM_T

    def test_bands_are_8_bit(self):
        rng = np.random.default_rng(11)
        img = rng.integers(0, 256, (77, 91), dtype=np.uint8)
        bands = dhash_bands(img)
        assert len(bands) == N_BANDS
        assert all(0 <= b <= 255 for b in bands)


class TestQueries:
    def test_planted_variants_pair_and_flats_are_capped(self, spark):
        rows = REGISTRY["image_dhash_pairs"].spark(spark, "unused").collect()
        pairs = {(r.a_ref, r.b_ref) for r in rows}
        assert pairs, "fixture plants near-dup variants; pairs must exist"
        # every third page image is a perturbed copy of its predecessor
        planted = sum(
            1
            for (a, b) in pairs
            if a.startswith("img/page") and b.startswith("img/page")
            and abs(int(a[8:11]) - int(b[8:11])) == 1
        )
        assert planted >= 5, f"planted near-dup variants must be found, got {planted}"
        # the 18 flat images share one degenerate all-zero bucket ->
        # over IMG_BAND_CAP -> dropped: no flat-flat pair may appear
        assert not any("flat" in a and "flat" in b for a, b in pairs)
        assert all(r.hamming <= HAM_T for r in rows)

    def test_dhash_matches_kernel_on_decoded_bytes(self, spark):
        import pandas as pd

        from mangaextractor_spark.fixtures.shared import phash_fixture_path
        from mangaextractor_spark.sources.decode import decode_gray_image

        got = {r.media_ref: r for r in REGISTRY["image_dhash"].spark(spark, "x").collect()}
        pdf = pd.read_parquet(phash_fixture_path())
        assert len(got) == len(pdf)
        for _, row in pdf.head(12).iterrows():
            img = decode_gray_image(bytes(row["image_bytes"]))
            # decode must reproduce the stored source exactly (PNG lossless)
            assert img.ravel().tolist() == list(row["gray_pixels"])
            r = got[row["media_ref"]]
            assert [getattr(r, f"b{k}") for k in range(N_BANDS)] == dhash_bands(img)
            assert (r.width, r.height) == (row["width"], row["height"])

    def test_flat_bucket_genuinely_exceeds_cap(self, spark):
        """The cap must be EXERCISED by the fixture, not vacuous."""
        from mangaextractor_spark.queries.image_dedup import dhash_frame

        hashes = dhash_frame(
            spark.read.parquet(
                __import__(
                    "mangaextractor_spark.fixtures.shared", fromlist=["phash_fixture_path"]
                ).phash_fixture_path()
            )
        )
        flats = hashes.filter(hashes.media_ref.startswith("img/flat")).count()
        assert flats > IMG_BAND_CAP
