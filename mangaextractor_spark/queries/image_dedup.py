"""Image-level near-duplicate detection via perceptual difference-hash.

The multimodal sibling of the text MinHash ladder: a 100 TB image
corpus dedups on a 64-bit perceptual fingerprint (kernels/phash.py
dHash) long before anyone compares pixels — recompressed, resized, or
slightly-retouched copies land within a small Hamming radius of each
other, and the pair search is the SAME banded pigeonhole join the
SimHash text dedup runs (8 bands of 8 bits; Hamming <= 7 guarantees a
shared band), with the same hot-bucket cap.

Oracle discipline (what makes a *decode-the-bytes* operator
hash-checkable by a SQL engine that cannot decode PNG): the fixture
(fixtures/shared.phash_fixture_path) stores each image twice — as real
PNG bytes AND as the source pixel array. The Spark side decodes the
BYTES with the real decoder (sources/decode.py) and never touches the
pixel column; the DuckDB oracle recomputes the hash from the PIXELS
with plain integer SQL. Parity therefore proves both the integer dHash
arithmetic AND decode(encode(x)) == x on the real byte path (PNG is
lossless; JPEG is excluded by design — its decode has separate golden
tests).

Spark plan at corpus scale: one Arrow-batched decode+hash pass
(mapInPandas — the image never leaves its task), hashes persisted;
candidates from a band equi-join (8 rows per image, capped buckets,
AQE-splittable), exact popcount filter on the capped candidates. No
all-pairs stage anywhere.

Reference: none (capability beyond the reference). Public algorithm:
Krawetz dHash; banding per Manku WWW'07.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..fixtures.shared import phash_fixture_path
from ..kernels.phash import BAND_BITS, HAM_T, IMG_BAND_CAP, N_BANDS, N_COLS, N_ROWS
from . import register

_PHASH_PARQUET = phash_fixture_path()

_BAND_COLS = [f"b{k}" for k in range(N_BANDS)]
_DHASH_SCHEMA = "media_ref string, width long, height long, " + ", ".join(
    f"{c} long" for c in _BAND_COLS
)


def _dhash_kernel(batches):
    import pandas as pd

    from ..kernels.phash import dhash_bands
    from ..sources.decode import decode_gray_image

    for pdf in batches:
        rows = []
        for ref, blob in zip(pdf["media_ref"], pdf["image_bytes"]):
            img = decode_gray_image(bytes(blob))
            rows.append((ref, img.shape[1], img.shape[0], *dhash_bands(img)))
        yield pd.DataFrame(rows, columns=["media_ref", "width", "height", *_BAND_COLS])


def dhash_frame(media: DataFrame) -> DataFrame:
    """(media_ref, image_bytes) -> (media_ref, width, height, b0..b7)
    via one Arrow decode+hash pass."""
    return media.select("media_ref", "image_bytes").mapInPandas(
        _dhash_kernel, _DHASH_SCHEMA
    )


# Shared oracle CTE: integer dHash from the stored source pixels.
# cell(r, c) sums via the same x*9//w / y*8//h boundaries as the
# kernel; bit = exact cross-multiplied mean compare; band = bit row.
_DHASH_CTE = f"""
px AS (
  SELECT media_ref, width AS w, height AS h, gray_pixels
  FROM read_parquet('{_PHASH_PARQUET}')
),
u AS (
  SELECT media_ref, w, h,
         unnest(gray_pixels) AS v,
         generate_subscripts(gray_pixels, 1) - 1 AS idx
  FROM px
),
cells AS (
  SELECT media_ref,
         ((idx // w) * {N_ROWS}) // h AS r,
         ((idx % w) * {N_COLS}) // w AS c,
         CAST(SUM(v) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS a
  FROM u GROUP BY media_ref, ((idx // w) * {N_ROWS}) // h, ((idx % w) * {N_COLS}) // w
),
bands AS (
  SELECT l.media_ref, l.r AS band,
         CAST(SUM(CASE WHEN l.s * rr.a > rr.s * l.a
                       THEN 1 << l.c ELSE 0 END) AS BIGINT) AS val
  FROM cells l JOIN cells rr
    ON rr.media_ref = l.media_ref AND rr.r = l.r AND rr.c = l.c + 1
  GROUP BY l.media_ref, l.r
),
wide AS (
  SELECT media_ref,
         {", ".join(f"CAST(MAX(CASE WHEN band = {k} THEN val END) AS BIGINT) AS b{k}" for k in range(N_BANDS))}
  FROM bands GROUP BY media_ref
)"""


_DHASH_SQL = f"""
WITH {_DHASH_CTE}
SELECT p.media_ref, CAST(p.w AS BIGINT) AS width, CAST(p.h AS BIGINT) AS height,
       {", ".join(f"w2.b{k}" for k in range(N_BANDS))}
FROM px p JOIN wide w2 ON w2.media_ref = p.media_ref
ORDER BY p.media_ref
"""


@register(
    "image_dhash",
    _DHASH_SQL,
    doc=f"64-bit perceptual difference-hash per image, as {N_BANDS} "
    f"row-bands of {BAND_BITS} bits: one Arrow decode+hash pass over "
    "real PNG bytes (the oracle recomputes from the fixture's stored "
    "source pixels, so parity proves the integer hash arithmetic AND "
    "the lossless decode round-trip). Exact integer reduction: "
    "x*9//w cell boundaries, cross-multiplied mean compares — no "
    "floats anywhere.",
    tags=("multimodal", "dedup", "sketch"),
)
def image_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = spark.read.parquet(_PHASH_PARQUET)
    return dhash_frame(media).orderBy("media_ref")


_PAIRS_SQL = f"""
WITH {_DHASH_CTE},
ok AS (
  SELECT band, val FROM bands GROUP BY band, val HAVING COUNT(*) <= {IMG_BAND_CAP}
),
capped AS (SELECT b.media_ref, b.band, b.val FROM bands b JOIN ok USING (band, val)),
cand AS (
  SELECT DISTINCT a.media_ref AS a_ref, b.media_ref AS b_ref
  FROM capped a JOIN capped b
    ON a.band = b.band AND a.val = b.val AND a.media_ref < b.media_ref
),
ham AS (
  SELECT c.a_ref, c.b_ref,
         CAST({" + ".join(f"bit_count(xor(wa.b{k}, wb.b{k}))" for k in range(N_BANDS))} AS BIGINT) AS hamming
  FROM cand c
  JOIN wide wa ON wa.media_ref = c.a_ref
  JOIN wide wb ON wb.media_ref = c.b_ref
)
SELECT a_ref, b_ref, hamming FROM ham
WHERE hamming <= {HAM_T} ORDER BY a_ref, b_ref
"""


@register(
    "image_dhash_pairs",
    _PAIRS_SQL,
    doc=f"Image near-duplicate pairs at Hamming <= {HAM_T}: pigeonhole "
    f"banded equi-join on the {N_BANDS}x{BAND_BITS}-bit dHash bands "
    f"(distance <= {HAM_T} guarantees a shared band, so the join loses "
    "no pair under the threshold), buckets capped at "
    f"{IMG_BAND_CAP} (the fixture's flat-image family lands one "
    "degenerate all-zero bucket that the cap drops — the O(n^2) "
    "hot-key hazard, exercised, not just documented), exact popcount "
    "filter on the surviving candidates. The analog of "
    "simhash_hamming_pairs for the image modality; at corpus scale "
    "the hash frame is one decode pass and the join shuffles 8 small "
    "rows per image.",
    tags=("multimodal", "dedup"),
)
def image_dhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    hashes = dhash_frame(spark.read.parquet(_PHASH_PARQUET)).persist()
    long_ = hashes.select(
        "media_ref",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(k).alias("band"), F.col(f"b{k}").alias("val"))
                    for k in range(N_BANDS)
                ]
            )
        ).alias("bv"),
    ).select("media_ref", "bv.band", "bv.val")
    ok = (
        long_.groupBy("band", "val")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") <= IMG_BAND_CAP)
        .select("band", "val")
    )
    capped = long_.join(ok, ["band", "val"])
    a = capped.select("band", "val", F.col("media_ref").alias("a_ref"))
    b = capped.select("band", "val", F.col("media_ref").alias("b_ref"))
    cand = (
        a.join(b, ["band", "val"])
        .filter(F.col("a_ref") < F.col("b_ref"))
        .select("a_ref", "b_ref")
        .distinct()
    )
    wa = hashes.select(
        F.col("media_ref").alias("a_ref"), *[F.col(c).alias(f"a_{c}") for c in _BAND_COLS]
    )
    wb = hashes.select(
        F.col("media_ref").alias("b_ref"), *[F.col(c).alias(f"b_{c}") for c in _BAND_COLS]
    )
    hamming = sum(
        F.bit_count(F.col(f"a_b{k}").bitwiseXOR(F.col(f"b_b{k}"))) for k in range(N_BANDS)
    ).cast("long")
    return (
        cand.join(wa, "a_ref")
        .join(wb, "b_ref")
        .select("a_ref", "b_ref", hamming.alias("hamming"))
        .filter(F.col("hamming") <= HAM_T)
        .orderBy("a_ref", "b_ref")
    )
