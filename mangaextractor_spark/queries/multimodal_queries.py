"""Oracle-checked binary-media queries (S6 covers + media metadata).

These were rows-only in round 1 because the oracle cannot see fixture
DataFrames; now both engines read the SAME write-once fixture parquet
(fixtures/shared.py) and the oracle parses image headers as BYTE
SLICES over ``hex(image_bytes)`` — PNG IHDR at fixed offsets, JPEG SOF
located via the first BYTE-ALIGNED 'FFC0' (baseline) / 'FFC2'
(progressive) marker (lazy pair-quantifier regexp — plain strpos
mis-hits nibble-straddling FFC0 strings inside entropy data).
Covered-shape note (like the parse_* oracles): this assumes no aligned
FFC0/FFC2 byte pair precedes the real SOF segment, which holds for
every file our encoder emits (APP0/DQT precede SOF and contain none;
entropy data only follows SOS, which follows SOF); the Spark side
walks the segment chain properly (sources/decode.py:jpeg_dimensions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..fixtures.shared import media_fixture_path
from . import register

_MEDIA_PARQUET = media_fixture_path()

_PNG_SIG_HEX = "89504E470D0A1A0A"

# Shared CTE: hex view + format detection + header dims.
_META_CTE = f"""
WITH m AS (
  SELECT media_ref, image_bytes, hex(image_bytes) AS hx
  FROM read_parquet('{_MEDIA_PARQUET}')
),
t AS (
  SELECT media_ref, image_bytes, hx,
    CASE WHEN substring(hx, 1, 16) = '{_PNG_SIG_HEX}' THEN 'png'
         WHEN substring(hx, 1, 4) = 'FFD8' THEN 'jpeg'
         ELSE 'unknown' END AS format,
    -- First BYTE-ALIGNED SOF0/SOF2 marker: the lazy pair-quantifier
    -- forces even hex offsets, so 'FFC0' strings that straddle two
    -- bytes inside entropy data can never match (a plain strpos does
    -- mis-hit those on multi-scan/color files).
    length(regexp_extract(hx, '^(?:..)*?FFC[02]', 0)) - 3 AS sof
  FROM m
),
meta AS (
  SELECT media_ref, image_bytes, hx, format,
    CAST(CASE format
      WHEN 'png' THEN CAST(('0x' || substring(hx, 33, 8)) AS BIGINT)
      WHEN 'jpeg' THEN CAST(('0x' || substring(hx, sof + 14, 4)) AS BIGINT)
      ELSE 0 END AS INTEGER) AS width,
    CAST(CASE format
      WHEN 'png' THEN CAST(('0x' || substring(hx, 41, 8)) AS BIGINT)
      WHEN 'jpeg' THEN CAST(('0x' || substring(hx, sof + 10, 4)) AS BIGINT)
      ELSE 0 END AS INTEGER) AS height,
    CAST(CASE format
      WHEN 'png' THEN CAST(('0x' || substring(hx, 49, 2)) AS BIGINT)
      WHEN 'jpeg' THEN CAST(('0x' || substring(hx, sof + 8, 2)) AS BIGINT)
      ELSE 0 END AS INTEGER) AS bit_depth,
    CAST(CASE format
      WHEN 'png' THEN CASE substring(hx, 51, 2)
        WHEN '00' THEN 1 WHEN '02' THEN 3 WHEN '03' THEN 1
        WHEN '04' THEN 2 WHEN '06' THEN 4 ELSE 0 END
      WHEN 'jpeg' THEN CAST(('0x' || substring(hx, sof + 18, 2)) AS BIGINT)
      ELSE 0 END AS INTEGER) AS n_channels,
    octet_length(image_bytes) AS n_bytes,
    md5(hx) AS content_md5
  FROM t
)
"""


@register(
    "media_metadata",
    _META_CTE
    + """
    SELECT media_ref, format, width, height, bit_depth, n_channels, n_bytes, content_md5
    FROM meta ORDER BY media_ref
    """,
    doc="Typed metadata for every media row (mixed PNG + gray/color "
    "baseline/progressive JPEG + covers), HASH-CHECKED against a "
    "byte-slicing DuckDB oracle over the shared fixture parquet: PNG "
    "IHDR ints at fixed hex offsets, JPEG SOF located at the first "
    "FFC0/FFC2 marker, channel count from the SOF component count / "
    "IHDR color type, content hash = md5 of the uppercase hex "
    "(DuckDB's md5 takes no BLOBs). Spark side is the single-scan "
    "mapInPandas header kernel used by the engine proper.",
    tags=("multimodal",),
)
def media_metadata_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.multimodal import media_metadata

    media = spark.read.parquet(_MEDIA_PARQUET)
    # no cosmetic orderBy: range-sampling would re-execute the header
    # kernel, and the driver compare is order-insensitive
    return media_metadata(media, hex_hash=True)


@register(
    "cover_metadata",
    _META_CTE
    + """
    , cand AS (
      SELECT *,
        CASE WHEN media_ref LIKE '%#capa%' THEN split_part(media_ref, '#', 1)
             ELSE regexp_replace(media_ref, '(^|/)capa[^/]*/.*$', '') END AS doc_id
      FROM meta
      WHERE regexp_matches(media_ref, '(^|[/#])capa([^/]*)(/|$)')
    ),
    first AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY media_ref) AS rn
      FROM cand
    ),
    thumbed AS (
      SELECT doc_id, media_ref,
             regexp_replace(media_ref, '^.*/', '') AS file_name,
             'jpg' AS extension,
             width AS orig_w, height AS orig_h,
             GREATEST(1, CAST(CEIL(GREATEST(width, height) / 616.0) AS INTEGER)) AS f
      FROM first WHERE rn = 1
    )
    SELECT doc_id, media_ref, file_name, extension, orig_w, orig_h,
           CAST(orig_w // f AS INTEGER) AS thumb_w,
           CAST(orig_h // f AS INTEGER) AS thumb_h
    FROM thumbed ORDER BY doc_id
    """,
    doc="S6 cover pipeline, metadata half, HASH-CHECKED: capa-marked "
    "rows -> first file per doc (min media_ref) -> original dims from "
    "the image header + the exact block-average thumbnail dimensions "
    "(f = ceil(max_side/616), floor-div), mirroring "
    "functions/covers.covers(). The thumbnail BYTES are asserted "
    "equal to the downscale kernel's output in tests/test_covers.py "
    "(bytes have no SQL twin).",
    tags=("multimodal", "sink"),
)
def cover_metadata_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.covers import covers

    media = spark.read.parquet(_MEDIA_PARQUET)
    return covers(media).select(
        "doc_id", "media_ref", "file_name", "extension",
        "orig_w", "orig_h", "thumb_w", "thumb_h",
    )


# --- audio / video (round 4: real RIFF decoders, no codec libs) ----------

from ..fixtures.shared import audio_fixture_path, video_fixture_path  # noqa: E402

_AUDIO_PARQUET = audio_fixture_path()
_VIDEO_PARQUET = video_fixture_path()


def _le_sql(byte_off: int, nbytes: int) -> str:
    """Little-endian unsigned int at a fixed byte offset (0-based) of
    the hex view — the RIFF twin of the big-endian PNG/JPEG slices
    above. Covered-shape note: fixed offsets assume the CANONICAL
    layouts our encoders emit (fixtures/wav.py 44-byte header,
    fixtures/avi.py avih at byte 24); the Spark kernels do real chunk
    walks and are tested on non-canonical layouts in pytest."""
    pos = 2 * byte_off + 1
    terms = [
        f"CAST(('0x' || substring(hx, {pos + 2 * i}, 2)) AS BIGINT) * {256 ** i}"
        for i in range(nbytes)
    ]
    return "(" + " + ".join(terms) + ")"


# 16-bit little-endian sample i (unsigned, sign-corrected by the CASE
# around it); repeated inline because SQL lambdas have no let-binding.
_V16 = (
    "CAST(('0x' || substring(hx, 89 + 4 * i, 2)) AS BIGINT) "
    "+ 256 * CAST(('0x' || substring(hx, 91 + 4 * i, 2)) AS BIGINT)"
)

_AUDIO_SQL = f"""
WITH m AS (
  SELECT media_ref, hex(image_bytes) AS hx
  FROM read_parquet('{_AUDIO_PARQUET}')
),
hdr AS (
  SELECT media_ref, hx,
         {_le_sql(22, 2)} AS ch,
         {_le_sql(24, 4)} AS rate,
         {_le_sql(34, 2)} AS bits,
         {_le_sql(40, 4)} AS dsize
  FROM m
),
samp AS (
  -- PCM decode as PER-ROW list ops: unnesting one row per sample would
  -- drag the multi-10-KB hex string into a 100k-row cross product
  -- (measured: minutes); list_transform keeps the string in one row.
  SELECT media_ref, ch, rate, bits, dsize,
    CASE WHEN bits = 16 THEN
      list_transform(generate_series(0, dsize // 2 - 1), i ->
        CASE WHEN ({_V16}) >= 32768 THEN ({_V16}) - 65536 ELSE ({_V16}) END)
    ELSE
      list_transform(generate_series(0, dsize - 1), i ->
        CAST(('0x' || substring(hx, 89 + 2 * i, 2)) AS BIGINT) - 128)
    END AS xs
  FROM hdr
),
agg AS (
  SELECT media_ref,
         CAST(list_sum(list_transform(xs, x -> x * x)) AS DOUBLE)
           / CAST(len(xs) AS DOUBLE) AS meansq,
         list_max(list_transform(xs, x -> abs(x))) AS peak
  FROM samp
)
SELECT h.media_ref,
       CAST(h.ch AS INTEGER) AS n_channels,
       CAST(h.rate AS INTEGER) AS sample_rate,
       CAST(h.bits AS INTEGER) AS bits,
       CAST(h.dsize // (h.bits // 8) // h.ch AS BIGINT) AS n_samples,
       CAST(h.dsize // (h.bits // 8) // h.ch AS DOUBLE)
         / CAST(h.rate AS DOUBLE) AS duration_s,
       sqrt(a.meansq) AS rms,
       CAST(a.peak AS BIGINT) AS peak
FROM hdr h JOIN agg a USING (media_ref)
ORDER BY h.media_ref
"""


@register(
    "audio_features",
    _AUDIO_SQL,
    doc="Audio decode + per-clip features over PCM WAV columns: the "
    "Spark kernel (functions/multimodal.py:audio_features) chunk-walks "
    "the RIFF container (fixtures/wav.py, pure numpy — no soundfile/"
    "librosa) and computes duration/rms/peak with exact arithmetic "
    "(int64 square-sum, one double division, one sqrt — a correctly-"
    "rounded IEEE primitive). The oracle RE-DECODES THE PCM SAMPLES IN "
    "SQL — little-endian hex slices unnested per sample, sign-"
    "corrected, aggregated — so rms/peak are hash-checked bit-for-bit "
    "against an independent byte-level decode, not just header "
    "arithmetic. Mixed 8/16-bit, mono/stereo, 4 sample rates.",
    tags=("multimodal", "audio"),
)
def audio_features_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.multimodal import audio_features

    return audio_features(spark.read.parquet(_AUDIO_PARQUET))


_VIDEO_SQL = f"""
WITH m AS (
  SELECT media_ref, hex(image_bytes) AS hx, octet_length(image_bytes) AS n_bytes
  FROM read_parquet('{_VIDEO_PARQUET}')
)
SELECT media_ref,
       CAST({_le_sql(48, 4)} AS INTEGER) AS n_frames,
       CAST({_le_sql(64, 4)} AS INTEGER) AS width,
       CAST({_le_sql(68, 4)} AS INTEGER) AS height,
       CAST(1000000 // {_le_sql(32, 4)} AS INTEGER) AS fps,
       n_bytes,
       md5(hx) AS content_md5
FROM m ORDER BY media_ref
"""


@register(
    "video_metadata",
    _VIDEO_SQL,
    doc="Typed metadata over MJPEG-AVI video columns. The oracle "
    "slices avih header ints at canonical offsets; the Spark kernel "
    "(functions/multimodal.py:video_metadata) deliberately does NOT "
    "read those fields — n_frames comes from the real RIFF walk over "
    "'00dc' chunks and width/height from DECODING frame 0 with the "
    "in-repo T.81 JPEG codec — so the hash check proves the container "
    "walk and the decoder agree with the declared header, not that "
    "two header parsers agree.",
    tags=("multimodal", "video"),
)
def video_metadata_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.multimodal import video_metadata

    return video_metadata(spark.read.parquet(_VIDEO_PARQUET))
