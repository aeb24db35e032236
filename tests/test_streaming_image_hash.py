"""Streaming image dHash: stream/batch parity (shared dhash_frame),
exactly-once restart via the file-sink log, and compatibility of the
streamed hash table with the batch pair join."""

from __future__ import annotations

from pyspark.sql import functions as F

from mangaextractor_spark.fixtures.shared import phash_fixture_path
from mangaextractor_spark.kernels.phash import HAM_T, N_BANDS
from mangaextractor_spark.queries.image_dedup import dhash_frame
from mangaextractor_spark.streaming.image_hash import stream_image_dhash


def _media(spark):
    return spark.read.parquet(phash_fixture_path()).select("media_ref", "image_bytes")


def _rows(df):
    return {
        r["media_ref"]: tuple(r[c] for c in ["width", "height"] + [f"b{k}" for k in range(N_BANDS)])
        for r in df.collect()
    }


def test_stream_hash_equals_batch_and_restart(spark, tmp_path):
    media = _media(spark)
    first = media.filter(F.col("media_ref").startswith("img/page"))
    second = media.filter(F.col("media_ref").startswith("img/flat"))
    media_dir, out, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")

    first.coalesce(1).write.mode("append").parquet(media_dir)
    q = stream_image_dhash(spark, media_dir, out, ckpt)
    q.awaitTermination(120)
    assert _rows(spark.read.parquet(out)) == _rows(dhash_frame(first))

    # drop 2 after restart: the flat family; drop 1 must not re-decode
    second.coalesce(1).write.mode("append").parquet(media_dir)
    q = stream_image_dhash(spark, media_dir, out, ckpt)
    q.awaitTermination(120)
    got = spark.read.parquet(out).toPandas()
    assert len(got) == first.count() + second.count()
    assert got["media_ref"].is_unique, "file-sink log must dedupe replayed batches"
    assert _rows(spark.read.parquet(out)) == _rows(dhash_frame(media))


def test_streamed_hashes_feed_batch_pair_join(spark, tmp_path):
    """The streamed output schema/content slots directly into the
    pair-join half of image_dhash_pairs: planted near-dup variants are
    found from the STREAMED table (no re-decode)."""
    media = _media(spark)
    media_dir, out, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")
    media.coalesce(1).write.parquet(media_dir)
    q = stream_image_dhash(spark, media_dir, out, ckpt)
    q.awaitTermination(120)
    hashes = spark.read.parquet(out)
    a = hashes.select(
        F.col("media_ref").alias("a_ref"), *[F.col(f"b{k}").alias(f"a_b{k}") for k in range(N_BANDS)]
    )
    b = hashes.select(
        F.col("media_ref").alias("b_ref"), *[F.col(f"b{k}").alias(f"b_b{k}") for k in range(N_BANDS)]
    )
    ham = sum(
        F.bit_count(F.col(f"a_b{k}").bitwiseXOR(F.col(f"b_b{k}"))) for k in range(N_BANDS)
    )
    pairs = (
        a.crossJoin(b)
        .filter(F.col("a_ref") < F.col("b_ref"))
        .filter(ham <= HAM_T)
        .filter(F.col("a_ref").startswith("img/page") & F.col("b_ref").startswith("img/page"))
    )
    assert pairs.count() >= 5
