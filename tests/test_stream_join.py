"""Stream-stream attribution join: batch parity on a single drop,
exactly-once across a restart, and bounded-state declarations present
(watermarks + event-time range predicate)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mangaextractor_spark.streaming.stream_join import (
    batch_attribution_join,
    stream_attribution_join,
)


def _split(spark, sf_small):
    ev = spark.read.parquet(f"{sf_small}/events.parquet").select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"), "user_id",
        "event_type", "value",
    )
    return ev.filter("event_type = 'view'"), ev.filter("event_type = 'purchase'")


def _run(spark, vdir, pdir, out, ckpt):
    q = stream_attribution_join(spark, vdir, pdir, out, ckpt)
    q.awaitTermination(180)
    return spark.read.parquet(out)


def test_stream_join_equals_batch(spark, sf_small, tmp_path):
    views, purchases = _split(spark, sf_small)
    vdir, pdir = str(tmp_path / "v"), str(tmp_path / "p")
    views.coalesce(1).write.parquet(vdir)
    purchases.coalesce(1).write.parquet(pdir)
    got = _run(spark, vdir, pdir, str(tmp_path / "out"), str(tmp_path / "ck"))
    want = batch_attribution_join(views, purchases)
    key = lambda r: (r["user_id"], r["view_id"], r["purchase_id"], r["gap_us"])  # noqa: E731
    g, w = sorted(map(key, got.collect())), sorted(map(key, want.collect()))
    assert g == w and len(g) > 0


def test_stream_join_restart_exactly_once(spark, sf_small, tmp_path):
    """Purchases arrive in two drops with a restart in between. The
    watermark advanced by drop 1 may legitimately EVICT old buffered
    views / reject too-late drop-2 purchases — that is the bounded-state
    contract, not a bug — so the assertions are watermark-aware:
    every drop-1 x drop-1 match is present (nothing was evicted during
    batch one), nothing outside the batch join ever appears, and no
    match is duplicated by the restart replay."""
    views, purchases = _split(spark, sf_small)
    vdir, pdir = str(tmp_path / "v"), str(tmp_path / "p")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    views.coalesce(1).write.parquet(vdir)
    p1 = purchases.filter("event_id % 2 = 0")
    p2 = purchases.filter("event_id % 2 = 1")
    p1.coalesce(1).write.mode("append").parquet(pdir)
    first = _run(spark, vdir, pdir, out, ckpt)
    n_first = first.count()
    p2.coalesce(1).write.mode("append").parquet(pdir)
    got = _run(spark, vdir, pdir, out, ckpt)

    key = lambda r: (r["user_id"], r["view_id"], r["purchase_id"], r["gap_us"])  # noqa: E731
    g = list(map(key, got.collect()))
    assert len(g) == len(set(g)), "restart replay duplicated matches"
    assert len(g) >= n_first, "restart lost already-committed matches"
    want_all = set(map(key, batch_attribution_join(views, purchases).collect()))
    want_d1 = set(map(key, batch_attribution_join(views, p1).collect()))
    assert set(g) <= want_all, "stream emitted a pair the batch join does not contain"
    assert want_d1 <= set(g), "a drop-1 match went missing (no eviction could apply yet)"
    assert len(want_d1) > 0


def test_stream_join_declares_bounded_state(spark, sf_small, tmp_path):
    """The physical streaming plan must carry BOTH state bounds: the
    watermark on each side and the event-time range in the join —
    without them the state store grows without bound."""
    from mangaextractor_spark.streaming.stream_join import _JOIN_COND

    assert "BETWEEN" in _JOIN_COND and "INTERVAL" in _JOIN_COND
    views, purchases = _split(spark, sf_small)
    vdir, pdir = str(tmp_path / "v"), str(tmp_path / "p")
    views.coalesce(1).write.parquet(vdir)
    purchases.coalesce(1).write.parquet(pdir)
    q = stream_attribution_join(
        spark, vdir, pdir, str(tmp_path / "out"), str(tmp_path / "ck")
    )
    try:
        q.processAllAvailable()
        plan = q.explain(extended=False) or ""
        # explain() prints; fall back to lastProgress plan attributes
        prog = q.lastProgress
        assert prog is not None
        op = (prog.get("stateOperators") or [{}])[0]
        assert op.get("operatorName", "").lower().startswith("symmetrichashjoin") or \
            "join" in op.get("operatorName", "").lower()
        # watermark actually advanced (both inputs carried one)
        assert "watermark" in (prog.get("eventTime") or {})
    finally:
        q.stop()
