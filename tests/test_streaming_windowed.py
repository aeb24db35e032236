"""Watermarked windowed aggregation + applyInPandasWithState stateful
operator: batch-equivalence, late-data drop, and cross-restart state."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest

from mangaextractor_spark.streaming.windowed import (
    stream_user_running_totals,
    stream_windowed_event_stats,
    windowed_event_stats,
)

T0 = dt.datetime(2026, 1, 1, 12, 0, 0)


def _write_events(path, rows, fname="part-0.parquet"):
    path.mkdir(parents=True, exist_ok=True)
    pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).to_parquet(path / fname, coerce_timestamps="us", allow_truncated_timestamps=True)


def _mins(m):
    return T0 + dt.timedelta(minutes=m)


@pytest.fixture()
def events_rows():
    return [
        (1, _mins(0), 1, "view", 1.0, "{}"),
        (2, _mins(1), 2, "view", 2.0, "{}"),
        (3, _mins(6), 1, "buy", 10.0, "{}"),
        (4, _mins(7), 3, "view", 3.0, "{}"),
        (5, _mins(40), 1, "view", 4.0, "{}"),  # advances watermark far ahead
    ]


def test_windowed_stats_match_batch(spark, tmp_path, events_rows):
    src = tmp_path / "ev"
    _write_events(src, events_rows)
    q = stream_windowed_event_stats(
        spark, str(src), str(tmp_path / "out"), str(tmp_path / "ck")
    )
    q.awaitTermination(300)
    got = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    batch = windowed_event_stats(
        spark.createDataFrame(
            pd.DataFrame(
                events_rows,
                columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
            )
        ),
        "10 minutes",
        "5 minutes",
    )
    # Append mode only emits FINALIZED windows (older than the last
    # watermark); every emitted window must agree with the batch twin.
    exp = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in batch.collect()
    }
    assert len(got) > 0
    for k, v in got.items():
        assert exp[k] == v, k


def test_late_event_is_dropped(spark, tmp_path, events_rows):
    """An event arriving behind the watermark must not resurrect a
    finalized window (the late-data rule the watermark defines)."""
    src = tmp_path / "ev"
    _write_events(src, events_rows)
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    stream_windowed_event_stats(spark, str(src), out, ck).awaitTermination(300)
    n1 = spark.read.parquet(out).count()

    # watermark is now ~minute 30 (40 - 10); minute 2 is far too late
    _write_events(src, [(9, _mins(2), 9, "view", 99.0, "{}")], fname="late.parquet")
    stream_windowed_event_stats(spark, str(src), out, ck).awaitTermination(300)
    rows = spark.read.parquet(out).collect()
    # no new finalized window contains the late event's value
    assert not any(r.total_value == 99.0 for r in rows)
    assert spark.read.parquet(out).count() >= n1


def test_running_totals_accumulate_across_restarts(spark, tmp_path):
    """applyInPandasWithState: per-user state survives a stream restart
    via the checkpoint — batch 2 totals include batch 1's events."""
    src = tmp_path / "ev"
    _write_events(
        src,
        [
            (1, _mins(0), 7, "view", 1.5, "{}"),
            (2, _mins(1), 7, "view", 2.5, "{}"),
            (3, _mins(2), 8, "view", 10.0, "{}"),
        ],
    )
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    stream_user_running_totals(spark, str(src), out, ck).awaitTermination(300)
    t1 = {r.user_id: (r.n_events, r.total_value) for r in spark.read.parquet(out).collect()}
    assert t1[7] == (2, 4.0) and t1[8] == (1, 10.0)

    _write_events(
        src,
        [(4, _mins(3), 7, "buy", 6.0, "{}"), (5, _mins(4), 9, "view", 1.0, "{}")],
        fname="part-1.parquet",
    )
    stream_user_running_totals(spark, str(src), out, ck).awaitTermination(300)
    rows = spark.read.parquet(out).collect()
    by_user_latest = {}
    for r in rows:
        cur = by_user_latest.get(r.user_id)
        if cur is None or r.batch_id > cur.batch_id:
            by_user_latest[r.user_id] = r
    got = {u: (r.n_events, r.total_value) for u, r in by_user_latest.items()}
    assert got[7] == (3, 10.0)  # cumulative across the restart
    assert got[8] == (1, 10.0)
    assert got[9] == (1, 1.0)


def test_stream_dedup_drops_replayed_events(spark, tmp_path):
    """dropDuplicatesWithinWatermark: an at-least-once source replays
    events (same event_id, possibly in a later file/micro-batch within
    the watermark); the deduped output carries each event_id once and
    equals the batch dropDuplicates twin."""
    from mangaextractor_spark.streaming.dedup import stream_dedup_events

    src = tmp_path / "ev"
    rows = [
        (1, _mins(0), 1, "view", 1.0, "{}"),
        (2, _mins(1), 2, "view", 2.0, "{}"),
        (2, _mins(1), 2, "view", 2.0, "{}"),  # same-file duplicate
        (3, _mins(2), 1, "buy", 10.0, "{}"),
    ]
    _write_events(src, rows)
    # replayed delivery of ids 1 and 3 in a SECOND file (same event time,
    # well within the watermark) + one genuinely new event
    _write_events(
        src,
        [
            (1, _mins(0), 1, "view", 1.0, "{}"),
            (3, _mins(2), 1, "buy", 10.0, "{}"),
            (4, _mins(3), 3, "view", 3.0, "{}"),
        ],
        fname="replay.parquet",
    )
    q = stream_dedup_events(
        spark, str(src), str(tmp_path / "out"), str(tmp_path / "ck"),
        max_files_per_trigger=1,
    )
    q.awaitTermination(300)
    out = spark.read.parquet(str(tmp_path / "out")).collect()
    ids = sorted(r.event_id for r in out)
    assert ids == [1, 2, 3, 4]  # each exactly once despite replays
    batch = (
        spark.createDataFrame(
            pd.DataFrame(
                rows + [(4, _mins(3), 3, "view", 3.0, "{}")],
                columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
            )
        )
        .dropDuplicates(["event_id"])
        .collect()
    )
    assert sorted((r.event_id, r.value) for r in out) == sorted(
        (r.event_id, r.value) for r in batch
    )
