"""Streaming session windows: exact-gap boundary semantics, watermark
close-out, and batch-twin parity from the shared transformation."""

from __future__ import annotations

import datetime as dt

import pandas as pd

from mangaextractor_spark.streaming.sessions import session_stats, stream_session_stats

T0 = dt.datetime(2026, 1, 1, 12, 0, 0)


def _mins(m):
    return T0 + dt.timedelta(minutes=m)


def _write_events(path, rows, fname="part-0.parquet"):
    path.mkdir(parents=True, exist_ok=True)
    pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).to_parquet(path / fname, coerce_timestamps="us", allow_truncated_timestamps=True)


ROWS = [
    (1, _mins(0), 1, "view", 1.0, "{}"),
    (2, _mins(29), 1, "view", 2.0, "{}"),  # 29 < 30 min gap: merges
    (3, _mins(59), 1, "buy", 10.0, "{}"),  # EXACTLY 30 min after #2: still merges
    (4, _mins(89) + dt.timedelta(seconds=1), 1, "view", 5.0, "{}"),  # 30m+1s: NEW session
    (5, _mins(5), 2, "view", 3.0, "{}"),
    # sentinel far ahead: advances the watermark past every real session
    (6, _mins(60 * 24 * 10), 99, "view", 0.0, "{}"),
]


def test_session_window_exact_gap_boundary(spark, tmp_path):
    """Pins the boundary rule the registered oracle states: Spark merges
    INCLUSIVELY (an event exactly at prev + 30 min extends the session);
    only a strictly larger gap — here 30 min + 1 s — starts a new one.
    Same > split rule as the hand-rolled event_sessions."""
    src = tmp_path / "ev"
    _write_events(src, ROWS[:5])
    got = session_stats(spark.createDataFrame(
        pd.DataFrame(ROWS[:5], columns=["event_id", "ts", "user_id", "event_type", "value", "props"])
    )).orderBy("user_id", "session_start").collect()
    u1 = [r for r in got if r.user_id == 1]
    assert len(u1) == 2
    assert (u1[0].session_start, u1[0].n_events, u1[0].value_sum) == (_mins(0), 3, 13.0)
    assert u1[0].session_end == _mins(59 + 30)
    assert (u1[1].session_start, u1[1].n_events) == (_mins(89) + dt.timedelta(seconds=1), 1)


def test_stream_sessions_match_batch_twin(spark, tmp_path):
    src = tmp_path / "ev"
    _write_events(src, ROWS)
    q = stream_session_stats(
        spark, str(src), str(tmp_path / "out"), str(tmp_path / "ck"), watermark="1 minute"
    )
    q.awaitTermination(300)
    got = spark.read.parquet(str(tmp_path / "out")).orderBy("user_id", "session_start")
    rows = [(r.user_id, r.session_start, r.session_end, r.n_events, r.value_sum)
            for r in got.collect()]
    # batch twin on the same input, minus the sentinel's still-open session
    batch = session_stats(
        spark.read.parquet(str(src))
    ).filter("user_id <> 99").orderBy("user_id", "session_start")
    want = [(r.user_id, r.session_start, r.session_end, r.n_events, r.value_sum)
            for r in batch.collect()]
    assert rows == want
    assert len(rows) == 3  # two sessions for user 1 (boundary split), one for user 2


def test_stream_sessions_resume_extends_open_session(spark, tmp_path):
    """A restart must NOT re-emit closed sessions, and an event arriving
    in the second run that is within-gap of a still-open session extends
    it (session state lives in the checkpoint)."""
    src = tmp_path / "ev"
    # Run 1: user 7's session is NOT closeable (nothing past its end).
    _write_events(src, [
        (1, _mins(0), 7, "view", 1.0, "{}"),
        (2, _mins(10), 8, "view", 2.0, "{}"),
    ])
    q = stream_session_stats(
        spark, str(src), str(tmp_path / "out"), str(tmp_path / "ck"), watermark="1 minute"
    )
    q.awaitTermination(300)
    # Run 2: extend user 7's open session, then a sentinel closes all.
    _write_events(src, [
        (3, _mins(20), 7, "view", 4.0, "{}"),
        (4, _mins(60 * 24), 99, "view", 0.0, "{}"),
    ], fname="part-1.parquet")
    q = stream_session_stats(
        spark, str(src), str(tmp_path / "out"), str(tmp_path / "ck"), watermark="1 minute"
    )
    q.awaitTermination(300)
    got = spark.read.parquet(str(tmp_path / "out")).filter("user_id = 7").collect()
    assert len(got) == 1
    r = got[0]
    assert (r.session_start, r.session_end, r.n_events, r.value_sum) == (
        _mins(0), _mins(50), 2, 5.0,
    )
