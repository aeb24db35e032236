"""Behavioral analytics: ordered funnel + retention cohorts. Oracle
parity rides test_queries_oracle.py; these pin the semantics against
an independent pandas recompute and the window-free plan shape.
"""

from __future__ import annotations

import pandas as pd

from mangaextractor_spark.queries.funnels import (
    FUNNEL_STEPS,
    FUNNEL_WINDOW_HOURS,
    RETENTION_EVENT,
    funnel_steps,
    retention_cohorts,
)


def test_funnel_matches_pandas_recompute(spark, sf_medium):
    rows = {r["step"]: r for r in funnel_steps(spark, sf_medium).collect()}
    ev = pd.read_parquet(f"{sf_medium}/events.parquet")
    win = pd.Timedelta(hours=FUNNEL_WINDOW_HOURS)
    t1 = (
        ev[ev.event_type == FUNNEL_STEPS[0]].groupby("user_id")["ts"].min()
    )
    c2 = ev[ev.event_type == FUNNEL_STEPS[1]].merge(
        t1.rename("t1"), left_on="user_id", right_index=True
    )
    t2 = (
        c2[(c2.ts > c2.t1) & (c2.ts <= c2.t1 + win)].groupby("user_id")["ts"].min()
    )
    c3 = ev[ev.event_type == FUNNEL_STEPS[2]].merge(
        t2.rename("t2"), left_on="user_id", right_index=True
    )
    t3 = (
        c3[(c3.ts > c3.t2) & (c3.ts <= c3.t2 + win)].groupby("user_id")["ts"].min()
    )
    assert rows[1]["n_users"] == len(t1)
    assert rows[2]["n_users"] == len(t2)
    assert rows[3]["n_users"] == len(t3)
    # the fixture funnel must be selective, not degenerate
    assert len(t1) > len(t2) > len(t3) > 0
    assert rows[2]["conv_from_prev_e6"] == (1_000_000 * len(t2)) // len(t1)
    assert rows[3]["conv_from_prev_e6"] == (1_000_000 * len(t3)) // len(t2)


def test_funnel_plan_has_no_event_sequence_window(spark, sf_medium):
    plan = (
        funnel_steps(spark, sf_medium)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the only Window is the 3-row LAG over the step summary: it must
    # sit ABOVE the union of the three 1-row aggregates
    assert plan.count("Window") <= 1
    if "Window" in plan:
        below = plan[plan.index("Window"):]
        assert "Union" in below


def test_retention_matches_pandas_recompute(spark, sf_medium):
    out = {
        (r["cohort_week"], r["week_offset"]): r
        for r in retention_cohorts(spark, sf_medium).collect()
    }
    ev = pd.read_parquet(f"{sf_medium}/events.parquet")
    p = ev[ev.event_type == RETENTION_EVENT].copy()
    p["week"] = p.ts.dt.to_period("W-SUN").dt.start_time.dt.date  # ISO Monday
    first = p.groupby("user_id")["week"].min().rename("cohort")
    act = p[["user_id", "week"]].drop_duplicates().merge(
        first, left_on="user_id", right_index=True
    )
    act["offset"] = act.apply(
        lambda r: (r["week"] - r["cohort"]).days // 7, axis=1
    )
    sizes = first.value_counts()
    cells = act.groupby(["cohort", "offset"]).size()
    assert len(out) == len(cells)
    for (cohort, offset), n in cells.items():
        r = out[(str(cohort), offset)]
        assert r["n_active"] == n
        assert r["cohort_size"] == sizes[cohort]
        assert r["retained_e6"] == (1_000_000 * n) // sizes[cohort]
    # real decay must exist in the fixture
    assert any(r["retained_e6"] < 1_000_000 for r in out.values())


def test_retention_plan_is_window_free(spark, sf_medium):
    plan = (
        retention_cohorts(spark, sf_medium)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan
