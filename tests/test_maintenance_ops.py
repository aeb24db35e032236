"""Maintenance / governance operators: compaction planner, DQ audit,
temperature sampling weights. Oracle parity is covered by the
parametrized harness in test_queries_oracle.py; these tests pin the
semantic invariants and the plan shapes the docstrings claim.
"""

from __future__ import annotations

from mangaextractor_spark.queries.maintenance import (
    COMPACT_BUCKETS,
    SAMPLE_BUDGET,
    TARGET_BYTES,
    TEMP_SCALE,
    compaction_plan,
    dq_audit,
    temperature_sampling_weights,
)


def test_compaction_plan_is_start_offset_binning(spark, sf_medium):
    """Recompute the greedy packing in plain Python from the plan's own
    per-bin rows: within a source, bins must tile the file range in
    order, and every bin's START offset must be a multiple boundary of
    TARGET_BYTES over the running byte total."""
    rows = compaction_plan(spark, sf_medium).collect()
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r["source"], []).append(r)
    assert by_source
    for source, bins in by_source.items():
        bins.sort(key=lambda r: r["bin_id"])
        # bins tile the bucket range without overlap
        for a, b in zip(bins, bins[1:]):
            assert a["file_hi"] < b["file_lo"], source
        running = 0
        for r in bins:
            assert r["bin_id"] == running // TARGET_BYTES, (source, r)
            assert 0 <= r["file_lo"] <= r["file_hi"] < COMPACT_BUCKETS
            assert r["n_files"] >= 1 and r["bin_bytes"] > 0
            running += r["bin_bytes"]


def test_compaction_window_rides_the_manifest(spark, sf_medium):
    """The running-sum window must sit ABOVE the manifest aggregation
    (file-count-sized input), never over corpus rows: in the physical
    plan the Window's subtree contains the groupBy's HashAggregate."""
    plan = (
        compaction_plan(spark, sf_medium)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" in plan
    below_window = plan[plan.index("Window"):]
    assert "HashAggregate" in below_window


def test_dq_audit_values_and_plan(spark, sf_medium):
    import duckdb

    rows = {r["column_name"]: r for r in dq_audit(spark, sf_medium).collect()}
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM '{sf_medium}/orders.parquet'"
    )
    n, nd_key, mn_key, mx_key = con.execute(
        "SELECT COUNT(*), COUNT(DISTINCT o_orderkey), MIN(o_orderkey), "
        "MAX(o_orderkey) FROM orders"
    ).fetchone()
    r = rows["o_orderkey"]
    assert r["n_rows"] == n and r["n_nulls"] == 0
    assert r["n_distinct"] == nd_key
    assert r["min_value"] == str(mn_key) and r["max_value"] == str(mx_key)
    # melt adds no exchange above the aggregate: stack generates rows
    # from the ONE aggregate row; only the presentation sort follows
    plan = (
        dq_audit(spark, sf_medium)._jdf.queryExecution().executedPlan().toString()
    )
    assert "stack" in plan
    above = plan[: plan.index("stack")]
    assert "Exchange hashpartitioning" not in above
    assert "Window" not in plan


def test_temperature_weights_invariants(spark, sf_medium):
    import math

    rows = temperature_sampling_weights(spark, sf_medium).collect()
    assert len(rows) >= 2
    tot = sum(r["w_e6"] for r in rows)
    for r in rows:
        assert r["w_e6"] == math.floor(math.sqrt(float(r["n_docs"])) * TEMP_SCALE)
        assert r["share_e6"] == (TEMP_SCALE * r["w_e6"]) // tot
        assert r["expected_docs"] == (SAMPLE_BUDGET * r["w_e6"]) // tot
    # floor division under-allocates, never over
    assert sum(r["expected_docs"] for r in rows) <= SAMPLE_BUDGET
    # alpha=0.5 compresses: the head language's expected share is below
    # its proportional share, every tail language's is above
    n_tot = sum(r["n_docs"] for r in rows)
    head = max(rows, key=lambda r: r["n_docs"])
    for r in rows:
        prop = r["n_docs"] / n_tot
        temp = r["w_e6"] / tot
        if r is head:
            assert temp < prop
        elif r["n_docs"] < head["n_docs"]:
            assert temp > prop


def test_snapshot_drift_invariants(spark, sf_medium):
    from mangaextractor_spark.queries.maintenance import snapshot_drift

    rows = snapshot_drift(spark, sf_medium).collect()
    assert len(rows) >= 2
    for r in rows:
        # base is a subset of current
        assert 0 <= r["base_n"] <= r["cur_n"]
        # shares are e6-scaled fractions
        assert 0 <= r["base_share_e6"] <= 1_000_000
        assert 0 <= r["cur_share_e6"] <= 1_000_000
        assert r["share_drift_e6"] == r["cur_share_e6"] - r["base_share_e6"]
    # the hash slice is ~80%: loose band, deterministic per corpus
    base_tot = sum(r["base_n"] for r in rows)
    cur_tot = sum(r["cur_n"] for r in rows)
    assert 0.7 < base_tot / cur_tot < 0.9


def test_caption_candidates_alignment(spark, sf_medium):
    """Every image span pairs with the nearest PRECEDING non-empty
    text span; docs whose tail slice is empty (short docs) emit NULL
    captions — both branches must be present in the fixture corpus."""
    from mangaextractor_spark.queries.main_content import caption_candidates

    df = caption_candidates(spark, sf_medium)
    rows = df.collect()
    assert rows
    with_cap = [r for r in rows if r["caption"] is not None]
    without = [r for r in rows if r["caption"] is None]
    assert with_cap and without, "fixture must exercise both branches"
    for r in with_cap:
        # fixture geometry: text span at offset 10, image at 20
        assert r["gap"] == 10 and r["n_candidates"] == 1
        assert r["caption"] != ""
    for r in without:
        assert r["gap"] is None and r["n_candidates"] == 0
    # zero-exchange plan: array ops + one explode, no window/join/shuffle
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
    assert "Window" not in plan
    assert "Join" not in plan
