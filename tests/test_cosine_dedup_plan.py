"""Scale-hygiene plan gate for the exact cosine near-dup baseline.

Round-4 verdict item 2: ``dedup_embedding_cosine`` must not force a
broadcast of its candidate-pair subtree — candidate counts are
data-dependent and unbounded at corpus scale, so the choice belongs to
AQE at runtime, never to a static hint. With
``spark.sql.autoBroadcastJoinThreshold=-1`` the static physical plan
must therefore contain no BroadcastHashJoin at all; results must be
unchanged either way.
"""

from __future__ import annotations

import pytest

from mangaextractor_spark.queries import REGISTRY

SF = "/root/testdata/sf0.01"


@pytest.fixture()
def no_auto_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_no_forced_broadcast_of_candidate_subtree(spark, no_auto_broadcast):
    df = REGISTRY["dedup_embedding_cosine"].spark(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan, (
        "candidate subtree must not be statically broadcast when "
        "autoBroadcastJoinThreshold=-1 (an unbounded intermediate); "
        "AQE alone may promote it at runtime"
    )


def test_results_unchanged_without_broadcast(spark, no_auto_broadcast):
    rows = {
        (r.a_id, r.b_id, r.sim)
        for r in REGISTRY["dedup_embedding_cosine"].spark(spark, SF).collect()
    }
    assert len(rows) > 0
    # Re-run with the default threshold (AQE free to broadcast): same set.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    rows2 = {
        (r.a_id, r.b_id, r.sim)
        for r in REGISTRY["dedup_embedding_cosine"].spark(spark, SF).collect()
    }
    assert rows == rows2
