"""Plan + semantics gates for the TPC-H Q16/Q20/Q22-shaped queries.

The decorrelation shapes carry explicit scale claims in their
docstrings; these tests pin the claims to the physical plan:

- ``dominant_supplier_share``: the per-part totals branch must
  re-aggregate the persisted (part,supplier) partials, NOT re-scan
  lineitem (Spark's ReuseExchange does not match the two subtrees, so
  without the persist the lineitem scan + partial agg runs twice).
- ``parts_supplier_counts``: the blocked-supplier exclusion must be a
  LEFT ANTI join, never a per-row NOT IN probe.
- ``prospective_customers``: the above-segment-average predicate is
  exact DECIMAL cross-multiplication — verified against an independent
  pandas recompute (no division anywhere until the output cast).
"""

from __future__ import annotations

import pandas as pd

from mangaextractor_spark.queries import REGISTRY

SF = "/root/testdata/sf0.01"


def test_dominant_supplier_single_lineitem_scan(spark):
    df = REGISTRY["dominant_supplier_share"].spark(spark, SF)
    df.collect()  # materialize so AQE finalizes and the cache is built
    plan = df._jdf.queryExecution().executedPlan().toString()
    # Both consumers of the (part,supplier) partials read the cache.
    assert plan.count("InMemoryTableScan") >= 2
    spark.catalog.clearCache()


def test_parts_supplier_counts_is_anti_join(spark):
    df = REGISTRY["parts_supplier_counts"].spark(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan
    # The distinct-supplier count is the two-phase Expand aggregate or a
    # distinct-input HashAggregate; either way it is a partial-capable
    # aggregate, not a global collect.
    assert "HashAggregate" in plan


def test_prospective_customers_matches_pandas(spark):
    got = {
        r.segment: (r.n_customers, r.total_bal)
        for r in REGISTRY["prospective_customers"].spark(spark, SF).collect()
    }
    c = pd.read_parquet(f"{SF}/customer.parquet")
    o = pd.read_parquet(f"{SF}/orders.parquet")
    cents = (c.c_acctbal * 100).round().astype("int64")  # exact 2dp fixed-point
    pos = c[c.c_acctbal > 0]
    seg_sum = (pos.c_acctbal * 100).round().astype("int64").groupby(pos.c_mktsegment).sum()
    seg_cnt = pos.groupby("c_mktsegment").size()
    recent = o[o.o_orderdate >= pd.Timestamp("2000-01-01")]
    no_orders = ~c.c_custkey.isin(set(recent.o_custkey))
    above = c.c_mktsegment.map(seg_cnt).fillna(0).astype("int64") * cents > c.c_mktsegment.map(
        seg_sum
    ).fillna(0).astype("int64")
    sel = c[no_orders & above]
    want = {
        seg: (int(n), round(float(total) / 100.0, 10))
        for seg, (n, total) in pd.DataFrame(
            {
                "n": sel.groupby("c_mktsegment").size(),
                "t": (sel.c_acctbal * 100).round().astype("int64").groupby(sel.c_mktsegment).sum(),
            }
        )
        .apply(lambda r: (r.n, r.t), axis=1)
        .items()
    }
    assert set(got) == set(want)
    for seg, (n, total) in want.items():
        assert got[seg][0] == n
        assert abs(got[seg][1] - total) < 1e-9


def test_priority_sample_is_size_biased_topk(spark):
    """Priority sampling: inclusion ∝ weight, plan is TakeOrdered."""
    import pandas as pd

    df = REGISTRY["priority_sample"].spark(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # never a global sort
    got = df.toPandas()
    assert len(got) == 200
    corpus = pd.read_parquet(f"{SF}/documents.parquet")
    # Size-biased draw: the sampled mean weight must exceed the corpus
    # mean (by ~E[w^2]/E[w] vs E[w]); a uniform draw of 200/500 docs
    # would match the corpus mean in expectation.
    assert got.weight.mean() > corpus.n_chars.mean()
    # Deterministic: re-running yields the identical member set.
    again = REGISTRY["priority_sample"].spark(spark, SF).toPandas()
    assert set(got.doc_id) == set(again.doc_id)


def test_jaccard_prefix_join_boundary_and_prefix_math(spark):
    """J == t exactly is included (>=); prefix length matches ceil math."""
    import math

    from pyspark.sql import functions as F

    # prefix length expression vs math.ceil for n = 1..50, t = 1/2
    rows = spark.range(1, 51).select(
        F.col("id").alias("n"),
        F.expr("cast(id - ((1*id + 1) div 2) + 1 as int)").alias("p"),
    ).collect()
    for r in rows:
        assert r.p == r.n - math.ceil(r.n / 2) + 1

    got = {
        (r.a_id, r.b_id): (r.n_common, r.jaccard)
        for r in REGISTRY["jaccard_prefix_join"].spark(spark, SF).collect()
    }
    # Every returned pair satisfies the exact integer threshold 3c >= na+nb,
    # i.e. J >= 1/2 with the boundary included.
    for (a, b), (c, j) in got.items():
        assert j >= 0.5 - 1e-9
    assert len(got) == 25  # brute-force count at sf0.01 (oracle-verified too)
