"""Model-application operators: quantized linear classifier +
vocabulary coverage. Oracle parity rides the parametrized harness in
test_queries_oracle.py; these pin semantics and plan shape.
"""

from __future__ import annotations

import duckdb

from mangaextractor_spark.queries.scoring import (
    B_BIAS,
    TOKEN_CAP,
    VOCAB_K,
    W_PUNCT_E6,
    W_STOP_E6,
    W_TOKENS,
    quality_classifier_scores,
    vocab_coverage,
)


def test_classifier_score_is_the_declared_dot_product(spark, sf_medium):
    rows = quality_classifier_scores(spark, sf_medium).collect()
    assert rows
    keeps = {r["keep"] for r in rows}
    assert keeps == {True, False}, "bias must split the fixture corpus"
    for r in rows:
        assert 0 <= r["t_cap"] <= TOKEN_CAP
        assert 0 <= r["stop_e6"] <= 1_000_000
        assert 0 <= r["punct_e6"] <= 1_000_000
        expect = (
            W_TOKENS * r["t_cap"]
            + W_STOP_E6 * r["stop_e6"]
            + W_PUNCT_E6 * r["punct_e6"]
            - B_BIAS
        )
        assert r["score"] == expect
        assert r["keep"] == (expect >= 0)


def test_classifier_plan_is_one_map_side_scan(spark, sf_medium):
    plan = (
        quality_classifier_scores(spark, sf_medium)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # zero shuffles except the presentation sort's range partitioning
    assert "Exchange hashpartitioning" not in plan
    assert "Window" not in plan
    assert "Join" not in plan


def test_vocab_coverage_matches_python_recompute(spark, sf_medium):
    rows = {r["lang"]: r for r in vocab_coverage(spark, sf_medium).collect()}
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_medium}/documents.parquet'"
    )
    toks = con.execute(
        "SELECT lang, UNNEST(regexp_split_to_array(lower(trim(text)), '\\s+')) AS t"
        " FROM documents"
    ).df()
    cnt = toks.groupby("t").size()
    vocab = set(
        cnt.reset_index(name="c")
        .sort_values(["c", "t"], ascending=[False, True])
        .head(VOCAB_K)["t"]
    )
    for lang, g in toks.groupby("lang"):
        total = len(g)
        inv = int(g["t"].isin(vocab).sum())
        r = rows[lang]
        assert r["total_tokens"] == total
        assert r["in_vocab_tokens"] == inv
        assert r["oov_e6"] == (1_000_000 * (total - inv)) // total
    # the fixture must actually exercise the OOV branch
    assert any(r["oov_e6"] > 0 for r in rows.values())


def test_vocab_coverage_plan_broadcasts_the_vocabulary(spark, sf_medium):
    plan = (
        vocab_coverage(spark, sf_medium)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan
    assert "SortMergeJoin" not in plan
