"""main_content_spans: semantics on handcrafted interleaved docs and
the zero-exchange plan property. Oracle parity at sf0.01 rides the
test_queries_oracle parametrization like every registered query."""

from __future__ import annotations

import pytest

from mangaextractor_spark.queries.main_content import (
    interleaved_docs,
    main_content_spans_df,
)

SPANS_SCHEMA = (
    "doc_id string, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
)


def _run(spark, rows):
    df = spark.createDataFrame(rows, SPANS_SCHEMA)
    out = main_content_spans_df(df).toPandas()
    return sorted(map(tuple, out.values.tolist()), key=lambda t: (t[0], t[4]))


def test_per_kind_dispatch_and_dense_renumber(spark):
    rows = [
        (
            "d1",
            [
                # offsets deliberately shuffled: order must follow offset
                ("image", "", "m/2", 20),
                ("html", "<nav>junk</nav><p>Tom &amp; Jerry</p>", "", 0),
                ("text", "verbatim  spacing preserved", "", 10),
                # pure boilerplate -> '' -> dropped, numbering stays dense
                ("html", "<footer>ONLY JUNK</footer>", "", 30),
                # empty text span -> dropped too
                ("text", "", "", 40),
            ],
        )
    ]
    assert _run(spark, rows) == [
        # html: boilerplate out, tags out, entity unescaped, ws collapsed
        ("d1", "text", "Tom & Jerry", "", 0),
        # text: verbatim (double space survives — passthrough, not collapse)
        ("d1", "text", "verbatim  spacing preserved", "", 1),
        # image: placeholder survives with empty text
        ("d1", "image", "", "m/2", 2),
    ]


def test_doc_with_no_survivors_vanishes(spark):
    rows = [
        ("gone", [("html", "<nav>x</nav>", "", 0), ("text", "", "", 1)]),
        ("kept", [("text", "hello", "", 0)]),
    ]
    assert _run(spark, rows) == [("kept", "text", "hello", "", 0)]


def test_zero_exchange_plan(spark):
    """The 10^12-doc property: the whole pipeline is array higher-order
    functions + one Generate — no Exchange, no Window, ever. A monster
    document costs only its own row's compute on its own task."""
    df = spark.createDataFrame(
        [("d1", [("text", "hi", "", 0)])], SPANS_SCHEMA
    )
    plan = main_content_spans_df(df)._jdf.queryExecution().optimizedPlan().toString()
    assert "Exchange" not in plan
    assert "Window" not in plan
    assert "Repartition" not in plan


def test_interleaved_input_matches_north_rule_schema(spark, sf_small):
    """The synthesized input table is EXACTLY the north_rule input_hint
    shape: (doc_id string, spans array<struct<kind string, text string,
    media_ref string, offset int>>)."""
    schema = interleaved_docs(spark, sf_small).schema
    assert schema.simpleString() == (
        "struct<doc_id:string,"
        "spans:array<struct<kind:string,text:string,media_ref:string,offset:int>>>"
    )


def test_fixture_spans_exercise_every_branch(spark, sf_small):
    out = main_content_spans_df(interleaved_docs(spark, sf_small)).toPandas()
    # every doc keeps its image placeholder; html junk span always drops
    per_doc = out.groupby("doc_id")
    assert (per_doc["order"].min() == 0).all()
    assert (out.groupby("doc_id")["kind"].apply(lambda k: (k == "image").sum()) == 1).all()
    assert out.text.str.contains("NAVJUNK|FOOTERJUNK|ONLY JUNK").sum() == 0
    # order is dense per doc
    for _, g in per_doc:
        assert sorted(g["order"]) == list(range(len(g)))


def test_edge_inputs_have_defined_semantics(spark):
    """Corpus-reality edge cases a 10^12-doc table will contain:
    empty span arrays and NULL span arrays vanish (no row, not a
    crash); a NULL-text html span extracts to NULL and is dropped like
    an empty extraction; spans with EQUAL offsets keep their input
    array order (Spark's array_sort comparator sort is stable), so
    ties are deterministic given a deterministic source array."""
    from mangaextractor_spark.queries.main_content import main_content_spans_df

    schema = (
        "doc_id string, "
        "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
    )
    rows = [
        ("empty", []),
        ("nullarr", None),
        ("nulltext", [("html", None, "", 0), ("text", "keep me", "", 1)]),
        ("dup", [("text", "b", "", 5), ("text", "a", "", 5), ("image", "", "m", 5)]),
    ]
    out = main_content_spans_df(spark.createDataFrame(rows, schema))
    got = sorted(map(tuple, out.collect()))
    assert got == sorted(
        [
            ("dup", "text", "b", "", 0),
            ("dup", "text", "a", "", 1),
            ("dup", "image", "", "m", 2),
            ("nulltext", "text", "keep me", "", 0),
        ]
    )
