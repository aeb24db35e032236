"""NFC normalization family: the injected composed/decomposed pair
must behave exactly as Unicode says (only the decomposed class
changes; both classes' normalized hashes agree on the shared suffix),
and the UDF output must match CPython's unicodedata directly. Oracle
parity rides test_queries_oracle.py."""

from __future__ import annotations

import unicodedata

from pyspark.sql import functions as F

from mangaextractor_spark.queries import REGISTRY
from mangaextractor_spark.queries.normalize import _DEC, _PRE, _injected

SF = "/root/testdata/sf0.001"


def test_literals_are_canonically_equivalent_not_equal():
    assert _PRE != _DEC
    assert unicodedata.normalize("NFC", _PRE) == unicodedata.normalize("NFC", _DEC) == _PRE
    assert _DEC[-1] == "́" and _PRE[-1] == "é"


def test_only_decomposed_class_changes(spark):
    rows = REGISTRY["unicode_normalization_stats"].spark(spark, SF).collect()
    assert rows
    for r in rows:
        if r.doc_id % 3 == 1:
            assert r.changed and r.norm_chars == r.raw_chars - 1, r.doc_id
        else:
            assert not r.changed and r.norm_chars == r.raw_chars, r.doc_id


def test_norm_hash_merges_composed_and_decomposed(spark):
    """A decomposed doc and a precomposed doc built over the SAME base
    text must share norm_hash while raw_hash differs — the property
    that makes normalize-then-dedup find what raw dedup misses."""
    base = spark.createDataFrame([(0, "xx", "same base"), (1, "xx", "same base")],
                                 "doc_id long, lang string, text string")
    import mangaextractor_spark.queries.normalize as nz

    inj = base.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, F.concat("text", F.lit(_PRE)))
        .otherwise(F.concat("text", F.lit(_DEC)))
        .alias("raw"),
    )
    out = inj.withColumn("norm", nz._nfc(F.col("raw"))).collect()
    raws = {r.doc_id: r.raw for r in out}
    norms = {r.doc_id: r.norm for r in out}
    assert raws[0] != raws[1]
    assert norms[0] == norms[1] == "same base" + _PRE


def test_rollup_counts_match_injection(spark):
    rows = REGISTRY["normalization_rollup"].spark(spark, SF).collect()
    docs = _injected(spark, SF)
    n_dec = docs.filter(F.col("doc_id") % 3 == 1).count()
    assert sum(r.n_changed for r in rows) == n_dec
    assert sum(r.chars_removed for r in rows) == n_dec  # one mark composed away per doc
