"""Semantics + plan-shape tests for the wave-5 curation/analytics
additions: per-source frequency cap, event-rate anomaly flags, and
per-language top tokens.

Each value test recomputes the operator's DEFINITION independently in
pandas/numpy (not via the SQL oracle — test_queries_oracle already
covers engine parity), so a shared mistake in both engine programs
cannot hide.
"""

from __future__ import annotations

import hashlib
import re

import pandas as pd
import pyarrow.parquet as pq


def _phash60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _words(text: str) -> list[str]:
    return [w for w in re.sub(r"[^a-z0-9]+", " ", text.lower()).strip().split(" ") if w]


def test_per_source_cap_matches_pandas(spark, sf_small):
    from mangaextractor_spark.queries.curation import SOURCE_CAP, per_source_cap

    got = per_source_cap(spark, sf_small).toPandas()

    docs = pq.read_table(f"{sf_small}/documents.parquet").to_pandas()
    docs["hkey"] = docs["doc_id"].map(lambda d: _phash60(str(d)))
    docs = docs.sort_values(["source", "hkey", "doc_id"])
    docs["cap_rank"] = docs.groupby("source").cumcount() + 1
    want = (
        docs[docs["cap_rank"] <= SOURCE_CAP][["source", "doc_id", "cap_rank"]]
        .sort_values(["source", "cap_rank"])
        .reset_index(drop=True)
    )
    got = got.sort_values(["source", "cap_rank"]).reset_index(drop=True)
    assert len(got) == len(want)
    assert (got["doc_id"].to_numpy() == want["doc_id"].to_numpy()).all()
    assert (got["cap_rank"].to_numpy() == want["cap_rank"].to_numpy()).all()
    # every source is actually capped and ranks are contiguous from 1
    per_src = got.groupby("source")["cap_rank"]
    assert (per_src.max() <= SOURCE_CAP).all()
    assert (per_src.min() == 1).all()


def test_per_source_cap_window_rides_the_pretopk(spark, sf_medium):
    """The rank window's input must be the bounded per-partition
    pre-top-k (MapInPandas), never the raw document scan: a mega-source
    at 100 TB would otherwise ride one task."""
    from mangaextractor_spark.queries.curation import per_source_cap

    plan = (
        per_source_cap(spark, sf_medium)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" in plan
    w_pos = plan.index("Window")
    assert "MapInPandas" in plan[w_pos:], "rank window input is not pre-pruned"


def test_event_rate_anomaly_matches_float_zscore(spark, sf_small):
    from mangaextractor_spark.queries.funnels import ANOMALY_Z, event_rate_anomaly

    got = event_rate_anomaly(spark, sf_small).toPandas()

    ev = pq.read_table(f"{sf_small}/events.parquet").to_pandas()
    ev["hour"] = ev["ts"].dt.floor("h")
    b = ev.groupby(["event_type", "hour"]).size().rename("cnt").reset_index()
    stats = b.groupby("event_type")["cnt"].agg(["count", "sum", "mean"])
    # population variance via the same moments the operator uses
    sq = b.assign(c2=b["cnt"] * b["cnt"]).groupby("event_type")["c2"].sum()
    for _, row in got.iterrows():
        st = stats.loc[row["event_type"]]
        n, s = int(st["count"]), int(st["sum"])
        q = int(sq.loc[row["event_type"]])
        var = q / n - (s / n) ** 2
        dev = row["cnt"] - s / n
        want_flag = dev * dev > (ANOMALY_Z**2) * var
        # exact-integer form and float form agree away from exact ties
        lhs = (n * int(row["cnt"]) - s) ** 2
        rhs = (ANOMALY_Z**2) * (n * q - s * s)
        if lhs != rhs:  # tie => engine-defined; the oracle pins it
            assert bool(row["is_anomaly"]) == want_flag, row.to_dict()
        assert int(row["mean_e6"]) == (1_000_000 * s) // n
    # bucket coverage: one output row per observed (type, hour) bucket
    assert len(got) == len(b)


def test_lang_top_tokens_matches_pandas(spark, sf_small):
    from mangaextractor_spark.queries.textops import TOP_TOKENS_K, lang_top_tokens

    got = lang_top_tokens(spark, sf_small).toPandas()

    docs = pq.read_table(f"{sf_small}/documents.parquet").to_pandas()
    rows = []
    for _, r in docs.iterrows():
        for t in _words(r["text"]):
            rows.append((r["lang"], t))
    c = (
        pd.DataFrame(rows, columns=["lang", "token"])
        .groupby(["lang", "token"])
        .size()
        .rename("n")
        .reset_index()
        .sort_values(["lang", "n", "token"], ascending=[True, False, True])
    )
    c["rank"] = c.groupby("lang").cumcount() + 1
    want = c[c["rank"] <= TOP_TOKENS_K].reset_index(drop=True)
    got = got.sort_values(["lang", "rank"]).reset_index(drop=True)
    assert len(got) == len(want)
    for col in ("lang", "token", "n", "rank"):
        assert (got[col].to_numpy() == want[col].to_numpy()).all(), col


def test_lang_top_tokens_window_rides_the_pretopk(spark, sf_medium):
    from mangaextractor_spark.queries.textops import lang_top_tokens

    plan = (
        lang_top_tokens(spark, sf_medium)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" in plan
    w_pos = plan.index("Window")
    assert "MapInPandas" in plan[w_pos:], "rank window input is not pre-pruned"
