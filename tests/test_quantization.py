"""int8 embedding-quantization audit: numpy parity on the exact
per-vector stats and a plan check that the whole audit is map-side
(the only exchange is the presentation orderBy's range partitioning).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow.parquet as pq

from mangaextractor_spark.queries import REGISTRY
from mangaextractor_spark.queries.similarity import QUANT_LEVELS


def _sign(x: float) -> int:
    return int(x > 0) - int(x < 0)


def test_quantization_matches_numpy(spark, sf_small):
    got = {
        r["vec_id"]: r
        for r in REGISTRY["embedding_quantization"].spark(spark, sf_small).collect()
    }
    tbl = pq.read_table(f"{sf_small}/embeddings.parquet").to_pydict()
    assert len(got) == len(tbl["vec_id"])
    for vec_id, emb in zip(tbl["vec_id"], tbl["embedding"]):
        v = np.asarray(emb, dtype=np.float64)
        maxabs = float(np.max(np.abs(v))) if v.size else 0.0
        r = got[vec_id]
        assert r["dims"] == v.size
        assert r["scale_e9"] == math.floor(maxabs * 1e9)
        if maxabs == 0:
            q = np.zeros(v.size, dtype=np.int64)
            err = 0.0
        else:
            # mirror the engine: per-element double primitives, ordered
            # fold, sign-aware round-half-away-from-zero
            q = np.array(
                [
                    math.floor(abs(x) * QUANT_LEVELS / maxabs + 0.5) * _sign(x)
                    for x in v
                ],
                dtype=np.int64,
            )
            err = 0.0
            for x in v:
                err += abs(
                    math.floor(abs(x) * QUANT_LEVELS / maxabs + 0.5) * _sign(x)
                    * maxabs / QUANT_LEVELS - x
                )
        assert r["qsum"] == int(q.sum())
        assert r["ql1"] == int(np.abs(q).sum())
        assert r["n_sat"] == int((np.abs(q) == QUANT_LEVELS).sum())
        assert r["err_l1_e9"] == math.floor(err * 1e9)
        assert int(np.max(np.abs(q))) <= QUANT_LEVELS  # int8-representable


def test_quantization_edge_cases_match_oracle(spark, tmp_path):
    """Round-4 ADVICE: empty embeddings must produce the same defined
    zero-vector result in BOTH engines (DuckDB used to crash on
    list_reduce([]) while Spark returned 0/NULL), and negative ties
    must round away from zero (-126.5 -> -127) under the sign-aware
    tie rule."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq_w

    from mangaextractor_spark.queries.similarity import _QUANT_SQL

    # maxabs=2.0 so x=-1.5 quantizes to -floor(1.5*127/2+.5) = -95
    # and x=-2/127*126.5 hits the exact negative tie at -126.5
    tie = -2.0 * 126.5 / 127.0
    emb_type = pa.list_(pa.float32())
    tbl = pa.table(
        {
            "vec_id": pa.array([0, 1, 2], type=pa.int64()),
            "embedding": pa.array(
                [[], [0.0, 0.0], [2.0, -1.5, tie, -2.0]], type=emb_type
            ),
            "label": pa.array([0, 0, 0], type=pa.int32()),
        }
    )
    pq_w.write_table(tbl, str(tmp_path / "embeddings.parquet"))

    got = {
        r["vec_id"]: r
        for r in REGISTRY["embedding_quantization"].spark(spark, str(tmp_path)).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{tmp_path}/embeddings.parquet'"
    )
    oracle = {r[0]: r for r in con.execute(_QUANT_SQL).fetchall()}
    assert set(got) == set(oracle) == {0, 1, 2}
    for vid in (0, 1, 2):
        s = got[vid]
        assert (s["dims"], s["scale_e9"], s["qsum"], s["ql1"], s["n_sat"],
                s["err_l1_e9"]) == tuple(oracle[vid][1:])
    # empty -> defined zero-vector stats
    assert (got[0]["dims"], got[0]["qsum"], got[0]["ql1"], got[0]["n_sat"]) == (0, 0, 0, 0)
    # negative tie rounds away from zero: q(tie) = -127 (saturated)
    assert got[2]["n_sat"] == 3  # 2.0 -> 127, tie -> -127, -2.0 -> -127
    assert got[2]["qsum"] == 127 - 95 - 127 - 127


def test_quantization_is_map_side(spark, sf_medium):
    plan = (
        REGISTRY["embedding_quantization"]
        .spark(spark, sf_medium)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange hashpartitioning" not in plan
    # presentation orderBy (range) + spread()'s round-robin fan-out only
    assert plan.count("Exchange rangepartitioning") == 1
    assert (
        plan.count("Exchange")
        == plan.count("Exchange rangepartitioning")
        + plan.count("Exchange RoundRobinPartitioning")
    )
