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
            # mirror the engine: per-element double primitives, ordered fold
            q = np.array(
                [math.floor(x * QUANT_LEVELS / maxabs + 0.5) for x in v], dtype=np.int64
            )
            err = 0.0
            for x in v:
                err += abs(
                    math.floor(x * QUANT_LEVELS / maxabs + 0.5) * maxabs / QUANT_LEVELS - x
                )
        assert r["qsum"] == int(q.sum())
        assert r["ql1"] == int(np.abs(q).sum())
        assert r["n_sat"] == int((np.abs(q) == QUANT_LEVELS).sum())
        assert r["err_l1_e9"] == math.floor(err * 1e9)
        assert int(np.max(np.abs(q))) <= QUANT_LEVELS  # int8-representable


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
