"""Similarity search over embedding columns.

- ``embedding_topk``: brute-force cosine top-k — the correctness
  baseline. The query side is tiny and broadcast; the corpus side
  streams through one scan (at 100 TB this is the exact-rescore stage).
- ``lsh_ann_topk``: random-hyperplane LSH bucketing — the scale path:
  candidates come from an equi-join on the bucket signature, then
  exact cosine rescoring within buckets only.

All arithmetic is forced into the same shape on both engines
(dot/(sqrt(na)*sqrt(nb)) over doubles, then ROUND(...,6) BEFORE
ranking) so rank ties resolve identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..session import load_table, spread
from . import register

N_QUERIES = 16
TOP_K = 3

_DOT = "list_dot_product({a}, {b})"


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


_TOPK_SQL = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
),
n AS (
  SELECT vec_id, emb, sqrt({_DOT.format(a="emb", b="emb")}) AS nrm FROM e
),
q AS (SELECT vec_id AS q_id, emb AS q_emb, nrm AS q_nrm FROM n WHERE vec_id < {N_QUERIES}),
sims AS (
  SELECT q.q_id, n.vec_id AS neighbor_id,
         ROUND({_DOT.format(a="n.emb", b="q.q_emb")} / (n.nrm * q.q_nrm), 6) AS sim
  FROM n CROSS JOIN q WHERE n.vec_id <> q.q_id
),
ranked AS (
  SELECT q_id, neighbor_id, sim,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, neighbor_id) AS rank
  FROM sims
)
SELECT q_id, neighbor_id, sim, rank FROM ranked
WHERE rank <= {TOP_K} ORDER BY q_id, rank
"""


@register(
    "embedding_topk",
    _TOPK_SQL,
    doc=f"Brute-force cosine top-{TOP_K} for the first {N_QUERIES} vectors. "
    "Queries broadcast; corpus scanned once; sim rounded to 6dp before "
    "ranking so cross-engine float ulps cannot flip the order.",
    tags=("similarity",),
)
def embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("emb")
    )
    n = e.withColumn("nrm", F.sqrt(_dot(F.col("emb"), F.col("emb"))))
    q = n.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("emb").alias("q_emb"), F.col("nrm").alias("q_nrm")
    )
    sims = (
        n.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(_dot(F.col("emb"), F.col("q_emb")) / (F.col("nrm") * F.col("q_nrm")), 6).alias(
                "sim"
            ),
        )
    )
    w = W.partitionBy("q_id").orderBy(F.desc("sim"), "neighbor_id")
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .orderBy("q_id", "rank")
    )


N_PLANES = 8  # 2^8 = 256 buckets


def _hyperplane(dim: int, plane: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane from a seeded LCG
    (no numpy at plan time; same plane on every run/engine)."""
    vals = []
    state = (plane * 2654435761 + 97) & 0xFFFFFFFF
    for _ in range(dim):
        state = (state * 1664525 + 1013904223) & 0xFFFFFFFF
        vals.append((state / 2**31) - 1.0)
    return vals


DIM = 64  # embedding dim of the testdata tables (asserted by the driver run)


def _lsh_bucket_sql() -> str:
    parts = []
    for pl in (_hyperplane(DIM, p) for p in range(N_PLANES)):
        lit = "[" + ", ".join(repr(v) for v in pl) + "]"
        parts.append(f"CASE WHEN list_dot_product(emb, {lit}) >= 0 THEN '1' ELSE '0' END")
    return " || ".join(parts)


_LSH_SQL = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
),
n AS (
  SELECT vec_id, emb, sqrt({_DOT.format(a="emb", b="emb")}) AS nrm,
         {{bucket}} AS bucket
  FROM e
),
q AS (
  SELECT vec_id AS q_id, emb AS q_emb, nrm AS q_nrm, bucket AS q_bucket
  FROM n WHERE vec_id < {N_QUERIES}
),
sims AS (
  SELECT q.q_id, n.vec_id AS neighbor_id,
         ROUND({_DOT.format(a="n.emb", b="q.q_emb")} / (n.nrm * q.q_nrm), 6) AS sim
  FROM n JOIN q ON n.bucket = q.q_bucket AND n.vec_id <> q.q_id
),
ranked AS (
  SELECT q_id, neighbor_id, sim,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, neighbor_id) AS rank
  FROM sims
)
SELECT q_id, neighbor_id, sim, rank FROM ranked
WHERE rank <= {TOP_K} ORDER BY q_id, rank
""".replace("{bucket}", _lsh_bucket_sql())


@register(
    "lsh_ann_topk",
    _LSH_SQL,
    doc=f"LSH ANN: {N_PLANES} random-hyperplane sign bits -> bucket id; "
    "candidates = same-bucket vectors (equi-join on bucket, no cross "
    "join); exact cosine rescoring within candidates. The 100 TB path: "
    "bucket join shuffles O(n), not O(n^2). Fully deterministic (seeded "
    "LCG hyperplanes, identical sequential-sum dot products on both "
    "engines), so even this approximate operator is oracle-checked; "
    "recall vs embedding_topk is additionally asserted in tests.",
    tags=("similarity", "approx"),
)
def lsh_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("emb")
    )
    dim = e.select(F.size("emb")).first()[0]
    planes = [_hyperplane(dim, p) for p in range(N_PLANES)]
    bucket = F.concat(
        *[
            F.when(_dot(F.col("emb"), F.array(*[F.lit(v) for v in pl])) >= 0, "1").otherwise("0")
            for pl in planes
        ]
    )
    n = e.withColumn("nrm", F.sqrt(_dot(F.col("emb"), F.col("emb")))).withColumn(
        "bucket", bucket
    )
    q = n.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("emb").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
        F.col("bucket").alias("q_bucket"),
    )
    sims = (
        n.join(F.broadcast(q), (F.col("bucket") == F.col("q_bucket")) & (F.col("vec_id") != F.col("q_id")))
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(_dot(F.col("emb"), F.col("q_emb")) / (F.col("nrm") * F.col("q_nrm")), 6).alias(
                "sim"
            ),
        )
    )
    w = W.partitionBy("q_id").orderBy(F.desc("sim"), "neighbor_id")
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .orderBy("q_id", "rank")
    )


CENT_MOD = 31  # centroid seeds: vec_id % 31 == 0 -> ~n/31 cells, scales with data


_IVF_SQL = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
),
n AS (
  SELECT vec_id, emb, sqrt({_DOT.format(a="emb", b="emb")}) AS nrm FROM e
),
cents AS (SELECT vec_id AS cid, emb AS c_emb, nrm AS c_nrm FROM n WHERE vec_id % {CENT_MOD} = 0),
assign0 AS (
  SELECT n.vec_id, n.emb, n.nrm, cents.cid,
         ROUND({_DOT.format(a="n.emb", b="cents.c_emb")} / (n.nrm * cents.c_nrm), 6) AS csim,
         ROW_NUMBER() OVER (
           PARTITION BY n.vec_id
           ORDER BY ROUND({_DOT.format(a="n.emb", b="cents.c_emb")} / (n.nrm * cents.c_nrm), 6) DESC,
                    cents.cid
         ) AS crank
  FROM n CROSS JOIN cents
),
assigned AS (SELECT vec_id, emb, nrm, cid AS cell FROM assign0 WHERE crank = 1),
q AS (
  SELECT vec_id AS q_id, emb AS q_emb, nrm AS q_nrm, cell AS q_cell
  FROM assigned WHERE vec_id < {N_QUERIES}
),
sims AS (
  SELECT q.q_id, a.vec_id AS neighbor_id,
         ROUND({_DOT.format(a="a.emb", b="q.q_emb")} / (a.nrm * q.q_nrm), 6) AS sim
  FROM assigned a JOIN q ON a.cell = q.q_cell AND a.vec_id <> q.q_id
),
ranked AS (
  SELECT q_id, neighbor_id, sim,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, neighbor_id) AS rank
  FROM sims
)
SELECT q_id, neighbor_id, sim, rank FROM ranked
WHERE rank <= {TOP_K} ORDER BY q_id, rank
"""


@register(
    "ivf_ann_topk",
    _IVF_SQL,
    doc=f"IVF-style ANN, fully deterministic (hence oracle-checkable): "
    f"centroids = vectors with vec_id %% {CENT_MOD} == 0; every vector is "
    "assigned to its max-cosine centroid (rounded 6dp, tie-break min cid); "
    "queries probe their own cell (nprobe=1) and rescore exactly within "
    "it. Spark plan: one scan, broadcast of the small centroid set, "
    "map-side-combined max_by for assignment (shuffle carries one row per "
    "vector), broadcast of the query rows, equi-join on cell — no O(n^2) "
    "stage anywhere, so the layout survives a 100 TB corpus.",
    tags=("similarity", "approx"),
)
def ivf_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("emb")
    )
    n = e.withColumn("nrm", F.sqrt(_dot(F.col("emb"), F.col("emb"))))
    cents = n.filter(F.col("vec_id") % CENT_MOD == 0).select(
        F.col("vec_id").alias("cid"), F.col("emb").alias("c_emb"), F.col("nrm").alias("c_nrm")
    )
    csim = F.round(_dot(F.col("emb"), F.col("c_emb")) / (F.col("nrm") * F.col("c_nrm")), 6)
    assigned = (
        n.crossJoin(F.broadcast(cents))
        .withColumn("csim", csim)
        .groupBy("vec_id")
        .agg(
            F.first("emb").alias("emb"),
            F.first("nrm").alias("nrm"),
            # max cosine, tie-break min cid: max_by over (csim, -cid) struct order
            F.max_by("cid", F.struct(F.col("csim"), (-F.col("cid")).alias("neg"))).alias("cell"),
        )
    )
    q = assigned.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("emb").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
        F.col("cell").alias("q_cell"),
    )
    sims = (
        assigned.join(
            F.broadcast(q), (F.col("cell") == F.col("q_cell")) & (F.col("vec_id") != F.col("q_id"))
        )
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(_dot(F.col("emb"), F.col("q_emb")) / (F.col("nrm") * F.col("q_nrm")), 6).alias(
                "sim"
            ),
        )
    )
    w = W.partitionBy("q_id").orderBy(F.desc("sim"), "neighbor_id")
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .orderBy("q_id", "rank")
    )


NEAR_DUP_SIM = 0.4


@register(
    "dedup_embedding_cosine",
    f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
    ),
    n AS (
      SELECT vec_id, emb, sqrt({_DOT.format(a="emb", b="emb")}) AS nrm FROM e
    )
    SELECT a.vec_id AS a_id, b.vec_id AS b_id,
           ROUND({_DOT.format(a="a.emb", b="b.emb")} / (a.nrm * b.nrm), 6) AS sim
    FROM n a JOIN n b ON a.vec_id < b.vec_id
    WHERE ROUND({_DOT.format(a="a.emb", b="b.emb")} / (a.nrm * b.nrm), 6) >= {NEAR_DUP_SIM}
    ORDER BY a_id, b_id
    """,
    doc=f"Embedding-cosine near-duplicate pairs (sim >= {NEAR_DUP_SIM}, "
    "rounded 6dp before the threshold so both engines agree at the "
    "boundary). Two phases: (1) vectorized numpy candidate pruning in "
    "mapInPandas — each Arrow batch matmuls against the broadcast "
    "normalized matrix with an epsilon-widened threshold, so the O(n^2) "
    "sweep runs at BLAS speed instead of per-pair expression "
    "interpretation; (2) survivors (a few hundred) are rescored with the "
    "sequential-sum Spark expression that is bit-identical to the DuckDB "
    "oracle, so numpy's pairwise-summation ulp drift cannot flip a "
    "boundary. The exact all-pairs semantics is the correctness baseline "
    "for the approximate paths (lsh_ann_topk / ivf_ann_topk); at 100 TB "
    "the same threshold filter runs after LSH-band candidate generation "
    "instead of an all-pairs sweep.",
    tags=("dedup", "similarity"),
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    e = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("emb")
    )
    # Broadcast the L2-normalized matrix (the "small dim table" of this
    # join: n_vectors x dim doubles, far below the corpus itself).
    local = e.toPandas()
    ids = np.asarray(local["vec_id"], dtype=np.int64)
    mat = np.vstack(local["emb"].to_numpy())
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((ids, mat))

    margin = 1e-9  # wider than any pairwise-vs-sequential summation drift

    def candidates(batches):
        b_ids, b_mat = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            q = np.vstack(pdf["emb"].to_numpy())
            q = q / np.linalg.norm(q, axis=1, keepdims=True)
            sims = q @ b_mat.T
            qi, bj = np.nonzero(sims >= NEAR_DUP_SIM - margin)
            a = np.asarray(pdf["vec_id"], dtype=np.int64)[qi]
            b = b_ids[bj]
            keep = a < b
            yield pd.DataFrame({"a_id": a[keep], "b_id": b[keep]})

    cand = e.mapInPandas(candidates, "a_id long, b_id long")
    n = e.withColumn("nrm", F.sqrt(_dot(F.col("emb"), F.col("emb"))))
    a = n.select(
        F.col("vec_id").alias("a_id"), F.col("emb").alias("a_emb"), F.col("nrm").alias("a_nrm")
    )
    b = n.select(
        F.col("vec_id").alias("b_id"), F.col("emb").alias("b_emb"), F.col("nrm").alias("b_nrm")
    )
    sim = F.round(_dot(F.col("a_emb"), F.col("b_emb")) / (F.col("a_nrm") * F.col("b_nrm")), 6)
    # Both joins broadcast the tiny side (candidate pairs, then the
    # candidate-enriched intermediate); the embedding table itself only
    # ever streams.
    half = a.join(F.broadcast(cand), "a_id")
    return (
        b.join(F.broadcast(half), "b_id")
        .withColumn("sim", sim)
        .filter(F.col("sim") >= NEAR_DUP_SIM)
        .select("a_id", "b_id", "sim")
    )
