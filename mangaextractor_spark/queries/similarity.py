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

from ..session import load_table
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
    e = load_table(spark, sf_dir, "embeddings").select(
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


@register(
    "lsh_ann_topk",
    None,  # bucketed ANN is approximate -> rows-only driver check;
    # exactness is instead asserted in tests via recall vs embedding_topk.
    doc=f"LSH ANN: {N_PLANES} random-hyperplane sign bits -> bucket id; "
    "candidates = same-bucket vectors (equi-join on bucket, no cross "
    "join); exact cosine rescoring within candidates. The 100 TB path: "
    "bucket join shuffles O(n), not O(n^2).",
    tags=("similarity", "approx"),
)
def lsh_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings").select(
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
