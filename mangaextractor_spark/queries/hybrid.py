"""Hybrid retrieval: reciprocal-rank fusion of the lexical (BM25) and
dense (embedding-cosine) top-k legs.

The modern training-data / RAG retrieval stack runs BOTH retrieval
families and fuses them — RRF (Cormack, Clarke & Buettcher, SIGIR'09)
is the standard parameter-free fusion: score(d) = sum over systems of
1/(K + rank_s(d)) with K=60, which rewards agreement without ever
comparing the two systems' incomparable raw scores.

Query alignment: the synthetic corpus keys documents and embeddings by
the same id space (doc_id == vec_id), so each lexical query qN is
paired with embedding vector N as its dense twin — the stand-in for
"the query's own embedding" that a real deployment would compute with
an encoder.

Cross-engine determinism: ranks are small exact ints; 1.0/(60+rank) is
one correctly-rounded IEEE division; the fusion score is ONE addition
of two such doubles in the same order on both engines — bit-identical,
no rounding needed before the driver's value hash.

Scale story (100 TB corpus): each leg is its own already-audited scale
path (bm25_topk: broadcast-pruned postings, groupBy df, pre-top-k;
embedding cosine: broadcast query block, pre-top-k per partition). The
fusion itself touches only the CANDIDATE LISTS — at most
|queries| * (k_lex + k_dense) rows — so the full-outer join and the
final rank window run on an operator-bounded frame (<= 2k rows per
query by construction, never corpus-sized; see
queries/_scale_notes.py's window rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from . import register
from ._topk import topk_per_group
from .search import _BM25_SQL, QUERIES, bm25_topk
from .similarity import _DOT, _dot, _normed_embeddings

RRF_K = 60  # Cormack et al.'s constant; exact small int in both engines
FUSED_TOP_K = 10
DENSE_TOP_K = 10

# qN -> vec_id N: the deterministic dense twin of each lexical query.
QUERY_VECS: list[tuple[str, int]] = [(qid, i + 1) for i, (qid, _) in enumerate(QUERIES)]

_QV_VALUES = ", ".join(f"('{qid}', {v})" for qid, v in QUERY_VECS)

_RRF_SQL = f"""
WITH lex AS ({_BM25_SQL}),
dn AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
dnn AS (SELECT vec_id, emb, sqrt({_DOT.format(a='emb', b='emb')}) AS nrm FROM dn),
dq(query_id, qvec) AS (VALUES {_QV_VALUES}),
dqe AS (
  SELECT dq.query_id, dq.qvec, n.emb AS q_emb, n.nrm AS q_nrm
  FROM dq JOIN dnn n ON n.vec_id = dq.qvec
),
dsims AS (
  SELECT q.query_id, n.vec_id AS cand_id,
         ROUND({_DOT.format(a='n.emb', b='q.q_emb')} / (n.nrm * q.q_nrm), 6) AS sim
  FROM dnn n CROSS JOIN dqe q WHERE n.vec_id <> q.qvec
),
dranked AS (
  SELECT query_id, cand_id,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, cand_id) AS rk
  FROM dsims
),
dense AS (SELECT query_id, cand_id, rk FROM dranked WHERE rk <= {DENSE_TOP_K}),
fused AS (
  SELECT COALESCE(l.query_id, d.query_id) AS query_id,
         COALESCE(l.doc_id, d.cand_id) AS cand_id,
         COALESCE(1.0 / ({RRF_K} + l.rank), 0.0)
           + COALESCE(1.0 / ({RRF_K} + d.rk), 0.0) AS rrf_score
  FROM lex l FULL JOIN dense d
    ON l.query_id = d.query_id AND l.doc_id = d.cand_id
),
franked AS (
  SELECT query_id, cand_id, rrf_score,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY rrf_score DESC, cand_id) AS rank
  FROM fused
)
SELECT query_id, cand_id, rrf_score, CAST(rank AS INT) AS rank
FROM franked WHERE rank <= {FUSED_TOP_K} ORDER BY query_id, rank
"""


@register(
    "rrf_fusion",
    _RRF_SQL,
    doc="Reciprocal-rank fusion (RRF, K=60) of bm25_topk's lexical "
    f"top-{FUSED_TOP_K} and a dense cosine top-{DENSE_TOP_K} (query qN "
    "paired with embedding N as its dense twin; doc_id == vec_id on "
    "the synthetic corpus): score = 1/(60+rank_lex) + 1/(60+rank_dense) "
    "with a missing leg contributing 0, re-ranked with a cand_id "
    "tie-break. Fusion math is rank-only (two exact divisions + one "
    "add, bit-identical cross-engine). Scale: both legs keep their own "
    "audited plans; fusion joins/ranks only the candidate lists "
    "(<= |queries| * 2k rows, operator-bounded by construction).",
    tags=("search", "similarity", "fusion"),
)
def rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    lex = bm25_topk(spark, sf_dir).select(
        "query_id", F.col("doc_id").alias("cand_id"), F.col("rank").alias("lex_rank")
    )

    n = _normed_embeddings(spark, sf_dir)
    qmap = spark.createDataFrame(QUERY_VECS, "query_id string, qvec long")
    q = n.join(F.broadcast(qmap), n.vec_id == F.col("qvec")).select(
        "query_id", "qvec", F.col("emb").alias("q_emb"), F.col("nrm").alias("q_nrm")
    )
    sims = (
        n.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qvec"))
        .select(
            "query_id",
            F.col("vec_id").alias("cand_id"),
            F.round(
                _dot(F.col("emb"), F.col("q_emb")) / (F.col("nrm") * F.col("q_nrm")), 6
            ).alias("sim"),
        )
    )
    pre = topk_per_group(sims, ["query_id"], ["sim", "cand_id"], [False, True], DENSE_TOP_K)
    dw = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("cand_id"))
    dense = (
        pre.withColumn("rk", F.row_number().over(dw))
        .filter(F.col("rk") <= DENSE_TOP_K)
        .select("query_id", "cand_id", "rk")
    )

    fused = lex.join(dense, ["query_id", "cand_id"], "full_outer").select(
        "query_id",
        "cand_id",
        (
            F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("lex_rank")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("rk")), F.lit(0.0))
        ).alias("rrf_score"),
    )
    fw = W.partitionBy("query_id").orderBy(F.desc("rrf_score"), F.asc("cand_id"))
    return (
        fused.withColumn("rank", F.row_number().over(fw))
        .filter(F.col("rank") <= FUSED_TOP_K)
        .select("query_id", "cand_id", "rrf_score", F.col("rank").cast("int").alias("rank"))
        .orderBy("query_id", "rank")
    )
