"""Product quantization (PQ) and IVF-PQ approximate nearest neighbor.

Completes the ANN ladder (brute force -> LSH -> IVF) with the operator
production vector stores actually run at corpus scale: IVF-PQ
(Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor
Search", TPAMI 2011 — the faiss `IVFx,PQy` index). The reference repo
has no vector surface at all; this family exists for the
training-data-pipeline mandate (embedding near-dup / retrieval over a
100 TB corpus, where neither the vectors nor the pairwise distances
fit anything).

Why PQ is THE 100 TB shape: a 64-dim float64 vector is 512 B; its PQ
code here is M=8 codebook ids (8 B, and 8x4 bits in a real store).
Distance evaluation against a query never touches the original
vectors — it is M integer table lookups into a per-query distance
table of M x K entries built once per query (ADC, asymmetric distance
computation). So the scan side of a query is code-table-sized, not
embedding-sized: ~64x less I/O, and the exact embeddings are read
only for the final rescore shortlist.

Determinism (hence oracle-checkability, unusual for ANN):

- codebooks are data-deterministic: the codewords of subspace ``m``
  are the ``m``-th subvectors of the vectors with
  ``vec_id % CB_MOD == 1 AND vec_id < CB_MAX`` (<= K=16 codewords) —
  the same id-arithmetic selection the IVF centroids use. A trained
  k-means codebook drops reconstruction error but adds nothing to the
  plan shape; ``kmeans_fit`` already demonstrates distributed Lloyd's
  if a trained codebook is wanted.
- all vectors are L2-normalized first, so squared-L2 ordering equals
  cosine ordering (||a-b||^2 = 2 - 2 cos on the unit sphere) and the
  ADC shortlist is directly comparable to the exact-cosine rescore.
- every distance is fixed to an e6 integer (FLOOR(d*1e6 + 0.5) —
  d >= 0 so this is plain round-half-up) the moment it is computed:
  per-subspace cells are BIGINTs, the ADC sum is a BIGINT sum (exact,
  order-free — a double sum over a groupBy would be
  accumulation-order-dependent), and argmins tie-break on code_id.

Spark plan shape at 100 TB (mirrored by the oracle CTE chain):

- one scan explodes each vector into M (vec_id, m, subvector) rows;
  the codebook (construction-bounded: M x K <= 128 rows) broadcasts;
  encoding is a map-side join + partial-aggregated argmin groupBy —
  shuffle carries M rows per vector, nothing is corpus-sized on one
  task.
- search joins candidate codes to the broadcast per-query distance
  table (N_QUERIES x M x K <= 2048 rows) and SUMs — the candidate
  subtree carries NO broadcast hint (data-dependent size; AQE
  decides), the lesson recorded in _scale_notes.py.
- the ADC shortlist rank rides the Arrow pre-top-k (queries/_topk.py)
  so no corpus-sized rank window exists even when a probed cell is
  huge.

Reference: none (capability beyond the reference). Public algorithm:
Jégou et al. TPAMI 2011; multi-probe IVF as in ivf_ann_topk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..session import load_table, spread
from . import register
from ._topk import topk_per_group
from .similarity import _DOT, _dot, CENT_MOD, N_QUERIES, NPROBE, TOP_K

M_SUBSPACES = 8  # subvectors per 64-dim embedding
SUBDIM = 8  # dims per subvector
CB_MOD = 37  # codeword seeds: vec_id % 37 == 1 ...
CB_MAX = 37 * 16  # ... and vec_id < 592 -> at most K=16 codewords
# ADC shortlist size fed to the exact rescore — the recall<->work knob
# (faiss's k_factor). PQ on these weakly-clustered synthetic vectors
# needs a generous shortlist: C=8 admits too few true neighbors into
# the rescore (recall 0.17 vs plain IVF's 0.50 at sf0.001); C=64
# reaches the probed-cell ceiling (0.479 at sf0.001, 0.625 at sf0.01 —
# identical to uncompressed IVF, which rescans EVERY probed candidate)
# while still rescoring a constant 64 vectors/query.
RESCORE_C = 64

# e6 fixed-point squared-L2 between two subvectors, via dot products
# only (list_dot_product / F.aggregate fold are the proven bit-exact
# cross-engine pair): d = |a|^2 + |c|^2 - 2 a.c, d >= 0 on real
# inputs so FLOOR(d*1e6 + 0.5) is round-half-up.
_D2_E6 = (
    "CAST(FLOOR(({a2} + {c2} - 2 * " + _DOT + ") * 1000000 + 0.5) AS BIGINT)"
)


def _normed_subvectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, m, semb, sa2): the m-th SUBDIM-wide slice of each
    L2-normalized embedding plus its squared norm. One scan, map-side
    explode by M (each vector costs exactly M rows)."""
    e = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("emb")
    )
    n = e.withColumn("nrm", F.sqrt(_dot(F.col("emb"), F.col("emb"))))
    nv = n.select(
        "vec_id", F.transform("emb", lambda x: x / F.col("nrm")).alias("nemb")
    )
    sub = nv.select(
        "vec_id",
        "nemb",
        F.explode(F.array(*[F.lit(m).cast("long") for m in range(M_SUBSPACES)])).alias("m"),
    ).select(
        "vec_id",
        "m",
        F.slice(F.col("nemb"), (F.col("m") * SUBDIM + 1).cast("int"), F.lit(SUBDIM)).alias(
            "semb"
        ),
    )
    return sub.withColumn("sa2", _dot(F.col("semb"), F.col("semb")))


def _codebook(sub: DataFrame) -> DataFrame:
    """Construction-bounded codebook: <= M x 16 rows, broadcastable."""
    return sub.filter((F.col("vec_id") % CB_MOD == 1) & (F.col("vec_id") < CB_MAX)).select(
        F.col("vec_id").alias("code_id"),
        F.col("m").alias("cm"),
        F.col("semb").alias("c_semb"),
        F.col("sa2").alias("c2"),
    )


def _dist_e6_col() -> F.Column:
    d = F.col("sa2") + F.col("c2") - 2 * _dot(F.col("semb"), F.col("c_semb"))
    return F.floor(d * 1000000 + 0.5).cast("long")


def _encode(sub: DataFrame) -> DataFrame:
    """(vec_id, m, code, qdist_e6): argmin codeword per subvector.
    Broadcast codebook join + partial-aggregated argmin groupBy: the
    shuffle carries one row per (vector, subspace)."""
    cb = _codebook(sub)
    return (
        sub.join(F.broadcast(cb), F.col("m") == F.col("cm"))
        .withColumn("dist_e6", _dist_e6_col())
        .groupBy("vec_id", "m")
        .agg(
            F.min_by("code_id", F.struct(F.col("dist_e6"), F.col("code_id"))).alias("code"),
            F.min("dist_e6").alias("qdist_e6"),
        )
    )


# Shared oracle CTE chain: normalized subvectors + codebook + encoding.
_PQ_CTES = f"""
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
n AS (SELECT vec_id, emb, sqrt({_DOT.format(a="emb", b="emb")}) AS nrm FROM e),
nv AS (SELECT vec_id, list_transform(emb, x -> x / nrm) AS nemb FROM n),
sub AS (
  SELECT vec_id, m, list_slice(nemb, m*{SUBDIM}+1, m*{SUBDIM}+{SUBDIM}) AS semb
  FROM nv CROSS JOIN range({M_SUBSPACES}) t(m)
),
s2 AS (SELECT vec_id, m, semb, {_DOT.format(a="semb", b="semb")} AS sa2 FROM sub),
cb AS (
  SELECT vec_id AS code_id, m AS cm, semb AS c_semb, sa2 AS c2 FROM s2
  WHERE vec_id % {CB_MOD} = 1 AND vec_id < {CB_MAX}
),
scored AS (
  SELECT s.vec_id, s.m, cb.code_id,
         {_D2_E6.format(a2="s.sa2", c2="cb.c2", a="s.semb", b="cb.c_semb")} AS dist_e6
  FROM s2 s JOIN cb ON s.m = cb.cm
),
codes AS (
  SELECT vec_id, m, code_id AS code, dist_e6 AS qdist_e6
  FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY vec_id, m ORDER BY dist_e6, code_id) AS rn
    FROM scored
  ) WHERE rn = 1
)"""


_PQ_CODES_SQL = f"""
WITH {_PQ_CTES}
SELECT vec_id, m, code, qdist_e6 FROM codes ORDER BY vec_id, m
"""


@register(
    "pq_codes",
    _PQ_CODES_SQL,
    doc=f"Product-quantization encoding: each L2-normalized embedding "
    f"splits into M={M_SUBSPACES} subvectors of {SUBDIM} dims; each "
    "subvector maps to its nearest codeword (e6-integer squared-L2, "
    "tie-break min code_id) from a deterministic id-selected codebook "
    "(<= 16 codewords/subspace). Output is the long-form code table "
    "(vec_id, m, code, qdist_e6) — 8 BIGINTs per vector replacing 512 B "
    "of floats, the compressed representation ivf_pq_ann_topk scans "
    "instead of the embeddings. Plan: one scan, map-side explode by M, "
    "broadcast codebook, partial-aggregated argmin groupBy — shuffle "
    "carries M rows/vector, nothing corpus-sized on one task.",
    tags=("similarity", "approx", "compression"),
)
def pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    codes = _encode(_normed_subvectors(spark, sf_dir))
    return codes.select("vec_id", "m", "code", "qdist_e6").orderBy("vec_id", "m")


_IVF_PQ_SQL = f"""
WITH {_PQ_CTES},
cents AS (
  SELECT vec_id AS cid, emb AS c_emb, nrm AS c_nrm FROM n WHERE vec_id % {CENT_MOD} = 0
),
assign0 AS (
  SELECT n.vec_id, cents.cid,
         ROW_NUMBER() OVER (
           PARTITION BY n.vec_id
           ORDER BY ROUND({_DOT.format(a="n.emb", b="cents.c_emb")} / (n.nrm * cents.c_nrm), 6) DESC,
                    cents.cid
         ) AS crank
  FROM n CROSS JOIN cents
),
assigned AS (SELECT vec_id, cid AS cell FROM assign0 WHERE crank = 1),
probes AS (
  SELECT vec_id AS q_id, cid AS probe_cell
  FROM assign0 WHERE vec_id < {N_QUERIES} AND crank <= {NPROBE}
),
qdtable AS (
  SELECT s.vec_id AS q_id, s.m, cb.code_id,
         {_D2_E6.format(a2="s.sa2", c2="cb.c2", a="s.semb", b="cb.c_semb")} AS dist_e6
  FROM s2 s JOIN cb ON s.m = cb.cm
  WHERE s.vec_id < {N_QUERIES}
),
cand AS (
  SELECT p.q_id, a.vec_id
  FROM assigned a JOIN probes p ON a.cell = p.probe_cell AND a.vec_id <> p.q_id
),
adc AS (
  SELECT c.q_id, c.vec_id, CAST(SUM(d.dist_e6) AS BIGINT) AS adist_e6
  FROM cand c
  JOIN codes k ON k.vec_id = c.vec_id
  JOIN qdtable d ON d.q_id = c.q_id AND d.m = k.m AND d.code_id = k.code
  GROUP BY c.q_id, c.vec_id
),
shortlist AS (
  SELECT q_id, vec_id, adist_e6 FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY adist_e6, vec_id) AS crank
    FROM adc
  ) WHERE crank <= {RESCORE_C}
),
rescored AS (
  SELECT s.q_id, s.vec_id AS neighbor_id, s.adist_e6,
         ROUND({_DOT.format(a="v.emb", b="q.emb")} / (v.nrm * q.nrm), 6) AS sim
  FROM shortlist s
  JOIN n v ON v.vec_id = s.vec_id
  JOIN n q ON q.vec_id = s.q_id
),
ranked AS (
  SELECT q_id, neighbor_id, adist_e6, sim,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, neighbor_id) AS rank
  FROM rescored
)
SELECT q_id, neighbor_id, adist_e6, sim, rank FROM ranked
WHERE rank <= {TOP_K} ORDER BY q_id, rank
"""


@register(
    "ivf_pq_ann_topk",
    _IVF_PQ_SQL,
    doc=f"IVF-PQ ANN (the faiss-style 100 TB index shape): coarse IVF "
    f"probe (NPROBE={NPROBE} max-cosine cells, as ivf_ann_topk) "
    "restricts candidates; their PQ codes are scored against a "
    "per-query ADC distance table (broadcast, construction-bounded "
    f"N_QUERIES x M x K <= 2048 BIGINT entries); the top-{RESCORE_C} "
    "ADC shortlist per query is rescored with exact cosine and the "
    f"top-{TOP_K} returned. The candidate scan touches only the 8-id "
    "code table, never the embeddings — the raw vectors are read for "
    f"just {RESCORE_C} rows/query. ADC sums are exact BIGINT e6 sums "
    "(order-free); the shortlist rank rides the Arrow pre-top-k so no "
    "corpus-sized window exists; candidate joins carry no broadcast "
    "hints (AQE decides). The coarse-cell broadcast is nlist-bounded "
    "only under the CENT_MOD sizing rule (queries/_scale_notes.py). "
    "Recall vs the exact baseline asserted in tests/test_pq.py.",
    tags=("similarity", "approx"),
)
def ivf_pq_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("emb")
    )
    n = e.withColumn("nrm", F.sqrt(_dot(F.col("emb"), F.col("emb"))))
    cents = n.filter(F.col("vec_id") % CENT_MOD == 0).select(
        F.col("vec_id").alias("cid"), F.col("emb").alias("c_emb"), F.col("nrm").alias("c_nrm")
    )
    csim = F.round(_dot(F.col("emb"), F.col("c_emb")) / (F.col("nrm") * F.col("c_nrm")), 6)
    # Assignment via map-side-combined max_by (as ivf_ann_topk): a
    # per-vector rank window here would carry every centroid per vector
    # on one task with no partial aggregation.
    assigned = (
        n.crossJoin(F.broadcast(cents))
        .withColumn("csim", csim)
        .groupBy("vec_id")
        .agg(
            F.max_by("cid", F.struct(F.col("csim"), (-F.col("cid")).alias("neg"))).alias("cell")
        )
    )
    qv = n.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("pq_id"), F.col("emb").alias("p_emb"), F.col("nrm").alias("p_nrm")
    )
    psim = F.round(_dot(F.col("p_emb"), F.col("c_emb")) / (F.col("p_nrm") * F.col("c_nrm")), 6)
    wp = W.partitionBy("pq_id").orderBy(F.desc("csim"), "cid")
    probes = (
        qv.crossJoin(F.broadcast(cents))
        .withColumn("csim", psim)
        .withColumn("crank", F.row_number().over(wp))
        .filter(F.col("crank") <= NPROBE)
        .select(F.col("pq_id").alias("q_id"), F.col("cid").alias("probe_cell"))
    )

    sub = _normed_subvectors(spark, sf_dir)
    codes = _encode(sub).select("vec_id", "m", "code")
    cb = _codebook(sub)
    qdtable = (
        sub.filter(F.col("vec_id") < N_QUERIES)
        .join(F.broadcast(cb), F.col("m") == F.col("cm"))
        .select(
            F.col("vec_id").alias("dq_id"),
            F.col("m").alias("qm"),
            F.col("code_id"),
            _dist_e6_col().alias("dist_e6"),
        )
    )
    cand = assigned.join(
        F.broadcast(probes),
        (F.col("cell") == F.col("probe_cell")) & (F.col("vec_id") != F.col("q_id")),
    ).select("q_id", "vec_id")
    # codes join is a plain equi-join on vec_id (candidate set is
    # data-dependent — no broadcast hint); the qdtable IS
    # construction-bounded, so it broadcasts.
    adc = (
        cand.join(codes, "vec_id")
        .join(
            F.broadcast(qdtable),
            (F.col("q_id") == F.col("dq_id"))
            & (F.col("m") == F.col("qm"))
            & (F.col("code") == F.col("code_id")),
        )
        .groupBy("q_id", "vec_id")
        .agg(F.sum("dist_e6").alias("adist_e6"))
    )
    pre = topk_per_group(adc, ["q_id"], ["adist_e6", "vec_id"], [True, True], RESCORE_C)
    wq = W.partitionBy("q_id").orderBy("adist_e6", "vec_id")
    shortlist = (
        pre.withColumn("crank", F.row_number().over(wq))
        .filter(F.col("crank") <= RESCORE_C)
        .select("q_id", "vec_id", "adist_e6")
    )
    v = n.select(F.col("vec_id").alias("nv_id"), F.col("emb").alias("v_emb"), F.col("nrm").alias("v_nrm"))
    q = n.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("nq_id"), F.col("emb").alias("q_emb"), F.col("nrm").alias("q_nrm")
    )
    rescored = (
        shortlist.join(v, F.col("vec_id") == F.col("nv_id"))
        .join(F.broadcast(q), F.col("q_id") == F.col("nq_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            "adist_e6",
            F.round(
                _dot(F.col("v_emb"), F.col("q_emb")) / (F.col("v_nrm") * F.col("q_nrm")), 6
            ).alias("sim"),
        )
    )
    wr = W.partitionBy("q_id").orderBy(F.desc("sim"), "neighbor_id")
    return (
        rescored.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= TOP_K)
        .orderBy("q_id", "rank")
    )
