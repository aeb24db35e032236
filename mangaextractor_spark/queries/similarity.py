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
from ._portable import phash60, phash60_sql
from ._topk import topk_per_group

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


def _rank_topk(sims: DataFrame) -> DataFrame:
    """Exact top-k ranking of (q_id, neighbor_id, sim): per-partition
    pre-top-k bounds the rank window to <= k * n_partitions rows per
    query — without it the window carries EVERY candidate of a query
    (the whole corpus for the brute-force baseline) on one task. See
    queries/_topk.py. Results identical: the pruning order (sim desc,
    neighbor_id asc) IS the window order, fully tie-broken."""
    pre = topk_per_group(sims, ["q_id"], ["sim", "neighbor_id"], [False, True], TOP_K)
    w = W.partitionBy("q_id").orderBy(F.desc("sim"), "neighbor_id")
    return (
        pre.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .orderBy("q_id", "rank")
    )


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
    return _rank_topk(sims)


_HARDNEG_SQL = f"""
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
),
n AS (
  SELECT vec_id, label, emb, sqrt({_DOT.format(a="emb", b="emb")}) AS nrm FROM e
),
q AS (
  SELECT vec_id AS q_id, label AS q_label, emb AS q_emb, nrm AS q_nrm
  FROM n WHERE vec_id < {N_QUERIES}
),
sims AS (
  SELECT q.q_id, q.q_label, n.vec_id AS neg_id, n.label AS neg_label,
         ROUND({_DOT.format(a="n.emb", b="q.q_emb")} / (n.nrm * q.q_nrm), 6) AS sim
  FROM n CROSS JOIN q WHERE n.label <> q.q_label
),
ranked AS (
  SELECT q_id, q_label, neg_id, neg_label, sim,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, neg_id) AS rank
  FROM sims
)
SELECT q_id, q_label, neg_id, neg_label, sim, rank FROM ranked
WHERE rank <= {TOP_K} ORDER BY q_id, rank
"""


@register(
    "hard_negatives",
    _HARDNEG_SQL,
    doc=f"Hard-negative mining for contrastive / metric training "
    f"(the DPR-style pass — Karpukhin et al. 2020, arXiv:2004.04906): "
    f"for each of the first {N_QUERIES} anchor vectors, the top-{TOP_K} "
    "most-similar vectors whose LABEL DIFFERS from the anchor's — the "
    "near-but-wrong candidates that make the strongest training "
    "negatives. Same scale shape as embedding_topk (anchors broadcast, "
    "corpus scanned once, Arrow pre-top-k bounds the rank window to "
    "k*partitions rows per anchor); the label inequality is a map-side "
    "filter on the joined row, so mining negatives costs exactly one "
    "corpus scan regardless of label cardinality. At 100 TB the anchor "
    "set is a training batch (thousands of rows — still broadcast "
    "territory); sim rounded to 6dp before ranking so cross-engine "
    "float ulps cannot flip the order.",
    tags=("similarity", "training"),
)
def hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("emb"),
    )
    n = e.withColumn("nrm", F.sqrt(_dot(F.col("emb"), F.col("emb"))))
    q = n.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("q_label"),
        F.col("emb").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    sims = (
        n.crossJoin(F.broadcast(q))
        .filter(F.col("label") != F.col("q_label"))
        .select(
            "q_id",
            "q_label",
            F.col("vec_id").alias("neg_id"),
            F.col("label").alias("neg_label"),
            F.round(
                _dot(F.col("emb"), F.col("q_emb")) / (F.col("nrm") * F.col("q_nrm")), 6
            ).alias("sim"),
        )
    )
    pre = topk_per_group(sims, ["q_id"], ["sim", "neg_id"], [False, True], TOP_K)
    w = W.partitionBy("q_id").orderBy(F.desc("sim"), "neg_id")
    return (
        pre.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("q_id", "q_label", "neg_id", "neg_label", "sim", "rank")
        .orderBy("q_id", "rank")
    )


L_TABLES = 8  # LSH tables
K_BITS = 4  # sign bits per table -> 16 buckets/table; union of 8 tables


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


def _bucket_sql(table: int) -> str:
    parts = []
    for b in range(K_BITS):
        pl = _hyperplane(DIM, table * K_BITS + b)
        lit = "[" + ", ".join(repr(v) for v in pl) + "]"
        parts.append(f"CASE WHEN list_dot_product(emb, {lit}) >= 0 THEN '1' ELSE '0' END")
    return " || ".join(parts)


_SIG_UNION = "\n      UNION ALL ".join(
    f"SELECT vec_id, emb, nrm, {t} AS t, {{b{t}}} AS bucket FROM n" for t in range(L_TABLES)
)

_LSH_SQL = (
    f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
),
n AS (
  SELECT vec_id, emb, sqrt({_DOT.format(a="emb", b="emb")}) AS nrm FROM e
),
sig AS (
      {_SIG_UNION}
),
qsig AS (
  SELECT vec_id AS q_id, emb AS q_emb, nrm AS q_nrm, t, bucket
  FROM sig WHERE vec_id < {N_QUERIES}
),
sims AS (
  SELECT DISTINCT q.q_id, s.vec_id AS neighbor_id,
         ROUND({_DOT.format(a="s.emb", b="q.q_emb")} / (s.nrm * q.q_nrm), 6) AS sim
  FROM sig s JOIN qsig q ON s.t = q.t AND s.bucket = q.bucket AND s.vec_id <> q.q_id
),
ranked AS (
  SELECT q_id, neighbor_id, sim,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, neighbor_id) AS rank
  FROM sims
)
SELECT q_id, neighbor_id, sim, rank FROM ranked
WHERE rank <= {TOP_K} ORDER BY q_id, rank
"""
)
for _t in range(L_TABLES):
    _LSH_SQL = _LSH_SQL.replace("{b%d}" % _t, _bucket_sql(_t))


@register(
    "lsh_ann_topk",
    _LSH_SQL,
    doc=f"Multi-table LSH ANN: {L_TABLES} hash tables of {K_BITS} "
    "random-hyperplane sign bits each; candidates = same-bucket vectors "
    "in ANY table (equi-join on (table, bucket), distinct pairs), exact "
    "cosine rescoring. Multiple small tables instead of one deep code is "
    "what buys recall on weakly-clustered data; the 100 TB path still "
    "shuffles O(n * L), never O(n^2). Fully deterministic (seeded LCG "
    "hyperplanes, identical sequential-sum dot products), so even this "
    "approximate operator is oracle-checked; recall >= 0.5 vs "
    "embedding_topk is asserted in tests/test_ann_recall.py.",
    tags=("similarity", "approx"),
)
def lsh_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("emb")
    )
    # DIM is a module constant (the oracle SQL hardcodes the same
    # hyperplanes); deriving it with .first() here used to launch an
    # extra Spark job at plan-build time for a value already known.
    dim = DIM
    n = e.withColumn("nrm", F.sqrt(_dot(F.col("emb"), F.col("emb"))))

    def bucket(table: int) -> F.Column:
        bits = []
        for b in range(K_BITS):
            pl = _hyperplane(dim, table * K_BITS + b)
            bits.append(
                F.when(
                    _dot(F.col("emb"), F.array(*[F.lit(v) for v in pl])) >= 0, "1"
                ).otherwise("0")
            )
        return F.concat(*bits)

    tables = F.array(
        *[
            F.struct(F.lit(t).alias("t"), bucket(t).alias("b"))
            for t in range(L_TABLES)
        ]
    )
    sig = n.select("vec_id", "emb", "nrm", F.explode(tables).alias("tb")).select(
        "vec_id", "emb", "nrm", F.col("tb.t").alias("t"), F.col("tb.b").alias("b")
    )
    qsig = sig.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("emb").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
        F.col("t").alias("qt"),
        F.col("b").alias("qb"),
    )
    sims = (
        sig.join(
            F.broadcast(qsig),
            (F.col("t") == F.col("qt"))
            & (F.col("b") == F.col("qb"))
            & (F.col("vec_id") != F.col("q_id")),
        )
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(
                _dot(F.col("emb"), F.col("q_emb")) / (F.col("nrm") * F.col("q_nrm")), 6
            ).alias("sim"),
        )
        .distinct()  # a pair colliding in several tables counts once
    )
    return _rank_topk(sims)


# Centroid seeds: vec_id % CENT_MOD == 0 -> ~n/CENT_MOD cells. 31 fits
# the sf fixtures; CENT_MOD is the IVF nlist SIZING KNOB, not a
# constant: at production you grow it proportionally to the corpus so
# the centroid set stays a fixed nlist (e.g. 65k cells) — the
# broadcast below is nlist-bounded ONLY under that sizing, and the
# oracle mirrors whatever modulus is chosen (queries/_scale_notes.py).
CENT_MOD = 31
NPROBE = 4  # query-side probed cells


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
probes AS (
  SELECT vec_id AS q_id, cid AS probe_cell
  FROM assign0 WHERE vec_id < {N_QUERIES} AND crank <= {NPROBE}
),
q AS (
  SELECT vec_id AS q_id, emb AS q_emb, nrm AS q_nrm
  FROM n WHERE vec_id < {N_QUERIES}
),
sims AS (
  SELECT DISTINCT q.q_id, a.vec_id AS neighbor_id,
         ROUND({_DOT.format(a="a.emb", b="q.q_emb")} / (a.nrm * q.q_nrm), 6) AS sim
  FROM assigned a
  JOIN probes p ON a.cell = p.probe_cell
  JOIN q ON q.q_id = p.q_id AND a.vec_id <> q.q_id
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
    "assigned to its max-cosine centroid (rounded 6dp, tie-break min "
    "cid); queries probe their NPROBE=4 nearest cells and rescore "
    "exactly within them (multi-probe is the standard recall lever — "
    "recall vs embedding_topk asserted in tests/test_ann_recall.py). "
    "Spark plan: one scan, broadcast of the nlist-bounded centroid set "
    "(CENT_MOD is the sizing knob — grow it with the corpus so cells "
    "stay a fixed nlist, or the broadcast scales as n/CENT_MOD), "
    "map-side-combined max_by for assignment (shuffle carries one row "
    "per vector), broadcast of the tiny probe list, equi-join on cell — "
    "no O(n^2) stage anywhere, so the layout survives a 100 TB corpus.",
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
    qv = n.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("emb").alias("q_emb"), F.col("nrm").alias("q_nrm")
    )
    qsim = F.round(
        _dot(F.col("q_emb"), F.col("c_emb")) / (F.col("q_nrm") * F.col("c_nrm")), 6
    )
    wq = W.partitionBy("q_id").orderBy(F.desc("csim"), "cid")
    probes = (
        qv.crossJoin(F.broadcast(cents))
        .withColumn("csim", qsim)
        .withColumn("crank", F.row_number().over(wq))
        .filter(F.col("crank") <= NPROBE)
        .select("q_id", "q_emb", "q_nrm", F.col("cid").alias("probe_cell"))
    )
    sims = (
        assigned.join(
            F.broadcast(probes),
            (F.col("cell") == F.col("probe_cell")) & (F.col("vec_id") != F.col("q_id")),
        )
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(_dot(F.col("emb"), F.col("q_emb")) / (F.col("nrm") * F.col("q_nrm")), 6).alias(
                "sim"
            ),
        )
        .distinct()  # a neighbor reachable via several probed cells counts once
    )
    return _rank_topk(sims)


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
    "boundary). Exact all-pairs — the correctness baseline for the "
    "approximate paths (lsh_ann_topk / ivf_ann_topk) — executed as a "
    "fully distributed block triangle join: every vector hashes to one "
    f"of B={{N_BLOCKS}} blocks and is replicated to its B block-pairs "
    "(gi, gj); each of the B(B+1)/2 groups runs one vectorized BLAS "
    "sweep (block x block matmul) in applyInPandas with an epsilon-"
    "widened threshold, emitting candidate pairs. Nothing is collected "
    "to the driver and task memory is bounded by 2*(n/B)*dim doubles — "
    "B is the knob that trades shuffle volume (n*B rows) for per-task "
    "memory at corpus scale. Survivors are rescored with the "
    "sequential-sum Spark expression that is bit-identical to the "
    "DuckDB oracle, so numpy's pairwise-summation ulp drift cannot "
    "flip a boundary; the rescore joins carry NO broadcast hints — the "
    "candidate set is data-dependent and unbounded, so AQE decides "
    "(broadcast when small, sort-merge + skew-split when not). "
    "(The O(n^2/B)-compute sweep is inherent to exact "
    "all-pairs semantics; the LSH/IVF operators are the sublinear "
    "100 TB path.)".format(N_BLOCKS=8),
    tags=("dedup", "similarity"),
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    N_BLOCKS = 8

    e = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("emb")
    )
    # The rescore filter accepts ROUND(sim, 6) >= threshold, which admits
    # raw cosines from threshold - 5e-7 (the rounding half-quantum), so
    # the prune margin must be at least that plus summation drift —
    # 1e-9 alone silently dropped boundary pairs the oracle keeps.
    margin = 5e-7 + 1e-9

    g = F.pmod(F.xxhash64("vec_id"), F.lit(N_BLOCKS)).cast("int")
    # Each row joins every block-pair group it participates in: exactly
    # N_BLOCKS groups (one diagonal + N_BLOCKS-1 off-diagonal), so each
    # unordered vector pair {u, v} meets in exactly one group.
    block_pairs = F.array(
        *[
            F.struct(
                F.least(F.col("g"), F.lit(j)).alias("gi"),
                F.greatest(F.col("g"), F.lit(j)).alias("gj"),
            )
            for j in range(N_BLOCKS)
        ]
    )
    rep = (
        e.withColumn("g", g)
        .select("vec_id", "emb", "g", F.explode(block_pairs).alias("gp"))
        .select("vec_id", "emb", "g", F.col("gp.gi").alias("gi"), F.col("gp.gj").alias("gj"))
    )

    def block_sweep(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        gi, gj = key
        ids = np.asarray(pdf["vec_id"], dtype=np.int64)
        mat = np.vstack(pdf["emb"].to_numpy())
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        thr = NEAR_DUP_SIM - margin
        if gi == gj:
            sims = mat @ mat.T
            ai, bj = np.nonzero(sims >= thr)
            a, b = ids[ai], ids[bj]
            keep = a < b  # upper triangle only
        else:
            sa = np.asarray(pdf["g"]) == gi
            A, B = mat[sa], mat[~sa]
            a_ids, b_ids = ids[sa], ids[~sa]
            if not len(A) or not len(B):
                return pd.DataFrame({"a_id": [], "b_id": []}).astype("int64")
            sims = A @ B.T
            ai, bj = np.nonzero(sims >= thr)
            u, v = a_ids[ai], b_ids[bj]
            a, b = np.minimum(u, v), np.maximum(u, v)
            keep = np.ones(len(a), dtype=bool)
        return pd.DataFrame({"a_id": a[keep], "b_id": b[keep]})

    cand = rep.groupBy("gi", "gj").applyInPandas(block_sweep, "a_id long, b_id long")
    n = e.withColumn("nrm", F.sqrt(_dot(F.col("emb"), F.col("emb"))))
    a = n.select(
        F.col("vec_id").alias("a_id"), F.col("emb").alias("a_emb"), F.col("nrm").alias("a_nrm")
    )
    b = n.select(
        F.col("vec_id").alias("b_id"), F.col("emb").alias("b_emb"), F.col("nrm").alias("b_nrm")
    )
    sim = F.round(_dot(F.col("a_emb"), F.col("b_emb")) / (F.col("a_nrm") * F.col("b_nrm")), 6)
    # No broadcast hints: the candidate-pair count is data-dependent and
    # unbounded at corpus scale (millions of pairs x an embedding array
    # each once enriched), so a forced broadcast is an OOM hazard, not a
    # fast path. Both rescore joins are plain equi-joins on vec_id — AQE
    # broadcasts them at runtime when the built side is genuinely small
    # and skew-splits them when it is not.
    half = a.join(cand, "a_id")
    return (
        b.join(half, "b_id")
        .withColumn("sim", sim)
        .filter(F.col("sim") >= NEAR_DUP_SIM)
        .select("a_id", "b_id", "sim")
    )


K_CLUSTERS = 8  # deterministic seed centroids: the first K vectors by id

_KMEANS_SQL = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
n AS (SELECT vec_id, emb, sqrt({_DOT.format(a='emb', b='emb')}) AS nrm FROM e),
c AS (SELECT vec_id AS cid, emb AS c_emb, nrm AS c_nrm FROM n WHERE vec_id < {K_CLUSTERS}),
sims AS (
  SELECT n.vec_id, c.cid,
         ROUND({_DOT.format(a='n.emb', b='c.c_emb')} / (n.nrm * c.c_nrm), 6) AS sim
  FROM n CROSS JOIN c
),
assigned AS (
  SELECT vec_id, cid, sim FROM sims
  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) = 1
)
SELECT cid AS cluster_id, COUNT(*) AS n_members, MIN(vec_id) AS min_vec_id,
       CAST(SUM(CAST(ROUND(sim * 1000000, 0) AS BIGINT)) AS BIGINT) AS sum_sim_e6
FROM assigned GROUP BY cid ORDER BY cid
"""


@register(
    "kmeans_assign",
    _KMEANS_SQL,
    doc="K-means ASSIGNMENT step (the inner loop of Lloyd's algorithm / "
    "corpus topic-bucketing) over the embedding table: each vector goes "
    f"to its max-cosine centroid among {K_CLUSTERS} deterministic seeds "
    f"(the first {K_CLUSTERS} vectors by id), ties to the smaller "
    "centroid id; output is the per-cluster rollup (members, min id, "
    "exact sum of 6dp-rounded sims as bigint micro-units — "
    "order-independent, unlike a double sum). Scale path: the centroid "
    "set aggregates to ONE broadcast row (sort_array(collect_list) of "
    f"{K_CLUSTERS} structs), and assignment is a zero-shuffle map-side "
    "F.aggregate argmax over that array — no per-centroid join "
    "fan-out, no window over the corpus; the only corpus-sized shuffle "
    "is the final k-row rollup. Full Lloyd's iterates this step with "
    "a decimal-exact centroid-mean groupBy per round.",
    tags=("similarity", "clustering"),
)
def kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _normed_embeddings(spark, sf_dir)
    seeds = n.filter(F.col("vec_id") < K_CLUSTERS).select(
        F.col("vec_id").alias("cid"), F.col("emb").alias("c_emb"), F.col("nrm").alias("c_nrm")
    )
    assigned = _assign_to_centroids(n, seeds)
    return (
        assigned.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.min("vec_id").alias("min_vec_id"),
            F.sum(F.round(F.col("sim") * 1000000, 0).cast("long")).alias("sum_sim_e6"),
        )
        .orderBy("cluster_id")
    )


def _normed_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("emb")
    )
    return e.withColumn("nrm", F.sqrt(_dot(F.col("emb"), F.col("emb"))))


def _assign_to_centroids(n: DataFrame, centroids: DataFrame) -> DataFrame:
    """Map-side argmax assignment: ``centroids`` (cid, c_emb, c_nrm — k
    rows) aggregates to ONE broadcast array row; each vector folds over
    it with F.aggregate. Ties go to the smaller cid (the array is
    cid-sorted and only a strictly greater sim replaces the best).
    Returns (vec_id, cluster_id, sim, emb) with zero corpus shuffles."""
    cents = (
        centroids.select(
            F.struct(F.col("cid"), F.col("c_emb"), F.col("c_nrm")).alias("c")
        ).agg(F.sort_array(F.collect_list("c")).alias("cents"))  # sorted by cid
    )

    def _argmax(acc, c):
        sim = F.round(_dot(F.col("emb"), c["c_emb"]) / (F.col("nrm") * c["c_nrm"]), 6)
        better = sim > acc["sim"]  # strict: ties keep the earlier (smaller) cid
        return F.when(
            better, F.struct(sim.alias("sim"), c["cid"].alias("cid"))
        ).otherwise(acc)

    best = F.aggregate(
        F.col("cents"),
        F.struct(
            F.lit(-2.0).cast("double").alias("sim"), F.lit(-1).cast("long").alias("cid")
        ),
        _argmax,
    )
    return (
        n.crossJoin(F.broadcast(cents))
        .select("vec_id", "emb", best.alias("b"))
        .select(
            "vec_id",
            F.col("b.cid").alias("cluster_id"),
            F.col("b.sim").alias("sim"),
            "emb",
        )
    )


def _centroid_update(assigned: DataFrame) -> DataFrame:
    """Lloyd's centroid update over 6dp-quantized member components:
    per-dimension BIGINT sums (exact, order-independent — a double sum
    would drift with partitioning) divided once into a double. Empty
    clusters simply drop out (standard Lloyd's), identically in the SQL
    oracle. Shuffle: one map-side-combined groupBy on (cluster, dim) —
    k*dims output rows — then a k-row rebuild."""
    q = assigned.select(
        "cluster_id",
        F.posexplode(
            F.transform("emb", lambda x: F.round(x * 1000000, 0).cast("long"))
        ).alias("dim", "qv"),
    )
    sums = q.groupBy("cluster_id", "dim").agg(
        F.sum("qv").alias("sq"), F.count(F.lit(1)).alias("cnt")
    )
    comp = sums.withColumn(
        "comp", F.col("sq").cast("double") / (F.col("cnt") * F.lit(1000000.0))
    )
    rebuilt = comp.groupBy("cluster_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "comp"))), lambda s: s["comp"]
        ).alias("c_emb")
    )
    return rebuilt.select(
        F.col("cluster_id").alias("cid"),
        "c_emb",
        F.sqrt(_dot(F.col("c_emb"), F.col("c_emb"))).alias("c_nrm"),
    )


def _kmeans_sql_assign(cent_cte: str, out: str) -> str:
    return f"""
{out}_sims AS (
  SELECT n.vec_id, c.cid,
         ROUND({_DOT.format(a='n.emb', b='c.c_emb')} / (n.nrm * c.c_nrm), 6) AS sim
  FROM n CROSS JOIN {cent_cte} c
),
{out} AS (
  SELECT vec_id, cid, sim FROM {out}_sims
  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) = 1
)"""


_KMEANS_FIT_SQL = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
n AS (SELECT vec_id, emb, sqrt({_DOT.format(a='emb', b='emb')}) AS nrm FROM e),
c0 AS (SELECT vec_id AS cid, emb AS c_emb, nrm AS c_nrm FROM n WHERE vec_id < {K_CLUSTERS}),
{_kmeans_sql_assign('c0', 'a1')},
q1 AS (
  SELECT a1.cid, d.dim, CAST(ROUND(n.emb[d.dim + 1] * 1000000, 0) AS BIGINT) AS qv
  FROM a1 JOIN n USING (vec_id) CROSS JOIN range({{dims}}) AS d(dim)
),
s1 AS (SELECT cid, dim, SUM(qv) AS sq, COUNT(*) AS cnt FROM q1 GROUP BY 1, 2),
c1 AS (
  SELECT cid, LIST(CAST(sq AS DOUBLE) / (cnt * 1000000.0) ORDER BY dim) AS c_emb
  FROM s1 GROUP BY cid
),
c1n AS (SELECT cid, c_emb, sqrt({_DOT.format(a='c_emb', b='c_emb')}) AS c_nrm FROM c1),
{_kmeans_sql_assign('c1n', 'a2')},
f AS (
  SELECT a2.cid, a2.vec_id, a2.sim,
         CAST(ROUND(n.emb[1] * 1000000, 0) AS BIGINT) AS qv0
  FROM a2 JOIN n USING (vec_id)
)
SELECT cid AS cluster_id, COUNT(*) AS n_members, MIN(vec_id) AS min_vec_id,
       CAST(SUM(CAST(ROUND(sim * 1000000, 0) AS BIGINT)) AS BIGINT) AS sum_sim_e6,
       CAST(ROUND(CAST(SUM(qv0) AS DOUBLE) / (COUNT(*) * 1000000.0) * 1000000, 0) AS BIGINT)
         AS next_c0_e6
FROM f GROUP BY cid ORDER BY cid
""".format(dims=64)


@register(
    "kmeans_fit",
    _KMEANS_FIT_SQL,
    doc="TWO full Lloyd's iterations of k-means over the embedding "
    f"table (k={K_CLUSTERS}, seeds = first {K_CLUSTERS} vectors by id): "
    "assign -> centroid update -> reassign, then the per-cluster rollup "
    "plus the component-0 fingerprint of the NEXT centroid update — so "
    "the oracle verifies both assignment rounds AND the mean update "
    "bit-exactly (the SQL unrolls the same two iterations as CTEs). "
    "Determinism across engines: centroid means are per-dimension "
    "BIGINT sums of 6dp-quantized components divided ONCE into a "
    "double (a naive double sum would vary with partition order); "
    "empty clusters drop out identically on both sides. Scale path: "
    "each assignment is the map-side broadcast-array argmax of "
    "kmeans_assign; each update is one map-side-combined groupBy on "
    "(cluster, dim) emitting k*dims rows; the k-row centroid frame is "
    "localCheckpoint'ed per round so the plan (and the number of "
    "corpus scans) stays linear in iterations instead of quadratic.",
    tags=("similarity", "clustering", "iterative"),
)
def kmeans_fit(spark: SparkSession, sf_dir: str, iters: int = 2) -> DataFrame:
    n = _normed_embeddings(spark, sf_dir)
    cdf = n.filter(F.col("vec_id") < K_CLUSTERS).select(
        F.col("vec_id").alias("cid"), F.col("emb").alias("c_emb"), F.col("nrm").alias("c_nrm")
    )
    assigned = None
    for t in range(iters):
        assigned = _assign_to_centroids(n, cdf)
        if t < iters - 1:
            # k-row frame: materializing it per round keeps every
            # iteration at one corpus scan (lazy lineage would rerun
            # all prior rounds' scans each time the plan executes).
            cdf = _centroid_update(assigned).localCheckpoint()
    qv0 = F.round(F.col("emb")[0] * 1000000, 0).cast("long")
    return (
        assigned.groupBy(F.col("cluster_id"))
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.min("vec_id").alias("min_vec_id"),
            F.sum(F.round(F.col("sim") * 1000000, 0).cast("long")).alias("sum_sim_e6"),
            F.round(
                F.sum(qv0).cast("double") / (F.count(F.lit(1)) * F.lit(1000000.0)) * 1000000,
                0,
            )
            .cast("long")
            .alias("next_c0_e6"),
        )
        .orderBy("cluster_id")
    )


SEM_DEDUP_SIM = 0.4  # within-cluster near-dup threshold (6dp-rounded cosine)

_SEMANTIC_DEDUP_SQL = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
n AS (SELECT vec_id, emb, sqrt({_DOT.format(a='emb', b='emb')}) AS nrm FROM e),
c0 AS (SELECT vec_id AS cid, emb AS c_emb, nrm AS c_nrm FROM n WHERE vec_id < {K_CLUSTERS}),
{_kmeans_sql_assign('c0', 'a1')},
m AS (
  SELECT a1.vec_id, a1.cid, n.emb, n.nrm FROM a1 JOIN n USING (vec_id)
),
removed AS (
  SELECT DISTINCT b.vec_id AS removed_id
  FROM m a JOIN m b ON a.cid = b.cid AND a.vec_id < b.vec_id
  WHERE ROUND({_DOT.format(a='a.emb', b='b.emb')} / (a.nrm * b.nrm), 6) >= {SEM_DEDUP_SIM}
)
SELECT m.vec_id, m.cid AS cluster_id, (r.removed_id IS NULL) AS kept
FROM m LEFT JOIN removed r ON m.vec_id = r.removed_id
ORDER BY m.vec_id
"""


@register(
    "semantic_dedup",
    _SEMANTIC_DEDUP_SQL,
    doc="SemDeDup-style semantic deduplication (Abbas et al. 2023, "
    "arXiv:2303.09540): assign every embedding to its max-cosine "
    f"centroid (k={K_CLUSTERS} deterministic seeds = the first "
    f"{K_CLUSTERS} vectors by id, exactly kmeans_assign's rule), then "
    "drop any vector that has a SMALLER-ID near-duplicate (6dp-rounded "
    f"cosine >= {SEM_DEDUP_SIM}) inside the SAME cluster. Output is the "
    "keep mask a curation pipeline consumes: one row per vector with "
    "its cluster and kept flag. The removal rule is the id-order "
    "variant (removed iff ANY smaller-id in-cluster near-dup exists) "
    "rather than the sequential greedy sweep — same fixed points on "
    "transitive duplicate groups, but well-defined relationally, so "
    "the oracle states it verbatim. Scale path: assignment is the "
    "zero-shuffle broadcast-array argmax of kmeans_assign; the "
    "pairwise stage is a self EQUI-join on cluster_id (AQE-skew-"
    "splittable, unlike a window) whose O(m^2)-per-cluster compute is "
    "SemDeDup's own contract — production picks k proportional to "
    "corpus size so clusters stay ~constant-sized (the paper uses "
    "k=50k for LAION-440M; the block-pair triangle sweep of "
    "dedup_embedding_cosine is the in-cluster fallback if a cluster "
    "still outgrows one task's memory). The keep mask joins back as a "
    "broadcast-able (or bucketed) dimension of removed ids only.",
    tags=("dedup", "similarity", "clustering"),
)
def semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _normed_embeddings(spark, sf_dir)
    seeds = n.filter(F.col("vec_id") < K_CLUSTERS).select(
        F.col("vec_id").alias("cid"), F.col("emb").alias("c_emb"), F.col("nrm").alias("c_nrm")
    )
    m = _assign_to_centroids(n, seeds).join(
        n.select("vec_id", "nrm"), "vec_id"
    )  # (vec_id, cluster_id, sim, emb, nrm)
    a = m.select(
        F.col("cluster_id").alias("cid"),
        F.col("vec_id").alias("a_id"),
        F.col("emb").alias("a_emb"),
        F.col("nrm").alias("a_nrm"),
    )
    b = m.select(
        F.col("cluster_id").alias("cid"),
        F.col("vec_id").alias("b_id"),
        F.col("emb").alias("b_emb"),
        F.col("nrm").alias("b_nrm"),
    )
    sim = F.round(
        _dot(F.col("a_emb"), F.col("b_emb")) / (F.col("a_nrm") * F.col("b_nrm")), 6
    )
    removed = (
        a.join(b, "cid")
        .filter(F.col("a_id") < F.col("b_id"))
        .filter(sim >= SEM_DEDUP_SIM)
        .select(F.col("b_id").alias("removed_id"))
        .distinct()
    )
    return (
        m.join(F.broadcast(removed), m.vec_id == F.col("removed_id"), "left")
        .select(
            "vec_id",
            F.col("cluster_id"),
            F.col("removed_id").isNull().alias("kept"),
        )
        .orderBy("vec_id")
    )


# -- int8 embedding quantization audit -------------------------------------

QUANT_LEVELS = 127  # symmetric int8: q in [-127, 127]

_QUANT_SQL = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
),
m AS (
  SELECT vec_id, emb,
         COALESCE(list_max(list_transform(emb, x -> abs(x))), 0.0) AS maxabs
  FROM e
),
q AS (
  SELECT vec_id,
         CAST(len(emb) AS BIGINT) AS dims,
         CAST(FLOOR(maxabs * 1000000000.0) AS BIGINT) AS scale_e9,
         list_transform(emb,
           x -> CASE WHEN maxabs = 0 THEN CAST(0 AS BIGINT)
                     ELSE CAST(FLOOR(abs(x) * {QUANT_LEVELS}.0 / maxabs + 0.5)
                               * sign(x) AS BIGINT)
                END) AS qv,
         CASE WHEN maxabs = 0 THEN 0.0 ELSE list_reduce(
           list_transform(emb,
             x -> abs(FLOOR(abs(x) * {QUANT_LEVELS}.0 / maxabs + 0.5) * sign(x)
                      * maxabs / {QUANT_LEVELS}.0 - x)),
           (acc, v) -> acc + v) END AS err
  FROM m
)
SELECT vec_id, dims, scale_e9,
       CASE WHEN len(qv) = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST(list_reduce(qv, (a, b) -> a + b) AS BIGINT) END AS qsum,
       CASE WHEN len(qv) = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST(list_reduce(list_transform(qv, v -> abs(v)), (a, b) -> a + b)
                      AS BIGINT) END AS ql1,
       CAST(len(list_filter(qv, v -> abs(v) = {QUANT_LEVELS})) AS BIGINT) AS n_sat,
       CAST(FLOOR(err * 1000000000.0) AS BIGINT) AS err_l1_e9
FROM q ORDER BY vec_id
"""


@register(
    "embedding_quantization",
    _QUANT_SQL,
    doc="Symmetric int8 quantization audit per embedding vector — the "
    "pre-flight report for shipping a 100 TB embedding column to an "
    "ANN index at 4x smaller storage: per-vector scale (max |x| / "
    f"{QUANT_LEVELS}), quantized checksum + L1 mass (exact BIGINTs, "
    "order-independent), saturation count, and the L1 reconstruction "
    "error accumulated by an ORDERED left fold in e9 units (every "
    "per-element op is one correctly-rounded IEEE double primitive on "
    "an identical expression tree in both engines, and the fold order "
    "is the list order on both, so the driver hash is exact — a "
    "shuffle-order SUM of doubles would not be). Rounding is sign-"
    "aware round-half-away-from-zero (FLOOR(|x|*L/s + .5)*sign(x)), "
    "the conventional symmetric-int8 tie rule; zero-length embeddings "
    "are defined as zero vectors (scale 0, all stats 0) in BOTH "
    "engines rather than one crashing and one returning NULLs "
    "(round-4 ADVICE items). Scale shape: one "
    "corpus scan, everything map-side inside whole-stage codegen, "
    "ZERO shuffles (the orderBy is presentation only); the quantized "
    "vectors themselves would be written alongside, not collected.",
    tags=("similarity", "multimodal"),
)
def embedding_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    # COALESCE so a zero-length embedding behaves exactly like a zero
    # vector (maxabs 0 -> qv [], stats 0) instead of NULL-poisoning the
    # stats on the Spark side while the DuckDB oracle crashes on
    # list_reduce([]) — the silent divergence flagged by round-4 ADVICE.
    maxabs = F.coalesce(F.array_max(F.transform("emb", lambda x: F.abs(x))), F.lit(0.0))
    m = e.select("vec_id", "emb", maxabs.alias("maxabs"))
    lv = F.lit(float(QUANT_LEVELS))

    # Sign-aware round-half-away-from-zero (FLOOR(|x|*L/maxabs + .5) *
    # sign(x)) — the conventional symmetric-int8 tie rule; negative
    # ties round away from zero (-126.5 -> -127), matching standard
    # quantizers. Identical expression tree in the DuckDB oracle.
    def quant(x):
        return (
            F.floor(F.abs(x) * lv / F.col("maxabs") + F.lit(0.5)) * F.signum(x)
        ).cast("long")

    def err_term(x):
        return F.abs(
            F.floor(F.abs(x) * lv / F.col("maxabs") + F.lit(0.5)) * F.signum(x)
            * F.col("maxabs") / lv - x
        )

    qv = F.when(F.col("maxabs") == 0, F.transform("emb", lambda x: F.lit(0).cast("long"))).otherwise(
        F.transform("emb", quant)
    )
    err = F.when(F.col("maxabs") == 0, F.lit(0.0)).otherwise(
        F.aggregate("emb", F.lit(0.0), lambda acc, x: acc + err_term(x))
    )
    q = m.select(
        "vec_id",
        F.size("emb").cast("long").alias("dims"),
        F.floor(F.col("maxabs") * F.lit(1000000000.0)).cast("long").alias("scale_e9"),
        qv.alias("qv"),
        err.alias("err"),
    )
    return q.select(
        "vec_id",
        "dims",
        "scale_e9",
        F.aggregate("qv", F.lit(0).cast("long"), lambda a, b: a + b).alias("qsum"),
        F.aggregate(
            F.transform("qv", lambda v: F.abs(v)), F.lit(0).cast("long"), lambda a, b: a + b
        ).alias("ql1"),
        F.size(F.filter("qv", lambda v: F.abs(v) == QUANT_LEVELS)).cast("long").alias("n_sat"),
        F.floor(F.col("err") * F.lit(1000000000.0)).cast("long").alias("err_l1_e9"),
    ).orderBy("vec_id")


# --- cluster-balanced sampling ---------------------------------------------

CLUSTER_CAP = 16  # kept docs per semantic cluster
_CBS_SALT = "cbs:"  # pick-priority salt, decorrelated from other buckets

_CBS_SQL = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
n AS (SELECT vec_id, emb, sqrt({_DOT.format(a='emb', b='emb')}) AS nrm FROM e),
c AS (SELECT vec_id AS cid, emb AS c_emb, nrm AS c_nrm FROM n WHERE vec_id < {K_CLUSTERS}),
sims AS (
  SELECT n.vec_id, c.cid,
         ROUND({_DOT.format(a='n.emb', b='c.c_emb')} / (n.nrm * c.c_nrm), 6) AS sim
  FROM n CROSS JOIN c
),
assigned AS (
  SELECT vec_id, cid, sim FROM sims
  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) = 1
),
pri AS (
  SELECT cid AS cluster_id, vec_id, sim,
         {phash60_sql("'" + _CBS_SALT + "' || CAST(vec_id AS VARCHAR)")} AS pick
  FROM assigned
)
SELECT cluster_id, vec_id, sim,
       ROW_NUMBER() OVER (PARTITION BY cluster_id ORDER BY pick, vec_id) AS pick_rank
FROM pri QUALIFY pick_rank <= {CLUSTER_CAP}
ORDER BY cluster_id, pick_rank
"""


@register(
    "cluster_balanced_sample",
    _CBS_SQL,
    doc=f"Cluster-balanced data selection (the diversity-capped "
    "sampling pass of semantic curation — cap every topic bucket so a "
    "dominant cluster cannot monopolize the training mix; cf. the "
    "cluster-then-sample stage of SemDeDup-style pipelines, Abbas et "
    f"al. 2023, arXiv:2303.09540): assign each vector to its "
    f"max-cosine cluster among the {K_CLUSTERS} kmeans_assign seeds "
    f"(identical rule, shared helper), keep at most {CLUSTER_CAP} "
    "members per cluster by salted-hash priority — a deterministic "
    "uniform draw within the cluster, decorrelated from the "
    "train/split/shard buckets. Scale shape: assignment is the same "
    "zero-shuffle broadcast-centroid fold as kmeans_assign; the "
    "per-cluster pick rides the Arrow pre-top-k (_topk.py) so the rank "
    "window sees <= cap * n_partitions rows per cluster, never a "
    "corpus-sized cluster on one task.",
    tags=("similarity", "clustering", "pipeline", "training"),
)
def cluster_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _normed_embeddings(spark, sf_dir)
    seeds = n.filter(F.col("vec_id") < K_CLUSTERS).select(
        F.col("vec_id").alias("cid"), F.col("emb").alias("c_emb"), F.col("nrm").alias("c_nrm")
    )
    pri = _assign_to_centroids(n, seeds).select(
        "cluster_id",
        "vec_id",
        "sim",
        phash60(F.concat(F.lit(_CBS_SALT), F.col("vec_id").cast("string"))).alias("pick"),
    )
    pre = topk_per_group(pri, ["cluster_id"], ["pick", "vec_id"], [True, True], CLUSTER_CAP)
    w = W.partitionBy("cluster_id").orderBy("pick", "vec_id")
    return (
        pre.withColumn("pick_rank", F.row_number().over(w))
        .filter(F.col("pick_rank") <= CLUSTER_CAP)
        .select("cluster_id", "vec_id", "sim", "pick_rank")
        .orderBy("cluster_id", "pick_rank")
    )


# -- two-table semantic decontamination ---------------------------------------

EVAL_VEC_MOD = 10  # vec_id % 10 == 1 -> the synthetic eval/benchmark slice
DECON_TAU = 0.35  # cosine at/above which a train vector is contaminated

_SEMANTIC_DECON_SQL = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
),
n AS (
  SELECT vec_id, emb, sqrt({_DOT.format(a="emb", b="emb")}) AS nrm FROM e
),
cents AS (SELECT vec_id AS cid, emb AS c_emb, nrm AS c_nrm FROM n WHERE vec_id % {CENT_MOD} = 0),
train AS (SELECT * FROM n WHERE vec_id % {EVAL_VEC_MOD} <> 1),
ev AS (SELECT vec_id AS eval_id, emb AS q_emb, nrm AS q_nrm
       FROM n WHERE vec_id % {EVAL_VEC_MOD} = 1),
assigned AS (
  SELECT vec_id, emb, nrm, cid AS cell FROM (
    SELECT t.vec_id, t.emb, t.nrm, cents.cid,
           ROW_NUMBER() OVER (
             PARTITION BY t.vec_id
             ORDER BY ROUND({_DOT.format(a="t.emb", b="cents.c_emb")} / (t.nrm * cents.c_nrm), 6) DESC,
                      cents.cid
           ) AS crank
    FROM train t CROSS JOIN cents
  ) WHERE crank = 1
),
probes AS (
  SELECT eval_id, q_emb, q_nrm, cid AS probe_cell FROM (
    SELECT ev.eval_id, ev.q_emb, ev.q_nrm, cents.cid,
           ROW_NUMBER() OVER (
             PARTITION BY ev.eval_id
             ORDER BY ROUND({_DOT.format(a="ev.q_emb", b="cents.c_emb")} / (ev.q_nrm * cents.c_nrm), 6) DESC,
                      cents.cid
           ) AS crank
    FROM ev CROSS JOIN cents
  ) WHERE crank <= {NPROBE}
),
hits AS (
  SELECT DISTINCT a.vec_id AS train_id, p.eval_id,
         ROUND({_DOT.format(a="a.emb", b="p.q_emb")} / (a.nrm * p.q_nrm), 6) AS sim
  FROM assigned a JOIN probes p ON a.cell = p.probe_cell
),
flagged AS (
  SELECT train_id, eval_id, sim,
         ROW_NUMBER() OVER (PARTITION BY train_id ORDER BY sim DESC, eval_id) AS r
  FROM hits WHERE sim >= {DECON_TAU}
)
SELECT train_id, eval_id, sim FROM flagged WHERE r = 1 ORDER BY train_id
"""


@register(
    "semantic_decontamination",
    _SEMANTIC_DECON_SQL,
    doc="Two-table embedding-level decontamination (the semantic twin "
    "of decontamination_overlap's 13-gram check): train vectors whose "
    f"cosine to ANY eval vector reaches {DECON_TAU}, found through the "
    "same deterministic IVF layout as ivf_ann_topk — train vectors "
    "assigned to their max-cosine cell, each eval vector probing its "
    f"{NPROBE} nearest cells, exact rescoring only inside probed "
    "cells. Emits each contaminated train id once with its strongest "
    "eval witness (tie-break min eval_id). Scale: the eval set is "
    "benchmark-sized (orders smaller than the corpus) so its probe "
    "list broadcasts; the corpus is scanned once for assignment "
    "(map-side max_by over the broadcast nlist-bounded centroid set) "
    "and the contamination join is a cell-key equi-join — never "
    "corpus x eval brute force. The per-train max is a groupBy "
    "max_by, not a rank window.",
    tags=("similarity", "decontamination", "approx"),
)
def semantic_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("emb")
    )
    n = e.withColumn("nrm", F.sqrt(_dot(F.col("emb"), F.col("emb")))).persist()
    cents = n.filter(F.col("vec_id") % CENT_MOD == 0).select(
        F.col("vec_id").alias("cid"), F.col("emb").alias("c_emb"), F.col("nrm").alias("c_nrm")
    )
    csim = F.round(_dot(F.col("emb"), F.col("c_emb")) / (F.col("nrm") * F.col("c_nrm")), 6)
    assigned = (
        n.filter(F.col("vec_id") % EVAL_VEC_MOD != 1)
        .crossJoin(F.broadcast(cents))
        .withColumn("csim", csim)
        .groupBy("vec_id")
        .agg(
            F.first("emb").alias("emb"),
            F.first("nrm").alias("nrm"),
            F.max_by("cid", F.struct(F.col("csim"), (-F.col("cid")).alias("neg"))).alias("cell"),
        )
    )
    ev = n.filter(F.col("vec_id") % EVAL_VEC_MOD == 1).select(
        F.col("vec_id").alias("eval_id"), F.col("emb").alias("q_emb"), F.col("nrm").alias("q_nrm")
    )
    qsim = F.round(_dot(F.col("q_emb"), F.col("c_emb")) / (F.col("q_nrm") * F.col("c_nrm")), 6)
    wq = W.partitionBy("eval_id").orderBy(F.desc("csim"), "cid")
    probes = (
        ev.crossJoin(F.broadcast(cents))
        .withColumn("csim", qsim)
        .withColumn("crank", F.row_number().over(wq))
        .filter(F.col("crank") <= NPROBE)
        .select("eval_id", "q_emb", "q_nrm", F.col("cid").alias("probe_cell"))
    )
    hits = (
        assigned.join(F.broadcast(probes), F.col("cell") == F.col("probe_cell"))
        .select(
            F.col("vec_id").alias("train_id"),
            "eval_id",
            F.round(_dot(F.col("emb"), F.col("q_emb")) / (F.col("nrm") * F.col("q_nrm")), 6).alias(
                "sim"
            ),
        )
        .distinct()  # a train vec reachable via several probed cells counts once per eval
        .filter(F.col("sim") >= DECON_TAU)
    )
    return (
        hits.groupBy("train_id")
        .agg(
            F.max("sim").alias("sim"),
            F.max_by("eval_id", F.struct(F.col("sim"), (-F.col("eval_id")).alias("neg"))).alias(
                "eval_id"
            ),
        )
        .select("train_id", "eval_id", "sim")
        .orderBy("train_id")
    )


# -- ANN index-quality evaluation ----------------------------------------------

# LCM of possible first-hit ranks 1..TOP_K (=3): reciprocal ranks become
# exact integers (6/1, 6/2, 6/3) so MRR sums are order-independent.
_RR_SCALE = 6

_ANN_EVAL_SQL = f"""
WITH gold AS ({_TOPK_SQL.replace("ORDER BY q_id, rank", "")}),
cand AS ({_IVF_SQL.replace("ORDER BY q_id, rank", "")}),
hits AS (
  SELECT c.q_id, c.rank AS cand_rank
  FROM cand c JOIN gold g ON g.q_id = c.q_id AND g.neighbor_id = c.neighbor_id
),
per_q AS (
  SELECT q_id,
         CAST(COUNT(*) AS BIGINT) AS hits_at_k,
         CAST(MIN(cand_rank) AS BIGINT) AS first_hit_rank
  FROM hits GROUP BY 1
)
SELECT g.q_id,
       COALESCE(p.hits_at_k, 0) AS hits_at_k,
       COALESCE(p.first_hit_rank, 0) AS first_hit_rank,
       CAST(CASE WHEN p.first_hit_rank IS NULL THEN 0
            ELSE {_RR_SCALE} // p.first_hit_rank END AS BIGINT) AS rr_x{_RR_SCALE}
FROM (SELECT DISTINCT q_id FROM gold) g
LEFT JOIN per_q p USING (q_id)
ORDER BY q_id
"""


@register(
    "ann_recall_eval",
    _ANN_EVAL_SQL,
    doc=f"Index-quality evaluation as a first-class operator (the ANN "
    "twin of minhash_jaccard_accuracy's sketch calibration): per "
    f"query, how many of the brute-force top-{TOP_K} the IVF index "
    "returned (recall@k numerator) and the reciprocal rank of its "
    f"first true hit — scaled by {_RR_SCALE} = lcm(1..{TOP_K}) so "
    "every reciprocal is an exact INTEGER and the MRR a consumer "
    "derives is an order-independent integer sum, never a float "
    "accumulation. Queries with no hit emit 0s (the LEFT JOIN row), "
    "so a recall regression is visible, not silently absent. Scale: "
    "both arms are the already-bounded operators (brute force is the "
    "documented exact baseline; IVF is the scale path); the eval "
    "itself joins two k*|Q|-row frames — negligible at any corpus "
    "size, which is the point of making evaluation an operator: it "
    "rides along on every index build.",
    tags=("similarity", "eval"),
)
def ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    gold = embedding_topk(spark, sf_dir).select("q_id", "neighbor_id")
    cand = ivf_ann_topk(spark, sf_dir).select("q_id", "neighbor_id", "rank")
    hits = cand.join(gold, ["q_id", "neighbor_id"])
    per_q = hits.groupBy("q_id").agg(
        F.count(F.lit(1)).alias("hits_at_k"),
        F.min("rank").alias("first_hit_rank"),
    )
    qs = gold.select("q_id").distinct()
    return (
        qs.join(per_q, "q_id", "left")
        .select(
            "q_id",
            F.coalesce("hits_at_k", F.lit(0)).alias("hits_at_k"),
            F.coalesce("first_hit_rank", F.lit(0)).alias("first_hit_rank"),
            F.when(
                F.col("first_hit_rank").isNull(), F.lit(0)
            )
            .otherwise((F.lit(_RR_SCALE) / F.col("first_hit_rank")).cast("long"))
            .alias(f"rr_x{_RR_SCALE}"),
        )
        .orderBy("q_id")
    )
