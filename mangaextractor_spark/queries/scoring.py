"""Model-application operators: a quantized linear quality classifier
(the fastText-style "apply a trained filter model to every document"
deployment shape) and tokenizer vocabulary coverage (the OOV-rate
report run before committing to a vocabulary).

Both follow the repo's determinism rules (queries/__init__.py): the
classifier's decision function is an integer dot product of
e6-fixed-point features against integer-quantized weights — only the
SIGN of w.x - b matters for the keep/drop decision, so the logistic
squash is dropped entirely and the score is BIGINT-exact across
engines and partitionings. Vocabulary coverage follows the
_scale_notes.py hot-key playbook: the exploded token frame is
persisted once (it feeds both the vocabulary election and the coverage
probe), counts are map-side-combined groupBys, and the |V|-row
vocabulary broadcasts back.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_table, spread
from . import register
from ._portable import WORDS_SQL, words_col
from .textops import LEXICONS, _score, _score_sql

_WS = WORDS_SQL.format(t="text")
_PUNCT_RE = "[.,!?;:]"

# -- quantized linear quality classifier -------------------------------------

# Integer-quantized weights of an offline-trained linear filter
# (logistic regression / fastText-linear shape). Features are
# e6-scaled exact-integer ratios plus a capped token count; weights
# and bias live on the same fixed-point scale, so the decision value
# is one BIGINT dot product. Real deployments swap these constants
# for their trained model's quantized weights — the OPERATOR (one
# map-side scan, zero shuffles, recomputable per row) is what's under
# test, exactly like gopher_quality_filter's published-constant gates.
CLS_SCALE = 1_000_000
TOKEN_CAP = 256
W_TOKENS = 2_000          # longer docs score higher, capped
W_STOP_E6 = 3             # stopword-rich text looks like natural language
W_PUNCT_E6 = -8           # punctuation floods look like boilerplate/spam
B_BIAS = 200_000          # decision threshold at score >= 0 (median
                          # corpus score, so the fixture splits ~50/50
                          # and both branches stay exercised)

_CLS_SQL = f"""
WITH f AS (
  SELECT doc_id,
         LEAST(len({_WS}), {TOKEN_CAP}) AS t_cap,
         ({CLS_SCALE} * {_score_sql(_WS, LEXICONS["en"])})
           // GREATEST(len({_WS}), 1) AS stop_e6,
         ({CLS_SCALE} * (length(text) - length(regexp_replace(text, '{_PUNCT_RE}', '', 'g'))))
           // GREATEST(length(text), 1) AS punct_e6
  FROM documents
)
SELECT doc_id, t_cap, stop_e6, punct_e6,
       CAST({W_TOKENS} * t_cap + {W_STOP_E6} * stop_e6
            + {W_PUNCT_E6} * punct_e6 - {B_BIAS} AS BIGINT) AS score,
       ({W_TOKENS} * t_cap + {W_STOP_E6} * stop_e6
            + {W_PUNCT_E6} * punct_e6 - {B_BIAS}) >= 0 AS keep
FROM f
ORDER BY doc_id
"""


@register(
    "quality_classifier_scores",
    _CLS_SQL,
    doc="Quantized linear quality classifier applied to every document "
    "— the deployment shape of a fastText/logistic quality filter "
    "(CCNet, RedPajama and Gopher all gate on one): features are "
    "e6-fixed-point exact-integer ratios (stopword density, "
    "punctuation density, capped token count), weights are "
    "integer-quantized, and because only the SIGN of w.x - b decides "
    "keep/drop, the logistic squash is dropped — the score is ONE "
    "BIGINT dot product, bit-identical across engines and "
    "partitionings (a float sigmoid would drift). Scale shape: pure "
    "map-side Column expressions over one corpus scan; zero shuffles, "
    "zero UDFs, the decision recomputable for any row in isolation "
    "(so re-scoring a grown corpus never flips prior rows). Swap the "
    "declared constants for trained quantized weights to productionize "
    "— the plan does not change.",
    tags=("text", "quality", "pipeline"),
)
def quality_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    ws = words_col(F.col("text"))
    n_chars = F.length("text")
    n_punct = n_chars - F.length(F.regexp_replace(F.col("text"), _PUNCT_RE, ""))
    f = d.select(
        "doc_id",
        F.least(F.size(ws), F.lit(TOKEN_CAP)).cast("long").alias("t_cap"),
        (F.lit(CLS_SCALE).cast("long") * _score(ws, LEXICONS["en"]))
        .cast("long")
        .alias("_stop_num"),
        F.greatest(F.size(ws), F.lit(1)).cast("long").alias("_stop_den"),
        (F.lit(CLS_SCALE).cast("long") * n_punct).cast("long").alias("_punct_num"),
        F.greatest(n_chars, F.lit(1)).cast("long").alias("_punct_den"),
    ).select(
        "doc_id",
        "t_cap",
        F.expr("_stop_num DIV _stop_den").alias("stop_e6"),
        F.expr("_punct_num DIV _punct_den").alias("punct_e6"),
    )
    score = (
        F.lit(W_TOKENS).cast("long") * F.col("t_cap")
        + F.lit(W_STOP_E6).cast("long") * F.col("stop_e6")
        + F.lit(W_PUNCT_E6).cast("long") * F.col("punct_e6")
        - F.lit(B_BIAS).cast("long")
    )
    return f.select(
        "doc_id",
        "t_cap",
        "stop_e6",
        "punct_e6",
        score.cast("long").alias("score"),
        (score >= 0).alias("keep"),
    ).orderBy("doc_id")


# -- tokenizer vocabulary coverage -------------------------------------------

# Production vocabularies are 32k-256k entries; the synthetic corpus
# has a 31-word vocabulary, so K=16 keeps the OOV branch exercised
# (K above the corpus vocabulary size degenerates to OOV=0 everywhere).
VOCAB_K = 16

_COVERAGE_SQL = f"""
WITH toks AS (
  SELECT lang, UNNEST({_WS}) AS token FROM documents
),
cnt AS (SELECT token, COUNT(*) AS cnt FROM toks GROUP BY token),
vocab AS (SELECT token FROM cnt ORDER BY cnt DESC, token LIMIT {VOCAB_K})
SELECT t.lang,
       COUNT(*) AS total_tokens,
       CAST(SUM(CASE WHEN v.token IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS in_vocab_tokens,
       (1000000 * CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT))
         // COUNT(*) AS oov_e6
FROM toks t LEFT JOIN vocab v USING (token)
GROUP BY t.lang
ORDER BY t.lang
"""


@register(
    "vocab_coverage",
    _COVERAGE_SQL,
    doc=f"Tokenizer vocabulary coverage: elect the top-{VOCAB_K} corpus "
    "vocabulary by global token frequency (total order: count desc, "
    "token asc), then report per-language token totals and e6-scaled "
    "OOV rates — the go/no-go report run before committing a trained "
    "vocabulary to a tokenization pass (a language whose OOV rate "
    "spikes is about to be shredded into bytes). Scale shape — the "
    "_scale_notes.py playbook end to end: the exploded token frame is "
    "persisted ONCE (it feeds both the vocabulary election and the "
    "coverage probe — without the persist the broadcast build "
    "re-executes the corpus explode); token counts are a "
    "map-side-combined groupBy; the election is orderBy+limit, which "
    "Spark plans as TakeOrdered (per-partition top-k then an O(K x "
    "partitions) merge — never a corpus-sized rank window); the "
    f"{VOCAB_K}-row vocabulary BROADCASTS back onto the token stream, "
    "and the final per-language rollup is one more map-side-combined "
    "groupBy. A corpus-frequent token is a hot broadcast-probe value — "
    "embarrassingly parallel, never a window pin.",
    tags=("text", "tokenizer", "pipeline"),
)
def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    # persisted once: feeds the vocabulary election AND the coverage
    # probe (queries/_scale_notes.py — a broadcast build does not share
    # scan results with the probe side without a cache)
    toks = d.select(
        "lang", F.explode(words_col(F.col("text"))).alias("token")
    ).persist()
    cnt = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    vocab = cnt.orderBy(F.desc("cnt"), F.asc("token")).limit(VOCAB_K).select(
        "token", F.lit(1).alias("in_v")
    )
    joined = toks.join(F.broadcast(vocab), "token", "left")
    return (
        joined.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("total_tokens"),
            F.sum(F.when(F.col("in_v").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("in_vocab_tokens"),
            F.expr(
                "(1000000 * CAST(SUM(CASE WHEN in_v IS NULL THEN 1 ELSE 0 END) AS BIGINT))"
                " DIV COUNT(*)"
            ).alias("oov_e6"),
        )
        .orderBy("lang")
    )
