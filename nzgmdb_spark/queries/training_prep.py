"""Training-data preparation operators: model-based quality filtering,
dimensionality reduction, edit-distance near-dup, and corpus mixing budgets.

These fill the gaps a 100 TB LLM-pretraining pipeline hits after the
dedup / similarity / text-analysis families: scoring documents with a
(linear) quality classifier, shrinking embeddings before ANN indexing,
catching near-duplicates that token-shingle methods miss (small character
edits), and allocating a sampling budget across domains UniMax-style
(Chung et al. 2023, "UniMax: Fairer and More Effective Language Sampling").

Scale design notes per operator are on the functions. Shared idioms:
portable pseudo-randomness is md5-derived integers (no RNG, identical in
Spark and DuckDB), displayed floats go through ``pround`` (portable
half-up rounding), and dot products / projections accumulate exactly
(fixed-point BIGINT) so the reduction order is irrelevant and results
are bit-identical to the oracle.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nzgmdb_spark.functions import pround
from nzgmdb_spark.operators.lsh import DEFAULT_BUCKET_CAP, capped_band_candidates
from nzgmdb_spark.queries.registry import register
from nzgmdb_spark.tables import tbl

# ---------------------------------------------------------------------------
# fastText-style linear quality classifier
#
# Reference-pipeline parity: the reference scores records with trained
# models behind seams (clip probability at nzgmdb/calculation/...; the
# same "apply a trained scorer to every row" shape); public LLM pipelines
# (CCNet, Dolma, fastText quality filters) apply a linear bag-of-words
# classifier per document. The model here is a deterministic hashed-weight
# linear scorer: weight(token) = (md5-bucket % 2001 - 1000), i.e. a fixed
# vector in [-1, 1] scaled by 1000 — the exact plan shape of a real
# fastText scorer (hash token -> weight lookup -> mean -> sigmoid) with a
# hash-derived weight table standing in for trained parameters.
#
# 100 TB plan: ZERO shuffle. The token weights are a pure expression of
# the token bytes (no weight-table join at all — the "table" is the hash),
# the per-document reduction is an integer F.aggregate over the token
# array (exact, order-independent), and the sigmoid is a scalar. Every
# stage is JVM whole-stage codegen on the scan.
# ---------------------------------------------------------------------------

QUALITY_CLASSIFIER_SQL = """
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS w
  FROM documents
),
scored AS (
  SELECT doc_id,
         CAST(len(w) AS BIGINT) AS n_tokens,
         list_sum(list_transform(
           w,
           x -> (CAST(('0x' || substr(md5(x), 1, 6)) AS BIGINT) % 2001) - 1000
         )) AS sum_w
  FROM toks
  WHERE len(w) >= 1
)
SELECT doc_id, n_tokens,
       floor(1.0 / (1.0 + exp(-(CAST(sum_w AS DOUBLE) / (1000.0 * n_tokens))))
             * 1000000.0 + 0.5) / 1000000.0 AS quality_prob,
       sum_w >= 0 AS keep
FROM scored
"""


def _token_weight(t: Column) -> Column:
    """Hashed linear-classifier weight: integer in [-1000, 1000]."""
    h = F.conv(F.substring(F.md5(t.cast("binary")), 1, 6), 16, 10).cast("bigint")
    return (h % 2001) - 1000


@register(
    "text_quality_classifier",
    sql=QUALITY_CLASSIFIER_SQL,
    survey=["F5", "F9", "P7"],
)
def text_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tbl(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda x: x != "")
    d = d.select("doc_id", toks.alias("w")).filter(F.size("w") >= 1)
    sum_w = F.aggregate(
        F.col("w"),
        F.lit(0).cast("bigint"),
        lambda acc, t: acc + _token_weight(t),
    )
    d = d.select(
        "doc_id", F.size("w").cast("bigint").alias("n_tokens"), sum_w.alias("sum_w")
    )
    score = F.col("sum_w").cast("double") / (1000.0 * F.col("n_tokens"))
    return d.select(
        "doc_id",
        "n_tokens",
        pround(F.lit(1.0) / (F.lit(1.0) + F.exp(-score)), 6).alias("quality_prob"),
        (F.col("sum_w") >= 0).alias("keep"),
    )


# ---------------------------------------------------------------------------
# Johnson-Lindenstrauss sign random projection (64 -> 8 dims)
#
# The standard pre-ANN shrink: project embeddings onto k fixed random-sign
# directions (Achlioptas 2001 database-friendly projections — entries
# ±1 preserve pairwise distances in expectation at 1/sqrt(k) scale). The
# sign matrix is derived from md5("rp:j:d") at import time and inlined as
# literals into BOTH the Spark expression and the SQL oracle, so there is
# no RNG and no weight table to ship.
#
# 100 TB plan: ZERO shuffle. Each output dim is a zip_with product +
# fixed-point F.aggregate over the embedding array, all map-side on the
# scan; the 8 dims explode via inline() (a Generate, not an exchange).
# Exactness: each product is quantized to 1e-6 as floor(x*1e6 + 0.5)
# (the same IEEE double sequence on both engines) and accumulated as
# BIGINT — an exact, order-independent sum, unlike a double accumulator
# (order-dependent) or a Spark DECIMAL(38,12) accumulator (binary `+`
# demotes the result to scale 11). The oracle joins a 512-row VALUES
# sign table in long form — same math, shaped for SQL.
# ---------------------------------------------------------------------------

_RP_IN_DIMS = 64
_RP_OUT_DIMS = 8


def _rp_sign(j: int, d: int) -> float:
    """Deterministic ±1: first md5 byte of "rp:j:d" below 0x80 -> +1."""
    return 1.0 if hashlib.md5(f"rp:{j}:{d}".encode()).digest()[0] < 128 else -1.0


_RP_SIGNS = [
    [_rp_sign(j, d) for d in range(_RP_IN_DIMS)] for j in range(_RP_OUT_DIMS)
]

_RP_VALUES = ", ".join(
    f"({d}, {j}, {_RP_SIGNS[j][d]:.1f})"
    for j in range(_RP_OUT_DIMS)
    for d in range(_RP_IN_DIMS)
)

RANDOM_PROJECTION_SQL = f"""
WITH dims AS (
  SELECT vec_id, g.i AS dim, CAST(embedding[g.i + 1] AS DOUBLE) AS v
  FROM embeddings, UNNEST(generate_series(0, len(embedding) - 1)) AS g(i)
),
signs(dim, proj_dim, s) AS (VALUES {_RP_VALUES})
SELECT vec_id, CAST(proj_dim AS INT) AS proj_dim,
       floor(CAST(sum(CAST(floor(v * s * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
             / 1000000.0 * 1000000.0 + 0.5) / 1000000.0 AS proj
FROM dims JOIN signs USING (dim)
GROUP BY vec_id, proj_dim
"""


@register(
    "similarity_random_projection",
    sql=RANDOM_PROJECTION_SQL,
    survey=["F9", "F11"],
)
def similarity_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tbl(spark, sf_dir, "embeddings")
    # zip_with against the fixed 64-sign array yields silent NULL products
    # on any other embedding length — fail loudly on schema drift instead.
    # (.filter(assert_true(..).isNull()) keeps the always-true predicate
    # alive in the plan; a dropped column would be pruned by Catalyst.)
    e = e.filter(
        F.assert_true(
            F.size("embedding") == _RP_IN_DIMS,
            F.concat(
                F.lit(
                    f"similarity_random_projection: embedding dim != "
                    f"{_RP_IN_DIMS} for vec_id "
                ),
                F.col("vec_id").cast("string"),
            ),
        ).isNull()
    )

    def proj(j: int) -> Column:
        signs = F.array(*[F.lit(s) for s in _RP_SIGNS[j]])
        prods = F.zip_with(
            F.col("embedding"),
            signs,
            lambda v, s: F.floor(v.cast("double") * s * 1e6 + 0.5).cast(
                "bigint"
            ),
        )
        total = F.aggregate(prods, F.lit(0).cast("bigint"), lambda a, x: a + x)
        return pround(total.cast("double") / 1e6, 6)

    projs = F.array(
        *[
            F.struct(
                F.lit(j).cast("int").alias("proj_dim"), proj(j).alias("proj")
            )
            for j in range(_RP_OUT_DIMS)
        ]
    )
    return e.select("vec_id", F.inline(projs))


# ---------------------------------------------------------------------------
# Blocked edit-distance near-dup (Levenshtein verify on blocked candidates)
#
# Catches the near-dup class shingle methods under-weight: small CHARACTER
# edits (typo floods, boilerplate with one substituted entity). Candidate
# generation is a blocked equi-join — block key = (first 16 normalized
# chars, length band n_chars div 32); each doc lands in exactly ONE block
# (the key is a function of the doc), so no cross-block duplicate pairs
# and no distinct needed. Blocks route through the shared
# capped_band_candidates clique/star helper (operators/lsh.py), the same
# flood-linearization every other candidate generator uses: an
# exact-duplicate flood inside one block emits O(B) star pairs, never
# O(B^2). Verification uses Spark's THRESHOLDED levenshtein (banded DP,
# O(threshold * len) per pair instead of O(len^2)) over candidates only.
#
# The oracle enumerates the full within-block clique — identical results
# while every block stays under DEFAULT_BUCKET_CAP, asserted by
# tests/test_training_prep.py on the gate corpus (same contract as
# dedup_semantic_semdedup).
# ---------------------------------------------------------------------------

_LEV_MAX = 64  # absolute cap -> banded DP; also the Spark threshold arg
_LEV_REL = 0.2  # relative cap: lev <= 20% of the longer text

EDIT_DISTANCE_SQL = f"""
WITH blocks AS (
  SELECT doc_id, text,
         substr(lower(text), 1, 16) AS pfx,
         n_chars // 32 AS band
  FROM documents
),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.text AS ta, b.text AS tb
  FROM blocks a
  JOIN blocks b ON a.pfx = b.pfx AND a.band = b.band AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
       CAST(levenshtein(ta, tb) AS BIGINT) AS edit_distance,
       floor(levenshtein(ta, tb)
             / CAST(greatest(length(ta), length(tb)) AS DOUBLE)
             * 1000000.0 + 0.5) / 1000000.0 AS rel_distance
FROM cand
WHERE levenshtein(ta, tb) <= {_LEV_MAX}
  AND levenshtein(ta, tb)
      <= {_LEV_REL} * CAST(greatest(length(ta), length(tb)) AS DOUBLE)
"""


def _edit_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tbl(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        "text",
        F.substring(F.lower(F.col("text")), 1, 16).alias("pfx"),
        F.expr("n_chars div 32").alias("band"),
    )


@register(
    "dedup_edit_distance",
    sql=EDIT_DISTANCE_SQL,
    survey=["J7", "A2", "P6"],
)
def dedup_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    blocks = _edit_blocks(spark, sf_dir)
    cand = capped_band_candidates(
        blocks,
        id_col="doc_id",
        key_cols=["pfx", "band"],
        a_name="doc_a",
        b_name="doc_b",
        payload_cols=["text"],
    )
    lev = F.levenshtein(F.col("text_a"), F.col("text_b"), _LEV_MAX)
    longer = F.greatest(
        F.length("text_a"), F.length("text_b")
    ).cast("double")
    return (
        cand.select("doc_a", "doc_b", lev.alias("_lev"), longer.alias("_len"))
        # thresholded levenshtein returns -1 past the cap
        .filter(
            (F.col("_lev") >= 0) & (F.col("_lev") <= _LEV_REL * F.col("_len"))
        )
        .select(
            "doc_a",
            "doc_b",
            F.col("_lev").cast("bigint").alias("edit_distance"),
            pround(F.col("_lev") / F.col("_len"), 6).alias("rel_distance"),
        )
    )


# ---------------------------------------------------------------------------
# UniMax sampling-budget waterfilling (Chung et al. 2023)
#
# Given per-domain document counts and a total sampling budget B, allocate
# each domain quota_i = min(c_i, t) where the water level t solves
# sum_i min(c_i, t) = B: small domains are taken whole, large domains are
# uniformly capped — the fairness allocation UniMax argues for over
# temperature sampling. Domains here are the document's first token (a
# naturally skewed grouping on the synthetic corpus); B = 50% of corpus.
#
# The closed form over counts sorted ascending: with cum_prev the sum of
# all smaller counts and r domains remaining, t = (B - cum_prev) / r for
# the FIRST row where that value fits under the row's own count.
#
# 100 TB plan: one map-side-combined count aggregation (rows = #domains),
# then a single-partition window over the DOMAIN dimension only —
# #domains is thousands at worst while docs are billions, so the serial
# stage is O(domains), and the scalar water level broadcasts back. The
# docs themselves are touched exactly once.
# ---------------------------------------------------------------------------

UNIMAX_SQL = """
WITH dom AS (
  SELECT split_part(text, ' ', 1) AS domain, count(*) AS n_docs
  FROM documents GROUP BY 1
),
ordered AS (
  SELECT domain, n_docs,
         row_number() OVER (ORDER BY n_docs, domain) AS i,
         CAST(coalesce(sum(n_docs) OVER (
           ORDER BY n_docs, domain
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS DOUBLE)
           AS cum_prev,
         CAST(floor(0.5 * sum(n_docs) OVER ()) AS DOUBLE) AS budget,
         count(*) OVER () AS k
  FROM dom
),
lvl AS (
  SELECT domain, n_docs,
         first_value(
           CASE WHEN (budget - cum_prev) / (k - i + 1.0)
                     <= CAST(n_docs AS DOUBLE)
                THEN (budget - cum_prev) / (k - i + 1.0) END
           IGNORE NULLS
         ) OVER (ORDER BY i
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
           AS t
  FROM ordered
)
SELECT domain, n_docs,
       floor(least(CAST(n_docs AS DOUBLE), t) * 1000000.0 + 0.5)
         / 1000000.0 AS quota,
       CAST(floor(least(CAST(n_docs AS DOUBLE), t)) AS BIGINT) AS quota_docs
FROM lvl
"""


@register(
    "sample_unimax_budget",
    sql=UNIMAX_SQL,
    survey=["A2", "W3", "F9"],
)
def sample_unimax_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tbl(spark, sf_dir, "documents")
    dom = d.groupBy(
        F.split_part(F.col("text"), F.lit(" "), F.lit(1)).alias("domain")
    ).agg(F.count("*").alias("n_docs"))

    # Single-partition windows over the DOMAIN dim only (#domains rows) —
    # the ordered cumsum, the corpus totals, and the first-valid water
    # level all ride the same tiny sorted partition, so the whole
    # waterfill after the count aggregation is ONE exchange.
    w = Window.orderBy("n_docs", "domain")
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ordered = dom.select(
        "domain",
        "n_docs",
        F.row_number().over(w).alias("i"),
        F.coalesce(
            F.sum("n_docs").over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        )
        .cast("double")
        .alias("cum_prev"),
        F.floor(0.5 * F.sum("n_docs").over(w_all)).cast("double").alias("budget"),
        F.count("*").over(w_all).alias("k"),
    )
    t_expr = (F.col("budget") - F.col("cum_prev")) / (
        F.col("k") - F.col("i") + 1.0
    )
    lvl = ordered.select(
        "domain",
        "n_docs",
        F.first(
            F.when(t_expr <= F.col("n_docs").cast("double"), t_expr),
            ignorenulls=True,
        )
        .over(
            Window.orderBy("i").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .alias("t"),
    )
    quota = F.least(F.col("n_docs").cast("double"), F.col("t"))
    return lvl.select(
        "domain",
        "n_docs",
        pround(quota, 6).alias("quota"),
        F.floor(quota).cast("bigint").alias("quota_docs"),
    )


# ---------------------------------------------------------------------------
# k-NN majority-label classification (label propagation over embeddings)
#
# The simplest embedding-space classifier: predict a query vector's label
# by majority vote of its top-10 cosine neighbors (deterministic
# tie-break: highest vote count, then smallest label). Composes the
# registered brute-force kNN — the declared-O(n) baseline — so the vote
# inherits its decimal-exact cosine ranking; swap in the IVF/PQ searchers
# for the 100 TB path (identical downstream vote).
#
# 100 TB plan: the kNN result is O(queries * k) rows; the label join
# broadcasts it against the corpus scan, and the vote aggregation is over
# that tiny relation — nothing beyond the underlying search touches the
# full corpus.
# ---------------------------------------------------------------------------

from nzgmdb_spark.queries.similarity import KNN_SQL, knn_cosine_bruteforce  # noqa: E402

KNN_LABEL_SQL = f"""
WITH knn AS ({KNN_SQL}),
votes AS (
  SELECT k.q_id, e.label, count(*) AS n_votes
  FROM knn k JOIN embeddings e ON e.vec_id = k.vec_id
  GROUP BY k.q_id, e.label
)
SELECT q_id, CAST(label AS INT) AS predicted_label,
       CAST(n_votes AS BIGINT) AS n_votes
FROM votes
QUALIFY row_number() OVER (
  PARTITION BY q_id ORDER BY n_votes DESC, label) = 1
"""


@register(
    "knn_label_vote",
    sql=KNN_LABEL_SQL,
    survey=["A1", "A2", "J1"],
)
def knn_label_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    knn = knn_cosine_bruteforce(spark, sf_dir)
    labels = tbl(spark, sf_dir, "embeddings").select("vec_id", "label")
    votes = (
        labels.join(F.broadcast(knn), "vec_id")
        .groupBy("q_id", "label")
        .agg(F.count("*").alias("n_votes"))
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("n_votes").desc(), F.col("label")
    )
    return (
        votes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "q_id",
            F.col("label").cast("int").alias("predicted_label"),
            "n_votes",
        )
    )
