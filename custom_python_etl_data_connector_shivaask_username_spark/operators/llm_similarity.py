"""Similarity search over embeddings (SURVEY.md §2.11 L3-L5).

Three tiers, matching how this runs at increasing scale:

1. ``q_topk_similar_embeddings`` — brute-force cosine top-k against a
   query vector. One scan, no shuffle, TakeOrderedAndProject; at 100 TB
   this is the *correct* baseline when the query set is small (it is
   scan-bound and embarrassingly parallel).
2. ``q_similar_pairs_within_label`` — blocked all-pairs join: the label
   column is the blocking key, so the self-join shuffles once on label
   and never goes cartesian across blocks.
3. ``q_ann_lsh_topk`` — random-hyperplane LSH: each vector gets a
   deterministic bucket id from sign bits of projections; candidates are
   co-bucketed rows only. This is the 100 TB path: the expensive join
   becomes a groupBy on (bucket), candidate counts drop by ~2^bits, and
   recall is tunable with bits/probes. Registered rows-only (bucket
   membership is engine-specific); recall is pinned by unit test.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vector import cosine, dot, lit_vector
from ..registry import query
from ..tables import load_table

QUERY_VEC_ID = 0
TOP_K = 10

_TOPK_ORACLE = f"""
WITH q AS (
  SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
  WHERE vec_id = {QUERY_VEC_ID}
)
SELECT
  vec_id,
  label,
  ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]), (SELECT qv FROM q)), 6)
    AS cos_sim
FROM embeddings
WHERE vec_id != {QUERY_VEC_ID}
ORDER BY cos_sim DESC, vec_id
LIMIT {TOP_K}
"""


@query("q_topk_similar_embeddings", oracle=_TOPK_ORACLE)
def q_topk_similar_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3 exact baseline: scan-parallel cosine vs one query vector."""
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = (
        emb.filter(F.col("vec_id") == QUERY_VEC_ID)
        .select("embedding")
        .first()["embedding"]
    )
    return (
        emb.filter(F.col("vec_id") != QUERY_VEC_ID)
        .select(
            "vec_id",
            "label",
            F.round(cosine(F.col("embedding"), lit_vector(qvec)), 6).alias(
                "cos_sim"
            ),
        )
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        .limit(TOP_K)
    )


PAIR_THRESHOLD = 0.30

_PAIRS_ORACLE = f"""
SELECT a.label AS label,
       a.vec_id AS vec_a,
       b.vec_id AS vec_b,
       ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])), 6) AS cos_sim
FROM embeddings a JOIN embeddings b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                   CAST(b.embedding AS DOUBLE[])), 6)
      >= {PAIR_THRESHOLD}
ORDER BY label, vec_a, vec_b
"""


@query("q_similar_pairs_within_label", oracle=_PAIRS_ORACLE)
def q_similar_pairs_within_label(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """L4 blocked pair join. Membership is decided on the ROUNDED cosine
    so both engines agree at the threshold boundary."""
    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.select(
        F.col("label"),
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("emb_a"),
    )
    b = emb.select(
        F.col("label").alias("label_b"),
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("emb_b"),
    )
    cos = F.round(cosine(F.col("emb_a"), F.col("emb_b")), 6)
    return (
        a.join(
            b,
            (F.col("label") == F.col("label_b"))
            & (F.col("vec_a") < F.col("vec_b")),
        )
        .withColumn("cos_sim", cos)
        .filter(F.col("cos_sim") >= PAIR_THRESHOLD)
        .select("label", "vec_a", "vec_b", "cos_sim")
        .orderBy("label", "vec_a", "vec_b")
    )


# --- L3 scale path: random-hyperplane LSH ------------------------------------

LSH_BITS = 8
LSH_DIM = 64
_rng = np.random.RandomState(42)
#: deterministic hyperplanes, shared by every caller (seeded, not random
#: per run — resume/retry safe)
LSH_PLANES: list[list[float]] = _rng.standard_normal(
    (LSH_BITS, LSH_DIM)
).tolist()


def lsh_bucket(emb_col) -> F.Column:
    """Bucket id = sign-bit signature of ``LSH_BITS`` projections."""
    bucket = F.lit(0)
    for i, plane in enumerate(LSH_PLANES):
        bit = F.when(dot(emb_col, lit_vector(plane)) >= 0, F.lit(1 << i)).otherwise(
            F.lit(0)
        )
        bucket = bucket + bit
    return bucket


def ann_topk_df(
    emb: DataFrame,
    query_vec_id: int = QUERY_VEC_ID,
    k: int = TOP_K,
    probe_hamming: int = 0,
) -> DataFrame:
    """Approximate top-k: brute-force cosine, but only within the query's
    LSH bucket — the candidate set shrinks ~2^bits-fold.

    ``probe_hamming=1`` multi-probes all buckets within Hamming distance 1
    of the query's bucket (bits+1 buckets instead of 1): the standard
    recall/cost dial when buckets are sparse.
    """
    emb = emb.withColumn("bucket", lsh_bucket(F.col("embedding")))
    q = emb.filter(F.col("vec_id") == query_vec_id).select(
        "embedding", "bucket"
    ).first()
    buckets = [q["bucket"]]
    if probe_hamming >= 1:
        buckets += [q["bucket"] ^ (1 << i) for i in range(LSH_BITS)]
    return (
        emb.filter(
            F.col("bucket").isin(buckets)
            & (F.col("vec_id") != query_vec_id)
        )
        .select(
            "vec_id",
            "label",
            F.round(
                cosine(F.col("embedding"), lit_vector(q["embedding"])), 6
            ).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        .limit(k)
    )


def ann_topk(
    spark: SparkSession,
    sf_dir: str,
    query_vec_id: int = QUERY_VEC_ID,
    k: int = TOP_K,
    probe_hamming: int = 1,
) -> DataFrame:
    return ann_topk_df(
        load_table(spark, sf_dir, "embeddings"), query_vec_id, k, probe_hamming
    )


@query("q_ann_lsh_topk")  # rows-only: bucket membership is approximate
def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ann_topk(spark, sf_dir)


# --- L5: per-label centroids ----------------------------------------------------

_CENTROID_ORACLE = """
SELECT label, pos,
       CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(27,6))) AS DOUBLE)
         / COUNT(*) AS centroid_val
FROM (
  SELECT label,
         generate_subscripts(embedding, 1) - 1 AS pos,
         unnest(embedding) AS v
  FROM embeddings
)
GROUP BY label, pos
ORDER BY label, pos
"""


@query("q_embedding_centroids", oracle=_CENTROID_ORACLE)
def q_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5: label centroids via posexplode + exact-decimal mean per
    dimension. At scale this is one shuffle keyed (label, pos) — 640
    cells regardless of row count, with map-side partial aggregation
    doing nearly all the work."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select(
            "label", F.posexplode("embedding").alias("pos", "v")
        )
        .groupBy("label", "pos")
        .agg(
            (
                F.sum(
                    F.col("v").cast("double").cast("decimal(27,6)")
                ).cast("double")
                / F.count(F.lit(1))
            ).alias("centroid_val")
        )
        .orderBy("label", "pos")
    )
