"""X25: seeded quality classifier — the GPT-3/LLaMA curation recipe.

The third quality signal beside the per-row heuristics (L8) and the
corpus LM score (X21): train a linear classifier on SEED sets (docs
known high-quality vs known junk) and score the whole corpus with it.
This is the fastText-classifier stage every major pretraining pipeline
runs (GPT-3's WebText-vs-CommonCrawl filter, LLaMA's
Wikipedia-reference classifier) rendered on Spark's built-in ML
primitives:

- features: ``HashingTF`` over the SAME tokenization as training
  surfaces elsewhere (lower + ``\\s+`` split) — hashed bag-of-words,
  no vocabulary state to ship;
- model: ``pyspark.ml.classification.LogisticRegression`` (JVM-side
  L-BFGS; the one deliberate MLlib dependency in this repo — unlike
  the k-means/PQ paths, per-coefficient exactness is NOT load-bearing
  here, a monotone score is, so MLlib's battle-tested optimizer beats
  re-deriving one);
- scoring: broadcast model, map-only transform over the corpus.

Determinism note (why this op is unit-pinned, never oracle-checked):
L-BFGS aggregates gradients with ``treeAggregate`` — double sums whose
grouping varies with partition layout — so coefficients are stable
only to ~1e-12. Scores are therefore rounded to 6 decimals and the
pins assert SEPARATION (planted junk scores below planted quality,
AUC = 1 on a separable fixture) and rank stability, not bit equality.

100 TB shape: seeds are small (thousands of rows) so training is a
driver-adjacent job; corpus scoring is one map-only pass with the
coefficient vector broadcast (numFeatures * 8 bytes ≈ 256 KB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: 2^15 hashed features — collisions average out in a linear model and
#: the coefficient vector stays broadcast-sized
NUM_FEATURES = 1 << 15


def _tokenized(docs: DataFrame, text_col: str) -> DataFrame:
    return docs.withColumn(
        "_words",
        F.filter(
            F.split(F.lower(F.col(text_col)), r"\s+"),
            lambda w: F.length(w) > 0,
        ),
    )


def quality_classifier_train(
    pos: DataFrame,
    neg: DataFrame,
    text_col: str = "text",
    max_iter: int = 30,
    reg_param: float = 0.01,
):
    """Fit the seed classifier; returns a fitted PipelineModel.

    ``pos``/``neg`` are the seed frames (any schema with ``text_col``).
    Label 1.0 = quality. Elastic-net pure-L2 keeps every hashed feature
    (junk vocabularies are long-tailed; L1 would zero rare-but-decisive
    tokens).
    """
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF

    seeds = _tokenized(
        pos.select(F.col(text_col)).withColumn("label", F.lit(1.0)).unionByName(
            neg.select(F.col(text_col)).withColumn("label", F.lit(0.0))
        ),
        text_col,
    )
    pipe = Pipeline(
        stages=[
            HashingTF(
                inputCol="_words", outputCol="_features",
                numFeatures=NUM_FEATURES,
            ),
            LogisticRegression(
                featuresCol="_features",
                labelCol="label",
                maxIter=max_iter,
                regParam=reg_param,
                elasticNetParam=0.0,
            ),
        ]
    )
    return pipe.fit(seeds)


def quality_classifier_score(
    docs: DataFrame,
    model,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_threshold: float = 0.5,
) -> DataFrame:
    """(id, quality_prob, clf_keep): corpus scored map-only with the
    broadcast model; probability rounded to 6 (see module docstring)."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(_tokenized(docs, text_col))
    prob = F.round(
        F.element_at(vector_to_array(F.col("probability")), 2), 6
    )
    return scored.select(
        F.col(id_col),
        prob.alias("quality_prob"),
        (prob >= keep_threshold).alias("clf_keep"),
    )
