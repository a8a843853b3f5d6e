"""X25 seeded quality classifier pins: separation on a planted corpus,
generalization to unseen docs, rank stability across partitionings."""

from __future__ import annotations

import random

from custom_python_etl_data_connector_shivaask_username_spark.operators.llm_classifier import (
    quality_classifier_score,
    quality_classifier_train,
)


def _corpus(spark):
    """Separable planted corpus: fluent-ish English vs token soup,
    split into seed sets and UNSEEN eval docs of both kinds."""
    rng = random.Random(13)
    phrases = [
        "the committee approved the proposal after a long discussion",
        "researchers published their findings in a peer reviewed journal",
        "the library opens early on weekdays and closes at nine",
        "a balanced diet and regular exercise improve long term health",
    ]
    def fluent(i):
        return (i, " ".join(rng.choice(phrases) for _ in range(6)))
    def soup(i):
        return (
            i,
            " ".join(
                "".join(rng.choice("qwxzkvjpbg") for _ in range(9))
                for _ in range(24)
            ),
        )
    pos_seed = [fluent(i) for i in range(30)]
    neg_seed = [soup(100 + i) for i in range(30)]
    eval_docs = [fluent(200 + i) for i in range(10)] + [
        soup(300 + i) for i in range(10)
    ]
    mk = lambda rows: spark.createDataFrame(rows, ["doc_id", "text"])
    return mk(pos_seed), mk(neg_seed), mk(eval_docs)


def test_classifier_separates_unseen_docs(spark):
    pos, neg, ev = _corpus(spark)
    model = quality_classifier_train(pos, neg)
    got = {
        r["doc_id"]: r for r in quality_classifier_score(ev, model).collect()
    }
    fluent_scores = [got[200 + i]["quality_prob"] for i in range(10)]
    soup_scores = [got[300 + i]["quality_prob"] for i in range(10)]
    # AUC = 1 on the planted fixture: every unseen fluent doc outranks
    # every unseen soup doc, and the 0.5 keep flag splits them
    assert min(fluent_scores) > max(soup_scores)
    assert all(got[200 + i]["clf_keep"] for i in range(10))
    assert not any(got[300 + i]["clf_keep"] for i in range(10))


def test_classifier_ranking_stable_across_partitioning(spark):
    """Coefficients jitter at ~1e-12 across treeAggregate layouts
    (documented); the induced RANKING of scored docs must not."""
    pos, neg, ev = _corpus(spark)
    m1 = quality_classifier_train(pos, neg)
    m2 = quality_classifier_train(pos.repartition(7), neg.repartition(5))
    r1 = [
        r["doc_id"]
        for r in quality_classifier_score(ev, m1)
        .orderBy("quality_prob", "doc_id")
        .collect()
    ]
    r2 = [
        r["doc_id"]
        for r in quality_classifier_score(ev, m2)
        .orderBy("quality_prob", "doc_id")
        .collect()
    ]
    assert r1 == r2


def test_scoring_is_map_only(spark):
    pos, neg, ev = _corpus(spark)
    model = quality_classifier_train(pos, neg)
    scored = quality_classifier_score(ev, model)
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # broadcast model, zero shuffles
