"""Pins for functions/bloom.py and its probe_minhash_index wiring.

The load-bearing property is NO FALSE NEGATIVES: a pruned join must
return exactly the pairs the unpruned join returns. False positives
are a measured cost, not a correctness question.
"""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from custom_python_etl_data_connector_shivaask_username_spark.functions.bloom import (
    BLOOM_HASHES,
    bloom_prune,
    build_bloom,
    might_contain_keys,
)


def test_bloom_no_false_negatives_and_low_fp(spark):
    build = spark.range(0, 500).select(
        (F.col("id") * 7).alias("a"), (F.col("id") % 13).alias("b")
    )
    bf = build_bloom(build, ["a", "b"])
    assert bf.n_keys == 500
    assert bf.m >= 500 * 16 and bf.k == BLOOM_HASHES

    # every build key tests positive
    verdicts = might_contain_keys(bf, build).collect()
    assert all(r["might_contain"] for r in verdicts)

    # disjoint keys: FP rate well under a few percent at 16 bits/key
    probe = spark.range(10_000, 30_000).select(
        (F.col("id") * 7).alias("a"), (F.col("id") % 13 + 100).alias("b")
    )
    fp = sum(
        1
        for r in might_contain_keys(bf, probe).collect()
        if r["might_contain"]
    )
    total = probe.distinct().count()
    assert fp / total < 0.02, (fp, total)


def test_bloom_build_is_deterministic(spark):
    build = spark.range(0, 300).select(
        F.col("id").alias("a"), (F.col("id") % 5).alias("b")
    )
    bf1 = build_bloom(build, ["a", "b"])
    bf2 = build_bloom(build.repartition(7), ["a", "b"])
    assert bf1 == bf2  # same words/layout under any partitioning


def test_bloom_prune_keeps_matching_rows_exactly(spark):
    """Pruning a probe side by a build side's filter retains EVERY row
    whose key exists on the build side (the no-false-negative contract
    stated at the dataframe level)."""
    build = spark.createDataFrame(
        [Row(k=i) for i in range(0, 100, 2)]  # even keys
    )
    probe = spark.createDataFrame(
        [Row(k=i, v=f"row{i}") for i in range(100)]
    )
    bf = build_bloom(build, ["k"])
    kept = {r["k"] for r in bloom_prune(probe, bf).collect()}
    assert set(range(0, 100, 2)) <= kept  # all true matches survive


def test_probe_minhash_index_bloom_equivalence_and_pruning(spark):
    """probe_minhash_index with the Bloom prefilter returns the exact
    pair set of the unfiltered probe, while the index rows surviving
    the filter are a small fraction of the full index."""
    from custom_python_etl_data_connector_shivaask_username_spark.operators.llm_dedup import (
        build_minhash_index,
        probe_minhash_index,
    )

    # corpus: many distinct docs -> many distinct index buckets
    corpus = spark.createDataFrame(
        [
            Row(
                doc_id=i,
                text=(
                    f"corpus document number {i} with its own unique "
                    f"phrasing about topic {i % 37} and detail {i * 3}"
                ),
            )
            for i in range(200)
        ]
    )
    increment = spark.createDataFrame(
        [
            Row(
                doc_id=1000,
                text=(
                    "corpus document number 17 with its own unique "
                    "phrasing about topic 17 and detail 51"
                ),
            ),
            Row(doc_id=1001, text="fresh unrelated content never seen"),
        ]
    )
    index = build_minhash_index(corpus)

    with_bloom = {
        (r["inc_id"], r["cor_id"], r["jaccard_sim"])
        for r in probe_minhash_index(
            index, corpus, increment, threshold=0.5
        ).collect()
    }
    without = {
        (r["inc_id"], r["cor_id"], r["jaccard_sim"])
        for r in probe_minhash_index(
            index, corpus, increment, threshold=0.5, bloom_prefilter=False
        ).collect()
    }
    assert with_bloom == without
    assert (1000, 17) in {(a, b) for a, b, _ in with_bloom}

    # pruning actually bites: surviving index rows << full index
    from custom_python_etl_data_connector_shivaask_username_spark.operators.llm_dedup import (
        band_triples,
    )
    from custom_python_etl_data_connector_shivaask_username_spark.functions.bloom import (
        bloom_prune as _prune,
        build_bloom as _build,
    )

    inc_triples = band_triples(increment).select("band_id", "bucket")
    bf = _build(inc_triples, ["band_id", "bucket"])
    full = index.count()
    survived = _prune(index, bf).count()
    assert survived < full * 0.25, (survived, full)
