"""Unit pins for curation ops (sampling determinism, budget cutoff,
mixing weights) and benchmark-contamination containment."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from custom_python_etl_data_connector_shivaask_username_spark.operators.llm_curation import (
    TOKEN_BUDGET,
    sample_bucket,
)


def test_sample_bucket_deterministic_and_uniform(spark):
    """Same id → same bucket on every evaluation; buckets spread over
    0-99 (multiplicative hash, not modulo banding)."""
    df = spark.range(0, 2000).select(
        F.col("id"), sample_bucket(F.col("id")).alias("b")
    )
    a = {r["id"]: r["b"] for r in df.collect()}
    b = {r["id"]: r["b"] for r in df.collect()}
    assert a == b  # rerun-stable
    buckets = set(a.values())
    assert buckets <= set(range(100))
    assert len(buckets) == 100  # all cells hit at n=2000
    # no gross skew: every bucket within 3x of uniform expectation
    from collections import Counter

    counts = Counter(a.values())
    assert max(counts.values()) < 3 * (2000 / 100)


def test_budget_cutoff_exact(spark):
    """Cumulative-sum selection keeps exactly the prefix that fits."""
    rows = [
        Row(lang="en", doc_id=i, tokens=t)
        for i, t in enumerate([900, 800, 700, 100])
    ]
    df = spark.createDataFrame(rows)
    from pyspark.sql import Window

    w = (
        Window.partitionBy("lang")
        .orderBy(F.col("tokens").desc(), F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    kept = (
        df.withColumn("cum", F.sum("tokens").over(w))
        .filter(F.col("cum") <= TOKEN_BUDGET)
        .select("doc_id")
        .collect()
    )
    # 900 then 900+800=1700 > 1500 → only the first doc fits
    assert sorted(r["doc_id"] for r in kept) == [0]


def test_curation_mix_weights_sum_to_one(spark, sf_dir):
    from custom_python_etl_data_connector_shivaask_username_spark.registry import (
        QUERIES,
        load_all,
    )

    load_all()
    out = QUERIES["q_curation_mix"](spark, sf_dir).collect()
    assert len(out) == 5  # one row per language
    # integer ppm (hash-stable); rounding error ≤ 0.5 ppm per row
    assert abs(sum(r["mix_weight_ppm"] for r in out) - 1_000_000) <= 3
    for r in out:
        assert 0 <= r["n_selected"] <= r["n_sampled"] <= r["n_docs"]
        assert r["tokens_selected"] <= TOKEN_BUDGET


def test_token_budget_select_matches_window_form_on_skewed_fixture(spark):
    """The skew-safe partition prefix-sum selects EXACTLY the rows the
    per-stratum window cumsum would, on a fixture where 90% of rows sit
    in one language (the case the window form single-tasks)."""
    from pyspark.sql import Window

    from custom_python_etl_data_connector_shivaask_username_spark.operators.llm_curation import (
        token_budget_select,
    )

    rows = [
        Row(lang="en" if i % 10 else "de", doc_id=i,
            tokens=(i * 2654435761) % 97 + 3)
        for i in range(400)
    ]
    df = spark.createDataFrame(rows)
    budget = 2000

    w = (
        Window.partitionBy("lang")
        .orderBy(F.col("tokens").desc(), F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    expected = {
        r["doc_id"]
        for r in df.withColumn("cum", F.sum("tokens").over(w))
        .filter(F.col("cum") <= budget)
        .collect()
    }
    got = {
        r["doc_id"]
        for r in token_budget_select(df, budget, num_partitions=7).collect()
    }
    assert got == expected
    assert len(got) > 0


def test_token_budget_select_exact_cutoff_across_partitions(spark):
    """One stratum spanning several range partitions keeps exactly the
    prefix that fits: cell cumsums + exclusive offsets reconstruct the
    global running total across partition boundaries."""
    from custom_python_etl_data_connector_shivaask_username_spark.operators.llm_curation import (
        token_budget_select,
    )

    df = spark.createDataFrame(
        [Row(lang="en", doc_id=i, tokens=10) for i in range(100)]
    )
    # budget fits exactly 25 docs; a per-partition reset would keep
    # 25 docs per partition instead
    got = token_budget_select(df, 250, num_partitions=4).count()
    assert got == 25


def test_token_budget_select_matches_window_form_beyond_sampler(spark):
    """250k-row skewed frame, far beyond the range partitioner's
    ~100-rows-per-partition boundary sample: both readers of the range
    exchange must see ONE set of sampled boundaries, or cell offsets
    apply to the wrong rows (round 3 measured ~11% pid drift when the
    exchange was evaluated twice across jobs). Exact set equality with
    the per-stratum window cumsum is the pin."""
    from pyspark.sql import Window

    from custom_python_etl_data_connector_shivaask_username_spark.operators.llm_curation import (
        token_budget_select,
    )

    n = 250_000
    df = spark.range(n).select(
        F.when(F.col("id") % 10 == 0, F.lit("de"))
        .otherwise(F.lit("en"))
        .alias("lang"),
        F.col("id").alias("doc_id"),
        ((F.col("id") * 2654435761) % 997 + 3).alias("tokens"),
    )
    budget = 40_000_000  # ~40% of the en stratum's token mass

    w = (
        Window.partitionBy("lang")
        .orderBy(F.col("tokens").desc(), F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    expected = {
        r["doc_id"]
        for r in df.withColumn("cum", F.sum("tokens").over(w))
        .filter(F.col("cum") <= budget)
        .collect()
    }
    got = {
        r["doc_id"]
        for r in token_budget_select(df, budget, num_partitions=32).collect()
    }
    assert len(expected) > 50_000  # the cutoff is deep in the corpus
    assert got == expected


def test_token_budget_select_null_stratum_kept(spark):
    """NULL-lang rows form their own budgeted stratum (null-safe offset
    join) instead of being dropped or crashing the offset sort."""
    from custom_python_etl_data_connector_shivaask_username_spark.operators.llm_curation import (
        token_budget_select,
    )

    rows = [Row(lang=None, doc_id=i, tokens=100) for i in range(10)]
    rows += [Row(lang="en", doc_id=100 + i, tokens=100) for i in range(10)]
    df = spark.createDataFrame(rows, "lang STRING, doc_id LONG, tokens LONG")
    got = token_budget_select(df, 300, num_partitions=3).collect()
    by_lang = {}
    for r in got:
        by_lang.setdefault(r["lang"], set()).add(r["doc_id"])
    # 3 docs of 100 tokens fit per stratum; ties break by doc_id asc
    assert by_lang == {None: {0, 1, 2}, "en": {100, 101, 102}}


def test_curation_mix_plan_skew_safe_windows(spark, sf_dir):
    """Corpus-side windows must never partition on the skewed lang key
    alone — every window spec naming lang must also involve the _pid
    cell key (the per-cell cumsum, or the per-stratum offset sum over
    the metadata-scale cell frame ordered by _pid). And the two readers
    of the range partitioning must share ONE materialized shuffle —
    exchange reuse, not a cache, is what makes _pid consistent."""
    import re

    from custom_python_etl_data_connector_shivaask_username_spark.plans.inspect import (
        formatted_plan,
    )
    from custom_python_etl_data_connector_shivaask_username_spark.registry import (
        QUERIES,
        load_all,
    )

    load_all()
    df = QUERIES["q_curation_mix"](spark, sf_dir)
    plan = formatted_plan(df)
    for spec in re.findall(r"windowspecdefinition\([^)]*\)", plan):
        if "lang" in spec:
            assert "_pid" in spec, spec
    assert "InMemoryTableScan" not in plan, (
        "token_budget_select must not persist the corpus (round-4 cache "
        "footprint); pid consistency comes from exchange reuse"
    )


def test_token_budget_select_reuses_one_range_exchange(spark):
    """The cell window and the offset aggregate read canonically-equal
    range-exchange subtrees; Spark must materialize that shuffle ONCE
    (adaptive shuffle-stage reuse / ReuseExchange) — the single boundary
    sample is what keeps _pid identical for both readers. Also pins that
    nothing survives in the cache manager after execution."""
    from custom_python_etl_data_connector_shivaask_username_spark.operators.llm_curation import (
        token_budget_select,
    )

    df = spark.range(20_000).select(
        F.when(F.col("id") % 7 == 0, F.lit("de")).otherwise(F.lit("en")).alias("lang"),
        F.col("id").alias("doc_id"),
        ((F.col("id") * 2654435761) % 97 + 3).alias("tokens"),
    )
    sel = token_budget_select(df, 200_000, num_partitions=8)
    sel.collect()
    final_plan = sel._jdf.queryExecution().executedPlan().toString()
    final_section = final_plan.split("== Initial Plan ==")[0]
    assert "ReusedExchange" in final_section, (
        "second range-exchange reader must reuse the first's shuffle "
        "stage, or its independently-sampled boundaries misalign _pid"
    )
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty(), (
        "token_budget_select must leave nothing cached"
    )


def test_contamination_flags_planted_copy(spark):
    """A training doc that embeds a benchmark doc verbatim shows
    containment ≈ 1; an unrelated doc never pairs with it."""
    bench_text = "what is the capital of france the capital is paris"
    rows = [
        Row(doc_id=0, text=bench_text),  # benchmark (id < 10)
        Row(doc_id=50, text="intro text " + bench_text + " outro text"),
        Row(doc_id=60, text="entirely unrelated prose about spark shuffles"),
    ]
    docs = spark.createDataFrame(rows)

    from custom_python_etl_data_connector_shivaask_username_spark.operators.llm_dedup import (
        char_ngrams,
        jaccard,
    )

    g = docs.select("doc_id", char_ngrams(F.col("text"), 3).alias("grams"))
    b = g.filter(F.col("doc_id") == 0).select(
        F.col("grams").alias("bg"), F.size("grams").alias("bn")
    )
    out = {
        r["doc_id"]: r["containment"]
        for r in g.filter(F.col("doc_id") > 0)
        .crossJoin(b)
        .select(
            "doc_id",
            (
                F.size(F.array_intersect("grams", "bg")) / F.col("bn")
            ).alias("containment"),
        )
        .collect()
    }
    assert out[50] == 1.0  # verbatim inclusion → full containment
    assert out[60] < 0.3


def test_curate_corpus_end_to_end(spark):
    """Composition pin: every stage's planted defect is removed and the
    survivors carry token counts under the budget."""
    from custom_python_etl_data_connector_shivaask_username_spark.operators.llm_curation import (
        curate_corpus,
    )

    base = (
        "the quick brown fox jumps over the lazy dog while the cat "
        "watches from a warm windowsill in the late afternoon sun"
    )
    bench_text = "what is the capital of france the capital is paris"
    rows = [
        Row(doc_id=0, lang="en", text=base),
        Row(doc_id=1, lang="en", text=base),  # exact dup -> dropped
        Row(doc_id=2, lang="en", text=base.replace("lazy", "sleepy")),  # near dup -> dropped
        Row(doc_id=3, lang="en", text="!!! ??? !!! ??? !!!"),  # low quality -> dropped
        Row(doc_id=4, lang="en", text="intro words " + bench_text + " outro words"),  # contaminated -> dropped
        Row(doc_id=5, lang="de", text="der schnelle braune fuchs springt ueber den "
            "faulen hund waehrend die katze aus dem warmen fenster zusieht"),
    ]
    docs = spark.createDataFrame(rows)
    bench = spark.createDataFrame([Row(doc_id=900, text=bench_text)])

    out = curate_corpus(
        docs,
        bench_docs=bench,
        near_dup_threshold=0.5,
        contamination_threshold=0.5,
        rates_pct={"en": 100, "de": 100},
        token_budget=10_000,
    )
    kept = {r["doc_id"] for r in out.collect()}
    assert 0 in kept  # survivor of the dup cluster
    assert 1 not in kept and 2 not in kept  # exact + near dup gone
    assert 3 not in kept  # low quality gone
    assert 4 not in kept  # contaminated gone
    assert 5 in kept  # clean other-language doc kept
    assert all(r["tokens"] > 0 for r in out.collect())


def test_word_ngram_contamination_selective(spark):
    """The production (word 8-gram, hashed) path: a verbatim inclusion
    is flagged with containment 1.0; a doc sharing only common words
    produces NO pair at all (selectivity, not post-filtering)."""
    from custom_python_etl_data_connector_shivaask_username_spark.operators.llm_curation import (
        contamination_pairs,
    )

    bench_text = (
        "what is the capital of france the answer to this question "
        "is that the capital of france is paris"
    )
    rows = [
        Row(doc_id=50, text="intro text " + bench_text + " outro text"),
        Row(doc_id=60, text="the answer is that the question about what "
            "is shared here uses only common words in new orders"),
    ]
    train = spark.createDataFrame(rows)
    bench = spark.createDataFrame([Row(doc_id=0, text=bench_text)])

    got = contamination_pairs(train, bench, n=8, threshold=0.3).collect()
    assert {(r["train_id"], r["bench_id"]) for r in got} == {(50, 0)}
    assert got[0]["containment"] == 1.0


def test_contamination_bloom_prefilter_exact_equivalence(spark, sf_dir):
    """X28-contract pin for the round-8 contamination prefilter: the
    Bloom-pruned path returns the IDENTICAL pair set and containment
    values as the unpruned join (no false negatives by construction —
    same seeded hash family on both sides), on real fixture text."""
    from custom_python_etl_data_connector_shivaask_username_spark.operators.llm_curation import (
        contamination_pairs,
    )
    from custom_python_etl_data_connector_shivaask_username_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(120)
    # benchmark = 5 fixture docs verbatim -> guaranteed planted overlap
    bench = docs.limit(5)
    key = lambda rows: sorted(
        (r["train_id"], r["bench_id"], r["containment"]) for r in rows
    )
    with_bloom = contamination_pairs(
        docs, bench, n=8, threshold=0.3, bloom_prefilter=True
    ).collect()
    without = contamination_pairs(
        docs, bench, n=8, threshold=0.3, bloom_prefilter=False
    ).collect()
    assert key(with_bloom) == key(without)
    assert len(without) >= 5  # the planted verbatim copies were flagged


def test_contamination_bloom_prefilter_prunes_gram_stream(spark, sf_dir):
    """The pruning must BITE: on fixture docs vs a small benchmark, the
    corpus gram rows surviving the Bloom filter are a small fraction of
    the full explosion (the join-input reduction the prefilter buys)."""
    from custom_python_etl_data_connector_shivaask_username_spark.functions.bloom import (
        bloom_prune,
        build_bloom,
    )
    from custom_python_etl_data_connector_shivaask_username_spark.operators.llm_curation import (
        _gram_hashes,
    )
    from custom_python_etl_data_connector_shivaask_username_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(200)
    bench = docs.limit(3)
    tg = _gram_hashes(docs, "doc_id", "text", 8, "train_id")
    bg = _gram_hashes(bench, "doc_id", "text", 8, "bench_id")
    full = tg.count()
    kept = bloom_prune(tg, build_bloom(bg, ["gh"])).count()
    # 3 benchmark docs' grams ≈ 1.5% of 200 docs' grams + FP noise
    assert kept < 0.25 * full, (kept, full)


def test_contamination_skips_docs_shorter_than_n(spark):
    """A benchmark doc with fewer than n words emits NO grams (it would
    otherwise get bn=1 and a single accidental short-gram match flags
    containment 1.0); same for train docs, which can't contain an
    n-gram anyway."""
    from custom_python_etl_data_connector_shivaask_username_spark.operators.llm_curation import (
        contamination_pairs,
    )

    train = spark.createDataFrame(
        [
            Row(doc_id=1, text="paris is nice"),  # 3 words < n
            Row(doc_id=2, text="some long document that mentions paris "
                "is nice in passing many more words follow here"),
        ]
    )
    bench = spark.createDataFrame([Row(doc_id=0, text="paris is nice")])
    assert contamination_pairs(train, bench, n=8, threshold=0.0).count() == 0


def test_curate_corpus_contamination_uses_word_grams(spark):
    """Stage 4 of curate_corpus is the selective word-8-gram path: a doc
    sharing only scattered common words with the benchmark survives,
    while a verbatim inclusion is dropped (same fixture semantics as the
    end-to-end test, but targeting selectivity)."""
    from custom_python_etl_data_connector_shivaask_username_spark.operators.llm_curation import (
        curate_corpus,
    )

    bench_text = (
        "what is the capital of france the answer to this question "
        "is that the capital of france is paris"
    )
    rows = [
        Row(doc_id=0, lang="en", text="intro words " + bench_text + " outro words"),
        Row(doc_id=1, lang="en", text="the answer is that the question about "
            "what is shared here uses only common words in new orders"),
    ]
    docs = spark.createDataFrame(rows)
    bench = spark.createDataFrame([Row(doc_id=900, text=bench_text)])
    out = curate_corpus(
        docs,
        bench_docs=bench,
        near_dup_threshold=0.3,
        contamination_threshold=0.3,
        rates_pct={"en": 100},
        token_budget=10_000,
    )
    kept = {r["doc_id"] for r in out.collect()}
    assert 0 not in kept  # verbatim inclusion dropped
    assert 1 in kept  # common-words-only doc survives (char-3 would flag it)


def test_pack_sequences_matches_window_form(spark):
    """The two-level prefix-sum packing equals the single-window form
    exactly on a multi-partition frame — same bins, same offsets."""
    from pyspark.sql import Window

    from custom_python_etl_data_connector_shivaask_username_spark.operators.llm_curation import (
        pack_sequences,
    )

    n, L = 5_000, 128
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        ((F.col("id") * 2654435761) % 90 + 10).alias("tokens"),
    )
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    expected = {
        r["doc_id"]: (r["start_bin"], r["end_bin"], r["start_offset"])
        for r in df.withColumn("_end", F.sum("tokens").over(w))
        .withColumn("_start", F.col("_end") - F.col("tokens"))
        .selectExpr(
            "doc_id",
            f"_start div {L} AS start_bin",
            f"(_end - 1) div {L} AS end_bin",
            f"_start % {L} AS start_offset",
        )
        .collect()
    }
    got = {
        r["doc_id"]: (r["start_bin"], r["end_bin"], r["start_offset"])
        for r in pack_sequences(df, seq_len=L, num_partitions=16).collect()
    }
    assert got == expected


def test_pack_sequences_bin_mass_and_straddle(spark):
    """Structural packing invariants: every bin except the last carries
    exactly seq_len tokens (no padding waste — the point of concat-and-
    chunk packing), offsets are in [0, seq_len), docs straddle iff their
    span crosses a boundary."""
    from custom_python_etl_data_connector_shivaask_username_spark.operators.llm_curation import (
        pack_sequences,
    )

    L = 100
    rows = [Row(doc_id=i, tokens=t) for i, t in enumerate([60, 60, 30, 100, 45, 5])]
    # cum ends:  60, 120, 150, 250, 295, 300
    out = {
        r["doc_id"]: (r["start_bin"], r["end_bin"], r["start_offset"])
        for r in pack_sequences(
            spark.createDataFrame(rows), seq_len=L, num_partitions=3
        ).collect()
    }
    assert out == {
        0: (0, 0, 0),    # [0, 60)
        1: (0, 1, 60),   # [60, 120) straddles bins 0-1
        2: (1, 1, 20),   # [120, 150)
        3: (1, 2, 50),   # [150, 250) straddles bins 1-2
        4: (2, 2, 50),   # [250, 295)
        5: (2, 2, 95),   # [295, 300) exactly fills bin 2
    }


def test_pack_sequences_per_stream_and_zero_tokens(spark):
    """Streams pack independently from offset 0; zero-token docs are
    dropped (they occupy no bin)."""
    from custom_python_etl_data_connector_shivaask_username_spark.operators.llm_curation import (
        pack_sequences,
    )

    rows = [
        Row(stream="a", doc_id=0, tokens=80),
        Row(stream="a", doc_id=1, tokens=40),
        Row(stream="b", doc_id=2, tokens=30),
        Row(stream="b", doc_id=3, tokens=0),
        Row(stream="b", doc_id=4, tokens=90),
    ]
    out = {
        r["doc_id"]: (r["stream"], r["start_bin"], r["end_bin"], r["start_offset"])
        for r in pack_sequences(
            spark.createDataFrame(rows),
            seq_len=100,
            stream_col="stream",
            num_partitions=2,
        ).collect()
    }
    assert out == {
        0: ("a", 0, 0, 0),
        1: ("a", 0, 1, 80),   # straddles within stream a
        2: ("b", 0, 0, 0),    # stream b restarts at offset 0
        4: ("b", 0, 1, 30),
    }
    assert 3 not in out


def test_prefix_sum_persist_fallback_when_reuse_disabled(spark):
    """Exotic deployment guard: with BOTH exchange-reuse mechanisms off
    nothing guarantees one materialization of the range shuffle, so the
    operator must fall back to persist — and stay correct."""
    from pyspark.sql import Window

    from custom_python_etl_data_connector_shivaask_username_spark.operators.llm_curation import (
        token_budget_select,
    )

    prev_reuse = spark.conf.get("spark.sql.exchange.reuse", "true")
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    try:
        spark.conf.set("spark.sql.exchange.reuse", "false")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        df = spark.range(30_000).select(
            F.when(F.col("id") % 5 == 0, F.lit("de")).otherwise(F.lit("en")).alias("lang"),
            F.col("id").alias("doc_id"),
            ((F.col("id") * 2654435761) % 97 + 3).alias("tokens"),
        )
        budget = 100_000
        w = (
            Window.partitionBy("lang")
            .orderBy(F.col("tokens").desc(), F.col("doc_id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        expected = {
            r["doc_id"]
            for r in df.withColumn("c", F.sum("tokens").over(w))
            .filter(F.col("c") <= budget)
            .collect()
        }
        got = {
            r["doc_id"]
            for r in token_budget_select(df, budget, num_partitions=8).collect()
        }
        assert got == expected and len(got) > 100
        # the fallback tracks what it pinned; the release hook drains it
        # (the round-5 leak: repeated selections accumulated cache
        # entries with no unpersist path short of clearCache)
        from custom_python_etl_data_connector_shivaask_username_spark.operators.llm_curation import (
            release_prefix_sum_fallback_cache,
        )

        assert release_prefix_sum_fallback_cache() >= 1
        assert release_prefix_sum_fallback_cache() == 0  # idempotent drain
    finally:
        spark.conf.set("spark.sql.exchange.reuse", prev_reuse)
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
        spark.catalog.clearCache()


def test_curate_corpus_with_packing_stage(spark):
    """Stage 7: the curated selection packs into per-language training
    bins — every survivor gets bin coordinates, streams never mix, and
    each language's first doc starts at (bin 0, offset 0)."""
    from custom_python_etl_data_connector_shivaask_username_spark.operators.llm_curation import (
        curate_corpus,
    )

    rows = [
        Row(doc_id=i, lang="en",
            text=" ".join(f"w{i}x{j}" for j in range(30)))
        for i in range(6)
    ] + [
        Row(doc_id=100 + i, lang="de",
            text=" ".join(f"d{i}y{j}" for j in range(20)))
        for i in range(3)
    ]
    out = curate_corpus(
        spark.createDataFrame(rows),
        rates_pct={"en": 100, "de": 100},
        min_quality=0.0,
        token_budget=10_000,
        pack_seq_len=25,
    ).collect()
    assert out and {"start_bin", "end_bin", "start_offset"} <= set(out[0].asDict())
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    assert set(by_lang) == {"en", "de"}
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: r["doc_id"])
        assert (rs[0]["start_bin"], rs[0]["start_offset"]) == (0, 0)
        # positions chain: next start = prev start + prev tokens
        pos = 0
        for r in rs:
            assert r["start_bin"] * 25 + r["start_offset"] == pos
            pos += r["tokens"]


def test_curate_corpus_lm_and_classifier_gates(spark):
    """Round-6 optional stages, one planted defect each: a token-soup
    doc that PASSES the length/punct heuristics but fails the
    corpus-LM gate (its bigrams never repeat), and a planted spam doc
    the caller-trained classifier drops; clean docs survive both."""
    import random

    from custom_python_etl_data_connector_shivaask_username_spark.operators.llm_classifier import (
        quality_classifier_train,
    )
    from custom_python_etl_data_connector_shivaask_username_spark.operators.llm_curation import (
        curate_corpus,
    )

    rng = random.Random(5)
    phrases = [
        "the quick brown fox jumps over the lazy dog every day",
        "a cat watches from the warm windowsill in the sun",
        "practice makes perfect when you repeat it again and again",
    ]
    clean = [
        Row(
            doc_id=i,
            lang="en",
            text=" ".join(rng.choice(phrases) for _ in range(10)),
        )
        for i in range(12)
    ]
    # long, letter-only, word-shaped -> heuristics pass; bigrams unique
    soup_words = [
        "".join(rng.choice("bcdfghjklmnpqrstvw") for _ in range(10))
        for _ in range(60)
    ]
    # measured scores on this corpus: clean -1.05..-0.97, spam -1.56,
    # soup -3.47 — the -2.5 gate sits between spam and soup, so the LM
    # drop is attributable to soup alone
    soup = Row(doc_id=50, lang="en", text=" ".join(soup_words))
    spam_text = "buy cheap pills now best discount offer " * 12
    spam = Row(doc_id=60, lang="en", text=spam_text.strip())

    docs = spark.createDataFrame(clean + [soup, spam])
    # negative seeds SHARE the spam vocabulary (buy/cheap/pills/
    # discount/offer) so the verdict rides on learned token weights,
    # not the fitted intercept's sign (review finding)
    neg_texts = [
        "buy cheap pills online now " * (8 + i) for i in range(3)
    ] + ["best discount offer buy now cheap " * (8 + i) for i in range(3)]
    clf = quality_classifier_train(
        spark.createDataFrame([Row(text=r["text"]) for r in clean[:6]]),
        spark.createDataFrame([Row(text=t.strip()) for t in neg_texts]),
    )
    common = dict(
        near_dup_threshold=0.99,  # clean docs share phrases; not the target
        rates_pct={"en": 100},
        token_budget=1_000_000,
    )
    # control: with BOTH gates off, every other stage keeps the planted
    # docs — so the drops below are attributable to the gates alone
    control = {r["doc_id"] for r in curate_corpus(docs, **common).collect()}
    assert 50 in control and 60 in control

    out = curate_corpus(
        docs, **common, lm_keep_threshold=-2.5, clf_model=clf
    )
    kept = {r["doc_id"] for r in out.collect()}
    assert 50 not in kept  # token soup: heuristics passed, LM gate dropped
    assert 60 not in kept  # spam: classifier gate dropped
    assert kept & set(range(12))  # clean mass survives both gates
    # per-gate attribution: each gate alone drops exactly its target
    lm_only = {
        r["doc_id"]
        for r in curate_corpus(docs, **common, lm_keep_threshold=-2.5).collect()
    }
    assert 50 not in lm_only and 60 in lm_only
    clf_only = {
        r["doc_id"]
        for r in curate_corpus(docs, **common, clf_model=clf).collect()
    }
    # (soup doc 50's clf score is intercept-dominated — unseen vocab —
    # so only the targeted drop is asserted for the clf-only branch)
    assert 60 not in clf_only and clf_only & set(range(12))


def test_export_packed_shards_contract(spark, tmp_path):
    """X27 dataloader handoff: shards hold contiguous near-equal bin
    ranges, every non-straddler lands exactly once, boundary
    straddlers are duplicated into each shard they touch (so each
    shard reconstructs its bins alone), rows are (start_bin,
    start_offset)-sorted within a shard, and the manifest totals
    agree with the data. Rerun-deterministic."""
    from custom_python_etl_data_connector_shivaask_username_spark.operators.llm_curation import (
        export_packed_shards,
        pack_sequences,
    )

    seq_len = 100
    # 40 docs with varied token counts -> ~14 bins across 4 shards
    docs = spark.createDataFrame(
        [Row(doc_id=i, tokens=20 + (i * 37) % 60) for i in range(40)]
    )
    packed = pack_sequences(docs, seq_len=seq_len)
    path = str(tmp_path / "shards")
    manifest = export_packed_shards(
        packed, path, n_shards=4, seq_len=seq_len
    )

    out = spark.read.parquet(path)
    rows = out.collect()
    pk = {r["doc_id"]: r for r in packed.collect()}
    n_bins = manifest["n_bins"]

    def shard_of(b):
        return b * 4 // n_bins

    # exact multiplicity: one copy per shard the doc's span touches
    from collections import Counter

    copies = Counter(r["doc_id"] for r in rows)
    for d, p in pk.items():
        expected = shard_of(p["end_bin"]) - shard_of(p["start_bin"]) + 1
        assert copies[d] == expected, (d, copies[d], expected)
    assert any(v > 1 for v in copies.values())  # fixture does straddle

    # shard ranges are contiguous and partition the bin space
    shards = manifest["shards"]
    assert [s["shard"] for s in shards] == [0, 1, 2, 3]
    for s in shards:
        for r in (r for r in rows if r["shard"] == s["shard"]):
            assert shard_of(r["start_bin"]) <= s["shard"] <= shard_of(
                r["end_bin"]
            )

    # self-containment: within each shard, reconstruct every bin fully
    # owned by the shard and check it holds exactly seq_len tokens
    for s in shards:
        owned = [
            b for b in range(n_bins - 1) if shard_of(b) == s["shard"]
        ]  # (last global bin may be ragged; excluded)
        fill = dict.fromkeys(owned, 0)
        for r in (r for r in rows if r["shard"] == s["shard"]):
            start = r["start_bin"] * seq_len + r["start_offset"]
            end = start + r["tokens"]
            for b in fill:
                lo, hi = b * seq_len, (b + 1) * seq_len
                fill[b] += max(0, min(end, hi) - max(start, lo))
        assert all(v == seq_len for v in fill.values()), fill

    # manifest totals agree with the written data
    assert sum(s["rows"] for s in shards) == len(rows)

    # corpus-level DISTINCT totals: straddler copies counted once
    # (per-shard sums over-count by exactly the extra copies)
    per_doc_tokens = {r["doc_id"]: r["tokens"] for r in rows}
    assert manifest["corpus_rows"] == len(per_doc_tokens)
    assert manifest["corpus_tokens"] == sum(per_doc_tokens.values())
    assert sum(s["rows"] for s in shards) > manifest["corpus_rows"]

    # rerun determinism: same manifest, same row multiset
    manifest2 = export_packed_shards(
        packed, path + "_b", n_shards=4, seq_len=seq_len
    )
    assert manifest2 == manifest
    rows2 = spark.read.parquet(path + "_b").collect()
    key = lambda r: (r["shard"], r["doc_id"], r["start_bin"])
    assert sorted(map(key, rows2)) == sorted(map(key, rows))


def test_export_packed_shards_validates_and_clamps(spark, tmp_path):
    """seq_len is validated against the packing (a wrong claim raises
    instead of poisoning the manifest a loader slices by), and more
    shards than bins clamps to one shard per bin - no shard-id gaps."""
    import json
    import pytest

    from custom_python_etl_data_connector_shivaask_username_spark.operators.llm_curation import (
        export_packed_shards,
        pack_sequences,
    )

    docs = spark.createDataFrame(
        [Row(doc_id=i, tokens=30) for i in range(10)]
    )
    packed = pack_sequences(docs, seq_len=100)  # 3 bins
    with pytest.raises(ValueError, match="seq_len"):
        export_packed_shards(packed, str(tmp_path / "x"), 2, seq_len=2048)
    m = export_packed_shards(packed, str(tmp_path / "y"), 8, seq_len=100)
    assert m["n_shards"] == m["n_bins"] == 3  # clamped, no gaps
    assert [s["shard"] for s in m["shards"]] == [0, 1, 2]
    on_disk = json.load(open(str(tmp_path / "y" / "_manifest.json")))
    assert on_disk == m


def test_no_unpartitioned_windows_in_curation_plans(spark, sf_dir):
    """Round-12 verdict advisory #3: the two documented metadata-scale
    global windows (the prefix-sum offset pass and the mixing summary)
    now partition on a vetted constant key, so NO windowspecdefinition
    in either plan is partition-less — the benign `WindowExec: No
    Partition Defined` warnings are gone and that warning class is
    always-fatal signal for real unpartitioned corpus windows. The
    frame caps ride in-plan as assert_true (raise_error in the
    optimized plan)."""
    import re

    from custom_python_etl_data_connector_shivaask_username_spark.plans.inspect import (
        formatted_plan,
    )
    from custom_python_etl_data_connector_shivaask_username_spark.registry import (
        QUERIES,
        load_all,
    )

    load_all()
    for qname in ("q_curation_mix", "q_pack_sequences"):
        plan = formatted_plan(QUERIES[qname](spark, sf_dir))
        specs = re.findall(r"windowspecdefinition\([^)]*\)", plan)
        assert specs, qname
        for spec in specs:
            assert not spec.startswith(
                "windowspecdefinition(specifiedwindowframe"
            ), f"{qname}: unpartitioned window survived: {spec}"
        assert "raise_error" in plan, f"{qname}: frame cap missing"


def test_mix_summary_cap_trips_loudly(spark, sf_dir, monkeypatch):
    """The cap beside the mixing-summary global window is live: shrink
    it below the fixture's language count and the query must DIE with
    the documented message instead of silently single-tasking."""
    import pytest
    import custom_python_etl_data_connector_shivaask_username_spark.operators.llm_curation as C
    from custom_python_etl_data_connector_shivaask_username_spark.registry import (
        QUERIES,
        load_all,
    )

    load_all()
    from custom_python_etl_data_connector_shivaask_username_spark import tables

    monkeypatch.setattr(C, "_MAX_MIX_STRATA", 2)
    # the cap is baked into the CONSTRUCTED plan and q_curation_mix is
    # plan-memoized (round 15): drop the memo so construction re-runs
    # under the patched cap — and again afterwards so later tests don't
    # inherit the cap-2 plan
    tables.invalidate_table_cache(sf_dir)
    try:
        df = QUERIES["q_curation_mix"](spark, sf_dir)
        with pytest.raises(Exception, match="per-stratum summary exceeds"):
            df.collect()
    finally:
        tables.invalidate_table_cache(sf_dir)
