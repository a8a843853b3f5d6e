"""Unit pins for text analysis: language-ID on real-language samples,
quality ordering, PII scrubbing, fingerprints, chunk reconstruction."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from custom_python_etl_data_connector_shivaask_username_spark.functions.text import (
    chunk_text,
    detect_language,
    doc_fingerprint,
    quality_score,
    scrub_pii,
    token_count,
)

SAMPLES = {
    "en": "the cat sat on the mat and it was happy that you came to see it",
    "es": "el perro corre por la calle y no se detiene porque un gato lo mira",
    "de": "der hund läuft durch die stadt und die katze sitzt mit den vögeln",
    "fr": "le chien court dans la rue et il ne veut pas être vu je crois",
    "zh": "我在北京的一个小区里住了很多年他是我的朋友",
}


def _df(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )


def test_language_id_on_real_samples(spark):
    df = _df(spark, list(SAMPLES.values())).withColumn(
        "detected", detect_language(F.col("text"))
    )
    detected = [r["detected"] for r in df.orderBy("doc_id").collect()]
    assert detected == list(SAMPLES.keys())


def test_quality_score_orders_garbage_below_prose(spark):
    texts = [
        "a well formed sentence with reasonable words flowing together "
        "nicely over enough characters to look like genuine prose today",
        "!!! ??? *** @@@ ### $$$ %%% ^^^ &&& ((( ))) ;;; ::: ,,, ...",
        "xx",
    ]
    df = _df(spark, texts).withColumn("q", quality_score(F.col("text")))
    q = {r["doc_id"]: r["q"] for r in df.collect()}
    assert q[0] > q[1] > q[2] or (q[0] > q[1] and q[0] > q[2])


def test_scrub_pii(spark):
    df = _df(
        spark,
        ["reach me at jane.doe+spam@corp.example.com or +1 (415) 555-0132 ok"],
    ).select(scrub_pii(F.col("text")).alias("s"))
    s = df.collect()[0]["s"]
    assert "[EMAIL]" in s and "[PHONE]" in s
    assert "jane" not in s and "415" not in s


def test_token_count_counts_punctuation(spark):
    df = _df(spark, ["hello, world!"]).select(
        token_count(F.col("text")).alias("n")
    )
    assert df.collect()[0]["n"] == 4  # hello , world !


def test_fingerprint_stable_and_discriminative(spark):
    t1 = "some reasonably long text that will be fingerprinted for dedup"
    df = _df(spark, [t1, t1, "a completely different document body here"])
    fps = [
        r["fp"]
        for r in df.select(doc_fingerprint(F.col("text")).alias("fp"))
        .collect()
    ]
    assert fps[0] == fps[1]
    assert fps[0] != fps[2]


def test_chunk_text_covers_all_words(spark):
    words = [f"w{i}" for i in range(47)]
    df = _df(spark, [" ".join(words)]).select(
        chunk_text(F.col("text"), 20, 15).alias("chunks")
    )
    chunks = df.collect()[0]["chunks"]
    # starts at 0,15,30,45 → 4 chunks; every word appears somewhere
    assert len(chunks) == 4
    seen = set(" ".join(chunks).split())
    assert seen == set(words)
    assert len(chunks[0].split()) == 20
    assert len(chunks[-1].split()) == 2


def test_repetition_profile_planted_docs(spark):
    """Gopher-style repetition filters: planted repetitive docs score
    high on exactly the metric their pathology targets; clean prose
    scores ~0 on all of them. Hand-computed expectations."""
    from custom_python_etl_data_connector_shivaask_username_spark.operators.llm_text import (
        repetition_profile,
    )

    docs = spark.createDataFrame(
        [
            # clean: 6 distinct words, distinct lines
            (1, "alpha beta gamma\ndelta epsilon zeta"),
            # repeated line: line 'spam spam' twice out of 3 lines
            (2, "spam and ham\nbuy now today\nbuy now today"),
            # repeated phrase: 'the best offer' 3x -> dup 3-grams
            (3, "the best offer the best offer the best offer"),
            # modal word domination
            (4, "yes yes yes yes no"),
            (5, ""),
        ],
        "doc_id LONG, text STRING",
    )
    got = {
        r["doc_id"]: r.asDict() for r in repetition_profile(docs).collect()
    }
    clean = got[1]
    assert clean["dup_line_frac"] == 0.0
    assert clean["dup_line_char_frac"] == 0.0
    assert clean["dup_word_frac"] == 0.0
    assert clean["dup_3gram_frac"] == 0.0
    assert abs(clean["top_word_frac"] - 1 / 6) < 1e-6

    dup_lines = got[2]
    assert abs(dup_lines["dup_line_frac"] - 1 / 3) < 1e-6
    # 2 of 3 lines are the duplicated 13-char 'buy now today'
    assert abs(dup_lines["dup_line_char_frac"] - 26 / 38) < 1e-6

    phrase = got[3]
    # 9 words, 3 distinct -> dup_word 2/3; 7 3-grams, 3 distinct -> 4/7
    assert abs(phrase["dup_word_frac"] - 2 / 3) < 1e-6
    assert abs(phrase["dup_3gram_frac"] - 4 / 7) < 2e-6

    modal = got[4]
    assert abs(modal["top_word_frac"] - 4 / 5) < 1e-6
    # empty doc: every metric 0, no division blowup
    assert all(v == 0.0 for k, v in got[5].items() if k != "doc_id")


def test_repetition_profile_is_map_only(spark, sf_dir):
    from custom_python_etl_data_connector_shivaask_username_spark.operators.llm_text import (
        repetition_profile,
    )
    from custom_python_etl_data_connector_shivaask_username_spark.tables import (
        load_table,
    )

    df = repetition_profile(load_table(spark, sf_dir, "documents"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure map: zero shuffles at any scale
    assert df.count() > 0


def test_lm_quality_separates_token_soup(spark):
    """Planted separation: natural-ish English (repeating common
    phrases, so its bigrams are corpus-supported) must score far above
    a token-soup doc whose bigrams never repeat — and the -4.5 keep
    threshold must split them."""
    import random

    from custom_python_etl_data_connector_shivaask_username_spark.operators.llm_text import (
        LM_KEEP_THRESHOLD,
        lm_quality_scores,
    )

    rng = random.Random(7)
    phrases = [
        "the quick brown fox jumps over the lazy dog",
        "a stitch in time saves nine every single day",
        "practice makes perfect when you practice every day",
    ]
    natural = [
        (i, " ".join(rng.choice(phrases) for _ in range(12)))
        for i in range(40)
    ]
    # token soup: unique 12-char gibberish words, no bigram ever repeats
    soup_words = [
        "".join(rng.choice("bcdfghjklmnpqrstvwxz") for _ in range(12))
        for _ in range(400)
    ]
    soup = [(100 + i, " ".join(soup_words[i * 40 : (i + 1) * 40])) for i in range(10)]
    docs = spark.createDataFrame(natural + soup, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in lm_quality_scores(docs).collect()}
    nat_scores = [got[i]["avg_logprob"] for i, _ in natural]
    soup_scores = [got[i]["avg_logprob"] for i, _ in soup]
    assert min(nat_scores) > max(soup_scores) + 2.0  # wide margin
    assert all(got[i]["lm_keep"] for i, _ in natural)
    assert not any(got[i]["lm_keep"] for i, _ in soup)
    assert min(nat_scores) > LM_KEEP_THRESHOLD > max(soup_scores)


def test_lm_quality_plan_shape(spark, sf_dir):
    """No cartesian blowup: the only nested-loop is the broadcast 1-row
    vocabulary scalar; everything else joins/aggregates on gram, w1, or
    doc_id keys."""
    from custom_python_etl_data_connector_shivaask_username_spark.registry import (
        QUERIES,
    )

    df = QUERIES["q_lm_quality"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # the 1-row vocab scalar must ride a broadcast, not a shuffle
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_lm_quality_invariant_to_input_partitioning(spark):
    """Scores may not depend on task layout: counts are exact ints and
    the decimal-summed rounded log-probs are order-free, so any
    repartitioning yields bit-identical rows."""
    from custom_python_etl_data_connector_shivaask_username_spark.operators.llm_text import (
        lm_quality_scores,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta {i % 3} alpha beta") for i in range(30)],
        ["doc_id", "text"],
    )
    a = sorted(map(tuple, lm_quality_scores(docs).collect()))
    b = sorted(
        map(tuple, lm_quality_scores(docs.repartition(11)).collect())
    )
    assert a == b
