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
