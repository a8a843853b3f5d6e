"""X23 BPE trainer/encoder pins: known merge order on the classic
corpus, determinism, encode round-trip, compression monotonicity."""

from __future__ import annotations

from custom_python_etl_data_connector_shivaask_username_spark.operators.llm_bpe import (
    END,
    bpe_encode,
    bpe_train,
    word_freq_table,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )


def test_word_freq_exact(spark):
    wf = {
        r["word"]: r["freq"]
        for r in word_freq_table(
            _docs(spark, ["low low lower", "low newest"])
        ).collect()
    }
    assert wf == {"low": 3, "lower": 1, "newest": 1}


def test_known_merge_sequence(spark):
    """Hand-computed merge order on the Sennrich-style toy corpus
    low x5, lower x2, newest x6 — including a 4-way tie at freq 6 in
    rounds 3-4 that the lexicographic (a, b) tie-break must resolve
    identically on every run/cluster layout:
      (w,e)=2+6=8 -> (l,o)=7 -> tie@6 won by ('e','we') -> by ('ewe','s')
    """
    docs = _docs(spark, ["low " * 5 + "lower " * 2 + "newest " * 6])
    merges = bpe_train(docs, n_merges=4, min_freq=2)
    assert merges == [
        ("w", "e", 8),
        ("l", "o", 7),
        ("e", "we", 6),
        ("ewe", "s", 6),
    ]


def test_training_is_deterministic(spark):
    docs = _docs(
        spark,
        [
            "the cat sat on the mat",
            "the bat and the cat",
            "a cat a mat a bat",
        ],
    )
    a = bpe_train(docs, n_merges=10, min_freq=1)
    b = bpe_train(docs, n_merges=10, min_freq=1)
    assert a == b
    assert len(a) == 10


def test_encode_round_trip_and_boundaries(spark):
    docs = _docs(spark, ["banana bandana", "ban ban banana"])
    merges = bpe_train(docs, n_merges=8, min_freq=1)
    enc = {
        r["doc_id"]: r for r in bpe_encode(docs, merges).collect()
    }
    for i, text in [(0, "banana bandana"), (1, "ban ban banana")]:
        toks = enc[i]["tokens"].split(" ")
        # concatenating tokens and stripping the end markers recovers
        # the original words — no merge ever crossed a word boundary
        rebuilt = "".join(toks).replace(END, " ").strip()
        assert rebuilt == text
        assert enc[i]["n_tokens"] == len(toks)


def test_more_merges_never_increase_token_count(spark):
    docs = _docs(
        spark,
        ["practice makes perfect " * 3, "perfect practice " * 4],
    )
    merges = bpe_train(docs, n_merges=12, min_freq=1)
    counts = []
    for k in (0, 4, 8, 12):
        enc = bpe_encode(docs, merges[:k])
        counts.append(
            sum(r["n_tokens"] for r in enc.collect())
        )
    assert counts == sorted(counts, reverse=True)
    assert counts[-1] < counts[0]  # merges actually compress


def test_training_invariant_to_input_partitioning(spark):
    """The merge list may not depend on how the corpus is split across
    tasks — exact integer counts + lexicographic tie-break make the
    argmax layout-free (the property that matters on 1000 executors)."""
    docs = _docs(
        spark, ["the cat sat on the mat", "a cat a mat", "the end"]
    )
    a = bpe_train(docs, n_merges=6, min_freq=1)
    b = bpe_train(docs.repartition(7), n_merges=6, min_freq=1)
    assert a == b
