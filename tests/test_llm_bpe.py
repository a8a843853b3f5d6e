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


def test_three_trainer_forms_equal(spark, sf_dir):
    """Round-12 ask #3 pin: the driver-side trainer (default), the
    distributed batched loop (driver_vocab_cap=0), and the distributed
    sequential loop (batch_cap=1) return IDENTICAL merge lists — on
    the fixture corpus and on an adversarial planted corpus where the
    merged token immediately forms the next-best pair (the
    created-pair interference the strict f_cap rule exists for:
    'ab ab' chains must fall back to sequential picks rather than
    mis-batch)."""
    from custom_python_etl_data_connector_shivaask_username_spark.operators.llm_bpe import (
        bpe_train,
    )
    from custom_python_etl_data_connector_shivaask_username_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(120)
    driver = bpe_train(docs, n_merges=40)
    seq = bpe_train(docs, n_merges=40, batch_cap=1, driver_vocab_cap=0)
    bat = bpe_train(docs, n_merges=40, batch_cap=64, driver_vocab_cap=0)
    assert driver == seq == bat

    planted = spark.createDataFrame(
        [
            (0, "abababab abababab abababab"),
            (1, "cdcdcdcd cdcdcdcd"),
            (2, "xy xy xy zq zq"),
        ],
        "doc_id long, text string",
    )
    d_p = bpe_train(planted, n_merges=12, min_freq=1)
    s_p = bpe_train(planted, n_merges=12, min_freq=1, batch_cap=1, driver_vocab_cap=0)
    b_p = bpe_train(planted, n_merges=12, min_freq=1, batch_cap=64, driver_vocab_cap=0)
    assert d_p == s_p == b_p


def test_1k_merge_vocab_single_round_trip(spark):
    """Driver round-trips fall >=10x at a 1k-merge vocab (verdict done
    criterion): the sequential loop pays one counting job per merge by
    construction; the driver path pays ONE collect total. The driver
    merges also match the distributed sequential form on the first 40
    (full equality at 1k would mean 1k sequential Spark jobs in a
    test)."""
    import random

    from custom_python_etl_data_connector_shivaask_username_spark.operators.llm_bpe import (
        bpe_train,
    )

    rng = random.Random(7)
    letters = "etaoinshrdlcumwfgypbvkjxqz"
    weights = [12.7, 9.1, 8.2, 7.5, 7.0, 6.7, 6.3, 6.1, 6.0, 4.3, 4.0,
               2.8, 2.4, 2.4, 2.0, 2.2, 2.0, 2.0, 1.9, 1.5, 1.0, 0.8,
               0.15, 0.15, 0.10, 0.07]
    vocab = [
        "".join(rng.choices(letters, weights=weights, k=rng.randint(3, 11)))
        for _ in range(4000)
    ]
    zipf_w = [1.0 / (r + 1) for r in range(len(vocab))]
    docs = spark.createDataFrame(
        [(i, " ".join(rng.choices(vocab, weights=zipf_w, k=120))) for i in range(200)],
        "doc_id long, text string",
    )
    merges = bpe_train(docs, n_merges=1000, min_freq=2)
    assert len(merges) == 1000, f"corpus too small: {len(merges)}"
    assert bpe_train.last_rounds == 1          # one collect, 1000 merges
    assert bpe_train.last_rounds * 10 <= len(merges)

    seq40 = bpe_train(docs, n_merges=40, batch_cap=1, driver_vocab_cap=0)
    assert merges[:40] == seq40
