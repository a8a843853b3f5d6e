"""X23: BPE tokenizer training + encoding, rendered Spark-first.

The Sennrich et al. byte-pair-encoding trainer, structured the way the
reference trainers (subword-nmt, HuggingFace tokenizers) actually work
— but distributed:

1. ONE corpus-wide pass collapses documents to a WORD-FREQUENCY table
   (``word_freq_table``): vocab-sized, i.e. metadata-scale next to the
   corpus (Heaps' law), carrying an exact ``freq`` per word.
2. Training iterates on that compact table only: each round counts
   adjacent symbol pairs weighted by word frequency (one vocab-sized
   shuffle), pulls the single argmax pair to the driver (the same
   bounded driver contract as k-means centroids — one row per round),
   and applies the merge to the symbol arrays with a pure
   higher-order-function fold (no UDF). ``localCheckpoint`` every few
   rounds keeps the iterative lineage flat.
3. Encoding streams the corpus once through ``mapInPandas`` with the
   learned merge ranks broadcast into the closure — the classic
   train-small / apply-wide split; Arrow batches, no per-row Python.

Determinism: pair counts are exact integer sums; the argmax tie-breaks
lexicographically on (pair_a, pair_b); greedy left-to-right merge
application is order-defined. Re-running training on any cluster
layout yields the identical merge list (pinned).

100 TB shape: the corpus appears exactly twice — once to build word
frequencies, once to encode. Everything between is vocab-sized.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: marks end-of-word so merges never cross word boundaries and decoding
#: is unambiguous (subword-nmt's convention)
END = "</w>"


def word_freq_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq): the corpus collapsed to its vocabulary — the only
    corpus-wide aggregation in training."""
    return (
        docs.select(
            F.explode(
                F.filter(
                    F.split(F.lower(F.col(text_col)), r"\s+"),
                    lambda w: F.length(w) > 0,
                )
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _symbolize(word: Column) -> Column:
    """word -> [c1, c2, ..., cn, </w>]"""
    chars = F.filter(F.split(word, ""), lambda c: F.length(c) > 0)
    return F.concat(chars, F.array(F.lit(END)))


def _merge_pair(syms: Column, a: str, b: str) -> Column:
    """Greedy left-to-right merge of adjacent (a, b) -> a+b — the BPE
    apply step as a pure fold (no UDF): push each symbol, and when the
    accumulator ends in ``a`` and the next symbol is ``b``, replace
    that tail with the merged token."""
    merged = a + b
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (s == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def bpe_train(
    docs: DataFrame,
    n_merges: int = 50,
    min_freq: int = 2,
    text_col: str = "text",
) -> list[tuple[str, str, int]]:
    """Learn up to ``n_merges`` merges; returns [(a, b, freq), ...] in
    merge order. Stops early when the best pair drops below
    ``min_freq`` (merging noise pairs just memorizes typos)."""
    wf = word_freq_table(docs, text_col).select(
        "freq", _symbolize(F.col("word")).alias("syms")
    )
    wf = wf.localCheckpoint(eager=True)
    merges: list[tuple[str, str, int]] = []
    for step in range(n_merges):
        pairs = (
            wf.select(
                "freq",
                F.explode(
                    F.transform(
                        F.sequence(
                            F.lit(1),
                            F.greatest(F.size("syms") - 1, F.lit(1)),
                        ),
                        # try_: fully-merged words are 1 symbol long and
                        # the sequence still probes index 2 (ANSI
                        # element_at would throw); the null b rows drop
                        lambda i: F.struct(
                            F.try_element_at("syms", i).alias("a"),
                            F.try_element_at("syms", i + 1).alias("b"),
                        ),
                    )
                ).alias("p"),
            )
            .filter(F.col("p.b").isNotNull())
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("pair_freq"))
        )
        best = (
            pairs.orderBy(F.desc("pair_freq"), "a", "b").limit(1).collect()
        )
        if not best or best[0]["pair_freq"] < min_freq:
            break
        a, b, pf = best[0]["a"], best[0]["b"], int(best[0]["pair_freq"])
        merges.append((a, b, pf))
        wf = wf.select("freq", _merge_pair(F.col("syms"), a, b).alias("syms"))
        if (step + 1) % 5 == 0:
            wf = wf.localCheckpoint(eager=True)
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    syms = list(word) + [END]
    while len(syms) > 1:
        # lowest-rank (earliest-learned) applicable merge wins — the
        # canonical BPE encode order
        best_rank, best_i = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str, int]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_tokens, tokens_csv): corpus encoded with the learned
    merges — map-only Arrow batches, merge table broadcast in the
    closure (KBs). tokens_csv keeps the driver-facing schema scalar.

    Tokenization happens in SPARK expressions — the same
    ``lower``/``\\s+``-split/non-empty-filter as ``word_freq_table`` —
    before the rows reach Python, so encode-time words are identical
    to the trained vocabulary by construction (round-6 review finding:
    Python ``str.split()`` treats Unicode whitespace like NBSP as a
    separator and ``str.lower()`` differs on locale chars, where Java
    ``\\s`` and ``lower`` do not — tokenizing in two engines would
    silently diverge on such corpora)."""
    ranks = {(a, b): i for i, (a, b, _) in enumerate(merges)}
    words_col = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda w: F.length(w) > 0
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_n, out_tok = [], [], []
            for did, words in zip(pdf[id_col], pdf["_words"]):
                toks: list[str] = []
                for w in words:
                    toks.extend(_encode_word(str(w), ranks))
                out_ids.append(did)
                out_n.append(len(toks))
                out_tok.append(" ".join(toks))
            yield pd.DataFrame(
                {id_col: out_ids, "n_tokens": out_n, "tokens": out_tok}
            )

    return docs.select(
        F.col(id_col), words_col.alias("_words")
    ).mapInPandas(encode, f"{id_col} long, n_tokens long, tokens string")
