"""Text-analysis queries over ``documents`` (SURVEY.md §2.11 L6-L9).

Term frequencies / TF-IDF shuffle once on the term; everything per-doc
(token counts, quality, scrubbing, chunking) is a pure map — the 100 TB
cost model is 'one scan + one word-keyed shuffle for the corpus stats'.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import (
    TOKEN_RE,
    chunk_text,
    detect_language,
    doc_fingerprint,
    mean_word_length,
    punct_ratio,
    quality_score,
    scrub_pii,
    token_count,
    whitespace_tokens,
)
from ..registry import query
from ..tables import load_table

# --- term frequencies ---------------------------------------------------------

_TERM_FREQ_ORACLE = """
SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
FROM (SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents)
WHERE length(word) > 0
GROUP BY word
ORDER BY freq DESC, word
LIMIT 20
"""


@query("q_term_frequencies", oracle=_TERM_FREQ_ORACLE)
def q_term_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            F.explode(F.split(F.lower("text"), " ")).alias("word")
        )
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("word"))
        .limit(20)
    )


# --- TF-IDF -----------------------------------------------------------------------

_TFIDF_ORACLE = """
WITH n AS (SELECT COUNT(*) AS total FROM documents),
tokens AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
  FROM documents
),
tf AS (
  SELECT word,
         CAST(COUNT(*) AS BIGINT) AS total_tf,
         COUNT(DISTINCT doc_id) AS df
  FROM tokens WHERE length(word) > 0 GROUP BY word
)
SELECT word, total_tf, df,
       ROUND(total_tf * LN(CAST((SELECT total FROM n) AS DOUBLE) / df), 6)
         AS tfidf
FROM tf
ORDER BY tfidf DESC, word
LIMIT 20
"""


@query("q_tfidf_top_terms", oracle=_TFIDF_ORACLE)
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L6: corpus TF-IDF — the doc count rides along as a broadcast
    scalar (crossJoin of a 1-row aggregate), so the plan is one
    word-keyed shuffle regardless of corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    total = docs.agg(F.count(F.lit(1)).alias("total"))
    tf = (
        docs.select(
            "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("word")
        )
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(
            F.count(F.lit(1)).alias("total_tf"),
            F.countDistinct("doc_id").alias("df"),
        )
    )
    return (
        tf.crossJoin(F.broadcast(total))
        .select(
            "word",
            "total_tf",
            "df",
            F.round(
                F.col("total_tf")
                * F.log(F.col("total").cast("double") / F.col("df")),
                6,
            ).alias("tfidf"),
        )
        .orderBy(F.col("tfidf").desc(), F.col("word"))
        .limit(20)
    )


# --- token counting ------------------------------------------------------------------

_TOKEN_COUNTS_ORACLE = f"""
SELECT doc_id,
       length(list_filter(string_split_regex(text, '\\s+'),
                          w -> length(w) > 0)) AS ws_tokens,
       length(regexp_extract_all(text, '{TOKEN_RE}')) AS bpe_tokens,
       n_chars
FROM documents
ORDER BY doc_id
"""


@query("q_token_counts", oracle=_TOKEN_COUNTS_ORACLE)
def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(whitespace_tokens(F.col("text"))).alias("ws_tokens"),
        token_count(F.col("text")).alias("bpe_tokens"),
        "n_chars",
    )


# --- quality scoring ---------------------------------------------------------------------

_QUALITY_ORACLE = """
SELECT doc_id,
       length(text) AS text_len,
       ROUND((length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))
             / greatest(length(text), 1)::DOUBLE, 6) AS punct_ratio,
       ROUND(list_aggregate(list_transform(
               list_filter(string_split_regex(text, '\\s+'), w -> length(w) > 0),
               w -> length(w)), 'sum')
             / greatest(length(list_filter(string_split_regex(text, '\\s+'),
               w -> length(w) > 0)), 1)::DOUBLE, 6) AS mean_word_len,
       (length(text) >= 80 AND n_chars = length(text)) AS meta_consistent
FROM documents
ORDER BY doc_id
"""


@query("q_doc_quality", oracle=_QUALITY_ORACLE)
def q_doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L8: per-doc quality metrics (length, punctuation ratio, mean word
    length, metadata consistency)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.length("text").alias("text_len"),
        F.round(punct_ratio(F.col("text")), 6).alias("punct_ratio"),
        F.round(mean_word_length(F.col("text")), 6).alias("mean_word_len"),
        (
            (F.length("text") >= 80)
            & (F.col("n_chars") == F.length("text"))
        ).alias("meta_consistent"),
    )


@query("q_quality_filter")  # rows-only: composite heuristic
def q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("quality", quality_score(F.col("text")))
        .filter(F.col("quality") >= 0.5)
        .select("doc_id", "lang", "quality")
    )


# --- language-ID (heuristic; accuracy pinned in unit tests) ---------------------------------


@query("q_lang_id")  # rows-only: heuristic classifier
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        "lang",
        detect_language(F.col("text")).alias("detected_lang"),
    )


# --- fingerprints ------------------------------------------------------------------------------


@query("q_doc_fingerprints")  # rows-only: sketch table
def q_doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", doc_fingerprint(F.col("text")).alias("fingerprint")
    )


# --- PII scrubbing ------------------------------------------------------------------------------

_PII_ORACLE = """
WITH seeded AS (
  SELECT doc_id,
         'contact ' || lang || '.user@' || source || '.example.com or +1 '
           || CAST(1000000 + doc_id AS VARCHAR) || '999 re: ' || substring(text, 1, 30)
           AS payload
  FROM documents
)
SELECT doc_id,
       regexp_replace(regexp_replace(payload,
         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
         '\\+?\\d[\\d().\\s-]{7,}\\d', '[PHONE]', 'g') AS scrubbed
FROM seeded
ORDER BY doc_id
"""


@query("q_pii_scrub", oracle=_PII_ORACLE)
def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L9: regex redaction chain, oracle-checked on synthesized PII (the
    fixture corpus itself contains none)."""
    docs = load_table(spark, sf_dir, "documents")
    payload = F.concat(
        F.lit("contact "),
        F.col("lang"),
        F.lit(".user@"),
        F.col("source"),
        F.lit(".example.com or +1 "),
        (F.lit(1000000) + F.col("doc_id")).cast("string"),
        F.lit("999 re: "),
        F.substring("text", 1, 30),
    )
    return docs.select(
        "doc_id", scrub_pii(payload).alias("scrubbed")
    )


# --- chunking -----------------------------------------------------------------------------------

CHUNK_SIZE = 20
STRIDE = 15

_CHUNK_ORACLE = f"""
WITH w AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\\s+'), x -> length(x) > 0)
           AS words
  FROM documents
),
c AS (
  SELECT doc_id,
         list_transform(
           range(0, CAST(floor((length(words) - 1) / {STRIDE}) AS BIGINT) + 1),
           i -> array_to_string(
                  words[(CAST(i AS INT) * {STRIDE} + 1)
                        :(CAST(i AS INT) * {STRIDE} + {CHUNK_SIZE})], ' '))
           AS chunks
  FROM w
)
SELECT doc_id,
       generate_subscripts(chunks, 1) - 1 AS chunk_id,
       unnest(chunks) AS chunk_text
FROM c
ORDER BY doc_id, chunk_id
"""


@query("q_chunk_documents", oracle=_CHUNK_ORACLE)
def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L7: overlapping word-window chunks, one row per chunk — pure array
    HOFs + posexplode, no UDTF needed (the UDTF variant exists for the
    §2.10 F5 surface; see streaming/udtf tests)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            F.posexplode(
                chunk_text(F.col("text"), CHUNK_SIZE, STRIDE)
            ).alias("chunk_id", "chunk_text"),
        )
    )
