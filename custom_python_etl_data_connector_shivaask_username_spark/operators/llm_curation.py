"""Training-data curation: stratified sampling, token budgets, mixing.

The three selection ops every LLM-pipeline run performs between "corpus
on disk" and "tokens in the dataloader":

- **deterministic stratified sampling** — per-stratum (language) keep
  rates applied via a multiplicative integer hash of the document id
  (Knuth 2654435761), NOT ``rand()``: the same doc is kept on every
  run, every cluster size, every retry. The modular form
  ``(id % 100003) * 2654435761 % 100`` stays inside BIGINT so Spark and
  DuckDB (and any ANSI engine) compute bit-identical buckets.
- **token-budget selection** — within each stratum, rank sampled docs
  by a priority (token count desc here; a model-based quality score in
  production) and keep rows while the running token total fits the
  stratum's budget. A windowed cumulative sum — one shuffle keyed on
  the stratum.
- **mixture weights** — the realized per-stratum share of the selected
  token mass, the number a dataloader needs to interleave strata.

Scale notes (100 TB): the only corpus-wide exchange is the per-stratum
window partition. Languages are few and skewed, so the window partition
key is the classic skew case — at real scale the cumsum-over-sort
becomes per-stratum range partitioning (``repartitionByRange(lang,
priority)`` + ``sortWithinPartitions`` + a partition-prefix-sum pass),
which keeps each stratum parallel instead of single-tasked; the
semantics pinned by the oracle here are unchanged. The final per-lang
summary is a 5-row aggregate — broadcast territory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table

#: per-language keep rates (percent) — the mixing policy under test
SAMPLE_RATE_PCT = {"en": 60, "zh": 40, "de": 30, "fr": 30, "es": 20}
DEFAULT_RATE_PCT = 25
#: per-language token budget for the selection stage
TOKEN_BUDGET = 1500

_CURATION_MIX_ORACLE = f"""
WITH scored AS (
  SELECT lang, doc_id,
         length(string_split(text, ' ')) AS tokens,
         (doc_id % 100003) * 2654435761 % 100 AS bucket,
         CASE lang WHEN 'en' THEN 60 WHEN 'zh' THEN 40 WHEN 'de' THEN 30
                   WHEN 'fr' THEN 30 WHEN 'es' THEN 20
                   ELSE {DEFAULT_RATE_PCT} END AS rate
  FROM documents
),
sampled AS (
  SELECT lang, doc_id, tokens,
         SUM(tokens) OVER (
           PARTITION BY lang ORDER BY tokens DESC, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
  FROM scored WHERE bucket < rate
),
sel AS (
  SELECT lang, COUNT(*) AS n_selected, SUM(tokens) AS tokens_selected
  FROM sampled WHERE cum_tokens <= {TOKEN_BUDGET} GROUP BY lang
),
base AS (
  SELECT lang, COUNT(*) AS n_docs,
         COUNT(*) FILTER (WHERE bucket < rate) AS n_sampled
  FROM scored GROUP BY lang
)
SELECT b.lang, b.n_docs, b.n_sampled,
       COALESCE(s.n_selected, 0) AS n_selected,
       COALESCE(s.tokens_selected, 0) AS tokens_selected,
       ROUND(CAST(COALESCE(s.tokens_selected, 0) AS DOUBLE)
             / SUM(COALESCE(s.tokens_selected, 0)) OVER (), 6) AS mix_weight
FROM base b LEFT JOIN sel s ON b.lang = s.lang
ORDER BY b.lang
"""


def sample_bucket(id_col: F.Column) -> F.Column:
    """Deterministic 0-99 bucket from a BIGINT id (no rand(), no UDF)."""
    return (id_col % 100003) * F.lit(2654435761) % 100


@query("q_curation_mix", oracle=_CURATION_MIX_ORACLE)
def q_curation_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sample → per-language token budget → mixture report.

    One per-lang summary row: corpus size, sampled size, docs/tokens
    that fit the budget, and the realized mixture weight of the
    selected token mass.
    """
    docs = load_table(spark, sf_dir, "documents")
    rate = F.lit(DEFAULT_RATE_PCT)
    for lang, pct in SAMPLE_RATE_PCT.items():
        rate = F.when(F.col("lang") == lang, pct).otherwise(rate)
    scored = docs.select(
        "lang",
        "doc_id",
        F.size(F.split("text", " ")).alias("tokens"),
        (sample_bucket(F.col("doc_id")) < rate).alias("keep"),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy(F.col("tokens").desc(), F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sampled = scored.filter("keep").withColumn(
        "cum_tokens", F.sum("tokens").over(w)
    )
    sel = (
        sampled.filter(F.col("cum_tokens") <= TOKEN_BUDGET)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_selected"),
            F.sum("tokens").alias("tokens_selected"),
        )
    )
    base = scored.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_if("keep").alias("n_sampled"),
    )
    joined = base.join(sel, "lang", "left").select(
        "lang",
        "n_docs",
        "n_sampled",
        F.coalesce("n_selected", F.lit(0)).alias("n_selected"),
        F.coalesce("tokens_selected", F.lit(0)).alias("tokens_selected"),
    )
    # total selected-token mass via broadcast scalar, not an
    # unpartitioned window (WindowExec would single-task it)
    total = joined.agg(
        F.sum("tokens_selected").alias("_total_tokens")
    )
    return (
        joined.crossJoin(F.broadcast(total))
        .withColumn(
            "mix_weight",
            F.round(F.col("tokens_selected") / F.col("_total_tokens"), 6),
        )
        .drop("_total_tokens")
        .orderBy("lang")
    )
