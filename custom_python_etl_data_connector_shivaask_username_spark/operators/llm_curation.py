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

Scale notes (100 TB): languages are few and skewed, so a
``Window.partitionBy(lang)`` cumsum is the classic skew case — the
``en`` partition is most of the corpus on one core. The selection here
is therefore implemented as ``token_budget_select``: per-stratum range
partitioning (``repartitionByRange(lang, priority)``) +
``sortWithinPartitions`` + a partition prefix-sum (pass 1 computes the
tiny per-(partition, stratum) token sums; pass 2 is a mapInPandas that
adds each partition's exclusive offset to a local cumsum), which keeps
each stratum parallel across partitions instead of single-tasked. The
semantics are identical to the window cumsum (pinned by a
result-equality test on a 90%-one-language fixture) and by the
``q_curation_mix`` oracle. The final per-lang summary is a 5-row
aggregate — broadcast territory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table

#: per-language keep rates (percent) — the mixing policy under test
SAMPLE_RATE_PCT = {"en": 60, "zh": 40, "de": 30, "fr": 30, "es": 20}
DEFAULT_RATE_PCT = 25
#: per-language token budget for the selection stage
TOKEN_BUDGET = 1500


def curate_corpus(
    docs: DataFrame,
    bench_docs: DataFrame | None = None,
    min_quality: float = 0.5,
    near_dup_threshold: float = 0.7,
    contamination_threshold: float = 0.5,
    rates_pct: dict[str, int] | None = None,
    token_budget: int = TOKEN_BUDGET,
) -> DataFrame:
    """The end-to-end curation pipeline, composed from this engine's
    operators in production order:

    1. quality filter (map-only heuristics, `functions.text.quality_score`);
    2. exact dedup (one content-hash shuffle, min-id survivor);
    3. transitive near-dedup (MinHash-LSH pairs → connected components);
    4. benchmark-contamination removal (broadcast n-gram containment vs
       ``bench_docs``, when given);
    5. deterministic stratified sampling per language;
    6. per-language token-budget selection (skew-safe prefix-sum).

    Returns the curated docs frame (original columns + ``tokens``).
    Every stage is individually oracle- or pin-tested; this function
    pins their composition. Stage order matters at scale: the map-only
    quality filter runs FIRST so every shuffle downstream moves only
    surviving rows, and contamination runs after dedup so the broadcast
    join sees each surviving text once.
    """
    from ..functions.text import quality_score, token_count
    from .llm_dedup import dedupe_near_cc

    rates = rates_pct or SAMPLE_RATE_PCT

    # 1. quality gate — map-only, prunes before any shuffle
    kept = docs.filter(quality_score(F.col("text")) >= min_quality)

    # 2. exact dedup — min doc_id survives per content hash
    h = kept.groupBy(F.md5("text").alias("_h")).agg(
        F.min("doc_id").alias("doc_id")
    )
    kept = kept.join(h.select("doc_id"), "doc_id", "left_semi")

    # 3. transitive near-dedup
    kept = dedupe_near_cc(kept, threshold=near_dup_threshold)

    # 4. contamination: drop docs containing too much of any benchmark
    # doc. Uses the production hashed word-8-gram path — char-3-grams
    # join ~100x more rows at the same corpus (SCALE.md measured joined
    # rows ≈ docs × benchmark for char-3; word 8-grams are selective).
    if bench_docs is not None:
        contaminated = (
            contamination_pairs(
                kept, bench_docs, threshold=contamination_threshold
            )
            .select(F.col("train_id").alias("doc_id"))
            .distinct()
        )
        kept = kept.join(contaminated, "doc_id", "left_anti")

    # 5. deterministic stratified sample
    rate = F.lit(DEFAULT_RATE_PCT)
    for lang, pct in rates.items():
        rate = F.when(F.col("lang") == lang, pct).otherwise(rate)
    kept = kept.filter(sample_bucket(F.col("doc_id")) < rate)

    # 6. token budget per language — skew-safe partition prefix-sum,
    # not a single-task-per-language window
    kept = kept.withColumn("tokens", token_count(F.col("text"))).drop("_h")
    return token_budget_select(kept, token_budget)

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
  -- CAST: DuckDB SUM(BIGINT) returns HUGEINT (int128), which the
  -- driver's canonicalizer hashes differently from Spark's BIGINT
  -- even when values are identical. Keep every emitted column int64.
  SELECT lang, COUNT(*) AS n_selected,
         CAST(SUM(tokens) AS BIGINT) AS tokens_selected
  FROM sampled WHERE cum_tokens <= {TOKEN_BUDGET} GROUP BY lang
),
base AS (
  SELECT lang, COUNT(*) AS n_docs,
         COUNT(*) FILTER (WHERE bucket < rate) AS n_sampled
  FROM scored GROUP BY lang
)
SELECT b.lang, b.n_docs, b.n_sampled,
       CAST(COALESCE(s.n_selected, 0) AS BIGINT) AS n_selected,
       CAST(COALESCE(s.tokens_selected, 0) AS BIGINT) AS tokens_selected,
       CAST(ROUND(COALESCE(s.tokens_selected, 0) * 1000000.0
             / SUM(COALESCE(s.tokens_selected, 0)) OVER ()) AS BIGINT)
         AS mix_weight_ppm
FROM base b LEFT JOIN sel s ON b.lang = s.lang
ORDER BY b.lang
"""


def sample_bucket(id_col: F.Column) -> F.Column:
    """Deterministic 0-99 bucket from a BIGINT id (no rand(), no UDF)."""
    return (id_col % 100003) * F.lit(2654435761) % 100


def token_budget_select(
    df: DataFrame,
    token_budget: int,
    strata_col: str = "lang",
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Skew-safe per-stratum token-budget selection.

    Keeps, per stratum, the prefix of rows (ordered by ``tokens_col``
    desc, ``id_col`` asc) whose running token total fits the budget —
    the same semantics as a ``Window.partitionBy(strata_col)``
    cumulative sum, WITHOUT single-tasking each stratum. Strata are few
    and skewed (at 100 TB the ``en`` partition is most of the corpus),
    so instead:

    1. ``repartitionByRange(strata, tokens desc, id)`` spreads each
       stratum over many partitions while keeping its global order
       across partition boundaries; ``sortWithinPartitions`` orders
       rows inside each.
    2. Pass 1 aggregates per-(partition, stratum) token sums — at most
       ``partitions x strata`` rows, collected to the driver to compute
       each partition's exclusive prefix offset (metadata-scale, like a
       k-means centroid matrix; never corpus-scale).
    3. Pass 2 is an Arrow-batched ``mapInPandas`` over the SAME sorted
       partitioning: local cumsum per stratum + the partition's offset,
       carrying running totals across Arrow batches, emitting rows
       while ``offset + cumsum <= token_budget``.

    The partitioned frame is ``localCheckpoint``-ed (eager) before
    pass 1: Spark's range partitioner samples with an RDD-id-derived
    seed, so WITHOUT materialization the two jobs can draw different
    boundaries (measured ~11% of rows switching partitions on a 400k
    replica) and pass-1 offsets would apply to the wrong rows. The
    checkpoint pins one physical partitioning for both passes and pays
    the shuffle once instead of twice.

    NULL strata are supported: partitioning/grouping uses an internal
    sentinel-coalesced ``_stratum`` key so null-lang rows get their own
    budget stratum instead of crashing the driver sort or being dropped
    by pandas' default ``dropna``.

    Note this operator is **eager** — calling it runs the shuffle +
    pass-1 jobs immediately (offsets are frozen at build time). The
    result carries ``df``'s columns unchanged.
    """
    import pandas as pd  # noqa: F401 — mapInPandas batches are pandas

    if num_partitions is None:
        conf = df.sparkSession.conf.get("spark.sql.shuffle.partitions")
        try:
            num_partitions = int(conf)
        except (TypeError, ValueError):  # e.g. "auto" under Databricks AQE
            num_partitions = df.sparkSession.sparkContext.defaultParallelism
    # NULL-safe stratum key: \x00 prefix cannot collide with real values
    # of the cast because we only ever group/partition on this column.
    NULL_SENTINEL = "\x00<null>"
    order = [
        F.col("_stratum").asc(),
        F.col(tokens_col).desc(),
        F.col(id_col).asc(),
    ]
    parted = (
        df.withColumn(
            "_stratum",
            F.coalesce(F.col(strata_col).cast("string"), F.lit(NULL_SENTINEL)),
        )
        .repartitionByRange(num_partitions, *order)
        .sortWithinPartitions(*order)
        .withColumn("_pid", F.spark_partition_id())
        # eager materialization: ONE physical partitioning shared by the
        # pass-1 aggregation and the pass-2 mapInPandas (range-partitioner
        # sampling is not stable across jobs), and the shuffle runs once.
        .localCheckpoint()
    )

    # pass 1: tiny per-(partition, stratum) sums -> exclusive offsets
    psums = parted.groupBy("_pid", "_stratum").agg(
        F.sum(tokens_col).alias("_psum")
    ).collect()
    offsets: dict[tuple[int, str], int] = {}
    running: dict[str, int] = {}
    for r in sorted(psums, key=lambda r: (r["_stratum"], r["_pid"])):
        key = r["_stratum"]
        offsets[(r["_pid"], key)] = running.get(key, 0)
        running[key] = running.get(key, 0) + r["_psum"]

    out_schema = df.schema

    def select_fit(batches):
        # one partition per call; Arrow may split it into several
        # batches — carry per-stratum running totals across them
        seen: dict[str, int] = {}
        for pdf in batches:
            if pdf.empty:
                continue
            pid = int(pdf["_pid"].iloc[0])
            keep_parts = []
            for stratum, g in pdf.groupby("_stratum", sort=False):
                base = offsets.get((pid, stratum), 0) + seen.get(stratum, 0)
                cum = g[tokens_col].cumsum() + base
                keep_parts.append(g[cum <= token_budget])
                seen[stratum] = seen.get(stratum, 0) + int(g[tokens_col].sum())
            yield pd.concat(keep_parts).drop(columns=["_pid", "_stratum"])

    return parted.mapInPandas(select_fit, out_schema)


def contamination_pairs(
    train: DataFrame,
    bench: DataFrame,
    n: int = 8,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Production contamination check: **word** n-gram containment.

    Long word n-grams (8-13, the published range for benchmark decon)
    are selective — common function words don't collide the way
    char-3-grams do, so the gram join emits only genuine overlaps
    (measured ~100x fewer joined rows than char-3 at the same corpus,
    SCALE.md). Grams are xxhash64'd before the join: the broadcast
    carries 8 bytes per benchmark gram, not the text. Returns
    (train_id, bench_id, containment) for pairs ≥ threshold.

    Docs with fewer than ``n`` words emit no grams at all: a 2-word
    benchmark doc would otherwise get bn=1 from a single short gram,
    and one accidental match would flag containment 1.0. Such docs
    can't be checked by n-gram containment and are skipped on both
    sides.
    """
    from ..functions.text import whitespace_tokens

    def gram_hashes(df: DataFrame, out_id: str) -> DataFrame:
        words = whitespace_tokens(F.lower(F.col(text_col)))
        grams = F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(words) - (n - 1)),
                lambda i: F.xxhash64(F.concat_ws(" ", F.slice(words, i, n))),
            )
        )
        return (
            df.filter(F.size(words) >= n)
            .select(F.col(id_col).alias(out_id), F.explode(grams).alias("gh"))
        )

    tg = gram_hashes(train, "train_id")
    bg = gram_hashes(bench, "bench_id")
    bsize = bg.groupBy("bench_id").agg(F.count(F.lit(1)).alias("bn"))
    return (
        tg.join(F.broadcast(bg), "gh")
        .groupBy("train_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("inter"))
        .join(F.broadcast(bsize), "bench_id")
        .filter(F.col("inter") / F.col("bn") >= threshold)
        .select(
            "train_id",
            "bench_id",
            F.round(F.col("inter") / F.col("bn"), 6).alias("containment"),
        )
    )


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
    # skew-safe selection: range-partitioned prefix-sum, not a
    # single-task-per-language Window cumsum (same pinned semantics)
    sel = (
        token_budget_select(scored.filter("keep"), TOKEN_BUDGET)
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
    # unpartitioned window (WindowExec would single-task it).
    # The mixture weight is emitted as integer parts-per-million so no
    # float ever enters the driver's hashed result (a rounded DOUBLE is
    # canonicalizer-fragile even when bit-identical to the oracle).
    total = joined.agg(
        F.sum("tokens_selected").alias("_total_tokens")
    )
    return (
        joined.crossJoin(F.broadcast(total))
        .withColumn(
            "mix_weight_ppm",
            F.round(
                F.col("tokens_selected") * F.lit(1000000.0)
                / F.col("_total_tokens")
            ).cast("bigint"),
        )
        .drop("_total_tokens")
        .orderBy("lang")
    )
