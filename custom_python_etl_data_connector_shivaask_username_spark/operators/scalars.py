"""Scalar function surface (SURVEY.md §2.8) — one oracle query per family.

Cross-engine notes baked into the oracles:
- dayofweek: Spark is 1-7 Sunday=1, DuckDB 0-6 Sunday=0 → oracle adds 1.
- natural log: Spark ``F.log`` = DuckDB ``ln``.
- time deltas: exact integer microseconds (epoch_us/unix_micros), never
  unit-counting functions whose boundary semantics differ.
- transcendentals (log/exp) round to 6 — libm results at these magnitudes
  agree far beyond that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table

# --- strings -----------------------------------------------------------------

_STRING_ORACLE = r"""
SELECT
  doc_id,
  LENGTH(text) AS text_len,
  UPPER(lang) AS lang_upper,
  SUBSTRING(text, 1, 12) AS prefix12,
  CAST(REGEXP_EXTRACT(source, 'src(\d+)', 1) AS INT) AS src_num,
  LPAD(lang, 5, '_') AS lang_padded,
  LEVENSHTEIN(lang, 'en') AS lang_dist,
  (lang LIKE 'e%') AS starts_e,
  REGEXP_MATCHES(text, '^[a-z]') AS starts_lower,
  CONCAT_WS('|', lang, source) AS lang_source,
  TRIM(REGEXP_REPLACE(SUBSTRING(text, 1, 20), '[aeiou]', '*', 'g'))
    AS devoweled,
  LENGTH(STRING_SPLIT(text, ' ')) AS word_count
FROM documents
ORDER BY doc_id
"""


@query("q_string_functions", oracle=_STRING_ORACLE)
def q_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.length("text").alias("text_len"),
        F.upper("lang").alias("lang_upper"),
        F.substring("text", 1, 12).alias("prefix12"),
        F.regexp_extract("source", r"src(\d+)", 1)
        .cast("int")
        .alias("src_num"),
        F.lpad("lang", 5, "_").alias("lang_padded"),
        F.levenshtein("lang", F.lit("en")).alias("lang_dist"),
        F.col("lang").like("e%").alias("starts_e"),
        F.col("text").rlike("^[a-z]").alias("starts_lower"),
        F.concat_ws("|", "lang", "source").alias("lang_source"),
        F.trim(
            F.regexp_replace(F.substring("text", 1, 20), "[aeiou]", "*")
        ).alias("devoweled"),
        F.size(F.split("text", " ")).alias("word_count"),
    )


# --- date/time ------------------------------------------------------------------

_DATETIME_ORACLE = """
SELECT
  CAST(date_trunc('week', ts) AS TIMESTAMP) AS week_start,
  event_type,
  COUNT(*) AS event_count,
  CAST(MIN(year(ts)) AS INT) AS min_year,
  CAST(MAX(month(ts)) AS INT) AS max_month,
  CAST(MAX(dayofweek(ts)) + 1 AS INT) AS max_dow,
  MIN(date_trunc('hour', ts)) AS first_hour,
  MAX(ts + INTERVAL 3 DAY) AS max_ts_plus3d,
  MAX(epoch_us(ts)) AS max_epoch_us
FROM events
GROUP BY CAST(date_trunc('week', ts) AS TIMESTAMP), event_type
ORDER BY week_start, event_type
"""


@query("q_datetime_functions", oracle=_DATETIME_ORACLE)
def q_datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("week", "ts").alias("week_start"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.min(F.year("ts")).cast("int").alias("min_year"),
            F.max(F.month("ts")).cast("int").alias("max_month"),
            F.max(F.dayofweek("ts")).cast("int").alias("max_dow"),
            F.min(F.date_trunc("hour", "ts")).alias("first_hour"),
            F.max(F.expr("ts + INTERVAL 3 DAY")).alias("max_ts_plus3d"),
            F.max(F.unix_micros(F.col("ts").cast("timestamp"))).alias(
                "max_epoch_us"
            ),
        )
        .orderBy("week_start", "event_type")
    )


# --- math -------------------------------------------------------------------------

_MATH_ORACLE = """
SELECT
  p_partkey,
  ABS(p_retailprice - 1000.0) AS price_dev,
  CAST(CEIL(p_retailprice) AS BIGINT) AS price_ceil,
  CAST(FLOOR(p_retailprice) AS BIGINT) AS price_floor,
  ROUND(SQRT(p_retailprice), 6) AS price_sqrt,
  ROUND(LN(p_retailprice), 6) AS price_ln,
  ROUND(LOG10(p_retailprice), 6) AS price_log10,
  ROUND(POW(p_size, 2.0), 6) AS size_sq,
  CAST(SIGN(p_retailprice - 1000.0) AS DOUBLE) AS dev_sign,
  ROUND(EXP(p_size / 100.0), 6) AS size_exp
FROM part
ORDER BY p_partkey
"""


@query("q_math_functions", oracle=_MATH_ORACLE)
def q_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.abs(F.col("p_retailprice") - 1000.0).alias("price_dev"),
        F.ceil("p_retailprice").alias("price_ceil"),
        F.floor("p_retailprice").alias("price_floor"),
        F.round(F.sqrt("p_retailprice"), 6).alias("price_sqrt"),
        F.round(F.log("p_retailprice"), 6).alias("price_ln"),
        F.round(F.log10("p_retailprice"), 6).alias("price_log10"),
        F.round(F.pow("p_size", F.lit(2.0)), 6).alias("size_sq"),
        F.signum(F.col("p_retailprice") - 1000.0)
        .cast("double")
        .alias("dev_sign"),
        F.round(F.exp(F.col("p_size") / 100.0), 6).alias("size_exp"),
    )


# --- conditional ---------------------------------------------------------------------

_CONDITIONAL_ORACLE = """
SELECT
  c_custkey,
  CASE WHEN c_acctbal < 0 THEN 'debt'
       WHEN c_acctbal < 5000 THEN 'normal'
       ELSE 'premium' END AS balance_tier,
  GREATEST(c_acctbal, 0.0) AS nonneg_bal,
  LEAST(c_acctbal, 9999.0) AS capped_bal,
  COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS segment_or_other,
  (c_acctbal IS NOT NULL AND c_acctbal > 0) AS is_positive
FROM customer
ORDER BY c_custkey
"""


@query("q_conditional_functions", oracle=_CONDITIONAL_ORACLE)
def q_conditional_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    return cust.select(
        "c_custkey",
        F.when(bal < 0, "debt")
        .when(bal < 5000, "normal")
        .otherwise("premium")
        .alias("balance_tier"),
        F.greatest(bal, F.lit(0.0)).alias("nonneg_bal"),
        F.least(bal, F.lit(9999.0)).alias("capped_bal"),
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")
        ).alias("segment_or_other"),
        (bal.isNotNull() & (bal > 0)).alias("is_positive"),
    )


# --- arrays + higher-order functions ----------------------------------------------------

_ARRAY_ORACLE = """
SELECT
  vec_id,
  LENGTH(embedding) AS dim,
  ROUND(LIST_AGGREGATE(LIST_TRANSFORM(embedding,
        x -> CAST(x AS DOUBLE)), 'sum'), 6) AS vec_sum,
  ROUND(LIST_AGGREGATE(LIST_TRANSFORM(embedding,
        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'), 6) AS vec_sq_norm,
  LENGTH(LIST_FILTER(embedding, x -> x > 0)) AS positive_count,
  ROUND(CAST(LIST_MAX(embedding) AS DOUBLE), 6) AS vec_max,
  ROUND(CAST(LIST_MIN(embedding) AS DOUBLE), 6) AS vec_min
FROM embeddings
ORDER BY vec_id
"""


@query("q_array_functions", oracle=_ARRAY_ORACLE)
def q_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array HOFs are the no-UDF path for vector math (SURVEY §2.8): the
    fold stays in codegen, sequential per-row, so float summation order is
    identical everywhere."""
    emb = load_table(spark, sf_dir, "embeddings")
    as_double = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(
            F.aggregate(
                as_double, F.lit(0.0), lambda acc, x: acc + x
            ),
            6,
        ).alias("vec_sum"),
        F.round(
            F.aggregate(as_double, F.lit(0.0), lambda acc, x: acc + x * x),
            6,
        ).alias("vec_sq_norm"),
        F.size(F.filter(F.col("embedding"), lambda x: x > 0)).alias(
            "positive_count"
        ),
        F.round(F.array_max("embedding").cast("double"), 6).alias("vec_max"),
        F.round(F.array_min("embedding").cast("double"), 6).alias("vec_min"),
    )


# --- JSON + map access ---------------------------------------------------------------------

_JSON_ORACLE = """
SELECT
  event_type,
  COUNT(*) AS n,
  CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT)
    AS k_total,
  CAST(MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS k_max,
  CAST(COUNT(*) FILTER (WHERE json_extract_string(props, '$.k') IS NULL)
    AS BIGINT) AS k_missing
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@query("q_json_extraction", oracle=_JSON_ORACLE)
def q_json_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T8/§2.8 json+map: both the string-path accessor and the typed
    from_json(MapType) route — the Spark idioms for the reference's
    schema-on-read payloads (README.md:22-23)."""
    ev = load_table(spark, sf_dir, "events")
    k_str = F.get_json_object("props", "$.k")
    k_map = F.element_at(
        F.from_json("props", "map<string,int>"), F.lit("k")
    )
    return (
        ev.withColumn("k1", k_str.cast("int"))
        .withColumn("k2", k_map)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k1").cast("bigint").alias("k_total"),
            F.max("k2").cast("int").alias("k_max"),
            F.count_if(F.col("k1").isNull()).alias("k_missing"),
        )
        .orderBy("event_type")
    )


# --- hashing / ids ---------------------------------------------------------------------------

_HASH_ORACLE = """
SELECT
  doc_id,
  md5(text) AS text_md5,
  sha256(text) AS text_sha256
FROM documents
ORDER BY doc_id
"""


@query("q_hash_functions", oracle=_HASH_ORACLE)
def q_hash_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 hash family: content hashes are the dedup/upsert keys (S7/L1).
    xxhash64/monotonically_increasing_id are Spark-internal (used for
    bucketing, never in oracle outputs)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
    )
