"""Scalar function surface (SURVEY.md §2.8) — three registry queries
plus the string family folded into ``q_doc_profile``.

Family map:
- string + hash/id → :func:`string_feature_cols`, evidenced through
  ``q_doc_profile`` (same per-row map-only pass over ``documents``,
  same ``doc_id`` key — folded there in round 6 to hold the registry at
  the driver's 50-query check window while ``q_pack_sequences`` /
  ``q_cdc_upsert`` take the freed slots; hashes are the dedup/upsert
  keys of S7/L1).
- date/time + math + conditional → ``q_scalar_suite`` (one per-row pass
  over ``orders``: timestamp fields, price arithmetic, CASE logic).
- array + higher-order functions → ``q_array_functions``.
- json + map → ``q_json_map_functions`` (string-path extraction, typed
  ``from_json(MapType)``, ``create_map``/``map_keys``/``map_values``/
  ``map_entries``/``element_at``/``map_contains_key``; map-typed values
  are serialized to scalars before they reach the result schema).

Cross-engine notes baked into the oracles:
- dayofweek: Spark is 1-7 Sunday=1, DuckDB 0-6 Sunday=0 → oracle adds 1.
- natural log: Spark ``F.log`` = DuckDB ``ln``.
- time deltas: exact integer microseconds (epoch_us/unix_micros), never
  unit-counting functions whose boundary semantics differ.
- transcendentals (log/exp) round to 6 — libm results at these
  magnitudes agree far beyond that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table

# --- strings + hashes --------------------------------------------------------

#: SQL twins of :func:`string_feature_cols`, spliced into the
#: ``q_doc_profile`` oracle's final SELECT (same documents row, same
#: doc_id key). Kept adjacent to the Spark expressions so the pairs
#: stay reviewable side by side.
STRING_ORACLE_COLS = r"""
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
  LENGTH(STRING_SPLIT(text, ' ')) AS word_count,
  md5(text) AS text_md5,
  sha256(text) AS text_sha256"""


def string_feature_cols() -> list:
    """§2.8 string + hash families as unbound per-row columns over
    ``documents`` (text/lang/source), oracle-checked through
    ``q_doc_profile``.

    Content hashes (md5/sha2) are the dedup/upsert keys (S7/L1);
    xxhash64/monotonically_increasing_id are Spark-internal (used for
    bucketing, never in oracle outputs). ``text_len`` is deliberately
    absent — ``q_doc_profile`` already emits it.
    """
    return [
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
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
    ]


# --- date/time + math + conditional ------------------------------------------

_SCALAR_SUITE_ORACLE = """
SELECT
  o_orderkey,
  CAST(year(o_orderdate) AS INT) AS order_year,
  CAST(month(o_orderdate) AS INT) AS order_month,
  CAST(dayofweek(o_orderdate) + 1 AS INT) AS order_dow,
  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
  o_orderdate + INTERVAL 3 DAY AS plus3d,
  epoch_us(o_orderdate) AS order_epoch_us,
  ABS(o_totalprice - 150000.0) AS price_dev,
  CAST(CEIL(o_totalprice) AS BIGINT) AS price_ceil,
  CAST(FLOOR(o_totalprice) AS BIGINT) AS price_floor,
  ROUND(SQRT(o_totalprice), 6) AS price_sqrt,
  ROUND(LN(o_totalprice), 6) AS price_ln,
  ROUND(LOG10(o_totalprice), 6) AS price_log10,
  ROUND(POW(CAST(o_custkey % 10 AS DOUBLE), 2.0), 6) AS key_sq,
  CAST(SIGN(o_totalprice - 150000.0) AS DOUBLE) AS dev_sign,
  ROUND(EXP(CAST(o_custkey % 10 AS DOUBLE) / 10.0), 6) AS key_exp,
  CASE WHEN o_totalprice < 50000 THEN 'budget'
       WHEN o_totalprice < 150000 THEN 'mid'
       ELSE 'premium' END AS price_tier,
  GREATEST(o_totalprice, 100000.0) AS floor100k,
  LEAST(o_totalprice, 200000.0) AS cap200k,
  COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_or_open,
  (o_orderstatus = 'F' AND o_totalprice > 100000) AS big_finished
FROM orders
ORDER BY o_orderkey
"""


@query("q_scalar_suite", oracle=_SCALAR_SUITE_ORACLE)
def q_scalar_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 date/time + math + conditional families, one per-row pass.

    Everything stays inside whole-stage codegen — a single Project over
    the scan, no shuffle, the shape that streams at any scale.
    """
    orders = load_table(spark, sf_dir, "orders")
    price = F.col("o_totalprice")
    key10 = (F.col("o_custkey") % 10).cast("double")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.month("o_orderdate").cast("int").alias("order_month"),
        F.dayofweek("o_orderdate").cast("int").alias("order_dow"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.expr("o_orderdate + INTERVAL 3 DAY").alias("plus3d"),
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias(
            "order_epoch_us"
        ),
        F.abs(price - 150000.0).alias("price_dev"),
        F.ceil(price).alias("price_ceil"),
        F.floor(price).alias("price_floor"),
        F.round(F.sqrt(price), 6).alias("price_sqrt"),
        F.round(F.log(price), 6).alias("price_ln"),
        F.round(F.log10(price), 6).alias("price_log10"),
        F.round(F.pow(key10, F.lit(2.0)), 6).alias("key_sq"),
        F.signum(price - 150000.0).cast("double").alias("dev_sign"),
        F.round(F.exp(key10 / 10.0), 6).alias("key_exp"),
        F.when(price < 50000, "budget")
        .when(price < 150000, "mid")
        .otherwise("premium")
        .alias("price_tier"),
        F.greatest(price, F.lit(100000.0)).alias("floor100k"),
        F.least(price, F.lit(200000.0)).alias("cap200k"),
        F.coalesce(
            F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")
        ).alias("status_or_open"),
        ((F.col("o_orderstatus") == "F") & (price > 100000)).alias(
            "big_finished"
        ),
    )


# --- arrays + higher-order functions ----------------------------------------

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


# --- JSON + map family -------------------------------------------------------

_JSON_MAP_ORACLE = """
SELECT
  event_id,
  CAST(json_extract_string(props, '$.k') AS INT) AS k_path,
  CAST(json_extract_string(props, '$.k') AS INT) AS k_map,
  CAST(LENGTH(json_keys(props)) AS INT) AS n_keys,
  array_to_string(list_sort(json_keys(props)), ',') AS keys_csv,
  array_to_string(list_sort(list_transform(json_keys(props),
    kk -> kk || '=' || json_extract_string(props, '$.' || kk))), ',')
    AS entries_csv,
  CAST(user_id AS VARCHAR) AS uid_from_map,
  true AS has_type_key
FROM events
ORDER BY event_id
"""


@query("q_json_map_functions", oracle=_JSON_MAP_ORACLE)
def q_json_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T8/§2.8 json + map families — the Spark idioms for the reference's
    schema-on-read payloads (README.md:22-23).

    Both JSON routes are exercised: the string-path accessor
    (``get_json_object``) and the typed ``from_json(MapType)`` route,
    whose map is then taken apart with ``map_keys``/``map_entries``/
    ``element_at``/``size``. ``create_map`` builds a map from scratch and
    is probed with ``element_at``/``map_contains_key``. Map-typed values
    never reach the result schema — keys/entries serialize to sorted CSV
    so any order-insensitive comparer can hash the rows.
    """
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    built = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("uid"), F.col("user_id").cast("string"),
    )
    return (
        ev.withColumn("m", m)
        .withColumn("built", built)
        .select(
            "event_id",
            F.get_json_object("props", "$.k").cast("int").alias("k_path"),
            F.element_at("m", F.lit("k")).alias("k_map"),
            F.size("m").alias("n_keys"),
            F.concat_ws(",", F.sort_array(F.map_keys("m"))).alias("keys_csv"),
            F.concat_ws(
                ",",
                F.sort_array(
                    F.transform(
                        F.map_entries("m"),
                        lambda e: F.concat_ws(
                            "=", e["key"], e["value"].cast("string")
                        ),
                    )
                ),
            ).alias("entries_csv"),
            F.element_at("built", F.lit("uid")).alias("uid_from_map"),
            F.map_contains_key("built", F.lit("type")).alias("has_type_key"),
        )
        .orderBy("event_id")
    )
