"""Aggregation depth (SURVEY.md §2.4 A1-A10).

All float aggregates use the exact-decimal strategy (compat.py). Variance/
stddev are computed from exact sums via the textbook identity rather than
the engines' streaming implementations — Welford vs. sum-of-squares would
disagree at the ulp level, while exact-sum arithmetic is bit-identical and
shuffle-order-independent (the property that matters on 1000 executors).

approx_count_distinct / sample are registered rows-only (HLL and RNG
internals are engine-specific); their statistical behavior is pinned by
unit tests instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..compat import davg, dsum, sql_davg, sql_dsum
from ..registry import query
from ..tables import load_table

# --- A1/A2: grouped stats + exact count distinct -------------------------

_EVENT_TYPE_STATS_ORACLE = f"""
SELECT
  event_type,
  COUNT(*) AS event_count,
  COUNT(DISTINCT user_id) AS distinct_users,
  MIN(value) AS min_value,
  MAX(value) AS max_value,
  {sql_dsum('value', 'total_value')},
  {sql_davg('value', 'avg_value')}
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@query("q_event_type_stats", oracle=_EVENT_TYPE_STATS_ORACLE)
def q_event_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1+A2: two-phase hash agg; count-distinct expands then re-aggregates."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.countDistinct("user_id").alias("distinct_users"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            dsum("value", "total_value"),
            davg("value", "avg_value"),
        )
        .orderBy("event_type")
    )


# --- A4: exact percentiles ------------------------------------------------

_VALUE_PERCENTILES_ORACLE = """
SELECT
  event_type,
  ROUND(quantile_cont(value, 0.5), 6) AS p50,
  ROUND(quantile_cont(value, 0.95), 6) AS p95,
  ROUND(quantile_cont(value, 0.99), 6) AS p99
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@query("q_value_percentiles", oracle=_VALUE_PERCENTILES_ORACLE)
def q_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: exact interpolated percentiles (both engines sort + lerp).

    Exact `percentile` (not approx) keeps the oracle meaningful; at
    100 TB the same query ships as `percentile_approx` (see
    q_value_percentiles_approx) where a bounded-memory sketch replaces
    the per-group sort.
    """
    ev = load_table(spark, sf_dir, "events")
    pct = F.expr("percentile(value, array(0.5D, 0.95D, 0.99D))")
    return (
        ev.groupBy("event_type")
        .agg(pct.alias("p"))
        .select(
            "event_type",
            F.round(F.col("p")[0], 6).alias("p50"),
            F.round(F.col("p")[1], 6).alias("p95"),
            F.round(F.col("p")[2], 6).alias("p99"),
        )
        .orderBy("event_type")
    )


@query("q_value_percentiles_approx")  # rows-only: sketch internals differ
def q_value_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 scale path: KLL/GK sketch — bounded memory per group at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.percentile_approx("value", [0.5, 0.95, 0.99], 10000).alias("p")
        )
        .select(
            "event_type",
            F.col("p")[0].alias("p50"),
            F.col("p")[1].alias("p95"),
            F.col("p")[2].alias("p99"),
        )
        .orderBy("event_type")
    )


# --- A3: approx count distinct (rows-only) --------------------------------


@query("q_approx_distinct_users")
def q_approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: HLL++ — the only count-distinct that scales to 100 TB keys."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", 0.01).alias("approx_users"))
        .orderBy("event_type")
    )


# --- A5: rollup / cube ----------------------------------------------------

_ROLLUP_ORACLE = f"""
SELECT
  r_name,
  n_name,
  CAST(GROUPING(r_name) * 2 + GROUPING(n_name) AS INT) AS gid,
  COUNT(*) AS customer_count,
  {sql_dsum('c_acctbal', 'total_acctbal')}
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP(r_name, n_name)
ORDER BY gid, r_name, n_name
"""


@query("q_rollup_region_nation", oracle=_ROLLUP_ORACLE)
def q_rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: subtotal hierarchy region → nation → grand total."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count(F.lit(1)).alias("customer_count"),
            dsum("c_acctbal", "total_acctbal"),
        )
        .orderBy("gid", "r_name", "n_name")
    )


_CUBE_ORACLE = f"""
SELECT
  c_mktsegment,
  n_name,
  CAST(GROUPING(c_mktsegment) * 2 + GROUPING(n_name) AS INT) AS gid,
  COUNT(*) AS customer_count
FROM customer
JOIN nation ON c_nationkey = n_nationkey
GROUP BY CUBE(c_mktsegment, n_name)
ORDER BY gid, c_mktsegment, n_name
"""


@query("q_cube_segment_nation", oracle=_CUBE_ORACLE)
def q_cube_segment_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: full cube — all 4 grouping-set combinations in one pass."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .cube("c_mktsegment", "n_name")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count(F.lit(1)).alias("customer_count"),
        )
        .orderBy("gid", "c_mktsegment", "n_name")
    )


# --- A6: pivot -------------------------------------------------------------

ORDER_STATUSES = ["F", "O", "P"]

_PIVOT_ORACLE = """
SELECT
  o_orderpriority,
  CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS status_F,
  CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS status_O,
  CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS status_P
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@query("q_pivot_order_status", oracle=_PIVOT_ORACLE)
def q_pivot_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: pivot with an explicit value list.

    Passing the values avoids the extra distinct-collection job — at
    100 TB an unlisted pivot would scan the fact table twice.
    """
    orders = load_table(spark, sf_dir, "orders")
    piv = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ORDER_STATUSES)
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "o_orderpriority",
        *[
            F.coalesce(F.col(s), F.lit(0)).alias(f"status_{s}")
            for s in ORDER_STATUSES
        ],
    ).orderBy("o_orderpriority")


# --- A7: collect_list / collect_set ----------------------------------------

_SOURCES_PER_LANG_ORACLE = """
SELECT
  lang,
  COUNT(*) AS doc_count,
  list_sort(list(DISTINCT source)) AS sources
FROM documents
GROUP BY lang
ORDER BY lang
"""


@query("q_sources_per_lang", oracle=_SOURCES_PER_LANG_ORACLE)
def q_sources_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: collect_set wrapped in sort_array for deterministic goldens."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("doc_count"),
            F.sort_array(F.collect_set("source")).alias("sources"),
        )
        .orderBy("lang")
    )


# --- A8: conditional aggregation -------------------------------------------

_CONDITIONAL_ORACLE = f"""
SELECT
  o_orderpriority,
  CAST(COUNT(*) FILTER (WHERE o_totalprice > 100000) AS BIGINT)
    AS big_orders,
  {sql_dsum("CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END",
            'finished_revenue')},
  {sql_davg('CASE WHEN o_totalprice > 100000 THEN o_totalprice END',
            'avg_big_price')}
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@query("q_conditional_aggregates", oracle=_CONDITIONAL_ORACLE)
def q_conditional_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: filtered counts and CASE-guarded sums/avgs in one pass."""
    orders = load_table(spark, sf_dir, "orders")
    big = F.col("o_totalprice") > 100000
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.count_if(big).alias("big_orders"),
            dsum(
                F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice"))
                .otherwise(F.lit(0)),
                "finished_revenue",
            ),
            davg(F.when(big, F.col("o_totalprice")), "avg_big_price"),
        )
        .orderBy("o_orderpriority")
    )


# --- exact-moment stats (A1 depth): mean/stddev from exact sums ------------

_VALUE_STATS_ORACLE = """
SELECT
  event_type,
  COUNT(value) AS n,
  CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) / COUNT(value) AS mean_value,
  SQRT(
    (CAST(SUM(CAST(value * value AS DECIMAL(27,6))) AS DOUBLE)
     - POW(CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE), 2) / COUNT(value)
    ) / (COUNT(value) - 1)
  ) AS stddev_value
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@query("q_value_stats_exact", oracle=_VALUE_STATS_ORACLE)
def q_value_stats_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent stddev: exact sums + textbook identity.

    Streaming stddev implementations differ across engines and shuffle
    orders; this formulation is deterministic on any cluster size.
    """
    ev = load_table(spark, sf_dir, "events")
    s1 = F.sum(F.col("value").cast("decimal(27,6)")).cast("double")
    s2 = F.sum((F.col("value") * F.col("value")).cast("decimal(27,6)")).cast(
        "double"
    )
    n = F.count("value")
    return (
        ev.groupBy("event_type")
        .agg(
            n.alias("n"),
            (s1 / n).alias("mean_value"),
            F.sqrt((s2 - F.pow(s1, F.lit(2)) / n) / (n - 1)).alias(
                "stddev_value"
            ),
        )
        .orderBy("event_type")
    )


# --- A10: seeded sampling (rows-only) ---------------------------------------


@query("q_sampled_value_sum")
def q_sampled_value_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10: seeded Bernoulli sample — deterministic for a fixed partition
    layout; registered rows-only because RNG streams are engine-specific."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.sample(fraction=0.1, seed=42)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("sampled_count"), dsum("value", "sampled_value"))
        .orderBy("event_type")
    )
