"""Set operations (SURVEY.md §2.7 U1-U3) + distinct (A9).

Union is the connector-merge primitive (one `{connector}_raw` table per
source, unioned for analysis — reference README.md:28-29); except is the
re-ingestion diff primitive. All map to single-shuffle Catalyst plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table

_ACCOUNT_HOLDERS_ORACLE = """
SELECT nationkey, CAST(COUNT(*) AS BIGINT) AS holder_count
FROM (
  SELECT c_nationkey AS nationkey FROM customer
  UNION ALL
  SELECT s_nationkey AS nationkey FROM supplier
) u
GROUP BY nationkey
ORDER BY nationkey
"""


@query("q_union_account_holders", oracle=_ACCOUNT_HOLDERS_ORACLE)
def q_union_account_holders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: union all (bag semantics) of two heterogeneous sources."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return (
        c.unionByName(s)
        .groupBy("nationkey")
        .agg(F.count(F.lit(1)).alias("holder_count"))
        .orderBy("nationkey")
    )


_NATIONS_BOTH_ORACLE = """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey FROM supplier
ORDER BY nationkey
"""


@query("q_nations_with_both", oracle=_NATIONS_BOTH_ORACLE)
def q_nations_with_both(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2: intersect (set semantics — implicit distinct)."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.intersect(s).orderBy("nationkey")


_NATIONS_CUST_ONLY_ORACLE = """
SELECT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT s_nationkey FROM supplier
ORDER BY nationkey
"""


@query("q_nations_customers_only", oracle=_NATIONS_CUST_ONLY_ORACLE)
def q_nations_customers_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3: except — the change-detection shape for re-ingestion diffs."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.subtract(s).orderBy("nationkey")


_DISTINCT_SEGMENTS_ORACLE = """
SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
ORDER BY c_mktsegment, c_nationkey
"""


@query("q_distinct_segments", oracle=_DISTINCT_SEGMENTS_ORACLE)
def q_distinct_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9: SELECT DISTINCT → hash aggregate on all columns."""
    return (
        load_table(spark, sf_dir, "customer")
        .select("c_mktsegment", "c_nationkey")
        .distinct()
        .orderBy("c_mktsegment", "c_nationkey")
    )
