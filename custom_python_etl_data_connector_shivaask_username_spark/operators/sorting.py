"""Sorts / limits / pagination (SURVEY.md §2.6 O1-O4).

Global top-k never materializes a full sort: Catalyst collapses
orderBy+limit into TakeOrderedAndProject (per-partition heap + driver
merge), which is exactly the 100 TB-safe shape. Deterministic tie-breaks
(the key column) are appended everywhere so oracle hashes are stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table

_TOP10_ORDERS_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
"""


@query("q_top10_orders", oracle=_TOP10_ORDERS_ORACLE)
def q_top10_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3: global top-k → TakeOrderedAndProject (no full sort)."""
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


_ORDERS_PAGE2_ORACLE = """
SELECT o_orderkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10 OFFSET 10
"""


@query("q_orders_page2", oracle=_ORDERS_PAGE2_ORACLE)
def q_orders_page2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4: keyset-free pagination (offset+limit over a total order)."""
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .offset(10)
        .limit(10)
    )


_ORDERED_PRIORITIES_ORACLE = """
SELECT o_orderpriority, o_orderkey
FROM orders
WHERE o_orderstatus = 'F'
ORDER BY o_orderpriority, o_orderkey DESC
LIMIT 50
"""


@query("q_ordered_priorities", oracle=_ORDERED_PRIORITIES_ORACLE)
def q_ordered_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1: multi-column mixed-direction global sort (range-partitioned)."""
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderpriority", "o_orderkey")
        .orderBy(F.col("o_orderpriority"), F.col("o_orderkey").desc())
        .limit(50)
    )
