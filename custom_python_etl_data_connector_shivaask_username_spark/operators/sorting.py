"""Sorts / limits / pagination (SURVEY.md §2.6 O1-O4).

- O3+O4 → ``q_top_orders_page``: orderBy + offset + limit collapses to
  TakeOrderedAndProject (per-partition heap + driver merge, offset
  applied at the merge) — no full sort at any scale.
- O1 → ``q_ordered_priorities``: a true global sort (range-partitioned
  SortExec), no limit, so the range-exchange shape is what ships.
- Registry home since round 6: both ship as tagged branches of
  ``q_sorting_suite`` (one row, both physical shapes preserved and
  plan-pinned; the builders stay for tests/composition).
- O2 → ``q_partition_sorted_events``: repartition(key) +
  sortWithinPartitions — the sink-ordering idiom (e.g. writing
  time-ordered parquet per key without a global sort). The query proves
  per-partition sortedness *inside* the partitions via ``mapInPandas``
  (the per-partition batch iterator sees the partition's rows in order)
  and returns a 1-row summary that the oracle can check.

Deterministic tie-breaks (the key column) are appended everywhere so
oracle hashes are stable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table

_TOP_ORDERS_PAGE_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10 OFFSET 5
"""


def q_top_orders_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3+O4: global top-k with pagination → TakeOrderedAndProject
    (heap of offset+limit rows per partition, offset dropped at the
    driver merge — never a full sort)."""
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .offset(5)
        .limit(10)
    )


_ORDERED_PRIORITIES_ORACLE = """
SELECT o_orderpriority, o_orderkey
FROM orders
WHERE o_orderstatus = 'F'
ORDER BY o_orderpriority, o_orderkey DESC
"""


def q_ordered_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1: multi-column mixed-direction global sort — range partitioning
    (sampled boundaries) + per-partition sort, the only sort shape that
    scales; no limit so the full range exchange is exercised."""
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderpriority", "o_orderkey")
        .orderBy(F.col("o_orderpriority"), F.col("o_orderkey").desc())
    )


_SORTING_SUITE_ORACLE = """
SELECT 'page' AS branch, o_orderkey, o_custkey, o_totalprice,
       CAST(NULL AS VARCHAR) AS o_orderpriority
FROM (SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 10 OFFSET 5)
UNION ALL
SELECT 'global_sort' AS branch, o_orderkey,
       CAST(NULL AS BIGINT) AS o_custkey,
       CAST(NULL AS DOUBLE) AS o_totalprice,
       o_orderpriority
FROM orders WHERE o_orderstatus = 'F'
"""


@query("q_sorting_suite", oracle=_SORTING_SUITE_ORACLE)
def q_sorting_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1+O3+O4 as tagged branches of ONE registry row (folded round 6
    to free a slot under the 50-row cap for ``q_rollup_incremental``).
    The union preserves each arm's physical shape — probed before the
    fold and pinned since: the ``page`` arm still collapses to
    ``TakeOrderedAndProject(limit=15, offset=5)`` with zero exchanges,
    and the ``global_sort`` arm keeps its rangepartitioning exchange +
    Sort with the status filter pushed to the scan (per-arm AND
    union-level plan pins in tests/test_plans.py)."""
    page = q_top_orders_page(spark, sf_dir).select(
        F.lit("page").alias("branch"),
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.lit(None).cast("string").alias("o_orderpriority"),
    )
    gsort = q_ordered_priorities(spark, sf_dir).select(
        F.lit("global_sort").alias("branch"),
        "o_orderkey",
        F.lit(None).cast("long").alias("o_custkey"),
        F.lit(None).cast("double").alias("o_totalprice"),
        "o_orderpriority",
    )
    return page.unionByName(gsort)


N_PARTS = 8

_PARTITION_SORTED_ORACLE = f"""
SELECT true AS partitions_bounded,
       COUNT(*) AS total_rows,
       true AS all_sorted
FROM events
-- partitions_bounded: at most {N_PARTS} non-empty hash partitions exist;
-- the exact non-empty count is data-dependent (a hash cell can be empty
-- at small SF), so the oracle pins the bound, not the count.
"""


@query("q_partition_sorted_events", oracle=_PARTITION_SORTED_ORACLE)
def q_partition_sorted_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2: hash-repartition on user_id + sortWithinPartitions(user_id, ts)
    — the write-ordered-runs idiom (row-group clustering for parquet
    sinks) that needs no global exchange beyond the hash partition.

    Sortedness is *verified distributed*: mapInPandas streams each
    partition's Arrow batches in partition order and checks the
    (user_id, ts) sequence is nondecreasing across batch boundaries,
    emitting one summary row per partition; a final 1-row reduction is
    what the oracle pins (true == every partition was sorted).
    """
    ev = load_table(spark, sf_dir, "events")
    arranged = (
        ev.select("user_id", "ts")
        .repartition(N_PARTS, "user_id")
        .sortWithinPartitions("user_id", "ts")
    )

    def check_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        ok = True
        prev = None
        for pdf in batches:
            for u, t in zip(pdf["user_id"], pdf["ts"]):
                cur = (u, t)
                if prev is not None and cur < prev:
                    ok = False
                prev = cur
                n += 1
        if n:
            yield pd.DataFrame({"n_rows": [n], "sorted": [ok]})

    checked = arranged.mapInPandas(
        check_partition, "n_rows long, sorted boolean"
    )
    return checked.agg(
        (F.count(F.lit(1)) <= N_PARTS).alias("partitions_bounded"),
        F.sum("n_rows").alias("total_rows"),
        F.bool_and("sorted").alias("all_sorted"),
    )
