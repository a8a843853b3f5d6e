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
WITH mid AS (
  SELECT CAST(FLOOR(MAX(event_id) / 2) AS BIGINT) AS m FROM events
),
ref AS (
  SELECT value AS v FROM events, mid
  WHERE event_id <= mid.m AND value IS NOT NULL
),
bat AS (
  SELECT value AS v FROM events, mid
  WHERE event_id > mid.m AND value IS NOT NULL
),
spec AS (
  SELECT lo, CASE WHEN hi > lo THEN (hi - lo) / 10 ELSE 1.0 END AS w
  FROM (SELECT MIN(v) AS lo, MAX(v) AS hi FROM ref)
),
spine AS (SELECT UNNEST(range(10)) AS bucket),
refc AS (
  SELECT LEAST(GREATEST(CAST(FLOOR((v - lo) / w) AS BIGINT), 0), 9)
           AS bucket, COUNT(*) AS c
  FROM ref, spec GROUP BY 1
),
batc AS (
  SELECT LEAST(GREATEST(CAST(FLOOR((v - lo) / w) AS BIGINT), 0), 9)
           AS bucket, COUNT(*) AS c
  FROM bat, spec GROUP BY 1
),
shares AS (
  SELECT s.bucket,
         COALESCE(r.c, 0) / (SELECT COUNT(*) FROM ref) AS p0,
         COALESCE(b.c, 0) / (SELECT COUNT(*) FROM bat) AS q0
  FROM spine s
  LEFT JOIN refc r ON s.bucket = r.bucket
  LEFT JOIN batc b ON s.bucket = b.bucket
),
psi AS (
  SELECT ROUND(SUM(
           ((p0 + 1e-4) - (q0 + 1e-4)) *
           FLOOR(LN((p0 + 1e-4) / (q0 + 1e-4)) * 1000000.0 + 0.5)
         ) / 1000000.0, 6) AS psi
  FROM shares
)
SELECT 'sorted_runs' AS branch, CAST(NULL AS VARCHAR) AS label,
       CAST(NULL AS DOUBLE) AS score, COUNT(*) AS n, true AS flag
FROM events
-- at most {N_PARTS} non-empty hash partitions, every one sorted; the
-- exact non-empty count is data-dependent, so the flag pins the bound
UNION ALL
SELECT 'heavy', event_type, CAST(NULL AS DOUBLE), COUNT(*),
       CAST(NULL AS BOOLEAN)
FROM events GROUP BY event_type
UNION ALL
SELECT 'drift',
       CASE WHEN psi IS NULL THEN 'no_data'
            WHEN psi < 0.1 THEN 'stable'
            WHEN psi <= 0.25 THEN 'drifting'
            ELSE 'action' END,
       psi, CAST(NULL AS BIGINT), CAST(NULL AS BOOLEAN)
FROM psi
ORDER BY branch, label
"""


@query("q_partition_sorted_events", oracle=_PARTITION_SORTED_ORACLE)
def q_partition_sorted_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events integrity & monitor suite, three tagged branches — O2's
    distributed sortedness proof plus the two formerly rows-only
    monitor surfaces the round-8 verdict asked to oracle-ify (both are
    exact-decimal deterministic, so they can ride the hash check):

    - ``sorted_runs`` (O2): hash-repartition on user_id +
      sortWithinPartitions(user_id, ts) — the write-ordered-runs idiom
      (row-group clustering for parquet sinks) with no global exchange
      beyond the hash partition. Sortedness is *verified distributed*:
      mapInPandas streams each partition's Arrow batches in partition
      order and checks the (user_id, ts) sequence is nondecreasing
      across batch boundaries; the reduced flag (bounded partition
      count AND every partition sorted) is what the oracle pins.
    - ``heavy`` (X17): Misra-Gries candidates + broadcast-filtered
      EXACT verify over event_type — the final counts are plain
      GROUP BY truth, which is precisely what makes the sketch
      pipeline oracle-checkable (k is derived from the distinct type
      count so the sketch provably covers every group the unbounded
      oracle GROUP BY produces, whatever the fixture holds).
    - ``drift`` (X26): PSI of the late half of the feed (by the
      floor(max/2) event_id split — exact in both engines, unlike a
      percentile) against a histogram frozen on the early half.
      Deterministic cross-engine by the quantized-LN doctrine: shares
      are exact integer divisions, the LN is floor-quantized to 1e-6,
      and the ≤10 bucket terms sum far above the double noise floor
      of round(psi, 6).
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
    sorted_runs = checked.agg(
        (F.count(F.lit(1)) <= N_PARTS).alias("_bounded"),
        F.sum("n_rows").alias("_rows"),
        F.bool_and("sorted").alias("_sorted"),
    ).select(
        F.lit("sorted_runs").alias("branch"),
        F.lit(None).cast("string").alias("label"),
        F.lit(None).cast("double").alias("score"),
        F.col("_rows").alias("n"),
        (F.col("_bounded") & F.col("_sorted")).alias("flag"),
    )

    from ..operators.aggregates import heavy_hitters

    # k = the actual distinct type count (incl. NULL): the oracle is
    # an UNBOUNDED group-by, so a top-k sketch matches it only when k
    # covers every type — deriving k makes that coupling explicit
    # instead of silently depending on the fixture having ≤5 types
    # (round-9 advisory); one tiny single-column job, pushed scan.
    # Capped at 64 (round-10 review finding): an unbounded derived k
    # would scale the Misra-Gries summaries with type cardinality and
    # quietly turn the bounded-memory sketch into a full GROUP BY —
    # a fixture that ever exceeds the cap fails HERE, by name, and
    # the suite's oracle coupling gets revisited rather than the
    # sketch degenerating
    n_types = ev.select("event_type").distinct().count()
    if n_types > 64:
        raise ValueError(
            f"monitor-suite fixture has {n_types} distinct event types; "
            "the heavy branch's exact-oracle coupling assumes a bounded "
            "type domain (<=64) — raise deliberately or split the branch"
        )
    heavy = heavy_hitters(ev, "event_type", k=n_types).select(
        F.lit("heavy").alias("branch"),
        F.col("item").alias("label"),
        F.lit(None).cast("double").alias("score"),
        F.col("count").alias("n"),
        F.lit(None).cast("boolean").alias("flag"),
    )

    from ..operators.drift import drift_psi, freeze_histogram

    mid = ev.agg(
        F.floor(F.max("event_id") / 2).cast("long").alias("m")
    ).first()["m"]
    spec, ref_shares = freeze_histogram(
        ev.filter(F.col("event_id") <= mid).select(F.col("value").alias("v")),
        "v",
        n_buckets=10,
    )
    drift = drift_psi(
        ev.filter(F.col("event_id") > mid).select(F.col("value").alias("v")),
        spec,
        ref_shares,
    ).select(
        F.lit("drift").alias("branch"),
        F.col("status").alias("label"),
        F.col("psi").alias("score"),
        F.lit(None).cast("long").alias("n"),
        F.lit(None).cast("boolean").alias("flag"),
    )
    return (
        sorted_runs.unionByName(heavy)
        .unionByName(drift)
        .orderBy("branch", "label")
    )
