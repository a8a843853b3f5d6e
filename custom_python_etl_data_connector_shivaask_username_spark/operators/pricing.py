"""Flagship query: pricing summary report (TPC-H Q1 shape).

Exercises the full vertical slice: parquet scan with predicate pushdown
(S8), timestamp filter (T-family), per-row expression arithmetic, two-phase
hash aggregation (A1), and a global sort (O1). SURVEY.md §7 M0.

Scale notes: the filter reaches the parquet scan (row-group skipping on
``l_shipdate`` min/max), only 7 of 11 columns are read (column pruning),
and the groupBy has 6-value key cardinality so the partial (map-side)
aggregation reduces ~everything before the single tiny shuffle. This plan
is 100 TB-safe by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..compat import davg, dsum, sql_davg, sql_dsum
from ..registry import query
from ..tables import load_table, spread_small_input

CUTOFF = "1998-09-02"

_Q1_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {sql_dsum('l_quantity', 'sum_qty')},
  {sql_dsum('l_extendedprice', 'sum_base_price')},
  {sql_dsum('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
  {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
  {sql_davg('l_quantity', 'avg_qty')},
  {sql_davg('l_extendedprice', 'avg_price')},
  {sql_davg('l_discount', 'avg_disc')},
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{CUTOFF}'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@query("q1_pricing_summary", oracle=_Q1_ORACLE)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The partial aggregation (8 exact-decimal accumulators/row) fuses
    # into the scan stage, so its parallelism equals the scan's row-group
    # count; spread_small_input unlocks every core when the input is a
    # single row group (fixture artifact) and is a guarded no-op on any
    # real multi-row-group dataset. Decimal exactness makes the result
    # independent of the introduced row order.
    li = spread_small_input(load_table(spark, sf_dir, "lineitem"))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit(CUTOFF).cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
