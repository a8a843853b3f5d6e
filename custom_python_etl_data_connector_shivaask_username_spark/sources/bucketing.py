"""Bucketed tables — the shuffle-once strategy for fact⋈fact joins
(SURVEY.md §2.3 scale doctrine, §4 partitioning).

At 100 TB the lineitem⋈orders join shuffles both facts on every run
unless the tables are bucketed on the join key at WRITE time: bucketing
pays the shuffle once during ingestion, after which every equi-join and
aggregation on the bucket key runs with ZERO exchanges (asserted in
tests/test_bucketing.py — the physical plan is a SortMergeJoin directly
over the bucketed scans).

The registry's fixture queries can't use this (the driver's parquet
files are plain), so the strategy lives here as the write-path helper a
deployment calls from its ingestion job (e.g. inside ST1's
foreachBatch), plus tests that pin the no-exchange plan property.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 64,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) catalog table.

    ``num_buckets`` should be sized so one bucket of the LARGER fact fits
    an executor's memory at the target scale; both sides of a co-located
    join must use the same bucket count and key.
    """
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort:
        writer = writer.sortBy(*bucket_cols)
    writer.saveAsTable(table)


def co_located_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    left_key: str,
    right_key: str,
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables — no exchange on either side.

    Callers are responsible for having written both tables with
    :func:`write_bucketed` using the same bucket count; Catalyst then
    recognizes the output partitioning and elides both shuffles (and,
    with sorted buckets, both sorts).
    """
    a = spark.table(left_table)
    b = spark.table(right_table)
    return a.join(b, a[left_key] == b[right_key], how)
