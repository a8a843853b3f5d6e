"""Partitioned-lake layout: pruning, dynamic overwrite, compaction.

These pin the physical-layout contract that matters at 100 TB: a filter
on the partition column must prune directories (PartitionFilters in the
scan, not a post-scan Filter), per-day overwrite must not touch sibling
days, and compaction must shrink file counts without changing data.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from custom_python_etl_data_connector_shivaask_username_spark.sources.layout import (
    compact_partitions,
    overwrite_partitions,
    write_partitioned,
)
from custom_python_etl_data_connector_shivaask_username_spark.tables import load_table


def _events_with_date(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return ev.withColumn("event_date", F.to_date("ts"))


def _parquet_files(path):
    return glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)


def test_partition_pruning_reaches_scan(spark, sf_dir, tmp_path):
    path = str(tmp_path / "events_by_date")
    ev = _events_with_date(spark, sf_dir)
    write_partitioned(ev, path, ["event_date"])

    dates = [r["event_date"] for r in ev.select("event_date").distinct().collect()]
    assert len(dates) > 1, "fixture must span multiple dates"
    one = sorted(dates)[0]

    back = spark.read.parquet(path).filter(F.col("event_date") == F.lit(one))
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "event_date" in plan.split("PartitionFilters", 1)[1].split("]", 1)[0]
    # pruned read returns exactly that day's rows
    expected = ev.filter(F.col("event_date") == F.lit(one)).count()
    assert back.count() == expected


def test_write_partitioned_bounds_files_per_cell(spark, sf_dir, tmp_path):
    path = str(tmp_path / "events_one_file")
    ev = _events_with_date(spark, sf_dir)
    write_partitioned(ev, path, ["event_date"])
    n_cells = ev.select("event_date").distinct().count()
    assert len(_parquet_files(path)) == n_cells  # exactly 1 file per cell

    path3 = str(tmp_path / "events_three_files")
    write_partitioned(ev, path3, ["event_date"], files_per_partition=3)
    assert len(_parquet_files(path3)) <= 3 * n_cells


def test_dynamic_overwrite_touches_only_batch_partitions(spark, sf_dir, tmp_path):
    path = str(tmp_path / "events_dyn")
    ev = _events_with_date(spark, sf_dir)
    write_partitioned(ev, path, ["event_date"])

    dates = sorted(
        r["event_date"] for r in ev.select("event_date").distinct().collect()
    )
    target, sibling = dates[0], dates[-1]
    before_sibling = (
        spark.read.parquet(path)
        .filter(F.col("event_date") == F.lit(sibling))
        .count()
    )

    # re-deliver the target day with a marker value
    batch = ev.filter(F.col("event_date") == F.lit(target)).withColumn(
        "value", F.lit(-1.0)
    )
    overwrite_partitions(batch, path, ["event_date"])

    after = spark.read.parquet(path)
    # sibling partition unchanged
    assert (
        after.filter(F.col("event_date") == F.lit(sibling)).count()
        == before_sibling
    )
    # target partition fully replaced by the marker batch
    got = after.filter(F.col("event_date") == F.lit(target))
    assert got.count() == batch.count()
    assert got.filter(F.col("value") != -1.0).count() == 0


def test_compaction_shrinks_files_keeps_data(spark, sf_dir, tmp_path):
    path = str(tmp_path / "events_fragmented")
    ev = _events_with_date(spark, sf_dir).cache()
    # simulate 4 incremental appends → 4 slivers per cell
    for _ in range(4):
        (
            ev.repartition(*[F.col("event_date")])
            .write.mode("append")
            .partitionBy("event_date")
            .parquet(path)
        )
    n_cells = ev.select("event_date").distinct().count()
    assert len(_parquet_files(path)) == 4 * n_cells

    before = spark.read.parquet(path)
    checksum_before = before.agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.hash(*before.columns)).alias("h")
    ).collect()[0]

    compact_partitions(spark, path, ["event_date"])
    assert len(_parquet_files(path)) == n_cells

    after = spark.read.parquet(path)
    checksum_after = after.agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.hash(*after.columns)).alias("h")
    ).collect()[0]
    assert checksum_before == checksum_after
    ev.unpersist()


def test_zorder_narrows_minmax_on_both_dimensions(spark, tmp_path):
    """The skipping argument, measured from the actual parquet footers:
    a 1-D sort on x gives narrow per-file x-ranges but each file spans
    ~the full y-range (no pruning on y filters); the Z-order layout
    keeps BOTH dimensions' per-file ranges well under half the domain,
    so min/max stats prune files for filters on either column."""
    import glob

    import pyarrow.parquet as pq

    from custom_python_etl_data_connector_shivaask_username_spark.sources.layout import (
        write_zordered,
    )

    n = 64_000
    df = spark.range(n).select(
        (F.col("id") % 1000).alias("x"),
        ((F.col("id") * 2654435761) % 1000).alias("y"),
    )

    linear = str(tmp_path / "linear")
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(linear)
    zpath = str(tmp_path / "zorder")
    write_zordered(df, zpath, ["x", "y"], num_files=16)

    def mean_coverage(path, col):
        spans = []
        for f in glob.glob(f"{path}/part-*.parquet"):
            md = pq.ParquetFile(f).metadata
            lo, hi = None, None
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    c = md.row_group(rg).column(ci)
                    if c.path_in_schema == col:
                        st = c.statistics
                        lo = st.min if lo is None else min(lo, st.min)
                        hi = st.max if hi is None else max(hi, st.max)
            spans.append((hi - lo) / 999.0)
        return sum(spans) / len(spans)

    # 1-D sort: x tight, y useless
    assert mean_coverage(linear, "x") < 0.25
    assert mean_coverage(linear, "y") > 0.8
    # Z-order: both dimensions tight enough to skip most files
    assert mean_coverage(zpath, "x") < 0.5
    assert mean_coverage(zpath, "y") < 0.5


def test_zorder_reclusters_existing_table_in_place(spark, tmp_path):
    """OPTIMIZE-style use: read a table and z-order it back to the SAME
    path — the staging + rename swap must make this safe (a direct
    overwrite of a path still being read either errors or loses data)."""
    from custom_python_etl_data_connector_shivaask_username_spark.sources.layout import (
        write_zordered,
    )

    path = str(tmp_path / "t")
    df = spark.range(5000).select(
        (F.col("id") % 100).alias("x"), ((F.col("id") * 7) % 100).alias("y")
    )
    df.write.parquet(path)
    before = sorted((r["x"], r["y"]) for r in spark.read.parquet(path).collect())
    write_zordered(spark.read.parquet(path), path, ["x", "y"], num_files=4)
    after = sorted((r["x"], r["y"]) for r in spark.read.parquet(path).collect())
    assert after == before  # same rows, new layout


def test_zorder_rejects_strings_and_empty_handles_nulls(spark):
    import pytest

    from custom_python_etl_data_connector_shivaask_username_spark.sources.layout import (
        zorder_value,
    )

    # non-numeric column: loud TypeError, not a silent all-NULL z-value
    s = spark.createDataFrame([("a", 1)], "name STRING, x LONG")
    with pytest.raises(TypeError, match="range locality"):
        zorder_value(s, ["name", "x"])
    # empty input: loud ValueError (min/max undefined)
    empty = spark.createDataFrame([], "x LONG, y LONG")
    with pytest.raises(ValueError, match="empty input or all-NULL"):
        zorder_value(empty, ["x", "y"])
    # NULL cells cluster low in their dimension; other dimensions keep
    # locality (the z-value itself is never NULL)
    withnulls = spark.createDataFrame(
        [(None, 10), (5, 20), (9, 30)], "x INT, y INT"
    )
    vals = withnulls.select(
        zorder_value(withnulls, ["x", "y"]).alias("z")
    ).collect()
    assert all(r["z"] is not None for r in vals)


def test_zorder_temporal_columns(spark):
    """DATE/TIMESTAMP are advertised in the numeric allowlist but refuse
    a direct double cast — they must route through epoch integers
    (unix_date / unix_micros), and z-ordering on (date, numeric) must
    produce monotone z-values along the date dimension."""
    from custom_python_etl_data_connector_shivaask_username_spark.sources.layout import (
        zorder_value,
    )

    df = spark.createDataFrame(
        [("2024-01-01", "2024-01-01 00:00:00", 1),
         ("2024-06-01", "2024-06-01 12:00:00", 2),
         ("2024-12-31", "2024-12-31 23:59:59", 3)],
        "d STRING, t STRING, x INT",
    ).selectExpr("CAST(d AS DATE) d", "CAST(t AS TIMESTAMP) t", "x")
    rows = (
        df.select("x", zorder_value(df, ["d", "t"]).alias("z"))
        .orderBy("x")
        .collect()
    )
    assert all(r["z"] is not None for r in rows)
    # date+timestamp advance together here, so z must be strictly monotone
    zs = [r["z"] for r in rows]
    assert zs == sorted(zs) and len(set(zs)) == 3
