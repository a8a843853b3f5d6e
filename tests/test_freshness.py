"""X38 pins: staleness signals come from metadata only (file bytes,
X35 partials), thresholds gate re-collection, and the sidecar-backed
entry point refreshes exactly when stale."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from custom_python_etl_data_connector_shivaask_username_spark.plans.freshness import (
    is_stale,
    refresh_stats_if_stale,
    stats_staleness,
)
from custom_python_etl_data_connector_shivaask_username_spark.plans.incremental_stats import (
    append_stats_partial,
)
from custom_python_etl_data_connector_shivaask_username_spark.plans.stats import (
    collect_table_stats,
    read_stats_sidecar,
    write_stats_sidecar,
)


def _mk(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).cast("double").alias("v"),
    )


def test_fresh_table_skips_recollection(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, 0, 1000).write.parquet(path)
    df = spark.read.parquet(path)
    write_stats_sidecar(spark, path, collect_table_stats(df, path=path))
    stats, refreshed = refresh_stats_if_stale(spark, df, path)
    assert not refreshed
    assert stats["row_count"] == 1000


def test_missing_sidecar_always_collects(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, 0, 500).write.parquet(path)
    df = spark.read.parquet(path)
    stats, refreshed = refresh_stats_if_stale(spark, df, path)
    assert refreshed and stats["row_count"] == 500
    assert read_stats_sidecar(spark, path)["row_count"] == 500


def test_bytes_growth_triggers_refresh(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, 0, 1000).write.parquet(path)
    df0 = spark.read.parquet(path)
    write_stats_sidecar(spark, path, collect_table_stats(df0, path=path))
    # the table grows ~2x under the sidecar's feet
    _mk(spark, 1000, 3000).write.mode("append").parquet(path)
    df1 = spark.read.parquet(path)
    report = stats_staleness(
        spark, df1, read_stats_sidecar(spark, path), table_path=path
    )
    assert report["bytes_drift"] and report["bytes_drift"] > 0.5
    stale, reasons = is_stale(report)
    assert stale and any("bytes_drift" in r for r in reasons)
    stats, refreshed = refresh_stats_if_stale(spark, df1, path)
    assert refreshed and stats["row_count"] == 3000
    # a second call sees the rewritten sidecar as fresh
    _, again = refresh_stats_if_stale(spark, df1, path)
    assert not again


def test_partials_row_and_range_drift(spark, tmp_path):
    path = str(tmp_path / "t")
    b0 = _mk(spark, 0, 1000)
    b0.write.parquet(path)
    df0 = spark.read.parquet(path)
    write_stats_sidecar(spark, path, collect_table_stats(df0, path=path))
    append_stats_partial(b0, path, batch_id=0)
    # batch 1: +150% rows AND a key domain far outside the old range
    b1 = _mk(spark, 100_000, 101_500)
    append_stats_partial(b1, path, batch_id=1)
    report = stats_staleness(
        spark, df0, read_stats_sidecar(spark, path), table_path=path
    )
    assert report["row_drift"] and report["row_drift"] > 1.0
    assert report["range_drift"].get("k", 0) > 50  # way outside
    stale, reasons = is_stale(report)
    assert stale
    assert any("row_drift" in r for r in reasons)
    assert any("range_drift[k]" in r for r in reasons)


def test_thresholds_are_tunable(spark, tmp_path):
    path = str(tmp_path / "t")
    # large enough that parquet's fixed per-file overhead doesn't
    # dominate the byte ratio
    _mk(spark, 0, 50_000).coalesce(1).write.parquet(path)
    df0 = spark.read.parquet(path)
    write_stats_sidecar(spark, path, collect_table_stats(df0, path=path))
    _mk(spark, 50_000, 53_000).coalesce(1).write.mode("append").parquet(
        path
    )  # +6% rows
    df1 = spark.read.parquet(path)
    report = stats_staleness(
        spark, df1, read_stats_sidecar(spark, path), table_path=path
    )
    assert not is_stale(report)[0]  # inside the default 20% band
    assert is_stale(report, max_bytes_drift=0.01)[0]  # tight band trips


def test_sampled_refresh_path(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, 0, 20_000).write.parquet(path)
    df = spark.read.parquet(path)
    stats, refreshed = refresh_stats_if_stale(
        spark, df, path, sample_fraction=0.2
    )
    assert refreshed
    assert stats["sampled"]["fraction"] == 0.2
    assert abs(stats["row_count"] - 20_000) <= 2_000
