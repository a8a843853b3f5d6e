"""X35 pins: per-batch mergeable stats partials — merged result equals
a full-scan ANALYZE (exact counts/min/max, NDV within sketch error),
redelivery idempotency via deterministic partial names, compaction
equivalence, and planner compatibility."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from custom_python_etl_data_connector_shivaask_username_spark.plans.incremental_stats import (
    append_stats_partial,
    compact_stats_partials,
    read_incremental_stats,
)
from custom_python_etl_data_connector_shivaask_username_spark.plans.stats import (
    collect_table_stats,
)
from custom_python_etl_data_connector_shivaask_username_spark.tables import load_table


def _mk_table(spark, sf_dir, tmp_path, name="orders"):
    path = str(tmp_path / name)
    df = load_table(spark, sf_dir, name)
    df.write.parquet(path)
    return path, spark.read.parquet(path)


def _deliver_in_slices(spark, df, path, key, n=3):
    for i in range(n):
        append_stats_partial(
            df.filter(F.col(key) % n == i), path, batch_id=i
        )


def test_incremental_equals_full_analyze(spark, sf_dir, tmp_path):
    path, orders = _mk_table(spark, sf_dir, tmp_path)
    _deliver_in_slices(spark, orders, path, "o_orderkey")
    inc = read_incremental_stats(spark, path)
    full = collect_table_stats(orders)
    assert inc["incremental"]["batches"] == 3
    assert inc["row_count"] == full["row_count"]
    assert inc["size_bytes"] == full["size_bytes"]
    for c, fstat in full["columns"].items():
        istat = inc["columns"][c]
        assert istat["min"] == fstat["min"], c
        assert istat["max"] == fstat["max"], c
        assert istat["null_count"] == fstat["null_count"], c
        # HLL (lgK=12, ~1.6% rse) vs truth: 5%-or-2 band
        true_ndv = orders.select(c).distinct().count() - int(
            fstat["null_count"] > 0
        )
        assert abs(istat["ndv"] - true_ndv) <= max(2, 0.05 * true_ndv), c
    # the partials dir is invisible to readers of the table itself
    assert spark.read.parquet(path).count() == full["row_count"]


def test_redelivery_overwrites_its_own_partial(spark, sf_dir, tmp_path):
    path, orders = _mk_table(spark, sf_dir, tmp_path)
    b0 = orders.filter(F.col("o_orderkey") % 2 == 0)
    b1 = orders.filter(F.col("o_orderkey") % 2 == 1)
    append_stats_partial(b0, path, batch_id=0)
    append_stats_partial(b1, path, batch_id=1)
    once = read_incremental_stats(spark, path)
    append_stats_partial(b0, path, batch_id=0)  # at-least-once replay
    twice = read_incremental_stats(spark, path)
    assert once == twice
    assert len(glob.glob(f"{path}/_stats_partials/batch-*.parquet")) == 2
    assert not glob.glob(f"{path}/_stats_partials__stage_*")


def test_compaction_equivalence_and_single_file(spark, sf_dir, tmp_path):
    path, orders = _mk_table(spark, sf_dir, tmp_path)
    _deliver_in_slices(spark, orders, path, "o_orderkey", n=4)
    before = read_incremental_stats(spark, path)
    compact_stats_partials(spark, path)
    after = read_incremental_stats(spark, path)
    files = glob.glob(f"{path}/_stats_partials/*.parquet")
    assert len(files) == 1
    assert after["incremental"]["batches"] == 1
    assert after["row_count"] == before["row_count"]
    for c, bstat in before["columns"].items():
        astat = after["columns"][c]
        # sketch unions are lossless: identical estimates, not approx
        assert astat["ndv"] == bstat["ndv"], c
        assert astat["min"] == bstat["min"], c
        assert astat["max"] == bstat["max"], c
        assert astat["null_count"] == bstat["null_count"], c


def test_planner_consumes_incremental_stats(spark, sf_dir, tmp_path):
    from custom_python_etl_data_connector_shivaask_username_spark.plans.stats import (
        plan_join_tree,
    )

    cpath, customer = _mk_table(spark, sf_dir, tmp_path, "customer")
    _deliver_in_slices(spark, customer, cpath, "c_custkey")
    tables = {
        "customer": customer,
        "nation": load_table(spark, sf_dir, "nation"),
    }
    stats = {
        "customer": read_incremental_stats(spark, cpath),
        "nation": collect_table_stats(tables["nation"]),
    }
    planned, order = plan_join_tree(
        tables,
        [("customer", "c_nationkey", "nation", "n_nationkey")],
        stats=stats,
    )
    # broadcast-chain rung: the larger table (customer, rows from the
    # INCREMENTAL stats) leads and streams; nation hash-attaches
    assert order == ["customer", "nation"]
    assert planned.count() == customer.count()


def test_type_coverage_dates_timestamps_doubles(spark, tmp_path):
    """The injective sketch-input mapping: NDV exact-ish on date,
    timestamp, double, boolean, and decimal columns."""
    import datetime as dt

    df = spark.createDataFrame(
        [
            (
                dt.date(2024, 1, 1 + i % 7),
                dt.datetime(2024, 1, 1, i % 5),
                float(i % 11) / 7.0,
                i % 2 == 0,
            )
            for i in range(200)
        ],
        "d date, ts timestamp, x double, b boolean",
    )
    path = str(tmp_path / "t")
    df.write.parquet(path)
    append_stats_partial(df, path, batch_id=0)
    stats = read_incremental_stats(spark, path)
    assert stats["columns"]["d"]["ndv"] == 7
    assert stats["columns"]["ts"]["ndv"] == 5
    assert stats["columns"]["x"]["ndv"] == 11
    assert stats["columns"]["b"]["ndv"] == 2
    assert stats["columns"]["d"]["min"] == dt.date(2024, 1, 1)


def test_schema_evolution_across_batches(spark, tmp_path):
    """A column added in a later batch: earlier rows count as NULL for
    it, NDV/min/max come from the batches that have it, and compaction
    keeps the unioned type map."""
    a = spark.createDataFrame([(i, f"u{i % 4}") for i in range(100)],
                              "id long, user string")
    b = spark.createDataFrame(
        [(i + 100, f"u{i % 4}", float(i % 9)) for i in range(50)],
        "id long, user string, score double",
    )
    path = str(tmp_path / "t")
    a.write.parquet(path)
    append_stats_partial(a, path, batch_id=0)
    append_stats_partial(b, path, batch_id=1)
    stats = read_incremental_stats(spark, path)
    assert stats["row_count"] == 150
    sc = stats["columns"]["score"]
    assert sc["null_count"] == 100  # pre-evolution rows are null
    assert sc["ndv"] == 9
    assert sc["min"] == 0.0 and sc["max"] == 8.0
    assert stats["columns"]["id"]["ndv"] >= 145
    compact_stats_partials(spark, path)
    after = read_incremental_stats(spark, path)
    assert after["columns"]["score"]["ndv"] == 9
    assert after["columns"]["score"]["null_count"] == 100
    assert after["row_count"] == 150
