"""Incremental ingestion, schema evolution, and expectations checks."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from custom_python_etl_data_connector_shivaask_username_spark.functions.expectations import (
    check_expectations,
)
from custom_python_etl_data_connector_shivaask_username_spark.sources.incremental import (
    commit_watermark,
    read_evolving,
    read_incremental,
    read_watermark,
)


def test_incremental_reads_only_new_rows_and_pushes_filter(spark, tmp_path):
    path = str(tmp_path / "tbl")
    state = str(tmp_path / "wm.json")

    batch1 = spark.createDataFrame(
        [Row(id=i, seq=i) for i in range(10)]
    )
    batch1.write.mode("append").parquet(path)

    df1, wm1 = read_incremental(spark, path, "seq", state)
    assert df1.count() == 10 and wm1 == 9
    commit_watermark(state, wm1)
    assert read_watermark(state) == 9

    batch2 = spark.createDataFrame(
        [Row(id=i, seq=i) for i in range(10, 15)]
    )
    batch2.write.mode("append").parquet(path)

    df2, wm2 = read_incremental(spark, path, "seq", state)
    assert sorted(r["seq"] for r in df2.collect()) == list(range(10, 15))
    assert wm2 == 14
    # the watermark predicate must reach the parquet scan
    plan = df2._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "GreaterThan(seq" in plan

    # crash between load and commit: same slice re-delivered
    df2b, _ = read_incremental(spark, path, "seq", state)
    assert df2b.count() == 5


def test_incremental_empty_slice_keeps_watermark(spark, tmp_path):
    path = str(tmp_path / "tbl")
    state = str(tmp_path / "wm.json")
    spark.createDataFrame([Row(id=1, seq=1)]).write.parquet(path)
    _, wm = read_incremental(spark, path, "seq", state)
    commit_watermark(state, wm)
    df, wm2 = read_incremental(spark, path, "seq", state)
    assert df.count() == 0
    assert wm2 == wm  # no new rows -> watermark unchanged, not None


def test_schema_evolution_reads_old_files_as_null(spark, tmp_path):
    path = str(tmp_path / "tbl")
    spark.createDataFrame([Row(id=1)]).write.mode("append").parquet(path)
    spark.createDataFrame([Row(id=2, extra="x")]).write.mode("append").parquet(path)
    df = read_evolving(spark, path)
    assert set(df.columns) == {"id", "extra"}
    rows = {r["id"]: r["extra"] for r in df.collect()}
    assert rows == {1: None, 2: "x"}


def test_expectations_single_pass_counts(spark):
    df = spark.createDataFrame(
        [Row(id=1, v=5.0), Row(id=2, v=-1.0), Row(id=3, v=None)]
    )
    report = check_expectations(
        df,
        {
            "v_not_null": F.col("v").isNotNull(),
            "v_non_negative": F.coalesce(F.col("v") >= 0, F.lit(False)),
            "id_positive": F.col("id") > 0,
        },
    )
    assert report.total_rows == 3
    assert report.violations == {
        "v_not_null": 1,
        "v_non_negative": 2,
        "id_positive": 0,
    }
    assert not report.passed
    assert abs(report.violation_rate("v_non_negative") - 2 / 3) < 1e-9
