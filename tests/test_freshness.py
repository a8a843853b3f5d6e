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


def test_column_subset_sidecar_converges(spark, tmp_path):
    """A sidecar deliberately collected on a key subset must not be
    permanently stale just because the partials track more columns —
    the old behavior re-ran ANALYZE on every call, forever."""
    path = str(tmp_path / "t")
    b0 = _mk(spark, 0, 1000)
    b0.write.parquet(path)
    df = spark.read.parquet(path)
    from custom_python_etl_data_connector_shivaask_username_spark.plans.incremental_stats import (
        append_stats_partial as app,
    )

    app(b0, path, batch_id=0)
    stats, refreshed = refresh_stats_if_stale(spark, df, path, columns=["k"])
    assert refreshed and set(stats["columns"]) == {"k"}
    # second call: 'v' is tracked by the partials but untracked by
    # request — must NOT count as drift
    stats2, again = refresh_stats_if_stale(spark, df, path, columns=["k"])
    assert not again


def test_sampled_sidecar_skips_range_drift(spark, tmp_path):
    """X33 sample min/max are documented under-estimates; the
    partials' exact extremes sitting outside them is expected, not
    staleness."""
    path = str(tmp_path / "t")
    b0 = _mk(spark, 0, 50_000)
    b0.coalesce(1).write.parquet(path)
    df = spark.read.parquet(path)
    from custom_python_etl_data_connector_shivaask_username_spark.plans.incremental_stats import (
        append_stats_partial as app,
    )

    app(b0, path, batch_id=0)
    stats, refreshed = refresh_stats_if_stale(
        spark, df, path, sample_fraction=0.01
    )
    assert refreshed
    report = stats_staleness(
        spark, df, read_stats_sidecar(spark, path), table_path=path
    )
    assert report["range_drift"] == {}  # sampled: range signal off
    _, again = refresh_stats_if_stale(spark, df, path, sample_fraction=0.01)
    assert not again  # converged


def test_string_domain_drift_trips(spark, tmp_path):
    """A string key column gaining a lexicographically-outside value
    domain (the documented 'new tenant id' case) trips range_drift."""
    from pyspark.sql import functions as F

    from custom_python_etl_data_connector_shivaask_username_spark.plans.incremental_stats import (
        append_stats_partial as app,
    )

    path = str(tmp_path / "t")
    b0 = spark.createDataFrame(
        [("alpha", 1), ("mike", 2)], "tenant string, v int"
    )
    b0.write.parquet(path)
    df = spark.read.parquet(path)
    write_stats_sidecar(spark, path, collect_table_stats(df, path=path))
    app(b0, path, batch_id=0)
    app(
        spark.createDataFrame([("zulu", 3)], "tenant string, v int"),
        path,
        batch_id=1,
    )
    report = stats_staleness(
        spark, df, read_stats_sidecar(spark, path), table_path=path
    )
    assert report["range_drift"].get("tenant") == 1.0


def test_refresh_preserves_enrichments(spark, tmp_path):
    """A refresh must not silently demote the planner: histograms
    (same shape) and column groups re-apply to the fresh stats."""
    from custom_python_etl_data_connector_shivaask_username_spark.plans.column_groups import (
        collect_column_group_stats,
    )
    from custom_python_etl_data_connector_shivaask_username_spark.plans.stats import (
        add_equidepth_histograms,
        add_histograms,
    )

    path = str(tmp_path / "t")
    _mk(spark, 0, 2000).coalesce(1).write.parquet(path)
    df0 = spark.read.parquet(path)
    st = collect_table_stats(df0, path=path)
    st = add_histograms(df0, st, columns=["k"])
    st = add_equidepth_histograms(df0, st, columns=["v"])
    st = collect_column_group_stats(df0, st, [["k", "v"]])
    write_stats_sidecar(spark, path, st)
    _mk(spark, 2000, 6000).coalesce(1).write.mode("append").parquet(path)
    df1 = spark.read.parquet(path)
    fresh, refreshed = refresh_stats_if_stale(spark, df1, path)
    assert refreshed
    assert "counts" in fresh["columns"]["k"]["histogram"]  # equi-width
    assert "bounds" in fresh["columns"]["v"]["histogram"]  # equi-depth
    assert "k|v" in fresh["column_groups"]
    assert sum(fresh["columns"]["k"]["histogram"]["counts"]) == 6000


def test_refresh_preserves_hist2d(spark, tmp_path):
    """Round 12: X60 grids are enrichments too — a refresh re-collects
    every pair the old sidecar carried a hist2d for, over the CURRENT
    data (counts sum to the new row count), merged into the
    re-collected group entry."""
    from custom_python_etl_data_connector_shivaask_username_spark.plans.column_groups import (
        collect_histogram_2d,
    )

    path = str(tmp_path / "t")
    _mk(spark, 0, 2000).coalesce(1).write.parquet(path)
    df0 = spark.read.parquet(path)
    st = collect_table_stats(df0, path=path)
    st = collect_histogram_2d(df0, st, [["k", "v"]])
    write_stats_sidecar(spark, path, st)
    _mk(spark, 2000, 6000).coalesce(1).write.mode("append").parquet(path)
    df1 = spark.read.parquet(path)
    fresh, refreshed = refresh_stats_if_stale(spark, df1, path)
    assert refreshed
    h = fresh["column_groups"]["k|v"]["hist2d"]
    assert sum(h["counts"]) == 6000  # re-collected over the new data


def test_analyze_for_workload_collects_what_queries_price(spark, tmp_path):
    """Round-12 capstone: one call mines the workload and collects
    exactly the statistics its filters ask the planner to price —
    equi-depth histograms on every filtered column (single-column
    included), X37 group NDV for repeated eq-conjunctions, X60 grid
    for repeated range conjunctions — and writes the sidecar."""
    from pyspark.sql import functions as F

    from custom_python_etl_data_connector_shivaask_username_spark.plans.freshness import (
        analyze_for_workload,
    )
    from custom_python_etl_data_connector_shivaask_username_spark.plans.stats import (
        read_stats_sidecar,
    )

    path = str(tmp_path / "t")
    _mk(spark, 0, 4000).coalesce(1).write.parquet(path)
    df = spark.read.parquet(path)
    eq_q = df.filter((F.col("k") == 5) & (F.col("v") == 50.0))
    rng_q = df.filter(
        (F.col("k") >= 0) & (F.col("k") <= 100) & (F.col("v") <= 500.0)
    )
    single_q = df.filter(F.col("v") >= 100.0)
    stats = analyze_for_workload(
        spark, df, path, [eq_q, eq_q, rng_q, rng_q, single_q]
    )
    # filtered columns carry equi-depth histograms
    assert "bounds" in stats["columns"]["k"]["histogram"]
    assert "bounds" in stats["columns"]["v"]["histogram"]
    g = stats["column_groups"]["k|v"]
    assert g.get("ndv")  # X37 from the repeated eq-conjunction
    assert g.get("hist2d")  # X60 from the repeated range conjunction
    assert sum(g["hist2d"]["counts"]) == 4000
    # persisted: the sidecar round-trips the full enrichment set
    revived = read_stats_sidecar(spark, path)
    assert revived["column_groups"]["k|v"]["hist2d"]["buckets"] == \
        g["hist2d"]["buckets"]
