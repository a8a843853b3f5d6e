"""Unit pins for q_approx_sketches — the rows-only sketch/sample suite.

Accuracy is checked against the exact oracle-bearing queries, so the
weaker driver check (rows-only) is backed by statistical bounds here.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from custom_python_etl_data_connector_shivaask_username_spark.operators.aggregates import (
    exact_percentiles_twopass,
    q_approx_sketches,
)
from custom_python_etl_data_connector_shivaask_username_spark.registry import (
    QUERIES,
    load_all,
)
from custom_python_etl_data_connector_shivaask_username_spark.tables import load_table

load_all()


def _sketches(spark, sf_dir):
    # no longer a standalone registry row (driver-visible via the
    # 'sketch' branch of q_lsh_suite); pins run the operator directly
    return q_approx_sketches(spark, sf_dir).collect()


def test_approx_distinct_within_rsd(spark, sf_dir):
    approx = {r["event_type"]: r["approx_users"] for r in _sketches(spark, sf_dir)}
    exact = {
        r["event_type"]: r["exact_users"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact_users"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k, e in exact.items():
        # rsd=0.01 → generous 5% guard band
        assert abs(approx[k] - e) <= max(2, 0.05 * e), (k, approx[k], e)


def test_sampled_columns_deterministic(spark, sf_dir):
    a = _sketches(spark, sf_dir)
    b = _sketches(spark, sf_dir)
    assert a == b
    total = sum(r["sampled_count"] for r in a)
    # fraction 0.1 of 1000 events at sf0.001 → loose binomial bounds
    assert 40 <= total <= 200


def test_approx_percentiles_close_to_exact(spark, sf_dir):
    approx = {
        r["event_type"]: (r["p50_approx"], r["p95_approx"], r["p99_approx"])
        for r in _sketches(spark, sf_dir)
    }
    exact = {
        r["event_type"]: (r["p50"], r["p95"], r["p99"])
        for r in QUERIES["q_event_type_stats"](spark, sf_dir).collect()
    }
    # p99 at tiny group sizes (~200 rows at sf0.001) lands on a neighboring
    # order statistic in a heavy tail — wide tolerance there is expected.
    tolerances = (0.15, 0.15, 0.60)
    for k in exact:
        for a, e, tol in zip(approx[k], exact[k], tolerances):
            assert abs(a - e) <= max(2.0, tol * e), (k, approx[k], exact[k])


def test_heavy_hitters_finds_planted_zipf_head(spark):
    """Planted skew: 5 hot items dominate a 2000-key uniform tail. The
    MG-candidates + exact-verify pipeline returns the true top-5 with
    exact counts (bounded summaries can only widen the candidate set,
    never corrupt a count)."""
    from custom_python_etl_data_connector_shivaask_username_spark.operators.aggregates import (
        heavy_hitters,
    )

    hot = {900_001: 5000, 900_002: 4000, 900_003: 3000, 900_004: 2000, 900_005: 1500}
    df = spark.range(40_000).select((F.col("id") % 2000).alias("item"))
    for item, n in hot.items():
        df = df.unionAll(
            spark.range(n).select(F.lit(item).cast("long").alias("item"))
        )
    df = df.repartition(8)  # hot items spread over every partition

    got = [(r["item"], r["count"]) for r in heavy_hitters(df, "item", k=5).collect()]
    assert got == sorted(hot.items(), key=lambda kv: (-kv[1], kv[0]))


def test_heavy_hitters_exact_counts_match_groupby(spark):
    """Whatever the candidate set, returned counts are EXACT — equal to
    the full groupBy's counts for the same items."""
    from custom_python_etl_data_connector_shivaask_username_spark.operators.aggregates import (
        heavy_hitters,
    )

    df = spark.range(10_000).select(
        ((F.col("id") * 2654435761) % 50).alias("item")
    ).repartition(4)
    exact = {
        r["item"]: r["cnt"]
        for r in df.groupBy("item").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    for r in heavy_hitters(df, "item", k=10).collect():
        assert r["count"] == exact[r["item"]]


def test_heavy_hitters_string_items_and_small_data(spark):
    from custom_python_etl_data_connector_shivaask_username_spark.operators.aggregates import (
        heavy_hitters,
    )

    df = spark.createDataFrame(
        [("a",)] * 7 + [("b",)] * 3 + [("c",)] * 1, "item_s STRING"
    )
    got = [(r["item"], r["count"]) for r in heavy_hitters(df, "item_s", k=2).collect()]
    assert got == [("a", 7), ("b", 3)]


def test_heavy_hitters_null_item_can_win(spark):
    """NULL is a legal item (often the most frequent value in dirty
    data): it must enter the summaries (dropna=False), survive the
    null-safe semi join, and rank by its exact count."""
    from custom_python_etl_data_connector_shivaask_username_spark.operators.aggregates import (
        heavy_hitters,
    )

    rows = [(None,)] * 60 + [("a",)] * 25 + [("b",)] * 15
    df = spark.createDataFrame(rows, "item_s STRING").repartition(4)
    got = [
        (r["item"], r["count"]) for r in heavy_hitters(df, "item_s", k=3).collect()
    ]
    assert got == [(None, 60), ("a", 25), ("b", 15)]


# --- exact_percentiles_twopass: bounded-memory A4 (round 7) ---------------


def test_twopass_percentiles_match_builtin_percentile(spark, sf_dir):
    """The bounded two-pass operator must return the identical
    interpolated values as Spark's exact (unbounded-buffer)
    ``percentile()`` on real data."""
    ev = load_table(spark, sf_dir, "events")
    builtin = {
        (r["event_type"], q): r["p"][i]
        for r in ev.groupBy("event_type")
        .agg(F.expr("percentile(value, array(0.5D, 0.95D, 0.99D))").alias("p"))
        .collect()
        for i, q in enumerate((0.5, 0.95, 0.99))
    }
    twopass = {
        (r["event_type"], r["q"]): r["p"]
        for r in exact_percentiles_twopass(
            ev, "event_type", "value", (0.5, 0.95, 0.99)
        ).collect()
    }
    assert set(twopass) == set(builtin)
    for k, v in builtin.items():
        assert abs(twopass[k] - v) <= 1e-9, (k, twopass[k], v)


def test_twopass_percentiles_degenerate_and_tiny_groups(spark):
    """All-equal group (one bucket, one distinct-value row), a 1-row
    group (r=0 → lo==hi), and a 2-row group (pure interpolation)."""
    rows = (
        [("a", 7.0)] * 100
        + [("b", 42.5)]
        + [("c", 10.0), ("c", 20.0)]
    )
    df = spark.createDataFrame(rows, "g string, v double")
    got = {
        (r["g"], r["q"]): r["p"]
        for r in exact_percentiles_twopass(df, "g", "v", (0.5, 0.95)).collect()
    }
    assert got[("a", 0.5)] == 7.0 and got[("a", 0.95)] == 7.0
    assert got[("b", 0.5)] == 42.5 and got[("b", 0.95)] == 42.5
    # 2 rows: r = q*(2-1) = q → 10 + (20-10)*q
    assert abs(got[("c", 0.5)] - 15.0) <= 1e-12
    assert abs(got[("c", 0.95)] - 19.5) <= 1e-12


def test_twopass_percentiles_null_values_ignored(spark):
    df = spark.createDataFrame(
        [("a", None), ("a", 1.0), ("a", 3.0), ("a", None)],
        "g string, v double",
    )
    got = {
        r["q"]: r["p"]
        for r in exact_percentiles_twopass(df, "g", "v", (0.5,)).collect()
    }
    assert abs(got[0.5] - 2.0) <= 1e-12


def test_twopass_percentiles_wide_range_bounded_driver(spark):
    """Round-8 hardening (round-7 verdict finding #1): a column spanning
    ≥1e9 must NOT collect range-many histogram rows — the adaptive
    bucket geometry (min/max pre-agg → width = range/max_buckets) keeps
    the pass-1 driver collect ≤ (max_buckets+2) × groups and the answer
    exact."""
    from custom_python_etl_data_connector_shivaask_username_spark.operators import aggregates as agg

    # two groups, values spanning 2e9, irregular spacing so buckets are
    # unevenly occupied and interpolation lands between distinct values
    rows = [("a", float(i) * 2_000_000.0 + (i % 7)) for i in range(1001)]
    rows += [("b", float(i * i) * 181.0 - 1e9) for i in range(800)]
    df = spark.createDataFrame(rows, "g string, v double")
    qs = (0.5, 0.95, 0.99)
    builtin = {
        (r["g"], q): r["p"][i]
        for r in df.groupBy("g")
        .agg(F.expr("percentile(v, array(0.5D, 0.95D, 0.99D))").alias("p"))
        .collect()
        for i, q in enumerate(qs)
    }
    got = {
        (r["g"], r["q"]): r["p"]
        for r in exact_percentiles_twopass(df, "g", "v", qs).collect()
    }
    assert set(got) == set(builtin)
    for k, v in builtin.items():
        # exact order statistics → agreement to relative ulp scale
        assert abs(got[k] - v) <= 1e-6 * max(1.0, abs(v)), (k, got[k], v)
    # the boundedness pin itself: collected histogram rows stay under
    # the geometric cap despite the 2e9 value range
    assert agg.LAST_TWOPASS_STATS["hist_rows"] <= (agg.MAX_PCT_BUCKETS + 2) * 2
    assert agg.LAST_TWOPASS_STATS["bucket_width"] > 1.0  # adapted, not 1.0


def test_twopass_percentiles_explicit_width_is_rebucketed(spark):
    """An explicit bucket_width that would explode the histogram
    (range/width ≫ max_buckets) is re-derived instead of honored —
    the driver bound holds for every call site."""
    from custom_python_etl_data_connector_shivaask_username_spark.operators import aggregates as agg

    rows = [("a", float(i) * 1e6) for i in range(2000)]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {
        r["q"]: r["p"]
        for r in exact_percentiles_twopass(
            df, "g", "v", (0.5,), bucket_width=1e-3, max_buckets=1024
        ).collect()
    }
    assert abs(got[0.5] - (1999e6 / 2)) <= 1e-3
    assert agg.LAST_TWOPASS_STATS["hist_rows"] <= 1024 + 2
    # a sane explicit width (within 4×max_buckets buckets) is honored
    exact_percentiles_twopass(
        df, "g", "v", (0.5,), bucket_width=1e6, max_buckets=4096
    ).collect()
    assert agg.LAST_TWOPASS_STATS["bucket_width"] == 1e6


def test_twopass_percentiles_null_group_key_and_nan_values(spark):
    """ADVICE r7 (medium): NULL group keys are a legitimate group
    (matched null-safely in pass 2); NaN values are dropped like NULLs
    (floor(NaN) would land in a null bucket and break rank lookup)."""
    rows = [
        (None, 1.0), (None, 2.0), (None, 3.0),
        ("a", 10.0), ("a", float("nan")), ("a", 30.0),
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {
        (r["g"], r["q"]): r["p"]
        for r in exact_percentiles_twopass(df, "g", "v", (0.5,)).collect()
    }
    assert abs(got[(None, 0.5)] - 2.0) <= 1e-12
    # NaN excluded → two values left → median interpolates to 20
    assert abs(got[("a", 0.5)] - 20.0) <= 1e-12


def test_event_type_stats_left_join_keeps_all_null_value_groups(spark):
    """ADVICE r7: a group whose `value` column is entirely NULL must
    still appear in the stats with NULL percentiles (LEFT join), not be
    dropped by the pcts join."""
    import os
    import tempfile

    from custom_python_etl_data_connector_shivaask_username_spark.operators.aggregates import q_event_type_stats

    with tempfile.TemporaryDirectory() as d:
        ev = spark.createDataFrame(
            [
                ("u1", "click", 5.0, "2024-01-01T00:00:00"),
                ("u2", "click", 7.0, "2024-01-01T00:01:00"),
                ("u3", "ghost", None, "2024-01-01T00:02:00"),
            ],
            "user_id string, event_type string, value double, ts string",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        ev.write.parquet(os.path.join(d, "events.parquet"))
        out = {r["event_type"]: r for r in q_event_type_stats(spark, d).collect()}
        assert set(out) == {"click", "ghost"}
        assert out["ghost"]["p50"] is None
        assert out["ghost"]["event_count"] == 1
        assert abs(out["click"]["p50"] - 6.0) <= 1e-9
