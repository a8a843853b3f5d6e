"""X26 drift-monitor pins: identical distributions read stable, a
shifted batch reads action, PSI is symmetric-ish in magnitude ordering,
and the score is bit-stable under repartitioning."""

from __future__ import annotations

from pyspark.sql import functions as F

from custom_python_etl_data_connector_shivaask_username_spark.operators.drift import (
    drift_psi,
    freeze_histogram,
)


def _vals(spark, xs):
    return spark.createDataFrame([(float(x),) for x in xs], ["v"])


def test_same_distribution_is_stable(spark):
    ref = _vals(spark, [i % 100 for i in range(2000)])
    spec, shares = freeze_histogram(ref, "v", n_buckets=10)
    batch = _vals(spark, [(i * 7) % 100 for i in range(1500)])  # same uniform
    row = drift_psi(batch, spec, shares).first()
    assert row["status"] == "stable"
    assert row["psi"] < 0.05


def test_shifted_batch_triggers_action(spark):
    ref = _vals(spark, [i % 100 for i in range(2000)])
    spec, shares = freeze_histogram(ref, "v", n_buckets=10)
    # mass collapses into the top decile — a hard upstream change
    batch = _vals(spark, [90 + (i % 10) for i in range(1500)])
    row = drift_psi(batch, spec, shares).first()
    assert row["status"] == "action"
    assert row["psi"] > 0.25


def test_mild_shift_reads_between(spark):
    ref = _vals(spark, [i % 100 for i in range(4000)])
    spec, shares = freeze_histogram(ref, "v", n_buckets=10)
    # 75% same uniform + 25% concentrated: a lean, not a collapse
    batch = _vals(
        spark,
        [i % 100 for i in range(3000)] + [95] * 1000,
    )
    row = drift_psi(batch, spec, shares).first()
    assert row["psi"] > 0.05
    mild = drift_psi(
        _vals(spark, [i % 100 for i in range(3000)] + [95] * 150),
        spec,
        shares,
    ).first()
    assert mild["psi"] < row["psi"]  # monotone in contamination mass


def test_out_of_range_values_clamp_to_edge_buckets(spark):
    ref = _vals(spark, range(100))
    spec, shares = freeze_histogram(ref, "v", n_buckets=5)
    batch = _vals(spark, [-50.0] * 10 + [500.0] * 10)  # beyond frozen bounds
    row = drift_psi(batch, spec, shares).first()
    assert row["psi"] is not None and row["status"] == "action"


def test_psi_bit_stable_under_repartitioning(spark):
    ref = _vals(spark, [(i * 13) % 100 for i in range(3000)])
    spec, shares = freeze_histogram(ref, "v", n_buckets=10)
    batch = _vals(spark, [(i * 29) % 100 for i in range(2500)] + [99] * 400)
    a = drift_psi(batch, spec, shares).first()["psi"]
    b = drift_psi(
        batch.repartition(11), spec, _bucket_shuffled(shares)
    ).first()["psi"]
    assert a == b  # quantized LN + decimal sum: layout-free


def _bucket_shuffled(shares):
    return shares.repartition(3)


def test_empty_batch_reads_no_data_not_action(spark):
    """An idle ingest tick (empty micro-batch) must not page anyone:
    psi is NULL and status says no_data, never 'action'."""
    ref = _vals(spark, range(100))
    spec, shares = freeze_histogram(ref, "v", n_buckets=5)
    empty = spark.createDataFrame([], "v double")
    row = drift_psi(empty, spec, shares).first()
    assert row["psi"] is None
    assert row["status"] == "no_data"
