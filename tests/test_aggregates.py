"""Unit pins for q_approx_sketches — the rows-only sketch/sample suite.

Accuracy is checked against the exact oracle-bearing queries, so the
weaker driver check (rows-only) is backed by statistical bounds here.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from custom_python_etl_data_connector_shivaask_username_spark.operators.aggregates import (
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
        for r in QUERIES["q_value_percentiles"](spark, sf_dir).collect()
    }
    # p99 at tiny group sizes (~200 rows at sf0.001) lands on a neighboring
    # order statistic in a heavy tail — wide tolerance there is expected.
    tolerances = (0.15, 0.15, 0.60)
    for k in exact:
        for a, e, tol in zip(approx[k], exact[k], tolerances):
            assert abs(a - e) <= max(2.0, tol * e), (k, approx[k], exact[k])
