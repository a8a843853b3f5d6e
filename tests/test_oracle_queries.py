"""Differential test: every oracle-declared query matches DuckDB exactly.

This mirrors the driver's t2 gate (at sf0.001 for speed; the driver runs
sf0.01). New operators get covered automatically on registration.
"""

from __future__ import annotations

import pytest

from custom_python_etl_data_connector_shivaask_username_spark.registry import (
    ORACLE,
    QUERIES,
    load_all,
)
from tests.oracle import assert_query_matches

load_all()


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_query_matches_oracle(spark, sf_dir, name):
    assert_query_matches(spark, sf_dir, name)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLE)))
def test_rows_only_query_runs(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
