"""Cluster-size independence: the engine's determinism claim, pinned.

The repo's float aggregates go through exact-decimal accumulation
(`compat.py`) precisely so results do not depend on partition count or
reduction order. These tests re-run representative float-heavy queries
under different shuffle-partition settings and require BIT-IDENTICAL
results — the property that makes a 1000-executor run reproduce a
laptop run.
"""

from __future__ import annotations

import pytest

from custom_python_etl_data_connector_shivaask_username_spark.registry import (
    QUERIES,
    load_all,
)

load_all()

#: float-heavy queries whose reduction trees change most with partitioning
CASES = [
    "q1_pricing_summary",
    "q_revenue_by_nation",
    "q_embedding_centroids",
    "q_event_type_stats",
    "q_curation_mix",
]


def _rows(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    cols = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


@pytest.mark.parametrize("name", CASES)
def test_result_independent_of_shuffle_partitions(spark, sf_dir, name):
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = _rows(spark, sf_dir, name)
        spark.conf.set("spark.sql.shuffle.partitions", "29")
        b = _rows(spark, sf_dir, name)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    assert a == b
