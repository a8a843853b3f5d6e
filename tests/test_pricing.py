from __future__ import annotations

from custom_python_etl_data_connector_shivaask_username_spark.registry import (
    QUERIES,
    load_all,
)
from tests.oracle import assert_query_matches

load_all()


def test_q1_matches_oracle(spark, sf_dir):
    assert_query_matches(spark, sf_dir, "q1_pricing_summary")


def test_q1_shape(spark, sf_dir):
    df = QUERIES["q1_pricing_summary"](spark, sf_dir)
    rows = df.collect()
    assert len(rows) > 0
    assert rows[0]["count_order"] > 0
    # sorted by the group keys
    keys = [(r["l_returnflag"], r["l_linestatus"]) for r in rows]
    assert keys == sorted(keys)
