"""Driver-contract guards.

Round-1 lessons encoded as tests:
- the driver checks at most the first 50 registered queries, so the
  registry must never exceed 50 (consolidate, don't spill);
- the driver's canonicalizer sorts result cells with pandas, which
  cannot hash ARRAY/MAP/STRUCT cells (two round-1 queries errored) —
  every registered query must return only atomic columns.
"""

from __future__ import annotations

import pytest

from pyspark.sql import types as T

from custom_python_etl_data_connector_shivaask_username_spark.registry import (
    ORACLE,
    QUERIES,
    load_all,
)

load_all()

DRIVER_CHECK_WINDOW = 50

_ATOMIC = (
    T.NumericType,
    T.StringType,
    T.BooleanType,
    T.DateType,
    T.TimestampType,
    T.TimestampNTZType,
    T.BinaryType,
)


def test_registry_fits_driver_check_window():
    assert len(QUERIES) <= DRIVER_CHECK_WINDOW, (
        f"{len(QUERIES)} queries registered; the driver only checks the "
        f"first {DRIVER_CHECK_WINDOW} — consolidate before adding more"
    )


def test_every_oracle_has_a_query():
    assert set(ORACLE) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_result_schema_is_atomic(spark, sf_dir, name):
    # schema resolution only (no execution) for batch queries; streaming
    # registry entries execute on .schema access via their builder, so
    # they are covered by the oracle suite instead
    if name.startswith(("q_stream", "q_funnel")):
        pytest.skip("streaming query schemas are checked in the oracle suite")
    df = QUERIES[name](spark, sf_dir)
    for f in df.schema.fields:
        assert isinstance(f.dataType, _ATOMIC), (
            f"{name}.{f.name} is {f.dataType.simpleString()} — serialize "
            "complex columns (concat_ws/to_json) before returning"
        )
