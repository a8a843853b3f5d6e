"""X62 pins (round 13): the aggregate navigator.

Routing decisions are evidence-driven and the two paths are
bit-identical: a fresh store serves the aggregate from metadata-scale
partials (the plan scans the STORE, never the raw table), a stale or
too-fine store falls back to the raw computation, and both produce the
same rows in the same schema.
"""

from __future__ import annotations

import pytest

from custom_python_etl_data_connector_shivaask_username_spark.operators.rollup import refresh_rollup
from custom_python_etl_data_connector_shivaask_username_spark.plans.inspect import formatted_plan
from custom_python_etl_data_connector_shivaask_username_spark.plans.matview import (
    _compute_from_raw,
    route_event_rollup,
)
from custom_python_etl_data_connector_shivaask_username_spark.tables import load_table


def _rows(df):
    return sorted(map(str, df.collect()))


@pytest.fixture(scope="module")
def fresh_store(spark, sf_dir, tmp_path_factory):
    """An hour-grain store holding exactly the fixture events feed."""
    store = str(tmp_path_factory.mktemp("mv") / "store")
    refresh_rollup(
        load_table(spark, sf_dir, "events"), store, batch_id=0,
        resolution="hour",
    )
    return store


def test_fresh_store_serves_and_matches_raw(spark, sf_dir, fresh_store):
    df, route = route_event_rollup(
        spark, sf_dir, fresh_store, resolution="day"
    )
    assert route == "store"
    plan = formatted_plan(df)
    assert "events.parquet" not in plan, (
        "served plan must scan the store's partials, not the raw table"
    )
    assert _rows(df) == _rows(_compute_from_raw(spark, sf_dir, "day")), (
        "store-served and raw-computed answers must be bit-identical"
    )


def test_filters_apply_on_the_served_path(spark, sf_dir, fresh_store):
    import datetime as dt

    lo = dt.datetime(2024, 1, 10)  # mid-range: the filter really prunes
    df, route = route_event_rollup(
        spark,
        sf_dir,
        fresh_store,
        resolution="day",
        time_range=(lo, None),
        event_types=["view", "click"],
    )
    assert route == "store"
    raw = _compute_from_raw(spark, sf_dir, "day").filter(
        "window_start >= timestamp'2024-01-10' "
        "AND event_type IN ('view','click')"
    )
    assert 0 < df.count() < _compute_from_raw(spark, sf_dir, "day").count()
    assert _rows(df) == _rows(raw)


def test_stale_store_falls_back_to_raw(spark, sf_dir, tmp_path):
    """A store missing part of the feed (delivered from a filtered
    batch) fails the Σcnt-vs-stats freshness gate and the router
    computes from raw — answers equal the direct computation."""
    store = str(tmp_path / "store")
    ev = load_table(spark, sf_dir, "events")
    refresh_rollup(
        ev.filter("event_type = 'view'"), store, batch_id=0,
        resolution="hour",
    )
    df, route = route_event_rollup(
        spark, sf_dir, store, resolution="day"
    )
    assert route == "raw"
    assert _rows(df) == _rows(_compute_from_raw(spark, sf_dir, "day"))


def test_finer_than_stored_grain_falls_back(spark, sf_dir, tmp_path):
    """Day-grain partials cannot answer an hour-grain ask — the
    navigator routes to raw instead of serving a meaningless merge."""
    store = str(tmp_path / "store")
    refresh_rollup(
        load_table(spark, sf_dir, "events"), store, batch_id=0,
        resolution="day",
    )
    df, route = route_event_rollup(
        spark, sf_dir, store, resolution="hour"
    )
    assert route == "raw"
    assert _rows(df) == _rows(_compute_from_raw(spark, sf_dir, "hour"))


def test_missing_store_falls_back(spark, sf_dir, tmp_path):
    df, route = route_event_rollup(
        spark, sf_dir, str(tmp_path / "nope"), resolution="day"
    )
    assert route == "raw"
    assert len(df.take(1)) == 1
