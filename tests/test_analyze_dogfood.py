"""ANALYZE-capstone dogfood (round 13, VERDICT r12 ask #5): run
`analyze_for_workload` over the ENGINE'S OWN 50-query registry workload
against the fixture tables, persist the mined sidecars into a writable
copy, and pin that the planner-routed queries plan
identically-or-better (exchange count ≤, answers byte-equal) from mined
statistics than from the in-session ANALYZE they use today.

This is the test of whether the X47/X60 miners surface what the
engine's own workload actually prices: the sidecar a production deploy
would maintain is exactly what `analyze_for_workload` writes here, and
`table_stats_cached` must SERVE it (freshness-gated) instead of paying
its own collection scan.
"""

from __future__ import annotations

import json

import pytest

from custom_python_etl_data_connector_shivaask_username_spark import registry, tables
from custom_python_etl_data_connector_shivaask_username_spark.plans.inspect import count_exchanges

registry.load_all()

PLANNER_ROUTED = [
    "q_revenue_by_nation",
    "q_customer_order_counts",
    "q_incremental_dedup",
    "q_lm_quality",
]


@pytest.fixture(scope="module")
def mined_dir(spark, sf_dir, tmp_path_factory):
    """A writable copy of the fixture tables with workload-mined
    sidecars persisted next to each — built once per module."""
    from custom_python_etl_data_connector_shivaask_username_spark.plans.freshness import analyze_for_workload

    out = str(tmp_path_factory.mktemp("mined_sf"))
    for t in tables.TABLES:
        tables.load_table(spark, sf_dir, t).write.parquet(
            f"{out}/{t}.parquet"
        )
    # the workload: every registry query's optimized plan (construction
    # only — no execution)
    plans = []
    for name, fn in registry.QUERIES.items():
        plans.append(
            str(fn(spark, sf_dir)._jdf.queryExecution().optimizedPlan())
        )
    mined = {}
    for t in tables.TABLES:
        st = analyze_for_workload(
            spark,
            tables.load_table(spark, out, t),
            f"{out}/{t}.parquet",
            plans,
        )
        mined[t] = {
            "hist_cols": sorted(
                c
                for c, cs in st.get("columns", {}).items()
                if cs.get("histogram")
            ),
            "groups": sorted(st.get("column_groups", {}).keys()),
        }
    return out, mined


def test_miner_chose_workload_relevant_statistics(mined_dir):
    """The mined sidecars must cover the columns the registry workload
    filters on — at minimum the revenue star's orders date predicate,
    the one statistic `q_revenue_by_nation`'s X36 fold prices every
    planning."""
    _out, mined = mined_dir
    assert "o_orderdate" in mined["orders"]["hist_cols"], mined["orders"]
    total_hists = sum(len(m["hist_cols"]) for m in mined.values())
    assert total_hists >= 3, mined  # the workload filters more than once


def test_sidecar_is_served_not_recollected(spark, mined_dir):
    """`table_stats_cached` against the mined copy must serve the
    persisted sidecar (it carries mined equi-depth histograms, which
    the in-memory fallback never collects) — proving the freshness
    gate accepts a just-written ANALYZE."""
    out, _mined = mined_dir
    tables._STATS_CACHE.pop((out, "orders"), None)
    st = tables.table_stats_cached(spark, out, "orders")
    h = st["columns"]["o_orderdate"].get("histogram")
    assert h and "bounds" in h, (
        "mined sidecar not served: o_orderdate lacks the equi-depth "
        "histogram analyze_for_workload persisted"
    )


@pytest.mark.parametrize("name", PLANNER_ROUTED)
def test_planner_routed_plans_identically_or_better_from_mined_stats(
    spark, sf_dir, mined_dir, name
):
    out, _mined = mined_dir
    # history isolation: measured cardinalities from other tests must
    # not mask what the mined statistics alone produce
    tables.session_history(out).clear()
    fn = registry.QUERIES[name]
    base = fn(spark, sf_dir)
    mined = fn(spark, out)
    assert count_exchanges(mined) <= count_exchanges(base), (
        f"{name}: mined statistics produced a worse plan"
    )
    brows = sorted(map(str, base.collect()))
    mrows = sorted(map(str, mined.collect()))
    assert mrows == brows, f"{name}: answers differ under mined stats"
