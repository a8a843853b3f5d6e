"""X56 dogfood loop, end-to-end (round 13, VERDICT r12 ask #4).

Round 12 shipped the history machinery but nothing outside tests ever
called it — `grep history=` over operators/ came back empty, so dogfood
traffic never populated or consumed the store. Round 13 closes the
loop: `plan_star_join(history="session")` reads the per-sf_dir session
store, `tables.harvest_executed` writes ACTUAL executed-plan join
cardinalities into it (key-column-set mapping, inner folds only), the
bench warm runs call the harvester, and `q_revenue_by_nation` plans
with `history="session"`.

The pin here is the verdict's literal done-condition: the second
construction of q_revenue_by_nation plans FROM HISTORY (spy sees
fresh_edge_rows serve measured values) with ZERO probes, and the query
rows are unchanged.
"""

from __future__ import annotations

import pytest

from custom_python_etl_data_connector_shivaask_username_spark import registry, tables


@pytest.fixture(scope="module", autouse=True)
def _load():
    registry.load_all()


def test_revenue_star_second_run_plans_from_harvested_history(
    spark, sf_dir
):
    import custom_python_etl_data_connector_shivaask_username_spark.plans.history as H
    import custom_python_etl_data_connector_shivaask_username_spark.plans.stats as S

    # isolate: no leftover measurements or pending folds from other
    # tests against the same fixture dir
    tables.session_history(sf_dir).clear()
    tables._PENDING_FOLDS.pop(sf_dir, None)

    fn = registry.QUERIES["q_revenue_by_nation"]
    df1 = fn(spark, sf_dir)
    rows1 = df1.collect()
    harvested = tables.harvest_executed(spark, df1, sf_dir)
    assert harvested >= 1, (
        "the executed revenue star must yield at least one measurable "
        "inner fold"
    )
    hist = tables.session_history(sf_dir)
    assert hist and all(
        v["source"] == "executed" and v["rows"] > 0 for v in hist.values()
    ), hist

    served: list[float] = []
    probes: list[int] = []
    orig_fresh = H.fresh_edge_rows
    orig_probe = S.probe_join_rows

    def fresh_spy(*a, **k):
        r = orig_fresh(*a, **k)
        if r is not None:
            served.append(r)
        return r

    def probe_spy(*a, **k):
        probes.append(1)
        return orig_probe(*a, **k)

    H.fresh_edge_rows = fresh_spy
    S.probe_join_rows = probe_spy
    try:
        df2 = fn(spark, sf_dir)
        assert served, (
            "second construction must plan from the harvested history"
        )
        assert probes == [], "history-served planning must not probe"
        rows2 = df2.collect()
    finally:
        H.fresh_edge_rows = orig_fresh
        S.probe_join_rows = orig_probe
    assert rows2 == rows1, "history must never change query answers"


def test_harvest_skips_ambiguous_and_zero_row_folds(spark, sf_dir):
    """A colset claimed by two different history keys (same edge under
    different filter digests) is poisonable and must never harvest;
    joins whose metric reads 0 are indistinguishable from not-executed
    and must be skipped."""
    tables.session_history(sf_dir).clear()
    tables._PENDING_FOLDS.pop(sf_dir, None)

    edge = [("nation", "n_regionkey", "region", "r_regionkey")]
    j1, _ = tables.plan_star_join(spark, sf_dir, edge, history="session")
    # same edge, different filter digest → the pending fold turns
    # ambiguous
    j2, _ = tables.plan_star_join(
        spark,
        sf_dir,
        edge,
        filters={"region": ("r_name", ("=", "EUROPE"))},
        history="session",
    )
    j1.collect()
    assert tables.harvest_executed(spark, j1, sf_dir) == 0
    assert tables.session_history(sf_dir) == {}

    # unexecuted frame: all metrics 0 → nothing recorded, no throw
    tables._PENDING_FOLDS.pop(sf_dir, None)
    j3, _ = tables.plan_star_join(spark, sf_dir, edge, history="session")
    assert tables.harvest_executed(spark, j3, sf_dir) == 0
    assert tables.session_history(sf_dir) == {}


def test_fold_ambiguity_is_sticky_for_the_session(spark, sf_dir):
    """Round-13 advisor finding: re-planning the FIRST query after a
    second query marked the colset ambiguous used to overwrite the
    entry with ambiguous=False — a later harvest of the SECOND query's
    executed frame (same key-column set) would then record its
    cardinality under the FIRST query's filter-digest key, poisoning
    the history. Ambiguity must survive re-planning; only
    invalidate_table_cache clears it."""
    tables.session_history(sf_dir).clear()
    tables._PENDING_FOLDS.pop(sf_dir, None)

    edge = [("nation", "n_regionkey", "region", "r_regionkey")]
    filt = {"region": ("r_name", ("=", "EUROPE"))}
    tables.plan_star_join(spark, sf_dir, edge, history="session")
    j2, _ = tables.plan_star_join(
        spark, sf_dir, edge, filters=filt, history="session"
    )
    # re-plan the FIRST (unfiltered) query: the entry must stay
    # ambiguous, and harvesting the SECOND query's executed frame must
    # record nothing
    tables.plan_star_join(spark, sf_dir, edge, history="session")
    pend = tables._PENDING_FOLDS[sf_dir]
    assert all(v["ambiguous"] for v in pend.values()), pend
    j2.collect()
    assert tables.harvest_executed(spark, j2, sf_dir) == 0
    assert tables.session_history(sf_dir) == {}

    # the sanctioned reset clears the mark (and the stats memo)
    tables.invalidate_table_cache(sf_dir)
    assert sf_dir not in tables._PENDING_FOLDS
    assert not any(k[0] == sf_dir for k in tables._STATS_CACHE)
    j4, _ = tables.plan_star_join(spark, sf_dir, edge, history="session")
    j4.collect()
    assert tables.harvest_executed(spark, j4, sf_dir) == 1
    hist = tables.session_history(sf_dir)
    assert hist and all(v["source"] == "executed" for v in hist.values())
    tables.session_history(sf_dir).clear()
    tables._PENDING_FOLDS.pop(sf_dir, None)
