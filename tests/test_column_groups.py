"""X37 pins: column-group NDV kills the independence underestimate on
correlated eq-conjunctions; greedy cover composes groups with leftover
per-column NDV; the metadata-only filtered-stats twin stays sane."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from custom_python_etl_data_connector_shivaask_username_spark.plans.column_groups import (
    apply_eq_conjunction_to_stats,
    collect_column_group_stats,
    estimate_eq_conjunction_rows,
    group_key,
)
from custom_python_etl_data_connector_shivaask_username_spark.plans.stats import (
    collect_table_stats,
)


@pytest.fixture(scope="module")
def correlated(spark):
    # b is fully determined by a: ndv(a)=100, ndv(b)=10, but
    # ndv(a,b)=100 — independence overstates the denominator 10x
    df = spark.range(0, 10_000).select(
        (F.col("id") % 100).alias("a"),
        ((F.col("id") % 100) % 10).alias("b"),
        # c varies across the rows sharing an `a` (id // 100), so it
        # is genuinely independent of the (a, b) pair
        ((F.col("id") / 100).cast("long") % 4).alias("c"),
    )
    df.persist().count()
    yield df
    df.unpersist()


def test_group_ndv_corrects_correlated_eq(spark, correlated):
    base = collect_table_stats(correlated)
    stats = collect_column_group_stats(correlated, base, [["a", "b"]])
    g = stats["column_groups"][group_key(["a", "b"])]
    assert abs(g["ndv"] - 100) <= 10  # HLL++ ~5% rsd
    assert g["non_null"] == 10_000
    actual = correlated.filter((F.col("a") == 5) & (F.col("b") == 5)).count()
    assert actual == 100
    with_group = estimate_eq_conjunction_rows(stats, {"a": 5, "b": 5})
    independent = estimate_eq_conjunction_rows(base, {"a": 5, "b": 5})
    # the group estimate tracks truth; independence is ~10x under
    assert abs(with_group - actual) <= 0.15 * actual
    assert independent < actual / 5


def test_cover_composes_group_with_leftover_column(correlated):
    base = collect_table_stats(correlated)
    stats = collect_column_group_stats(correlated, base, [["a", "b"]])
    est = estimate_eq_conjunction_rows(stats, {"a": 5, "b": 5, "c": 1})
    actual = correlated.filter(
        (F.col("a") == 5) & (F.col("b") == 5) & (F.col("c") == 1)
    ).count()
    # group 1/100 for (a,b) times independence 1/4 for the leftover c
    assert abs(est - actual) <= max(5, 0.3 * actual), (est, actual)


def test_group_ndv_never_exceeds_independence_product(correlated):
    """ndv(group) <= prod(ndv) always, so the corrected estimate can
    only move UP toward truth, never below the independence floor."""
    base = collect_table_stats(correlated)
    stats = collect_column_group_stats(correlated, base, [["a", "b"]])
    assert estimate_eq_conjunction_rows(
        stats, {"a": 5, "b": 5}
    ) >= estimate_eq_conjunction_rows(base, {"a": 5, "b": 5})


def test_null_tuples_excluded_from_group(spark):
    df = spark.createDataFrame(
        [(1, 1), (1, 1), (2, None), (None, 3)], "a int, b int"
    )
    stats = collect_column_group_stats(
        df, collect_table_stats(df), [["a", "b"]]
    )
    g = stats["column_groups"]["a|b"]
    assert g["ndv"] == 1  # only the fully-present (1,1) tuple counts
    assert g["non_null"] == 2


def test_apply_eq_conjunction_to_stats_metadata_only(correlated):
    base = collect_table_stats(correlated)
    stats = collect_column_group_stats(correlated, base, [["a", "b"]])
    f = apply_eq_conjunction_to_stats(stats, {"a": 5, "b": 5})
    actual = correlated.filter((F.col("a") == 5) & (F.col("b") == 5)).count()
    assert abs(f["row_count"] - actual) <= 0.15 * actual
    assert f["columns"]["a"]["ndv"] == 1
    assert f["columns"]["a"]["min"] == f["columns"]["a"]["max"] == 5
    assert f["columns"]["c"]["ndv"] <= f["row_count"]
    assert "column_groups" not in f  # invalid post-filter


def test_group_validation(spark, correlated):
    base = collect_table_stats(correlated)
    with pytest.raises(ValueError, match=">= 2"):
        collect_column_group_stats(correlated, base, [["a"]])
    with pytest.raises(ValueError, match="absent"):
        collect_column_group_stats(correlated, base, [["a", "zzz"]])
    assert collect_column_group_stats(correlated, base, []) is base


def test_eq_outside_range_estimates_zero(correlated):
    """A value the stats PROVE impossible (outside min/max) caps the
    conjunction at 0 — while an in-range point on the min/max
    fallback models equality (rows-per-value), never 0."""
    base = collect_table_stats(correlated)
    stats = collect_column_group_stats(correlated, base, [["a", "b"]])
    assert estimate_eq_conjunction_rows(stats, {"a": 5, "b": 12345}) == 0.0
    assert estimate_eq_conjunction_rows(stats, {"a": -7, "b": 5}) == 0.0
    inside = estimate_eq_conjunction_rows(stats, {"a": 5, "b": 5})
    assert inside > 0


def test_sampled_stats_never_prove_zero(correlated):
    """Sampled min/max are under-estimates (X33): a value outside
    them is NOT proven impossible, so the zero cap must not fire and
    fabricate a broadcastable row_count=0 table."""
    from custom_python_etl_data_connector_shivaask_username_spark.plans.stats import (
        collect_table_stats_sampled,
    )

    stats = collect_table_stats_sampled(correlated, 0.05)
    # a value just beyond the sampled max of `a` (true range is 0..99;
    # force the out-of-sampled-range case deterministically)
    beyond = stats["columns"]["a"]["max"] + 1
    est = estimate_eq_conjunction_rows(stats, {"a": beyond})
    assert est > 0  # no reduction-to-zero from unreliable bounds
    # exact stats still prove zero
    exact = collect_table_stats(correlated)
    assert estimate_eq_conjunction_rows(exact, {"a": 12345}) == 0.0


def test_suggest_column_groups_mines_workload(spark, correlated):
    """Round 9: the planted correlated workload — three queries
    conjoining a=.. AND b=.., one conjoining a AND c once, plenty of
    single-column filters — must surface exactly the (a, b) group;
    the suggestion then feeds collect_column_group_stats and beats
    independence, closing the loop from query log to better plans."""
    from custom_python_etl_data_connector_shivaask_username_spark.plans.column_groups import (
        filter_eq_conjunctions,
        suggest_column_groups,
    )

    workload = [
        correlated.filter((F.col("a") == 5) & (F.col("b") == 5)),
        correlated.filter((F.col("a") == 7) & (F.col("b") == 7)),
        # reversed conjunct order still votes for the same sorted set
        correlated.filter((F.col("b") == 3) & (F.col("a") == 3)),
        correlated.filter((F.col("a") == 1) & (F.col("c") == 1)),  # once
        correlated.filter(F.col("a") == 9),   # single column: no vote
        correlated.filter(F.col("c") == 2),
        # join conditions and isnotnull guards must NOT vote
        correlated.alias("x").join(
            correlated.alias("y").select(F.col("a").alias("a2")),
            F.col("a") == F.col("a2"),
        ),
    ]
    got = suggest_column_groups(workload, min_count=2)
    assert got and got[0]["columns"] == ["a", "b"]
    assert got[0]["count"] == 3
    # the once-seen (a, c) conjunction is below min_count
    assert ["a", "c"] not in [g["columns"] for g in got]
    # plan STRINGS from an offline log work identically
    plans = [
        str(df._jdf.queryExecution().optimizedPlan()) for df in workload
    ]
    assert suggest_column_groups(plans, min_count=2) == got
    # single-column filters yield no conjunctions at all
    solo = str(
        workload[4]._jdf.queryExecution().optimizedPlan()
    )
    assert filter_eq_conjunctions(solo) == []
    # close the loop: the mined group corrects the estimate
    base = collect_table_stats(correlated)
    stats = collect_column_group_stats(
        correlated, base, [g["columns"] for g in got[:1]]
    )
    actual = correlated.filter(
        (F.col("a") == 5) & (F.col("b") == 5)
    ).count()
    with_group = estimate_eq_conjunction_rows(stats, {"a": 5, "b": 5})
    independent = estimate_eq_conjunction_rows(base, {"a": 5, "b": 5})
    assert abs(with_group - actual) <= 0.15 * actual
    assert independent < actual / 5


def test_disjunctions_do_not_vote(spark, correlated):
    """Round-9 advisory: `(a = 5) OR (b = 3)` is not conjunction
    evidence — a Filter containing a disjunction must not vote, or
    suggest_column_groups recommends ANALYZE passes for column sets
    the workload never actually conjoins."""
    from custom_python_etl_data_connector_shivaask_username_spark.plans.column_groups import (
        filter_eq_conjunctions,
        suggest_column_groups,
    )

    ors = [
        correlated.filter((F.col("a") == 5) | (F.col("b") == 3)),
        correlated.filter((F.col("a") == 7) | (F.col("b") == 1)),
        correlated.filter((F.col("a") == 2) | (F.col("c") == 4)),
    ]
    for df in ors:
        plan = str(df._jdf.queryExecution().optimizedPlan())
        assert " OR " in plan  # the scenario is real in this plan dialect
        assert filter_eq_conjunctions(plan) == []
    assert suggest_column_groups(ors, min_count=2) == []
    # and a true conjunction alongside the ORs still surfaces alone
    mixed = ors + [
        correlated.filter((F.col("a") == 5) & (F.col("b") == 5)),
        correlated.filter((F.col("a") == 7) & (F.col("b") == 7)),
    ]
    got = suggest_column_groups(mixed, min_count=2)
    assert [g["columns"] for g in got] == [["a", "b"]]
