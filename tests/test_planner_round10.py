"""Round-10 planner integration pins: multi-column conjunction filters
routed through X37 group statistics in `plan_star_join`, and the
self-dispatching X41 probe (`probe="auto"`) — the planner measures only
when its own models demonstrably disagree."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from custom_python_etl_data_connector_shivaask_username_spark.plans.column_groups import (
    collect_column_group_stats,
)
from custom_python_etl_data_connector_shivaask_username_spark.plans.stats import (
    collect_table_stats,
    write_stats_sidecar,
)
from custom_python_etl_data_connector_shivaask_username_spark.tables import (
    plan_star_join,
)


def _plant_correlated_star(spark, root: str) -> None:
    """fact ⋈ d1 ⋈ d2 where d1 carries a PERFECTLY correlated (a, b)
    pair: independence says a=5 AND b=5 keeps 40k/10000 = 4 rows; the
    group NDV says 40k/100 = 400. d2's single filter keeps 150."""
    fact = spark.range(0, 100_000).select(
        (F.col("id") % 40_000).alias("fk1"),
        (F.col("id") % 30_000).alias("fk2"),
    )
    d1 = spark.range(0, 40_000).select(
        F.col("id").alias("k1"),
        (F.col("id") % 100).alias("a"),
        (F.col("id") % 100).alias("b"),  # b == a: the planted correlation
    )
    d2 = spark.range(0, 30_000).select(
        F.col("id").alias("k2"), (F.col("id") % 200).alias("c")
    )
    fact.write.parquet(f"{root}/fact.parquet")
    d1.write.parquet(f"{root}/d1.parquet")
    d2.write.parquet(f"{root}/d2.parquet")


_EDGES = [
    ("fact", "fk1", "d1", "k1"),
    ("fact", "fk2", "d2", "k2"),
]

_FILTERS = {
    "d1": [("a", ("=", 5)), ("b", ("=", 5))],
    "d2": [("c", ("=", 7))],
}


def test_conjunction_filters_with_group_stats_flip_order(spark, tmp_path):
    """The ask X47 exists for: workloads conjoin columns, so
    `filters=` accepts a list of specs per table and ≥2 equality specs
    route through `apply_eq_conjunction_to_stats`. With a group-stats
    sidecar the planner sees d1's filtered size truthfully (400 rows,
    not the independence 4) and starts at the d2 edge instead; without
    group stats the independence model keeps d1 first. Results match
    the manually filtered join either way — the flip is planning-only."""
    plain = str(tmp_path / "plain")
    grouped = str(tmp_path / "grouped")
    _plant_correlated_star(spark, plain)
    _plant_correlated_star(spark, grouped)
    # group-aware sidecar on ONE copy: the d1 (a, b) group NDV
    d1_path = f"{grouped}/d1.parquet"
    d1 = spark.read.parquet(d1_path)
    base = collect_table_stats(d1, path=d1_path)
    enhanced = collect_column_group_stats(d1, base, [["a", "b"]])
    write_stats_sidecar(spark, d1_path, enhanced)

    j_indep, order_indep = plan_star_join(
        spark, plain, _EDGES, filters=_FILTERS, broadcast_threshold=-1
    )
    j_group, order_group = plan_star_join(
        spark, grouped, _EDGES, filters=_FILTERS, broadcast_threshold=-1
    )
    # independence: d1 looks like 4 rows → its edge is "cheapest" and
    # d1 leads; group truth: 400 rows → the d2 edge (150 rows kept)
    # wins and d2 leads
    assert order_indep[0] == "d1", order_indep
    assert order_group[0] == "d2", order_group

    want = (
        spark.read.parquet(f"{plain}/fact.parquet")
        .join(
            spark.read.parquet(f"{plain}/d1.parquet").filter(
                (F.col("a") == 5) & (F.col("b") == 5)
            ),
            F.col("fk1") == F.col("k1"),
        )
        .join(
            spark.read.parquet(f"{plain}/d2.parquet").filter(
                F.col("c") == 7
            ),
            F.col("fk2") == F.col("k2"),
        )
        .count()
    )
    assert j_indep.count() == want
    assert j_group.count() == want

    # guards: a list mixing in a range spec still works; duplicate
    # equality on one column is rejected loudly
    j_mixed, _ = plan_star_join(
        spark,
        plain,
        _EDGES,
        filters={"d1": [("a", ("=", 5)), ("b", 0, 50)]},
        broadcast_threshold=-1,
    )
    want_mixed = (
        spark.read.parquet(f"{plain}/fact.parquet")
        .join(
            spark.read.parquet(f"{plain}/d1.parquet").filter(
                (F.col("a") == 5) & F.col("b").between(0, 50)
            ),
            F.col("fk1") == F.col("k1"),
        )
        .join(
            spark.read.parquet(f"{plain}/d2.parquet"),
            F.col("fk2") == F.col("k2"),
        )
        .count()
    )
    assert j_mixed.count() == want_mixed
    with pytest.raises(ValueError, match="duplicate equality"):
        plan_star_join(
            spark,
            plain,
            _EDGES,
            filters={"d1": [("a", ("=", 5)), ("a", ("=", 6))]},
        )


def test_probe_auto_fires_only_on_model_disagreement(
    spark, tmp_path, monkeypatch
):
    """probe='auto' pins (round-9 verdict ask #8): on the planted
    matching-skew star the equi-depth histogram (point masses at the
    hot key: ~900k) and containment-refined Selinger (~4k) disagree
    >10x — the probe fires ITSELF through plan_star_join, and the
    measured ~900k cardinality flips the join order relative to the
    metadata-only Selinger plan (histogram-less cached stats). On an
    agreeing-models graph the path stays completely scan-free: the
    probe never runs."""
    from custom_python_etl_data_connector_shivaask_username_spark.plans import (
        stats as S,
    )
    from custom_python_etl_data_connector_shivaask_username_spark.plans.stats import (
        add_equidepth_histograms,
    )

    calls = []
    real_probe = S.probe_join_rows

    def spy(left, lcol, right, rcol, fraction=0.01, seed=42):
        calls.append((lcol, rcol))
        return real_probe(left, lcol, right, rcol, fraction, seed)

    monkeypatch.setattr(S, "probe_join_rows", spy)

    # matching skew: 90% of f1 and 50% of f2 sit on key 500 — the
    # true join is ~900k (hot-squared), which Selinger's uniform-NDV
    # model averages away; f3 is a benign unique-key join
    f1 = spark.range(0, 2_000).select(
        F.when(F.col("id") % 10 != 0, F.lit(500))
        .otherwise(F.col("id") % 1_000)
        .alias("k"),
        F.col("id").alias("j"),
    )
    f2 = spark.range(0, 1_000).select(
        F.when(F.col("id") % 2 == 0, F.lit(500))
        .otherwise(F.col("id") % 1_000)
        .alias("k2")
    )
    f3 = spark.range(0, 5_000).select(F.col("id").alias("j3"))
    tables = {"f1": f1, "f2": f2, "f3": f3}
    edges = [("f1", "k", "f2", "k2"), ("f1", "j", "f3", "j3")]
    plain = {
        n: S.collect_table_stats(df) for n, df in tables.items()
    }
    # the lake-ANALYZE story: equi-depth histograms in the sidecar
    # stats give the planner its second model on the skew columns
    hist = dict(plain)
    hist["f1"] = add_equidepth_histograms(f1, plain["f1"], columns=["k"])
    hist["f2"] = add_equidepth_histograms(f2, plain["f2"], columns=["k2"])

    sf_dir = str(tmp_path)  # never read: tables + stats fully override
    _, order_sel = plan_star_join(
        spark, sf_dir, edges, tables=tables, stats=plain,
        broadcast_threshold=-1,
    )
    assert calls == []  # probe=None never measures
    # Selinger underestimates the skew edge (~4k < the benign edge's
    # cost), so the metadata-only plan starts there
    assert order_sel.index("f2") < order_sel.index("f3"), order_sel

    joined, order_probed = plan_star_join(
        spark, sf_dir, edges, tables=tables, stats=hist,
        broadcast_threshold=-1, probe="auto",
    )
    assert len(calls) == 1  # ONLY the disagreeing edge dispatched
    # the measured ~900k defers the skew edge: the benign f3 edge
    # now folds first — the order flipped on a measurement
    assert order_probed.index("f3") < order_probed.index("f2"), (
        order_probed,
        order_sel,
    )

    want = (
        f1.join(f2, F.col("k") == F.col("k2"))
        .join(f3, F.col("j") == F.col("j3"))
        .count()
    )
    assert joined.count() == want

    # agreeing models (uniform keys, histograms present): the path
    # stays scan-free — zero probes
    calls.clear()
    u1 = spark.range(0, 5_000).select((F.col("id") % 500).alias("x"))
    u2 = spark.range(0, 5_000).select((F.col("id") % 500).alias("y"))
    us = {
        "u1": add_equidepth_histograms(
            u1, S.collect_table_stats(u1), columns=["x"]
        ),
        "u2": add_equidepth_histograms(
            u2, S.collect_table_stats(u2), columns=["y"]
        ),
    }
    plan_star_join(
        spark, sf_dir, [("u1", "x", "u2", "y")],
        tables={"u1": u1, "u2": u2}, stats=us,
        broadcast_threshold=-1, probe="auto",
    )
    assert calls == []


def test_bushy_combine_probe_demotes_mis_broadcast_subtree(spark):
    """Round-11 verdict ask #2 (X41×X50): the bushy combine plans the
    cross edge on chain ESTIMATES — here the histogram-stripped fold
    says subtree f1⋈d1 is ~2k rows (broadcastable) while the
    histogram-kept fold sees the planted hot key's ~1M quadratic mass.
    probe='auto' measures the disputed subtree (the same chain over a
    lead sample) and demotes the broadcast; the plan gains shuffle
    exchanges, the rows stay identical. An undisputed graph (uniform
    dim) stays completely scan-free — the probe spy never fires."""
    import custom_python_etl_data_connector_shivaask_username_spark.plans.stats as S
    from custom_python_etl_data_connector_shivaask_username_spark.plans.stats import (
        add_equidepth_histograms,
        collect_table_stats,
        plan_join_tree,
    )

    # f1: 5% hot (k=500), 95% unique keys -> Selinger sees ndv ~19k and
    # estimates the d1 fold at ~2k rows; d1 plants 1000 rows on the hot
    # key so the true fold is ~1M rows
    f1 = spark.range(0, 20_000).select(
        F.col("id").alias("x"),
        F.when(F.col("id") % 20 == 0, F.lit(500))
        .otherwise(F.col("id") + 10_000)
        .alias("k"),
    )
    d1 = spark.range(0, 2_000).select(
        F.when(F.col("id") < 1_000, F.lit(500))
        .otherwise(F.col("id") + 100_000)
        .alias("k"),
        F.col("id").alias("dpay"),
    )
    f2 = spark.range(0, 30_000).select(
        F.col("id").alias("x"), F.col("id").alias("f2pay")
    )
    stats = {}
    for name, df, cols in (
        ("f1", f1, ["k", "x"]),
        ("d1", d1, ["k"]),
        ("f2", f2, ["x"]),
    ):
        stats[name] = add_equidepth_histograms(
            df, collect_table_stats(df), columns=cols
        )
    edges = [("f1", "k", "d1", "k"), ("f1", "x", "f2", "x")]
    tables = {"f1": f1, "d1": d1, "f2": f2}
    thresh = 1 * 1024 * 1024  # f1/f2 are big, d1 and the WRONG est fit

    calls = []
    orig = S.probe_subtree_rows

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    S.probe_subtree_rows = spy
    try:
        blind, _ = plan_join_tree(
            tables, edges, stats=stats, broadcast_threshold=thresh
        )
        assert calls == []  # probe=None never probes
        probed, _ = plan_join_tree(
            tables,
            edges,
            stats=stats,
            broadcast_threshold=thresh,
            probe="auto",
        )
        assert len(calls) == 1  # exactly the one disputed subtree
        # the mis-broadcast is real and the demotion is the PLANNER's:
        # blind hints broadcast on BOTH d1 (chain) and the ~1M-row
        # subtree (combine); probed drops the subtree hint. (The
        # physical plan can't witness this on fixture-sized data —
        # Catalyst's own 10 MB auto-broadcast re-broadcasts whatever
        # tiny frame we demote, which is fine: hints only ever ADD
        # information; at fact scale the demoted hint is the plan.)
        def hint_count(df):
            return str(df._jdf.queryExecution().analyzed()).count(
                "ResolvedHint"
            )

        assert hint_count(blind) == 2 and hint_count(probed) == 1, (
            hint_count(blind),
            hint_count(probed),
        )
        assert blind.count() == probed.count() == 1_000_000

        # agreeing case: uniform dim -> models agree -> scan-free
        calls.clear()
        d1u = spark.range(0, 2_000).select(
            (F.col("id") % 1000 + 10_000).alias("k"),
            F.col("id").alias("dpay"),
        )
        stats_u = dict(stats)
        stats_u["d1"] = add_equidepth_histograms(
            d1u, collect_table_stats(d1u), columns=["k"]
        )
        plan_join_tree(
            {**tables, "d1": d1u},
            edges,
            stats=stats_u,
            broadcast_threshold=thresh,
            probe="auto",
        )
        assert calls == []  # undisputed chains stay scan-free
    finally:
        S.probe_subtree_rows = orig
