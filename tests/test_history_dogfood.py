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


#: every planner-routed registry query in the self-tuning loop
#: (round 14, VERDICT r13 ask #1: default-on breadth — the revenue
#: star's inner folds, the counts⋈presence fold, the bigram-LM probe
#: join, and the incremental-dedup gram probe join)
SELF_TUNED = [
    "q_revenue_by_nation",
    "q_customer_order_counts",
    "q_lm_quality",
    "q_incremental_dedup",
]


@pytest.mark.parametrize("name", SELF_TUNED)
def test_second_run_plans_from_harvested_history(spark, sf_dir, name):
    import custom_python_etl_data_connector_shivaask_username_spark.plans.history as H
    import custom_python_etl_data_connector_shivaask_username_spark.plans.stats as S

    # isolate: no leftover measurements or pending folds from other
    # tests against the same fixture dir
    tables.session_history(sf_dir).clear()
    tables._PENDING_FOLDS.pop(sf_dir, None)

    fn = registry.QUERIES[name]
    df1 = fn(spark, sf_dir)
    rows1 = df1.collect()
    harvested = tables.harvest_executed(spark, df1, sf_dir)
    assert harvested >= 1, (
        f"the executed {name} must yield at least one measurable "
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


def test_served_edge_still_marks_foreign_pending_fold(spark, sf_dir):
    """Round-15 advisor (medium): an edge SERVED from history skips
    registration (round 14 — nothing left to harvest), but when a
    DIFFERENT query's fold is still pending on the same colset (its
    join metric read 0 and was never popped), the skip must still trip
    the sticky ambiguity mark — otherwise harvesting the served
    query's executed frame records its cardinality under the pending
    fold's filter-digest key, the exact poisoning the mark prevents."""
    tables.session_history(sf_dir).clear()
    tables._PENDING_FOLDS.pop(sf_dir, None)

    edge = [("nation", "n_regionkey", "region", "r_regionkey")]
    filt = {"region": ("r_name", ("=", "EUROPE"))}
    # the filtered query executes + harvests: history now serves it
    j2, _ = tables.plan_star_join(
        spark, sf_dir, edge, filters=filt, history="session"
    )
    j2.collect()
    assert tables.harvest_executed(spark, j2, sf_dir) == 1
    # the UNFILTERED query plans (different digest → not served),
    # registers its fold, and never executes
    tables.plan_star_join(spark, sf_dir, edge, history="session")
    colset = frozenset({"n_regionkey", "r_regionkey"})
    pend = tables._PENDING_FOLDS[sf_dir]
    assert colset in pend and not pend[colset]["ambiguous"]
    q1_key = pend[colset]["key"]
    # the filtered query re-plans: its edge is history-served, and the
    # skip path must mark the other query's pending fold ambiguous
    j2b, _ = tables.plan_star_join(
        spark, sf_dir, edge, filters=filt, history="session"
    )
    assert pend[colset]["ambiguous"] is True, pend
    # so harvesting the served frame records NOTHING under q1's key
    j2b.collect()
    assert tables.harvest_executed(spark, j2b, sf_dir) == 0
    assert q1_key not in tables.session_history(sf_dir)
    tables.session_history(sf_dir).clear()
    tables._PENDING_FOLDS.pop(sf_dir, None)


def test_harvest_records_inner_nodes_only(spark, sf_dir):
    """Round 14: q_customer_order_counts' LEFT customer⋈orders join
    shares its key-column set {c_custkey, o_custkey} with the revenue
    star's INNER fold. With the star's fold still pending (planned but
    never executed), harvesting the other query's frame used to record
    the OUTER join's cardinality under the inner fold's filter-digest
    key — a how-dependent number history must never serve. The
    harvester now keys on join_type == Inner."""
    tables.session_history(sf_dir).clear()
    tables._PENDING_FOLDS.pop(sf_dir, None)

    registry.QUERIES["q_revenue_by_nation"](spark, sf_dir)
    pend = tables._PENDING_FOLDS.get(sf_dir) or {}
    colset = frozenset({"c_custkey", "o_custkey"})
    assert colset in pend, "premise: the star's fold is pending"
    star_key = pend[colset]["key"]

    df = registry.QUERIES["q_customer_order_counts"](spark, sf_dir)
    df.collect()
    n = tables.harvest_executed(spark, df, sf_dir)
    hist = tables.session_history(sf_dir)
    assert star_key not in hist, (
        "the LEFT join's cardinality must never land under the inner "
        "fold's key"
    )
    # ...while the query's own INNER counts⋈presence fold did harvest
    assert n >= 1 and any("counts[" in k for k in hist), hist
    tables.session_history(sf_dir).clear()
    tables._PENDING_FOLDS.pop(sf_dir, None)


def test_no_reregistration_once_history_serves(spark, sf_dir):
    """Round 14: an edge a fresh history entry already serves is not
    re-registered for harvest — a lingering pending fold is exactly
    what would let a LATER query's same-colset edge (two gram-keyed
    probe joins: incremental-dedup and the bigram LM) trip the sticky
    ambiguity mark and lock both out of the loop for the session."""
    tables.session_history(sf_dir).clear()
    tables._PENDING_FOLDS.pop(sf_dir, None)
    gram = frozenset({"gram"})

    df = registry.QUERIES["q_incremental_dedup"](spark, sf_dir)
    df.collect()
    assert tables.harvest_executed(spark, df, sf_dir) >= 1
    # recorded + popped: the colset is free again
    assert gram not in (tables._PENDING_FOLDS.get(sf_dir) or {})
    # second planning serves from history and must NOT re-register
    registry.QUERIES["q_incremental_dedup"](spark, sf_dir)
    assert gram not in (tables._PENDING_FOLDS.get(sf_dir) or {})

    # so the OTHER gram-keyed query registers + harvests cleanly
    df2 = registry.QUERIES["q_lm_quality"](spark, sf_dir)
    df2.collect()
    assert tables.harvest_executed(spark, df2, sf_dir) >= 1
    hist = tables.session_history(sf_dir)
    assert any("model_scored[" in k for k in hist), hist
    assert any("cor_g[" in k for k in hist), hist
    tables.session_history(sf_dir).clear()
    tables._PENDING_FOLDS.pop(sf_dir, None)


def test_virtual_cross_edge_served_from_history(spark, tmp_path):
    """Round 15 (VERDICT r14 ask #2): the bushy combine's VIRTUAL
    cross edges ride the session history under COMPONENT-CONTENT keys.
    Run 1 re-keys the cross colset's pending fold to the cross: key
    (so the harvest records the halo-shrunk combine output, never a
    base pair); run 2 serves it UNSCALED and registers nothing (the
    served fold retires); a drifted member refuses the serve and
    re-registers."""
    from pyspark.sql import functions as F

    out = str(tmp_path)
    spark.range(0, 20_000).select(
        F.col("id").alias("x"), (F.col("id") % 100).alias("k")
    ).write.parquet(f"{out}/fact1.parquet")
    spark.range(0, 100).select(
        F.col("id").alias("k"), F.col("id").alias("dpay")
    ).write.parquet(f"{out}/dim1.parquet")
    spark.range(0, 30_000).select(
        F.col("id").alias("x"), F.col("id").alias("f2pay")
    ).write.parquet(f"{out}/fact2.parquet")
    edges = [("fact1", "k", "dim1", "k"), ("fact1", "x", "fact2", "x")]
    thresh = 64 * 1024
    tables.session_history(out).clear()
    tables._PENDING_FOLDS.pop(out, None)

    j1, _ = tables.plan_star_join(
        spark, out, edges, broadcast_threshold=thresh, history="session"
    )
    pend = tables._PENDING_FOLDS[out]
    cross_cs, halo_cs = frozenset({"x"}), frozenset({"k"})
    assert pend[cross_cs]["key"].startswith("cross:"), (
        "the bushy rung must re-key the cross fold to component content"
    )
    assert pend[cross_cs].get("member_stats"), pend[cross_cs]
    assert not pend[halo_cs]["key"].startswith("cross:")
    j1.collect()
    assert tables.harvest_executed(spark, j1, out) == 2
    hist = tables.session_history(out)
    ckey = next(k for k in hist if k.startswith("cross:"))
    assert hist[ckey]["source"] == "executed"
    assert hist[ckey]["rows"] == 20_000.0  # the combine's true output

    # run 2: the virtual edge serves from history, the fold retires
    j2, _ = tables.plan_star_join(
        spark, out, edges, broadcast_threshold=thresh, history="session"
    )
    assert cross_cs not in (tables._PENDING_FOLDS.get(out) or {}), (
        "a served virtual fold must not linger for the harvest"
    )
    assert j2.count() == j1.count()

    # drift: a member whose stats moved past the X38 threshold refuses
    # the serve and the fold re-registers under the content key
    st = tables._STATS_CACHE[(out, "fact2")]
    tables._STATS_CACHE[(out, "fact2")] = {
        **st, "row_count": int(st["row_count"]) * 2
    }
    tables.plan_star_join(
        spark, out, edges, broadcast_threshold=thresh, history="session"
    )
    assert (tables._PENDING_FOLDS[out].get(cross_cs) or {}).get(
        "key", ""
    ).startswith("cross:"), "drifted member must re-register the fold"
    tables.session_history(out).clear()
    tables._PENDING_FOLDS.pop(out, None)
    tables.invalidate_table_cache(out)


def test_subtree_probe_pays_once_then_plans_from_history(spark):
    """Round 14 (X56×X53): the disputed bushy subtree's sampling scan
    runs ONCE — the measured cardinality lands in the session history
    under the chain signature, gated on every member's stats
    signature — and a re-planning of the same graph serves it with
    zero probes. A member whose stats drift past the X38 thresholds
    invalidates the entry and the next planning re-probes."""
    from pyspark.sql import functions as F

    import custom_python_etl_data_connector_shivaask_username_spark.plans.stats as S
    from custom_python_etl_data_connector_shivaask_username_spark.plans.stats import (
        add_equidepth_histograms,
        collect_table_stats,
        plan_join_tree,
    )

    # the round-11 disputed graph: stripped fold ~2k vs kept fold ~1M
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
    frames = {"f1": f1, "d1": d1, "f2": f2}
    thresh = 1 * 1024 * 1024

    calls: list[int] = []
    orig = S.probe_subtree_rows

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    S.probe_subtree_rows = spy
    hist: dict = {}
    try:
        p1, _ = plan_join_tree(
            frames, edges, stats=stats, broadcast_threshold=thresh,
            probe="auto", history=hist, history_digest="t",
        )
        assert len(calls) == 1, "first planning probes the dispute"
        assert any(k.startswith("subtree:f1|") for k in hist), hist
        p2, _ = plan_join_tree(
            frames, edges, stats=stats, broadcast_threshold=thresh,
            probe="auto", history=hist, history_digest="t",
        )
        assert len(calls) == 1, "second planning serves from history"
        assert sorted(map(tuple, p2.collect())) == sorted(
            map(tuple, p1.collect())
        )
        # a drifted member invalidates the entry: next planning re-probes
        drifted = {
            **stats,
            "d1": {**stats["d1"], "row_count": stats["d1"]["row_count"] * 2},
        }
        plan_join_tree(
            frames, edges, stats=drifted, broadcast_threshold=thresh,
            probe="auto", history=hist, history_digest="t",
        )
        assert len(calls) == 2, "drifted member stats must re-probe"
        # a different filter digest is a different subtree context
        plan_join_tree(
            frames, edges, stats=stats, broadcast_threshold=thresh,
            probe="auto", history=hist, history_digest="OTHER",
        )
        assert len(calls) == 3
    finally:
        S.probe_subtree_rows = orig
