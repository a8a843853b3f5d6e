"""X61 pins (round 13): the self-tuning statistics loop.

The session observes the workload it executes, autotune mines the
observations and collects exactly the statistics the workload prices
that the session lacks, the session stats cache is updated in place,
and the next planning improves — no hand-declared statistic anywhere.
Incrementality is the load-bearing property: a second autotune with no
new observations is a zero-Spark-job no-op.

All tests run against a writable COPY of the fixture tables so the
mutated session stats can never leak plan changes into other test
modules' pinned expectations.
"""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from custom_python_etl_data_connector_shivaask_username_spark import registry, tables
from custom_python_etl_data_connector_shivaask_username_spark.plans import autotune
from custom_python_etl_data_connector_shivaask_username_spark.plans.inspect import count_exchanges

registry.load_all()


@pytest.fixture(scope="module")
def tuned_dir(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("autotune_sf"))
    for t in tables.TABLES:
        tables.load_table(spark, sf_dir, t).write.parquet(
            f"{out}/{t}.parquet"
        )
    return out


def _last_job_id(spark) -> int:
    try:
        spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty(10_000)
    except Exception:
        time.sleep(0.2)
    ids = spark.sparkContext.statusTracker().getJobIdsForGroup()
    return max(ids) if ids else -1


def test_observe_autotune_improves_next_planning(spark, tuned_dir):
    out = tuned_dir
    autotune.reset(out)
    tables.session_history(out).clear()

    fn = registry.QUERIES["q_revenue_by_nation"]
    df1 = fn(spark, out)
    rows1 = df1.collect()
    autotune.observe(df1, out)
    assert autotune.observed_count(out) == 1

    x_before = count_exchanges(df1)
    report = autotune.autotune(spark, out)
    # the revenue star's declared o_orderdate range predicate is what
    # the workload prices — the miner must find it and nothing forces
    # statistics onto tables the workload never filters
    assert "o_orderdate" in report.get("orders", {}).get(
        "histograms", []
    ), report
    st = tables.table_stats_cached(spark, out, "orders")
    h = st["columns"]["o_orderdate"].get("histogram")
    assert h and "bounds" in h, "session cache must hold the new stats"

    df2 = fn(spark, out)
    assert count_exchanges(df2) <= x_before
    assert sorted(map(str, df2.collect())) == sorted(map(str, rows1))


def test_autotune_is_incremental_and_scan_free_when_tuned(
    spark, tuned_dir
):
    out = tuned_dir
    # (runs after the test above in file order, but self-sufficient:
    # observing the same query again adds no new mined need)
    fn = registry.QUERIES["q_revenue_by_nation"]
    df = fn(spark, out)
    autotune.observe(df, out)
    autotune.autotune(spark, out)  # ensure tuned
    before = _last_job_id(spark)
    report = autotune.autotune(spark, out)
    after = _last_job_id(spark)
    assert report == {}, report
    assert after == before, (
        "a tuned session's autotune must be a zero-Spark-job no-op"
    )


def test_autotune_write_persists_sidecar(spark, sf_dir, tmp_path):
    from custom_python_etl_data_connector_shivaask_username_spark.plans.stats import read_stats_sidecar

    out = str(tmp_path)
    for t in ("orders", "lineitem", "customer", "nation", "region"):
        tables.load_table(spark, sf_dir, t).write.parquet(
            f"{out}/{t}.parquet"
        )
    # minimal synthetic observation: a plan string filtering orders
    autotune.reset(out)
    df = tables.load_table(spark, out, "orders").filter(
        "o_totalprice >= 1000.0"
    )
    autotune.observe(df, out)
    report = autotune.autotune(spark, out, write=True)
    assert "o_totalprice" in report.get("orders", {}).get(
        "histograms", []
    ), report
    side = read_stats_sidecar(spark, f"{out}/orders.parquet")
    assert side is not None
    assert "bounds" in side["columns"]["o_totalprice"]["histogram"]


def test_miner_attributes_filter_columns_to_their_relation():
    """Round-13 advisor finding, miner half: the `name#id` binding in
    the plan string ties each filtered column to the Relation that
    outputs it; columns no Relation claims stay in the leftover set."""
    from custom_python_etl_data_connector_shivaask_username_spark.plans.column_groups import (
        filter_columns_by_relation,
    )

    plan = (
        "Join Inner, (o_orderkey#0L = user_id#9L)\n"
        ":- Filter ((isnotnull(o_orderdate#4) AND "
        "(o_orderdate#4 >= 1995-01-01 00:00:00)))\n"
        ":  +- Relation [o_orderkey#0L,o_custkey#1L,o_orderdate#4]"
        " parquet\n"
        "+- Filter (value#11 > 10.0)\n"
        "   +- Relation [event_id#7L,user_id#9L,value#11] parquet\n"
        "+- Filter (orphan#99 = 3)\n"
    )
    attributed, leftover = filter_columns_by_relation(plan)
    by_rel = {rnames: rcols for rnames, rcols in attributed}
    assert by_rel == {
        frozenset({"o_orderkey", "o_custkey", "o_orderdate"}): {
            "o_orderdate"
        },
        frozenset({"event_id", "user_id", "value"}): {"value"},
    }, attributed
    assert leftover == {"orphan"}


def test_autotune_charges_only_the_filtered_relation(
    spark, sf_dir, tmp_path
):
    """Round-13 advisor finding, loop half: a column name present in
    SEVERAL tables must only trigger collection on the table the
    workload filtered — no silent cross-table histogram scans."""
    out = str(tmp_path)
    ev = tables.load_table(spark, sf_dir, "events")
    # two tables sharing the column name `value`: the real events and
    # a doctored documents table carrying a `value` column too
    ev.write.parquet(f"{out}/events.parquet")
    tables.load_table(spark, sf_dir, "documents").withColumn(
        "value", F.col("n_chars").cast("double")
    ).write.parquet(f"{out}/documents.parquet")
    autotune.reset(out)
    df = tables.load_table(spark, out, "events").filter("value > 10.0")
    autotune.observe(df, out)
    report = autotune.autotune(spark, out)
    assert "value" in report.get("events", {}).get("histograms", []), (
        report
    )
    assert "documents" not in report, (
        "the workload never filtered documents.value — collecting its "
        "histogram is the cross-table collision the miner must prevent"
    )
    # and the stats cache never even paid documents' base collection
    assert (out, "documents") not in tables._STATS_CACHE


def test_observation_log_persists_across_sessions(spark, sf_dir, tmp_path):
    """Round 14 (X61 persistence): session A observes, autotunes with
    write=True and saves the log; a 'restarted' session (reset +
    invalidated caches) loads the persisted log and autotunes against
    the persisted sidecars with ZERO re-collection and zero Spark
    jobs. A log whose recorded signature drifted past the X38 byte
    threshold is refused."""
    out = str(tmp_path)
    for t in ("orders", "lineitem", "customer", "nation", "region"):
        tables.load_table(spark, sf_dir, t).write.parquet(
            f"{out}/{t}.parquet"
        )
    autotune.reset(out)
    df = tables.load_table(spark, out, "orders").filter(
        "o_totalprice >= 1000.0"
    )
    autotune.observe(df, out)
    report = autotune.autotune(spark, out, write=True)
    assert "o_totalprice" in report.get("orders", {}).get(
        "histograms", []
    ), report
    log_path = f"{out}/_observations.json"
    assert autotune.save_observation_log(spark, out, log_path) == 1

    # restart: drop every piece of session state
    autotune.reset(out)
    tables.invalidate_table_cache(out)
    assert autotune.observed_count(out) == 0
    assert autotune.load_observation_log(spark, out, log_path) == 1
    before = _last_job_id(spark)
    report2 = autotune.autotune(spark, out)
    after = _last_job_id(spark)
    assert report2 == {}, (
        "the restarted session must re-collect nothing the prior "
        f"session persisted: {report2}"
    )
    assert after == before, "restart autotune must run zero Spark jobs"

    # drift gate: a grown lake invalidates the persisted observations
    tables.load_table(spark, sf_dir, "orders").write.mode(
        "append"
    ).parquet(f"{out}/orders.parquet")
    tables.invalidate_table_cache(out)
    autotune.reset(out)
    assert autotune.load_observation_log(spark, out, log_path) == 0
    assert autotune.observed_count(out) == 0


def test_observation_log_drift_gate_edge_cases(spark, sf_dir, tmp_path):
    """Round-15 advisor: two lake states _rel_drift alone cannot see
    must still refuse a persisted observation log — a signature table
    that DISAPPEARED from the dir (maximal shrink), and a recorded
    0-byte table that now holds bytes (unbounded growth)."""
    import json

    out = str(tmp_path)
    tables.load_table(spark, sf_dir, "region").write.parquet(
        f"{out}/region.parquet"
    )
    log_path = f"{out}/_observations.json"
    plans = ["Filter (r_name = EUROPE)"]

    # positive control: the true signature loads
    sig = autotune._dir_signature(spark, out)
    assert sig.get("region"), "premise: region has bytes"
    autotune.reset(out)
    with open(log_path, "w") as fh:
        json.dump({"signature": sig, "plans": plans}, fh)
    assert autotune.load_observation_log(spark, out, log_path) == 1

    # vanished table: the signature names a table the dir lacks
    autotune.reset(out)
    with open(log_path, "w") as fh:
        json.dump({"signature": {"nation": 1024.0}, "plans": plans}, fh)
    assert autotune.load_observation_log(spark, out, log_path) == 0

    # empty-then-populated: old bytes 0, current bytes > 0
    autotune.reset(out)
    with open(log_path, "w") as fh:
        json.dump({"signature": {"region": 0.0}, "plans": plans}, fh)
    assert autotune.load_observation_log(spark, out, log_path) == 0
    assert autotune.observed_count(out) == 0
    autotune.reset(out)


def test_autotune_hot_key_evidence_enables_skew_dispatch(
    spark, tmp_path, monkeypatch
):
    """Round 14 (heavy-hitter skew evidence in the loop): a planted
    50%-hot join key with NO histogram anywhere — the observed
    workload's Join node is mined, autotune records the key's exact
    hottest-value mass via the two-pass heavy hitters, and the next
    planner-routed fold of the same edge salts with no opt-in and no
    hand-declared statistic. A uniform key collects evidence but never
    salts (the dispatch gates hold)."""
    from pyspark.sql import Row

    from custom_python_etl_data_connector_shivaask_username_spark.functions import (
        skew as skew_mod,
    )

    out = str(tmp_path)
    hot_n, fact_rows = 2000, 4000
    fact = spark.createDataFrame(
        [
            Row(row_id=i, fk=0 if i < hot_n else 1 + (i * 37) % 1000,
                v=float(i))
            for i in range(fact_rows)
        ]
    )
    dim = spark.createDataFrame(
        [Row(dk=i, name=f"d{i}") for i in range(300)]
    )
    fact.write.parquet(f"{out}/part.parquet")
    dim.write.parquet(f"{out}/region.parquet")
    autotune.reset(out)

    # the workload: one executed inner join over the two tables
    j = tables.load_table(spark, out, "part").join(
        tables.load_table(spark, out, "region"),
        F.col("fk") == F.col("dk"),
    )
    autotune.observe(j, out)
    report = autotune.autotune(spark, out)
    assert "fk" in report.get("part", {}).get("hot_keys", []), report
    st = tables.table_stats_cached(spark, out, "part")
    assert st["columns"]["fk"].get("hot_rows") == float(hot_n)
    assert not (st["columns"]["fk"].get("histogram") or {}).get(
        "bounds"
    ), "premise: the evidence is heavy-hitter, not histogram"

    calls = []
    real = skew_mod.salted_shuffle_join

    def spy(*a, **kw):
        calls.append(kw.get("salt_side"))
        return real(*a, **kw)

    monkeypatch.setattr(skew_mod, "salted_shuffle_join", spy)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    try:
        salted, _ = tables.plan_star_join(
            spark, out, [("part", "fk", "region", "dk")],
            broadcast_threshold=1,
        )
        assert calls, "hot-key evidence must dispatch the salted join"
        plain = tables.load_table(spark, out, "part").join(
            tables.load_table(spark, out, "region"),
            F.col("fk") == F.col("dk"),
        )
        assert sorted(map(str, salted.collect())) == sorted(
            map(str, plain.select(*salted.columns).collect())
        )
        # uniform twin: evidence collected, dispatch never fires
        calls.clear()
        uni = str(tmp_path / "uni")
        spark.createDataFrame(
            [Row(row_id=i, fk=i % 1000, v=float(i)) for i in range(4000)]
        ).write.parquet(f"{uni}/part.parquet")
        dim.write.parquet(f"{uni}/region.parquet")
        autotune.reset(uni)
        j2 = tables.load_table(spark, uni, "part").join(
            tables.load_table(spark, uni, "region"),
            F.col("fk") == F.col("dk"),
        )
        autotune.observe(j2, uni)
        rep2 = autotune.autotune(spark, uni)
        assert "fk" in rep2.get("part", {}).get("hot_keys", [])
        tables.plan_star_join(
            spark, uni, [("part", "fk", "region", "dk")],
            broadcast_threshold=1,
        )
        assert calls == [], "uniform key must never salt"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_hot_key_evidence_persists_across_sessions_by_default(
    spark, tmp_path, monkeypatch
):
    """Round 15 (VERDICT r14 ask #3): autotune persists its evidence —
    including the MG hot-key mass — into sidecars BY DEFAULT on a
    writable lake (no write=True anywhere), so a restarted session
    salts the planted-hot edge with zero re-collection: the sidecar
    serves hot_rows, heavy_hitters never runs again, and the
    restart-side autotune is a zero-job no-op. Fixture dirs sit under
    a declared read-only root and never earn the write."""
    from pyspark.sql import Row

    import custom_python_etl_data_connector_shivaask_username_spark.plans.stats as S
    from custom_python_etl_data_connector_shivaask_username_spark.functions import (
        skew as skew_mod,
    )

    out = str(tmp_path)
    assert autotune.lake_writable(out)
    assert not autotune.lake_writable("/root/testdata/sf0.01")
    hot_n = 2000
    spark.createDataFrame(
        [
            Row(row_id=i, fk=0 if i < hot_n else 1 + (i * 37) % 1000,
                v=float(i))
            for i in range(4000)
        ]
    ).write.parquet(f"{out}/part.parquet")
    spark.createDataFrame(
        [Row(dk=i, name=f"d{i}") for i in range(300)]
    ).write.parquet(f"{out}/region.parquet")
    autotune.reset(out)

    # session A: observe, autotune with the DEFAULT write mode, save log
    j = tables.load_table(spark, out, "part").join(
        tables.load_table(spark, out, "region"),
        F.col("fk") == F.col("dk"),
    )
    autotune.observe(j, out)
    report = autotune.autotune(spark, out)
    assert "fk" in report.get("part", {}).get("hot_keys", []), report
    log_path = f"{out}/_observations.json"
    assert autotune.save_observation_log(spark, out, log_path) == 1
    side = S.read_stats_sidecar(spark, f"{out}/part.parquet")
    assert side and side["columns"]["fk"].get("hot_rows") == float(hot_n), (
        "the default-mode autotune must persist hot_rows in the sidecar"
    )

    # restart: drop every piece of session state
    autotune.reset(out)
    tables.invalidate_table_cache(out)
    tables.session_history(out).clear()

    # session B: zero re-collection — heavy_hitters must never run
    def no_mg(*a, **k):
        raise AssertionError(
            "restarted session must serve hot_rows from the sidecar, "
            "not re-measure"
        )

    monkeypatch.setattr(S, "add_hot_key_evidence", no_mg)
    assert autotune.load_observation_log(spark, out, log_path) == 1
    before = _last_job_id(spark)
    assert autotune.autotune(spark, out) == {}, (
        "sidecar-served stats already satisfy every mined need"
    )
    assert _last_job_id(spark) == before, "restart autotune ran Spark jobs"

    # and the planner salts the hot edge purely from the sidecar
    calls = []
    real = skew_mod.salted_shuffle_join

    def spy(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(skew_mod, "salted_shuffle_join", spy)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    try:
        salted, _ = tables.plan_star_join(
            spark, out, [("part", "fk", "region", "dk")],
            broadcast_threshold=1,
        )
        assert calls, (
            "restarted session must salt the planted-hot edge from "
            "persisted evidence"
        )
        plain = tables.load_table(spark, out, "part").join(
            tables.load_table(spark, out, "region"),
            F.col("fk") == F.col("dk"),
        )
        assert sorted(map(str, salted.collect())) == sorted(
            map(str, plain.select(*salted.columns).collect())
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_reset_drops_observations(spark, tuned_dir):
    autotune.reset(tuned_dir)
    assert autotune.observed_count(tuned_dir) == 0
    assert autotune.autotune(spark, tuned_dir) == {}
