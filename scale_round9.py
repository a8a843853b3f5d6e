"""Round-9 design-for-scale measurements.

A. **Wired planner, planned-vs-written at sf1.0** — round 8 measured
   `plan_join_tree` as a library; round 9 wired it into the engine
   (`q_revenue_by_nation` routes through `plan_revenue_star`). This
   part runs the ACTUAL registry query at sf1.0 against the previous
   hand-written formulation, same session, best-of-N, results
   asserted equal (exact-decimal revenue).
B. **Adversarial fact-fact skew: measured cardinality beats agreeing
   models** — two 1M-row facts with coinciding hot keys: Selinger and
   the histogram AGREE (both ~|fact|, so the X41 probe dispatch never
   fires) and both are ~20x under the true hot² cardinality. One
   `exact_join_rows_agg` key-count shuffle per edge (cost recorded)
   feeds `plan_join_tree(edge_rows=...)`; the corrected order defers
   the blowup edge and wins wall-clock in the shuffle regime (the
   100 TB analog: broadcast disabled, order is the only decision).

Diagnostic harness like scale_round8.py — not part of the driver
contract. Results: SCALE_SF1_R9.json + SCALE.md rows.
Usage: python scale_round9.py [--parts a,b]
"""

from __future__ import annotations

import argparse
import json
import os
import time

from pyspark.sql import functions as F

from custom_python_etl_data_connector_shivaask_username_spark.compat import dsum
from custom_python_etl_data_connector_shivaask_username_spark.session import get_spark
from custom_python_etl_data_connector_shivaask_username_spark.tables import (
    load_table,
    spread_small_input,
)
from scale_sf1_suite import FULL_DIR


def _timed(df):
    t0 = time.time()
    rows = df.collect()
    return round(time.time() - t0, 2), rows


def part_a_wired_planner(spark) -> dict:
    """q_revenue_by_nation (planner-routed, as shipped) vs the round-8
    hand-written formulation at sf1.0."""
    from custom_python_etl_data_connector_shivaask_username_spark.operators.relational import (
        plan_revenue_star,
        q_revenue_by_nation,
    )

    def hand_written(spark, sf_dir):
        li = spread_small_input(load_table(spark, sf_dir, "lineitem"))
        orders = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp_ntz")
        )
        cust = load_table(spark, sf_dir, "customer")
        nation = load_table(spark, sf_dir, "nation")
        region = load_table(spark, sf_dir, "region")
        return (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
            .join(
                F.broadcast(nation),
                F.col("c_nationkey") == nation.n_nationkey,
            )
            .join(
                F.broadcast(region),
                F.col("n_regionkey") == region.r_regionkey,
            )
            .groupBy("r_name", "n_name")
            .agg(
                dsum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")),
                    "revenue",
                ),
                F.count(F.lit(1)).alias("line_count"),
            )
            .orderBy("r_name", "n_name")
        )

    # warm page cache
    for t in ("lineitem", "orders", "customer", "nation", "region"):
        load_table(spark, FULL_DIR, t).count()
    # stats-collection cost paid once per session (memoized)
    t0 = time.time()
    _, order = plan_revenue_star(spark, FULL_DIR)
    first_plan_s = round(time.time() - t0, 2)

    walls = {"planned": [], "written": []}
    ref = None
    for _ in range(3):
        for name, fn in (
            ("written", hand_written),
            ("planned", q_revenue_by_nation),
        ):
            w, rows = _timed(fn(spark, FULL_DIR))
            walls[name].append(w)
            key = [tuple(r) for r in rows]
            if ref is None:
                ref = key
            assert key == ref, f"{name} diverged"
    return {
        "order": order,
        "first_plan_incl_analyze_s": first_plan_s,
        "wall_planned_s": min(walls["planned"]),
        "wall_written_s": min(walls["written"]),
        "samples": walls,
        "result_rows": len(ref),
    }


def part_b_adversarial_skew(spark) -> dict:
    """Coinciding hot keys across two facts: agreeing-but-wrong models
    vs one exact key-count shuffle, in the shuffle regime at sf1-ish
    volume (1M + 1M + 2M rows)."""
    from custom_python_etl_data_connector_shivaask_username_spark.plans.stats import (
        add_histograms,
        collect_table_stats,
        estimate_join_rows,
        exact_join_rows_agg,
        plan_join_tree,
    )

    HOT = 5_000
    f1 = spark.range(0, 1_000_000).select(
        F.col("id").alias("f1_id"),
        F.when(F.col("id") < HOT, F.lit(0)).otherwise(F.col("id")).alias("f_k"),
    )
    f2 = spark.range(0, 1_000_000).select(
        F.col("id").alias("f2_id"),
        F.when(F.col("id") < HOT, F.lit(0)).otherwise(F.col("id")).alias("g_k"),
    )
    # the hot-free multiplicative fact: half of f1's tail keys, x4
    f3 = spark.range(0, 2_000_000).select(
        F.col("id").alias("f3_id"),
        (F.col("id") % 500_000 + 500_000).alias("h_k"),
    )
    tables = {"f1": f1, "f2": f2, "f3": f3}
    edges = [
        ("f1", "f_k", "f2", "g_k"),
        ("f1", "f_k", "f3", "h_k"),
    ]
    stats = {k: collect_table_stats(v) for k, v in tables.items()}
    stats["f1"] = add_histograms(f1, stats["f1"], columns=["f_k"])
    stats["f2"] = add_histograms(f2, stats["f2"], columns=["g_k"])

    # the models on the blowup edge: Selinger and histogram AGREE
    # (within the X41 probe-dispatch band) and both are wrong
    sel = estimate_join_rows(
        {**stats["f1"], "columns": {
            "f_k": {k: v for k, v in stats["f1"]["columns"]["f_k"].items() if k != "histogram"}
        }},
        "f_k",
        {**stats["f2"], "columns": {
            "g_k": {k: v for k, v in stats["f2"]["columns"]["g_k"].items() if k != "histogram"}
        }},
        "g_k",
    )
    hist = estimate_join_rows(stats["f1"], "f_k", stats["f2"], "g_k")

    t0 = time.time()
    measured = {
        tuple(e): float(
            exact_join_rows_agg(tables[e[0]], e[1], tables[e[2]], e[3])
        )
        for e in edges
    }
    measure_s = round(time.time() - t0, 2)

    old_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    out: dict = {}
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        model_df, order_model = plan_join_tree(
            tables, edges, stats=stats, broadcast_threshold=-1
        )
        fixed_df, order_fixed = plan_join_tree(
            tables,
            edges,
            stats=stats,
            broadcast_threshold=-1,
            edge_rows=measured,
        )
        assert order_model.index("f2") < order_model.index("f3")
        assert order_fixed.index("f3") < order_fixed.index("f2")

        def agg(df):
            return df.agg(F.count(F.lit(1)).alias("n"))

        walls = {"model_order": [], "measured_order": []}
        ref = None
        for _ in range(2):
            for name, df in (
                ("model_order", model_df),
                ("measured_order", fixed_df),
            ):
                w, rows = _timed(agg(df))
                walls[name].append(w)
                if ref is None:
                    ref = rows
                assert rows == ref, f"{name} diverged"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thr)

    true_blowup = measured[tuple(edges[0])]
    return {
        "selinger_est_blowup_edge": int(sel),
        "histogram_est_blowup_edge": int(hist),
        "models_agree_within_probe_band": max(sel, hist) / max(1.0, min(sel, hist)) < 10.0,
        "true_blowup_edge_rows": int(true_blowup),
        "model_under_by": round(true_blowup / max(sel, hist), 1),
        "exact_measure_cost_s": measure_s,
        "order_model": order_model,
        "order_measured": order_fixed,
        "wall_model_order_s": min(walls["model_order"]),
        "wall_measured_order_s": min(walls["measured_order"]),
        "samples": walls,
        "result_rows_equal": True,
    }


def _persist(key: str, value) -> None:
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "SCALE_SF1_R9.json"
    )
    existing = {}
    if os.path.exists(path):
        with open(path) as f:
            existing = json.load(f)
    existing[key] = value
    with open(path, "w") as f:
        json.dump(existing, f, indent=1)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--parts", default="a,b")
    args = ap.parse_args()
    parts = set(args.parts.split(","))
    spark = get_spark("scale-round9")
    runners = {
        "a": ("wired_planner_sf1", part_a_wired_planner),
        "b": ("adversarial_skew_validated", part_b_adversarial_skew),
    }
    for p in "ab":
        if p in parts:
            key, fn = runners[p]
            result = fn(spark)
            print(json.dumps({key: result}))
            _persist(key, result)
    spark.stop()


if __name__ == "__main__":
    main()
