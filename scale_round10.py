"""Round-10 design-for-scale measurements.

A. **Bushy vs left-deep at sf1-scale** — the dim-filtered fact ⋈
   dim-filtered fact shape: plan_join_tree's round-10 bushy rung
   chain-folds each halo, sees the D2-shrunk F2 subtree fit the build
   budget, and broadcasts it (the facts never shuffle); the best
   left-deep expressible order must shuffle the full F2. Wall +
   shuffle-exchange counts, alternating, results asserted equal.
B. **Rollup quantile cost vs history size** — the same feed landed as
   1 batch vs 16 batches (and 16-compacted): `rollup_quantiles` serves
   percentiles from stored qhist partials, so its wall must be flat in
   batch-generation count and far under the raw-rescan exact
   percentile.
C. **q_lsh_suite at sf1.0** — the round-9 sweep tail (147 s): after
   the generator-projection fix in kmeans_centroids + single-literal
   vectors, re-measure the registry row end-to-end.

Diagnostic harness like scale_round9.py — not part of the driver
contract. Results: SCALE_SF1_R10.json + SCALE.md rows.
Usage: python scale_round10.py [--parts a,b,c]
"""

from __future__ import annotations

import argparse
import json
import os
import time

from pyspark.sql import functions as F

from custom_python_etl_data_connector_shivaask_username_spark.plans.inspect import (
    count_exchanges,
)
from custom_python_etl_data_connector_shivaask_username_spark.plans.stats import (
    collect_table_stats,
    plan_join_tree,
)
from custom_python_etl_data_connector_shivaask_username_spark.session import get_spark
from scale_sf1_suite import FULL_DIR

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "SCALE_SF1_R10.json")


def _timed(thunk):
    t0 = time.perf_counter()
    r = thunk()
    return round(time.perf_counter() - t0, 2), r


def part_a_bushy(spark) -> dict:
    """Dim-filtered fact pair at sf1-scale (6M + 4M rows)."""
    f1 = spark.range(0, 6_000_000).select(
        F.col("id").alias("k"), (F.col("id") % 600_000).alias("d1")
    )
    d1 = spark.range(0, 450_000).select(F.col("id").alias("d1k"))
    f2 = spark.range(0, 4_000_000).select(
        F.col("id").alias("k2"), (F.col("id") % 200_000).alias("d2")
    )
    d2 = spark.range(0, 10_000).select(F.col("id").alias("d2k"))
    tables = {"f1": f1, "d1": d1, "f2": f2, "d2": d2}
    edges = [
        ("f1", "d1", "d1", "d1k"),
        ("f1", "k", "f2", "k2"),
        ("f2", "d2", "d2", "d2k"),
    ]
    stats = {n: collect_table_stats(t) for n, t in tables.items()}
    thr = 32 * 1024 * 1024

    def bushy():
        df, order = plan_join_tree(
            tables, edges, stats=stats, broadcast_threshold=thr
        )
        return df, order

    bushy_df, order = bushy()
    # best left-deep order expressible: shrink F1 by its dim, then F2
    # must join at FULL size (96 MB estimated — over the 32 MB budget —
    # and the 4.5M-row intermediate over it too), then D2 attaches
    left_deep = (
        f1.join(F.broadcast(d1), F.col("d1") == F.col("d1k"))
        .join(f2.hint("merge"), F.col("k") == F.col("k2"))
        .join(F.broadcast(d2), F.col("d2") == F.col("d2k"))
    )
    ex_bushy = count_exchanges(bushy_df)
    ex_left = count_exchanges(left_deep)
    walls = {"bushy": [], "left_deep": []}
    counts = set()
    for _ in range(3):
        for name, df in (("left_deep", left_deep), ("bushy", bushy_df)):
            w, n = _timed(df.count)
            walls[name].append(w)
            counts.add(n)
    assert len(counts) == 1, counts
    return {
        "order": order,
        "rows": counts.pop(),
        "exchanges": {"bushy": ex_bushy, "left_deep": ex_left},
        "wall_bushy_s": min(walls["bushy"]),
        "wall_left_deep_s": min(walls["left_deep"]),
        "samples": walls,
    }


def part_b_quantile_history(spark) -> dict:
    """rollup_quantiles over 1-batch vs 16-batch vs compacted stores
    of the SAME sf1.0 events feed, plus the raw-rescan comparator."""
    import shutil
    import tempfile

    from custom_python_etl_data_connector_shivaask_username_spark.operators.rollup import (
        compact_rollup,
        refresh_rollup,
        rollup_quantiles,
    )
    from custom_python_etl_data_connector_shivaask_username_spark.tables import load_table

    ev = load_table(spark, FULL_DIR, "events")
    base = tempfile.mkdtemp(prefix="r10_qhist_")
    one = f"{base}/one"
    many = f"{base}/many"
    refresh_rollup(ev, one, batch_id=0)
    for i in range(16):
        refresh_rollup(ev.filter(F.col("event_id") % 16 == i), many, i)
    qs = [0.5, 0.95, 0.99]

    def quant(store):
        return sorted(
            map(tuple, rollup_quantiles(spark, store, qs).collect())
        )

    # warm both stores once, then best-of-3
    r_one = quant(one)
    r_many = quant(many)
    assert r_one == r_many, "merge-invariance broke"
    w_one = min(_timed(lambda: quant(one))[0] for _ in range(3))
    w_many = min(_timed(lambda: quant(many))[0] for _ in range(3))
    compact_rollup(spark, many)
    assert quant(many) == r_one
    w_compacted = min(_timed(lambda: quant(many))[0] for _ in range(3))
    # the raw-rescan comparator this partial exists to avoid
    def raw():
        return (
            ev.groupBy(F.date_trunc("hour", "ts").alias("w"), "event_type")
            .agg(*[
                F.expr(f"percentile(value, {q})").alias(f"p{int(q*100)}")
                for q in qs
            ])
            .collect()
        )

    raw()
    w_raw = min(_timed(raw)[0] for _ in range(3))
    shutil.rmtree(base, ignore_errors=True)
    return {
        "cells": len(r_one),
        "wall_1_batch_s": w_one,
        "wall_16_batches_s": w_many,
        "wall_compacted_s": w_compacted,
        "wall_raw_rescan_s": w_raw,
    }


def part_c_lsh_suite(spark) -> dict:
    """The round-9 sweep tail, re-measured at sf1.0."""
    from custom_python_etl_data_connector_shivaask_username_spark import registry

    registry.load_all()
    fn = registry.QUERIES["q_lsh_suite"]
    walls = []
    n = None
    for _ in range(2):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        n = len(fn(spark, FULL_DIR).collect())
        walls.append(round(time.perf_counter() - t0, 2))
    return {"rows": n, "wall_s": min(walls), "samples": walls}


def _persist(key: str, value) -> None:
    data = {}
    if os.path.exists(RESULTS):
        with open(RESULTS) as f:
            data = json.load(f)
    data[key] = value
    with open(RESULTS, "w") as f:
        json.dump(data, f, indent=1)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--parts", default="a,b,c")
    args = ap.parse_args()
    parts = set(args.parts.split(","))
    spark = get_spark("scale-round10", cpus=32)
    for p, key, fn in (
        ("a", "bushy_vs_left_deep_sf1", part_a_bushy),
        ("b", "quantile_history_independence", part_b_quantile_history),
        ("c", "lsh_suite_sf1_after_fix", part_c_lsh_suite),
    ):
        if p in parts:
            out = fn(spark)
            _persist(key, out)
            print(json.dumps({key: out}))
    spark.stop()


if __name__ == "__main__":
    main()
