"""Round-11 design-for-scale measurements.

A. **Pair kernel at sf1.0** — the round-10 sweep tail (206 s, 32% of
   the whole sweep): `q_similar_pairs_within_label` re-measured with
   the BLAS `applyInPandas` kernel (default) against the retained HOF
   form, rows asserted identical (the kernel-parity pin at scale).
B. **Quantile serving constant** — the round-10 finding that the X51
   store path (1.42-1.76 s) lost to a raw exact rescan (0.96 s) at the
   sf1.0 16-batch store: re-measure with the cell-local
   ``aggregate``/``map_zip_with`` fold (``impl="cellfold"``) against
   the exploded round-10 formulation and the raw rescan, answers
   asserted identical between impls.
C. **q_lsh_suite at sf1.0** — the suite end-to-end after the measured
   tail cut (Arrow pq_encode + GEMM pair kernel in semdedup/emb_dup).

Diagnostic harness like scale_round10.py — not part of the driver
contract. Results: SCALE_SF1_R11.json + SCALE.md rows.
Usage: python scale_round11.py [--parts a,b,c]
"""

from __future__ import annotations

import argparse
import json
import os
import time

from pyspark.sql import functions as F

from custom_python_etl_data_connector_shivaask_username_spark.session import get_spark
from scale_sf1_suite import FULL_DIR

RESULTS = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "SCALE_SF1_R11.json"
)


def _timed(thunk):
    t0 = time.perf_counter()
    r = thunk()
    return round(time.perf_counter() - t0, 2), r


def part_a_pair_kernel(spark) -> dict:
    """arrow-vs-hof pair kernel at sf1.0, rows identical."""
    from custom_python_etl_data_connector_shivaask_username_spark.operators.llm_similarity import (
        similar_pairs_within_label_df,
    )
    from custom_python_etl_data_connector_shivaask_username_spark.tables import load_table

    emb = load_table(spark, FULL_DIR, "embeddings")

    def run(kernel):
        return [
            tuple(r)
            for r in similar_pairs_within_label_df(
                emb, kernel=kernel
            ).collect()
        ]

    w_arrow0, rows_a = _timed(lambda: run("arrow"))  # warm
    # the HOF form runs ONCE (~3.5 min at sf1.0 — a best-of-N of the
    # known-slow baseline buys nothing; round 10's sweep row already
    # brackets it at 174-206 s)
    w_hof, rows_h = _timed(lambda: run("hof"))
    assert rows_a == rows_h, "kernel parity broke at sf1.0"
    wa = [w_arrow0] + [_timed(lambda: run("arrow"))[0] for _ in range(2)]
    return {
        "rows": len(rows_a),
        "wall_arrow_s": min(wa),
        "wall_hof_s": w_hof,
        "samples_arrow": wa,
    }


def part_b_quantile_serving(spark) -> dict:
    """cellfold vs exploded vs raw rescan at the 16-batch sf1.0 store."""
    import shutil
    import tempfile

    from custom_python_etl_data_connector_shivaask_username_spark.operators.rollup import (
        refresh_rollup,
        rollup_quantiles,
    )
    from custom_python_etl_data_connector_shivaask_username_spark.tables import load_table

    ev = load_table(spark, FULL_DIR, "events")
    base = tempfile.mkdtemp(prefix="r11_qserve_")
    many = f"{base}/many"
    for i in range(16):
        refresh_rollup(ev.filter(F.col("event_id") % 16 == i), many, i)
    qs = [0.5, 0.95, 0.99]

    def quant(impl):
        return sorted(
            map(
                tuple,
                rollup_quantiles(spark, many, qs, impl=impl).collect(),
            )
        )

    r_cell = quant("cellfold")  # warm + answers
    r_expl = quant("exploded")
    r_arrow = quant("arrow")
    assert r_cell == r_expl == r_arrow, "impl equivalence broke at sf1.0"
    w_cell = min(_timed(lambda: quant("cellfold"))[0] for _ in range(3))
    w_expl = min(_timed(lambda: quant("exploded"))[0] for _ in range(3))
    w_arrow = min(_timed(lambda: quant("arrow"))[0] for _ in range(3))
    # and on the compacted store (1 partial row per cell)
    from custom_python_etl_data_connector_shivaask_username_spark.operators.rollup import (
        compact_rollup,
    )

    compact_rollup(spark, many)
    assert quant("arrow") == r_arrow
    w_arrow_c = min(_timed(lambda: quant("arrow"))[0] for _ in range(3))
    w_expl_c = min(_timed(lambda: quant("exploded"))[0] for _ in range(3))
    w_cell_c = min(_timed(lambda: quant("cellfold"))[0] for _ in range(3))

    def raw():
        return (
            ev.groupBy(F.date_trunc("hour", "ts").alias("w"), "event_type")
            .agg(
                *[
                    F.expr(f"percentile(value, {q})").alias(f"p{int(q*100)}")
                    for q in qs
                ]
            )
            .collect()
        )

    raw()
    w_raw = min(_timed(raw)[0] for _ in range(3))
    shutil.rmtree(base, ignore_errors=True)
    return {
        "cells": len(r_cell),
        "wall_cellfold_s": w_cell,
        "wall_exploded_s": w_expl,
        "wall_arrow_s": w_arrow,
        "wall_arrow_compacted_s": w_arrow_c,
        "wall_exploded_compacted_s": w_expl_c,
        "wall_cellfold_compacted_s": w_cell_c,
        "wall_raw_rescan_s": w_raw,
    }


def part_d_quantile_crossover(spark, factor: int = 4) -> dict:
    """The slope claim measured at BOTH ends: at 1M events the raw
    exact rescan beats the store path's constant (part b); at 4M
    events — same time range, same 10,800 cells, 4× the rows — the
    raw rescan pays 4× while the store path's cost is unchanged
    (cells × occupied buckets, whatever the feed size)."""
    import shutil
    import tempfile

    from custom_python_etl_data_connector_shivaask_username_spark.operators.rollup import (
        refresh_rollup,
        rollup_quantiles,
    )
    from custom_python_etl_data_connector_shivaask_username_spark.tables import load_table

    ev1 = load_table(spark, FULL_DIR, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    # 4x the feed into the SAME cells: replicate with value jitter and
    # distinct event ids (ts unchanged -> identical cell grid)
    ev4 = ev1
    for i in range(1, factor):
        ev4 = ev4.unionByName(
            ev1.select(
                (F.col("event_id") + F.lit(i * 10_000_000)).alias("event_id"),
                "ts",
                "user_id",
                "event_type",
                (F.col("value") + i * 0.125).alias("value"),
            )
        )
    base = tempfile.mkdtemp(prefix="r11_cross_")
    # materialize the replicated feed once — refreshing 16 batches off
    # a lazy 16-way union would recompute it per batch
    feed_path = f"{base}/feed"
    ev4.write.parquet(feed_path)
    ev4 = spark.read.parquet(feed_path)
    store = f"{base}/store"
    for i in range(16):
        refresh_rollup(ev4.filter(F.col("event_id") % 16 == i), store, i)
    qs = [0.5, 0.95, 0.99]

    def quant():
        return rollup_quantiles(spark, store, qs).collect()

    rows = len(quant())  # warm
    w_store = min(_timed(quant)[0] for _ in range(3))

    def raw():
        return (
            ev4.groupBy(F.date_trunc("hour", "ts").alias("w"), "event_type")
            .agg(
                *[
                    F.expr(f"percentile(value, {q})").alias(f"p{int(q*100)}")
                    for q in qs
                ]
            )
            .collect()
        )

    raw()
    w_raw = min(_timed(raw)[0] for _ in range(3))
    n_events = ev4.count()
    shutil.rmtree(base, ignore_errors=True)
    return {
        "events": n_events,
        "cells": rows // len(qs),
        "wall_store_s": w_store,
        "wall_raw_rescan_s": w_raw,
    }


def part_c_lsh_suite(spark) -> dict:
    """The suite end-to-end at sf1.0 after the measured tail cut."""
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
    spark = get_spark("scale-round11", cpus=32)
    for p, key, fn in (
        ("a", "pair_kernel_sf1", part_a_pair_kernel),
        ("b", "quantile_serving_impls", part_b_quantile_serving),
        ("c", "lsh_suite_sf1_r11", part_c_lsh_suite),
        ("d", "quantile_crossover_4m", part_d_quantile_crossover),
        ("e", "quantile_crossover_16m", lambda s: part_d_quantile_crossover(s, factor=16)),
    ):
        if p in parts:
            out = fn(spark)
            _persist(key, out)
            print(json.dumps({key: out}))
    spark.stop()


if __name__ == "__main__":
    main()
