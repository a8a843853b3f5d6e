"""Round-8 measured scale artifacts (SCALE.md rows, judge asks #3/#4/#6):

A. **X28 Bloom index-probe pruning at sf1.0** — the round-6 "done"
   criterion: index-scan rows surviving the probe's Bloom prefilter
   vs the full index, plus probe wall-time both ways, measured on the
   on-disk sf1.0 corpus (50k docs).
B. **Contamination gram-stream pruning at sf1.0** (round 8's X28
   extension): corpus gram rows entering the join with vs without the
   benchmark-gram Bloom filter, plus end-to-end wall both ways.
C. **×30 tail (sf3-equivalent)** for the two >90 s sf1.0 sweep rows:
   ``q_similar_pairs_within_label`` and ``q_lsh_suite`` timed at ×10
   (the existing on-disk sf1.0 corpus) and ×30 (documents/embeddings/
   events replicated on disk at 30× sf0.1, same perturbations);
   fitted exponent ``log(t30/t10)/log 3``. At ×30 the embeddings
   labels hold ~15k vectors — PAST the measured 10k pair-join cap —
   so this run also observes the cap engaging one decade beyond where
   it was derived (block sizes + wall recorded).

Diagnostic harness like scale_check.py / scale_sf1.py — not part of
the driver contract. Results: SCALE_R8.json + SCALE.md rows.
Usage: python scale_round8.py [--parts a,b,c]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import time

from pyspark.sql import functions as F

from custom_python_etl_data_connector_shivaask_username_spark.session import get_spark
from custom_python_etl_data_connector_shivaask_username_spark.tables import load_table
from scale_check import replicate
from scale_sf1 import OUT_DIR, SF_DIR, _perturb_vec
from scale_sf1_suite import FULL_DIR

X30_DIR = os.path.join(OUT_DIR, "sf3.0")
X30_FACTOR = 30
X30_TABLES = {  # only the tables the two tail queries touch
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id", "user_id"],
}


def _gen_x30(spark) -> None:
    for name, id_cols in X30_TABLES.items():
        out = f"{X30_DIR}/{name}.parquet"
        if os.path.exists(out):
            continue
        df = load_table(spark, SF_DIR, name)
        rep = replicate(
            df,
            X30_FACTOR,
            id_cols,
            perturb_text="text" if name == "documents" else None,
        )
        if name == "embeddings":
            rep = _perturb_vec(rep)
        (
            rep.repartition(32)
            .write.mode("overwrite")
            .option("parquet.block.size", 1024 * 1024)
            .parquet(out)
        )


def part_a_bloom_probe(spark) -> dict:
    from custom_python_etl_data_connector_shivaask_username_spark.functions.bloom import (
        bloom_prune,
        build_bloom,
    )
    from custom_python_etl_data_connector_shivaask_username_spark.operators.llm_dedup import (
        band_triples,
        build_minhash_index,
        probe_minhash_index,
    )

    docs = load_table(spark, FULL_DIR, "documents")
    # fresh near-dup increment: 500 corpus docs, lightly edited
    inc = (
        docs.filter(F.col("doc_id") % 97 == 0)
        .limit(500)
        .select(
            (F.col("doc_id") + 10_000_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" probe edit")).alias("text"),
        )
    )
    index = build_minhash_index(docs)
    index_rows = index.count()
    bf = build_bloom(band_triples(inc), ["band_id", "bucket"])
    survivors = bloom_prune(index, bf).count()
    out = {"index_rows": index_rows, "bloom_survivors": survivors,
           "survivor_frac": round(survivors / index_rows, 4)}
    for flag in (False, True):
        t0 = time.perf_counter()
        n = probe_minhash_index(index, docs, inc, bloom_prefilter=flag).count()
        out[f"probe_sec_bloom_{flag}"] = round(time.perf_counter() - t0, 2)
        out[f"probe_pairs_bloom_{flag}"] = n
    return out


def part_b_contamination(spark) -> dict:
    from custom_python_etl_data_connector_shivaask_username_spark.functions.bloom import (
        bloom_prune,
        build_bloom,
    )
    from custom_python_etl_data_connector_shivaask_username_spark.operators.llm_curation import (
        _gram_hashes,
        contamination_pairs,
    )

    docs = load_table(spark, FULL_DIR, "documents")
    bench = docs.filter(F.col("doc_id") < 10)
    tg = _gram_hashes(docs, "doc_id", "text", 8, "train_id")
    bg = _gram_hashes(bench, "doc_id", "text", 8, "bench_id")
    full = tg.count()
    kept = bloom_prune(tg, build_bloom(bg, ["gh"])).count()
    out = {"gram_rows_full": full, "gram_rows_after_bloom": kept,
           "gram_frac": round(kept / full, 5)}
    for flag in (False, True):
        t0 = time.perf_counter()
        n = contamination_pairs(
            docs, bench, threshold=0.0, bloom_prefilter=flag
        ).count()
        out[f"contam_sec_bloom_{flag}"] = round(time.perf_counter() - t0, 2)
        out[f"contam_pairs_bloom_{flag}"] = n
    return out


def part_c_x30_tail(spark) -> dict:
    from custom_python_etl_data_connector_shivaask_username_spark import registry

    registry.load_all()
    _gen_x30(spark)
    out: dict = {}
    emb30 = load_table(spark, X30_DIR, "embeddings")
    blocks = (
        emb30.groupBy("label").count().agg(
            F.max("count").alias("mx"), F.count(F.lit(1)).alias("n")
        ).first()
    )
    out["x30_max_label_block"] = int(blocks["mx"])  # > 10k cap => sub-blocking
    for qname in ("q_similar_pairs_within_label", "q_lsh_suite"):
        fn = registry.QUERIES[qname]
        for tag, sf_dir in (("x10", FULL_DIR), ("x30", X30_DIR)):
            t0 = time.perf_counter()
            n = len(fn(spark, sf_dir).collect())
            out[f"{qname}_{tag}_sec"] = round(time.perf_counter() - t0, 2)
            out[f"{qname}_{tag}_rows"] = n
        out[f"{qname}_exponent"] = round(
            math.log(
                out[f"{qname}_x30_sec"] / out[f"{qname}_x10_sec"]
            ) / math.log(3),
            3,
        )
    return out


def part_d_zorder_skipping(spark) -> dict:
    """Multi-column Z-order file-skipping proof at sf1.0 (SURVEY §8
    candidate): the sf1.0 events table written (i) range-sorted on
    ``value`` only and (ii) Z-ordered on ``(value, user_id)``; then a
    selective BOX predicate on both columns is evaluated against the
    parquet row-group footers — counting row groups whose min/max
    stats OVERLAP the box, i.e. exactly what Spark's scan reads after
    pushdown. 1-D layouts prune only their sort column; Z-order prunes
    on both."""
    import glob

    import pyarrow.parquet as pq

    from custom_python_etl_data_connector_shivaask_username_spark.sources.layout import (
        write_zordered,
    )

    ev = load_table(spark, FULL_DIR, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    # predicate bounds from QUANTILES of the actual data (the replica
    # offsets make the user_id domain sparse — midpoint-of-min/max
    # boxes can land between clusters and match nothing)
    qs = ev.agg(
        F.expr("percentile_approx(value, array(0.45D, 0.55D), 10000)").alias("v"),
        F.expr("percentile_approx(user_id, array(0.45D, 0.55D), 10000)").alias("u"),
    ).first()
    v_lo, v_hi = float(qs["v"][0]), float(qs["v"][1])
    u_lo, u_hi = int(qs["u"][0]), int(qs["u"][1])
    linear = os.path.join(OUT_DIR, "events_linear")
    zpath = os.path.join(OUT_DIR, "events_zorder")
    (
        ev.repartitionByRange(32, "value")
        .sortWithinPartitions("value")
        .write.mode("overwrite")
        .option("parquet.block.size", 1024 * 1024)
        .parquet(linear)
    )
    write_zordered(ev, zpath, ["value", "user_id"], num_files=32)

    preds = {
        "value_slice": lambda: (F.col("value") >= v_lo) & (F.col("value") <= v_hi),
        "user_slice": lambda: (F.col("user_id") >= u_lo) & (F.col("user_id") <= u_hi),
        "box": lambda: (F.col("value") >= v_lo) & (F.col("value") <= v_hi)
        & (F.col("user_id") >= u_lo) & (F.col("user_id") <= u_hi),
    }
    stat_preds = {
        "value_slice": lambda sv, su: sv.min <= v_hi and sv.max >= v_lo,
        "user_slice": lambda sv, su: su.min <= u_hi and su.max >= u_lo,
        "box": lambda sv, su: sv.min <= v_hi and sv.max >= v_lo
        and su.min <= u_hi and su.max >= u_lo,
    }

    def overlap(path, pred):
        total, hit = 0, 0
        for f in glob.glob(f"{path}/part-*.parquet"):
            md = pq.ParquetFile(f).metadata
            idx = {
                md.row_group(0).column(ci).path_in_schema: ci
                for ci in range(md.num_columns)
            }
            for rg in range(md.num_row_groups):
                total += 1
                sv = md.row_group(rg).column(idx["value"]).statistics
                su = md.row_group(rg).column(idx["user_id"]).statistics
                if pred(sv, su):
                    hit += 1
        return hit, total

    out = {"bounds": [v_lo, v_hi, u_lo, u_hi]}
    for pname in preds:
        rows = {}
        for tag, path in (("linear", linear), ("zorder", zpath)):
            hit, total = overlap(path, stat_preds[pname])
            out[f"{pname}_{tag}_rowgroups"] = f"{hit}/{total}"
            rows[tag] = (
                spark.read.parquet(path).filter(preds[pname]()).count()
            )
        assert rows["linear"] == rows["zorder"], rows  # same answer
        out[f"{pname}_rows"] = rows["linear"]
    return out


def part_e_stream_sink(spark) -> dict:
    """X30 streaming rollup sink at sf1.0 (1M events, 8 microbatches):
    the DSv2 stream sink (map-side Arrow partialization, zero shuffle,
    no state store) vs the prior loop of per-batch ``refresh_rollup``
    calls (JVM shuffle agg + DSv2 batch write per slice). Same slices,
    same store layout; stores must read back identical. Also records
    per-epoch trigger durations — the sink never reads the store, so
    epoch cost must stay flat as the store grows."""
    import glob
    import shutil
    import tempfile

    from custom_python_etl_data_connector_shivaask_username_spark.operators.rollup import (
        read_rollup,
        refresh_rollup,
    )
    from custom_python_etl_data_connector_shivaask_username_spark.sources.rollup_store import (
        stream_cells,
    )

    base = tempfile.mkdtemp(prefix="sg_r8e_")
    slices_dir = f"{base}/slices"
    os.makedirs(slices_dir)
    ev = load_table(spark, FULL_DIR, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    n_slices = 8
    for i in range(n_slices):
        staging = f"{base}/stage_{i}"
        ev.filter(F.col("event_id") % n_slices == i).coalesce(
            1
        ).write.mode("overwrite").parquet(staging)
        shutil.move(
            glob.glob(f"{staging}/part-*.parquet")[0],
            f"{slices_dir}/slice-{i}.parquet",
        )
        shutil.rmtree(staging)

    # baseline: the per-batch refresh loop (one JVM agg + write each)
    store_a = f"{base}/store_batchloop"
    t0 = time.time()
    for i in range(n_slices):
        refresh_rollup(
            spark.read.parquet(f"{slices_dir}/slice-{i}.parquet"),
            store_a,
            batch_id=i,
        )
    wall_loop = time.time() - t0

    # X30: one streaming query, the sink aggregates per epoch
    store_b = f"{base}/store_streamsink"
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(slices_dir)
    )
    t0 = time.time()
    q = stream_cells(stream, store_b, f"{base}/cp")
    q.awaitTermination(600)
    wall_stream = time.time() - t0
    progress = q.recentProgress
    epoch_ms = [p["durationMs"]["triggerExecution"] for p in progress]
    rows_in = sum(p["numInputRows"] for p in progress)
    assert all(p["stateOperators"] == [] for p in progress)

    got_a = sorted(map(tuple, read_rollup(spark, store_a).collect()))
    got_b = sorted(map(tuple, read_rollup(spark, store_b).collect()))
    assert got_a == got_b, "stream-sink store diverged from batch loop"
    out = {
        "events": ev.count(),
        "slices": n_slices,
        "rows_through_sink": rows_in,
        "wall_refresh_loop_s": round(wall_loop, 2),
        "wall_stream_sink_s": round(wall_stream, 2),
        "epoch_trigger_ms": epoch_ms,
        "rollup_rows": len(got_b),
        "stores_equal": True,
    }
    shutil.rmtree(base, ignore_errors=True)
    return out


def part_f_join_planner(spark) -> dict:
    """X31 join-order planner at sf1.0: revenue-by-nation for one
    region over lineitem⋈orders⋈customer⋈nation⋈region(filtered),
    written in the WORST reasonable user order (fact-first: the 6M-row
    lineitem⋈orders intermediate is built before any dim shrinks it)
    vs the stats-planned order (selective dims folded first, broadcast
    hints from sidecar-grade stats). Both run under identical session
    confs; results must match. Also records the stats-collection cost
    and one estimate-vs-actual cardinality check."""
    from custom_python_etl_data_connector_shivaask_username_spark.plans.stats import (
        collect_table_stats,
        estimate_join_rows,
        plan_join_tree,
    )

    tables = {
        "lineitem": load_table(spark, FULL_DIR, "lineitem"),
        "orders": load_table(spark, FULL_DIR, "orders"),
        "customer": load_table(spark, FULL_DIR, "customer"),
        "nation": load_table(spark, FULL_DIR, "nation"),
        "region": load_table(spark, FULL_DIR, "region").filter(
            F.col("r_name") == "EUROPE"
        ),
    }
    edges = [
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("customer", "c_nationkey", "nation", "n_nationkey"),
        ("nation", "n_regionkey", "region", "r_regionkey"),
    ]

    def agg(df):
        # exact-decimal sum (compat.py strategy) so the two join orders
        # compare EQUAL — a double sum is fp-order-sensitive and the
        # whole point is that the plans aggregate in different orders
        from custom_python_etl_data_connector_shivaask_username_spark.compat import DEC

        return (
            df.groupBy("n_name")
            .agg(
                F.sum(
                    (
                        F.col("l_extendedprice")
                        * (1 - F.col("l_discount"))
                    ).cast(DEC)
                ).alias("revenue")
            )
            .orderBy("n_name")
        )

    # warm the page cache so neither arm pays the first cold read
    for t in tables.values():
        t.count()

    t0 = time.time()
    stats = {k: collect_table_stats(v) for k, v in tables.items()}
    stats_wall = time.time() - t0

    worst = (
        tables["lineitem"]
        .join(tables["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(tables["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(tables["nation"], F.col("c_nationkey") == F.col("n_nationkey"))
        .join(tables["region"], F.col("n_regionkey") == F.col("r_regionkey"))
    )

    def timed(df):
        t0 = time.time()
        rows = agg(df).collect()
        return round(time.time() - t0, 2), [tuple(r) for r in rows]

    out = {"stats_collect_s": round(stats_wall, 2)}

    # regime 1 — SHUFFLE WORLD (the 100 TB analog: at real scale none
    # of these tables is broadcastable, so both arms run shuffle joins
    # and the ONLY variable is the join order). Broadcast disabled
    # session-wide AND in the planner.
    old_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        planned, order = plan_join_tree(
            tables, edges, stats=stats, broadcast_threshold=-1
        )
        out["order"] = order
        walls = {"planned": [], "worst": []}
        ref = None
        for _ in range(2):
            for name, df in (("worst", worst), ("planned", planned)):
                w, rows = timed(df)
                walls[name].append(w)
                if ref is None:
                    ref = rows
                assert rows == ref, f"{name} diverged"
        out["shuffle_regime"] = {
            "wall_planned_s": min(walls["planned"]),
            "wall_worst_order_s": min(walls["worst"]),
            "samples": walls,
        }
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thr)

    # regime 2 — DEFAULT THRESHOLDS (local sf1.0: every table fits in
    # broadcast, Spark's own size heuristics already produce an
    # all-broadcast star; the planner must not do worse)
    planned2, _ = plan_join_tree(tables, edges, stats=stats)
    walls2 = {"planned": [], "worst": []}
    for _ in range(2):
        for name, df in (("worst", worst), ("planned", planned2)):
            w, rows = timed(df)
            walls2[name].append(w)
            assert rows == ref, f"{name} diverged (default regime)"
    out["default_regime"] = {
        "wall_planned_s": min(walls2["planned"]),
        "wall_worst_order_s": min(walls2["worst"]),
        "samples": walls2,
    }

    est_lo = estimate_join_rows(
        stats["lineitem"], "l_orderkey", stats["orders"], "o_orderkey"
    )
    actual_lo = (
        tables["lineitem"]
        .join(tables["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .count()
    )
    out.update(
        {
            "result_rows": len(ref),
            "est_lineitem_orders": int(est_lo),
            "actual_lineitem_orders": actual_lo,
            "est_over_actual": round(est_lo / max(1, actual_lo), 3),
        }
    )
    return out


def part_g_gapfill_and_stats(spark) -> dict:
    """X32/X33/X35 at sf1.0.

    X32: dense hourly gap-fill over the 1M-event feed's rollup — the
    spine is (types × hours), metadata-scale regardless of feed size;
    record wall, dense rows, gap fraction.

    X33: sampled ANALYZE on lineitem (6M rows) at q=1% vs the full
    one-pass scan — wall both ways plus the GEE NDV estimate vs the
    HLL full-scan estimate on the join key the planner actually uses.

    X35: the same lineitem delivered as 8 batches with per-batch
    partials; record per-batch partial cost, merged-read cost, and
    merged NDV vs full-scan — the "stats stay fresh without
    re-ANALYZE" claim, measured."""
    import shutil
    import tempfile

    from custom_python_etl_data_connector_shivaask_username_spark.operators.rollup import (
        refresh_rollup,
    )
    from custom_python_etl_data_connector_shivaask_username_spark.operators.timeseries import (
        gap_fill_rollup,
    )
    from custom_python_etl_data_connector_shivaask_username_spark.plans.incremental_stats import (
        append_stats_partial,
        read_incremental_stats,
    )
    from custom_python_etl_data_connector_shivaask_username_spark.plans.stats import (
        collect_table_stats,
        collect_table_stats_sampled,
    )

    out: dict = {}
    base = tempfile.mkdtemp(prefix="sg_r8g_")

    # --- X32 gap fill over the sf1.0 rollup -------------------------
    # the raw 1M-event feed covers every hour (0 gaps — the spine just
    # reproduces the rollup), so ALSO roll up a 1-in-50 sparse slice:
    # real gaps, same metadata-scale spine
    ev = load_table(spark, FULL_DIR, "events")
    for tag, feed in (
        ("dense", ev),
        ("sparse50", ev.filter(F.col("event_id") % 50 == 0)),
    ):
        store = f"{base}/store_{tag}"
        refresh_rollup(feed, store, batch_id=0)
        t0 = time.time()
        dense = gap_fill_rollup(spark, store).collect()
        wall_fill = time.time() - t0
        gaps = sum(1 for r in dense if r["is_gap"])
        out[f"gapfill_{tag}"] = {
            "events": feed.count(),
            "dense_rows": len(dense),
            "gap_rows": gaps,
            "wall_s": round(wall_fill, 2),
        }

    # --- X33 sampled vs full ANALYZE on lineitem ---------------------
    li_path = f"{FULL_DIR}/lineitem.parquet"
    li = spark.read.parquet(li_path)
    t0 = time.time()
    full = collect_table_stats(li)
    wall_full = time.time() - t0
    t0 = time.time()
    samp = collect_table_stats_sampled(li, fraction=0.01, seed=8)
    wall_samp = time.time() - t0
    # the planner's actual need: key columns only, both ways
    keys = ["l_orderkey", "l_suppkey", "l_partkey"]
    t0 = time.time()
    collect_table_stats(li, columns=keys)
    wall_full_keys = time.time() - t0
    t0 = time.time()
    collect_table_stats_sampled(li, fraction=0.01, seed=8, columns=keys)
    wall_samp_keys = time.time() - t0
    out["sampled_analyze"] = {
        "rows": full["row_count"],
        "wall_full_s": round(wall_full, 2),
        "wall_sampled_q01_s": round(wall_samp, 2),
        "wall_full_keys_s": round(wall_full_keys, 2),
        "wall_sampled_q01_keys_s": round(wall_samp_keys, 2),
        "rowcount_est": samp["row_count"],
        "ndv_orderkey_full": full["columns"]["l_orderkey"]["ndv"],
        "ndv_orderkey_sampled": samp["columns"]["l_orderkey"]["ndv"],
        "ndv_suppkey_full": full["columns"]["l_suppkey"]["ndv"],
        "ndv_suppkey_sampled": samp["columns"]["l_suppkey"]["ndv"],
    }

    # --- X35 incremental partials over 8 deliveries ------------------
    tpath = f"{base}/lineitem_inc"
    li.write.parquet(tpath)
    inc_tbl = spark.read.parquet(tpath)
    walls = []
    cols = ["l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice"]
    for i in range(8):
        b = inc_tbl.filter(F.col("l_orderkey") % 8 == i)
        t0 = time.time()
        append_stats_partial(b, tpath, batch_id=i, columns=cols)
        walls.append(round(time.time() - t0, 2))
    t0 = time.time()
    merged = read_incremental_stats(spark, tpath)
    wall_read = time.time() - t0
    out["incremental_stats"] = {
        "batches": 8,
        "per_batch_partial_s": walls,
        "merged_read_s": round(wall_read, 2),
        "ndv_orderkey_merged": merged["columns"]["l_orderkey"]["ndv"],
        "ndv_orderkey_full": full["columns"]["l_orderkey"]["ndv"],
        "rowcount_exact": merged["row_count"] == full["row_count"],
    }
    shutil.rmtree(base, ignore_errors=True)
    return out


def _persist(key: str, value: dict) -> None:
    """Merge one part's result into SCALE_R8.json immediately — a
    later part failing must not lose an earlier part's measurement."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "SCALE_R8.json")
    existing = {}
    if os.path.exists(path):
        with open(path) as f:
            existing = json.load(f)
    existing[key] = value
    with open(path, "w") as f:
        json.dump(existing, f, indent=1)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--parts", default="a,b,c,d,e,f,g")
    args = ap.parse_args()
    parts = set(args.parts.split(","))
    spark = get_spark("scale-round8")
    runners = {
        "a": ("bloom_probe_sf1", part_a_bloom_probe),
        "b": ("contamination_sf1", part_b_contamination),
        "c": ("x30_tail", part_c_x30_tail),
        "d": ("zorder_sf1", part_d_zorder_skipping),
        "e": ("stream_sink_sf1", part_e_stream_sink),
        "f": ("join_planner_sf1", part_f_join_planner),
        "g": ("gapfill_stats_sf1", part_g_gapfill_and_stats),
    }
    for p in "abcdefg":
        if p in parts:
            key, fn = runners[p]
            result = fn(spark)
            print(json.dumps({key: result}))
            _persist(key, result)
    spark.stop()


if __name__ == "__main__":
    main()
