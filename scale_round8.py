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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--parts", default="a,b,c,d")
    args = ap.parse_args()
    parts = set(args.parts.split(","))
    spark = get_spark("scale-round8")
    results: dict = {}
    if "a" in parts:
        results["bloom_probe_sf1"] = part_a_bloom_probe(spark)
        print(json.dumps({"bloom_probe_sf1": results["bloom_probe_sf1"]}))
    if "b" in parts:
        results["contamination_sf1"] = part_b_contamination(spark)
        print(json.dumps({"contamination_sf1": results["contamination_sf1"]}))
    if "c" in parts:
        results["x30_tail"] = part_c_x30_tail(spark)
        print(json.dumps({"x30_tail": results["x30_tail"]}))
    if "d" in parts:
        results["zorder_sf1"] = part_d_zorder_skipping(spark)
        print(json.dumps({"zorder_sf1": results["zorder_sf1"]}))
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "SCALE_R8.json")
    existing = {}
    if os.path.exists(path):
        with open(path) as f:
            existing = json.load(f)
    existing.update(results)
    with open(path, "w") as f:
        json.dump(existing, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
