"""sf1.0 dry-run: the LLM dedup suite against genuinely larger FILES.

``scale_check.py`` replicates fixtures in-memory, which validates shuffle
and candidate-growth behavior but not the scan side: a replicated
DataFrame starts pre-partitioned, so it never exercises multi-row-group
parquet splits, and ``spread_small_input`` never gets the chance to
(correctly) no-op. This harness closes that gap:

1. Materializes an sf1.0-scale corpus ON DISK under ``.scale_sf1/``:
   ``documents`` and ``embeddings`` replicated x10 from sf0.1 with the
   same perturbations scale_check uses (word-level text tags / elementwise
   vector noise, so replicas are NOT near-dups of each other and the pair
   output cannot grow quadratically by construction). Written via 32
   shuffle partitions with a 1 MiB parquet block size — dozens of files,
   each with multiple row groups, like a real table slice.
2. Times exact dedup, MinHash-LSH near-dup, and adaptive embedding
   near-dup reading FROM PARQUET at sf0.1 (x1) and sf1.0 (x10); fitted
   exponent is ``log(t10/t1)/log 10``.
3. Asserts the scan-side invariants the in-memory harness cannot:
   the sf1.0 documents scan arrives in >= defaultParallelism partitions,
   so ``spread_small_input`` must return the input UNCHANGED (its guard
   exists precisely for this case), and ``emb_dup_config`` must hold
   per-cell occupancy roughly constant across the x10 growth.

Diagnostic harness like scale_check.py, not part of the driver contract;
results recorded in SCALE.md. Usage: python scale_sf1.py [--regen]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import time

from pyspark.sql import DataFrame, functions as F

from custom_python_etl_data_connector_shivaask_username_spark.operators.llm_dedup import (
    build_minhash_index,
    near_dup_pairs,
    probe_minhash_index,
)
from custom_python_etl_data_connector_shivaask_username_spark.operators.llm_similarity import (
    emb_dup_config,
    embedding_near_dup_pairs,
)
from custom_python_etl_data_connector_shivaask_username_spark.session import get_spark
from custom_python_etl_data_connector_shivaask_username_spark.tables import (
    load_table,
    spread_small_input,
)
from scale_check import replicate

SF_DIR = "/root/testdata/sf0.1"
OUT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".scale_sf1")
FACTOR = 10


def _perturb_vec(df: DataFrame) -> DataFrame:
    """Same replica noise as scale_check: cosine(replica, original) ~0.86,
    below the 0.95 near-dup bar, so x10 does not plant 10-cliques."""
    return df.withColumn(
        "embedding",
        F.transform(
            F.col("embedding"),
            lambda v, i: v
            + 0.13
            * ((F.abs(F.xxhash64(F.col("vec_id"), i)) % 2001) / F.lit(1000.0) - 1),
        ),
    )


def generate(spark) -> None:
    docs = replicate(
        load_table(spark, SF_DIR, "documents"), FACTOR, ["doc_id"], perturb_text="text"
    )
    emb = _perturb_vec(replicate(load_table(spark, SF_DIR, "embeddings"), FACTOR, ["vec_id"]))
    # 1 MiB row groups force several row groups per file — the multi-split
    # scan shape a real large table has, at a size this container affords.
    for name, df in (("documents", docs), ("embeddings", emb)):
        (
            df.repartition(32)
            .write.mode("overwrite")
            .option("parquet.block.size", 1 << 20)
            .parquet(f"{OUT_DIR}/{name}.parquet")
        )


def timed(build) -> float:
    t0 = time.perf_counter()
    build().write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--regen", action="store_true")
    args = ap.parse_args()

    spark = get_spark("scale-sf1")
    if args.regen or not os.path.isdir(f"{OUT_DIR}/documents.parquet"):
        generate(spark)

    def docs_at(sf_dir):
        return load_table(spark, sf_dir, "documents")

    def emb_at(sf_dir):
        return load_table(spark, sf_dir, "embeddings")

    # scan-side invariant: the big scan is already parallel; spread must no-op
    big = docs_at(OUT_DIR)
    n_parts = big.rdd.getNumPartitions()
    assert spread_small_input(big) is big, (
        f"spread_small_input must no-op on a {n_parts}-partition scan"
    )
    print(json.dumps({"check": "spread_noop_on_sf1_scan", "scan_partitions": n_parts}))

    # adaptive-layout invariant: occupancy per cell ~constant across x10
    n1, n10 = emb_at(SF_DIR).count(), emb_at(OUT_DIR).count()
    (bands1, bits1, _), (bands10, bits10, _) = (
        emb_dup_config(n1),
        emb_dup_config(n10),
    )
    occ1 = n1 / (1 << bits1)
    occ10 = n10 / (1 << bits10)
    print(json.dumps({
        "check": "emb_dup_occupancy", "n1": n1, "n10": n10,
        "bits": [bits1, bits10], "bands": [bands1, bands10],
        "occupancy": [round(occ1, 1), round(occ10, 1)],
    }))
    assert occ10 < 4 * occ1, "cell occupancy must not grow ~linearly with n"

    cases = {
        "exact_dedup": lambda d: d.groupBy(F.md5("text").alias("h")).agg(
            F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("dupe_count")
        ),
        "minhash_near_dup": lambda d: near_dup_pairs(d, threshold=0.5),
    }
    results: dict[str, dict[int, float]] = {}
    for factor, sf_dir in ((1, SF_DIR), (FACTOR, OUT_DIR)):
        for name, fn in cases.items():
            if factor == 1:
                timed(lambda: fn(docs_at(sf_dir)))  # JVM/codegen warm-up
            secs = timed(lambda: fn(docs_at(sf_dir)))
            results.setdefault(name, {})[factor] = round(secs, 3)
            print(json.dumps({"op": name, "factor": factor, "sec": round(secs, 3)}))
        n = n1 if factor == 1 else n10
        build = lambda: embedding_near_dup_pairs(  # noqa: E731
            emb_at(sf_dir), config=emb_dup_config(n)
        )
        if factor == 1:
            timed(build)
        secs = timed(build)
        results.setdefault("emb_near_dup_adaptive", {})[factor] = round(secs, 3)
        print(json.dumps(
            {"op": "emb_near_dup_adaptive", "factor": factor, "sec": round(secs, 3)}
        ))

    for name, by_f in results.items():
        exp = math.log(by_f[FACTOR] / by_f[1]) / math.log(FACTOR)
        print(json.dumps({"op": name, "sf1_scaling_exponent": round(exp, 3)}))

    # --- incremental near-dedup: the cost must follow the INCREMENT, not
    # the corpus. Index is built and stored ONCE per corpus (untimed, as
    # in production); probes are timed against it from disk.
    for cname, corpus_dir in (("sf0.1", SF_DIR), ("sf1.0", OUT_DIR)):
        ipath = f"{OUT_DIR}/minhash_index_{cname}.parquet"
        if args.regen or not os.path.isdir(ipath):
            build_minhash_index(docs_at(corpus_dir)).write.mode(
                "overwrite"
            ).parquet(ipath)
    def fresh_increment(f: int) -> DataFrame:
        """A batch with NO near-dups against either corpus: every word
        carries a tag absent from all corpus generations, so shingle
        sets are disjoint and only chance band collisions survive.
        Isolates pure probe cost — a replicate()-perturbed increment
        would plant same-tag twins against the sf1.0 corpus and measure
        that data pathology instead (first run of this harness did)."""
        base = docs_at(SF_DIR).filter(F.col("doc_id") % 4 == 0)  # 25% slice
        rep = replicate(base, f, ["doc_id"])
        words = F.split(F.col("text"), " ")
        return rep.withColumn(
            "text",
            F.concat_ws(
                " ", F.transform(words, lambda w: F.concat(w, F.lit("zq")))
            ),
        )

    probe_times = {}
    for cname, corpus_dir in (("sf0.1", SF_DIR), ("sf1.0", OUT_DIR)):
        index = spark.read.parquet(f"{OUT_DIR}/minhash_index_{cname}.parquet")
        corpus = docs_at(corpus_dir)
        for inc_factor in (1, 10):
            inc = fresh_increment(inc_factor)
            build = lambda: probe_minhash_index(  # noqa: E731
                index, corpus, inc, threshold=0.5
            )
            timed(build)  # warm
            secs = min(timed(build), timed(build))
            probe_times[(cname, inc_factor)] = secs
            print(json.dumps({
                "op": "incremental_probe", "corpus": cname,
                "increment_factor": inc_factor, "sec": round(secs, 3),
            }))
    inc_exp = math.log(
        probe_times[("sf1.0", 10)] / probe_times[("sf1.0", 1)]
    ) / math.log(10)
    corpus_ratio = probe_times[("sf1.0", 10)] / probe_times[("sf0.1", 10)]
    print(json.dumps({
        "op": "incremental_probe",
        "increment_scaling_exponent": round(inc_exp, 3),
        "corpus_x10_cost_ratio": round(corpus_ratio, 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
