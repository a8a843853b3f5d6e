"""Headline-query benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Methodology: one untimed warm run per query (JVM/codegen/parquet-footer
warmup), then best-of-5 timed runs, each executing the query to
completion (collect of the final result). Timings therefore measure
steady-state query execution, not first-touch JIT or co-tenant
scheduler noise (observed run-to-run variance on identical code is
~30% without the min; best-of-3 still let single-run outliers through,
hence 5).

Noise-floor canary (round 8): a FIXED reference kernel — a constant-size
in-memory agg over ``spark.range`` with no I/O and no data dependence on
sf — is timed best-of-5 immediately before and after the query loop and
emitted as ``noise_floor`` in the JSON. The kernel is identical every
round, so its wall-time moves ONLY with machine conditions (co-tenant
load, CPU frequency, scheduler): round-over-round, compare
``value / min(noise_floor.pre, noise_floor.post)`` (emitted as
``value_per_canary``) to separate code regressions from machine drift —
the round-7 headline read +13% on code that measured equal-or-faster
side-by-side, provable then only by re-running both trees.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from custom_python_etl_data_connector_shivaask_username_spark import registry
from custom_python_etl_data_connector_shivaask_username_spark.session import get_spark

#: representative slice of SURVEY.md §2: scan+agg, star join, window,
#: as-of, set op, dedup (exact + LSH), vector top-k, text analytics, ETL
HEADLINE: list[str] = [
    "q1_pricing_summary",
    "q_revenue_by_nation",
    "q_event_type_stats",
    "q_top3_orders_per_customer",
    "q_last_purchase_asof",
    "q_event_deltas",
    "q_setops_nations",
    "q_dedup_exact_documents",
    "q_near_dup_pairs_minhash",
    "q_topk_similar_embeddings",
    "q_embedding_centroids",
    "q_tfidf_top_terms",
    "q_chunk_documents",
    "q_etl_events_normalized",
    "q_ngram_overlap_pairs",
    "q_curation_mix",
    "q_incremental_dedup",  # round 5: batch-vs-corpus dedup decision
    "q_pack_sequences",  # round 6: prefix-sum sequence packing
    "q_lm_quality",  # round 6: corpus bigram-LM quality scoring
]


def _resolve(name):
    """Headline queries stay benchmarked round-over-round even when
    their registry slot is consolidated (q_near_dup_pairs_minhash now
    rides the merged q_lsh_suite registry row but benches standalone)."""
    if name in registry.QUERIES:
        return registry.QUERIES[name]
    from custom_python_etl_data_connector_shivaask_username_spark.operators import (
        llm_dedup,
        llm_similarity,
    )

    for mod in (llm_dedup, llm_similarity):
        if hasattr(mod, name):
            return getattr(mod, name)
    return None


def _canary(spark) -> float:
    """Fixed reference kernel: 48M-row modular-arithmetic agg across 32
    tasks — CPU-bound, zero I/O, identical every round. One warm run,
    then best-of-5 (same discipline as the queries)."""
    def kernel():
        [(s,)] = (
            spark.range(0, 48_000_000, 1, 32)
            .selectExpr("sum((id % 97) * 3) AS s")
            .collect()
        )
        assert s == 6911996745  # fixed kernel => fixed answer

    kernel()  # warm
    runs = []
    for _ in range(5):
        t0 = time.perf_counter()
        kernel()
        runs.append(time.perf_counter() - t0)
    return round(min(runs), 4)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    registry.load_all()
    spark = get_spark("etl-spark-bench")
    names = [n for n in HEADLINE if _resolve(n) is not None]

    canary_pre = _canary(spark)
    timings: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    for name in names:
        fn = _resolve(name)
        fn(spark, sf_dir).collect()  # warm (plan + codegen + IO cache)
        runs: list[float] = []
        for _ in range(5):  # best-of-5: steady-state time, not scheduler noise
            t0 = time.perf_counter()
            n = len(fn(spark, sf_dir).collect())
            runs.append(round(time.perf_counter() - t0, 4))
            assert n >= 0
        timings[name] = min(runs)
        samples[name] = runs
    canary_post = _canary(spark)
    total = round(sum(timings.values()), 4)
    # min, not mean: the pre canary runs on a cold JVM (C2 still
    # compiling scheduler paths) and reads ~2x high; min is the machine's
    # steady-state speed, same discipline as the per-query best-of-5
    canary = min(canary_pre, canary_post)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                # all 5 per-query wall-times (chronological) so
                # round-over-round deltas separate from co-tenant noise
                # without a re-run; headline numbers stay the minima
                "samples": samples,
                # machine-drift canary: identical zero-I/O kernel every
                # round; compare value_per_canary across rounds, not raw
                # totals (see module docstring)
                "noise_floor": {
                    "pre": canary_pre,
                    "post": canary_post,
                    "kernel": "range48M_mod97_sum_32tasks",
                },
                "value_per_canary": round(total / canary, 2),
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
