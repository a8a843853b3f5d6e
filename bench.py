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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    registry.load_all()
    spark = get_spark("etl-spark-bench")
    names = [n for n in HEADLINE if _resolve(n) is not None]

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
    total = round(sum(timings.values()), 4)
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
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
