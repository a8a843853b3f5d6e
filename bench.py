"""Headline-query benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed to completion (count + collect of the final result)
so scan/shuffle/agg all run; timings exclude session startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from custom_python_etl_data_connector_shivaask_username_spark import registry
from custom_python_etl_data_connector_shivaask_username_spark.session import get_spark

#: queries whose wall time is the headline metric; widened as operators land
HEADLINE: list[str] = [
    "q1_pricing_summary",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    registry.load_all()
    spark = get_spark("etl-spark-bench")
    names = [n for n in HEADLINE if n in registry.QUERIES]

    # warm the JVM + parquet footers once so per-query numbers measure the
    # query, not first-touch costs (the driver compares repeated rounds).
    registry.QUERIES[names[0]](spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        df = registry.QUERIES[name](spark, sf_dir)
        n = len(df.collect())
        timings[name] = round(time.perf_counter() - t0, 4)
        assert n >= 0
    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
