"""sf1.0 on-disk FULL sweep: every registry query + oracle at 10x scale.

``scale_sf1.py`` closes the multi-row-group scan gap for the dedup
suite; this harness extends the same on-disk x10 corpus to the WHOLE
driver contract: all ten tables materialized under
``.scale_sf1/sf1.0/`` (documents/embeddings perturbed exactly like
scale_check so near-dup structure stays realistic; fact tables id/FK
remapped per replica so joins keep their selectivity; nation/region
copied verbatim so FK targets and key-space semantics survive), then
every ``registry.QUERIES`` entry executed there and — where an oracle
exists — compared row-for-row against DuckDB over the SAME files.

This answers the only question sf0.01 cannot: do the 50 queries stay
correct AND viable when the inputs are dozens of multi-row-group files
instead of one small parquet footer? Results land in
``SCALE_SF1_SUITE.json`` (one JSON line per query: seconds, rows,
match) and feed the SCALE.md sf1.0 section. Run the headline bench at
the same dir for BENCH_sf1:

    SPARK_GRAFT_SF_DIR=/root/repo/.scale_sf1/sf1.0 python bench.py

Diagnostic harness, not part of the driver contract.
Usage: python scale_sf1_suite.py [--regen] [--no-oracle] [--only a,b]
"""

from __future__ import annotations

import argparse
import json
import os
import time

from pyspark.sql import functions as F

from custom_python_etl_data_connector_shivaask_username_spark import registry
from custom_python_etl_data_connector_shivaask_username_spark.session import get_spark
from custom_python_etl_data_connector_shivaask_username_spark.tables import load_table
from scale_check import replicate
from scale_sf1 import OUT_DIR, SF_DIR, _perturb_vec

FULL_DIR = os.path.join(OUT_DIR, "sf1.0")
FACTOR = 10

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

#: per-table replica-offset id columns. FK pairs (o_custkey/c_custkey,
#: l_orderkey/o_orderkey) share the same offset within a replica, so
#: every join keeps its sf0.1 selectivity at x10. nation/region are
#: NOT replicated (empty list + factor 1): *_nationkey/regionkey stay
#: untouched on the fact side, so dimension joins and the setops
#: key-space semantics survive unchanged.
ID_COLS: dict[str, list[str]] = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def generate_full(spark) -> None:
    for name in TABLES:
        df = load_table(spark, SF_DIR, name)
        factor = 1 if not ID_COLS[name] else FACTOR
        rep = replicate(
            df,
            factor,
            ID_COLS[name],
            perturb_text="text" if name == "documents" else None,
        )
        if name == "embeddings":
            rep = _perturb_vec(rep)
        parts = 1 if factor == 1 else 32
        (
            rep.repartition(parts)
            .write.mode("overwrite")
            # 1 MiB row groups: several row groups per file, the
            # multi-split scan shape a real large table slice has
            .option("parquet.block.size", 1 << 20)
            .parquet(f"{FULL_DIR}/{name}.parquet")
        )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--regen", action="store_true")
    ap.add_argument("--no-oracle", action="store_true")
    ap.add_argument("--only", default="", help="comma-filter of queries")
    args = ap.parse_args()
    only = {q for q in args.only.split(",") if q}

    spark = get_spark("scale-sf1-suite")
    if args.regen or not os.path.isdir(f"{FULL_DIR}/lineitem.parquet"):
        print(json.dumps({"stage": "generate", "dir": FULL_DIR}))
        generate_full(spark)

    registry.load_all()
    con = None
    if not args.no_oracle:
        import duckdb

        con = duckdb.connect()
        for t in TABLES:
            con.sql(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"parquet_scan('{FULL_DIR}/{t}.parquet/*.parquet')"
            )

    out_path = os.path.join(os.path.dirname(FULL_DIR), "..",
                            "SCALE_SF1_SUITE.json")
    out_path = os.path.abspath(out_path)
    results = []
    failed = []
    for name, fn in registry.QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            sdf = fn(spark, FULL_DIR)
            scols = sorted(sdf.columns)
            rows = sdf.collect()
            secs = round(time.perf_counter() - t0, 3)
            rec = {"query": name, "sec": secs, "rows": len(rows)}
            if con is not None and name in registry.ORACLE:
                srows = sorted(
                    tuple(str(r[c]) for c in scols) for r in rows
                )
                rel = con.sql(registry.ORACLE[name])
                idx = sorted(
                    range(len(rel.columns)), key=lambda i: rel.columns[i]
                )
                drows = sorted(
                    tuple(str(r[i]) for i in idx) for r in rel.fetchall()
                )
                rec["match"] = (
                    scols == sorted(rel.columns) and srows == drows
                )
                if not rec["match"]:
                    failed.append(name)
            elif name not in registry.ORACLE:
                rec["match"] = None  # rows-only by contract
        except Exception as ex:  # noqa: BLE001 - survey harness
            rec = {
                "query": name,
                "sec": round(time.perf_counter() - t0, 3),
                "error": f"{type(ex).__name__}: {str(ex)[:300]}",
            }
            failed.append(name)
        results.append(rec)
        print(json.dumps(rec), flush=True)

    with open(out_path, "w") as fh:
        for rec in results:
            fh.write(json.dumps(rec) + "\n")
    print(json.dumps({
        "stage": "done", "n": len(results), "failed": failed,
        "total_sec": round(sum(r.get("sec", 0) for r in results), 1),
        "artifact": out_path,
    }))
    spark.stop()
    raise SystemExit(1 if failed else 0)


if __name__ == "__main__":
    main()
