"""Mini differential-oracle harness mirroring the driver's t2 check.

Runs a registered Spark query and its DuckDB oracle SQL on the same
parquet fixtures and asserts row-count + column-name + exact-value
equality (order-insensitive). Stricter than the driver (exact float
equality) because the engine's determinism strategy (compat.py) makes
exactness achievable.
"""

from __future__ import annotations

import math
from datetime import datetime

import duckdb

from custom_python_etl_data_connector_shivaask_username_spark.tables import TABLES


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm(v):
    """Normalize a cell for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    try:
        import numpy as np

        if isinstance(v, np.generic):
            return _norm(v.item())
    except ImportError:
        pass
    return v


def _sortable(row):
    return tuple(
        (x is None, str(type(x).__name__), str(x)) for x in row
    )


def fetch_spark(df):
    cols = sorted(df.columns)
    rows = [tuple(_norm(r[c]) for c in cols) for r in df.collect()]
    return cols, sorted(rows, key=_sortable)


def fetch_duck(con, sql):
    rel = con.sql(sql)
    cols = list(rel.columns)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = [
        tuple(_norm(r[i]) for i in order) for r in rel.fetchall()
    ]
    return sorted(cols), sorted(rows, key=_sortable)


def assert_query_matches(spark, sf_dir: str, name: str, atol: float = 0.0):
    """Run queries()[name] vs oracle_sql()[name] and compare."""
    from custom_python_etl_data_connector_shivaask_username_spark.registry import (
        ORACLE,
        QUERIES,
    )

    df = QUERIES[name](spark, sf_dir)
    s_cols, s_rows = fetch_spark(df)
    con = duck_connect(sf_dir)
    d_cols, d_rows = fetch_duck(con, ORACLE[name])
    con.close()

    assert s_cols == d_cols, f"{name}: columns {s_cols} != {d_cols}"
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count {len(s_rows)} != {len(d_rows)}\n"
        f"spark[:3]={s_rows[:3]}\nduck[:3]={d_rows[:3]}"
    )
    for i, (a, b) in enumerate(zip(s_rows, d_rows)):
        assert len(a) == len(b)
        for c, (x, y) in enumerate(zip(a, b)):
            if (
                atol
                and isinstance(x, float)
                and isinstance(y, float)
            ):
                assert abs(x - y) <= atol, (
                    f"{name} row {i} col {s_cols[c]}: {x!r} != {y!r} (atol={atol})"
                )
            else:
                assert x == y, (
                    f"{name} row {i} col {s_cols[c]}: {x!r} != {y!r}\n"
                    f"spark row: {a}\nduck  row: {b}"
                )
