"""Incremental (watermark-based) batch ingestion — the connector idiom
for "only fetch what's new" when the source is a table, not a stream.

State is one JSON document holding the high watermark of the last
committed load. The read filters ``watermark_col > state`` — a plain
comparison predicate, so it PUSHES DOWN into the parquet/JDBC scan
(asserted in tests): an incremental load over a 5-year table touches
only the row groups whose min/max stats pass the watermark, not the
history. Commit order is load-then-commit: the watermark file is
rewritten only after the batch lands, so a crash between the two
re-reads the same slice (at-least-once) — pair with
``sinks.upsert_parquet`` or the batch-id partition overwrite sink for
exactly-once end to end.

Schema drift on the way in is handled by ``read_evolving``: parquet
``mergeSchema`` unions the schemas of all footers, so a column added
mid-history reads as NULL for older files instead of failing the load.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import apply_runtime_confs


def read_watermark(state_path: str) -> Any | None:
    if not os.path.exists(state_path):
        return None
    with open(state_path) as f:
        return json.load(f).get("watermark")


def commit_watermark(state_path: str, watermark: Any) -> None:
    """Atomic-enough local commit: write sidecar, rename into place."""
    tmp = state_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"watermark": watermark}, f)
    os.replace(tmp, state_path)


def read_incremental(
    spark: SparkSession,
    path: str,
    watermark_col: str,
    state_path: str,
) -> tuple[DataFrame, Any]:
    """Rows strictly beyond the committed watermark, plus the new
    high-water value to commit after the load lands."""
    apply_runtime_confs(spark)
    df = spark.read.parquet(path)
    wm = read_watermark(state_path)
    if wm is not None:
        df = df.filter(F.col(watermark_col) > F.lit(wm))
    new_wm_row = df.agg(F.max(watermark_col).alias("wm")).collect()[0]
    new_wm = new_wm_row["wm"] if new_wm_row["wm"] is not None else wm
    return df, new_wm


def read_evolving(spark: SparkSession, path: str) -> DataFrame:
    """Schema-drift-tolerant read: union of every file's schema; columns
    missing from older files surface as NULL."""
    apply_runtime_confs(spark)
    return spark.read.option("mergeSchema", "true").parquet(path)
