"""X40: file-level min/max statistics index — data skipping that
prunes the FILE LIST, not just row groups.

Spark's parquet reader already skips row groups whose footer min/max
exclude a pushed filter — but it only learns that by SCHEDULING a
task and READING the footer, per file, per query. At 100 TB (10⁵-10⁶
files) the footer round-trips and task overhead dominate selective
scans. Delta Lake and Iceberg fix this with a transaction-log-side
per-file stats index consulted BEFORE planning; this module
re-expresses that public design for plain parquet directories:

- :func:`build_file_index` — collect per-file (rows, per-column
  min/max/null_count) by reading ONLY parquet footers. The footer
  reads are DISTRIBUTED (``sc.parallelize(files).mapPartitions`` with
  pyarrow) — building the index for a 10⁵-file table is a map-only
  metadata job, never a data scan. Persisted as
  ``_file_index.json`` next to the data (underscore-prefixed:
  invisible to readers; Hadoop-FS text I/O so hdfs:///s3:// work).
- :func:`prune_files` — the file paths whose [min, max] can satisfy
  ``lo <= col <= hi`` (or equality). Driver-side metadata math over
  the index; files with no stats for the column are kept (skipping
  must never lose rows).
- :func:`read_pruned` — ``spark.read.parquet(*survivors)`` with the
  predicate still applied: pruning is an optimization, the filter
  remains the source of truth (exactly Delta's contract).

Layout matters: the index prunes in proportion to how well values
cluster per file — perfect after ``write_zordered`` / a range
sort (``sources/layout.py``), useless on a random layout. The pins
measure both directions honestly.

Staleness: the index names the exact files it indexed; appended
files are ABSENT from it and :func:`prune_files` keeps unknown files
conservatively when the listing is passed in (``all_files=``), so an
un-refreshed index degrades to reading more, never to wrong results.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from .layout import fs_read_text, fs_write_text

FILE_INDEX = "_file_index.json"

#: stats-worthy parquet logical types (orderable, json-serializable)
_INDEXED_TYPES = ("int", "float", "double", "string", "date", "timestamp")


def _footer_stats(paths: list[str], columns: list[str] | None):
    """Per-file stats from parquet footers only (runs on executors)."""
    import pyarrow.parquet as pq

    from .rollup_store import _fs_and_path

    out = []
    for path in paths:
        fs, local = _fs_and_path(path)
        with fs.open_input_file(local) as f:
            md = pq.ParquetFile(f).metadata
            schema = md.schema
            names = [schema.column(i).name for i in range(md.num_columns)]
            want = [
                (i, n)
                for i, n in enumerate(names)
                if columns is None or n in columns
            ]
            cols: dict[str, Any] = {}
            for i, n in want:
                mins, maxs, nulls, ok = [], [], 0, True
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(i).statistics
                    if st is None or not st.has_min_max:
                        ok = False
                        break
                    mins.append(st.min)
                    maxs.append(st.max)
                    nulls += st.null_count or 0
                if ok and mins:
                    cols[n] = {
                        "min": min(mins),
                        "max": max(maxs),
                        "null_count": nulls,
                    }
            out.append(
                {"file": path, "rows": md.num_rows, "columns": cols}
            )
    return out


def build_file_index(
    spark: SparkSession,
    path: str,
    columns: list[str] | None = None,
    write: bool = True,
) -> dict[str, Any]:
    """Distributed footer-only stats collection over every parquet
    file under ``path``; returns (and by default persists) the index
    dict ``{files: [{file, rows, columns: {c: {min, max,
    null_count}}}]}``. Values are JSON-coerced with ``default=str``;
    :func:`prune_files` compares on the same string axis for
    non-numerics, which preserves order for ISO dates/timestamps and
    plain strings (parquet's own sort order for these types)."""
    files = sorted(spark.read.parquet(path).inputFiles())
    if not files:
        raise ValueError(f"no parquet files under {path!r}")
    sc = spark.sparkContext
    slices = min(len(files), sc.defaultParallelism)
    entries = (
        sc.parallelize(files, slices)
        .mapPartitions(lambda it: _footer_stats(list(it), columns))
        .collect()
    )
    index = {"table": path, "files": sorted(entries, key=lambda e: e["file"])}
    if write:
        fs_write_text(
            spark,
            f"{path.rstrip('/')}/{FILE_INDEX}",
            json.dumps(index, default=str),
        )
    return index


def read_file_index(spark: SparkSession, path: str) -> dict[str, Any] | None:
    raw = fs_read_text(spark, f"{path.rstrip('/')}/{FILE_INDEX}")
    return None if raw is None else json.loads(raw)


def _axis(v: Any):
    """Comparison axis: numerics as float, everything else as str
    (ISO order for date/timestamp strings matches value order)."""
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, (int, float)):
        return float(v)
    return str(v)


def prune_files(
    index: dict[str, Any],
    col: str,
    lo: Any = None,
    hi: Any = None,
    eq: Any = None,
    all_files: list[str] | None = None,
) -> list[str]:
    """File paths that MAY contain rows with ``lo <= col <= hi`` (or
    ``col = eq``). A file is dropped only when its recorded min/max
    PROVE no row matches — files without stats for the column are
    kept, and ``all_files`` (the current listing) re-adds files the
    index has never seen (post-index appends): pruning can only ever
    over-read, never lose rows."""
    if eq is not None:
        lo = hi = eq
    qlo = None if lo is None else _axis(lo)
    qhi = None if hi is None else _axis(hi)
    keep = []
    for e in index.get("files", []):
        st = e.get("columns", {}).get(col)
        if not st:
            keep.append(e["file"])
            continue
        fmin, fmax = _axis(st["min"]), _axis(st["max"])
        if qlo is not None and _axis_lt(fmax, qlo):
            continue
        if qhi is not None and _axis_lt(qhi, fmin):
            continue
        keep.append(e["file"])
    if all_files is not None:
        indexed = {e["file"] for e in index.get("files", [])}
        keep += [f for f in all_files if f not in indexed]
    return keep


def _axis_lt(a: Any, b: Any) -> bool:
    """a < b on the comparison axis; mismatched types (a numeric
    column whose sidecar round-tripped to strings) compare as
    strings — conservative only if callers pass the SAME form the
    index stores, which `read_pruned` does by rebuilding bounds from
    the caller's python values."""
    if isinstance(a, float) and isinstance(b, float):
        return a < b
    return str(a) < str(b)


def read_pruned(
    spark: SparkSession,
    path: str,
    col: str,
    lo: Any = None,
    hi: Any = None,
    eq: Any = None,
    index: dict[str, Any] | None = None,
) -> DataFrame:
    """Scan only the files the index cannot rule out, with the
    predicate STILL applied (pruning is an optimization, the filter
    is the contract). Falls back to a plain filtered scan when no
    index exists."""
    from pyspark.sql import functions as F

    df_all = spark.read.parquet(path)
    if index is None:
        index = read_file_index(spark, path)
    if index is None:
        files = None
    else:
        files = prune_files(
            index, col, lo, hi, eq, all_files=df_all.inputFiles()
        )
    if files is None:
        df = df_all
    elif not files:  # every file provably excluded
        df = df_all.filter(F.lit(False))
    else:
        # basePath keeps hive-partition columns when reading leaves
        df = spark.read.option("basePath", path).parquet(*files)
    if eq is not None:
        return df.filter(F.col(col) == F.lit(eq))
    out = df
    if lo is not None:
        out = out.filter(F.col(col) >= F.lit(lo))
    if hi is not None:
        out = out.filter(F.col(col) <= F.lit(hi))
    return out
