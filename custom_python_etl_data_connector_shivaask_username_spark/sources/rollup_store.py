"""DataSource V2 batch write path for the X22 rollup store (round 8).

The refresh path previously rode Spark's dynamic partition overwrite —
correct, but its commit protocol is the generic JVM FileOutputCommitter
shape: stage everything under ``_temporary``, then a driver loop of
directory renames whose scope is the whole write. This module replaces
it with an explicit Python DataSource V2 writer (the same PySpark-4 API
the ``rest`` source uses for reads, `rest.py:357`) whose commit is
**per partition cell**:

- **Executors** (``write``) bucket their rows by ``(day, batch_id)``
  cell and write one parquet file per cell into a write-scoped staging
  directory (``_staging_<uuid>`` — underscore-prefixed, so a reader
  listing the store never sees in-flight files even mid-write). Only
  file names travel back in the commit message, never rows.
- **Driver commit** walks the union of staged cells and commits each
  cell independently: create the final cell dir, drop exactly the
  files a previous delivery of the same cell left there, move the
  staged files in. A replayed batch therefore replaces precisely its
  own ``day=<d>/batch_id=<id>`` cells — sibling days and other
  batches' files are untouched bytes (the partition-touch isolation
  pin, `tests/test_rollup.py:38`), which is the property the rollup's
  idempotent-refresh contract stands on.
- **Failed/speculative task attempts** leave stray files in staging but
  never appear in a commit message; commit moves only message-listed
  files and then removes the staging dir wholesale, so strays die with
  it. ``abort`` removes the staging dir without touching the store.

Filesystem access: plan-time callbacks of a Python data source
(``commit``/``abort``) run in a driver-side Python worker that has no
JVM gateway, so the metadata ops use ``pyarrow.fs`` — local paths and
any ``FileSystem.from_uri``-resolvable scheme (s3://, gcs://, hdfs://
where libhdfs is present). Rename-based commit is atomic per file on
posix/HDFS; object stores get copy+delete semantics from pyarrow, the
same caveat Spark's own v1 committer carries there.

100 TB shape: a refresh's write fan-out is one file per (task, cell) —
cells per batch are bounded (days touched × 1 batch id), and the commit
loop is metadata-only (no data moves through the driver). The store
stays a plain parquet layout readable by ``spark.read.parquet`` with
partition pruning on ``day``/``batch_id`` intact.
"""

from __future__ import annotations

import os
import uuid as _uuid

from pyspark.sql import DataFrame, SparkSession

FORMAT_NAME = "rollup_store"

#: options understood by the writer
OPT_PATH = "path"
OPT_PARTITION_COLS = "partition_cols"


def _fs_and_path(path: str):
    """Resolve a path to (pyarrow FileSystem, fs-local path) — local
    paths and URI schemes through one interface."""
    import pyarrow.fs as pafs

    if "://" in path:
        return pafs.FileSystem.from_uri(path)
    return pafs.LocalFileSystem(), path


def _cell_rel_path(partition_cols: list[str], row: dict) -> str:
    """Hive-style relative cell path (``day=2024-03-01/batch_id=3``) —
    the exact layout Spark's own partitioned writer produces, so reads
    (and partition-type inference) are unchanged."""
    return "/".join(f"{c}={row.pop(c)}" for c in partition_cols)


def register_rollup_store(spark: SparkSession) -> bool:
    """Register the ``rollup_store`` write format. Returns False when
    the runtime lacks the Python Data Source API (callers fall back to
    dynamic partition overwrite). Idempotent per session."""
    try:
        from pyspark.sql.datasource import (
            DataSource,
            DataSourceWriter,
            WriterCommitMessage,
        )
    except ImportError:
        return False
    if getattr(spark, "_rollup_store_registered", False):
        return True

    class _StagedCells(WriterCommitMessage):
        def __init__(self, files: list[tuple[str, str]]):
            #: (cell_rel_path, staged_file_rel_to_staging) pairs
            self.files = files

    class _RollupStoreWriter(DataSourceWriter):
        def __init__(self, options, schema, overwrite: bool):
            if not overwrite:
                raise ValueError(
                    "rollup_store only supports mode('overwrite') — its "
                    "contract is replace-exactly-the-batch's-cells"
                )
            self.path = dict(options)[OPT_PATH].rstrip("/")
            self.partition_cols = (
                dict(options)
                .get(OPT_PARTITION_COLS, "day,batch_id")
                .split(",")
            )
            self.schema = schema
            self.write_id = _uuid.uuid4().hex
            missing = [
                c for c in self.partition_cols if c not in schema.names
            ]
            if missing:
                raise ValueError(f"partition cols absent from frame: {missing}")

        # --- executor side -------------------------------------------------
        def write(self, iterator):
            import pyarrow as pa
            import pyarrow.parquet as pq
            from pyspark.sql.pandas.types import to_arrow_schema
            from pyspark.sql.types import StructType

            data_schema = StructType(
                [f for f in self.schema if f.name not in self.partition_cols]
            )
            arrow_schema = to_arrow_schema(data_schema)
            by_cell: dict[str, list[dict]] = {}
            for row in iterator:
                d = row.asDict()
                cell = _cell_rel_path(self.partition_cols, d)
                by_cell.setdefault(cell, []).append(d)
            fs, root = _fs_and_path(f"{self.path}/_staging_{self.write_id}")
            files: list[tuple[str, str]] = []
            for cell, rows in by_cell.items():
                rel = f"{cell}/part-{_uuid.uuid4().hex}.snappy.parquet"
                fs.create_dir(
                    os.path.dirname(f"{root}/{rel}"), recursive=True
                )
                table = pa.Table.from_pylist(rows, schema=arrow_schema)
                with fs.open_output_stream(f"{root}/{rel}") as sink:
                    pq.write_table(table, sink, compression="snappy")
                files.append((cell, rel))
            return _StagedCells(files)

        # --- driver side ---------------------------------------------------
        def _staging_root(self) -> str:
            return f"{self.path}/_staging_{self.write_id}"

        def commit(self, messages):
            import pyarrow.fs as pafs

            fs, store = _fs_and_path(self.path)
            _, staging = _fs_and_path(self._staging_root())
            by_cell: dict[str, list[str]] = {}
            for m in messages:
                if m is None:
                    continue
                for cell, rel in m.files:
                    by_cell.setdefault(cell, []).append(rel)
            # per-cell commit: each cell is finalized independently —
            # drop the cell's previous delivery, move this one's files in
            for cell, rels in by_cell.items():
                final_dir = f"{store}/{cell}"
                fs.create_dir(final_dir, recursive=True)
                old = fs.get_file_info(
                    pafs.FileSelector(final_dir, allow_not_found=True)
                )
                for info in old:
                    if info.is_file:
                        fs.delete_file(info.path)
                for rel in rels:
                    fs.move(
                        f"{staging}/{rel}",
                        f"{final_dir}/{os.path.basename(rel)}",
                    )
            self._drop_staging()

        def abort(self, messages):
            self._drop_staging()

        def _drop_staging(self):
            fs, staging = _fs_and_path(self._staging_root())
            try:
                fs.delete_dir(staging)
            except FileNotFoundError:
                pass

    class _RollupStoreDataSource(DataSource):
        @classmethod
        def name(cls):
            return FORMAT_NAME

        def writer(self, schema, overwrite: bool):
            return _RollupStoreWriter(self.options, schema, overwrite)

    spark.dataSource.register(_RollupStoreDataSource)
    spark._rollup_store_registered = True
    return True


def write_cells(
    df: DataFrame, path: str, partition_cols: list[str]
) -> bool:
    """Write ``df`` through the DSv2 per-cell committer; False if the
    runtime lacks the Python Data Source API (caller falls back)."""
    spark = df.sparkSession
    if not register_rollup_store(spark):
        return False
    (
        df.write.format(FORMAT_NAME)
        .mode("overwrite")
        .option(OPT_PATH, path)
        .option(OPT_PARTITION_COLS, ",".join(partition_cols))
        .save()
    )
    return True
