"""DataSource V2 write paths for the X22 rollup store.

Two writers share one registered format (``rollup_store``) and one
per-cell commit core:

**Batch** (round 8, ``_RollupStoreWriter``) — the refresh path. The
previous dynamic-partition-overwrite commit was the generic JVM
FileOutputCommitter shape: stage everything under ``_temporary``, then
a driver loop of directory renames whose scope is the whole write.
This writer's commit is **per partition cell**:

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

**Streaming** (X30, ``_RollupStreamWriter``) — the continuous refresh
path, replacing the ``foreachBatch`` loop with a first-class
``writeStream.format("rollup_store")`` sink. The sink IS the per-epoch
aggregator: each task folds its Arrow record batches into mergeable
partials per ``(bucket, event_type)`` cell **vectorized**
(``pyarrow.Table.group_by`` — no per-row Python), so the streaming
query needs **no shuffle and no state store**; the store's mergeable-
partials contract (multiple partial rows per cell are merged at read,
`operators/rollup.py:141`) absorbs the task-level split. Exactly-once
store state falls out of three pieces:

1. Structured Streaming's at-least-once delivery replays a failed
   epoch with the SAME ``batchId``;
2. commit replaces exactly the epoch's own ``day=<d>/batch_id=<epoch>``
   cells (same per-cell core as batch), so a replay converges instead
   of appending;
3. epochs already folded away by ``compact_rollup`` are skipped via
   the folded-watermark sidecar (read through ``pyarrow.fs`` here —
   plan-time callbacks of a Python data source run in a driver-side
   worker with no JVM gateway), so a post-compaction redelivery cannot
   double-count.

Each committed epoch also drops a ``_commits/<epoch>`` marker — an
inspectable commit log (underscore-prefixed: invisible to parquet
readers) that monitoring and the tests use to see which epochs are
durable.

Filesystem access: ``pyarrow.fs`` throughout — local paths and any
``FileSystem.from_uri``-resolvable scheme (s3://, gcs://, hdfs:// where
libhdfs is present). Rename-based commit is atomic per file on
posix/HDFS; object stores get copy+delete semantics from pyarrow, the
same caveat Spark's own v1 committer carries there.

100 TB shape: a delivery's write fan-out is one file per (task, cell) —
cells per epoch are bounded (days touched × 1 batch id) — and the
commit loop is metadata-only (no data moves through the driver). The
streaming sink additionally reduces each epoch map-side: what lands on
disk is ``buckets × types`` partial rows per task, metadata-scale next
to the raw feed, with zero exchanges in the streaming plan. The store
stays a plain parquet layout readable by ``spark.read.parquet`` with
partition pruning on ``day``/``batch_id`` intact.
"""

from __future__ import annotations

import json
import os
import threading
import uuid as _uuid

from pyspark.sql import DataFrame, SparkSession

FORMAT_NAME = "rollup_store"

#: options understood by the writers
OPT_PATH = "path"
OPT_PARTITION_COLS = "partition_cols"
OPT_RESOLUTION = "resolution"
OPT_TS_COL = "ts_col"
OPT_TYPE_COL = "type_col"
OPT_VALUE_COL = "value_col"

#: truncation units the streaming aggregator accepts (pyarrow
#: ``floor_temporal`` units that match Spark ``date_trunc`` semantics)
STREAM_RESOLUTIONS = ("minute", "hour", "day")

#: records the highest batch id already folded into the compacted
#: ``batch_id=-1`` base (written by ``operators/rollup.compact_rollup``,
#: honored by both write paths so a post-compaction redelivery skips)
FOLDED_SIDECAR = "_folded_watermark.json"

#: per-epoch commit markers for the streaming sink
COMMITS_DIR = "_commits"


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


def _commit_cells(
    store_path: str, by_cell: dict[str, list[str]]
) -> None:
    """The shared per-cell commit core: for each final cell (relative
    Hive path), drop the cell's previous delivery and move this one's
    staged files in. Staged paths are STORE-RELATIVE (they carry their
    own ``_staging_<uuid>/`` prefix) because driver-side plan callbacks
    of a Python data source may run in a freshly-instantiated writer —
    instance state like the staging uuid does not survive the
    executor→commit hop in streaming mode, only the commit messages do.
    Metadata-only — no rows pass through the driver."""
    import pyarrow.fs as pafs

    fs, store = _fs_and_path(store_path)
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
                f"{store}/{rel}",
                f"{final_dir}/{os.path.basename(rel)}",
            )


def _staging_roots(messages) -> set[str]:
    """Distinct ``_staging_<uuid>`` roots referenced by a delivery's
    commit messages (store-relative first path component)."""
    roots: set[str] = set()
    for m in messages:
        if m is None:
            continue
        for _, rel in m.files:
            roots.add(rel.split("/", 1)[0])
    return roots


def _drop_staging(store_path: str, messages, own_root: str) -> None:
    """Remove every staging dir a delivery touched: the roots named in
    its commit messages plus this instance's own (covers the
    no-messages abort path). Strays from failed/speculative attempts
    die with their root."""
    for root in _staging_roots(messages) | {own_root}:
        _drop_dir(f"{store_path}/{root}")


def _drop_dir(path: str) -> None:
    fs, p = _fs_and_path(path)
    try:
        fs.delete_dir(p)
    except FileNotFoundError:
        pass


def _folded_watermark_pa(store_path: str) -> int:
    """Highest batch id folded into the compacted base, via pyarrow.fs
    (no JVM gateway in data-source plan callbacks). Missing sidecar
    (store not yet compacted) is −1; a malformed one raises."""
    fs, store = _fs_and_path(store_path)
    try:
        with fs.open_input_stream(f"{store}/{FOLDED_SIDECAR}") as f:
            raw = f.read().decode("utf-8")
    except FileNotFoundError:
        return -1
    except OSError:
        return -1
    return int(json.loads(raw)["max_folded_batch_id"])


def retract_commit_marker(store_path: str, epoch: int) -> None:
    """Drop an epoch's ``_commits/<epoch>`` marker if present — called
    BEFORE a replayed delivery starts replacing that epoch's cells.
    Snapshot readers (X34) trust the marker as "every cell landed";
    without the retraction a replay's delete-then-move window would be
    visible under a surviving marker (torn read on the SECOND delivery
    of the same epoch). The replay re-logs the marker after all cells
    land, restoring visibility. Idempotent."""
    fs, store = _fs_and_path(store_path)
    try:
        fs.delete_file(f"{store}/{COMMITS_DIR}/{epoch}")
    except FileNotFoundError:
        pass


def committed_epochs(store_path: str) -> list[int]:
    """Epoch ids with a durable ``_commits/<epoch>`` marker — the
    streaming sink's inspectable commit log."""
    import pyarrow.fs as pafs

    fs, store = _fs_and_path(store_path)
    infos = fs.get_file_info(
        pafs.FileSelector(f"{store}/{COMMITS_DIR}", allow_not_found=True)
    )
    # skip non-numeric siblings (Hadoop local-FS `.N.crc` checksums)
    return sorted(
        int(os.path.basename(i.path))
        for i in infos
        if i.is_file and os.path.basename(i.path).lstrip("-").isdigit()
    )


def _writer_classes():
    """Build (once) the DSv2 classes, or None when the runtime lacks
    the Python Data Source API. A factory rather than module-level
    classes so the import guard stays in one place and tests can drive
    the writers directly (the streaming replay pins instantiate
    ``stream_writer`` without a running query)."""
    global _CLASSES
    if _CLASSES is not None:
        return _CLASSES
    try:
        from pyspark.sql.datasource import (
            DataSource,
            DataSourceWriter,
            WriterCommitMessage,
        )
    except ImportError:
        return None
    try:
        from pyspark.sql.datasource import DataSourceStreamArrowWriter
    except ImportError:  # pragma: no cover - 4.0 runtimes
        DataSourceStreamArrowWriter = None

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

        # --- executor side ---------------------------------------------
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
            fs, store = _fs_and_path(self.path)
            files: list[tuple[str, str]] = []
            for cell, rows in by_cell.items():
                rel = (
                    f"_staging_{self.write_id}/{cell}/"
                    f"part-{_uuid.uuid4().hex}.snappy.parquet"
                )
                fs.create_dir(
                    os.path.dirname(f"{store}/{rel}"), recursive=True
                )
                table = pa.Table.from_pylist(rows, schema=arrow_schema)
                with fs.open_output_stream(f"{store}/{rel}") as sink:
                    pq.write_table(table, sink, compression="snappy")
                files.append((cell, rel))
            return _StagedCells(files)

        # --- driver side -----------------------------------------------
        def commit(self, messages):
            by_cell: dict[str, list[str]] = {}
            for m in messages:
                if m is None:
                    continue
                for cell, rel in m.files:
                    by_cell.setdefault(cell, []).append(rel)
            try:
                _commit_cells(self.path, by_cell)
            finally:
                _drop_staging(
                    self.path, messages, f"_staging_{self.write_id}"
                )

        def abort(self, messages):
            _drop_staging(
                self.path, messages, f"_staging_{self.write_id}"
            )

    if DataSourceStreamArrowWriter is not None:

        class _RollupStreamWriter(DataSourceStreamArrowWriter):
            """X30: per-epoch aggregating sink. Tasks fold raw event
            batches into mergeable partials (vectorized, Arrow
            group_by), stage one parquet per day cell; the driver
            commits each epoch's cells under ``batch_id=<epoch>`` and
            logs the epoch in ``_commits/``. Schema of the staged
            files matches ``operators/rollup.rollup_partials`` exactly
            so batch- and stream-fed deliveries merge in one read."""

            def __init__(self, options, schema):
                opts = dict(options)
                self.path = opts[OPT_PATH].rstrip("/")
                self.resolution = opts.get(OPT_RESOLUTION, "hour")
                if self.resolution not in STREAM_RESOLUTIONS:
                    raise ValueError(
                        f"resolution must be one of {STREAM_RESOLUTIONS}"
                    )
                self.ts_col = opts.get(OPT_TS_COL, "ts")
                self.type_col = opts.get(OPT_TYPE_COL, "event_type")
                self.value_col = opts.get(OPT_VALUE_COL, "value")
                missing = [
                    c
                    for c in (self.ts_col, self.type_col, self.value_col)
                    if c not in schema.names
                ]
                if missing:
                    raise ValueError(
                        f"stream columns absent from frame: {missing}"
                    )
                self.write_id = _uuid.uuid4().hex

            # --- executor side -----------------------------------------
            def write(self, iterator):
                import pyarrow as pa
                import pyarrow.compute as pc
                import pyarrow.parquet as pq

                import numpy as np

                from ..operators.rollup import (
                    QHIST_K,
                    QHIST_OCT,
                    QHIST_THRESHOLDS,
                    QHIST_ZERO_KEY,
                )

                _thr = np.array(QHIST_THRESHOLDS)

                def qhist_keys(val):
                    """Arrow/numpy twin of operators/rollup._qhist_key
                    — bit-identical keys by construction (see the
                    determinism contract there): exact octave via
                    np.frexp, sub-bucket via the SAME shared threshold
                    constants; no transcendental ever decides a
                    bucket, so JVM-vs-libm rounding cannot split a
                    value across engines."""
                    v = pc.cast(val, pa.float64()).to_numpy(
                        zero_copy_only=False
                    )
                    valid = ~np.isnan(v)  # nulls surface as NaN here
                    av = np.clip(
                        np.abs(np.where(valid, v, 1.0)),
                        2.0 ** -QHIST_OCT,
                        2.0 ** QHIST_OCT,
                    )
                    frac, ex = np.frexp(av)  # av = frac·2^ex, frac∈[.5,1)
                    m = frac * 2.0  # exact: power-of-two scaling
                    e = ex.astype(np.int64) - 1
                    sub = np.searchsorted(_thr, m, side="right")
                    key16 = QHIST_K * e + sub
                    idx = np.where(v > 0, 2 * key16, 2 * key16 + 1)
                    idx = np.where(v == 0, QHIST_ZERO_KEY, idx)
                    return pa.array(
                        idx, pa.int64(), mask=~valid
                    )

                # (bucket_dt, event_type) -> [cnt, nval, sum, min, max]
                cells: dict[tuple, list] = {}
                # (bucket_dt, event_type) -> {qhist key -> count}
                qcells: dict[tuple, dict] = {}
                # carry the INPUT's timestamp flavor (tz-aware vs ntz)
                # into the staged files so batch- and stream-written
                # partials schema-merge on read
                bucket_type = pa.timestamp("us")
                for batch in iterator:
                    t = pa.Table.from_batches([batch])
                    bucket = pc.floor_temporal(
                        t[self.ts_col], unit=self.resolution
                    )
                    bucket_type = bucket.type
                    val = t[self.value_col]
                    g = (
                        pa.table(
                            {
                                "b": bucket,
                                "et": t[self.type_col],
                                "v": val,
                                # exact-decimal running sum: same cast the
                                # batch path applies (compat.DEC)
                                "d": pc.cast(
                                    val, pa.decimal128(27, 6)
                                ),
                            }
                        )
                        .group_by(["b", "et"])
                        .aggregate(
                            [
                                ("d", "sum"),
                                ("v", "count"),
                                ("v", "min"),
                                ("v", "max"),
                                ([], "count_all"),
                            ]
                        )
                    )
                    for r in g.to_pylist():
                        key = (r["b"], r["et"])
                        acc = cells.get(key)
                        if acc is None:
                            cells[key] = [
                                r["count_all"],
                                r["v_count"],
                                r["d_sum"],
                                r["v_min"],
                                r["v_max"],
                            ]
                            continue
                        acc[0] += r["count_all"]
                        acc[1] += r["v_count"]
                        if r["d_sum"] is not None:
                            acc[2] = (
                                r["d_sum"]
                                if acc[2] is None
                                else acc[2] + r["d_sum"]
                            )
                        for i, fn in ((3, min), (4, max)):
                            if r[f"v_{fn.__name__}"] is not None:
                                acc[i] = (
                                    r[f"v_{fn.__name__}"]
                                    if acc[i] is None
                                    else fn(acc[i], r[f"v_{fn.__name__}"])
                                )
                    # quantile-histogram partial: counts per (cell, key)
                    qk = qhist_keys(val)
                    gq = (
                        pa.table(
                            {"b": bucket, "et": t[self.type_col], "qk": qk}
                        )
                        .filter(pc.is_valid(qk))
                        .group_by(["b", "et", "qk"])
                        .aggregate([([], "count_all")])
                    )
                    for r in gq.to_pylist():
                        hist = qcells.setdefault((r["b"], r["et"]), {})
                        hist[r["qk"]] = (
                            hist.get(r["qk"], 0) + r["count_all"]
                        )
                # one staged file per day cell — matches the batch file
                # schema (sum over decimal(27,6) widens to (37,6))
                file_schema = pa.schema(
                    [
                        ("bucket_start", bucket_type),
                        ("event_type", pa.string()),
                        ("cnt", pa.int64()),
                        ("nval", pa.int64()),
                        ("sum_dec", pa.decimal128(37, 6)),
                        ("min_value", pa.float64()),
                        ("max_value", pa.float64()),
                        ("qhist", pa.map_(pa.int64(), pa.int64())),
                    ]
                )
                by_day: dict[str, list[dict]] = {}
                for (bucket_dt, etype), acc in cells.items():
                    by_day.setdefault(str(bucket_dt.date()), []).append(
                        {
                            "bucket_start": bucket_dt,
                            "event_type": etype,
                            "cnt": acc[0],
                            "nval": acc[1],
                            "sum_dec": acc[2],
                            "min_value": acc[3],
                            "max_value": acc[4],
                            # sorted entries: deterministic file bytes,
                            # same order map_from_entries(sort_array())
                            # produces on the batch path
                            "qhist": sorted(
                                qcells.get((bucket_dt, etype), {}).items()
                            ),
                        }
                    )
                fs, store = _fs_and_path(self.path)
                files: list[tuple[str, str]] = []
                for day, rows in by_day.items():
                    rel = (
                        f"_staging_{self.write_id}/day={day}/"
                        f"part-{_uuid.uuid4().hex}.snappy.parquet"
                    )
                    fs.create_dir(
                        os.path.dirname(f"{store}/{rel}"), recursive=True
                    )
                    table = pa.Table.from_pylist(rows, schema=file_schema)
                    with fs.open_output_stream(f"{store}/{rel}") as sink:
                        pq.write_table(table, sink, compression="snappy")
                    files.append((f"day={day}", rel))
                return _StagedCells(files)

            # --- driver side -------------------------------------------
            def commit(self, messages, batchId):
                try:
                    if batchId <= _folded_watermark_pa(self.path):
                        return  # epoch already folded into the base
                    by_cell: dict[str, list[str]] = {}
                    for m in messages:
                        if m is None:
                            continue
                        for day_cell, rel in m.files:
                            final = f"{day_cell}/batch_id={batchId}"
                            by_cell.setdefault(final, []).append(rel)
                    # replay of an already-marked epoch: retract the
                    # marker before touching its cells so snapshot
                    # readers exclude the epoch during replacement
                    retract_commit_marker(self.path, batchId)
                    _commit_cells(self.path, by_cell)
                    fs, store = _fs_and_path(self.path)
                    fs.create_dir(
                        f"{store}/{COMMITS_DIR}", recursive=True
                    )
                    with fs.open_output_stream(
                        f"{store}/{COMMITS_DIR}/{batchId}"
                    ) as f:
                        f.write(
                            json.dumps(
                                {
                                    "batch_id": batchId,
                                    "cells": sorted(by_cell),
                                }
                            ).encode("utf-8")
                        )
                finally:
                    _drop_staging(
                        self.path, messages, f"_staging_{self.write_id}"
                    )

            def abort(self, messages, batchId):
                _drop_staging(
                    self.path, messages, f"_staging_{self.write_id}"
                )

    else:  # pragma: no cover - 4.0 runtimes
        _RollupStreamWriter = None

    class _RollupStoreDataSource(DataSource):
        @classmethod
        def name(cls):
            return FORMAT_NAME

        def writer(self, schema, overwrite: bool):
            return _RollupStoreWriter(self.options, schema, overwrite)

        def streamWriter(self, schema, overwrite: bool):
            if _RollupStreamWriter is None:  # pragma: no cover
                raise NotImplementedError(
                    "runtime lacks DataSourceStreamArrowWriter"
                )
            return _RollupStreamWriter(self.options, schema)

    _CLASSES = {
        "source": _RollupStoreDataSource,
        "batch_writer": _RollupStoreWriter,
        "stream_writer": _RollupStreamWriter,
        "message": _StagedCells,
    }
    return _CLASSES


_CLASSES = None

#: serializes the register-once fast path across delivery threads
_REGISTER_LOCK = threading.Lock()


def register_rollup_store(spark: SparkSession) -> bool:
    """Register the ``rollup_store`` write format. Returns False when
    the runtime lacks the Python Data Source API (callers fall back to
    dynamic partition overwrite). Idempotent per session AND race-safe:
    concurrent deliveries (q_rollup_incremental's parallel-writer path)
    can both pass the un-registered check before either sets the flag,
    and Spark 4's ``dataSource.register`` raises
    DATA_SOURCE_ALREADY_EXISTS on the loser — which here just means
    someone else finished the registration we wanted."""
    classes = _writer_classes()
    if classes is None:
        return False
    if not getattr(spark, "_rollup_store_registered", False):
        with _REGISTER_LOCK:
            if not getattr(spark, "_rollup_store_registered", False):
                try:
                    spark.dataSource.register(classes["source"])
                except Exception as e:  # lost a cross-session race
                    if "DATA_SOURCE_ALREADY_EXISTS" not in str(e):
                        raise
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


def stream_cells(
    events: DataFrame,
    path: str,
    checkpoint: str,
    resolution: str = "hour",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    available_now: bool = True,
):
    """Start the X30 continuous-refresh sink over a streaming frame of
    RAW events: ``writeStream.format("rollup_store")`` with the sink
    doing the per-epoch partialization map-side (zero exchanges, no
    state store). Returns the StreamingQuery, or None when the runtime
    lacks the Python Data Source API (callers fall back to the
    ``foreachBatch`` + ``refresh_rollup`` loop, same store layout)."""
    spark = events.sparkSession
    if not register_rollup_store(spark):
        return None
    if _writer_classes()["stream_writer"] is None:  # pragma: no cover
        return None
    # record (or verify) the store's bucket grain before the first
    # epoch lands — serving calls refuse finer-than-stored resolutions
    # against it (round-10 advisory; lazy import: operators.rollup
    # imports this module at top level)
    from ..operators.rollup import record_resolution

    record_resolution(spark, path, resolution)
    w = (
        events.writeStream.format(FORMAT_NAME)
        .option(OPT_PATH, path)
        .option(OPT_RESOLUTION, resolution)
        .option(OPT_TS_COL, ts_col)
        .option(OPT_TYPE_COL, type_col)
        .option(OPT_VALUE_COL, value_col)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
