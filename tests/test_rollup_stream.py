"""X30 streaming rollup sink pins: end-to-end stream == direct batch
recompute, epoch-replay idempotency, folded-watermark skip, commit-log
markers, and batch/stream file-schema compatibility in one store."""

from __future__ import annotations

import datetime as dt
import glob
import json
import os
import shutil

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from custom_python_etl_data_connector_shivaask_username_spark.operators.rollup import (
    _finalize,
    _merge_partials,
    compact_rollup,
    read_rollup,
    refresh_rollup,
    rollup_partials,
)
from custom_python_etl_data_connector_shivaask_username_spark.sources.rollup_store import (
    COMMITS_DIR,
    FOLDED_SIDECAR,
    _writer_classes,
    committed_epochs,
    stream_cells,
)

pytestmark = pytest.mark.skipif(
    _writer_classes() is None
    or _writer_classes()["stream_writer"] is None,
    reason="runtime lacks the Python Data Source streaming-writer API",
)

_SCHEMA = "event_id BIGINT, ts TIMESTAMP, user_id STRING, event_type STRING, value DOUBLE"


def _rows(spec):
    """spec: (day, hour, minute, event_type, value) tuples in 2024-03."""
    return [
        (i, dt.datetime(2024, 3, d, h, mi), f"u{i % 3}", t, v)
        for i, (d, h, mi, t, v) in enumerate(spec)
    ]


def _events(spark, spec):
    return spark.createDataFrame(_rows(spec), _SCHEMA)


def _write_stream_file(spark, spec, path):
    """One parquet FILE per call so the file-stream source sees one
    discoverable input (→ one microbatch with maxFilesPerTrigger=1)."""
    staging = path + "__staging"
    _events(spark, spec).coalesce(1).write.mode("overwrite").parquet(staging)
    shutil.move(glob.glob(f"{staging}/part-*.parquet")[0], path)
    shutil.rmtree(staging)


_SLICES = [
    # microbatch 0: two hours of day 1, one value NULL inside a group
    [
        (1, 10, 0, "view", 1.0),
        (1, 10, 30, "view", None),
        (1, 11, 15, "click", 2.5),
    ],
    # microbatch 1: day 2 plus more day-1 10:00 traffic (cell replay
    # across epochs — merged at read, not overwritten)
    [(2, 9, 5, "view", 7.0), (1, 10, 45, "click", 0.25)],
    # microbatch 2: late arrival into day 1's 11:00 bucket
    [(1, 11, 59, "view", 4.0)],
]


def _direct(spark, spec):
    return sorted(
        map(
            tuple,
            _finalize(
                _merge_partials(
                    rollup_partials(_events(spark, spec)),
                    F.col("bucket_start"),
                )
            ).collect(),
        )
    )


def test_stream_rollup_equals_direct_recompute(spark, tmp_path):
    """Three microbatches through writeStream.format('rollup_store')
    must read back exactly equal to a one-pass batch GROUP BY over the
    union — merge correctness, NULL values, and late data included."""
    input_dir = str(tmp_path / "in")
    os.makedirs(input_dir)
    for i, spec in enumerate(_SLICES):
        _write_stream_file(spark, spec, f"{input_dir}/slice-{i}.parquet")
    store = str(tmp_path / "store")
    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )
    q = stream_cells(stream, store, str(tmp_path / "cp"))
    assert q is not None
    q.awaitTermination(120)
    got = sorted(map(tuple, read_rollup(spark, store).collect()))
    want = _direct(spark, [r for s in _SLICES for r in s])
    assert got == want
    # the sink's commit log recorded every epoch, and the layout is the
    # store's own: one batch_id=<epoch> cell set per microbatch
    epochs = committed_epochs(store)
    assert epochs == sorted(epochs) and len(epochs) >= 1
    cells = {
        os.path.relpath(os.path.dirname(f), store)
        for f in glob.glob(f"{store}/day=*/batch_id=*/*.parquet")
    }
    assert cells, "hive day/batch_id layout expected"
    ids = {c.split("batch_id=")[1] for c in cells}
    assert ids == {str(e) for e in epochs}


def test_stream_plan_has_no_shuffle_or_state(spark, tmp_path):
    """The sink aggregates map-side: the streaming query must run with
    ZERO shuffles and ZERO state-store operators (the whole point of
    making the sink the per-epoch aggregator)."""
    input_dir = str(tmp_path / "in")
    os.makedirs(input_dir)
    _write_stream_file(spark, _SLICES[0], f"{input_dir}/slice-0.parquet")
    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )
    q = stream_cells(stream, str(tmp_path / "store"), str(tmp_path / "cp"))
    q.awaitTermination(120)
    progresses = q.recentProgress
    assert progresses, "expected at least one microbatch progress"
    for p in progresses:
        assert p["stateOperators"] == []
    assert (
        sum(p["numInputRows"] for p in progresses) == len(_SLICES[0])
    )


def _mk_writer(store, schema_names=("ts", "event_type", "value")):
    cls = _writer_classes()["stream_writer"]
    schema = StructType.fromDDL(
        ", ".join(f"{n} STRING" for n in schema_names)
    )
    return cls({"path": store}, schema)


def _arrow_batch(spec):
    import pyarrow as pa

    rows = _rows(spec)
    return pa.record_batch(
        {
            "ts": pa.array(
                [r[1] for r in rows], type=pa.timestamp("us", tz="UTC")
            ),
            "event_type": pa.array([r[3] for r in rows]),
            "value": pa.array([r[4] for r in rows], type=pa.float64()),
        }
    )


def _store_rows(spark, store):
    return sorted(map(tuple, read_rollup(spark, store).collect()))


def test_epoch_replay_is_idempotent(spark, tmp_path):
    """Redelivery of an epoch under the same batchId (the Structured
    Streaming failure-replay contract) replaces exactly its own cells:
    store state identical after the replay, sibling epochs untouched."""
    store = str(tmp_path / "store")
    w = _mk_writer(store)
    msg = w.write(iter([_arrow_batch(_SLICES[0])]))
    w.commit([msg], batchId=0)
    w2 = _mk_writer(store)
    msg2 = w2.write(iter([_arrow_batch(_SLICES[1])]))
    w2.commit([msg2], batchId=1)
    once = _store_rows(spark, store)
    other_files = {
        f: os.stat(f).st_mtime_ns
        for f in glob.glob(f"{store}/**/batch_id=1/*.parquet", recursive=True)
    }
    # replay epoch 0 (fresh writer instance, same data, same id)
    w3 = _mk_writer(store)
    msg3 = w3.write(iter([_arrow_batch(_SLICES[0])]))
    w3.commit([msg3], batchId=0)
    assert _store_rows(spark, store) == once
    for f, mtime in other_files.items():
        assert os.stat(f).st_mtime_ns == mtime, f"epoch-1 file rewritten: {f}"
    # no staging residue either way
    assert not glob.glob(f"{store}/_staging_*")
    assert committed_epochs(store) == [0, 1]


def test_commit_skips_epochs_folded_by_compaction(spark, tmp_path):
    """An epoch at or below the compaction watermark is a SKIP: no
    cells land, no commit marker, staging removed — the replay cannot
    double-count rows already folded into the batch_id=-1 base."""
    store = str(tmp_path / "store")
    w = _mk_writer(store)
    msg = w.write(iter([_arrow_batch(_SLICES[0])]))
    w.commit([msg], batchId=0)
    compact_rollup(spark, store)
    before = _store_rows(spark, store)
    side = json.load(open(f"{store}/{FOLDED_SIDECAR}"))
    assert side["max_folded_batch_id"] == 0
    # redeliver epoch 0 after it was folded away
    w2 = _mk_writer(store)
    msg2 = w2.write(iter([_arrow_batch(_SLICES[0])]))
    w2.commit([msg2], batchId=0)
    assert _store_rows(spark, store) == before
    assert not glob.glob(f"{store}/day=*/batch_id=0/*"), "folded epoch relanded"
    assert not os.path.exists(f"{store}/{COMMITS_DIR}/0")
    assert not glob.glob(f"{store}/_staging_*")


def test_ntz_timestamps_merge_across_both_writers(spark, tmp_path):
    """timestamp_ntz inputs (the fixture events flavor after
    normalize_events_ts) must produce ntz partials from BOTH writers —
    a tz-stamped stream file next to an ntz batch file would break the
    read-side schema merge."""
    import pyarrow as pa

    store = str(tmp_path / "store")
    ntz = _events(spark, _SLICES[0]).withColumn(
        "ts", F.col("ts").cast("timestamp_ntz")
    )
    refresh_rollup(ntz, store, batch_id=0)
    rows = _rows(_SLICES[1])
    batch = pa.record_batch(
        {
            "ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
            "event_type": pa.array([r[3] for r in rows]),
            "value": pa.array([r[4] for r in rows], type=pa.float64()),
        }
    )
    w = _mk_writer(store)
    w.commit([w.write(iter([batch]))], batchId=1)
    got = _store_rows(spark, store)
    direct = sorted(
        map(
            tuple,
            _finalize(
                _merge_partials(
                    rollup_partials(
                        _events(
                            spark, _SLICES[0] + _SLICES[1]
                        ).withColumn(
                            "ts", F.col("ts").cast("timestamp_ntz")
                        )
                    ),
                    F.col("bucket_start"),
                )
            ).collect(),
        )
    )
    assert got == direct


def test_batch_and_stream_deliveries_merge_in_one_store(spark, tmp_path):
    """Batch refresh_rollup and the streaming sink write byte-compatible
    partial files: a store fed by both reads back as the direct GROUP BY
    over the union (schema merge would throw here if the file schemas
    diverged)."""
    store = str(tmp_path / "store")
    refresh_rollup(_events(spark, _SLICES[0]), store, batch_id=0)
    w = _mk_writer(store)
    msg = w.write(iter([_arrow_batch(_SLICES[1])]))
    w.commit([msg], batchId=1)
    got = _store_rows(spark, store)
    want = _direct(spark, _SLICES[0] + _SLICES[1])
    assert got == want
    # and compaction folds both delivery kinds into one base
    compact_rollup(spark, store)
    assert _store_rows(spark, store) == want


def test_snapshot_read_covers_stream_fed_store(spark, tmp_path):
    """X34 over X30: the stream sink's own `_commits/<epoch>` markers
    make a stream-fed store snapshot-readable with no extra plumbing."""
    from custom_python_etl_data_connector_shivaask_username_spark.operators.rollup import (
        read_rollup,
    )
    from custom_python_etl_data_connector_shivaask_username_spark.sources.rollup_store import (
        committed_epochs,
    )

    input_dir = str(tmp_path / "in")
    os.makedirs(input_dir)
    for i, spec in enumerate(_SLICES[:2]):
        _write_stream_file(spark, spec, f"{input_dir}/slice-{i}.parquet")
    store = str(tmp_path / "store")
    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )
    q = stream_cells(stream, store, str(tmp_path / "cp"))
    q.awaitTermination(120)
    assert committed_epochs(store) == [0, 1]
    snap = sorted(
        map(tuple, read_rollup(spark, store, snapshot=True).collect())
    )
    assert snap == sorted(map(tuple, read_rollup(spark, store).collect()))
    assert len(snap) > 0


def test_stream_and_batch_quantile_partials_agree(spark, tmp_path):
    """Round 10: the X30 sink's Arrow-built qhist and the batch path's
    Spark-built qhist use the same closed-form bucket ids — the same
    slices delivered each way serve IDENTICAL percentiles, and a store
    fed by BOTH kinds still schema-merges and answers."""
    from custom_python_etl_data_connector_shivaask_username_spark.operators.rollup import (
        rollup_quantiles,
    )

    batch_store = str(tmp_path / "batch")
    stream_store = str(tmp_path / "stream")
    for i, spec in enumerate(_SLICES):
        refresh_rollup(_events(spark, spec), batch_store, batch_id=i)
    w = _mk_writer(stream_store)
    for i, spec in enumerate(_SLICES):
        msg = w.write(iter([_arrow_batch(spec)]))
        w.commit([msg], batchId=i)
    qs = [0.5, 0.95]
    got_b = sorted(
        map(tuple, rollup_quantiles(spark, batch_store, qs).collect())
    )
    got_s = sorted(
        map(tuple, rollup_quantiles(spark, stream_store, qs).collect())
    )
    assert got_b == got_s and got_b

    # mixed-fed store: batch delivery + stream delivery, one answer
    mixed = str(tmp_path / "mixed")
    refresh_rollup(_events(spark, _SLICES[0]), mixed, batch_id=0)
    w2 = _mk_writer(mixed)
    msg = w2.write(iter([_arrow_batch(_SLICES[1] + _SLICES[2])]))
    w2.commit([msg], batchId=1)
    union_store = str(tmp_path / "union")
    refresh_rollup(
        _events(spark, [r for s in _SLICES for r in s]), union_store, 0
    )
    assert sorted(
        map(tuple, rollup_quantiles(spark, mixed, qs).collect())
    ) == sorted(
        map(tuple, rollup_quantiles(spark, union_store, qs).collect())
    )
