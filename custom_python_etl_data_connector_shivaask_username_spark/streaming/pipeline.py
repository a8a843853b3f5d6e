"""Structured Streaming operators (SURVEY.md §2.9 ST1-ST10).

The reference connector is a poll-and-load loop (README.md:29); its
native Spark rendering is ``readStream → transform → writeStream``.
Everything here is built as *builders over an unbounded DataFrame* so the
same code runs against a file stream in tests (deterministic
``availableNow`` micro-batches) and a real feed in production.

Registry integration: each streaming query executes the pipeline to
completion with the availableNow trigger into a memory sink and returns
the result as a batch DataFrame — so windowed/session/dedup semantics are
oracle-checked against DuckDB, not just smoke-tested.

State-scale notes (the 100 TB view): every stateful op below keys its
state by (window/user) and is bounded by ``withWatermark`` — the state
store holds only the open horizon, and partitions scale with
``spark.sql.shuffle.partitions``. Complete-output mode appears only where
the keyspace is known-tiny (hourly windows × 5 event types).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..session import apply_runtime_confs

#: events parquet physical schema — ts is TIMESTAMP(NANOS), which Spark
#: reads only as LONG (nanosAsLong); converted right after the source.
EVENTS_RAW_SCHEMA = (
    "event_id BIGINT, ts BIGINT, user_id BIGINT, "
    "event_type STRING, value DOUBLE, props STRING"
)


def stream_events(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """S9/ST1 source: the events feed as an unbounded file stream."""
    apply_runtime_confs(spark)
    # the file-stream source requires a directory; the fixture is a single
    # parquet file inside sf_dir, so glob-filter it from the table dir
    reader = (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.parquet(sf_dir)
    return raw.withColumn(
        "ts", F.expr("timestamp_micros(ts div 1000)")
    )


def run_stream_to_df(
    sdf: DataFrame,
    output_mode: str = "append",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Execute a (bounded) streaming DataFrame to completion and return
    the materialized result: availableNow trigger + memory sink."""
    name = f"stream_out_{uuid.uuid4().hex[:12]}"
    writer = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.start()
    q.awaitTermination()
    return sdf.sparkSession.table(name)


def foreach_batch_load(
    sdf: DataFrame,
    connector_name: str,
    base_path: str,
    transform=None,
) -> None:
    """ST1: the connector E→T→L cycle as a micro-batch loop — each batch
    is transformed and appended to ``{connector}_raw`` (README.md:21-29)."""
    from ..sources.sinks import write_raw

    def load_fn(batch_df: DataFrame, batch_id: int) -> None:
        out = transform(batch_df) if transform else batch_df
        write_raw(
            out.withColumn("_batch_id", F.lit(batch_id)),
            connector_name,
            base_path,
        )

    q = (
        sdf.writeStream.foreachBatch(load_fn)
        .trigger(availableNow=True)
        .option(
            "checkpointLocation",
            f"{base_path.rstrip('/')}/_checkpoint_{connector_name}",
        )
        .start()
    )
    q.awaitTermination()


# --- ST2: tumbling window aggregation -------------------------------------------

_TUMBLING_ORACLE = """
SELECT make_timestamp(CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT)
                      * 3600000000) AS window_start,
       event_type,
       COUNT(*) AS event_count
FROM events
GROUP BY 1, 2
ORDER BY window_start, event_type
"""


def tumbling_counts(events: DataFrame) -> DataFrame:
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("event_count"))
    )


@query("q_stream_tumbling_counts", oracle=_TUMBLING_ORACLE)
def q_stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST2/ST10: hourly tumbling counts, executed as a real streaming job
    (availableNow), then compared to the batch bucketing oracle."""
    out = run_stream_to_df(
        tumbling_counts(stream_events(spark, sf_dir)), "complete"
    )
    return out.select(
        F.col("window.start").cast("timestamp_ntz").alias("window_start"),
        "event_type",
        "event_count",
    ).orderBy("window_start", "event_type")


# --- ST3: sliding window -----------------------------------------------------------

_SLIDING_ORACLE = """
WITH buckets AS (
  SELECT make_timestamp(
           (CAST(floor(epoch_us(ts) / 1800000000) AS BIGINT) - s.shift)
           * 1800000000) AS window_start,
         value
  FROM events
  CROSS JOIN (SELECT unnest([0, 1]) AS shift) s
)
SELECT window_start,
       CAST(COUNT(*) AS BIGINT) AS event_count,
       CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS total_value
FROM buckets
GROUP BY window_start
ORDER BY window_start
"""


def sliding_value_sums(events: DataFrame) -> DataFrame:
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour", "30 minutes"))
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.sum(F.col("value").cast("decimal(27,6)"))
            .cast("double")
            .alias("total_value"),
        )
    )


@query("q_stream_sliding_value", oracle=_SLIDING_ORACLE)
def q_stream_sliding_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST3: 1-hour windows sliding every 30 minutes — each event lands in
    2 windows (the oracle replicates via the shift cross join)."""
    out = run_stream_to_df(
        sliding_value_sums(stream_events(spark, sf_dir)), "complete"
    )
    return out.select(
        F.col("window.start").cast("timestamp_ntz").alias("window_start"),
        "event_count",
        "total_value",
    ).orderBy("window_start")


# --- ST4: session windows ------------------------------------------------------------

SESSION_GAP_MIN = 30

_SESSION_ORACLE = f"""
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w)
                   > {SESSION_GAP_MIN} * 60 * 1000000
              OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, ts,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
)
SELECT user_id,
       CAST(COUNT(DISTINCT session_id) AS BIGINT) AS session_count,
       CAST(COUNT(*) AS BIGINT) AS event_count
FROM sessions
GROUP BY user_id
ORDER BY user_id
"""


def session_stats(events: DataFrame) -> DataFrame:
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(
            F.session_window("ts", f"{SESSION_GAP_MIN} minutes"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("events_in_session"))
    )


@query("q_stream_session_window")  # rows-only: append emits closed sessions
def q_stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST4: native streaming session windows (30-min gap). Append mode
    emits sessions once the watermark passes them — on a bounded run the
    final open horizon stays in state, so this is registered rows-only;
    exact semantics are pinned on synthetic sessions in
    tests/test_streaming.py and the batch-equivalent sessionization below
    is oracle-checked."""
    out = run_stream_to_df(
        session_stats(stream_events(spark, sf_dir)), "append"
    )
    return out.select(
        F.col("session_window.start").cast("timestamp_ntz").alias("session_start"),
        F.col("session_window.end").cast("timestamp_ntz").alias("session_end"),
        "user_id",
        "events_in_session",
    ).orderBy("user_id", "session_start")


@query("q_sessionization_batch", oracle=_SESSION_ORACLE)
def q_sessionization_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST4 batch twin: gaps-and-islands sessionization (lag → new-session
    flag → running sum), the formulation that also backfills historical
    sessions at 100 TB (one shuffle on user_id, two window passes)."""
    from pyspark.sql import Window

    from ..tables import load_table

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = SESSION_GAP_MIN * 60 * 1_000_000
    micros = F.unix_micros(F.col("ts").cast("timestamp"))
    prev_micros = F.unix_micros(F.lag("ts").over(w).cast("timestamp"))
    marked = ev.withColumn(
        "is_new",
        F.when(
            prev_micros.isNull() | ((micros - prev_micros) > gap_us), 1
        ).otherwise(0),
    )
    cum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    sessions = marked.withColumn("session_id", F.sum("is_new").over(cum))
    return (
        sessions.groupBy("user_id")
        .agg(
            F.countDistinct("session_id").alias("session_count"),
            F.count(F.lit(1)).alias("event_count"),
        )
        .orderBy("user_id")
    )


# --- ST6: streaming dedup --------------------------------------------------------------

_DEDUP_ORACLE = """
SELECT event_type, COUNT(DISTINCT event_id) AS unique_events
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def stream_dedup(events: DataFrame) -> DataFrame:
    return events.withWatermark("ts", "1 hour").dropDuplicates(["event_id"])


@query("q_stream_dedup_counts", oracle=_DEDUP_ORACLE)
def q_stream_dedup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST6: exactly-once-ish ingestion — the stream carries every event
    TWICE (simulated connector re-delivery via self-union), streaming
    dropDuplicates restores uniqueness."""
    ev = stream_events(spark, sf_dir)
    redelivered = ev.unionByName(ev)  # at-least-once delivery simulation
    deduped = stream_dedup(redelivered)
    out = run_stream_to_df(deduped, "append")
    return (
        out.groupBy("event_type")
        .agg(F.countDistinct("event_id").alias("unique_events"))
        .orderBy("event_type")
    )


# --- ST8/ST9: stream-static and stream-stream joins ---------------------------------------

_STREAM_STATIC_ORACLE = """
SELECT n_name, COUNT(*) AS event_count
FROM events
JOIN nation ON CAST(user_id % 25 AS INT) = n_nationkey
GROUP BY n_name
ORDER BY n_name
"""


@query("q_stream_static_join", oracle=_STREAM_STATIC_ORACLE)
def q_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST8: enrich the stream with a broadcast dim (users → synthetic
    nation key; the fixtures carry no direct FK)."""
    from ..tables import load_table

    ev = stream_events(spark, sf_dir).withColumn(
        "nk", (F.col("user_id") % 25).cast("int")
    )
    nation = load_table(spark, sf_dir, "nation")
    joined = ev.join(
        F.broadcast(nation), ev.nk == nation.n_nationkey
    )
    out = run_stream_to_df(joined, "append")
    return (
        out.groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("event_count"))
        .orderBy("n_name")
    )


_STREAM_STREAM_ORACLE = """
SELECT v.user_id, COUNT(*) AS pair_count
FROM events v JOIN events c
  ON v.user_id = c.user_id
 AND v.event_type = 'view' AND c.event_type = 'purchase'
 AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL 2 HOUR
GROUP BY v.user_id
ORDER BY v.user_id
"""


@query("q_stream_stream_join", oracle=_STREAM_STREAM_ORACLE)
def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST9: watermarked stream-stream join — views joined to purchases by
    the same user within 2 hours; both sides' state is bounded by the
    time-range condition + watermarks."""
    ev = stream_events(spark, sf_dir)
    views = (
        ev.filter(F.col("event_type") == "view")
        .withWatermark("ts", "1 hour")
        .select(
            F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts")
        )
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .withWatermark("ts", "1 hour")
        .select(
            F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
        )
    )
    joined = views.join(
        purchases,
        (F.col("v_user") == F.col("c_user"))
        & (F.col("c_ts") > F.col("v_ts"))
        & (F.col("c_ts") <= F.col("v_ts") + F.expr("INTERVAL 2 HOUR")),
    )
    out = run_stream_to_df(joined, "append")
    return (
        out.groupBy(F.col("v_user").alias("user_id"))
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .orderBy("user_id")
    )
