"""Window functions (SURVEY.md §2.5 W1-W6) — four registry queries.

Component map:
- W1 ranking + W6 percent_rank/cume_dist + W4 running sum →
  ``q_order_ranks_per_customer`` (two frame specs over one o_custkey
  shuffle: the price ordering carries the rank family, the date ordering
  carries the cumulative spend).
- W2 top-k per group → ``q_top3_orders_per_customer`` (WindowGroupLimit
  rewrite, plan-asserted in tests/test_plans.py).
- W3 lag/lead + W4 moving aggregate → ``q_event_deltas`` (one user_id
  shuffle, one ordering, both analytic and framed functions).
- W5 first/last in group → ``q_last_event_per_user`` (max_by/min_by —
  a single hash agg beats a window + filter when only the extreme row
  is needed).

Window partitions shuffle once on the partition key and sort within —
the same cost model at 100 TB as a grouped aggregation, provided the
partition key has enough cardinality (user_id/custkey do; a global
``Window.orderBy`` with no partitionBy would single-task and is never
used here). Every ORDER BY inside a window carries a unique tie-break
column so row_number/ntile/frames are deterministic for the oracle.

Frame sums use the exact-decimal strategy (compat.py): sliding-window
accumulator implementations differ between engines, exact decimal
arithmetic does not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table

# --- W1 + W6 + W4(running): the rank family over orders --------------------

_ORDER_RANKS_ORACLE = """
SELECT
  o_custkey,
  o_orderkey,
  ROW_NUMBER() OVER w AS rn,
  RANK() OVER w AS rnk,
  DENSE_RANK() OVER w AS drnk,
  NTILE(4) OVER w AS quartile,
  PERCENT_RANK() OVER w AS price_pct_rank,
  CUME_DIST() OVER w AS price_cume_dist,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  ) AS DOUBLE) AS cum_spend
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
ORDER BY o_custkey, rn
"""


@query("q_order_ranks_per_customer", oracle=_ORDER_RANKS_ORACLE)
def q_order_ranks_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1+W6+W4: the full ranking family, distribution position (exact
    rational arithmetic on ranks — bit-identical doubles across engines),
    and a running exact-decimal spend. One o_custkey shuffle feeds both
    orderings (two in-partition sorts, zero extra exchanges)."""
    orders = load_table(spark, sf_dir, "orders")
    w_price = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    w_date = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w_price).alias("rn"),
        F.rank().over(w_price).alias("rnk"),
        F.dense_rank().over(w_price).alias("drnk"),
        F.ntile(4).over(w_price).alias("quartile"),
        F.percent_rank().over(w_price).alias("price_pct_rank"),
        F.cume_dist().over(w_price).alias("price_cume_dist"),
        F.sum(F.col("o_totalprice").cast("decimal(27,6)"))
        .over(w_date)
        .cast("double")
        .alias("cum_spend"),
    )


# --- W2: top-k per group -----------------------------------------------------

_TOP3_PER_CUSTOMER_ORACLE = """
SELECT o_custkey, o_orderkey, o_totalprice
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
)
WHERE rn <= 3
ORDER BY o_custkey, o_totalprice DESC, o_orderkey
"""


@query("q_top3_orders_per_customer", oracle=_TOP3_PER_CUSTOMER_ORACLE)
def q_top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: rank-filter idiom; Spark 4 rewrites it to WindowGroupLimit so
    only 3 rows per key survive the sort — no full materialization."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


# --- W3 + W4(moving): event deltas and trailing average ----------------------

#: 30-minute inactivity gap — single source of truth for BOTH the batch
#: sessionization here and streaming ST4 (pipeline.py imports it), so
#: the two renderings cannot silently diverge.
SESSION_GAP_MIN = 30
SESSION_GAP_US = SESSION_GAP_MIN * 60 * 1_000_000

_EVENT_DELTAS_ORACLE = f"""
WITH base AS (
  SELECT
    event_id,
    user_id,
    ts,
    LAG(ts) OVER w AS prev_ts,
    epoch_us(ts) - epoch_us(LAG(ts) OVER w) AS delta_us,
    LEAD(event_type) OVER w AS next_type,
    CAST(SUM(CAST(value AS DECIMAL(27,6))) OVER wf AS DOUBLE)
      / COUNT(value) OVER wf AS moving_avg_value
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
         wf AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT
  event_id,
  user_id,
  prev_ts,
  delta_us,
  next_type,
  moving_avg_value,
  -- CAST: DuckDB's windowed integer SUM widens to HUGEINT, which the
  -- driver's value-hash encodes differently from Spark's BIGINT even
  -- when every value is identical (round-6 red row). Pin the width.
  CAST(SUM(CASE
        WHEN prev_ts IS NULL OR delta_us > {SESSION_GAP_US}
        THEN 1 ELSE 0
      END) OVER wc AS BIGINT) AS session_seq
FROM base
WINDOW wc AS (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
ORDER BY event_id
"""


@query("q_event_deltas", oracle=_EVENT_DELTAS_ORACLE)
def q_event_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3+W4 (+batch gap-sessionization, folded round 6): inter-event
    gaps in exact integer microseconds (no float time math, no
    unit-boundary semantics to disagree on), a 7-row trailing average
    with an exact-decimal numerator, and the classic lag-then-cumsum
    session assignment (``session_seq`` — a new session starts at the
    first event or after a silence STRICTLY longer than the 30-min
    gap; ``>`` not ``>=`` because native ``session_window`` MERGES an
    event arriving at exactly ``last_ts + gap`` — verified empirically
    by the exact-gap boundary pin in tests/test_streaming_sessions.py,
    so the batch twin agrees at the boundary, not just on gap-free
    fixtures. All three frames share the one user_id shuffle and
    ordering."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wf = w.rowsBetween(-6, 0)
    wc = w.rowsBetween(Window.unboundedPreceding, 0)
    # session tz is UTC, so NTZ -> TZ cast is the identity wall time
    micros = F.unix_micros(F.col("ts").cast("timestamp"))
    prev_micros = F.unix_micros(F.lag("ts").over(w).cast("timestamp"))
    session_start = prev_micros.isNull() | (
        (micros - prev_micros) > SESSION_GAP_US
    )
    return ev.select(
        "event_id",
        "user_id",
        F.lag("ts").over(w).alias("prev_ts"),
        (micros - prev_micros).alias("delta_us"),
        F.lead("event_type").over(w).alias("next_type"),
        (
            F.sum(F.col("value").cast("decimal(27,6)")).over(wf).cast("double")
            / F.count("value").over(wf)
        ).alias("moving_avg_value"),
        F.sum(F.when(session_start, 1).otherwise(0))
        .over(wc)
        .alias("session_seq"),
    )


# --- W5: first/last in group -------------------------------------------------

_LAST_EVENT_ORACLE = """
SELECT
  user_id,
  arg_max(event_type, ts) AS last_event_type,
  MAX(ts) AS last_ts,
  arg_min(event_type, ts) AS first_event_type
FROM events
GROUP BY user_id
ORDER BY user_id
"""


@query("q_last_event_per_user", oracle=_LAST_EVENT_ORACLE)
def q_last_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5 as an aggregate: max_by/min_by beat a window + filter when only
    the extreme row is needed (single hash agg, no sort)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.max_by("event_type", "ts").alias("last_event_type"),
            F.max("ts").alias("last_ts"),
            F.min_by("event_type", "ts").alias("first_event_type"),
        )
        .orderBy("user_id")
    )
