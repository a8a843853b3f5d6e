"""ETL pipeline queries — the reference's Extract→Transform→Load semantics
(README.md:21-34) exercised end-to-end on the events feed.

The deterministic parts (parse, validate, project, quarantine counts,
dedup) are oracle-checked; the non-deterministic ingest timestamp is
asserted in unit tests instead (tests/test_etl.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.etl import quarantine_split
from ..registry import query
from ..tables import load_table

# --- normalized connector output --------------------------------------------

_EVENTS_NORMALIZED_ORACLE = """
SELECT
  event_id,
  user_id,
  event_type AS etype,
  CAST(json_extract_string(props, '$.k') AS INT) AS prop_k,
  ROUND(CAST(value AS DECIMAL(18,2)) * 100, 0)::BIGINT AS value_cents
FROM events
WHERE value IS NOT NULL
  AND json_extract_string(props, '$.k') IS NOT NULL
ORDER BY event_id
"""


@query("q_etl_events_normalized", oracle=_EVENTS_NORMALIZED_ORACLE)
def q_etl_events_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1/T3/T4/T8: the connector Transform — parse the JSON payload,
    validate, coerce types, project/rename for the sink."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.withColumn("prop_k", k)
        .filter(F.col("value").isNotNull() & F.col("prop_k").isNotNull())
        .select(
            "event_id",
            "user_id",
            F.col("event_type").alias("etype"),
            "prop_k",
            F.round(F.col("value").cast("decimal(18,2)") * 100, 0)
            .cast("bigint")
            .alias("value_cents"),
        )
    )


# --- quarantine split ---------------------------------------------------------

_QUARANTINE_ORACLE = """
SELECT
  CAST(COUNT(*) FILTER (WHERE value IS NOT NULL AND value <= 300
       AND json_extract_string(props, '$.k') IS NOT NULL) AS BIGINT) AS ok_count,
  CAST(COUNT(*) FILTER (WHERE NOT (value IS NOT NULL AND value <= 300
       AND json_extract_string(props, '$.k') IS NOT NULL)
       OR (value IS NULL)) AS BIGINT) AS quarantined_count
FROM events
"""


@query("q_etl_quarantine_counts", oracle=_QUARANTINE_ORACLE)
def q_etl_quarantine_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T10: validation split (README.md:32-34) — one source scan feeds both
    the clean sink and the quarantine; here we emit the audit counts."""
    ev = load_table(spark, sf_dir, "events")
    valid = (
        F.col("value").isNotNull()
        & (F.col("value") <= 300)
        & F.get_json_object("props", "$.k").isNotNull()
    )
    ok, bad = quarantine_split(ev, valid)
    return ok.agg(F.count(F.lit(1)).alias("ok_count")).crossJoin(
        bad.agg(F.count(F.lit(1)).alias("quarantined_count"))
    )


# T9 dedupe-on-reingestion is covered by llm_dedup.q_dedup_exact_documents
# (content-hash groupBy with a deterministic min-id survivor) — the same
# operator at full strength, so no separate audit query is registered.
