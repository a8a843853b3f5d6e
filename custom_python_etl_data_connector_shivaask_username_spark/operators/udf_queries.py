"""Python UDF surface (SURVEY.md §2.10 F1-F6) — the Arrow-batched entry
points, registered as first-class queries.

- F4 grouped-map ``applyInPandas`` → ``q_asof_pandas_merge``: a
  ``pandas.merge_asof`` rendering of the J7 as-of join, oracle-checked
  against the same DuckDB native ASOF JOIN as the window formulation in
  operators/relational.py — two independent implementations, one oracle.
- F3 ``GROUPED_AGG`` pandas UDAF → ``q_label_norm_stats``: per-label
  mean embedding norm. The UDAF sums with ``math.fsum`` (exact rational
  accumulation) so the result is independent of row order within the
  group — the same determinism-from-exactness strategy as compat.py.
- F1 scalar UDF + F6 SQL registration (``spark.udf.register``) are
  deliberately NOT in any hot path (Arrow-batched or JVM built-ins are
  always preferable); :func:`register_scalar_udfs` demonstrates the
  surface and is covered by tests/test_udfs.py.

Scale note: both queries shuffle once on their group key; the Python
boundary is Arrow-batched per group. F4's per-group pandas is the right
tool only when per-group logic has no vectorized equivalent — the window
formulation of the same as-of join (relational.py) is the preferred plan
and the bench keeps both honest.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table

# --- F4: applyInPandas merge_asof (J7 twin) ---------------------------------

_ASOF_ORACLE = """
SELECT e.event_id, e.user_id, p.ts AS last_purchase_ts
FROM events e
ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
  ON e.user_id = p.user_id AND e.ts >= p.ts
ORDER BY e.event_id
"""


@query("q_asof_pandas_merge", oracle=_ASOF_ORACLE)
def q_asof_pandas_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4: per-user ``pandas.merge_asof`` inside ``applyInPandas``.

    Same semantics as relational.q_last_purchase_asof (ASOF's
    ``e.ts >= p.ts`` — ``allow_exact_matches`` includes a purchase at the
    probe's own timestamp). One user_id shuffle, then Arrow-batched
    pandas per group. The window formulation stays JVM-side and is the
    preferred plan; this query exists to pin the grouped-map surface
    against the identical oracle.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts", kind="mergesort")
        purchases = pdf.loc[pdf["event_type"] == "purchase", ["ts"]].rename(
            columns={"ts": "last_purchase_ts"}
        )
        if purchases.empty:
            out = pdf[["event_id", "user_id"]].copy()
            out["last_purchase_ts"] = pd.NaT
            return out
        merged = pd.merge_asof(
            pdf[["event_id", "user_id", "ts"]],
            purchases,
            left_on="ts",
            right_on="last_purchase_ts",
            direction="backward",
            allow_exact_matches=True,
        )
        return merged[["event_id", "user_id", "last_purchase_ts"]]

    return ev.groupBy("user_id").applyInPandas(
        merge_group,
        "event_id bigint, user_id bigint, last_purchase_ts timestamp_ntz",
    )


# --- F3: GROUPED_AGG pandas UDAF --------------------------------------------

_LABEL_NORM_ORACLE = """
SELECT label,
       ROUND(CAST(SUM(CAST(norm6 AS DECIMAL(27,6))) AS DOUBLE)
             / COUNT(*), 6) AS mean_norm
FROM (
  SELECT label,
         ROUND(SQRT(LIST_AGGREGATE(LIST_TRANSFORM(embedding,
           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')), 6) AS norm6
  FROM embeddings
)
GROUP BY label
ORDER BY label
"""


@query("q_label_norm_stats", oracle=_LABEL_NORM_ORACLE)
def q_label_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3: per-label mean embedding norm via a GROUPED_AGG pandas UDAF.

    The per-row norm stays JVM-side (HOF fold, rounded to 6 so both
    engines agree exactly); only the grouped reduction crosses to Python.
    ``math.fsum`` makes the sum exact, hence order-independent — the
    UDAF twin of the DECIMAL(27,6) strategy the oracle uses.
    """
    emb = load_table(spark, sf_dir, "embeddings")

    @F.pandas_udf("double")
    def mean_fsum(v: pd.Series) -> float:
        return round(math.fsum(v) / len(v), 6)

    as_double = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    norm6 = F.round(
        F.sqrt(F.aggregate(as_double, F.lit(0.0), lambda a, x: a + x * x)), 6
    )
    return (
        emb.select("label", norm6.alias("norm6"))
        .groupBy("label")
        .agg(mean_fsum("norm6").alias("mean_norm"))
        .orderBy("label")
    )


# --- F1 + F6: scalar UDF demo + SQL registration ----------------------------


def register_scalar_udfs(spark: SparkSession) -> None:
    """F1/F6 surface demo: a scalar Python UDF registered for both the
    DataFrame API and SQL (``spark.udf.register``).

    Kept OUT of every registry query on purpose: a row-at-a-time Python
    UDF forces JVM→Python serialization per row and breaks whole-stage
    codegen — the functions it would compute here (domain extraction)
    are expressible with ``regexp_extract``. Exists so the surface is
    demonstrated and tested (tests/test_udfs.py), with the performance
    doctrine stated where a user will find it.
    """

    def src_ordinal(source: str) -> int | None:
        if source is None:
            return None
        digits = "".join(ch for ch in source if ch.isdigit())
        return int(digits) if digits else None

    spark.udf.register("src_ordinal", src_ordinal, "int")


def make_relu_udf():
    """F2 demo: an Arrow-batched scalar pandas UDF (iterator form) — the
    acceptable shape for Python math when built-ins genuinely cannot
    express it. Built lazily (pandas_udf parses its DDL return type
    against the active session). Tested in tests/test_udfs.py."""

    @F.pandas_udf("double")
    def relu(v: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in v:
            yield s.clip(lower=0.0)

    return relu
