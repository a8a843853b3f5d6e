"""Set operations (SURVEY.md §2.7 U1-U3) + distinct (A9) — one query.

Union is the connector-merge primitive (one `{connector}_raw` table per
source, unioned for analysis — reference README.md:28-29); except is the
re-ingestion diff primitive. All four branches map to single-shuffle
Catalyst plans; the tagged union keeps each op's result distinguishable
while fitting one registry slot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table

_SETOPS_ORACLE = """
SELECT 'union_all' AS op, nationkey, CAST(COUNT(*) AS BIGINT) AS n
FROM (
  SELECT c_nationkey AS nationkey FROM customer
  UNION ALL
  SELECT s_nationkey AS nationkey FROM supplier
) u
GROUP BY nationkey
UNION ALL
SELECT 'intersect' AS op, nationkey, CAST(1 AS BIGINT) AS n FROM (
  SELECT c_nationkey AS nationkey FROM customer
  INTERSECT
  SELECT s_nationkey FROM supplier
)
UNION ALL
SELECT 'except' AS op, nationkey, CAST(1 AS BIGINT) AS n FROM (
  SELECT c_nationkey AS nationkey FROM customer
  EXCEPT
  SELECT s_nationkey FROM supplier
)
UNION ALL
SELECT 'distinct' AS op, nationkey, CAST(1 AS BIGINT) AS n FROM (
  SELECT DISTINCT nationkey FROM (
    SELECT c_nationkey AS nationkey FROM customer
    UNION ALL
    SELECT s_nationkey AS nationkey FROM supplier
  )
)
ORDER BY op, nationkey
"""


@query("q_setops_nations", oracle=_SETOPS_ORACLE)
def q_setops_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 unionByName (bag), U2 intersect, U3 except/subtract, A9
    distinct — each branch tagged with its operator name.

    The branches share the two scans; Catalyst executes each set op as
    its canonical plan (union=concat, intersect/except=left-semi/anti on
    distinct, distinct=hash agg on all columns).
    """
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )

    union_all = (
        c.unionByName(s)
        .groupBy("nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("union_all").alias("op"), "nationkey", "n")
    )
    intersect = c.intersect(s).select(
        F.lit("intersect").alias("op"), "nationkey", F.lit(1).cast("bigint").alias("n")
    )
    except_ = c.subtract(s).select(
        F.lit("except").alias("op"), "nationkey", F.lit(1).cast("bigint").alias("n")
    )
    distinct = (
        c.unionByName(s)
        .distinct()
        .select(
            F.lit("distinct").alias("op"),
            "nationkey",
            F.lit(1).cast("bigint").alias("n"),
        )
    )
    return (
        union_all.unionByName(intersect)
        .unionByName(except_)
        .unionByName(distinct)
        .orderBy("op", "nationkey")
    )
