"""Cross-engine deterministic aggregate helpers.

Problem: ``SUM(double)`` is order-dependent; Spark's partial/final
aggregation order and DuckDB's parallel aggregation order differ, so at
sf0.01 magnitudes (sums ~3e9) the engines disagree beyond the 6th decimal
and ``round(x, 6)`` cannot rescue a hash-exact comparison.

Solution: the fixture doubles are low-decimal (prices/discounts 2dp,
quantities integral), so casting the per-row double expression to
``DECIMAL(27,6)`` is an exact, engine-identical operation; the decimal SUM
is then exact integer arithmetic, and casting the final result to DOUBLE
yields bit-identical values in Spark and DuckDB regardless of evaluation
order. This also holds on a 1000-executor cluster — determinism comes from
exactness, not from controlling execution order.

Each helper has a Spark (Column) form and a SQL-text twin so the DataFrame
query and the DuckDB oracle stay in lockstep.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: 21 integer digits + 6 fraction digits; Spark's sum widens to (37,6),
#: DuckDB's to (38,6) — both exact, both cast back to the same double.
DEC = "decimal(27,6)"


def dsum(col: Column | str, alias: str) -> Column:
    """Exact sum of a double expression, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double").alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """Exact-sum average: identical double division in both engines."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast(DEC)).cast("double") / F.count(c)).alias(alias)


def sql_dsum(expr: str, alias: str) -> str:
    """DuckDB twin of :func:`dsum`.

    The double conversion detours through VARCHAR: DuckDB's direct
    DECIMAL→DOUBLE cast is NOT correctly rounded (it divides the
    mantissa by 10^scale in binary FP), while Spark's
    BigDecimal.doubleValue IS — measured at the sf1.0 sweep, where the
    ×10 sum_charge total (~2.8e10) landed one ulp apart
    (…94159 vs …941593) and the 6-decimal round no longer absorbed it
    (ulp ≈ 3.7e-6 at that magnitude). VARCHAR→DOUBLE uses strtod's
    correct rounding, so both engines emit the nearest double of the
    identical exact decimal at ANY magnitude."""
    return (
        f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(27,6))) AS VARCHAR)"
        f" AS DOUBLE) AS {alias}"
    )


def sql_davg(expr: str, alias: str) -> str:
    """DuckDB twin of :func:`davg` (VARCHAR detour: see sql_dsum)."""
    return (
        f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(27,6))) AS VARCHAR)"
        f" AS DOUBLE) / COUNT({expr}) AS {alias}"
    )
