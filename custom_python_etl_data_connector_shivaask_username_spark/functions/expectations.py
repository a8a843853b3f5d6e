"""Data-quality expectations: declarative rules, one aggregation pass.

A Deequ-style check without the dependency: each rule is a boolean
Column; :func:`check_expectations` counts violations for EVERY rule in
a single ``agg`` over one scan (``count_if(NOT rule)`` per rule —
map-side partial aggregation, so the cost at 100 TB is one pass over
the data regardless of how many rules are attached). This is the
check-stage complement to the transform-stage ``quarantine_split``
(T10): expectations measure, quarantine routes.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class ExpectationReport:
    total_rows: int
    violations: dict[str, int]

    @property
    def passed(self) -> bool:
        return all(v == 0 for v in self.violations.values())

    def violation_rate(self, rule: str) -> float:
        return self.violations[rule] / self.total_rows if self.total_rows else 0.0


def check_expectations(
    df: DataFrame, rules: dict[str, Column]
) -> ExpectationReport:
    """Evaluate every rule in ONE aggregation pass over ONE scan."""
    aggs = [F.count(F.lit(1)).alias("_total")] + [
        F.count_if(~rule).alias(name) for name, rule in rules.items()
    ]
    row = df.agg(*aggs).collect()[0]
    return ExpectationReport(
        total_rows=row["_total"],
        violations={name: row[name] for name in rules},
    )
