"""Vector math over ARRAY<FLOAT> embedding columns (SURVEY.md §2.11 L5).

Everything is built from array higher-order functions (zip_with /
aggregate / transform) — JVM-side, inside whole-stage codegen, no UDFs.
A 64-dim dot product is 64 fused multiply-adds per row; at 100 TB this
is scan-bound, exactly as it should be.

Precision rule: float32 elements are cast to DOUBLE (exact) before any
arithmetic. Never cast FLOAT directly to DECIMAL — engines disagree on
shortest-repr rounding ~1e-4 of the time; FLOAT→DOUBLE→DECIMAL is safe.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(arr: Column | str) -> Column:
    a = F.col(arr) if isinstance(arr, str) else arr
    return F.transform(a, lambda x: x.cast("double"))


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product: sequential left fold in double (deterministic)."""
    products = F.zip_with(as_double(a), as_double(b), lambda x, y: x * y)
    return F.aggregate(products, F.lit(0.0), lambda acc, x: acc + x)


def sq_norm(a: Column | str) -> Column:
    return dot(a, a)


def norm(a: Column | str) -> Column:
    return F.sqrt(sq_norm(a))


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def normalize(a: Column | str) -> Column:
    """Unit-normalize; zero vectors map to NULL elements (0/0)."""
    n = norm(a)
    return F.transform(as_double(a), lambda x: x / n)


def lit_vector(values) -> Column:
    """A literal query vector (e.g. collected driver-side)."""
    return F.array(*[F.lit(float(v)) for v in values])
