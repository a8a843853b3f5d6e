"""Registry-wide DuckDB result-type lint.

Three rounds in a row the *only* red CORRECTNESS row was an
oracle-representation defect, never a value defect: r4 timestamp
NANOS encoding, r5 DECIMAL rounding, r6 windowed integer SUM widening
to HUGEINT. The driver hashes the raw Arrow values of both result
sets, so a DuckDB-side type that Spark cannot produce (HUGEINT,
DECIMAL, nanosecond timestamps) flips the hash even when every value
is identical.

This test kills the class: every registered ``oracle_sql()`` is bound
through DuckDB against the sf0.001 fixtures and its *result schema*
must contain only types with an exact Spark counterpart. Binding is
lazy (``rel.types`` plans without executing), so the whole sweep is
sub-second.
"""

from __future__ import annotations

import re

import pytest

from custom_python_etl_data_connector_shivaask_username_spark import registry
from tests.conftest import SF_DIR
from tests.oracle import duck_connect

registry.load_all()

#: DuckDB type names whose Arrow encoding matches what Spark emits for
#: the same logical value. Anything else (HUGEINT, DECIMAL(p,s),
#: TIMESTAMP_NS, unsigned ints, ...) has bitten the driver hash before
#: or plausibly would — CAST it away in the oracle SQL instead.
_ALLOWED_SCALAR = {
    "BOOLEAN",
    "TINYINT",
    "SMALLINT",
    "INTEGER",
    "BIGINT",
    "FLOAT",
    "DOUBLE",
    "VARCHAR",
    "DATE",
    "TIMESTAMP",  # microsecond precision — matches Spark TimestampNTZ
}

# LIST/STRUCT wrappers are fine as long as every leaf is allowed.
_LEAF_RE = re.compile(r"[A-Z_]+(?:\([^)]*\))?")


def _leaf_types(duck_type: str) -> list[str]:
    """Extract scalar leaf type names from a DuckDB type string."""
    s = str(duck_type)
    leaves = []
    for tok in _LEAF_RE.findall(s):
        base = tok.split("(")[0]
        if base in ("LIST", "STRUCT", "MAP", "ARRAY"):
            continue
        leaves.append(tok)
    return leaves


@pytest.fixture(scope="module")
def duck():
    con = duck_connect(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(registry.ORACLE))
def test_oracle_result_types_have_exact_spark_twins(duck, name):
    rel = duck.sql(registry.ORACLE[name])
    offenders = []
    for col, ty in zip(rel.columns, rel.types):
        for leaf in _leaf_types(str(ty)):
            if leaf not in _ALLOWED_SCALAR:
                offenders.append((col, str(ty)))
                break
    assert not offenders, (
        f"{name}: oracle SQL produces DuckDB-only result types "
        f"{offenders}; the driver's value-hash encodes these "
        f"differently from Spark's output even when values are "
        f"bit-exact. CAST the column in the oracle SQL "
        f"(e.g. CAST(... AS BIGINT/DOUBLE))."
    )
