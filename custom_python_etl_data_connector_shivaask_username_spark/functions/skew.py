"""Skew mitigation for hot join keys (SURVEY.md §4 'salt hot keys').

AQE's skew-join split (enabled engine-wide in session.py) handles most
skew by splitting oversized sort-merge partitions at runtime. Salting is
the complementary *plan-time* tool for the case AQE can't fix: a
broadcast-ineligible dimension joined on a key where one value carries a
large share of the fact rows — the single reducer for that key becomes
the stage's straggler.

``salted_join`` splits every hot key's rows across ``n_salts`` reducers:
the fact side gets a deterministic per-row salt (hash of a row-unique
column — never ``rand()``, which would break retry/resume determinism),
the dimension side is exploded ``n_salts`` times, and the join key
becomes (key, salt). Dimension duplication is the price: use only when
dim x n_salts is still small relative to the fact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    row_id: str | Column,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``fact`` and ``dim`` on ``on`` with the fact's hot keys
    spread across ``n_salts`` reducers.

    ``row_id`` must be a row-unique fact column (event_id, orderkey …):
    its hash assigns each fact row a stable salt, so rows of one hot key
    land on ``n_salts`` different (key, salt) reducers while results stay
    identical to the unsalted join (verified in tests/test_skew.py).
    """
    rid = F.col(row_id) if isinstance(row_id, str) else row_id
    salted_fact = fact.withColumn(
        SALT_COL, F.pmod(F.xxhash64(rid), F.lit(n_salts)).cast("int")
    )
    salts = F.explode(
        F.array(*[F.lit(i) for i in range(n_salts)])
    ).alias(SALT_COL)
    salted_dim = dim.select("*", salts)
    out = salted_fact.join(salted_dim, on=[on, SALT_COL], how=how)
    return out.drop(SALT_COL)
