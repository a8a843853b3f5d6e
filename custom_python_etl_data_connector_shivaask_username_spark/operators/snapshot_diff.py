"""X42: corpus snapshot diff — what changed between two versions of
a document corpus, in one id-join.

The re-ingest loop (X15 incremental dedup, X26 drift monitor, X35
incremental stats) keeps asking the same question between corpus
snapshots: which documents are NEW, which DISAPPEARED, which ids
stayed but their content CHANGED? Answering it by re-deduping the
union wastes a full near-dup pass on what is really a keyed
set-difference. This module answers it the cheap way:

- :func:`snapshot_diff` — full outer join of the two snapshots on the
  id, comparing a content fingerprint (xxhash64 of the content
  column, computed map-side — the join shuffles ids and 8-byte
  hashes, never document text). One shuffle total; the output labels
  every id ``added`` / ``removed`` / ``changed`` / ``unchanged``.
- :func:`snapshot_diff_counts` — the 4-row summary (one extra agg).

100 TB shape: text never moves — each side reduces to ``(id, hash)``
before the join, AQE handles skewed id spaces, and the diff output is
id-scale, not corpus-scale. Selecting the changed documents' text
afterwards is a semi-join of the corpus against the (small) changed-id
set — pushdown-friendly.

The ``unchanged`` class can be excluded (``include_unchanged=False``,
the default) so the result stays proportional to the churn, not the
corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "text",
    include_unchanged: bool = False,
) -> DataFrame:
    """Label every document id across two corpus snapshots.

    Returns ``(id_col, change)`` with ``change`` ∈ ``added`` (id only
    in ``new``), ``removed`` (only in ``old``), ``changed`` (both
    sides, different content fingerprint), and — only when asked —
    ``unchanged``. Duplicate ids within a snapshot are rejected
    loudly (a diff over a non-keyed corpus is ill-defined; run exact
    dedup first), and so are NULL ids: the full-outer equi-join is
    null-rejecting, so a NULL-id document present in BOTH snapshots
    would otherwise be silently emitted twice — once ``added``, once
    ``removed``."""
    for side, df in (("old", old), ("new", new)):
        missing = {id_col, content_col} - set(df.columns)
        if missing:
            raise ValueError(f"{side} snapshot lacks columns {missing}")

    def keyed(df: DataFrame, side: str, alias: str) -> DataFrame:
        # one agg doubles as the loud duplicate-id guard (the
        # time_spine assert_true convention): a non-keyed snapshot
        # errors at execution instead of silently multiplying rows
        # through the outer join
        agg = (
            df.select(
                F.col(id_col), F.xxhash64(F.col(content_col)).alias(alias)
            )
            .groupBy(id_col)
            .agg(
                F.first(alias).alias(alias),
                F.count(F.lit(1)).alias("__c"),
            )
        )
        guarded = F.when(
            F.assert_true(
                F.col("__c") == 1,
                f"snapshot_diff: duplicate {id_col!r} in the {side} "
                "snapshot — diff is ill-defined; exact-dedup first",
            ).isNull()
            # NULL ids never equi-join: a null-id doc alive in both
            # snapshots would label as added AND removed. Refuse.
            & F.assert_true(
                F.col(id_col).isNotNull(),
                f"snapshot_diff: NULL {id_col!r} in the {side} "
                "snapshot — ids must be non-null; filter or key first",
            ).isNull(),
            F.col(alias),
        )
        return agg.select(F.col(id_col), guarded.alias(alias))

    o = keyed(old, "old", "__ho")
    n = keyed(new, "new", "__hn")
    joined = o.join(n, on=id_col, how="full_outer")
    change = (
        F.when(F.col("__ho").isNull(), F.lit("added"))
        .when(F.col("__hn").isNull(), F.lit("removed"))
        .when(F.col("__ho") != F.col("__hn"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = joined.select(id_col, change.alias("change"))
    if not include_unchanged:
        out = out.where(F.col("change") != "unchanged")
    return out


def snapshot_diff_counts(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "text",
) -> DataFrame:
    """The churn summary: one row per change class (including
    ``unchanged``), counted."""
    return (
        snapshot_diff(old, new, id_col, content_col, include_unchanged=True)
        .groupBy("change")
        .agg(F.count(F.lit(1)).alias("docs"))
    )
