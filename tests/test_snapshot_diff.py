"""X42 pins: snapshot diff labels added/removed/changed exactly (vs a
DuckDB full-outer-join twin on real documents with planted churn),
unchanged rows stay out of the result by default, duplicate ids fail
loudly, and the plan ships hashes — never document text — through the
join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from custom_python_etl_data_connector_shivaask_username_spark.operators.snapshot_diff import (
    snapshot_diff,
    snapshot_diff_counts,
)
from custom_python_etl_data_connector_shivaask_username_spark.tables import load_table
from tests.oracle import duck_connect


def _snapshots(spark, sf_dir):
    """Planted churn over the real documents table: drop ids %7==0
    (removed), rewrite ids %5==0 (changed), append fresh ids
    (added)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    old = docs
    new = (
        docs.where(F.col("doc_id") % 7 != 0)
        .withColumn(
            "text",
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(F.col("text"), F.lit(" [edited]")),
            ).otherwise(F.col("text")),
        )
        .unionByName(
            docs.select(
                (F.col("doc_id") + 1_000_000).alias("doc_id"),
                F.lit("brand new document").alias("text"),
            ).limit(17)
        )
    )
    return old, new


def test_snapshot_diff_matches_duckdb(spark, sf_dir):
    old, new = _snapshots(spark, sf_dir)
    got = {
        (r["doc_id"], r["change"])
        for r in snapshot_diff(old, new).collect()
    }
    con = duck_connect(sf_dir)
    want = {
        (i, c)
        for i, c in con.sql("""
            WITH old AS (SELECT doc_id, text FROM documents),
            new AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 5 = 0
                          THEN text || ' [edited]' ELSE text END
                     AS text
              FROM documents WHERE doc_id % 7 != 0
              UNION ALL
              SELECT * FROM (
                SELECT doc_id + 1000000 AS doc_id,
                       'brand new document' AS text
                FROM documents ORDER BY doc_id LIMIT 17
              )
            )
            SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
                   CASE WHEN o.doc_id IS NULL THEN 'added'
                        WHEN n.doc_id IS NULL THEN 'removed'
                        WHEN o.text != n.text THEN 'changed'
                        ELSE 'unchanged' END AS change
            FROM old o FULL OUTER JOIN new n USING (doc_id)
        """).fetchall()
        if c != "unchanged"
    }
    # the appended ids differ (DuckDB LIMIT picks an arbitrary 17),
    # so compare the non-added classes exactly and added by count
    assert {p for p in got if p[1] != "added"} == {
        p for p in want if p[1] != "added"
    }
    assert sum(1 for _, c in got if c == "added") == 17
    # default excludes unchanged entirely
    assert not any(c == "unchanged" for _, c in got)


def test_snapshot_diff_counts_and_unchanged(spark, sf_dir):
    old, new = _snapshots(spark, sf_dir)
    counts = {
        r["change"]: r["docs"] for r in snapshot_diff_counts(old, new).collect()
    }
    n_docs = old.count()
    assert counts["removed"] == old.where(F.col("doc_id") % 7 == 0).count()
    assert counts["added"] == 17
    assert counts["changed"] == old.where(
        (F.col("doc_id") % 7 != 0) & (F.col("doc_id") % 5 == 0)
    ).count()
    assert sum(counts.values()) == n_docs + 17  # every id labeled once
    # identity diff: everything unchanged
    idc = {
        r["change"]: r["docs"]
        for r in snapshot_diff_counts(old, old).collect()
    }
    assert idc == {"unchanged": n_docs}


def test_snapshot_diff_guards(spark, sf_dir):
    old, _ = _snapshots(spark, sf_dir)
    dup = old.unionByName(old.limit(1))
    with pytest.raises(Exception, match="duplicate"):
        snapshot_diff(dup, old).collect()
    # NULL ids would dodge the duplicate guard (each NULL is its own
    # group) and then never equi-join — a null-id doc alive in both
    # snapshots would be labeled added AND removed. Rejected loudly.
    nulled = old.unionByName(
        old.limit(1).withColumn("doc_id", F.lit(None).cast("long"))
    )
    with pytest.raises(Exception, match="NULL"):
        snapshot_diff(nulled, nulled).collect()
    with pytest.raises(ValueError, match="lacks columns"):
        snapshot_diff(old.select("doc_id"), old)
    # the join ships (id, hash) only — document text never crosses
    # the exchange: the join node's output carries no content attr
    plan = str(
        snapshot_diff(old, old)._jdf.queryExecution().optimizedPlan()
    )
    join_line = next(l for l in plan.splitlines() if "Join" in l)
    assert "text#" not in join_line
    assert snapshot_diff(old, old, include_unchanged=True).columns == [
        "doc_id",
        "change",
    ]
