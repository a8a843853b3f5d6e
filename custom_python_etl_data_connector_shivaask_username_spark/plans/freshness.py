"""X38: statistics freshness — WHEN to re-ANALYZE, decided from
metadata only.

Stale statistics mis-plan silently: the sidecar says 1M rows while
the table has grown to 50M, and the planner happily broadcasts the
"small" side. The X31/X33/X35 family gives three ways to COLLECT
stats; this module closes the loop with the policy that decides when
collection must re-run — the ANALYZE-scheduling role Postgres's
autovacuum thresholds and Snowflake's automatic clustering metadata
play, built from signals that never touch table data:

- **file bytes** (always available for file scans): the Hadoop file
  index's current total vs the sidecar's recorded ``size_bytes``.
  Growth/shrink beyond a band means the sidecar no longer describes
  the table. Cost: a file listing — metadata.
- **incremental partials** (when X35 is wired on the ingest path):
  the partials' exact row count vs the sidecar's ``row_count``, and
  per-column min/max drift OUTSIDE the sidecar's recorded range —
  new-key domains (tomorrow's dates, a new tenant id) invalidate
  range-containment join refinement long before row counts move.
  Cost: one union-agg over #batches 1-row partials.

API:

- :func:`stats_staleness` — gather the signals into a report dict
  (each signal None when its source is unavailable).
- :func:`is_stale` — apply thresholds; returns ``(bool, reasons)``.
- :func:`refresh_stats_if_stale` — the self-maintaining entry point:
  read the sidecar, check staleness, re-collect (full or sampled)
  and rewrite only when needed. Plug it in front of
  ``plan_join_tree`` and plans stay statistics-correct without a
  scheduled ANALYZE job.

100 TB shape: the check is a file listing plus (optionally) a
metadata-scale partials agg; the expensive re-collection runs only
when a threshold trips, and can be the X33 sampled path.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

from .stats import (
    _kind_of,
    _axis_value,
    _scan_bytes,
    collect_table_stats,
    collect_table_stats_sampled,
    read_stats_sidecar,
    write_stats_sidecar,
)

#: default staleness thresholds
MAX_BYTES_DRIFT = 0.20   # ±20% on-disk growth/shrink
MAX_ROW_DRIFT = 0.20     # ±20% row-count drift (needs X35 partials)
MAX_RANGE_DRIFT = 0.10   # new min/max outside the old span by >10%


def _rel_drift(old: float | None, new: float | None) -> float | None:
    if not old or new is None:
        return None
    return abs(new - old) / float(old)


def stats_staleness(
    spark: SparkSession,
    df: DataFrame,
    stats: dict[str, Any],
    table_path: str | None = None,
    columns: list[str] | None = None,
) -> dict[str, Any]:
    """Metadata-only staleness signals for ``stats`` vs the table's
    current state. ``bytes_drift`` from the file index;
    ``row_drift`` and ``range_drift`` from the X35 incremental
    partials when ``table_path`` has them (None otherwise — absence
    of a signal is not evidence of freshness).

    ``columns`` restricts range checks to the columns the caller
    actually tracks — a sidecar deliberately collected on a key
    subset would otherwise flag every untracked column as drifted
    forever (re-ANALYZE cannot cure what it was asked not to
    collect). Range drift is also skipped entirely for SAMPLED
    sidecars: X33 documents sample min/max as under-estimates of the
    true range, so the partials' exact extremes sitting outside them
    is expected, not drift — row and bytes signals still apply."""
    report: dict[str, Any] = {
        "bytes_drift": None,
        "row_drift": None,
        "range_drift": {},
        "file_index_current": None,
    }
    cur_bytes = _scan_bytes(df)
    report["bytes_drift"] = _rel_drift(stats.get("size_bytes"), cur_bytes)
    if table_path is not None:
        # round 9: the X40 index is writer-maintained — report whether
        # it matches the listing (None = the table keeps no index).
        # Informational, not an is_stale() trigger: a stale index
        # over-reads but never mis-plans, so it gates re-INDEXING
        # (refresh_file_index), not re-ANALYZE.
        try:
            from ..sources.file_index import file_index_staleness

            fis = file_index_staleness(spark, table_path)
            report["file_index_current"] = (
                None if fis is None else fis["current"]
            )
        except Exception:
            pass
    if table_path is not None:
        try:
            from .incremental_stats import read_incremental_stats

            inc = read_incremental_stats(spark, table_path)
        except Exception:
            inc = None  # no partials dir: signal unavailable
        if inc is not None:
            report["row_drift"] = _rel_drift(
                stats.get("row_count"), inc.get("row_count")
            )
            if stats.get("sampled"):
                return report
            for c, new in inc.get("columns", {}).items():
                if columns is not None and c not in columns:
                    continue
                old = stats.get("columns", {}).get(c)
                if not old:
                    if columns is not None:
                        continue  # untracked by request, not drift
                    report["range_drift"][c] = 1.0  # brand-new column
                    continue
                kind = _kind_of(old.get("type", ""))
                if kind is None:
                    if old.get("type") == "string":
                        # no numeric axis, but a key domain escaping
                        # the recorded [min, max] lexicographic range
                        # is still the documented new-tenant signal
                        omin, omax = old.get("min"), old.get("max")
                        nmin, nmax = new.get("min"), new.get("max")
                        if (
                            all(
                                isinstance(v, str)
                                for v in (omin, omax, nmin, nmax)
                            )
                            and (nmin < omin or nmax > omax)
                        ):
                            report["range_drift"][c] = 1.0
                    continue
                try:
                    olo = _axis_value(old.get("min"), kind)
                    ohi = _axis_value(old.get("max"), kind)
                    nlo = _axis_value(new.get("min"), kind)
                    nhi = _axis_value(new.get("max"), kind)
                except (TypeError, ValueError):
                    continue
                if None in (olo, ohi, nlo, nhi):
                    continue
                span = max(ohi - olo, 1e-12)
                out = max(0.0, olo - nlo) + max(0.0, nhi - ohi)
                if out > 0:
                    report["range_drift"][c] = out / span
    return report


def is_stale(
    report: dict[str, Any],
    max_bytes_drift: float = MAX_BYTES_DRIFT,
    max_row_drift: float = MAX_ROW_DRIFT,
    max_range_drift: float = MAX_RANGE_DRIFT,
) -> tuple[bool, list[str]]:
    """Apply thresholds to a :func:`stats_staleness` report."""
    reasons = []
    b = report.get("bytes_drift")
    if b is not None and b > max_bytes_drift:
        reasons.append(f"bytes_drift {b:.2f} > {max_bytes_drift}")
    r = report.get("row_drift")
    if r is not None and r > max_row_drift:
        reasons.append(f"row_drift {r:.2f} > {max_row_drift}")
    for c, d in sorted(report.get("range_drift", {}).items()):
        if d > max_range_drift:
            reasons.append(f"range_drift[{c}] {d:.2f} > {max_range_drift}")
    return bool(reasons), reasons


def refresh_stats_if_stale(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    sample_fraction: float | None = None,
    columns: list[str] | None = None,
    preserve_enrichments: bool = True,
    **thresholds: float,
) -> tuple[dict[str, Any], bool]:
    """Sidecar-backed, self-maintaining table stats: returns
    ``(stats, refreshed)``. A missing sidecar always collects; a
    present one re-collects only when :func:`is_stale` trips —
    via the X33 sampled path when ``sample_fraction`` is given
    (the 100 TB default), else the full X31 pass. ``columns`` flows
    into BOTH the staleness check and the re-collect, so a
    key-subset sidecar converges instead of re-tripping on columns
    it was asked not to track.

    ``preserve_enrichments`` re-applies the old sidecar's X36
    histograms (same shape per column: equi-width or equi-depth) and
    X37 column groups to the fresh stats — without it a refresh
    silently demotes the planner to pre-histogram quality. Costs the
    enrichments' usual extra passes, only when a refresh actually
    runs."""
    old = read_stats_sidecar(spark, path)
    if old is not None:
        stale, _reasons = is_stale(
            stats_staleness(spark, df, old, table_path=path, columns=columns),
            **thresholds,
        )
        if not stale:
            return old, False
    if sample_fraction is not None:
        stats = collect_table_stats_sampled(
            df, sample_fraction, columns, path=path
        )
    else:
        stats = collect_table_stats(df, columns, path=path)
    if preserve_enrichments and old is not None:
        from .stats import add_equidepth_histograms, add_histograms

        ew = [
            c
            for c, cs in old.get("columns", {}).items()
            if "counts" in (cs.get("histogram") or {})
            and c in stats["columns"]
        ]
        ed = [
            c
            for c, cs in old.get("columns", {}).items()
            if "bounds" in (cs.get("histogram") or {})
            and c in stats["columns"]
        ]
        if ew:
            stats = add_histograms(df, stats, columns=ew)
        if ed:
            stats = add_equidepth_histograms(df, stats, columns=ed)
        groups = [
            g["columns"]
            for g in old.get("column_groups", {}).values()
            if g.get("ndv") is not None
            and all(c in df.columns for c in g.get("columns", []))
        ]
        if groups:
            from .column_groups import collect_column_group_stats

            stats = collect_column_group_stats(df, stats, groups)
        # X60 grids are enrichments too (round 12): a refresh that
        # dropped them would silently demote range-conjunction
        # planning back to independence — re-collect every pair the
        # old sidecar carried a hist2d for (after the group NDVs, so
        # the grid merges into the re-collected entry)
        pairs = [
            [g["hist2d"]["x"]["col"], g["hist2d"]["y"]["col"]]
            for g in old.get("column_groups", {}).values()
            if g.get("hist2d")
            and g["hist2d"]["x"]["col"] in df.columns
            and g["hist2d"]["y"]["col"] in df.columns
        ]
        if pairs:
            from .column_groups import collect_histogram_2d

            stats = collect_histogram_2d(df, stats, pairs)
    write_stats_sidecar(spark, path, stats)
    return stats, True


def analyze_for_workload(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    workload: list[Any],
    sample_fraction: float | None = None,
    min_count: int = 2,
    max_groups: int = 8,
    max_pairs: int = 8,
) -> dict[str, Any]:
    """One-call workload-driven ANALYZE (round 12 capstone): mine the
    workload's plans for what the planner will actually be asked to
    price, collect exactly those statistics in the standard passes,
    and persist the sidecar.

    - every filtered column (equality or range, single-column
      included — `filter_columns`) gets an equi-depth histogram: the
      1-D selectivity model AND the X58 skew-dispatch evidence ride
      the same collection;
    - equality conjunctions repeated ≥ ``min_count`` times become X37
      column groups (`suggest_column_groups` — group NDV retires
      independence on eq-conjunctions);
    - range conjunctions become X60 2-D grids
      (`suggest_histogram_pairs` — joint mass + partner clamps).

    ``workload`` is DataFrames and/or plan strings, the
    `suggest_column_groups` convention; ``sample_fraction`` routes the
    base collection through the X33 sampled path (the 100 TB default —
    the enrichment passes still scan, bounded by their own geometry:
    percentile sketches, one HLL per group, 256 counters per pair).
    Returns the written stats. Pair with `refresh_stats_if_stale`
    (which preserves all three enrichment kinds across refreshes) for
    the maintenance loop.
    """
    from .column_groups import (
        collect_column_group_stats,
        collect_histogram_2d,
        filter_columns,
        suggest_column_groups,
        suggest_histogram_pairs,
    )
    from .stats import add_equidepth_histograms

    plans = [
        item
        if isinstance(item, str)
        else str(item._jdf.queryExecution().optimizedPlan())
        for item in workload
    ]
    if sample_fraction is not None:
        stats = collect_table_stats_sampled(df, sample_fraction, path=path)
    else:
        stats = collect_table_stats(df, path=path)
    fcols = sorted(
        set().union(*(filter_columns(p) for p in plans), set())
        & set(df.columns)
    )
    if fcols:
        stats = add_equidepth_histograms(df, stats, columns=fcols)
    groups = [
        g["columns"]
        for g in suggest_column_groups(plans, min_count, max_groups)
        if all(c in df.columns for c in g["columns"])
    ]
    if groups:
        stats = collect_column_group_stats(df, stats, groups)
    pairs = [
        p["columns"]
        for p in suggest_histogram_pairs(plans, min_count, max_pairs)
        if all(c in df.columns for c in p["columns"])
    ]
    if pairs:
        stats = collect_histogram_2d(df, stats, pairs)
    write_stats_sidecar(spark, path, stats)
    return stats
