"""X61 (round 13): the self-tuning statistics loop.

Round 12 built every piece of a feedback-driven optimizer — workload
miners (X47 groups, X60 grid pairs, `filter_columns`), the one-call
workload ANALYZE (`freshness.analyze_for_workload`), measured-edge
history (X56) — but each had to be invoked by hand with a hand-carried
workload. This module closes the loop at the SESSION level: runners
`observe` the queries they execute (plan strings — driver-side,
bounded), and `autotune` mines the observed log, compares it against
the statistics the session already holds, and collects ONLY the missing
enrichments, updating the same session cache (`tables._STATS_CACHE`)
every planner-routed query plans from. The next planning of the same
workload prices its predicates off real histograms/groups/grids instead
of min/max containment — no hand-declared statistic anywhere.

Division of labor with the siblings:
- `freshness.analyze_for_workload` is the COLD-start batch ANALYZE
  (one table, full collection, explicit workload, persists);
- `tables.harvest_executed` feeds measured JOIN cardinalities (X56);
- `autotune` is the WARM loop: incremental (never re-collects a
  statistic the session already has — a second call with no new
  observations is a no-op with zero Spark jobs), session-cache-first,
  sidecar persistence opt-in (`write=True`, for writable lakes).

Scale shape: the observed log is plan STRINGS (bounded deque, driver
RAM); mining is pure string work; collection passes are the standard
bounded ones (percentile sketches per histogram column, one HLL per
group, 256 counters per grid pair) and run at most once per statistic
per session. At 100 TB the loop is exactly the DBA playbook —
observe → ANALYZE what the workload prices → plans improve —
without the DBA.
"""

from __future__ import annotations

from collections import deque
from typing import Any

from pyspark.sql import DataFrame, SparkSession

#: lake roots the engine treats as READ-ONLY (round 15, VERDICT r14
#: ask #3): writability is a POLICY, not an OS fact — the driver's
#: fixture dirs are chmod-writable but contractually immutable, so the
#: engine cannot probe; deployments extend this set for their own
#: protected stores via :func:`declare_readonly_lake`. Everything else
#: is a managed lake and earns sidecar persistence by default.
READONLY_LAKE_ROOTS: set[str] = {"/root/testdata"}


def declare_readonly_lake(root: str) -> None:
    """Register a lake root the engine must never write sidecars
    under (policy declaration — see READONLY_LAKE_ROOTS)."""
    READONLY_LAKE_ROOTS.add(root.rstrip("/"))


def lake_writable(sf_dir: str) -> bool:
    """True when ``sf_dir`` is not under any declared read-only root —
    the default gate for autotune's sidecar persistence."""
    import os

    cands = {sf_dir.rstrip("/"), os.path.abspath(sf_dir)}
    for root in READONLY_LAKE_ROOTS:
        r = root.rstrip("/")
        for p in cands:
            if p == r or p.startswith(r + "/"):
                return False
    return True


#: per-sf_dir bounded log of observed optimized-plan strings
_PLAN_LOG: dict[str, deque] = {}

#: per-sf_dir record of statistics autotune already collected, so a
#: re-run with the same observations stays a zero-scan no-op even if
#: a caller evicted the stats cache in between
_COLLECTED: dict[str, set] = {}

PLAN_LOG_LIMIT = 200


def observe(df: DataFrame, sf_dir: str) -> None:
    """Record one executed (or about-to-execute) query's optimized plan
    into the session's workload log for ``sf_dir``. Driver-side py4j
    plan stringification (~tens of ms) — call OFF the timed path (the
    bench calls it from the warm run, next to `harvest_executed`)."""
    log = _PLAN_LOG.setdefault(sf_dir, deque(maxlen=PLAN_LOG_LIMIT))
    log.append(str(df._jdf.queryExecution().optimizedPlan()))


def observed_count(sf_dir: str) -> int:
    return len(_PLAN_LOG.get(sf_dir, ()))


def _dir_signature(spark: SparkSession, sf_dir: str) -> dict[str, float]:
    """Metadata-only per-table scan-bytes signature of ``sf_dir`` —
    the staleness gate for a persisted observation log. Never a scan:
    `_scan_bytes` reads the relation's file-index size."""
    from .. import tables
    from .freshness import _scan_bytes

    sig: dict[str, float] = {}
    for t in tables.TABLES:
        try:
            sig[t] = float(_scan_bytes(tables.load_table(spark, sf_dir, t)))
        except Exception:
            continue  # partial dirs: a lake holds what it holds
    return sig


def save_observation_log(
    spark: SparkSession, sf_dir: str, path: str
) -> int:
    """Persist the session's observed workload (round 14, VERDICT r13
    ask #7 — the X56-sidecar pattern applied to X61): the bounded plan
    log plus a per-table scan-bytes signature land as one JSON text at
    ``path``. Opt-in and writable-lake-only by design — fixture dirs
    keep the in-memory deque. Returns the number of plans written."""
    import json

    from ..sources.layout import fs_write_text

    plans = list(_PLAN_LOG.get(sf_dir, ()))[-PLAN_LOG_LIMIT:]
    fs_write_text(
        spark,
        path,
        json.dumps(
            {"signature": _dir_signature(spark, sf_dir), "plans": plans}
        ),
    )
    return len(plans)


def load_observation_log(
    spark: SparkSession, sf_dir: str, path: str
) -> int:
    """Restore a persisted observation log into the session (the
    restart half of the X61 loop): plans append to the in-memory
    deque, GATED on the recorded per-table signature sitting inside
    the X38 byte-drift threshold — observations mined from a lake that
    has since grown/shrunk >20% describe a different workload-data
    pairing and are dropped (returns 0) rather than trusted. A fresh
    session that loads the log and calls :func:`autotune` against
    sidecar-persisted statistics (``autotune(write=True)`` in the
    prior session) re-collects NOTHING: the mined needs are already
    satisfied by the served sidecars — the restart pin in
    tests/test_autotune.py. Returns the number of plans restored."""
    import json

    from ..sources.layout import fs_read_text
    from .freshness import MAX_BYTES_DRIFT, _rel_drift

    raw = fs_read_text(spark, path)
    if not raw:
        return 0
    try:
        payload = json.loads(raw)
        plans = payload.get("plans") or []
        sig = payload.get("signature") or {}
    except Exception:
        return 0
    cur = _dir_signature(spark, sf_dir)
    for t, old_bytes in sig.items():
        if t not in cur:
            # round-15 advisor: a signature table that DISAPPEARED is
            # maximal shrink, not "no evidence" — the documented
            # grown/shrunk-past-threshold refusal applies.
            return 0
        if not old_bytes:
            # _rel_drift returns None on old==0 (no denominator); a
            # table that was empty and now holds bytes is unbounded
            # growth — refuse rather than pass the gate by accident.
            if cur[t]:
                return 0
            continue
        drift = _rel_drift(old_bytes, cur[t])
        if drift is not None and drift > MAX_BYTES_DRIFT:
            return 0
    log = _PLAN_LOG.setdefault(sf_dir, deque(maxlen=PLAN_LOG_LIMIT))
    log.extend(str(p) for p in plans)
    return len(plans)


def reset(sf_dir: str | None = None) -> None:
    """Drop observations (and the collected-marker set) — test/tool
    hook, mirrors `tables.invalidate_table_cache`."""
    if sf_dir is None:
        _PLAN_LOG.clear()
        _COLLECTED.clear()
    else:
        _PLAN_LOG.pop(sf_dir, None)
        _COLLECTED.pop(sf_dir, None)


def autotune(
    spark: SparkSession,
    sf_dir: str,
    min_count: int = 2,
    max_groups: int = 8,
    max_pairs: int = 8,
    write: bool | str = "auto",
) -> dict[str, Any]:
    """Mine the session's observed workload and collect exactly the
    statistics it prices that the session does not yet hold.

    For each fixture table: equi-depth histograms on newly-mined
    filter columns (1-D selectivity + X58 skew evidence), X37 group
    NDVs on newly-mined equality conjunctions, X60 2-D grids on
    newly-mined range-conjunction pairs. Everything lands in the
    session stats cache (`tables.table_stats_cached`'s memo), so the
    next planner-routed construction plans from it with no further
    scans. Persistence (round 15, VERDICT r14 ask #3 — DEFAULT-on for
    managed lakes): ``write="auto"`` persists each updated sidecar
    (histograms, groups, grids AND the MG hot-key evidence — the whole
    stats dict) next to its table whenever :func:`lake_writable` says
    the dir is not under a declared read-only root, so a restarted
    session re-learns nothing it already paid to measure; ``True`` /
    ``False`` force either behavior.

    Returns ``{table: {"histograms": [...], "groups": [...],
    "pairs": [...]}}`` for what was ADDED this call (empty dict when
    the session is already tuned — the incremental no-op the pin
    asserts runs zero Spark jobs)."""
    from .. import tables
    from .column_groups import (
        collect_column_group_stats,
        collect_histogram_2d,
        filter_columns_by_relation,
        join_key_columns_by_relation,
        suggest_column_groups,
        suggest_histogram_pairs,
    )
    from .stats import (
        add_equidepth_histograms,
        add_hot_key_evidence,
        write_stats_sidecar,
    )

    do_write = write if isinstance(write, bool) else lake_writable(sf_dir)
    plans = list(_PLAN_LOG.get(sf_dir, ()))
    if not plans:
        return {}
    # mined filter columns carry their RELATION (round-13 advisor): a
    # name shared by several tables must only charge the table the
    # workload actually filtered. Columns no Relation claims fall back
    # to the old every-table behavior (keep evidence over precision).
    rel_fcols: list[tuple[frozenset, set]] = []
    fcols: set[str] = set()
    # round 14: equi-join KEY columns mined separately — they earn
    # heavy-hitter hot-value evidence (the skew dispatch's input),
    # which filters never surface
    rel_jcols: list[tuple[frozenset, set]] = []
    jcols: set[str] = set()
    for p in plans:
        attributed, leftover = filter_columns_by_relation(p)
        rel_fcols += attributed
        fcols |= leftover
        jattr, jleft = join_key_columns_by_relation(p)
        rel_jcols += jattr
        jcols |= jleft
    groups = [
        g["columns"]
        for g in suggest_column_groups(plans, min_count, max_groups)
    ]
    pairs = [
        p["columns"]
        for p in suggest_histogram_pairs(plans, min_count, max_pairs)
    ]
    done = _COLLECTED.setdefault(sf_dir, set())
    report: dict[str, Any] = {}
    for t in tables.TABLES:
        try:
            df = tables.load_table(spark, sf_dir, t)
        except Exception:
            continue  # partial dirs (a lake holds what it holds)
        cols = set(df.columns)
        # this table's attributed filter columns: relations whose
        # attribute-name set matches this schema (⊆ tolerates plan
        # string truncation), plus the unattributed leftovers
        t_fcols = fcols & cols
        for rnames, rcols in rel_fcols:
            if rnames <= cols:
                t_fcols |= rcols & cols
        t_jcols = jcols & cols
        for rnames, rcols in rel_jcols:
            if rnames <= cols:
                t_jcols |= rcols & cols
        # cheap pre-gate on the schema alone: a table the mined
        # workload never filters/joins/conjoins must not even pay the
        # base table_stats_cached collection here
        if not (
            t_fcols
            or t_jcols
            or any(set(g) <= cols for g in groups)
            or any(set(p) <= cols for p in pairs)
        ):
            continue
        st = tables.table_stats_cached(spark, sf_dir, t)
        need_hist = sorted(
            c
            for c in t_fcols
            if ("hist", t, c) not in done
            and not (st.get("columns", {}).get(c) or {}).get("histogram")
        )
        need_groups = [
            g
            for g in groups
            if set(g) <= cols
            and ("group", t, tuple(sorted(g))) not in done
            and "|".join(sorted(g)) not in (st.get("column_groups") or {})
        ]
        need_pairs = [
            p
            for p in pairs
            if set(p) <= cols
            and ("pair", t, tuple(sorted(p))) not in done
            and not any(
                g.get("hist2d")
                and {g["hist2d"]["x"]["col"], g["hist2d"]["y"]["col"]}
                == set(p)
                for g in (st.get("column_groups") or {}).values()
            )
        ]
        need_hot = sorted(
            c
            for c in t_jcols
            if ("hot", t, c) not in done
            and (st.get("columns", {}).get(c) or {}).get("hot_rows")
            is None
        )
        if not (need_hist or need_groups or need_pairs or need_hot):
            continue
        if need_hist:
            st = add_equidepth_histograms(df, st, columns=need_hist)
            done.update(("hist", t, c) for c in need_hist)
        if need_groups:
            st = collect_column_group_stats(df, st, need_groups)
            done.update(
                ("group", t, tuple(sorted(g))) for g in need_groups
            )
        if need_pairs:
            st = collect_histogram_2d(df, st, need_pairs)
            done.update(("pair", t, tuple(sorted(p))) for p in need_pairs)
        if need_hot:
            st = add_hot_key_evidence(df, st, need_hot)
            done.update(("hot", t, c) for c in need_hot)
        tables._STATS_CACHE[(sf_dir, t)] = st
        if do_write:
            write_stats_sidecar(spark, f"{sf_dir}/{t}.parquet", st)
        report[t] = {
            "histograms": need_hist,
            "groups": ["|".join(sorted(g)) for g in need_groups],
            "pairs": ["|".join(sorted(p)) for p in need_pairs],
            "hot_keys": need_hot,
        }
    return report
