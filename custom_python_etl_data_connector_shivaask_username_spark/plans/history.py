"""X56 (round 12): runtime-cardinality feedback into the planner.

The X41 probe and the executed plan both MEASURE join cardinalities,
but until this module nothing remembered them: a repeatedly
mis-estimated edge was re-probed (one sampling scan per planning) or
re-mis-planned every single time. Here every measurement lands in a
small JSON history keyed by the edge — ``(left_table, left_cols,
right_table, right_cols, filter_digest)`` — together with a SIGNATURE
of both base tables at record time (row_count + size_bytes). At the
next planning, `plan_star_join(history=...)` consults the history
BEFORE models or probes: a fresh entry becomes that edge's measured
``edge_rows`` (the X41 rung, which already outranks every model) and
the probe never fires again for it.

Freshness is the X38 doctrine applied to measurements: an entry is
served only while the CURRENT table statistics sit within the same
drift thresholds re-ANALYZE uses (`plans.freshness.MAX_ROW_DRIFT` /
`MAX_BYTES_DRIFT` against the recorded signature). A table that grew
or shrank past the threshold invalidates every measurement it
participated in — the join may have genuinely changed — and the next
planning falls back to models (and, on disagreement, one probe, which
re-records). Nothing is ever served across a signature it cannot
verify: an entry recorded without stats matches nothing.

Scale shape: the history is edges × O(100 B) of JSON — metadata, read
once per planning through the same Hadoop-FS text helpers every other
sidecar uses (file://, hdfs://, s3a://). Capture is driver-side from
numbers that already exist (the probe's return value; the executed
plan's ``numOutputRows`` metric the AQE UI shows), never a new scan.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from .freshness import MAX_BYTES_DRIFT, MAX_ROW_DRIFT, _rel_drift
from .stats import _cols


def edge_history_key(
    ltable: str, lcol, rtable: str, rcol, filter_digest: str = ""
) -> str:
    """Canonical history key for one join edge. Symmetric: the same
    physical edge written (A, a, B, b) or (B, b, A, a) lands on one
    entry. ``filter_digest`` distinguishes the same edge planned under
    different declared filters (a filtered orders joins fewer rows)."""
    a = (ltable, ",".join(_cols(lcol)))
    b = (rtable, ",".join(_cols(rcol)))
    lo, hi = (a, b) if a <= b else (b, a)
    return f"{lo[0]}[{lo[1]}]~{hi[0]}[{hi[1]}]|{filter_digest}"


def filters_digest(filters: dict | None) -> str:
    """Stable digest of a plan_star_join ``filters`` declaration, so a
    measurement taken under one predicate set is never served to a
    different one."""
    if not filters:
        return ""
    import hashlib

    return hashlib.sha256(
        json.dumps(
            {k: repr(v) for k, v in sorted(filters.items())}
        ).encode()
    ).hexdigest()[:16]


def _signature(stats: dict[str, Any] | None) -> dict[str, Any]:
    st = stats or {}
    return {
        "row_count": st.get("row_count"),
        "size_bytes": st.get("size_bytes"),
    }


def _signature_fresh(sig: dict[str, Any], stats: dict[str, Any]) -> bool:
    """X38-style drift check of a recorded signature against the
    CURRENT stats. A signature with no row_count matches nothing —
    absence of evidence is not freshness."""
    if sig.get("row_count") is None:
        return False
    rd = _rel_drift(sig.get("row_count"), stats.get("row_count"))
    if rd is None or rd > MAX_ROW_DRIFT:
        return False
    bd = _rel_drift(sig.get("size_bytes"), stats.get("size_bytes"))
    if bd is not None and bd > MAX_BYTES_DRIFT:
        return False
    return True


def load_history(spark: SparkSession, path: str) -> dict[str, Any]:
    """The history sidecar as a dict; empty on first run."""
    from ..sources.layout import fs_read_text

    raw = fs_read_text(spark, path)
    return json.loads(raw) if raw else {}


def save_history(
    spark: SparkSession, path: str, history: dict[str, Any]
) -> None:
    from ..sources.layout import fs_write_text

    fs_write_text(spark, path, json.dumps(history, sort_keys=True))


def record_edge_rows(
    history: dict[str, Any],
    key: str,
    rows: float,
    left_stats: dict[str, Any] | None,
    right_stats: dict[str, Any] | None,
    source: str,
) -> None:
    """Record one measured cardinality. ``source`` names where the
    number came from ("probe" or "executed") for plan audits; the
    signatures gate future serving."""
    history[key] = {
        "rows": float(rows),
        "source": source,
        "left_sig": _signature(left_stats),
        "right_sig": _signature(right_stats),
    }


def fresh_edge_rows(
    history: dict[str, Any],
    key: str,
    left_stats: dict[str, Any],
    right_stats: dict[str, Any],
) -> float | None:
    """The remembered cardinality for ``key`` — or None when absent or
    stale (either side's current stats drifted past the X38
    thresholds vs the recorded signature)."""
    ent = history.get(key)
    if not ent:
        return None
    sigs = (ent.get("left_sig", {}), ent.get("right_sig", {}))
    cur = (left_stats, right_stats)
    # the key is symmetric, so try both pairings of sig-to-side
    if all(_signature_fresh(s, c) for s, c in zip(sigs, cur)) or all(
        _signature_fresh(s, c) for s, c in zip(sigs, cur[::-1])
    ):
        return float(ent["rows"])
    return None


def subtree_history_key(
    lead: str, comp_edges: list, filter_digest: str = ""
) -> str:
    """Canonical history key for a bushy-rung SUBTREE (round 14 —
    X56×X53): the lead table plus its halo component's edges, order-
    free (each edge rendered through the symmetric
    :func:`edge_history_key`, then sorted). The filter digest
    distinguishes the same chain planned under different declared
    predicates, exactly as base edges do."""
    parts = sorted(edge_history_key(*e) for e in comp_edges)
    return f"subtree:{lead}|{';'.join(parts)}|{filter_digest}"


def record_subtree_rows(
    history: dict[str, Any],
    key: str,
    rows: float,
    member_stats: dict[str, dict | None],
    source: str = "subtree_probe",
) -> None:
    """Remember one measured subtree cardinality with EVERY member
    table's signature — the probe rides a Bernoulli sample of the
    lead, so the measurement describes this exact member set at these
    sizes and nothing else. ``source`` distinguishes probe-sampled
    subtree estimates from executed virtual-cross-edge outputs (round
    15); the format and freshness gating are shared."""
    history[key] = {
        "rows": float(rows),
        "source": source,
        "sigs": {m: _signature(s) for m, s in member_stats.items()},
    }


def fresh_subtree_rows(
    history: dict[str, Any],
    key: str,
    member_stats: dict[str, dict],
) -> float | None:
    """The remembered subtree cardinality — or None when absent, when
    the member set changed, or when ANY member's current stats drifted
    past the X38 thresholds vs its recorded signature."""
    ent = history.get(key)
    if not ent:
        return None
    sigs = ent.get("sigs") or {}
    if set(sigs) != set(member_stats):
        return None
    if all(
        _signature_fresh(sigs[m], member_stats[m] or {}) for m in sigs
    ):
        return float(ent["rows"])
    return None


def cross_history_key(
    lead_a: str,
    edges_a: list,
    lead_b: str,
    edges_b: list,
    lcol,
    rcol,
    filter_digest: str = "",
) -> str:
    """Canonical history key for one of the bushy combine's VIRTUAL
    cross edges (round 15, VERDICT r14 ask #2): keyed by COMPONENT
    CONTENT — each side's subtree signature (lead + halo edges, the
    same rendering X53 probe entries use) plus the cross columns —
    so a measured combine-fold cardinality is served only to the
    exact same subtree pairing under the same declared filters, and
    never mistaken for a base-pair measurement (which the combine
    would re-scale by surviving fractions: the round-14 latent
    double-shrink). Symmetric in the two sides."""
    a = subtree_history_key(lead_a, edges_a, "")
    b = subtree_history_key(lead_b, edges_b, "")
    cols = "~".join(
        sorted([",".join(_cols(lcol)), ",".join(_cols(rcol))])
    )
    lo, hi = (a, b) if a <= b else (b, a)
    return f"cross:{lo}+{hi}|{cols}|{filter_digest}"


def executed_join_rows(df: DataFrame) -> list[dict[str, Any]]:
    """Actual per-join output cardinalities from an EXECUTED frame's
    final physical plan — the numbers the AQE UI shows, read from the
    ``numOutputRows`` SQL metric of every join node. Returns one dict
    per join, innermost first: ``{"node": nodeName, "rows": value}``.
    Call only after an action ON THIS FRAME — ``df.collect()`` or a
    write, which execute this Dataset's own queryExecution.
    ``df.count()`` builds a DIFFERENT plan (the count aggregate) and
    leaves this one's metrics at 0.

    For a plan_star_join result the planner's returned ``order`` maps
    onto this list directly on the left-deep rungs (fold i produces
    join i counted innermost-first); callers feed the pairs to
    :func:`record_edge_rows` with source="executed". Bushy plans
    interleave subtree folds, so the mapping is the caller's to make
    there (the probe path records those edges instead)."""
    node = df._jdf.queryExecution().executedPlan()
    out: list[dict[str, Any]] = []

    def walk(n) -> None:
        name = n.nodeName()
        # AQE wrapper and query-stage nodes: descend into the real plan
        if name.startswith("AdaptiveSparkPlan"):
            walk(n.executedPlan())
            return
        if "QueryStage" in name:
            walk(n.plan())
            return
        cs = n.children()
        for i in range(cs.size()):
            walk(cs.apply(i))
        if "Join" in name:
            m = n.metrics()
            if m.contains("numOutputRows"):
                out.append(
                    {
                        "node": name,
                        "rows": float(
                            m.apply("numOutputRows").value()
                        ),
                    }
                )

    walk(node)
    return out


def executed_equi_joins(df: DataFrame) -> list[dict[str, Any]]:
    """Round 13 (the auto-harvest half of X56): executed equi-join
    nodes of ``df``'s final physical plan with their ``numOutputRows``
    AND their join-key column names — ``{"node", "rows", "keys"}``
    with ``keys`` a frozenset of both sides' attribute names and
    ``join_type`` the node's joinType string ("Inner", "LeftOuter",
    ...). The key names are what lets a harvester map a measured join
    back to the planner fold that produced it WITHOUT positional
    assumptions: in a prefixed star schema
    (``l_orderkey``/``o_orderkey``...) each planner edge's key-column
    set is unique. The join type is load-bearing for the harvester
    (round 14): pending folds are INNER-only, but a DIFFERENT query's
    outer/semi/anti join over the same key columns (the left
    customer⋈orders in q_customer_order_counts vs the revenue star's
    inner fold) produces the same colset with a how-dependent
    cardinality — recording it would poison the history, so
    `harvest_executed` records Inner nodes only. Non-equi joins
    (BroadcastNestedLoop — the guarded J6/J8 range shapes) carry no
    leftKeys/rightKeys and are skipped. Same calling contract as
    :func:`executed_join_rows`: only meaningful after an action on
    THIS frame."""
    node = df._jdf.queryExecution().executedPlan()
    out: list[dict[str, Any]] = []

    def key_names(seq) -> list[str]:
        names = []
        it = seq.iterator()
        while it.hasNext():
            e = it.next()
            try:
                # AttributeReference and most key expressions expose
                # the references set; take every attribute name so a
                # cast-wrapped key still maps
                refs = e.references().iterator()
                while refs.hasNext():
                    names.append(refs.next().name())
            except Exception:
                pass
        return names

    def walk(n) -> None:
        name = n.nodeName()
        if name.startswith("AdaptiveSparkPlan"):
            walk(n.executedPlan())
            return
        if "QueryStage" in name:
            walk(n.plan())
            return
        cs = n.children()
        for i in range(cs.size()):
            walk(cs.apply(i))
        if "Join" in name:
            try:
                keys = frozenset(
                    key_names(n.leftKeys()) + key_names(n.rightKeys())
                )
            except Exception:
                return  # non-equi join node: nothing to map
            if not keys:
                return
            try:
                jt = str(n.joinType().toString())
            except Exception:
                jt = ""
            m = n.metrics()
            if m.contains("numOutputRows"):
                out.append(
                    {
                        "node": name,
                        "rows": float(m.apply("numOutputRows").value()),
                        "keys": keys,
                        "join_type": jt,
                    }
                )

    walk(node)
    return out
