"""Alternating A/B bench attribution (round 10, the round-7 protocol
as a tool).

Whenever the headline total moves >10% round-over-round and the
canaries cannot account for it, the movement must be ATTRIBUTED before
it ships: same-session alternation is the only measurement that gives
both trees the same machine conditions. This script checks a previous
ref out into a temporary git worktree and alternates full bench runs
between the two trees — A B A B ... — then reports per-tree best-of
totals and per-query minima side by side.

Usage:
    python bench_ab.py <ref-B> [--rounds 3] [--sf-dir DIR] [--queries q1,q2]

- ref-B: git ref of the comparison tree (e.g. the previous round's
  close commit). Tree A is the CURRENT working tree, uncommitted
  changes included.
- Each "round" is one full bench.py subprocess per tree, interleaved.
  Totals are per-tree minima across rounds (same best-of discipline as
  bench.py itself); per-query values are minima over all rounds' own
  best-of-5s, so a single co-tenant spike cannot carry a verdict.
- --queries restricts both trees to a subset (comma-separated HEADLINE
  names) for targeted claims (e.g. the planner-vs-hand-written
  q_revenue_by_nation comparison) via $SPARK_GRAFT_ONLY. Both trees'
  bench.py must honor that env (round 10+); against older refs run the
  full suite instead, or the B side silently benches everything.

Prints ONE JSON line:
    {"metric": "ab_compare", "a": {...}, "b": {...}, "ratio": r,
     "verdict": "code" | "noise" | "inconclusive"}

Verdict heuristic (documented, not hidden): "code" when the per-tree
totals differ by >10% AND every round agrees on the direction;
"noise" when the interleaved totals differ by <5%; in between,
"inconclusive" — collect more rounds before shipping a claim.

Round 14 (VERDICT r13 ask #6) — decorrelating the position effect:
the 12-run lsh campaign measured position-1 runs 40% slower than
position-2 on identical code, so a fixed A-then-B order correlates
position with tree. `--order-seed N` randomizes (seeded, recorded)
which tree runs first each round; `--warmup` runs one discarded bench
before the timed rounds; `--gate` polls the three canaries
(bench.py's SPARK_GRAFT_CANARY_ONLY mode) until they sit inside
`--gate-band` before each round — the record carries per-round orders
and gate readings, so a claim's window conditions are inspectable.
"""

from __future__ import annotations

import argparse
import json
import os
import random
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))


def _run_bench(tree: str, sf_dir: str | None, only: str | None) -> dict:
    env = dict(os.environ)
    if sf_dir:
        env["SPARK_GRAFT_SF_DIR"] = sf_dir
    if only:
        env["SPARK_GRAFT_ONLY"] = only
    out = subprocess.run(
        [sys.executable, os.path.join(tree, "bench.py")],
        cwd=tree,
        env=env,
        capture_output=True,
        text=True,
        check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def _canaries(sf_dir: str | None) -> dict:
    """One cold bench.py subprocess in canary-only mode — the three
    fixed kernels, nothing timed beyond them."""
    env = dict(os.environ)
    env["SPARK_GRAFT_CANARY_ONLY"] = "1"
    if sf_dir:
        env["SPARK_GRAFT_SF_DIR"] = sf_dir
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def _parse_band(spec: str) -> dict:
    """Parse a cpu,io,py canary-ceiling band. Exactly three values —
    a truncated flag (round-15 advisor: dict(zip(...)) silently gated
    on two canaries) must fail loudly, not weaken the gate."""
    try:
        vals = [float(x) for x in spec.split(",")]
    except ValueError:
        vals = []
    if len(vals) != 3:
        raise SystemExit(
            f"--gate-band needs exactly 3 comma-separated values "
            f"(cpu,io,py), got {len(vals)}: {spec!r}"
        )
    return dict(zip(("cpu", "io", "py"), vals))


def _wait_for_window(args) -> dict:
    """The low-contention gate (round 14, VERDICT r13 ask #6): poll
    the three canaries until all sit inside the pinned band, up to
    --gate-retries attempts --gate-wait seconds apart. Returns the
    last reading with an `in_band` flag — the campaign proceeds either
    way, but the record carries the evidence, so an out-of-band round
    can never silently masquerade as a clean one."""
    band = _parse_band(args.gate_band)
    c: dict = {}
    for attempt in range(args.gate_retries):
        c = _canaries(args.sf_dir)
        ok = all(c[k] <= band[k] for k in band)
        print(
            f"# gate attempt {attempt + 1}/{args.gate_retries}: "
            f"cpu={c['cpu']} io={c['io']} py={c['py']} in_band={ok}",
            file=sys.stderr,
        )
        if ok:
            return {**c, "in_band": True, "attempts": attempt + 1}
        if attempt + 1 < args.gate_retries:
            time.sleep(args.gate_wait)
    return {**c, "in_band": False, "attempts": args.gate_retries}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("ref_b", help="git ref of the comparison tree")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--sf-dir", default=None)
    ap.add_argument("--queries", default=None)
    ap.add_argument(
        "--order-seed",
        type=int,
        default=None,
        help="seeded per-round randomization of which tree runs first "
        "(round 14: the 12-run lsh campaign showed position-1 means "
        "40%% above position-2 — fixed A-then-B order correlates the "
        "position effect with the tree)",
    )
    ap.add_argument(
        "--warmup",
        action="store_true",
        help="one discarded bench run before the timed rounds, so "
        "round 1's position-1 run does not also pay the coldest cache",
    )
    ap.add_argument(
        "--gate",
        action="store_true",
        help="before each round, poll the three canaries until they "
        "sit inside --gate-band (cold-process readings)",
    )
    ap.add_argument(
        "--gate-band",
        default="0.30,0.62,1.10",
        help="cpu,io,py canary ceilings in seconds — defaults are "
        "~1.3x the clean-window cold-process readings at 32 cpus "
        "(r13 clean window: 0.19/0.47/0.88)",
    )
    ap.add_argument("--gate-retries", type=int, default=5)
    ap.add_argument("--gate-wait", type=float, default=90.0)
    args = ap.parse_args()

    rng = (
        random.Random(args.order_seed)
        if args.order_seed is not None
        else None
    )
    with tempfile.TemporaryDirectory(prefix="bench_ab_") as tmp:
        tree_b = os.path.join(tmp, "b")
        subprocess.run(
            ["git", "worktree", "add", "--detach", tree_b, args.ref_b],
            cwd=REPO,
            check=True,
            capture_output=True,
        )
        try:
            runs_a, runs_b = [], []
            orders: list[str] = []
            gates: list[dict | None] = []
            if args.warmup:
                print("# warmup run (discarded)", file=sys.stderr)
                _run_bench(REPO, args.sf_dir, args.queries)
            for i in range(args.rounds):
                gates.append(
                    _wait_for_window(args) if args.gate else None
                )
                a_first = True if rng is None else rng.random() < 0.5
                orders.append("AB" if a_first else "BA")
                if a_first:
                    runs_a.append(
                        _run_bench(REPO, args.sf_dir, args.queries)
                    )
                    runs_b.append(
                        _run_bench(tree_b, args.sf_dir, args.queries)
                    )
                else:
                    runs_b.append(
                        _run_bench(tree_b, args.sf_dir, args.queries)
                    )
                    runs_a.append(
                        _run_bench(REPO, args.sf_dir, args.queries)
                    )
                print(
                    f"# round {i + 1} ({orders[-1]}): "
                    f"A={runs_a[-1]['value']}s "
                    f"B={runs_b[-1]['value']}s",
                    file=sys.stderr,
                )
        finally:
            subprocess.run(
                ["git", "worktree", "remove", "--force", tree_b],
                cwd=REPO,
                capture_output=True,
            )

    wanted = (
        {q.strip() for q in args.queries.split(",") if q.strip()}
        if args.queries
        else None
    )

    def fold(runs: list[dict]) -> dict:
        queries: dict[str, float] = {}
        for r in runs:
            for q, t in r["queries"].items():
                if wanted is None or q in wanted:
                    queries[q] = min(t, queries.get(q, float("inf")))
        # with --queries, totals are recomputed over the subset so a B
        # tree whose bench.py predates $SPARK_GRAFT_ONLY (and benched
        # everything) still compares apples-to-apples
        totals = [
            sum(t for q, t in r["queries"].items() if wanted is None or q in wanted)
            for r in runs
        ]
        return {
            "total": round(min(totals), 4),
            "totals": [round(t, 4) for t in totals],
            "queries": queries,
        }

    a, b = fold(runs_a), fold(runs_b)
    ratio = round(a["total"] / b["total"], 4) if b["total"] else None
    same_dir = all(
        (ta > tb) == (a["totals"][0] > b["totals"][0])
        for ta, tb in zip(a["totals"], b["totals"])
    )
    if ratio is not None and abs(ratio - 1.0) > 0.10 and same_dir:
        verdict = "code"
    elif ratio is not None and abs(ratio - 1.0) < 0.05:
        verdict = "noise"
    else:
        verdict = "inconclusive"
    print(
        json.dumps(
            {
                "metric": "ab_compare",
                "ref_b": args.ref_b,
                "rounds": args.rounds,
                "orders": orders,
                "order_seed": args.order_seed,
                "warmup": args.warmup,
                "gates": gates,
                "a": a,
                "b": b,
                "ratio_a_over_b": ratio,
                "verdict": verdict,
            }
        )
    )


if __name__ == "__main__":
    main()
