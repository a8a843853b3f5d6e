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
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("ref_b", help="git ref of the comparison tree")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--sf-dir", default=None)
    ap.add_argument("--queries", default=None)
    args = ap.parse_args()

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
            for i in range(args.rounds):
                runs_a.append(_run_bench(REPO, args.sf_dir, args.queries))
                runs_b.append(_run_bench(tree_b, args.sf_dir, args.queries))
                print(
                    f"# round {i + 1}: A={runs_a[-1]['value']}s "
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
                "a": a,
                "b": b,
                "ratio_a_over_b": ratio,
                "verdict": verdict,
            }
        )
    )


if __name__ == "__main__":
    main()
