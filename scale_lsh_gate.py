"""Gated lsh-suite sf1 measurement (round 14, VERDICT r13 ask #6).

The round-12 lsh-suite cut recorded 40.0 s low-contention at the
on-disk sf1.0 corpus, and two rounds of campaigns failed to confirm or
revise it because the host's 2-4x noise mode dominated every window
(SCALE.md round-13: position-1 mean 186 s vs position-2 mean 133 s on
identical code). This runner makes the measurement conditional on the
evidence instead of hoping: poll the three bench canaries in a cold
subprocess (bench.py SPARK_GRAFT_CANARY_ONLY) until all sit inside the
pinned band, THEN time the query in a fresh cold process — and read
the canaries again after, so a window that degraded mid-run is marked
rather than trusted. Every attempt (gated out or timed) is appended to
SCALE_LSH_R14.json, one JSON object per line.

A "confirmed" record = pre-canaries in band, post-canaries in band,
and the timed run's rows match the campaign's 102,649 (sf1.0 corpus).
The timed process reports BOTH a cold first run and a warm second run:
the 40 s record was a warm low-contention pair member, the ~105 s
record was true-cold — this keeps the two regimes separate instead of
averaging them.

Diagnostic harness, not part of the driver contract.
Usage: python scale_lsh_gate.py [--attempts 12] [--wait 120]
           [--query q_lsh_suite] [--sf-dir .scale_sf1/sf1.0]
           [--band 0.30,0.62,1.10] [--max-confirms 2]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
#: append-target for attempt records; overridable per campaign so each
#: round's records live in their own file (R14's stay frozen)
OUT = os.environ.get(
    "SPARK_GRAFT_LSH_GATE_OUT",
    os.path.join(REPO, "SCALE_LSH_R15.json"),
)

_TIMED_CODE = """
import json, time
from custom_python_etl_data_connector_shivaask_username_spark import registry
from custom_python_etl_data_connector_shivaask_username_spark.session import get_spark
registry.load_all()
spark = get_spark("lsh-gate")
fn = registry.QUERIES[{query!r}]
out = {{}}
t0 = time.perf_counter()
out["cold_rows"] = len(fn(spark, {sf_dir!r}).collect())
out["cold_sec"] = round(time.perf_counter() - t0, 2)
t0 = time.perf_counter()
out["warm_rows"] = len(fn(spark, {sf_dir!r}).collect())
out["warm_sec"] = round(time.perf_counter() - t0, 2)
print(json.dumps(out))
"""


def _canaries(sf_dir: str) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CANARY_ONLY"] = "1"
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


def _timed(query: str, sf_dir: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", _TIMED_CODE.format(query=query, sf_dir=sf_dir)],
        cwd=REPO,
        capture_output=True,
        text=True,
        check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def _append(rec: dict) -> None:
    rec["t"] = round(time.time(), 1)
    with open(OUT, "a") as fh:
        fh.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), file=sys.stderr)


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
            f"--band needs exactly 3 comma-separated values "
            f"(cpu,io,py), got {len(vals)}: {spec!r}"
        )
    return dict(zip(("cpu", "io", "py"), vals))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--attempts", type=int, default=12)
    ap.add_argument("--wait", type=float, default=120.0)
    ap.add_argument("--query", default="q_lsh_suite")
    ap.add_argument(
        "--sf-dir", default=os.path.join(REPO, ".scale_sf1", "sf1.0")
    )
    ap.add_argument("--band", default="0.30,0.62,1.10")
    ap.add_argument(
        "--max-confirms",
        type=int,
        default=2,
        help="stop after this many fully-confirmed (pre+post in band) "
        "timed records",
    )
    args = ap.parse_args()
    band = _parse_band(args.band)
    confirms = 0
    for attempt in range(1, args.attempts + 1):
        pre = _canaries(args.sf_dir)
        pre_ok = all(pre[k] <= band[k] for k in band)
        if not pre_ok:
            _append(
                {"attempt": attempt, "gate": "closed", "canaries": pre}
            )
            time.sleep(args.wait)
            continue
        timed = _timed(args.query, args.sf_dir)
        post = _canaries(args.sf_dir)
        post_ok = all(post[k] <= band[k] for k in band)
        _append(
            {
                "attempt": attempt,
                "gate": "open",
                "query": args.query,
                "pre": pre,
                "post": post,
                "window_held": post_ok,
                "confirmed": post_ok,
                **timed,
            }
        )
        if post_ok:
            confirms += 1
            if confirms >= args.max_confirms:
                break
        time.sleep(min(args.wait, 30.0))
    print(
        json.dumps(
            {"metric": "lsh_gate_done", "confirmed_records": confirms}
        )
    )


if __name__ == "__main__":
    main()
