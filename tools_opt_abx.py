#!/usr/bin/env python
"""Interleaved cross-tree A/B: alternate fresh-session bursts of the same
query on the BEFORE tree (a git-archive export) and the AFTER tree (this
repo), and report the min-of-burst-medians per variant — the same
"accumulated session state only ever inflates" argument bench.py's
retry_resolved_value documents. Interleaving cancels slow box drift that a
single before-session vs after-session comparison cannot.

Usage:
    python tools_opt_abx.py q1,q2 [--bursts 3] [--runs 3] [--before /tmp/r15_before]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

HERE = Path(__file__).resolve().parent


def burst(tree: Path, names: str, runs: int) -> dict[str, float]:
    out = subprocess.run(
        [sys.executable, str(tree / "tools_opt_ab.py"), names,
         "--tag", "abx", "--runs", str(runs), "--no-plan"],
        cwd=tree, capture_output=True, text=True,
        env={**os.environ, "SPARK_GRAFT_CPUS": os.environ.get("SPARK_GRAFT_CPUS", "32")},
    )
    for line in out.stdout.splitlines():
        if line.startswith('{"tag"'):
            return json.loads(line)["medians"]
    raise RuntimeError(f"burst failed for {names} in {tree}:\n{out.stdout[-2000:]}\n{out.stderr[-3000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names")
    ap.add_argument("--bursts", type=int, default=3)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--before", default="/tmp/r15_before")
    ap.add_argument("--grouped", action="store_true",
                    help="time the WHOLE name list inside each burst session "
                         "(one session per burst per tree, like bench.py's "
                         "multi-query sessions) instead of one session per "
                         "(query, burst) — 10x fewer JVM startups; "
                         "min-of-burst-medians per query is unchanged")
    args = ap.parse_args()
    before = Path(args.before)
    names = [n.strip() for n in args.names.split(",") if n.strip()]
    summary = {}
    if args.grouped:
        b_all, a_all = [], []
        for i in range(args.bursts):
            b_all.append(burst(before, args.names, args.runs))
            a_all.append(burst(HERE, args.names, args.runs))
            print(f"burst {i}: before={b_all[-1]} after={a_all[-1]}", flush=True)
        for name in names:
            b_meds = [m[name] for m in b_all]
            a_meds = [m[name] for m in a_all]
            b, a = min(b_meds), min(a_meds)
            summary[name] = {"before": b, "after": a,
                             "before_meds": b_meds, "after_meds": a_meds,
                             "ratio": round(a / b, 3) if b else None}
            print(f"== {name}: before={b} after={a} ratio={summary[name]['ratio']}", flush=True)
        print(json.dumps(summary))
        return
    for name in names:
        b_meds, a_meds = [], []
        for i in range(args.bursts):
            b_meds.append(burst(before, name, args.runs)[name])
            a_meds.append(burst(HERE, name, args.runs)[name])
            print(f"{name} burst {i}: before={b_meds[-1]} after={a_meds[-1]}", flush=True)
        b, a = min(b_meds), min(a_meds)
        summary[name] = {"before": b, "after": a,
                         "before_meds": b_meds, "after_meds": a_meds,
                         "ratio": round(a / b, 3) if b else None}
        print(f"== {name}: before={b} after={a} ratio={summary[name]['ratio']}", flush=True)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
