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


def burst(tree: Path, name: str, runs: int) -> float:
    out = subprocess.run(
        [sys.executable, str(tree / "tools_opt_ab.py"), name,
         "--tag", "abx", "--runs", str(runs), "--no-plan"],
        cwd=tree, capture_output=True, text=True,
        env={**os.environ, "SPARK_GRAFT_CPUS": os.environ.get("SPARK_GRAFT_CPUS", "32")},
    )
    for line in out.stdout.splitlines():
        if line.startswith('{"tag"'):
            return json.loads(line)["medians"][name]
    raise RuntimeError(f"burst failed for {name} in {tree}:\n{out.stdout[-2000:]}\n{out.stderr[-3000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names")
    ap.add_argument("--bursts", type=int, default=3)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--before", default="/tmp/r15_before")
    args = ap.parse_args()
    before = Path(args.before)
    summary = {}
    for name in [n.strip() for n in args.names.split(",") if n.strip()]:
        b_meds, a_meds = [], []
        for i in range(args.bursts):
            b_meds.append(burst(before, name, args.runs))
            a_meds.append(burst(HERE, name, args.runs))
            print(f"{name} burst {i}: before={b_meds[-1]} after={a_meds[-1]}", flush=True)
        b, a = min(b_meds), min(a_meds)
        summary[name] = {"before": b, "after": a,
                         "before_meds": b_meds, "after_meds": a_meds,
                         "ratio": round(a / b, 3) if b else None}
        print(f"== {name}: before={b} after={a} ratio={summary[name]['ratio']}", flush=True)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
