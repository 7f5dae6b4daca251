#!/usr/bin/env python
"""The ONE sanctioned way to refreeze BASELINE_BENCH.json (VERDICT r06
item 4 — the r6 host-drift saga as a mechanical rule).

Rules enforced by build_refreeze() (unit-tested in tests/test_bench_guard.py):

1. CALIBRATION FENCE: the contributing run's box calibration
   (bench.box_calibration_sec(), a pure-Python kernel timed on the box
   that produced the new samples) must be within MAX_CAL_DRIFT (25%) of
   the prior anchor's recorded ``box_cal_sec_at_refreeze``. A refreeze
   from a box running at a different speed would bake host placement into
   the anchor and silently re-zero the regression gate.
2. NEVER ONLY THE ROUND UNDER JUDGMENT: the median for every query must
   draw on at least two sources (history rounds and/or the prior anchor),
   so one round's numbers can never unilaterally move its own gate.
3. PROVENANCE: the output always records ``frozen_from``,
   ``box_cal_sec_at_refreeze`` (the new run's calibration), and the rule
   version, so the next refreeze has a fence to check against.

Usage: python tools_refreeze_baseline.py   (run on an IDLE box, after a
fresh `python bench.py` so BENCH_DETAIL.json carries the run's
box_cal_sec; refuses loudly otherwise.)
"""

from __future__ import annotations

import glob
import json
import statistics
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent

MAX_CAL_DRIFT = 0.25  # |new/old - 1| above this refuses the refreeze


class RefreezeRefused(RuntimeError):
    """Raised when a refreeze attempt violates the anchor-hygiene rules."""


def build_refreeze(
    sources: dict[str, dict[str, float]],
    prior_anchor: dict,
    new_box_cal_sec: float,
) -> dict:
    """Pure refreeze: per-query medians over ``sources`` (name -> per-query
    seconds) PLUS the prior anchor's values, guarded by the calibration
    fence. Raises RefreezeRefused instead of producing a tainted anchor."""
    prior_cal = prior_anchor.get("box_cal_sec_at_refreeze")
    if prior_cal is None:
        raise RefreezeRefused(
            "prior anchor lacks box_cal_sec_at_refreeze — cannot verify the "
            "contributing box's speed; add the calibration before refreezing"
        )
    drift = abs(new_box_cal_sec / prior_cal - 1.0)
    if drift > MAX_CAL_DRIFT:
        raise RefreezeRefused(
            f"contributing run's box_cal_sec {new_box_cal_sec:.4f} deviates "
            f"{drift:.0%} from the anchor's recorded calibration {prior_cal:.4f} "
            f"(max {MAX_CAL_DRIFT:.0%}) — refreeze only from an idle box whose "
            "calibration matches the prior anchor's"
        )
    prior_queries = prior_anchor.get("queries", {})
    pools: dict[str, list[float]] = {}
    for name, queries in sources.items():
        for q, sec in queries.items():
            pools.setdefault(q, []).append(float(sec))
    for q, sec in prior_queries.items():
        pools.setdefault(q, []).append(float(sec))
    # Two distinct thin-pool cases (ADVICE r07): a query whose ONLY value
    # is the prior anchor (it dropped out of every parsable bench source —
    # e.g. a round recorded in the r05+ summary format) is CARRIED FORWARD
    # unchanged — keeping an existing anchor value cannot be influenced by
    # the round under judgment. Only a query that is genuinely new (absent
    # from the prior anchor, exactly one recorded sample) refuses the
    # refreeze, because its anchor would come solely from the round being
    # judged.
    carried = sorted(
        q for q, vals in pools.items()
        if len(vals) < 2 and q in prior_queries
    )
    thin = sorted(
        q for q, vals in pools.items()
        if len(vals) < 2 and q not in prior_queries
    )
    if thin:
        raise RefreezeRefused(
            f"{len(thin)} queries would be anchored from a single sample "
            f"(never refreeze only from the round under judgment): {thin[:5]}..."
        )
    base = {q: round(statistics.median(vals), 4) for q, vals in sorted(pools.items())}
    out = {
        "frozen_from": sorted(sources) + ["prior_anchor"],
        "sf": 0.1,
        "note": (
            "per-query median seconds across recorded rounds + the prior "
            "anchor; standing 2x-gate anchor. Refrozen via "
            "tools_refreeze_baseline.py under the calibration fence "
            f"(max {MAX_CAL_DRIFT:.0%} box_cal drift) — see BASELINE.md "
            "'Refreeze rule'."
        ),
        "queries": base,
        "total": round(sum(base.values()), 4),
        "box_cal_sec_at_refreeze": round(float(new_box_cal_sec), 4),
    }
    if carried:
        out["carried_forward"] = carried
    return out


def main() -> int:
    prior = json.loads((REPO / "BASELINE_BENCH.json").read_text())
    detail_path = REPO / "BENCH_DETAIL.json"
    if not detail_path.exists():
        print("refusing: no BENCH_DETAIL.json — run `python bench.py` first")
        return 2
    detail = json.loads(detail_path.read_text())
    new_cal = detail.get("box_cal_sec")
    if new_cal is None:
        print("refusing: BENCH_DETAIL.json lacks box_cal_sec — re-run bench.py")
        return 2
    sources: dict[str, dict[str, float]] = {}
    for f in sorted(glob.glob(str(REPO / "BENCH_r*.json"))):
        data = json.loads(Path(f).read_text())
        queries = (data.get("parsed") or {}).get("queries") or data.get("queries")
        if queries:
            sources[Path(f).name] = queries
        else:
            # r05+ rounds record only the compact summary line (per-query
            # numbers lived in BENCH_DETAIL.json, rewritten by every run) —
            # say so instead of silently narrowing the median pool
            # (ADVICE r07).
            print(
                f"note: {Path(f).name} skipped as a median source "
                "(summary format, no per-query data)"
            )
    sources["BENCH_DETAIL.json"] = detail["detail_queries"]
    try:
        anchor = build_refreeze(sources, prior, new_cal)
    except RefreezeRefused as e:
        print(f"REFUSED: {e}")
        return 1
    (REPO / "BASELINE_BENCH.json").write_text(json.dumps(anchor, indent=1) + "\n")
    print(
        f"refrozen: {len(anchor['queries'])} queries, total "
        f"{anchor['total']:.1f}s, box_cal {anchor['box_cal_sec_at_refreeze']:.4f}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
