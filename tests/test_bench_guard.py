"""Mechanical performance-regression gate (VERDICT r02 item 7).

`BASELINE_BENCH.json` freezes the per-query median seconds of the first two
benchmark rounds (local[32], sf0.1). This test diffs the LATEST recorded
`BENCH_r*.json` against the frozen numbers and fails on any per-query
regression > 2x — the driver's "within 2x of BASELINE" gate made executable
against a real anchor instead of the reference's (nonexistent) numbers.

Refreezing after a deliberate perf change: `python tools_refreeze_baseline.py`
— the ONE sanctioned path (VERDICT r06 item 4). It refuses when the
contributing run's box calibration deviates >25% from the anchor's recorded
`box_cal_sec_at_refreeze`, and when any query would be anchored from a
single sample (never only from the round under judgment). The rule is
written in BASELINE.md and unit-tested below.
"""

from __future__ import annotations

import json
import statistics
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
    box_drift = statistics.median(ratios)
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

# ---- refreeze-rule codification (VERDICT r06 item 4) ----------------------
# The r6 drift saga as a mechanical rule: BASELINE_BENCH.json must carry the
# calibration of the box that produced its newest samples, and the only
# sanctioned refreeze path (tools_refreeze_baseline.py) refuses when the new
# run's calibration deviates >25% from it or when any query's anchor would
# come from a single sample.


def test_baseline_records_refreeze_calibration():
    baseline = json.loads((REPO / "BASELINE_BENCH.json").read_text())
    cal = baseline.get("box_cal_sec_at_refreeze")
    assert isinstance(cal, float) and cal > 0, (
        "BASELINE_BENCH.json must record box_cal_sec_at_refreeze — the box "
        "calibration of the run contributing its newest samples; refreeze "
        "via tools_refreeze_baseline.py"
    )


def _guard_fixture():
    sources = {
        "BENCH_rA.json": {"q1": 1.0, "q2": 2.0},
        "BENCH_rB.json": {"q1": 1.2, "q2": 1.8},
    }
    prior = {
        "queries": {"q1": 1.1, "q2": 2.2},
        "box_cal_sec_at_refreeze": 0.10,
    }
    return sources, prior


def test_refreeze_refuses_calibration_drift():
    from tools_refreeze_baseline import MAX_CAL_DRIFT, RefreezeRefused, build_refreeze

    sources, prior = _guard_fixture()
    with pytest.raises(RefreezeRefused, match="deviates"):
        build_refreeze(sources, prior, 0.10 * (1 + MAX_CAL_DRIFT) * 1.05)
    with pytest.raises(RefreezeRefused, match="deviates"):
        build_refreeze(sources, prior, 0.10 * (1 - MAX_CAL_DRIFT) * 0.95)


def test_refreeze_refuses_uncalibrated_prior_anchor():
    from tools_refreeze_baseline import RefreezeRefused, build_refreeze

    sources, prior = _guard_fixture()
    del prior["box_cal_sec_at_refreeze"]
    with pytest.raises(RefreezeRefused, match="box_cal_sec_at_refreeze"):
        build_refreeze(sources, prior, 0.10)


def test_refreeze_refuses_single_sample_queries():
    from tools_refreeze_baseline import RefreezeRefused, build_refreeze

    sources, prior = _guard_fixture()
    sources["BENCH_rB.json"]["q_new_this_round"] = 5.0  # only source for it
    with pytest.raises(RefreezeRefused, match="single sample"):
        build_refreeze(sources, prior, 0.10)


def test_refreeze_medianizes_and_records_provenance():
    from tools_refreeze_baseline import build_refreeze

    sources, prior = _guard_fixture()
    anchor = build_refreeze(sources, prior, 0.11)
    assert anchor["queries"] == {"q1": 1.1, "q2": 2.0}  # medians incl. prior
    assert anchor["box_cal_sec_at_refreeze"] == 0.11
    assert "prior_anchor" in anchor["frozen_from"]
    assert anchor["total"] == round(sum(anchor["queries"].values()), 4)
