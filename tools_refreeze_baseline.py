#!/usr/bin/env python
"""The ONE sanctioned way to refreeze BASELINE_BENCH.json (VERDICT r06
item 4 — the r6 host-drift saga as a mechanical rule).

Rules enforced by build_refreeze() (unit-tested in tests/test_bench_guard.py):

1. CALIBRATION FENCE: the contributing run's box calibration
   (bench.box_calibration_sec(), a pure-Python kernel timed on the box
   that produced the new samples) must be within MAX_CAL_DRIFT (25%) of
   the prior anchor's recorded ``box_cal_sec_at_refreeze``. A refreeze
   from a box running at a different speed would bake host placement into
   the anchor and silently re-zero the regression gate. Since r14 the
   fence is DUAL-SIGNAL: once the anchor records
   ``jvm_cal_sec_at_refreeze`` (bench.jvm_calibration_sec(), a fixed
   10M-row Spark agg+shuffle), later refreezes must present a jvm_cal_sec
   within the same drift bound — r13 measured the two signals decoupling
   18% in opposite directions on this VM family, so a kernel-passable
   run can still carry a slow/fast JVM's walls into the anchor.
2. NEVER ONLY THE ROUND UNDER JUDGMENT: the median for every query must
   draw on at least two sources (history rounds and/or the prior anchor),
   so one round's numbers can never unilaterally move its own gate.
3. PROVENANCE: the output always records ``frozen_from``,
   ``box_cal_sec_at_refreeze`` (the new run's calibration), and the rule
   version, so the next refreeze has a fence to check against.

Source-selection rules applied by main() (r13, VERDICT r12 item 1):

4. TAIL RECOVERY: r05+ driver rounds record only the compact summary line
   in ``parsed``, but the raw stdout ``tail`` still carries most of the
   per-query detail JSON (front-truncated at ~2000 chars). Those values
   are recovered by matching ``"<known-query-name>": <float>`` pairs —
   restricted to the known query universe (prior anchor + current detail),
   which is collision-safe because the only name:float pairs bench.py
   prints are detail_queries entries (retry_medians values are lists).
   Recovery counts are printed per round, never silent.
5. RECENT-WINDOW MEDIANS: the median pool uses the newest
   RECENT_SOURCE_ROUNDS driver rounds (plus the contributing detail run
   and the prior anchor). The anchor is a regression gate for the engine
   AS IT IS — keeping a long-retired slower implementation's timings in
   the pool would hold the gate open for a regression back to it (the
   r10–r12 state: suite at 0.82–0.85x of an anchor whose medians were
   dominated by r01–r04 values). Rule 2 still holds: every query draws on
   >= 2 sources or is carried forward from the prior anchor unchanged.
   A round that IS the detail run (same box_cal_sec, same values on every
   shared query) is deduped so one run never votes twice.

The CONTRIBUTING RUN is whatever produced BENCH_DETAIL.json. Usually that
is a fresh local ``python bench.py`` on an idle box; when the local box
fails the fence (builder sessions on this VM family measure ~0.08s vs the
anchor's ~0.12s), the driver's own end-of-round session — recorded
verbatim in BENCH_r{N}.json and BENCH_DETAIL.json — is an equally valid
contributor IF its calibration passes the same fence. Never force the
fence; a refusal means no fence-passable run exists yet.
"""

from __future__ import annotations

import glob
import json
import re
import statistics
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent

MAX_CAL_DRIFT = 0.25  # |new/old - 1| above this refuses the refreeze
RECENT_SOURCE_ROUNDS = 4  # newest driver rounds feeding the median pool


class RefreezeRefused(RuntimeError):
    """Raised when a refreeze attempt violates the anchor-hygiene rules."""


def round_num(fname: str) -> int:
    """Numeric round from a BENCH_r{N}.json-style name (ADVICE r13:
    lexicographic sort puts r100 before r99); unparsable names sort
    oldest. Shared with tests/test_bench_guard.py's latest-bench pick."""
    m = re.search(r"r(\d+)", fname)
    return int(m.group(1)) if m else -1


def recover_round_queries(
    tail: str, known: set[str]
) -> tuple[dict[str, float], float | None]:
    """Recover per-query seconds and the run's box_cal_sec from a driver
    round's captured stdout tail (rule 4 above).

    The tail is the LAST ~2000 chars of bench.py stdout: a front-truncated
    detail line (``{"detail_queries": {...}, "sf": .., "box_cal_sec": ..}``)
    followed by the compact summary line. Only ``"name": <float>`` pairs
    whose name is in ``known`` are taken (first occurrence wins — the
    detail line precedes the summary, and retry_medians values are JSON
    lists so they can never match). A pair whose name was cut off by the
    truncation is skipped naturally.
    """
    out: dict[str, float] = {}
    for m in re.finditer(r'"([a-z0-9_]+)"\s*:\s*([0-9]+(?:\.[0-9]+)?)\b', tail):
        name = m.group(1)
        if name in known and name not in out:
            out[name] = float(m.group(2))
    cals = re.findall(r'"box_cal_sec"\s*:\s*([0-9.]+)', tail)
    cal = float(cals[0]) if cals else None
    return out, cal


def is_same_run(
    round_queries: dict[str, float],
    round_cal: float | None,
    detail_queries: dict[str, float],
    detail_cal: float | None,
) -> bool:
    """True when a recovered round and the detail file describe the SAME
    bench run (identical calibration and identical values on every shared
    query) — dedupe so one run never contributes two median votes."""
    if round_cal is None or detail_cal is None or round_cal != detail_cal:
        return False
    shared = set(round_queries) & set(detail_queries)
    if not shared:
        return False
    return all(round_queries[q] == detail_queries[q] for q in shared)


def build_refreeze(
    sources: dict[str, dict[str, float]],
    prior_anchor: dict,
    new_box_cal_sec: float,
    new_jvm_cal_sec: float | None = None,
    new_jvm_cal_sec_retry: float | None = None,
) -> dict:
    """Pure refreeze: per-query medians over ``sources`` (name -> per-query
    seconds) PLUS the prior anchor's values, guarded by the calibration
    fence — BOTH signals when the anchor records both (rule 1, VERDICT r13
    item 1: the pure-Python kernel and the JVM decouple on this VM family,
    so a kernel-passable run can still carry a slow/fast JVM's walls).
    Raises RefreezeRefused instead of producing a tainted anchor."""
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
    prior_jvm = prior_anchor.get("jvm_cal_sec_at_refreeze")
    if prior_jvm is not None:
        # Once the anchor carries the JVM signal, every later refreeze must
        # present it and pass the same drift bound — a run without it could
        # be exactly the kernel-fast/JVM-slow session the fence exists for.
        if new_jvm_cal_sec is None:
            raise RefreezeRefused(
                "prior anchor records jvm_cal_sec_at_refreeze but the "
                "contributing run lacks jvm_cal_sec — re-run bench.py "
                "(which records both calibration signals)"
            )
        jvm_drift = abs(new_jvm_cal_sec / prior_jvm - 1.0)
        if jvm_drift > MAX_CAL_DRIFT:
            raise RefreezeRefused(
                f"contributing run's jvm_cal_sec {new_jvm_cal_sec:.4f} deviates "
                f"{jvm_drift:.0%} from the anchor's recorded JVM calibration "
                f"{prior_jvm:.4f} (max {MAX_CAL_DRIFT:.0%}) — the Python kernel "
                "passed but the JVM did not; both must match the anchor's box"
            )
        # ADVICE r14: when a fresh-context retry session contributed
        # recorded medians, its own jvm_cal_sec (bench.py records it as
        # jvm_cal_sec_retry) is held to the SAME bound — the fence must
        # vouch for every session whose timings reach the anchor.
        if new_jvm_cal_sec_retry is not None:
            retry_drift = abs(new_jvm_cal_sec_retry / prior_jvm - 1.0)
            if retry_drift > MAX_CAL_DRIFT:
                raise RefreezeRefused(
                    f"retry session's jvm_cal_sec {new_jvm_cal_sec_retry:.4f} "
                    f"deviates {retry_drift:.0%} from the anchor's recorded JVM "
                    f"calibration {prior_jvm:.4f} (max {MAX_CAL_DRIFT:.0%}) — "
                    "the retry session contributed recorded medians and must "
                    "match the anchor's box too"
                )
    elif new_jvm_cal_sec_retry is not None:
        # ESTABLISHING refreeze (prior anchor has no JVM signal) with a
        # retry session in the mix (r15 second review): there is no
        # anchor JVM to bound against, but the run's own two sessions
        # must agree — otherwise retry-contributed medians enter the
        # anchor from a JVM that jvm_cal_sec_at_refreeze (recorded from
        # the INITIAL session) never vouched for.
        if new_jvm_cal_sec is None:
            raise RefreezeRefused(
                "run records jvm_cal_sec_retry but no jvm_cal_sec — cannot "
                "vouch for the retry session's JVM; re-run bench.py"
            )
        retry_drift = abs(new_jvm_cal_sec_retry / new_jvm_cal_sec - 1.0)
        if retry_drift > MAX_CAL_DRIFT:
            raise RefreezeRefused(
                f"establishing refreeze: retry session's jvm_cal_sec "
                f"{new_jvm_cal_sec_retry:.4f} deviates {retry_drift:.0%} from "
                f"the same run's initial-session jvm_cal_sec "
                f"{new_jvm_cal_sec:.4f} (max {MAX_CAL_DRIFT:.0%}) — the "
                "anchor's new JVM signal would vouch only for the initial "
                "session while retry medians came from a different-speed JVM"
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
    if new_jvm_cal_sec is not None:
        # First refreeze from a jvm-calibrated run ESTABLISHES the JVM
        # signal; every refreeze after it is held to the dual fence above.
        out["jvm_cal_sec_at_refreeze"] = round(float(new_jvm_cal_sec), 4)
    if carried:
        out["carried_forward"] = carried
    return out


def select_sources(
    recovered: dict[str, dict[str, float]],
    cals: dict[str, float | None],
    detail_queries: dict[str, float],
    detail_cal: float,
    recent: int = RECENT_SOURCE_ROUNDS,
) -> tuple[dict[str, dict[str, float]], list[str], list[str]]:
    """Pure rule-5 source selection: keep the newest ``recent`` rounds,
    THEN dedupe the one that is the same run as the detail file — in that
    order, so the detail run occupies the slot of the round it duplicates
    rather than sliding the window back to an older
    (slower-implementation) round. Returns (sources incl. the detail run,
    excluded-as-old names, deduped names).

    "Newest" is by NUMERIC round extracted from the filename (see
    round_num above); files without a parsable round number sort
    oldest."""
    keep = sorted(recovered, key=lambda f: (round_num(f), f))[-recent:]
    excluded = sorted(set(recovered) - set(keep))
    sources: dict[str, dict[str, float]] = {}
    deduped: list[str] = []
    for fname in keep:
        if is_same_run(recovered[fname], cals.get(fname), detail_queries, detail_cal):
            deduped.append(fname)
            continue
        sources[fname] = recovered[fname]
    sources["BENCH_DETAIL.json"] = detail_queries
    return sources, excluded, deduped


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
    known = set(prior.get("queries", {})) | set(detail["detail_queries"])
    recovered: dict[str, dict[str, float]] = {}
    cals: dict[str, float | None] = {}
    round_files = sorted(glob.glob(str(REPO / "BENCH_r*.json")))
    for f in round_files:
        fname = Path(f).name
        data = json.loads(Path(f).read_text())
        queries = (data.get("parsed") or {}).get("queries") or data.get("queries")
        if queries:
            recovered[fname] = queries
            continue
        # r05+ rounds record only the compact summary in `parsed`; recover
        # the per-query detail from the stdout tail (rule 4 — never skip
        # silently, ADVICE r07).
        tail_q, tail_cal = recover_round_queries(data.get("tail", ""), known)
        if tail_q:
            recovered[fname] = tail_q
            cals[fname] = tail_cal
            print(f"note: {fname} recovered {len(tail_q)} queries from tail")
        else:
            print(f"note: {fname} skipped (no per-query data recoverable)")
    sources, excluded, deduped = select_sources(
        recovered, cals, detail["detail_queries"], new_cal
    )
    for fname in excluded:
        print(
            f"note: {fname} outside the {RECENT_SOURCE_ROUNDS}-round recent "
            "window — excluded so retired implementations' timings don't "
            "hold the gate open"
        )
    for fname in deduped:
        print(
            f"note: {fname} is the SAME run as BENCH_DETAIL.json "
            f"(box_cal {cals.get(fname)}) — deduped, one median vote"
        )
    try:
        anchor = build_refreeze(
            sources,
            prior,
            new_cal,
            new_jvm_cal_sec=detail.get("jvm_cal_sec"),
            new_jvm_cal_sec_retry=detail.get("jvm_cal_sec_retry"),
        )
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
