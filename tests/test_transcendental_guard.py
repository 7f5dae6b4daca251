"""Guard-band audit for transcendental→fixed-point rounding boundaries.

Round 4 proved a real failure mode: `orders_survival_km_repeat_purchase`
computed `round(exp(sum(ln(1-d/n))) * 1e6)` and one duration's pre-round
value sat within a libm ulp of a .5 boundary, so Spark (JVM libm) and the
driver's DuckDB build rounded it to DIFFERENT integers — rows and schema
matched, the value hash did not. That query is now exact-integer, but every
other oracle that feeds a `ln`/`exp`/`log`/`pow`-derived double into a
rounding step has the same latent fragility: it is data-dependent, invisible
to a same-box differential (both engines share one libm), and only shows
when the driver's DuckDB build disagrees in the last ulp.

Failure model and mechanism: a cross-engine libm may return a result a few
ulps (~4e-16 relative) off on any transcendental call; IEEE-754 requires
`+ - * /` and `sqrt` to be correctly rounded, so those are bit-identical
everywhere and CANNOT flake, no matter how close a rounded value sits to
its boundary. The audit therefore rewrites each candidate oracle so every
transcendental CALL SITE returns its value perturbed by (1 ± EPS) — an
over-approximation of a disagreeing libm — and asserts the query's output
is bit-identical to the unperturbed run. Any flip means a rounded output's
distance to its boundary is inside the EPS band and the driver hash could
flake on a different libm build; the fix is the KM treatment (reformulate
to exact integer arithmetic) or a coarser fixed-point scale.

EPS = 1e-14 relative: ~25-50x the worst plausible cross-libm disagreement,
small enough that healthy oracles (boundary distances at hundreds of ulps)
pass deterministically. The audit runs entirely in DuckDB: the guarded
property is about the real-valued quantity both engines compute, and the
margin it certifies dwarfs the engines' mutual disagreement, so a
one-engine check suffices — no Spark session needed.
"""

from __future__ import annotations

import re

import pandas as pd
import pytest

from glue_etl_framework_spark.queries import REGISTRY, load_registry
from tests.oracle_harness import _normalize, duckdb_connection

SF_DIR = "/root/testdata/sf0.01"
EPS = 1e-14

# sqrt deliberately absent: IEEE-754 requires it correctly rounded, so it is
# bit-identical across engines and cannot be a flake source.
_FNS = ("ln", "log", "log2", "log10", "exp", "pow", "power")
_CALL = re.compile(r"\b(" + "|".join(_FNS) + r")\s*\(", re.I)


def _candidates() -> list[str]:
    load_registry()
    return sorted(
        name
        for name, spec in REGISTRY.items()
        if spec.oracle and _CALL.search(spec.oracle)
    )


def _rewrite_calls(sql: str) -> tuple[str, set[tuple[str, int]]]:
    """Rename each transcendental call to __t_<fn>_<arity>( .

    Returns the rewritten SQL and the set of (fn, arity) pairs seen, so the
    caller can install exactly the macros needed. String literals and
    -- comments are skipped; arity is counted at paren depth 1.
    """
    out: list[str] = []
    seen: set[tuple[str, int]] = set()
    i, n = 0, len(sql)
    while i < n:
        c = sql[i]
        if c == "'":  # skip string literal (with '' escapes)
            j = i + 1
            while j < n:
                if sql[j] == "'":
                    if j + 1 < n and sql[j + 1] == "'":
                        j += 2
                        continue
                    j += 1
                    break
                j += 1
            out.append(sql[i:j])
            i = j
            continue
        if c == "-" and sql[i : i + 2] == "--":  # skip line comment
            j = sql.find("\n", i)
            j = n if j < 0 else j
            out.append(sql[i:j])
            i = j
            continue
        m = _CALL.match(sql, i)
        if m and (i == 0 or not (sql[i - 1].isalnum() or sql[i - 1] == "_")):
            fn = m.group(1).lower()
            # look ahead only to count arity; nested calls are rewritten by
            # the main loop because i advances just past the opening paren
            j, depth, commas = m.end(), 1, 0
            while j < n and depth:
                ch = sql[j]
                if ch == "'":
                    j += 1
                    while j < n and sql[j] != "'":
                        j += 1
                elif ch == "(":
                    depth += 1
                elif ch == ")":
                    depth -= 1
                elif ch == "," and depth == 1:
                    commas += 1
                j += 1
            arity = commas + 1
            seen.add((fn, arity))
            out.append(f"__t_{fn}_{arity}(")
            i = m.end()
            continue
        out.append(c)
        i += 1
    return "".join(out), seen


def test_rewrite_calls_mechanics():
    s, seen = _rewrite_calls("exp(ln(x) + log(y, 2))")
    assert s == "__t_exp_1(__t_ln_1(x) + __t_log_2(y, 2))"
    assert seen == {("exp", 1), ("ln", 1), ("log", 2)}
    s, seen = _rewrite_calls("regexp_extract(a, 'exp(') || 'ln(b)'")
    assert s == "regexp_extract(a, 'exp(') || 'ln(b)'" and seen == set()
    s, seen = _rewrite_calls("-- exp(x)\nPOWER(a, b)")
    assert s == "-- exp(x)\n__t_power_2(a, b)" and seen == {("power", 2)}
    s, seen = _rewrite_calls("sqrt(x) + log2(f(a, b))")
    assert s == "sqrt(x) + __t_log2_1(f(a, b))" and seen == {("log2", 1)}


@pytest.fixture(scope="module")
def con():
    c = duckdb_connection(SF_DIR)
    yield c
    c.close()


@pytest.mark.parametrize("name", _candidates())
def test_guard_band(con, name):
    sql = REGISTRY[name].oracle
    rewritten, seen = _rewrite_calls(sql)
    assert seen, f"{name}: rewriter found no transcendental call"
    base = _normalize(con.execute(sql).df())
    for sign in (+1, -1):
        for fn, arity in seen:
            args = ", ".join(f"a{k}" for k in range(arity))
            # exact-integer results (log2(2^k), ln(1), exp(0), ...) are exact
            # cases every libm implementation returns exactly — keep them
            # unperturbed so by-construction-exact .5 boundaries (which both
            # engines round identically, on identical doubles) don't alarm
            con.execute(
                f"CREATE OR REPLACE MACRO __t_{fn}_{arity}({args}) AS "
                f"CASE WHEN {fn}({args}) = floor({fn}({args})) "
                f"THEN {fn}({args}) "
                f"ELSE ({fn}({args})) * (1 + {sign * EPS}) END"
            )
        pert = _normalize(con.execute(rewritten).df())
        try:
            pd.testing.assert_frame_equal(base, pert, check_exact=True)
        except AssertionError as e:
            raise AssertionError(
                f"{name}: perturbing every transcendental call by "
                f"{sign * EPS:+.0e} relative (a simulated disagreeing libm) "
                f"changed the emitted values — some rounded output sits "
                f"within the guard band of its boundary on the sf0.01 "
                f"fixture; reformulate to integer arithmetic (see "
                f"orders_survival_km_repeat_purchase) or coarsen its "
                f"fixed-point scale.\n{e}"
            ) from e
