"""Streaming stability soak (VERDICT r04 item 9, promoted from the r4
manual run): every streaming_live registry entry — live availableNow
drains AND their oracle-paired parity twins — re-compared against its
oracle 3 consecutive times in ONE session. What this exercises that a
single pass cannot: checkpoint-dir hygiene (each drain must create and
remove its own ephemeral checkpoint — an orphan or reuse collision only
shows on repetition), the _SRC_CACHE materialized-source reuse path, and
memory-sink name uniqueness across repeated drains. Run explicitly:

    pytest -m soak tests/test_streaming_soak.py

Excluded from the default suite via addopts (-m "not soak") to keep the
per-round pytest gate fast."""

from __future__ import annotations

import pytest

from glue_etl_framework_spark.queries import load_registry
from tests.conftest import SF_ORACLE
from tests.oracle_harness import compare_query, duckdb_connection

SOAK_ROUNDS = 3


@pytest.mark.soak
def test_streaming_drains_stable_across_repeated_runs(spark):
    reg = load_registry()
    live = {n: s for n, s in reg.items() if s.fn.__module__.endswith("streaming_live")}
    assert len(live) >= 16, f"expected the full streaming_live surface, got {len(live)}"
    con = duckdb_connection(SF_ORACLE)
    failures = []
    for rnd in range(1, SOAK_ROUNDS + 1):
        for name, spec in live.items():
            r = compare_query(spec, spark, con, SF_ORACLE)
            if not r.ok:
                failures.append((rnd, name, r.mismatches[:2]))
    con.close()
    assert not failures, f"soak instability: {failures}"
