"""Differential test: every registered query vs its DuckDB oracle at sf0.01
(the driver's correctness gate, replicated locally and stricter: float
values must be bit-identical, not just within tolerance)."""

from __future__ import annotations

import pytest

from glue_etl_framework_spark.queries import load_registry
from tests.conftest import SF_ORACLE
from tests.oracle_harness import compare_query, duckdb_connection

REGISTRY = load_registry()


@pytest.fixture(scope="module")
def con():
    c = duckdb_connection(SF_ORACLE)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, con):
    spec = REGISTRY[name]
    res = compare_query(spec, spark, con, SF_ORACLE)
    assert res.ok, f"{name}: {res.mismatches}"
    if spec.oracle is not None:
        assert res.exact, f"{name} matched only within tolerance: {res.mismatches}"
        assert res.spark_rows > 0, f"{name}: empty result — weak test"
