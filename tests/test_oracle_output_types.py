"""Registry-wide oracle output-type audit.

Plans every oracle in DuckDB (DESCRIBE — no execution) and fails if any
output column's type falls outside the set the driver's value-hash renders
identically to Spark's. Motivation: in r5 the KM survival oracle's window
`SUM(BIGINT)` silently widened `n_risk`/`surv_fp` to HUGEINT, which the
driver materializes as float ("995000.0") against Spark's BIGINT
("995000") — a hash mismatch with zero differing values. This test makes
that class of representation bug a local pre-flight failure: planning all
oracles costs seconds and pinpoints the offending column by name.
"""

from __future__ import annotations

import pytest

from glue_etl_framework_spark.queries import load_registry
from tests.conftest import SF_ORACLE
from tests.oracle_harness import duckdb_connection

REGISTRY = load_registry()

# Types whose pandas materialization matches Spark's for equal values.
# Notably ABSENT: HUGEINT/UHUGEINT (render as float), DECIMAL (object/
# float drift), intervals, nested types.
_ALLOWED_EXACT = {
    "BIGINT",
    "INTEGER",
    "SMALLINT",
    "TINYINT",
    "UINTEGER",
    "USMALLINT",
    "UTINYINT",
    "DOUBLE",
    "FLOAT",
    "VARCHAR",
    "BOOLEAN",
    "DATE",
}
_ALLOWED_PREFIX = ("TIMESTAMP",)

_ORACLED = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)


@pytest.fixture(scope="module")
def con():
    c = duckdb_connection(SF_ORACLE)
    yield c
    c.close()


@pytest.mark.parametrize("name", _ORACLED)
def test_oracle_output_types_driver_safe(name, con):
    spec = REGISTRY[name]
    cols = con.execute(f"DESCRIBE {spec.oracle}").fetchall()
    bad = [
        (cname, ctype)
        for cname, ctype, *_ in cols
        if ctype not in _ALLOWED_EXACT and not ctype.startswith(_ALLOWED_PREFIX)
    ]
    assert not bad, (
        f"{name}: oracle emits driver-unsafe column type(s) {bad} — "
        "CAST to BIGINT/DOUBLE/etc. in the final SELECT (DuckDB widens "
        "e.g. window SUM(BIGINT) to HUGEINT, which hash-mismatches Spark)"
    )
