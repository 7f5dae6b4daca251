"""Empty-input robustness: every registered query must run (no crashes on
zero-row tables — guards sequence()/explode/window edge cases) and must
match the DuckDB oracle even with no data.

Known cross-engine divergence, asserted explicitly below: on EMPTY input,
DuckDB's CUBE / ROLLUP / GROUPING SETS emit the grand-total row (the SQL
standard's empty grouping set behaves like a global aggregate), while
Spark emits zero rows. With any data present both engines agree — the
sf0.01 oracle gate covers that; this divergence exists only at zero rows.
"""

from __future__ import annotations

import duckdb
import pytest

from glue_etl_framework_spark.queries import TABLES, load_registry, t
from tests.conftest import SF_SMOKE
from tests.oracle_harness import compare_query

REGISTRY = load_registry()

# empty-input grand-total row: DuckDB 1 row, Spark 0 (see module docstring)
EMPTY_GRAND_TOTAL_DIVERGENT = {"agg_cube", "agg_rollup", "agg_grouping_sets"}


@pytest.fixture(scope="module")
def empty_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("empty_sf")
    for tbl in TABLES:
        t(spark, SF_SMOKE, tbl).limit(0).write.mode("overwrite").parquet(
            str(d / f"{tbl}.parquet")
        )
    return str(d)


@pytest.fixture(scope="module")
def empty_con(empty_dir):
    con = duckdb.connect()
    for tbl in TABLES:
        con.execute(
            f"CREATE VIEW {tbl} AS "
            f"SELECT * FROM read_parquet('{empty_dir}/{tbl}.parquet/*.parquet')"
        )
    return con


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_survives_and_matches_on_empty_input(name, spark, empty_dir, empty_con):
    spec = REGISTRY[name]
    res = compare_query(spec, spark, empty_con, empty_dir)
    if name in EMPTY_GRAND_TOTAL_DIVERGENT:
        assert not res.ok
        assert res.spark_rows == 0 and res.oracle_rows == 1
    else:
        assert res.ok, f"{name}: {res.mismatches}"
