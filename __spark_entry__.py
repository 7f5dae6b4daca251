"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``glue_etl_framework_spark.queries`` — one named,
oracle-paired builder per operator of SURVEY.md §2 (plus the EXT
dedup/similarity/text operators).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from glue_etl_framework_spark.queries import load_registry  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (revenue by region: lineitem⋈orders⋈customer⋈nation⋈
    region + grouped sum — the README Example-1 analogue) on sf0.001."""
    registry = load_registry()
    return registry["flagship_revenue_by_region"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in load_registry().items()}


def oracle_sql() -> dict[str, str]:
    """Equivalent ANSI SQL per query, runnable by DuckDB on the same parquet
    tables. Queries without an oracle (non-SQL-expressible) are omitted."""
    return {
        name: spec.oracle
        for name, spec in load_registry().items()
        if spec.oracle is not None
    }
