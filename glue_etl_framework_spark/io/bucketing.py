"""Bucketed (co-located) tables: the shuffle-elimination primitive for
repeated large-large joins.

At 100 TB, a fact-fact join shuffles both sides on the key every run. If
both tables are written bucketed (and sorted) by the join key into the
session catalog, Spark's scan reports a compatible HashPartitioning and the
sort-merge join runs with NO Exchange on either side — the shuffle cost is
paid once at write time and amortized over every subsequent join/aggregate
on that key. (Plain ``partitionBy`` does not do this: directory partitions
prune scans but don't co-locate rows by hash.)

The reference has no bucketing surface (its sink is the Glue parquet writer,
glue_etl_framework.py:222-231); this is a Spark-native extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
    location: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (optionally sorted) catalog table.
    ``n_buckets`` should give bucket files that fit an executor's read
    budget at full scale (buckets are not splittable across tasks).
    ``location`` makes the table external at an explicit path — needed on
    sessions whose static warehouse dir isn't writable."""
    writer = df.write.format(fmt).mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if location:
        writer = writer.option("path", location)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two bucketed catalog tables on their bucket key. When both
    sides were bucketed with the same column set and bucket count, the
    physical plan contains no Exchange (verify with
    ``assert_no_shuffle``)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def assert_no_shuffle(df: DataFrame) -> None:
    """Raise if the physical plan contains a shuffle Exchange — the check
    that a bucketed layout actually eliminated the join shuffle (AQE is
    bypassed by inspecting the initial plan; broadcast exchanges don't
    count, they're not a data shuffle)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Exchange" in line and "BroadcastExchange" not in line:
            raise AssertionError(f"plan contains a shuffle Exchange:\n{plan}")
