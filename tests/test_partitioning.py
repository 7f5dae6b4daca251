"""SURVEY §2.6 partition-local ordering: DISTRIBUTE BY / SORT BY /
sortWithinPartitions. Not oracle-checkable (the property is physical
layout, not row values) — asserted directly on partition contents."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _partition_layout(df, key_col, sort_col):
    rows = df.select(
        F.spark_partition_id().alias("pid"), key_col, sort_col
    ).collect()
    by_pid = defaultdict(list)
    key_pids = defaultdict(set)
    for r in rows:
        by_pid[r["pid"]].append((r[key_col], r[sort_col]))
        key_pids[r[key_col]].add(r["pid"])
    return by_pid, key_pids


def test_distribute_by_colocates_and_sort_by_orders(spark):
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    df = li.repartition(8, "l_orderkey").sortWithinPartitions("l_orderkey", "l_linenumber")
    by_pid, key_pids = _partition_layout(df, "l_orderkey", "l_linenumber")
    # every order's rows land in exactly one partition
    assert all(len(pids) == 1 for pids in key_pids.values())
    # partition-local ordering holds
    for recs in by_pid.values():
        assert recs == sorted(recs)


def test_sql_distribute_sort_by(spark):
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    li.createOrReplaceTempView("__li_part")
    df = spark.sql(
        "SELECT l_orderkey, l_linenumber FROM __li_part "
        "DISTRIBUTE BY l_orderkey SORT BY l_orderkey, l_linenumber"
    )
    by_pid, key_pids = _partition_layout(df, "l_orderkey", "l_linenumber")
    assert all(len(pids) == 1 for pids in key_pids.values())
    for recs in by_pid.values():
        assert recs == sorted(recs)


def test_partition_pruning_reaches_scan(tmp_path, spark):
    """A filter on the partition column must become a PartitionFilter on
    the scan (reading only matching directories) — the behavior that
    makes partitioned layouts worth writing at 100 TB."""
    from glue_etl_framework_spark.io.writers import write_table

    loc = str(tmp_path / "by_status")
    src = spark.range(1000).selectExpr(
        "id", "CASE WHEN id % 3 = 0 THEN 'A' WHEN id % 3 = 1 THEN 'B' ELSE 'C' END AS status"
    )
    write_table(src, {"name": "t", "target": "file", "location": loc,
                      "format": "parquet", "partition_keys": "status"})
    df = spark.read.parquet(loc).filter("status = 'B'")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    seg = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "status" in seg, f"partition filter not pushed: {seg!r}"
    assert df.count() == 333


def test_dpp_plan_prunes_fact_scan(spark):
    """The DPP round-trip operator's fact scan must carry a
    dynamicpruningexpression — runtime partition pruning driven by the
    dimension's data-derived filter (static pruning can't see it)."""
    from glue_etl_framework_spark.queries.io_ops import io_dpp_partition_pruned_join
    from tests.conftest import SF_SMOKE

    df = io_dpp_partition_pruned_join(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
