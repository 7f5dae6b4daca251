"""Small-file compaction: row-preserving rewrite into ~target-size files,
transactional swap, partition-layout preservation, and a planner that
declines when compaction isn't worthwhile."""

from __future__ import annotations

import os

from glue_etl_framework_spark.io.compaction import (
    compact_table,
    plan_compaction,
    table_file_stats,
)


def _data_files(path):
    out = []
    for root, _d, files in os.walk(path):
        out += [os.path.join(root, f) for f in files if f.endswith(".parquet")]
    return out


def test_compact_shrinks_file_count_preserves_rows(tmp_path, spark):
    loc = str(tmp_path / "frag")
    spark.range(0, 10_000).selectExpr("id AS k", "id % 7 AS v").repartition(40).write.parquet(loc)
    n_before, total = table_file_stats(loc)
    assert n_before == 40
    # target sized so the whole table fits in one file
    n_out = compact_table(spark, loc, target_file_bytes=64 * 1024 * 1024)
    assert n_out == 1
    assert len(_data_files(loc)) == 1
    got = spark.read.parquet(loc)
    assert got.count() == 10_000
    assert got.selectExpr("sum(k) AS s").first().s == sum(range(10_000))
    # no stage/backup residue
    assert not [d for d in os.listdir(tmp_path) if "__stage__" in d or "__old__" in d]


def test_compact_partitioned_preserves_layout(tmp_path, spark):
    loc = str(tmp_path / "part")
    df = spark.range(0, 2_000).selectExpr("id AS k", "CAST(id % 3 AS STRING) AS p")
    df.repartition(10).write.partitionBy("p").parquet(loc)
    assert len(_data_files(loc)) > 3
    n_out = compact_table(
        spark, loc, target_file_bytes=64 * 1024 * 1024, partition_keys=["p"]
    )
    assert n_out == 3  # one planned file per partition (all well under target)
    parts = sorted(d for d in os.listdir(loc) if d.startswith("p="))
    assert parts == ["p=0", "p=1", "p=2"]
    # small partitions collapse to one file each
    for d in parts:
        assert len(_data_files(os.path.join(loc, d))) == 1
    got = spark.read.parquet(loc)
    assert got.count() == 2_000
    assert got.groupBy("p").count().count() == 3


def test_compact_partitioned_splits_oversized_partition(tmp_path, spark):
    """A partition holding many times the target bytes is salted across
    multiple output files instead of collapsing to one giant file."""
    from glue_etl_framework_spark.io.compaction import partition_dir_stats

    loc = str(tmp_path / "skewed")
    big = spark.range(0, 40_000).selectExpr(
        "id AS k", "repeat(uuid(), 4) AS payload", "'big' AS p"
    )
    small = spark.range(0, 50).selectExpr(
        "id AS k", "repeat(uuid(), 4) AS payload", "'small' AS p"
    )
    big.union(small).repartition(16).write.partitionBy("p").parquet(loc)
    stats = partition_dir_stats(loc, ["p"])
    big_bytes = stats[("big",)][1]
    target = max(1, big_bytes // 4)  # plan ~4-5 files for the big partition
    n_out = compact_table(spark, loc, target_file_bytes=target, partition_keys=["p"])
    assert n_out is not None and n_out >= 5
    big_files = _data_files(os.path.join(loc, "p=big"))
    small_files = _data_files(os.path.join(loc, "p=small"))
    assert len(big_files) >= 3  # salted split (hash collisions may merge some)
    assert len(small_files) == 1
    got = spark.read.parquet(loc)
    assert got.count() == 40_050
    assert got.filter("p = 'big'").count() == 40_000


def test_plan_compaction_declines_when_not_worthwhile(tmp_path, spark):
    loc = str(tmp_path / "ok")
    spark.range(0, 100).coalesce(1).write.parquet(loc)
    # single file: nothing to compact
    assert plan_compaction(loc) is None
    # well-sized files: average >= target/2 -> decline
    n, total = table_file_stats(loc)
    assert plan_compaction(loc, target_file_bytes=total) is None
    # noop on decline: compact_table leaves the table untouched
    before = _data_files(loc)
    assert compact_table(spark, loc) is None
    assert _data_files(loc) == before


def test_partition_dir_stats_multilevel(tmp_path, spark):
    loc = str(tmp_path / "ml")
    df = spark.createDataFrame(
        [(1, "a", "x"), (2, "a", "y"), (3, "b", "x")], "k int, p1 string, p2 string"
    )
    df.write.partitionBy("p1", "p2").parquet(loc)
    from glue_etl_framework_spark.io.compaction import partition_dir_stats

    stats = partition_dir_stats(loc, ["p1", "p2"])
    assert set(stats) == {("a", "x"), ("a", "y"), ("b", "x")}
    assert all(n >= 1 and b > 0 for n, b in stats.values())


def test_analyze_table_records_stats(tmp_path, spark):
    from glue_etl_framework_spark.io.compaction import analyze_table

    spark.sql("CREATE DATABASE IF NOT EXISTS statdb")
    spark.createDataFrame([(i, str(i)) for i in range(100)], "k int, v string") \
        .write.mode("overwrite").option("path", f"{tmp_path}/st").saveAsTable("statdb.st")
    analyze_table(spark, "statdb.st", columns=["k"])
    detail = {r.col_name: r.data_type for r in spark.sql("DESCRIBE EXTENDED statdb.st").collect()}
    assert "Statistics" in detail and "100 rows" in detail["Statistics"]
    colstats = {r.info_name: r.info_value for r in spark.sql(
        "DESCRIBE EXTENDED statdb.st k").collect()}
    assert colstats.get("distinct_count") not in (None, "NULL")
    spark.sql("DROP TABLE statdb.st")


def test_vacuum_stale_stages(tmp_path, spark):
    """Crashed staged writes leave .__stage__/.__old__ dirs; vacuum removes
    exactly those and never the live table."""
    from glue_etl_framework_spark.io.compaction import vacuum_stale_stages

    tbl = tmp_path / "warehouse" / "t1"
    df = spark.range(10)
    df.write.parquet(str(tbl))
    stale1 = tmp_path / "warehouse" / "t1.__stage__deadbeef"
    stale2 = tmp_path / "warehouse" / "t1.__old__cafebabe"
    nested = tmp_path / "warehouse" / "sub" / "t2.__stage__12345678"
    for d in (stale1, stale2, nested):
        d.mkdir(parents=True)
        (d / "part-0.parquet").write_bytes(b"junk")

    preview = vacuum_stale_stages(str(tmp_path), dry_run=True)
    assert preview == sorted(str(p) for p in (stale1, stale2, nested))
    assert stale1.exists()  # dry run keeps everything

    removed = vacuum_stale_stages(str(tmp_path))
    assert removed == preview
    assert not stale1.exists() and not stale2.exists() and not nested.exists()
    assert spark.read.parquet(str(tbl)).count() == 10  # live table intact
