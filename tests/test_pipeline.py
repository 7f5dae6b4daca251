"""End-to-end pipeline tests: YAML config + SQL file -> output parquet,
mirroring the reference's README Example 1 surface, plus the config-layer
edge cases the reference gets wrong (SURVEY.md §5 bugs, done right here)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from glue_etl_framework_spark.io.writers import staged_write, upsert_by_key, write_table
from glue_etl_framework_spark.pipeline import run_pipeline
from glue_etl_framework_spark.pipeline.config import interpolate, prepare_sql
from tests.conftest import SF_SMOKE

FLAGSHIP_SQL = """
-- revenue by region (README Example 1 analogue)
SELECT r.r_name,
       sum(CAST(ROUND(l.l_extendedprice*(1-l.l_discount)*100) AS BIGINT)) AS revenue_cents,
       count(*) AS n
FROM lineitem l JOIN orders o ON l.l_orderkey=o.o_orderkey
JOIN customer c ON o.o_custkey=c.c_custkey
JOIN nation n ON c.c_nationkey=n.n_nationkey
JOIN region r ON n.n_regionkey=r.r_regionkey
GROUP BY r.r_name
"""


def write_config(tmp_path, sql_file="query.sql", refresh="full", out_name="out"):
    tables = "\n".join(
        f"""  - name: {t}
    source: file
    location: /root/testdata/{{sf}}/{t}.parquet"""
        for t in ["lineitem", "orders", "customer", "nation", "region"]
    )
    cfg = f"""
job:
  type: spark-sql
  name: revenue_by_region
variables:
  demo:
    sf: sf0.001
input_tables:
{tables}
sql_file: {sql_file}
output_table:
  target: file
  location: {tmp_path}/{out_name}
  partition_keys: r_name
  coalesce: 1
  refresh: {refresh}
"""
    (tmp_path / "config.yaml").write_text(cfg)
    (tmp_path / sql_file).write_text(FLAGSHIP_SQL)
    return tmp_path / "config.yaml"


def test_flagship_pipeline_end_to_end(tmp_path, spark):
    cfg = write_config(tmp_path)
    run_pipeline(spark, cfg, "demo")
    out = spark.read.parquet(f"{tmp_path}/out")
    assert out.count() == 5
    # partitioned layout on disk
    parts = [d for d in os.listdir(f"{tmp_path}/out") if d.startswith("r_name=")]
    assert len(parts) == 5
    # golden check against direct SQL over the same fixtures
    for t in ["lineitem", "orders", "customer", "nation", "region"]:
        spark.read.parquet(f"{SF_SMOKE}/{t}.parquet").createOrReplaceTempView(t)
    want = {r.r_name: r.revenue_cents for r in spark.sql(FLAGSHIP_SQL).collect()}
    got = {r.r_name: r.revenue_cents for r in out.collect()}
    assert got == want


def test_incremental_refresh_rewrites_only_touched_partitions(tmp_path, spark):
    cfg = write_config(tmp_path)
    run_pipeline(spark, cfg, "demo")
    before = {r.r_name: r.n for r in spark.read.parquet(f"{tmp_path}/out").collect()}

    (tmp_path / "query.sql").write_text(
        "SELECT r_name, CAST(0 AS BIGINT) AS revenue_cents, CAST(0 AS BIGINT) AS n "
        "FROM region WHERE r_name = 'ASIA'"
    )
    cfg2 = write_config(tmp_path, refresh="incremental")
    (tmp_path / "query.sql").write_text(
        "SELECT r_name, CAST(0 AS BIGINT) AS revenue_cents, CAST(0 AS BIGINT) AS n "
        "FROM region WHERE r_name = 'ASIA'"
    )
    run_pipeline(spark, cfg2, "demo")
    after = {r.r_name: r.n for r in spark.read.parquet(f"{tmp_path}/out").collect()}
    assert after["ASIA"] == 0
    assert after["EUROPE"] == before["EUROPE"]
    assert len(after) == 5


def test_undefined_variable_raises(tmp_path, spark):
    cfg = write_config(tmp_path)
    text = cfg.read_text().replace("{sf}", "{missing}")
    cfg.write_text(text)
    with pytest.raises(KeyError, match="missing"):
        run_pipeline(spark, cfg, "demo")


def test_apostrophe_literal_survives(spark):
    # the reference's quote-rewrite (glue_etl_framework.py:175) corrupts
    # literals with apostrophes; prepare_sql must not
    sql = prepare_sql("SELECT 1 WHERE 'don''t' <> 'x'", {})
    assert "don''t" in sql
    assert spark.sql(sql).count() == 1


def test_comments_semicolons_and_multiline_literals_survive(spark):
    """prepare_sql must be interpolation + trim ONLY: Spark's parser
    accepts comments and trailing semicolons natively, and any textual
    comment/semicolon stripping corrupts multiline string literals (the
    same class as the reference's quote-rewrite bug)."""
    sql = prepare_sql("-- header comment\nSELECT {n} AS v;\n", {"n": "42"})
    assert sql == "-- header comment\nSELECT 42 AS v;"
    assert spark.sql(sql).first()["v"] == 42
    lit = "SELECT 'a\n--not a comment\nb' AS x"
    assert prepare_sql(lit, {}) == lit
    assert spark.sql(lit).first()["x"] == "a\n--not a comment\nb"


def test_interpolate_nested():
    cfg = {"a": ["{x}/1", {"b": "{x}-2"}], "c": 3}
    out = interpolate(cfg, {"x": "V"})
    assert out == {"a": ["V/1", {"b": "V-2"}], "c": 3}


def test_python_script_job(tmp_path, spark):
    (tmp_path / "user.py").write_text("result = spark.range(7).count()\n")
    (tmp_path / "py.yaml").write_text(
        f"""
job:
  type: python-script
variables:
  demo: {{}}
python_file: {tmp_path}/user.py
"""
    )
    ns = run_pipeline(spark, tmp_path / "py.yaml", "demo")
    assert ns["result"] == 7


def test_csv_source_with_glue_format_options(tmp_path, spark):
    src = f"{tmp_path}/region_csv"
    spark.read.parquet(f"{SF_SMOKE}/region.parquet").coalesce(1).write.option(
        "header", True
    ).csv(src)
    (tmp_path / "csv.yaml").write_text(
        f"""
job:
  type: spark-sql
variables:
  demo: {{}}
input_tables:
  - name: region
    source: file
    location: {src}
    format: csv
    format_options:
      withHeader: true
      separator: ","
      inferSchema: true
sql: SELECT count(*) AS n FROM region
"""
    )
    out = run_pipeline(spark, tmp_path / "csv.yaml", "demo", write=False)
    assert out.first().n == 5


def test_json_source_roundtrip(tmp_path, spark):
    src = f"{tmp_path}/region_json"
    spark.read.parquet(f"{SF_SMOKE}/region.parquet").write.json(src)
    (tmp_path / "j.yaml").write_text(
        f"""
job:
  type: spark-sql
variables:
  demo: {{}}
input_tables:
  - name: region
    source: file
    location: {src}
    format: json
sql: SELECT max(r_regionkey) AS mx FROM region
"""
    )
    assert run_pipeline(spark, tmp_path / "j.yaml", "demo", write=False).first().mx == 4


def test_staged_write_failure_leaves_old_data(tmp_path, spark):
    loc = f"{tmp_path}/tbl"
    good = spark.createDataFrame([(1, "a")], "k int, v string")
    staged_write(good, {"location": loc, "format": "parquet"})
    bad = spark.createDataFrame([(1,)], "k int").selectExpr("assert_true(k > 5) AS x", "k")
    with pytest.raises(Exception):
        staged_write(bad, {"location": loc, "format": "parquet"})
    assert [(r.k, r.v) for r in spark.read.parquet(loc).collect()] == [(1, "a")]
    assert not [d for d in os.listdir(tmp_path) if "__stage__" in d or "__old__" in d]


def test_upsert_by_key_last_writer_wins(tmp_path, spark):
    loc = f"{tmp_path}/upsert"
    upsert_by_key(spark, spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"), loc, ["k"])
    upsert_by_key(spark, spark.createDataFrame([(2, "B"), (3, "c")], "k int, v string"), loc, ["k"])
    assert sorted((r.k, r.v) for r in spark.read.parquet(loc).collect()) == [
        (1, "a"), (2, "B"), (3, "c"),
    ]


def test_catalog_sink_roundtrip(tmp_path, spark):
    df = spark.read.parquet(f"{SF_SMOKE}/region.parquet")
    write_table(
        df,
        {
            "target": "catalog",
            "database": "testdb",
            "table_name": "region_copy",
            "location": f"{tmp_path}/region_copy",
            "refresh": "full",
        },
    )
    assert spark.table("testdb.region_copy").count() == 5
    spark.sql("DROP TABLE testdb.region_copy")


def test_orc_source_roundtrip(tmp_path, spark):
    src = f"{tmp_path}/region_orc"
    spark.read.parquet(f"{SF_SMOKE}/region.parquet").write.orc(src)
    (tmp_path / "orc.yaml").write_text(
        f"""
job:
  type: spark-sql
variables:
  demo: {{}}
input_tables:
  - name: region
    source: file
    location: {src}
    format: orc
output_table:
  name: out
  source: file
  location: {tmp_path}/out
sql: SELECT count(*) AS n FROM region
"""
    )
    out = run_pipeline(spark, tmp_path / "orc.yaml", "demo", write=False)
    assert out.collect()[0]["n"] == 5


def test_avro_without_jar_falls_back_to_python_codec(tmp_path, spark):
    """With the spark-avro jar absent, format: avro is served by the
    pure-Python codec (io/avro_py.py) instead of erroring; an empty
    location still gives a clear file-level error, not a datasource one."""
    from glue_etl_framework_spark.io.readers import read_table

    with pytest.raises(FileNotFoundError, match="no .avro files"):
        read_table(
            spark,
            {"name": "x", "source": "file", "location": str(tmp_path), "format": "avro"},
        )


def test_catalog_source_and_sink(tmp_path, spark):
    """Session-catalog round trip: saveAsTable (the Glue Data Catalog sink
    equivalent) then a pipeline reading source: catalog."""
    spark.sql("CREATE DATABASE IF NOT EXISTS gdc_test")
    spark.read.parquet(f"{SF_SMOKE}/region.parquet").write.mode("overwrite").saveAsTable(
        "gdc_test.region_cat"
    )
    (tmp_path / "cat.yaml").write_text(
        f"""
job:
  type: spark-sql
variables:
  demo: {{}}
input_tables:
  - name: region
    source: catalog
    database: gdc_test
    table_name: region_cat
output_table:
  name: out
  source: file
  location: {tmp_path}/out
sql: SELECT r_regionkey, r_name FROM region
"""
    )
    out = run_pipeline(spark, tmp_path / "cat.yaml", "demo", write=False)
    assert out.count() == 5
    spark.sql("DROP TABLE gdc_test.region_cat")
    spark.sql("DROP DATABASE gdc_test")


def test_bucketed_join_has_no_shuffle(spark):
    """Both sides bucketed by the join key -> sort-merge join with zero
    Exchange in the plan (the write-once-join-many co-location contract)."""
    from glue_etl_framework_spark.io.bucketing import (
        assert_no_shuffle,
        bucketed_join,
        write_bucketed,
    )

    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    write_bucketed(orders, "b_orders", ["o_orderkey"], 8, sort_cols=["o_orderkey"])
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem", ["o_orderkey"], 8, sort_cols=["o_orderkey"],
    )
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = bucketed_join(spark, "b_lineitem", "b_orders", ["o_orderkey"])
        assert_no_shuffle(joined)
        assert joined.count() == lineitem.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_jdbc_source_validates_config(spark):
    from glue_etl_framework_spark.io.readers import read_table

    with pytest.raises(ValueError, match="jdbc source requires"):
        read_table(spark, {"name": "j", "source": "jdbc", "options": {"url": "jdbc:x"}})
    with pytest.raises(ValueError, match="jdbc source requires"):
        read_table(spark, {"name": "j", "source": "jdbc", "dbtable": "t"})


def test_jdbc_source_reads_real_database(tmp_path, spark):
    """Real JDBC round trip against embedded Derby (bundled with Spark):
    write a table through the JDBC writer, read it back through our
    source: jdbc config path — the capability the reference stubs out
    (glue_etl_framework.py:119-120 prints and creates nothing)."""
    from glue_etl_framework_spark.io.readers import read_table

    url = f"jdbc:derby:{tmp_path}/derbydb;create=true"
    src = spark.read.parquet(f"{SF_SMOKE}/region.parquet")
    src.write.format("jdbc").option("url", url).option(
        "dbtable", "region_jdbc"
    ).option("driver", "org.apache.derby.jdbc.EmbeddedDriver").mode("overwrite").save()

    df = read_table(
        spark,
        {
            "name": "region",
            "source": "jdbc",
            "options": {
                "url": url,
                "dbtable": "region_jdbc",
                "driver": "org.apache.derby.jdbc.EmbeddedDriver",
            },
        },
    )
    assert df.count() == 5
    assert set(df.columns) == {"r_regionkey", "r_name"}


def test_catalog_incremental_appends_non_partitioned(tmp_path, spark):
    """refresh=incremental on a NON-partitioned catalog table must append
    (ADVICE r01: overwrite-insertInto silently truncated), and insertInto's
    positional resolution must survive a reordered df."""
    out = {
        "target": "catalog",
        "database": "incdb",
        "table_name": "acc",
        "location": f"{tmp_path}/acc",
    }
    write_table(spark.createDataFrame([(1, "a")], "k int, v string"), {**out, "refresh": "full"})
    write_table(
        spark.createDataFrame([(2, "b")], "k int, v string"), {**out, "refresh": "incremental"}
    )
    # reordered columns: alignment must route values to the right columns
    write_table(
        spark.createDataFrame([("c", 3)], "v string, k int"), {**out, "refresh": "incremental"}
    )
    assert sorted((r.k, r.v) for r in spark.table("incdb.acc").collect()) == [
        (1, "a"), (2, "b"), (3, "c"),
    ]
    spark.sql("DROP TABLE incdb.acc")


def test_catalog_incremental_partitioned_dynamic_despite_static_session(tmp_path, spark):
    """Partitioned catalog incremental overwrites ONLY touched partitions,
    forced per-write — even when the session conf is 'static'."""
    out = {
        "target": "catalog",
        "database": "incdb",
        "table_name": "pacc",
        "location": f"{tmp_path}/pacc",
        "partition_keys": "part",
    }
    write_table(
        spark.createDataFrame([(1, "x", "p1"), (2, "y", "p2")], "k int, v string, part string"),
        {**out, "refresh": "full"},
    )
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
    try:
        write_table(
            spark.createDataFrame([(1, "X", "p1")], "k int, v string, part string"),
            {**out, "refresh": "incremental"},
        )
    finally:
        spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    assert sorted((r.k, r.v, r.part) for r in spark.table("incdb.pacc").collect()) == [
        (1, "X", "p1"), (2, "y", "p2"),
    ]
    spark.sql("DROP TABLE incdb.pacc")


def test_file_incremental_partitioned_dynamic_despite_static_session(tmp_path, spark):
    """File-target incremental on partitioned output sets dynamic overwrite
    per-write; a 'static' session conf must not wipe untouched partitions."""
    out = {"target": "file", "location": f"{tmp_path}/f", "partition_keys": "part"}
    write_table(
        spark.createDataFrame([(1, "p1"), (2, "p2")], "k int, part string"),
        {**out, "refresh": "full"},
    )
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
    try:
        write_table(
            spark.createDataFrame([(10, "p1")], "k int, part string"),
            {**out, "refresh": "incremental"},
        )
    finally:
        spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    assert sorted((r.k, r.part) for r in spark.read.parquet(f"{tmp_path}/f").collect()) == [
        (2, "p2"), (10, "p1"),
    ]


def test_staged_catalog_write_swap_and_failure_keeps_old(tmp_path, spark):
    """Governed catalog write: location-swap commit; a failing plan leaves
    the previous table fully readable and no stage dirs behind."""
    out = {
        "target": "catalog",
        "database": "stgdb",
        "table_name": "gov",
        "location": f"{tmp_path}/gov",
    }
    staged_write(spark.createDataFrame([(1, "a")], "k int, v string"), out)
    assert [(r.k, r.v) for r in spark.table("stgdb.gov").collect()] == [(1, "a")]
    staged_write(spark.createDataFrame([(2, "b")], "k int, v string"), out)
    assert [(r.k, r.v) for r in spark.table("stgdb.gov").collect()] == [(2, "b")]
    bad = spark.createDataFrame([(1, "z")], "k int, v string").selectExpr(
        "assert_true(k > 5) AS x", "k", "v"
    )
    with pytest.raises(Exception):
        staged_write(bad, out)
    assert [(r.k, r.v) for r in spark.table("stgdb.gov").collect()] == [(2, "b")]
    stages = [d for d in os.listdir(tmp_path) if "__stage__" in d]
    assert len(stages) == 1  # exactly the live swapped-in directory
    spark.sql("DROP TABLE stgdb.gov")


def test_upsert_by_key_no_broadcast_large_batch(tmp_path, spark):
    """Upsert with broadcast disabled entirely (threshold -1): correctness
    must not depend on a driver-side broadcast of the new-keys set."""
    loc = f"{tmp_path}/up_big"
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        upsert_by_key(spark, spark.range(0, 500).selectExpr("id AS k", "'old' AS v"), loc, ["k"])
        upsert_by_key(
            spark, spark.range(250, 750).selectExpr("id AS k", "'new' AS v"), loc, ["k"]
        )
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    got = spark.read.parquet(loc)
    assert got.count() == 750
    assert got.filter("v = 'new'").count() == 500
    assert got.filter("v = 'old'").count() == 250


def test_upsert_by_key_order_by_resolves_batch_dups(tmp_path, spark):
    """order_by makes the intra-batch winner deterministic (greatest wins)."""
    loc = f"{tmp_path}/up_det"
    df = spark.createDataFrame(
        [(1, "stale", 10), (1, "fresh", 20), (2, "only", 5)], "k int, v string, ts int"
    )
    upsert_by_key(spark, df, loc, ["k"], order_by="ts")
    assert sorted((r.k, r.v) for r in spark.read.parquet(loc).collect()) == [
        (1, "fresh"), (2, "only"),
    ]


def test_avro_session_wiring():
    """get_spark(with_avro=True) wires the version-matched spark-avro
    coordinate into spark.jars.packages (a context-creation conf — asserted
    on the assembled conf, since the test JVM is already running), and
    user extra_conf still wins over defaults."""
    import pyspark

    from glue_etl_framework_spark.session import assemble_conf, avro_package

    assert avro_package() == f"org.apache.spark:spark-avro_2.13:{pyspark.__version__}"
    conf = assemble_conf(with_avro=True)
    assert conf["spark.jars.packages"] == avro_package()
    conf2 = assemble_conf(
        with_avro=True, extra_conf={"spark.jars.packages": "my:override:1"}
    )
    assert conf2["spark.jars.packages"] == "my:override:1"
    assert "spark.jars.packages" not in assemble_conf()


def test_avro_roundtrip_if_datasource_available(tmp_path, spark):
    """Real avro read+write matrix entry (reference README.md:44) — runs
    when the spark-avro datasource is on the classpath, skips (not passes)
    when this offline build lacks it."""
    src = f"{tmp_path}/region_avro"
    base = spark.read.parquet(f"{SF_SMOKE}/region.parquet")
    try:
        base.write.format("avro").save(src)
    except Exception as exc:
        if "Failed to find data source" in str(exc):
            pytest.skip("spark-avro datasource not on classpath (offline build)")
        raise
    from glue_etl_framework_spark.io.readers import read_table

    df = read_table(
        spark, {"name": "region", "source": "file", "location": src, "format": "avro"}
    )
    assert df.count() == 5
    assert set(df.columns) == {"r_regionkey", "r_name"}


def test_jdbc_sink_roundtrip(tmp_path, spark):
    """write_table target=jdbc against embedded Derby: full refresh
    overwrites, incremental appends — the sink mirror of the JDBC source
    (the reference stubs both)."""
    from glue_etl_framework_spark.io.readers import read_table

    url = f"jdbc:derby:{tmp_path}/sinkdb;create=true"
    out = {
        "target": "jdbc",
        "options": {
            "url": url,
            "dbtable": "acc",
            "driver": "org.apache.derby.jdbc.EmbeddedDriver",
        },
    }
    write_table(
        spark.createDataFrame([(1, "a")], "k int, v string"), {**out, "refresh": "full"}
    )
    write_table(
        spark.createDataFrame([(2, "b")], "k int, v string"),
        {**out, "refresh": "incremental"},
    )
    df = read_table(spark, {"name": "acc", "source": "jdbc", "options": out["options"]})
    assert sorted((r.k, r.v) for r in df.collect()) == [(1, "a"), (2, "b")]
    write_table(
        spark.createDataFrame([(9, "z")], "k int, v string"), {**out, "refresh": "full"}
    )
    df2 = read_table(spark, {"name": "acc", "source": "jdbc", "options": out["options"]})
    assert [(r.k, r.v) for r in df2.collect()] == [(9, "z")]


def test_jdbc_sink_validates_config(spark):
    with pytest.raises(ValueError, match="jdbc target requires"):
        write_table(
            spark.createDataFrame([(1,)], "k int"),
            {"target": "jdbc", "options": {"url": "jdbc:x"}},
        )


def test_staged_catalog_write_partitioned_sync(tmp_path, spark):
    """Governed swap on a PARTITIONED catalog table: the CREATE path renders
    an explicit column list, and the swap re-syncs partition metadata so no
    stale partition points into the deleted old directory."""
    out = {
        "target": "catalog",
        "database": "pgovdb",
        "table_name": "ptab",
        "location": f"{tmp_path}/ptab",
        "partition_keys": "p",
    }
    staged_write(
        spark.createDataFrame([(1, "a", "p1"), (2, "b", "p2")], "k int, v string, p string"),
        out,
    )
    assert sorted((r.k, r.p) for r in spark.table("pgovdb.ptab").collect()) == [
        (1, "p1"), (2, "p2"),
    ]
    staged_write(
        spark.createDataFrame([(3, "c", "p1"), (4, "d", "p3")], "k int, v string, p string"),
        out,
    )
    assert sorted((r.k, r.p) for r in spark.table("pgovdb.ptab").collect()) == [
        (3, "p1"), (4, "p3"),
    ]
    parts = [r[0] for r in spark.sql("SHOW PARTITIONS pgovdb.ptab").collect()]
    assert sorted(parts) == ["p=p1", "p=p3"]  # p2 dropped by SYNC
    spark.sql("DROP TABLE pgovdb.ptab")


def test_spark_config_applied_from_yaml(tmp_path, spark):
    """job.spark_config (reference :392-401, list-of-one-entry-dicts) is
    applied to the running session by run_pipeline."""
    (tmp_path / "sc.yaml").write_text(
        """
job:
  type: spark-sql
  spark_config:
    - spark.sql.autoBroadcastJoinThreshold: 12345678
    - spark.sql.cbo.enabled: "true"
variables:
  demo: {}
sql: SELECT 1 AS one
"""
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        out = run_pipeline(spark, tmp_path / "sc.yaml", "demo", write=False)
        assert out.first().one == 1
        assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == "12345678"
        assert spark.conf.get("spark.sql.cbo.enabled") == "true"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.conf.unset("spark.sql.cbo.enabled")


def test_variables_as_python_dict_string(tmp_path, spark):
    """README: a pipeline's variables value may be a Python-dict STRING
    (the reference ast.literal_eval branch)."""
    (tmp_path / "v.yaml").write_text(
        """
job:
  type: spark-sql
variables:
  demo: '{"n": "7"}'
sql: SELECT {n} AS v
"""
    )
    assert run_pipeline(spark, tmp_path / "v.yaml", "demo", write=False).first().v == 7


def test_sink_format_options_glue_names(tmp_path, spark):
    """Glue-style format_options on the OUTPUT table translate to Spark
    writer options (withHeader -> header, separator -> sep)."""
    out = f"{tmp_path}/csv_out"
    write_table(
        spark.createDataFrame([(1, "a")], "k int, v string"),
        {
            "target": "file",
            "location": out,
            "format": "csv",
            "format_options": {"withHeader": True, "separator": "|"},
        },
    )
    files = [f for f in os.listdir(out) if f.endswith(".csv")]
    text = "".join(open(os.path.join(out, f)).read() for f in files)
    assert "k|v" in text.splitlines()
    assert "1|a" in text


def test_jdbc_sink_schema_qualification(tmp_path, spark):
    """README: 'schema' qualifies the JDBC destination table."""
    url = f"jdbc:derby:{tmp_path}/schemadb;create=true"
    opts = {"url": url, "driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    write_table(
        spark.createDataFrame([(1,)], "k int"),
        {
            "target": "jdbc",
            "table_name": "qt",
            "schema": "APP",
            "options": opts,
            "refresh": "full",
        },
    )
    from glue_etl_framework_spark.io.readers import read_table

    df = read_table(
        spark,
        {"name": "qt", "source": "jdbc", "options": {**opts, "dbtable": "APP.qt"}},
    )
    assert df.count() == 1


def test_delete_by_keys_erases_and_survives_crash(tmp_path, spark):
    """GDPR-style keyed erasure: requested keys disappear, everything else
    survives byte-for-byte, and a failing rewrite leaves the table intact."""
    from glue_etl_framework_spark.io.writers import delete_by_keys

    loc = str(tmp_path / "users")
    src = spark.range(100).selectExpr("id AS user_id", "id * 2 AS score")
    src.write.parquet(loc)
    doomed = spark.createDataFrame([(3,), (7,), (99,)], "user_id long")

    n = delete_by_keys(spark, loc, doomed, ["user_id"])
    assert n == 3
    left = spark.read.parquet(loc)
    assert left.count() == 97
    assert left.filter("user_id in (3, 7, 99)").count() == 0

    # crash injection: a plan that fails mid-materialization must leave
    # the current table readable and unchanged
    import pyspark.sql.functions as F
    bad_keys = spark.range(1).select(
        F.assert_true(F.lit(False)).cast("long").alias("user_id")
    )
    try:
        delete_by_keys(spark, loc, bad_keys, ["user_id"])
        raise AssertionError("expected failure")
    except Exception:
        pass
    assert spark.read.parquet(loc).count() == 97


def test_delete_by_keys_table_with_marker_named_column(tmp_path, spark):
    """A table whose own schema contains '__hit' (arbitrary field names are
    in-scope) must not collide with the join marker: the user's column
    survives the delete and the deleted-count is still exact (ADVICE r06)."""
    from glue_etl_framework_spark.io.writers import delete_by_keys

    loc = str(tmp_path / "marked")
    src = spark.range(50).selectExpr(
        "id AS user_id", "id % 2 = 0 AS __hit", "id * 3 AS `__hit_`"
    )
    src.write.parquet(loc)
    doomed = spark.createDataFrame([(1,), (4,)], "user_id long")

    n = delete_by_keys(spark, loc, doomed, ["user_id"])
    assert n == 2
    left = spark.read.parquet(loc)
    assert set(left.columns) == {"user_id", "__hit", "__hit_"}
    assert left.count() == 48
    row = left.filter("user_id = 6").first()
    assert row["__hit"] is True and row["__hit_"] == 18


def test_delete_by_keys_marker_collision_is_case_insensitive(tmp_path, spark):
    """Spark resolves columns case-insensitively by default, so a table
    column '__HIT' collides with marker '__hit' even though the Python
    strings differ — the collision check must compare case-insensitively
    or the post-join marker reference is ambiguous (ADVICE r07)."""
    from glue_etl_framework_spark.io.writers import delete_by_keys

    loc = str(tmp_path / "upper_marked")
    src = spark.range(50).selectExpr(
        "id AS user_id", "id % 2 = 0 AS __HIT", "id * 3 AS `__HIT_`"
    )
    src.write.parquet(loc)
    doomed = spark.createDataFrame([(1,), (4,)], "user_id long")

    n = delete_by_keys(spark, loc, doomed, ["user_id"])
    assert n == 2
    left = spark.read.parquet(loc)
    assert set(left.columns) == {"user_id", "__HIT", "__HIT_"}
    assert left.count() == 48
    row = left.filter("user_id = 6").first()
    assert row["__HIT"] is True and row["__HIT_"] == 18


def test_read_merges_evolving_schema(tmp_path, spark):
    """Schema evolution on file sources: batches written with a column
    added later must read back as one table with nulls for the old rows
    (mergeSchema passthrough via format_options)."""
    from glue_etl_framework_spark.io.readers import read_table

    loc = str(tmp_path / "evolving")
    spark.range(5).selectExpr("id", "id * 2 AS a").write.parquet(loc)
    spark.range(5, 10).selectExpr("id", "id * 2 AS a", "id * 3 AS b") \
        .write.mode("append").parquet(loc)
    df = read_table(spark, {
        "name": "evolving", "source": "file", "location": loc,
        "format": "parquet", "format_options": {"mergeSchema": "true"},
    })
    assert set(df.columns) == {"id", "a", "b"}
    assert df.count() == 10
    assert df.filter("b IS NULL").count() == 5


def test_cli_module_entry_runs_job(tmp_path):
    """`python -m glue_etl_framework_spark --pipeline ... --config-file ...`
    is the spark-submit analogue of the reference's argv entry point
    (glue_etl_framework.py:361-438: getResolvedOptions JOB_NAME/pipeline/
    config_file/variables). One real subprocess: fresh JVM, writes the
    output table, exit code 0, output readable and correct."""
    import subprocess
    import sys

    cfg = write_config(tmp_path)
    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "glue_etl_framework_spark",
            "--pipeline",
            "demo",
            "--config_file",  # Glue's spelling; --config-file also accepted
            str(cfg),
            "--variables",
            '{"sf": "sf0.001"}',
            "--JOB_NAME",
            "cli-e2e",
            "--master",
            "local[2]",
            "--conf",
            "spark.driver.memory=2g",
            "--conf",
            "spark.sql.shuffle.partitions=4",
        ],
        cwd="/root/repo",
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    # read back with pandas/pyarrow — no need for a second JVM
    import pandas as pd

    out = pd.read_parquet(f"{tmp_path}/out")
    assert len(out) == 5
    assert set(out.columns) >= {"revenue_cents", "n"}
    parts = [d for d in os.listdir(f"{tmp_path}/out") if d.startswith("r_name=")]
    assert len(parts) == 5


def test_cli_bad_usage_fails_fast(tmp_path):
    """Arg validation errors exit non-zero with a message on stderr and
    never start a JVM (mirrors the reference's sys.exit(message) paths)."""
    import subprocess
    import sys

    base = [sys.executable, "-m", "glue_etl_framework_spark"]
    # missing required args -> argparse exit 2
    proc = subprocess.run(base, cwd="/root/repo", capture_output=True, text=True, timeout=60)
    assert proc.returncode == 2
    # malformed --variables -> our exit 1, before any Spark work
    proc = subprocess.run(
        base
        + ["--pipeline", "p", "--config-file", "x.yaml", "--variables", "not-kv"],
        cwd="/root/repo",
        capture_output=True,
        text=True,
        timeout=60,
    )
    assert proc.returncode == 1
    assert "ERROR" in proc.stderr
    # s3:// config (reference surface, unreachable locally) -> clear error
    proc = subprocess.run(
        base + ["--pipeline", "p", "--config-file", "s3://bucket/cfg.yaml"],
        cwd="/root/repo",
        capture_output=True,
        text=True,
        timeout=60,
    )
    assert proc.returncode == 1
    assert "scheme" in proc.stderr
