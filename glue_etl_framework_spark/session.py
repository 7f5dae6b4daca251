"""SparkSession construction with config passthrough.

Maps the reference's ``job.spark_config`` handling
(/root/reference/glue/glue_etl_framework.py:393-401): a list of one-entry
dicts applied to SparkConf before context creation. Here it is a plain dict
applied via ``SparkSession.builder.config``.

Defaults are chosen for the 100 TB design point (AQE on, skew-join handling,
dynamic partition overwrite for incremental refresh) while remaining correct
on ``local[N]``.
"""

from __future__ import annotations

import os
from collections.abc import Mapping

from pyspark.sql import SparkSession

_DEFAULTS: dict[str, str] = {
    # AQE: runtime shuffle-partition coalescing + skew-join splitting — the
    # primary answer to skew at scale.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for any pandas-UDF path (EXT operators).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Deterministic wall-clock semantics; matches the DuckDB oracle (naive ts).
    "spark.sql.session.timeZone": "UTC",
    # refresh=incremental on partitioned tables: only rewrite touched
    # partitions (UPSERT-by-partition, README.md:68 done honestly).
    "spark.sql.sources.partitionOverwriteMode": "dynamic",
    # Quieter local runs.
    "spark.ui.showConsoleProgress": "false",
}


def default_master() -> str:
    """local[N] from $SPARK_GRAFT_CPUS (driver contract), else local[*]."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    return f"local[{cpus}]" if cpus else "local[*]"


def avro_package() -> str:
    """Maven coordinate of the spark-avro datasource matching this pyspark
    build (the reference reads/writes avro, README.md:44; Spark does not
    bundle the datasource — only avro-core). Scala 2.13 is the only binary
    Spark 4 ships."""
    import pyspark

    return f"org.apache.spark:spark-avro_2.13:{pyspark.__version__}"


def assemble_conf(
    shuffle_partitions: int | None = None,
    extra_conf: Mapping[str, str] | None = None,
    with_avro: bool = False,
) -> dict[str, str]:
    """Final session conf: defaults < avro wiring < extra_conf (user wins)."""
    conf = dict(_DEFAULTS)
    # local-mode Spark defaults to a 1 GiB driver heap; with local[32] all
    # 32 task threads share it and anything past toy scale dies in GC.
    # Size the single-JVM heap for the box (overridable; ignored when a
    # session already exists or on a real cluster where executors own it).
    conf.setdefault(
        "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEMORY", "16g")
    )
    if shuffle_partitions is not None:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if with_avro:
        pkgs = conf.get("spark.jars.packages", "")
        conf["spark.jars.packages"] = f"{pkgs},{avro_package()}" if pkgs else avro_package()
    if extra_conf:
        conf.update({str(k): str(v) for k, v in extra_conf.items()})
    return conf


def get_spark(
    app_name: str = "glue-etl-framework-spark",
    master: str | None = None,
    extra_conf: Mapping[str, str] | None = None,
    shuffle_partitions: int | None = None,
    with_avro: bool = False,
) -> SparkSession:
    """Build (or get) a SparkSession.

    ``extra_conf`` is the user-facing equivalent of the reference's
    ``job.spark_config`` passthrough — arbitrary Spark conf keys, applied
    last so they win over defaults.

    ``with_avro=True`` adds the spark-avro datasource to
    ``spark.jars.packages`` (resolved from Maven at session start — needs
    network or a populated ivy cache). Must be set on the FIRST session of
    the JVM: ``spark.jars.packages`` is a context-creation conf, so
    getOrCreate on an already-running session cannot add it."""
    builder = SparkSession.builder.appName(app_name)
    if master is not None:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_CONNECT_MODE_ENABLED"):
        builder = builder.master(default_master())
    for k, v in assemble_conf(shuffle_partitions, extra_conf, with_avro).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
