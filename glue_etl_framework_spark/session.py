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


def get_spark(
    app_name: str = "glue-etl-framework-spark",
    master: str | None = None,
    extra_conf: Mapping[str, str] | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession.

    ``extra_conf`` is the user-facing equivalent of the reference's
    ``job.spark_config`` passthrough — arbitrary Spark conf keys, applied
    last so they win over defaults.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is not None:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_CONNECT_MODE_ENABLED"):
        builder = builder.master(default_master())
    conf = dict(_DEFAULTS)
    if shuffle_partitions is not None:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update({str(k): str(v) for k, v in extra_conf.items()})
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
