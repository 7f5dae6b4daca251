"""Pipeline execution: config -> views -> SQL -> sink.

Maps the reference's two job types (/root/reference/glue/glue_etl_framework.py):

- ``spark-sql`` (reference ``run_spark_sql_job``, :135-276): read every
  ``input_tables`` entry, register temp views, run the single SELECT
  (:57-61), write ``output_table``.
- ``python-script`` (reference ``run_python_job``, :279-309): execute a user
  Python file inside the live session with ``spark``/``config``/variables in
  scope. The reference ``exec()``s raw S3 bytes (:305); we run a local file
  via ``runpy`` with an explicit namespace — same trusted-code contract,
  fenced and documented.

The SQL is the engine's whole relational surface (as in the reference,
README.md:11): Catalyst plans and optimizes it; this layer adds no operators.
"""

from __future__ import annotations

import runpy
from pathlib import Path
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from glue_etl_framework_spark.io.readers import register_views
from glue_etl_framework_spark.io.writers import write_table
from glue_etl_framework_spark.pipeline.config import (
    interpolate,
    load_config,
    pipeline_variables,
    resolve_sql_text,
)


def run_sql_job(
    spark: SparkSession,
    config: dict[str, Any],
    variables: dict[str, str],
    base_dir: str | Path | None = None,
    write: bool = True,
) -> DataFrame:
    """The spark-sql job body (reference :135-276). Returns the result
    DataFrame; writes the output table unless ``write=False`` (useful for
    dry runs / tests)."""
    tables = interpolate(config.get("input_tables") or [], variables)
    register_views(spark, tables)
    sql = resolve_sql_text(config, variables, base_dir)
    _logger(config, variables).info("SQL Statement : %s", sql)
    result = spark.sql(sql)
    output = interpolate(config.get("output_table") or {}, variables)
    if write and output:
        write_table(result, output)
    return result


def run_python_job(
    spark: SparkSession,
    config: dict[str, Any],
    variables: dict[str, str],
    base_dir: str | Path | None = None,
) -> dict[str, Any]:
    """The python-script job body (reference :279-309). TRUSTED CODE ONLY:
    the script runs with full session access, exactly like the reference's
    ``exec`` of fetched bytes (:305) — do not point this at untrusted files."""
    python_file = interpolate(str(config.get("python_file", "")), variables)
    if not python_file:
        raise ValueError("python-script job needs 'python_file'")
    path = Path(python_file)
    if base_dir is not None and not path.is_absolute():
        path = Path(base_dir) / path
    init_globals = {
        "spark": spark,
        "sc": spark.sparkContext,
        "config": config,
        "variables": variables,
    }
    return runpy.run_path(str(path), init_globals=init_globals)


def _logger(config: dict[str, Any], variables: dict[str, str]):
    """Job-bound structured logger (reference log.configure(extra=...),
    :369-370/:420-425: pipeline, job type, output table)."""
    from glue_etl_framework_spark.joblog import get_job_logger

    job = config.get("job") or {}
    output = (config.get("output_table") or {}).get("name") or (
        config.get("output_table") or {}
    ).get("table_name")
    return get_job_logger(
        pipeline=variables.get("pipeline", ""),
        type=str(job.get("type", "spark-sql")),
        output=str(output or ""),
    )


def apply_spark_config(spark: SparkSession, config: dict[str, Any]) -> None:
    """Apply ``job.spark_config`` (reference :392-401: a list of one-entry
    dicts set on SparkConf; a plain mapping is also accepted here) to the
    RUNNING session. Runtime-settable confs (spark.sql.*) take effect
    immediately; context-creation confs (executor sizing, jars) cannot be
    changed on a live JVM — pass those to ``get_spark(extra_conf=...)``
    instead, which is this engine's context-creation path."""
    job = config.get("job") or {}
    # README spells the key "spark-config"; the reference code reads
    # "spark_config" (:393) — accept both.
    entries = job.get("spark_config") or job.get("spark-config")
    if not entries:
        return
    pairs: list[tuple[str, str]] = []
    if isinstance(entries, dict):
        pairs = [(str(k), str(v)) for k, v in entries.items()]
    else:
        for entry in entries:
            for k, v in dict(entry).items():
                pairs.append((str(k), str(v)))
    for k, v in pairs:
        spark.conf.set(k, v)


def run_pipeline(
    spark: SparkSession,
    config_path: str | Path,
    pipeline: str,
    variable_overrides: dict[str, str] | None = None,
    write: bool = True,
) -> DataFrame | dict[str, Any]:
    """Top-level entry (reference "JOB STARTS HERE", :361-438): load config,
    apply ``job.spark_config`` (:392-401), bind pipeline variables, dispatch
    on ``job.type`` (:427-431)."""
    config = load_config(config_path)
    apply_spark_config(spark, config)
    variables = pipeline_variables(config, pipeline, variable_overrides)
    variables.setdefault("pipeline", pipeline)
    job_type = str((config.get("job") or {}).get("type", "spark-sql")).lower()
    base_dir = Path(config_path).parent
    if job_type == "spark-sql":
        return run_sql_job(spark, config, variables, base_dir, write=write)
    if job_type == "python-script":
        return run_python_job(spark, config, variables, base_dir)
    raise ValueError(f"unknown job type {job_type!r}")
