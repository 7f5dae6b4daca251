"""Source dispatch: file / catalog / jdbc -> DataFrame.

Maps the reference's ``create_dynamic_frame``
(/root/reference/glue/glue_etl_framework.py:63-133):

- ``source: file``    — recursive scan of a path in parquet/csv/json/orc/avro
  with per-table ``format_options`` (reference :81-102; ``recurse: True`` :99).
- ``source: catalog`` — session-catalog table ``database.table_name``
  (reference :105-116 reads the Glue Data Catalog).
- ``source: jdbc``    — a real JDBC reader (the reference :119-120 is a
  placeholder that creates nothing).

No DynamicFrame wrapper: the unit of data is ``pyspark.sql.DataFrame`` and
schema-on-read is Spark's reader inference. Glue ``format_options`` names are
translated to Spark reader options (README.md:45).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

SUPPORTED_FORMATS = {"parquet", "csv", "json", "orc", "avro", "xml", "text"}

# Glue format_options name -> Spark reader option name (README.md:45).
_GLUE_OPTION_ALIASES = {
    "withHeader": "header",
    "separator": "sep",
    "quoteChar": "quote",
    "escaper": "escape",
    "multiline": "multiLine",
    "compression": "compression",
}

# Options that only make sense for specific formats; "optimizePerformance"
# is Glue's SIMD csv reader toggle — Spark's vectorized readers are always on.
_IGNORED_OPTIONS = {"optimizePerformance"}


def _translate_options(format_options: dict[str, Any] | None) -> dict[str, str]:
    opts: dict[str, str] = {}
    for key, value in (format_options or {}).items():
        if key in _IGNORED_OPTIONS:
            continue
        spark_key = _GLUE_OPTION_ALIASES.get(key, key)
        if isinstance(value, bool):
            value = "true" if value else "false"
        opts[spark_key] = str(value)
    return opts


def read_table(spark: SparkSession, table: dict[str, Any]) -> DataFrame:
    """Read one config-declared input table.

    ``table`` keys follow the reference's YAML schema (README.md:38-50):
    ``name, source, location | database+table_name | connection options,
    format, format_options``.
    """
    source = str(table.get("source", "file")).lower()
    if source in {"file", "s3"}:
        location = table.get("location")
        if not location:
            raise ValueError(f"table {table.get('name')!r}: 'location' is required for file source")
        fmt = str(table.get("format", "parquet")).lower()
        if fmt not in SUPPORTED_FORMATS:
            raise ValueError(f"unsupported format {fmt!r}; expected one of {sorted(SUPPORTED_FORMATS)}")
        # recursiveFileLookup mirrors Glue's recurse:True default, but it
        # DISABLES hive partition-directory discovery — format_options may
        # override it (e.g. recursiveFileLookup: false to read a
        # partition_keys layout back with its partition columns).
        opts = _translate_options(table.get("format_options"))
        opts.setdefault("recursiveFileLookup", "true")
        reader = spark.read.format(fmt).options(**opts)
        if "schema" in table:
            reader = reader.schema(table["schema"])
        try:
            return reader.load(str(location))
        except Exception as exc:  # noqa: BLE001 - fall back with actionable context
            if fmt == "avro" and "Failed to find data source" in str(exc):
                # The native datasource jar is absent (no Maven access in this
                # environment). Fall back to the pure-Python container codec —
                # distributed binaryFile + mapInPandas decode; file-granular
                # splits instead of block-granular, and format_options/schema
                # overrides don't apply. On a jar-equipped cluster prefer
                # get_spark(with_avro=True) + the native path.
                import logging

                from glue_etl_framework_spark.io.avro_py import read_avro
                from glue_etl_framework_spark.session import avro_package

                logging.getLogger("glue_etl_framework_spark").warning(
                    "spark-avro datasource (%s) not on classpath; reading %s "
                    "with the pure-Python avro codec (io/avro_py.py)",
                    avro_package(),
                    location,
                )
                return read_avro(spark, str(location))
            raise
    if source in {"catalog", "gdc"}:
        database = table.get("database")
        name = table.get("table_name") or table.get("name")
        if not database or not name:
            raise ValueError("catalog source requires 'database' and 'table_name'")
        return spark.table(f"{database}.{name}")
    if source == "jdbc":
        options = dict(table.get("options") or {})
        for key in ("url", "dbtable", "query", "user", "password", "driver"):
            if key in table:
                options.setdefault(key, table[key])
        if "url" not in options or ("dbtable" not in options and "query" not in options):
            raise ValueError("jdbc source requires 'url' and one of 'dbtable'/'query'")
        return spark.read.format("jdbc").options(**{k: str(v) for k, v in options.items()}).load()
    raise ValueError(f"unknown source type {source!r}")


def register_views(spark: SparkSession, tables: list[dict[str, Any]]) -> dict[str, DataFrame]:
    """Read every input table and register it as a temp view under its
    config ``name`` (lowercased, as the reference does at
    glue_etl_framework.py:66 and :58-59). Returns the name -> DataFrame map
    (the reference's ``ds_mapping``, :17)."""
    mapping: dict[str, DataFrame] = {}
    for table in tables:
        name = str(table["name"]).lower()
        df = read_table(spark, table)
        df.createOrReplaceTempView(name)
        mapping[name] = df
    return mapping
