"""glue_etl_framework_spark — a PySpark-native analytics/ETL engine.

A from-scratch rebuild of the capabilities of aws-samples/glue-etl-framework
(config-driven ETL: N input tables -> one SQL SELECT -> one output table;
reference: /root/reference/glue/glue_etl_framework.py) re-expressed Spark-first:

- ``session``    — SparkSession builder with config passthrough
                   (maps glue_etl_framework.py:393-401).
- ``io``         — source/sink dispatch (maps glue_etl_framework.py:63-133,
                   190-270) on plain ``spark.read`` / ``df.write``.
- ``pipeline``   — YAML config -> temp views -> spark.sql -> sink
                   (maps glue_etl_framework.py:135-187).
- ``transforms`` — DataFrame verbs equivalent to the GlueTransforms star-import
                   surface (glue_etl_framework.py:2).
- ``queries``    — named, oracle-checked query builders covering SURVEY.md §2.
- ``ext``        — dedup / similarity / text-analysis / multimodal operators
                   designed for 100 TB scale.
- ``streaming``  — Structured Streaming surface (incremental ingest replaces
                   Glue job bookmarks, glue_etl_framework.py:101).

Everything composes stock DataFrames so Catalyst performs all optimization.
"""

__version__ = "0.1.0"

from glue_etl_framework_spark.session import get_spark  # noqa: F401
