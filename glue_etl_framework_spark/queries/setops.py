"""Set operations (SURVEY.md §2.7): UNION [ALL], INTERSECT [ALL],
EXCEPT [ALL]. IMPLICIT-SQL in the reference (glue_etl_framework.py:60)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from glue_etl_framework_spark.queries import register, t


def _cust_nations(spark, sf_dir):
    return t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))


def _supp_nations(spark, sf_dir):
    return t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))


@register(
    "union_all",
    oracle="""
    SELECT nationkey, CAST(COUNT(*) AS BIGINT) AS n FROM (
      SELECT c_nationkey AS nationkey FROM customer
      UNION ALL
      SELECT s_nationkey AS nationkey FROM supplier
    ) u GROUP BY nationkey
    """,
    category="setop",
)
def union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    u = _cust_nations(spark, sf_dir).union(_supp_nations(spark, sf_dir))
    return u.groupBy("nationkey").agg(F.count("*").alias("n"))


@register(
    "union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    category="setop",
)
def union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cust_nations(spark, sf_dir).union(_supp_nations(spark, sf_dir)).distinct()


@register(
    "intersect_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    category="setop",
)
def intersect_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cust_nations(spark, sf_dir).intersect(_supp_nations(spark, sf_dir))


@register(
    "except_distinct",
    oracle="""
    SELECT DISTINCT p_size AS v FROM part
    EXCEPT
    SELECT DISTINCT l_linenumber AS v FROM lineitem
    """,
    category="setop",
)
def except_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part sizes that never appear as a line number (guaranteed non-empty:
    sizes span 1-50, line numbers 1-7)."""
    sizes = t(spark, sf_dir, "part").select(F.col("p_size").alias("v")).distinct()
    linenos = t(spark, sf_dir, "lineitem").select(F.col("l_linenumber").alias("v")).distinct()
    return sizes.subtract(linenos)


@register(
    "intersect_all",
    oracle="""
    SELECT nationkey, CAST(COUNT(*) AS BIGINT) AS n FROM (
      SELECT c_nationkey AS nationkey FROM customer
      INTERSECT ALL
      SELECT s_nationkey AS nationkey FROM supplier
    ) u GROUP BY nationkey
    """,
    category="setop",
)
def intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    u = _cust_nations(spark, sf_dir).intersectAll(_supp_nations(spark, sf_dir))
    return u.groupBy("nationkey").agg(F.count("*").alias("n"))


@register(
    "except_all",
    oracle="""
    SELECT nationkey, CAST(COUNT(*) AS BIGINT) AS n FROM (
      SELECT c_nationkey AS nationkey FROM customer
      EXCEPT ALL
      SELECT s_nationkey AS nationkey FROM supplier
    ) u GROUP BY nationkey
    """,
    category="setop",
)
def except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    u = _cust_nations(spark, sf_dir).exceptAll(_supp_nations(spark, sf_dir))
    return u.groupBy("nationkey").agg(F.count("*").alias("n"))


@register(
    "union_by_name",
    oracle="""
    SELECT k AS key, CAST(COUNT(*) AS BIGINT) AS n FROM (
      SELECT n_nationkey AS k FROM nation
      UNION ALL
      SELECT r_regionkey AS k FROM region
    ) u GROUP BY k
    """,
    category="setop",
)
def union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName with mismatched column order — the by-name variant the
    GlueTransform Union maps to (SURVEY §2.10)."""
    a = t(spark, sf_dir, "nation").select(F.col("n_nationkey").alias("k"), F.lit("n").alias("src"))
    b = t(spark, sf_dir, "region").select(F.lit("r").alias("src"), F.col("r_regionkey").alias("k"))
    return (
        a.unionByName(b)
        .groupBy(F.col("k").alias("key"))
        .agg(F.count("*").alias("n"))
        .select(F.col("key"), F.col("n"))
    )
