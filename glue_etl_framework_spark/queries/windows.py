"""Window functions (SURVEY.md §2.5) and sorts/limits/top-k (§2.6).

IMPLICIT-SQL in the reference (glue_etl_framework.py:60). Every ORDER BY
inside a window includes a unique tiebreak key so both engines produce the
same total order (value hashes are compared across engines).

Scale notes: a window = one shuffle on its PARTITION BY keys; top-k-per-group
via row_number is the scalable pattern (no global sort); global ORDER BY +
LIMIT plans as TakeOrderedAndProject (no full sort materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from glue_etl_framework_spark.queries import register, t


@register(
    "window_rank",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
           CAST(RANK()       OVER w AS BIGINT) AS rnk,
           CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    """,
    category="window",
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return t(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal",
        F.row_number().over(w).cast("long").alias("rn"),
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
    )


@register(
    "window_lag_lead",
    oracle="""
    SELECT event_id, user_id, value,
           LAG(value)     OVER w AS prev_value,
           LEAD(value)    OVER w AS next_value,
           LAG(value, 2, -1.0) OVER w AS prev2_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    category="window",
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return t(spark, sf_dir, "events").select(
        "event_id", "user_id", "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.lag("value", 2, -1.0).over(w).alias("prev2_value"),
    )


@register(
    "window_running_sum",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           CAST(SUM(CAST(l_quantity AS BIGINT)) OVER (
                PARTITION BY l_suppkey
                ORDER BY l_shipdate, l_orderkey, l_linenumber
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_qty,
           CAST(COUNT(*) OVER (
                PARTITION BY l_suppkey
                ORDER BY l_shipdate, l_orderkey, l_linenumber
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_n
    FROM lineitem
    """,
    category="window",
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative aggregate with an explicit ROWS frame; quantity summed as
    BIGINT so the running total is exact in both engines."""
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return t(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_orderkey", "l_linenumber",
        F.sum(F.col("l_quantity").cast("long")).over(w).alias("running_qty"),
        F.count("*").over(w).alias("running_n"),
    )


@register(
    "window_range_frame",
    oracle="""
    SELECT o_orderkey, o_custkey, price_cents,
           CAST(COUNT(*) OVER (
                ORDER BY price_cents
                RANGE BETWEEN 100000 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_within_1k
    FROM (SELECT o_orderkey, o_custkey,
                 CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents
          FROM orders) t
    """,
    category="window",
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame with a numeric offset (orders within $1000 below)."""
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_cents"),
    )
    w = W.orderBy("price_cents").rangeBetween(-100000, 0)
    return o.select("o_orderkey", "o_custkey", "price_cents", F.count("*").over(w).alias("n_within_1k"))


@register(
    "window_ntile_dist",
    oracle="""
    SELECT c_custkey,
           CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST() OVER w AS cume
    FROM customer
    WINDOW w AS (ORDER BY c_acctbal, c_custkey)
    """,
    category="window",
)
def window_ntile_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.orderBy("c_acctbal", "c_custkey")
    return t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@register(
    "window_value_funcs",
    oracle="""
    SELECT event_id, user_id,
           FIRST_VALUE(value) OVER w AS first_val,
           LAST_VALUE(value)  OVER w AS last_val,
           NTH_VALUE(value, 2) OVER w AS second_val
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    category="window",
)
def window_value_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return t(spark, sf_dir, "events").select(
        "event_id", "user_id",
        F.first("value").over(w).alias("first_val"),
        F.last("value").over(w).alias("last_val"),
        F.nth_value("value", 2).over(w).alias("second_val"),
    )


@register(
    "topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice
    FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders) t
    WHERE rn <= 3
    """,
    category="window",
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer — the scalable top-k pattern (rank within
    partition; no global sort)."""
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        t(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


@register(
    "orderby_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
    category="sort",
)
def orderby_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans TakeOrderedAndProject — each partition
    keeps 20 rows, driver merges; no full sort at any scale."""
    return (
        t(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
        .select("o_orderkey", "o_totalprice")
    )


@register(
    "sample_hash_deterministic",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) IN ('0', '1')
    """,
    category="sort",
)
def sample_hash_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~12.5% sample via md5 bucketing — reproducible across
    engines and runs, unlike TABLESAMPLE/rand() whose RNGs differ. (Seeded
    df.sample is exposed in the transforms API; tested by pytest.)"""
    o = t(spark, sf_dir, "orders")
    return o.filter(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1).isin("0", "1")
    ).select("o_orderkey", "o_totalprice")


@register(
    "window_pct_change",
    oracle="""
    WITH daily AS (
      SELECT o_orderdate::DATE AS day,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
      FROM orders GROUP BY o_orderdate::DATE
    )
    SELECT strftime(day, '%Y-%m-%d') AS day, rev_cents,
           CAST(round((rev_cents - prev) * 1000000.0 / prev) AS BIGINT) AS pct_change_ppm
    FROM (SELECT day, rev_cents,
                 LAG(rev_cents) OVER (ORDER BY day) AS prev
          FROM daily)
    WHERE prev IS NOT NULL AND prev <> 0
    """,
    category="window",
)
def window_pct_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period change: daily revenue vs the previous day, as
    parts-per-million of the prior value (fixed-point — exact cross-engine).
    The daily rollup reduces the fact table to ~|days| rows FIRST, so the
    single-partition lag window (unavoidable for a global time series) runs
    on trivially small data — the pattern that makes 'global' time-series
    ops safe at 100 TB: aggregate to the time grain, then window."""
    o = t(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev_cents"))
    )
    w = W.orderBy("day")
    with_prev = daily.withColumn("prev", F.lag("rev_cents").over(w))
    pct_ppm = F.round((F.col("rev_cents") - F.col("prev")) * 1000000.0 / F.col("prev")).cast("long")
    return (
        with_prev.filter(F.col("prev").isNotNull() & (F.col("prev") != 0))
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "rev_cents",
            pct_ppm.alias("pct_change_ppm"),
        )
    )
