"""TPC-H-derived decision-support suite, adapted to the fixture schema.

The reference engine's operator surface is "any Spark SQL" through one call
site (/root/reference/glue/glue_etl_framework.py:57-61), so a user of the
reference can run the TPC-H workload verbatim; this module proves the same
capability query-by-query with DuckDB oracle parity. The fixture tables are
TPC-H-shaped but reduced (TESTDATA.md): there is no partsupp table and no
l_commitdate / l_receiptdate / l_shipmode / o_shippriority / c_phone, so
queries needing those are ADAPTED (noted per query) rather than dropped:
the join/agg/subquery SHAPE — what actually exercises the engine — is kept
identical to the official query.

Determinism discipline (package docstring): money aggregates sum integer
cents (exact in any partition order); ratio outputs divide the same two
integer sums in the same order on both engines, so doubles are
bit-identical. Every aggregate/computed column is aliased identically in
the Spark plan and the oracle SQL.

Scale notes: every query is a declarative single plan — filters reach the
parquet scan, fixed-size dimensions (region=5, nation=25 rows) carry an explicit
broadcast hint; scale-proportional tables (customer/supplier/part grow
with SF) are left UNHINTED so AQE picks broadcast only when the runtime
size allows — a hardcoded hint on an SF-proportional table is an OOM at
the 100 TB design point. Fact-fact joins
shuffle on their join key, aggregates are partial+final. No collects, no
UDFs, no windows without a partition key (the one global aggregate in q15
is a 1-row broadcast, not a global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from glue_etl_framework_spark.queries import register, t

# Shared money helpers (same contract as relational.money): per-row round
# to integer cents, sum as BIGINT -> exact in any order.
def _cents(col):
    return F.round(col * 100).cast("long")


def _ts(s: str):
    return F.to_timestamp(F.lit(s))


@register(
    "tpch_q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) / 100.0 AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o.o_orderdate, l.l_orderkey
    LIMIT 10
    """,
    category="tpch",
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority): unshipped orders of one market segment
    ranked by open revenue. Adaptation: o_shippriority (absent) replaced by
    o_orderpriority. Shape: dim-filtered 3-way join -> grouped sum ->
    global top-k. customer is UNHINTED (SF-proportional; AQE broadcasts it
    at small SF after the segment filter); orders⋈lineitem shuffles on orderkey. The ORDER BY +
    LIMIT is a TakeOrdered (no global sort at scale); ties on revenue are
    broken by (o_orderdate, l_orderkey) so the LIMIT boundary is
    deterministic — revenue is an exact cents sum on both engines."""
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < _ts("1998-03-15"))
    l = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > _ts("1998-03-15"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg((F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))) / 100.0).alias("revenue"))
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@register(
    "tpch_q4_order_priority",
    oracle="""
    SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '2000-01-01' AND o.o_orderdate < TIMESTAMP '2000-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
      )
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
    category="tpch",
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order priority checking): orders in a quarter with at
    least one late line. Adaptation: l_commitdate < l_receiptdate (absent)
    becomes "shipped > 30 days after order date" — same correlated-EXISTS
    shape. Spark plans the EXISTS as a left-semi hash join on orderkey
    (date-window filter pushed to the orders scan first, so the semi join
    probes only the quarter's orders)."""
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("2000-01-01")) & (F.col("o_orderdate") < _ts("2000-04-01"))
    )
    l = t(spark, sf_dir, "lineitem")
    late = o.join(
        l,
        (o.o_orderkey == l.l_orderkey)
        & (l.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "tpch_q5_local_supplier_volume",
    oracle="""
    SELECT n.n_name,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) / 100.0 AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '2000-01-01' AND o.o_orderdate < TIMESTAMP '2001-01-01'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n.n_name
    """,
    category="tpch",
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume): revenue where customer and
    supplier share a nation inside one region. Verbatim — all needed
    columns exist. Shape: the famous 6-way join with a non-key equality
    (c_nationkey = s_nationkey) folded into the supplier join. lineitem
    shuffles once on orderkey; nation/region hinted broadcast;
    customer/supplier unhinted (AQE-chosen at small SF)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("2000-01-01")) & (F.col("o_orderdate") < _ts("2001-01-01"))
    )
    l = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg((F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))) / 100.0).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


@register(
    "tpch_q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(ROUND(l.l_extendedprice * l.l_discount * 100) AS BIGINT)) AS BIGINT) / 100.0 AS revenue
    FROM lineitem l
    WHERE l.l_shipdate >= TIMESTAMP '2000-01-01' AND l.l_shipdate < TIMESTAMP '2001-01-01'
      AND l.l_discount BETWEEN 0.05 AND 0.07
      AND l.l_quantity < 24
    """,
    category="tpch",
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): pure scan-filter-aggregate,
    verbatim. The canary for predicate pushdown: all three predicates reach
    the parquet scan (shipdate min/max prunes row groups), and the plan is
    a single partial+final agg with no shuffle of row data — the cheapest
    possible shape at 100 TB."""
    l = t(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= _ts("2000-01-01"))
            & (F.col("l_shipdate") < _ts("2001-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg((F.sum(_cents(F.col("l_extendedprice") * F.col("l_discount"))) / 100.0).alias("revenue"))
    )


@register(
    "tpch_q7_volume_shipping",
    oracle="""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) / 100.0 AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    JOIN nation cn ON c.c_nationkey = cn.n_nationkey
    WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
        OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1999-01-01' AND l.l_shipdate < TIMESTAMP '2001-01-01'
    GROUP BY sn.n_name, cn.n_name, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    category="tpch",
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): bilateral trade volume between two
    nations by year. Verbatim modulo synthetic nation names. Shape: double
    role-playing dimension (nation joined twice under different aliases)
    plus a disjunctive cross-nation predicate that Catalyst keeps above the
    joins; both nation copies broadcast; customer/supplier unhinted (AQE)."""
    s = t(spark, sf_dir, "supplier")
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1999-01-01")) & (F.col("l_shipdate") < _ts("2001-01-01"))
    )
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    sn = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(sn), s.s_nationkey == F.col("sn_key"))
        .join(F.broadcast(cn), c.c_nationkey == F.col("cn_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year"))
        .agg((F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))) / 100.0).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "tpch_q8_market_share",
    oracle="""
    SELECT l_year,
           (100.0 * SUM(CASE WHEN supp_nation = 'NATION_3' THEN vol_cents ELSE 0 END))
             / SUM(vol_cents) AS mkt_share_pct
    FROM (
      SELECT CAST(year(o.o_orderdate) AS BIGINT) AS l_year,
             sn.n_name AS supp_nation,
             CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT) AS vol_cents
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation cn ON c.c_nationkey = cn.n_nationkey
      JOIN region r ON cn.n_regionkey = r.r_regionkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation sn ON s.s_nationkey = sn.n_nationkey
      WHERE r.r_name = 'AMERICA'
        AND p.p_type = 'ECONOMY'
        AND o.o_orderdate >= TIMESTAMP '1999-01-01' AND o.o_orderdate < TIMESTAMP '2001-01-01'
    ) nations
    GROUP BY l_year
    ORDER BY l_year
    """,
    category="tpch",
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): one nation's share of regional
    order volume for one part type, by year. Adaptation: p_type is a
    single-word category here ('ECONOMY' instead of 'ECONOMY ANODIZED
    STEEL'); shape — 8-way join, conditional share aggregate — unchanged.
    The share divides two exact integer-cents sums, so the double is
    bit-identical across engines. nation/region hinted, SF-proportional
    dims AQE-chosen; lineitem shuffles
    once on orderkey."""
    p = t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1999-01-01")) & (F.col("o_orderdate") < _ts("2001-01-01"))
    )
    c = t(spark, sf_dir, "customer")
    cn = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    s = t(spark, sf_dir, "supplier")
    sn = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    vol = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(p, l.l_partkey == p.p_partkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), c.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_region") == r.r_regionkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), s.s_nationkey == F.col("sn_key"))
        .select(
            F.year("o_orderdate").cast("long").alias("l_year"),
            "supp_nation",
            _cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("vol_cents"),
        )
    )
    return (
        vol.groupBy("l_year")
        .agg(
            (
                100.0
                * F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("vol_cents")).otherwise(F.lit(0)))
                / F.sum("vol_cents")
            ).alias("mkt_share_pct")
        )
        .orderBy("l_year")
    )


@register(
    "tpch_q9_product_profit",
    oracle="""
    SELECT sn.n_name AS nation, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)
                  - CAST(ROUND(p.p_retailprice * l.l_quantity * 10) AS BIGINT)) AS BIGINT) / 100.0 AS profit
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%gear%'
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    category="tpch",
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product type profit): profit by supplier nation and year
    for parts matching a name pattern. Adaptation: ps_supplycost (no
    partsupp table) is proxied as 10% of p_retailprice, so profit =
    revenue - 0.1*retail*qty; the join/agg shape (part name LIKE filter,
    4 dims onto lineitem, two-key group) is Q9's. Both terms are rounded
    to cents per row BEFORE the sum, keeping the total exact in any
    order."""
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    l = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    sn = t(spark, sf_dir, "nation")
    o = t(spark, sf_dir, "orders")
    profit_cents = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))) - F.round(
        F.col("p_retailprice") * F.col("l_quantity") * 10
    ).cast("long")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(p, l.l_partkey == p.p_partkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), s.s_nationkey == sn.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").cast("long").alias("o_year"))
        .agg((F.sum(profit_cents) / 100.0).alias("profit"))
        .orderBy("nation", F.desc("o_year"))
    )


@register(
    "tpch_q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) / 100.0 AS revenue,
           c.c_acctbal, n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '2000-07-01' AND o.o_orderdate < TIMESTAMP '2000-10-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
    category="tpch",
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned item reporting): top 20 customers by lost
    revenue on returned lines in a quarter. Verbatim minus the absent
    c_address/c_phone/c_comment output columns. The returnflag filter
    pushes to the lineitem scan (drops ~2/3 of the fact table before the
    join); top-k is a TakeOrdered with c_custkey tiebreak."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("2000-07-01")) & (F.col("o_orderdate") < _ts("2000-10-01"))
    )
    l = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = t(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg((F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))) / 100.0).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
    )


@register(
    "tpch_q12_late_shipments",
    oracle="""
    SELECT CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'high' ELSE 'low' END AS priority_class,
           CAST(SUM(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY THEN 1 ELSE 0 END) AS BIGINT) AS late_count,
           CAST(SUM(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY THEN 0 ELSE 1 END) AS BIGINT) AS ontime_count
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '2000-01-01' AND l.l_shipdate < TIMESTAMP '2001-01-01'
    GROUP BY priority_class
    ORDER BY priority_class
    """,
    category="tpch",
)
def tpch_q12_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipping modes and order priority): conditional counts of
    high/low-priority orders per shipping bucket. Adaptation: l_shipmode
    and commit/receipt dates are absent, so the bucket is late-vs-ontime
    (shipped >60 days after order) and the conditional counts split by the
    same priority classes Q12 uses. Shape — join + CASE-conditional
    aggregate — unchanged."""
    o = t(spark, sf_dir, "orders")
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("2000-01-01")) & (F.col("l_shipdate") < _ts("2001-01-01"))
    )
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(
            F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "high")
            .otherwise("low")
            .alias("priority_class")
        )
        .agg(
            F.sum(F.when(late, 1).otherwise(0)).alias("late_count"),
            F.sum(F.when(late, 0).otherwise(1)).alias("ontime_count"),
        )
        .orderBy("priority_class")
    )


@register(
    "tpch_q13_customer_distribution",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '5-LOW'
      GROUP BY c.c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    category="tpch",
)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer distribution): histogram of per-customer order
    counts, zero-order customers included via the outer join. Adaptation:
    the o_comment NOT LIKE exclusion (no comment column) becomes an
    o_orderpriority exclusion — same join-condition-with-filter shape.
    Two-level aggregate: first keyed by customer (shuffle on custkey),
    then a tiny histogram regroup."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "5-LOW")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "tpch_q14_promo_revenue",
    oracle="""
    SELECT (100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                             THEN CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)
                             ELSE 0 END))
           / SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS promo_revenue_pct
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '2000-09-01' AND l.l_shipdate < TIMESTAMP '2000-10-01'
    """,
    category="tpch",
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): percentage of one month's revenue from
    promo parts. Adaptation: p_type LIKE 'PROMO%' becomes equality on the
    single-word category. The ratio divides two exact cents sums in the
    same order on both engines -> bit-identical double. part unhinted (AQE);
    the month filter prunes lineitem at the scan."""
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("2000-09-01")) & (F.col("l_shipdate") < _ts("2000-10-01"))
    )
    p = t(spark, sf_dir, "part")
    rev = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .agg(
            (
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0)))
                / F.sum(rev)
            ).alias("promo_revenue_pct")
        )
    )


@register(
    "tpch_q15_top_supplier",
    oracle="""
    WITH revenue0 AS (
      SELECT l.l_suppkey AS supplier_no,
             CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) AS total_cents
      FROM lineitem l
      WHERE l.l_shipdate >= TIMESTAMP '2000-01-01' AND l.l_shipdate < TIMESTAMP '2000-04-01'
      GROUP BY l.l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_cents / 100.0 AS total_revenue
    FROM supplier s
    JOIN revenue0 r ON s.s_suppkey = r.supplier_no
    WHERE r.total_cents = (SELECT MAX(total_cents) FROM revenue0)
    ORDER BY s.s_suppkey
    """,
    category="tpch",
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): supplier(s) with the maximum quarterly
    revenue, via a scalar-subquery max over a derived view. The max is an
    exact integer (cents), so the equality — and therefore the result set
    when several suppliers tie — is deterministic on both engines. Spark
    shape: one shuffle for the per-supplier agg; the 1-row max is a
    broadcast-joined scalar (no global sort, no second full shuffle)."""
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("2000-01-01")) & (F.col("l_shipdate") < _ts("2000-04-01"))
    )
    s = t(spark, sf_dir, "supplier")
    rev = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("total_cents")
    )
    top = rev.agg(F.max("total_cents").alias("max_cents"))
    return (
        rev.join(F.broadcast(top), rev.total_cents == top.max_cents)
        .join(s, rev.supplier_no == s.s_suppkey)
        .select("s_suppkey", "s_name", (F.col("total_cents") / 100.0).alias("total_revenue"))
        .orderBy("s_suppkey")
    )


@register(
    "tpch_q17_small_quantity_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) / 100.0 / 7.0 AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN (
      SELECT l_partkey, 0.2 * AVG(l_quantity) AS qty_threshold
      FROM lineitem GROUP BY l_partkey
    ) pa ON pa.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#4'
      AND l.l_quantity < pa.qty_threshold
    """,
    category="tpch",
)
def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): revenue from lines whose
    quantity is below 20% of the part's average, for one brand. The
    correlated scalar subquery is decorrelated into a per-part aggregate
    joined back — the shape Catalyst itself produces for the correlated
    form. l_quantity is integer-valued, so AVG = exact-sum/count is
    bit-identical in any order and the 0.2* threshold comparison is
    deterministic. Adaptation: no p_container column, so only the brand
    filter; the per-part average intentionally spans ALL lineitem (as in
    the official query) — at scale it reuses the same orderkey-free
    shuffle key (partkey) as the probe join."""
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#4")
    pa = l.groupBy(F.col("l_partkey").alias("pa_partkey")).agg(
        (0.2 * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(pa, l.l_partkey == F.col("pa_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg((F.sum(_cents(F.col("l_extendedprice"))) / 100.0 / 7.0).alias("avg_yearly"))
    )


@register(
    "tpch_q18_large_volume_customer",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           SUM(l.l_quantity) AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 150
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderdate, o.o_orderkey
    LIMIT 20
    """,
    category="tpch",
)
def tpch_q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large volume customer): orders whose total quantity
    exceeds a threshold (150 here — the fixture has ~4 lines/order vs
    TPC-H's 7, so 300 would select nothing), with customer context, top 20
    by order value. The IN-subquery is a self-aggregation of the fact
    table -> left-semi join on orderkey; both aggregates shuffle on the
    SAME key (orderkey), so AQE plans the semi join without a second
    exchange of the big side. l_quantity sums are integer-valued doubles —
    exact in any order."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    l = t(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 150)
        .select("l_orderkey")
    )
    return (
        l.join(big.withColumnRenamed("l_orderkey", "big_orderkey"),
               l.l_orderkey == F.col("big_orderkey"), "left_semi")
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderdate", "o_orderkey")
        .limit(20)
    )


@register(
    "tpch_q19_discounted_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) / 100.0 AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#4' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#9' AND p.p_size BETWEEN 1 AND 25 AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#19' AND p.p_size BETWEEN 1 AND 35 AND l.l_quantity BETWEEN 20 AND 30)
    """,
    category="tpch",
)
def tpch_q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue): disjunction of three brand/size/
    quantity envelopes over a part join. Adaptation: no p_container or
    l_shipmode/l_shipinstruct columns, so those conjuncts are dropped; the
    structure Catalyst must handle — an OR across both join sides that
    cannot be pushed below the join as-is — is intact (the common
    p_partkey equi-condition still drives a hash join; the disjunction is
    the residual filter)."""
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#4") & F.col("p_size").between(1, 15) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#9") & F.col("p_size").between(1, 25) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#19") & F.col("p_size").between(1, 35) & q.between(20, 30))
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .filter(cond)
        .agg((F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))) / 100.0).alias("revenue"))
    )


@register(
    "tpch_q22_global_sales_opportunity",
    oracle="""
    WITH pos AS (
      SELECT AVG(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS avg_cents
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(ROUND(c.c_acctbal * 100) AS BIGINT)) AS BIGINT) / 100.0 AS totacctbal
    FROM customer c, pos
    WHERE CAST(ROUND(c.c_acctbal * 100) AS BIGINT) > pos.avg_cents
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-06-01')
    GROUP BY c.c_nationkey
    ORDER BY c.c_nationkey
    """,
    category="tpch",
)
def tpch_q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity): customers with
    above-average positive balance and NO orders, grouped by geography.
    Adaptation: the c_phone country-code substring (absent) becomes
    c_nationkey, and "no orders at all" becomes "no orders since
    2000-06-01" (every fixture customer has some order; the official
    query's 'inactive customer' intent needs a recency window here).
    The balance threshold is computed in integer cents
    (AVG of exact longs -> same double both engines), the anti-join is a
    left-anti hash join on custkey, and totacctbal sums cents -> exact.
    Shape — scalar subquery + NOT EXISTS anti-join + group — is Q22's."""
    c = t(spark, sf_dir, "customer").withColumn("bal_cents", _cents(F.col("c_acctbal")))
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= _ts("2000-06-01"))
    avg_pos = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(F.avg("bal_cents").alias("avg_cents"))
    )
    return (
        c.join(F.broadcast(avg_pos), F.col("bal_cents") > F.col("avg_cents"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            (F.sum("bal_cents") / 100.0).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


@register(
    "tpch_q16_supplier_part_counts",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#4'
      AND p.p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
    category="tpch",
)
def tpch_q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship): how many suppliers can
    furnish each surviving (brand, type, size) combination. Adaptation:
    partsupp (absent) is replaced by the observed lineitem supplier-part
    pairs, and the 'customer complaints' supplier exclusion becomes a
    negative-balance exclusion — preserving the NOT IN anti-subquery
    shape. One shuffle keyed on the group for the distinct-count; the
    excluded-supplier set is an anti-join (AQE-chosen build side)."""
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#4")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    bad = t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        l.join(bad, l.l_suppkey == bad.s_suppkey, "left_anti")
        .join(p, l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@register(
    "tpch_q21_suppliers_who_kept_waiting",
    oracle="""
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
    category="tpch",
)
def tpch_q21_suppliers_who_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting): the SOLE late
    supplier in multi-supplier finalized orders. Adaptation: 'late' is
    shipped >60 days after order date (no commit/receipt dates). The
    EXISTS / NOT-EXISTS pair decorrelates into ONE per-order aggregate —
    distinct suppliers and distinct LATE suppliers — joined back to the
    late lines (qualifying iff s_all >= 2 and s_late = 1): two correlated
    subqueries collapse into a single orderkey-keyed shuffle that AQE
    co-locates with the probe join, instead of two more passes over
    lineitem."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    base = l.join(o, l.l_orderkey == o.o_orderkey).withColumn(
        "late", F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    stats = base.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("s_all"),
        F.countDistinct(F.when(F.col("late"), F.col("l_suppkey"))).alias("s_late"),
    )
    qual = (
        base.filter(F.col("late"))
        .join(stats.withColumnRenamed("l_orderkey", "so_key"),
              F.col("l_orderkey") == F.col("so_key"))
        .filter((F.col("s_all") >= 2) & (F.col("s_late") == 1))
    )
    return (
        qual.join(s, qual.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


@register(
    "tpch_q1_pricing_summary",
    oracle="""
    SELECT l.l_returnflag, l.l_linestatus,
           SUM(l.l_quantity) AS sum_qty,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_base_price,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_disc_price,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * (1 + l.l_tax) * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_charge,
           SUM(l.l_quantity) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 / COUNT(*) AS avg_price,
           CAST(SUM(CAST(ROUND(l.l_discount * 100) AS BIGINT)) AS DOUBLE) / 100.0 / COUNT(*) AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem l
    WHERE l.l_shipdate <= TIMESTAMP '2001-08-06'
    GROUP BY l.l_returnflag, l.l_linestatus
    ORDER BY l.l_returnflag, l.l_linestatus
    """,
    category="tpch",
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 (pricing summary report) with the FULL official column set
    (agg_pricing_summary carries a reduced one): eight aggregates over two
    grouping columns, shipdate cutoff 90 days before the data's end. The
    canonical scan-heavy aggregate: one shuffle of 6 partial aggregates
    per (returnflag, linestatus) — whole-stage codegen end to end. Money
    and discount averages divide exact integer-cents sums by the count in
    the same order on both engines; quantity is integer-valued so its
    double sum is exact in any order."""
    l = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= _ts("2001-08-06"))
    base_c = F.sum(_cents(F.col("l_extendedprice")))
    return (
        l.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            (base_c / 100.0).alias("sum_base_price"),
            (F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))) / 100.0).alias("sum_disc_price"),
            (F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")))) / 100.0).alias("sum_charge"),
            (F.sum("l_quantity") / F.count("*")).alias("avg_qty"),
            (base_c.cast("double") / 100.0 / F.count("*")).alias("avg_price"),
            (F.sum(_cents(F.col("l_discount"))).cast("double") / 100.0 / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "tpch_q2_min_cost_supplier",
    oracle="""
    WITH cost AS (
      SELECT l_partkey, l_suppkey,
             MIN(CAST(ROUND(l_extendedprice / l_quantity * 100) AS BIGINT)) AS unit_cost_cents
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    eligible AS (
      SELECT c.l_partkey, c.l_suppkey, c.unit_cost_cents
      FROM cost c
      JOIN supplier s ON s.s_suppkey = c.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'
    ),
    best AS (
      SELECT l_partkey, MIN(unit_cost_cents) AS best_cents FROM eligible GROUP BY l_partkey
    )
    SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_type,
           e.unit_cost_cents / 100.0 AS unit_cost
    FROM eligible e
    JOIN best b ON e.l_partkey = b.l_partkey AND e.unit_cost_cents = b.best_cents
    JOIN part p ON p.p_partkey = e.l_partkey
    JOIN supplier s ON s.s_suppkey = e.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_size = 15 AND p.p_type = 'STANDARD'
    ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
    LIMIT 100
    """,
    category="tpch",
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum cost supplier): for each part of one size/type,
    the European supplier(s) offering it cheapest. Adaptation: partsupp's
    ps_supplycost (absent) becomes the supplier's best observed unit price
    from lineitem, as a per-row fixed-point MIN (order-independent, unlike
    an average of ratios). The correlated MIN subquery decorrelates into a
    per-part aggregate joined back on (part, cost) — the same plan
    Catalyst produces for the official correlated form. Region/nation/
    supplier/part unhinted (AQE-chosen); the two aggregates share the
    partkey key."""
    l = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = t(spark, sf_dir, "part").filter((F.col("p_size") == 15) & (F.col("p_type") == "STANDARD"))
    # fresh reads for the output-side joins: supplier/nation already feed
    # the eligibility chain, and Spark's ambiguous-self-join check (rightly)
    # rejects reusing those exact DataFrames downstream.
    s2 = t(spark, sf_dir, "supplier")
    n2 = t(spark, sf_dir, "nation")
    cost = l.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.round(F.col("l_extendedprice") / F.col("l_quantity") * 100).cast("long")).alias("unit_cost_cents")
    )
    eligible = (
        cost.join(s, cost.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("l_partkey", "l_suppkey", "unit_cost_cents")
    )
    best = eligible.groupBy(F.col("l_partkey").alias("b_partkey")).agg(
        F.min("unit_cost_cents").alias("best_cents")
    )
    return (
        eligible.join(
            best,
            (eligible.l_partkey == F.col("b_partkey"))
            & (eligible.unit_cost_cents == F.col("best_cents")),
        )
        .join(p, eligible.l_partkey == p.p_partkey)
        .join(s2, eligible.l_suppkey == s2.s_suppkey)
        .join(F.broadcast(n2), s2.s_nationkey == n2.n_nationkey)
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_type",
            (F.col("unit_cost_cents") / 100.0).alias("unit_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "tpch_q11_important_stock",
    oracle="""
    WITH natval AS (
      SELECT l.l_partkey,
             CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS value_cents
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_5'
      GROUP BY l.l_partkey
    ),
    tot AS (SELECT CAST(SUM(value_cents) AS BIGINT) AS t FROM natval)
    SELECT nv.l_partkey AS p_partkey, nv.value_cents / 100.0 AS part_value
    FROM natval nv CROSS JOIN tot
    WHERE nv.value_cents > 1.0e-3 * tot.t  -- e-notation: DOUBLE in DuckDB, matching Spark's double literal
    ORDER BY nv.value_cents DESC, nv.l_partkey
    """,
    category="tpch",
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock identification): parts representing a
    significant share of one nation's total traded value. Adaptation:
    ps_supplycost * ps_availqty (no partsupp) becomes the nation's summed
    lineitem value per part — the HAVING-over-scalar-subquery shape is
    intact. The threshold scalar derives from the SAME per-part aggregate
    (no second fact scan), broadcast as a 1-row cross join; comparison is
    exact integer cents against a double threshold computed identically
    on both engines."""
    l = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    natval = (
        l.join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("l_partkey")
        .agg(F.sum(_cents(F.col("l_extendedprice"))).alias("value_cents"))
    )
    tot = natval.agg(F.sum("value_cents").alias("t"))
    return (
        natval.crossJoin(F.broadcast(tot))
        .filter(F.col("value_cents") > 0.001 * F.col("t"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            (F.col("value_cents") / 100.0).alias("part_value"),
        )
        .orderBy(F.desc((F.col("part_value"))), "p_partkey")
    )


@register(
    "tpch_q20_potential_promotion",
    oracle="""
    WITH shipped AS (
      SELECT l.l_suppkey, l.l_partkey,
             SUM(l.l_quantity) AS qty_all,
             SUM(CASE WHEN l.l_shipdate >= TIMESTAMP '2000-01-01'
                       AND l.l_shipdate < TIMESTAMP '2001-01-01'
                      THEN l.l_quantity ELSE 0 END) AS qty_2000
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_name LIKE '%gear%'
      GROUP BY l.l_suppkey, l.l_partkey
    )
    SELECT DISTINCT s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN shipped sh ON sh.l_suppkey = s.s_suppkey
    WHERE sh.qty_2000 > 0.5 * sh.qty_all
    ORDER BY s.s_name
    """,
    category="tpch",
)
def tpch_q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion): suppliers whose recent-year
    movement of promotable parts dominates their history. Adaptation:
    ps_availqty > 0.5 * shipped-qty (no partsupp) becomes year-2000
    quantity > 50% of all-time quantity per (supplier, part) — one
    conditional aggregate replaces the nested IN(EXISTS(scalar)) chain
    while keeping the semi-join-on-aggregate shape. Quantities are
    integer-valued doubles (exact sums); the part-name filter side is AQE-chosen
    onto the fact scan."""
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    in2000 = (F.col("l_shipdate") >= _ts("2000-01-01")) & (F.col("l_shipdate") < _ts("2001-01-01"))
    shipped = (
        l.join(p, l.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum("l_quantity").alias("qty_all"),
            F.sum(F.when(in2000, F.col("l_quantity")).otherwise(0.0)).alias("qty_2000"),
        )
    )
    return (
        shipped.filter(F.col("qty_2000") > 0.5 * F.col("qty_all"))
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_name", "n_name")
        .distinct()
        .orderBy("s_name")
    )
