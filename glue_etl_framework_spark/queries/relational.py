"""Scans, projections, filters, joins (SURVEY.md §2.2-§2.3).

All of these are IMPLICIT-SQL capabilities of the reference — reachable
through its single spark.sql call site (glue_etl_framework.py:57-61) — here
exposed as typed DataFrame builders so each operator is individually
oracle-checked.

Scale notes: every builder is a declarative plan — filters/projections push
to the parquet scan; fact-fact joins shuffle on their keys with AQE handling
skew. Broadcast policy (same as queries/tpch.py): explicit F.broadcast only
on FIXED-SIZE frames (nation=25/region=5 rows, 1-row scalars, bounded
sketches) or where the hint IS the operator under test (join_broadcast_hint,
join_range_theta — documented); SF-proportional tables (customer/orders/
part/supplier) stay unhinted so AQE chooses broadcast only while the
runtime size fits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from glue_etl_framework_spark.queries import register, t


def money(col):
    """Order-independent money aggregate: per-row round to integer cents ->
    exact BIGINT sum in any partition/order. Pair with SQL
    SUM(CAST(ROUND(x*100) AS BIGINT))."""
    return F.sum(F.round(col * 100).cast("long"))


# --- flagship: the README Example-1 analogue (reference README.md:136-143) —
# revenue by region: lineitem⋈orders⋈customer⋈nation⋈region + grouped sum.
@register(
    "flagship_revenue_by_region",
    oracle="""
    SELECT r.r_name,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) / 100.0 AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
    category="join",
)
def flagship_revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    customer = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region")
    # Fact joins the order dimension on the shuffle key; fixed-size dims
    # (nation=25, region=5 rows) are hinted broadcast; customer is
    # SF-proportional so it stays UNHINTED — AQE broadcasts it at small SF
    # and falls back to a keyed shuffle when it no longer fits (a forced
    # broadcast of an SF-proportional table is an OOM at 100 TB).
    return (
        lineitem
        .join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            (money(F.col("l_extendedprice") * (1 - F.col("l_discount"))) / 100.0).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "scan_filter_projection",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    category="scan",
)
def scan_filter_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + conjunctive predicates; all four filters and the 4-column
    projection push down to the parquet scan (PushedFilters/ReadSchema)."""
    return (
        t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    )


@register(
    "filter_in_like_between",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment, c_acctbal
    FROM customer
    WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
      AND c_name LIKE 'Customer#00000%'
      AND c_acctbal BETWEEN 0 AND 5000
      AND c_nationkey IS NOT NULL
    """,
    category="filter",
)
def filter_in_like_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "customer")
        .filter(
            F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
            & F.col("c_name").like("Customer#00000%")
            & F.col("c_acctbal").between(0, 5000)
            & F.col("c_nationkey").isNotNull()
        )
        .select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
    )


@register(
    "project_case_cast",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS order_year,
           CASE WHEN o_totalprice >= 300000 THEN 'large'
                WHEN o_totalprice >= 100000 THEN 'medium'
                ELSE 'small' END AS size_class,
           CAST(FLOOR(o_totalprice) AS BIGINT) AS price_floor,
           CAST(ROUND(o_totalprice * 1.1 * 100) AS BIGINT) / 100.0 AS taxed
    FROM orders
    WHERE o_orderstatus <> 'P'
    """,
    category="projection",
)
def project_case_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Computed columns: CASE WHEN, CAST, arithmetic (SURVEY §2.2)."""
    o = t(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderstatus") != "P").select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.when(F.col("o_totalprice") >= 300000, "large")
        .when(F.col("o_totalprice") >= 100000, "medium")
        .otherwise("small")
        .alias("size_class"),
        F.col("o_totalprice").cast("long").alias("price_floor"),
        (F.round(F.col("o_totalprice") * 1.1 * 100).cast("long") / 100.0).alias("taxed"),
    )


@register(
    "distinct_projection",
    oracle="SELECT DISTINCT c_nationkey, c_mktsegment FROM customer",
    category="projection",
)
def distinct_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t(spark, sf_dir, "customer").select("c_nationkey", "c_mktsegment").distinct()


# ---------------------------------------------------------------- joins ----

@register(
    "join_inner_nway",
    oracle="""
    SELECT n.n_name,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           CAST(SUM(CAST(ROUND(s.s_acctbal * 100) AS BIGINT)) AS BIGINT) / 100.0 AS total_bal
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_regionkey < 3
    GROUP BY n.n_name
    """,
    category="join",
)
def join_inner_nway(spark: SparkSession, sf_dir: str) -> DataFrame:
    s, n, r = t(spark, sf_dir, "supplier"), t(spark, sf_dir, "nation"), t(spark, sf_dir, "region")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r.filter(F.col("r_regionkey") < 3)), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_suppliers"),
            (F.sum(F.round(F.col("s_acctbal") * 100).cast("long")) / 100.0).alias("total_bal"),
        )
    )


@register(
    "join_left_outer",
    oracle="""
    SELECT n.n_nationkey, n.n_name, CAST(COUNT(s.s_suppkey) AS BIGINT) AS n_suppliers
    FROM nation n
    LEFT JOIN supplier s ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_nationkey, n.n_name
    """,
    category="join",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    n, s = t(spark, sf_dir, "nation"), t(spark, sf_dir, "supplier")
    return (
        n.join(s, s.s_nationkey == n.n_nationkey, "left")
        .groupBy("n_nationkey", "n_name")
        .agg(F.count("s_suppkey").alias("n_suppliers"))
    )


@register(
    "join_right_outer",
    oracle="""
    SELECT n.n_nationkey, n.n_name, CAST(COUNT(c.c_custkey) AS BIGINT) AS n_customers
    FROM customer c
    RIGHT JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_nationkey, n.n_name
    """,
    category="join",
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c, n = t(spark, sf_dir, "customer"), t(spark, sf_dir, "nation")
    return (
        c.join(n, c.c_nationkey == n.n_nationkey, "right")
        .groupBy("n_nationkey", "n_name")
        .agg(F.count("c_custkey").alias("n_customers"))
    )


@register(
    "join_full_outer",
    oracle="""
    WITH cn AS (SELECT c_nationkey AS k, COUNT(*) AS n_cust FROM customer GROUP BY 1),
         sn AS (SELECT s_nationkey AS k, COUNT(*) AS n_supp FROM supplier GROUP BY 1)
    SELECT COALESCE(cn.k, sn.k) AS nationkey,
           CAST(COALESCE(cn.n_cust, 0) AS BIGINT) AS n_cust,
           CAST(COALESCE(sn.n_supp, 0) AS BIGINT) AS n_supp
    FROM cn FULL OUTER JOIN sn ON cn.k = sn.k
    """,
    category="join",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cn = t(spark, sf_dir, "customer").groupBy(F.col("c_nationkey").alias("k")).agg(F.count("*").alias("n_cust"))
    sn = t(spark, sf_dir, "supplier").groupBy(F.col("s_nationkey").alias("k")).agg(F.count("*").alias("n_supp"))
    return cn.join(sn, "k", "full").select(
        F.col("k").alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


@register(
    "join_left_semi",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49)
    """,
    category="join",
)
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    o, l = t(spark, sf_dir, "orders"), t(spark, sf_dir, "lineitem")
    big = l.filter(F.col("l_quantity") >= 49)
    return o.join(big, o.o_orderkey == big.l_orderkey, "left_semi").select("o_orderkey", "o_totalprice")


@register(
    "join_left_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
    category="join",
)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no large order (NOT EXISTS -> left_anti)."""
    c, o = t(spark, sf_dir, "customer"), t(spark, sf_dir, "orders")
    big = o.filter(F.col("o_totalprice") > 400000)
    return c.join(big, c.c_custkey == big.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "join_cross",
    oracle="""
    SELECT r.r_name, n.n_name
    FROM region r CROSS JOIN nation n
    WHERE r.r_regionkey <> n.n_regionkey
    """,
    category="join",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    r, n = t(spark, sf_dir, "region"), t(spark, sf_dir, "nation")
    return r.crossJoin(n).filter(F.col("r_regionkey") != F.col("n_regionkey")).select("r_name", "n_name")


@register(
    "join_range_theta",
    oracle="""
    SELECT s.s_suppkey, CAST(COUNT(c.c_custkey) AS BIGINT) AS n_close
    FROM supplier s
    LEFT JOIN customer c
      ON c.c_acctbal BETWEEN s.s_acctbal - 500 AND s.s_acctbal + 500
    GROUP BY s.s_suppkey
    """,
    category="join",
)
def join_range_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (range) join, explicitly-broadcast variant: the hint forces
    BroadcastNestedLoop, which is only correct while the broadcast side
    genuinely fits in executor memory — customer is SF-proportional, so at
    scale this exact plan is WRONG and the binned large-large variant
    (join_range_binned, same module) is the one to run: both sides bin on
    floor(acctbal/1000) and equi-join the bin. This entry exists to pin
    the BNLJ operator itself (SURVEY §2.3 theta-join row)."""
    s, c = t(spark, sf_dir, "supplier"), t(spark, sf_dir, "customer")
    cond = c.c_acctbal.between(s.s_acctbal - 500, s.s_acctbal + 500)
    return (
        s.join(F.broadcast(c), cond, "left")
        .groupBy("s_suppkey")
        .agg(F.count("c_custkey").alias("n_close"))
    )


@register(
    "join_broadcast_hint",
    oracle="""
    SELECT p.p_brand, CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS gross
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
    category="join",
)
def join_broadcast_hint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast-hint operator (SURVEY §2.3 hint row): the point
    pinned here is that a hinted small-dim join never shuffles the fact
    side. The hint is only valid while the dim truly fits (part is
    SF-proportional — at the 100 TB design point size the dim first or
    let AQE choose, as the TPC-H suite does); this entry keeps the hint
    because exercising the hint API is its purpose."""
    l, p = t(spark, sf_dir, "lineitem"), t(spark, sf_dir, "part")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_items"),
            (F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")) / 100.0).alias("gross"),
        )
    )


@register(
    "subquery_scalar",
    oracle="""
    SELECT c_custkey, c_acctbal
    FROM customer
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
    """,
    category="subquery",
)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery -> Catalyst plans a subquery broadcast, no collect."""
    c = t(spark, sf_dir, "customer")
    c.createOrReplaceTempView("__sq_customer")
    return spark.sql(
        "SELECT c_custkey, c_acctbal FROM __sq_customer "
        "WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM __sq_customer)"
    )


@register(
    "subquery_in",
    oracle="""
    SELECT o_orderkey, o_custkey
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
    """,
    category="subquery",
)
def subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    o, c = t(spark, sf_dir, "orders"), t(spark, sf_dir, "customer")
    # The IN-list side is segment-filtered customer — SF-proportional, so
    # no broadcast hint: AQE broadcasts the semi-join build side while it
    # fits and shuffles on o_custkey when it doesn't.
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    return o.join(building, o.o_custkey == building.c_custkey, "left_semi").select(
        "o_orderkey", "o_custkey"
    )


@register(
    "subquery_exists_correlated",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > c.c_acctbal
                    AND o.o_orderstatus = 'F')
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    """,
    category="subquery",
)
def subquery_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS (with a non-equi correlated predicate) + NOT
    EXISTS: Catalyst decorrelates these into a left-semi and a left-anti
    join — both shuffle on the correlation key only, never materializing
    the subquery per outer row."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    finished = o.filter(F.col("o_orderstatus") == "F")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return (
        c.join(
            finished,
            (c.c_custkey == finished.o_custkey) & (finished.o_totalprice > c.c_acctbal),
            "left_semi",
        )
        .join(urgent, F.col("c_custkey") == urgent.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_acctbal")
    )


@register(
    "join_asof",
    oracle="""
    WITH orep AS (
      SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
      FROM orders GROUP BY o_custkey, o_orderdate
    )
    SELECT e.event_id, e.user_id, e.ts,
           o.o_orderkey AS last_orderkey, o.o_orderdate AS last_orderdate
    FROM events e
    ASOF LEFT JOIN orep o
      ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    """,
    category="join",
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (backward) join: each event picks the most recent order of the
    same user at-or-before its timestamp — the time-series enrichment join
    Spark SQL lacks as a keyword. Implementation is the merge formulation,
    not join-then-rank: union both sides into one stream, sort per user by
    time (order rows before event rows on ties, so ts >= orderdate is
    inclusive), and carry the last seen order forward with
    last_value(ignore nulls). The intermediate is |events| + |orders| —
    never |events| x matches — and the whole operator is ONE shuffle on the
    user key plus a partition-local sort; on a sorted-bucketed layout even
    that shuffle disappears. AQE handles skewed users."""
    e = t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = (
        t(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    combined = e.select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(1).alias("is_event"),
        "event_id",
        F.col("ts").alias("ts"),
        F.lit(None).cast("long").alias("o_orderkey"),
        F.lit(None).cast("timestamp").alias("o_orderdate"),
    ).unionByName(
        o.select(
            F.col("o_custkey").alias("user_id"),
            F.col("o_orderdate").alias("t"),
            F.lit(0).alias("is_event"),
            F.lit(None).cast("long").alias("event_id"),
            F.lit(None).cast("timestamp").alias("ts"),
            "o_orderkey",
            "o_orderdate",
        )
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("t", "is_event")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        combined.select(
            "event_id",
            "user_id",
            "ts",
            "is_event",
            F.last("o_orderkey", ignorenulls=True).over(w).alias("last_orderkey"),
            F.last("o_orderdate", ignorenulls=True).over(w).alias("last_orderdate"),
        )
        .filter(F.col("is_event") == 1)
        .drop("is_event")
    )


@register(
    "unpivot_melt",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS val FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
    """,
    category="reshape",
)
def unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long unpivot (melt) via the native DataFrame.unpivot — an
    Expand node that emits 3 rows per input row in one pass, no shuffle
    and no N scans of the fact table (the UNION ALL oracle formulation
    would rescan per metric)."""
    li = t(spark, sf_dir, "lineitem")
    return li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_discount", "l_tax"],
        variableColumnName="metric",
        valueColumnName="val",
    )


@register(
    "transform_apply_mapping",
    oracle="""
    SELECT CAST(c_custkey AS BIGINT) AS customer_id,
           c_name AS customer_name,
           CAST(c_acctbal AS DOUBLE) AS balance,
           upper(c_mktsegment) AS segment
    FROM customer
    """,
    category="transform",
)
def transform_apply_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ApplyMapping (the Glue transform: per-column rename + cast,
    glue_etl_framework.py:2 star-import surface) as one projection — the
    transforms.verbs.apply_mapping verb expressed as an oracle-checked
    query. Pure narrow op: fused into the scan, zero shuffles."""
    from glue_etl_framework_spark.transforms import apply_mapping

    c = t(spark, sf_dir, "customer")
    mapped = apply_mapping(
        c,
        [
            ("c_custkey", "customer_id", "bigint"),
            ("c_name", "customer_name", "string"),
            ("c_acctbal", "balance", "double"),
            ("c_mktsegment", "segment", "string"),
        ],
    )
    return mapped.withColumn("segment", F.upper("segment"))


@register(
    "quality_fk_orphans",
    oracle="""
    SELECT 'lineitem->orders' AS fk, CAST(COUNT(*) AS BIGINT) AS n_orphans
    FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IS NULL
    UNION ALL
    SELECT 'orders->customer', CAST(COUNT(*) AS BIGINT)
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_custkey IS NULL
    UNION ALL
    SELECT 'customer->nation', CAST(COUNT(*) AS BIGINT)
    FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE n.n_nationkey IS NULL
    """,
    category="quality",
)
def quality_fk_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the join graph: orphan counts per
    foreign key via left-anti joins — the pipeline QA gate a 100 TB ingest
    runs before publishing a snapshot. The parent key sets are UNHINTED
    (orders/customer are SF-proportional): AQE broadcasts the anti-join
    build side while it fits and shuffles on the key when it doesn't — a
    hardcoded broadcast of the orders key set would OOM at scale."""
    li, o = t(spark, sf_dir, "lineitem"), t(spark, sf_dir, "orders")
    c, n = t(spark, sf_dir, "customer"), t(spark, sf_dir, "nation")

    def orphans(child: DataFrame, parent: DataFrame, ck: str, pk: str, label: str) -> DataFrame:
        return (
            child.join(parent.select(pk), child[ck] == parent[pk], "left_anti")
            .agg(F.count("*").alias("n_orphans"))
            .select(F.lit(label).alias("fk"), "n_orphans")
        )

    return (
        orphans(li, o, "l_orderkey", "o_orderkey", "lineitem->orders")
        .unionByName(orphans(o, c, "o_custkey", "c_custkey", "orders->customer"))
        .unionByName(orphans(c, n, "c_nationkey", "n_nationkey", "customer->nation"))
    )


JOIN_SALT = 8  # salt buckets for the skewed-key join


@register(
    "join_salted_skew",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
    category="join",
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The manual salted-join skew pattern: the probe side scatters each key
    across JOIN_SALT sub-keys (deterministic md5-derived salt), the build
    side replicates every row to ALL salts (explode of a literal sequence),
    and the join runs on (key, salt) — a hot key's rows now land on
    JOIN_SALT different reducers instead of one. The JOIN RESULT is
    salt-invariant, so the oracle is the plain join. This is the explicit
    fallback for when AQE's skewedJoin split (our default answer, §4) can't
    engage — e.g. a key so hot one partition still exceeds memory after AQE
    splitting, or bucketed inputs where AQE won't re-split. Cost: build side
    is shuffled JOIN_SALT times larger — only worth it under real skew."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    salt = (
        F.conv(F.substring(F.md5(F.col("l_linenumber").cast("string")), 1, 4), 16, 10)
        .cast("long") % JOIN_SALT
    )
    big = li.select("l_orderkey", "l_quantity", salt.alias("salt"))
    small = o.select(
        "o_orderkey", "o_orderpriority",
        F.explode(F.sequence(F.lit(0), F.lit(JOIN_SALT - 1)).cast("array<long>")).alias("salt"),
    )
    # shuffle_hash hint: at fixture scale Catalyst would broadcast the small
    # side (defeating the demonstration); under real skew the build side is
    # far over the broadcast threshold and this is the join you'd get anyway.
    joined = big.join(
        small.hint("shuffle_hash"),
        (big.l_orderkey == small.o_orderkey) & (big.salt == small.salt),
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_items"),
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
    )


RANGE_HALF_WIDTH = 500   # the +-500 acctbal window
RANGE_BIN = 1000         # bin width >= 2*half-width -> each probe spans <= 2 bins


@register(
    "join_range_binned",
    oracle="""
    SELECT s.s_suppkey, CAST(COUNT(c.c_custkey) AS BIGINT) AS n_close
    FROM supplier s
    LEFT JOIN customer c
      ON c.c_acctbal BETWEEN s.s_acctbal - 500 AND s.s_acctbal + 500
    GROUP BY s.s_suppkey
    """,
    category="join",
)
def join_range_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LARGE-LARGE range-join pattern (SURVEY §7.3): identical semantics
    to join_range_theta but restructured so no side needs to broadcast.
    Each build row lands in ONE bin (floor(val/binwidth)); each probe row
    explodes to the <= 2 bins its +-window can overlap (bin >= 2*halfwidth
    guarantees the cap); the join is then a plain EQUI-join on bin plus the
    residual BETWEEN filter — shuffle-partitionable on bin, linear in input,
    never a nested loop. A matched pair meets in exactly one bin (the build
    row's), so no dedup is needed; unmatched probes are restored by a final
    left join against the aggregated counts. Bin-width tuning is the usual
    trade: wider bins = fewer probe duplicates but more residual-filter
    work per bucket."""
    s, c = t(spark, sf_dir, "supplier"), t(spark, sf_dir, "customer")
    lo = F.floor((F.col("s_acctbal") - RANGE_HALF_WIDTH) / RANGE_BIN)
    hi = F.floor((F.col("s_acctbal") + RANGE_HALF_WIDTH) / RANGE_BIN)
    probes = s.select(
        "s_suppkey", "s_acctbal", F.explode(F.sequence(lo, hi)).alias("bin")
    )
    build = c.select(
        "c_custkey", "c_acctbal", F.floor(F.col("c_acctbal") / RANGE_BIN).alias("bin")
    )
    matches = (
        probes.join(build, "bin")
        .filter(
            F.col("c_acctbal").between(
                F.col("s_acctbal") - RANGE_HALF_WIDTH, F.col("s_acctbal") + RANGE_HALF_WIDTH
            )
        )
        .groupBy("s_suppkey")
        .agg(F.count("c_custkey").alias("n"))
    )
    return (
        s.select("s_suppkey")
        .join(matches, "s_suppkey", "left")
        .select("s_suppkey", F.coalesce("n", F.lit(0)).alias("n_close"))
    )


@register(
    "join_asof_forward",
    oracle="""
    WITH orep AS (
      SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
      FROM orders GROUP BY o_custkey, o_orderdate
    )
    SELECT e.event_id, e.user_id, e.ts,
           o.o_orderkey AS next_orderkey, o.o_orderdate AS next_orderdate
    FROM events e
    ASOF LEFT JOIN orep o
      ON e.user_id = o.o_custkey AND e.ts <= o.o_orderdate
    """,
    category="join",
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: each event picks the EARLIEST order of the same
    user at-or-after its timestamp — the mirror of join_asof (backward),
    used for 'time to next conversion' style enrichment. Same merge
    formulation, reversed: order rows sort AFTER event rows on ties
    (ts <= orderdate is inclusive), and the carry scans from the future
    side with an UNBOUNDED FOLLOWING frame + first_value(ignore nulls).
    Still |events| + |orders| intermediate and ONE shuffle on the user
    key."""
    e = t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = (
        t(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    combined = e.select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(0).alias("tag"),  # events first on equal timestamps
        "event_id",
        F.col("ts").alias("ts"),
        F.lit(None).cast("long").alias("o_orderkey"),
        F.lit(None).cast("timestamp").alias("o_orderdate"),
    ).unionByName(
        o.select(
            F.col("o_custkey").alias("user_id"),
            F.col("o_orderdate").alias("t"),
            F.lit(1).alias("tag"),
            F.lit(None).cast("long").alias("event_id"),
            F.lit(None).cast("timestamp").alias("ts"),
            "o_orderkey",
            "o_orderdate",
        )
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("t", "tag")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    return (
        combined.select(
            "event_id",
            "user_id",
            "ts",
            "tag",
            F.first("o_orderkey", ignorenulls=True).over(w).alias("next_orderkey"),
            F.first("o_orderdate", ignorenulls=True).over(w).alias("next_orderdate"),
        )
        .filter(F.col("tag") == 0)
        .drop("tag")
    )


ASOF_TOLERANCE = "INTERVAL 2 HOURS"  # pandas merge_asof(tolerance=...) twin


@register(
    "join_asof_tolerance",
    oracle="""
    WITH pur AS (
      SELECT user_id, ts, MAX(event_id) AS purchase_id
      FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
    ),
    a AS (
      SELECT e.event_id, e.user_id, e.ts, p.purchase_id, p.ts AS pts
      FROM (SELECT * FROM events WHERE event_type = 'error') e
      ASOF LEFT JOIN pur p ON e.user_id = p.user_id AND e.ts >= p.ts
    )
    SELECT event_id, user_id, ts,
           CASE WHEN pts >= ts - INTERVAL 2 HOUR THEN purchase_id END
             AS last_purchase_id,
           CASE WHEN pts >= ts - INTERVAL 2 HOUR THEN pts END
             AS last_purchase_ts
    FROM a
    """,
    category="join",
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a match tolerance (pandas ``merge_asof(tolerance=)``,
    absent from both the reference and Spark SQL): each error event picks
    the same user's most recent purchase, but only if it happened within
    the last 2 hours — staler matches become NULL instead of silently
    enriching with irrelevant history. Same single-shuffle union-merge
    formulation as join_asof (intermediate is |errors| + |purchases|,
    never a product); the tolerance is a pure post-window mask, so it adds
    zero plan cost. Purchases are pre-deduped per (user, ts) with a MAX
    aggregate so the as-of winner on timestamp ties is deterministic in
    both engines."""
    ev = t(spark, sf_dir, "events")
    e = ev.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("purchase_id"))
    )
    combined = e.select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(1).alias("is_left"),
        "event_id",
        F.col("ts").alias("ts"),
        F.lit(None).cast("long").alias("purchase_id"),
        F.lit(None).cast("timestamp").alias("pts"),
    ).unionByName(
        p.select(
            "user_id",
            F.col("ts").alias("t"),
            F.lit(0).alias("is_left"),
            F.lit(None).cast("long").alias("event_id"),
            F.lit(None).cast("timestamp").alias("ts"),
            "purchase_id",
            F.col("ts").alias("pts"),
        )
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("t", "is_left")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = (
        combined.select(
            "event_id",
            "user_id",
            "ts",
            "is_left",
            F.last("purchase_id", ignorenulls=True).over(w).alias("purchase_id"),
            F.last("pts", ignorenulls=True).over(w).alias("pts"),
        )
        .filter(F.col("is_left") == 1)
        .drop("is_left")
    )
    within = F.col("pts") >= F.col("ts") - F.expr(ASOF_TOLERANCE)
    return carried.select(
        "event_id",
        "user_id",
        "ts",
        F.when(within, F.col("purchase_id")).alias("last_purchase_id"),
        F.when(within, F.col("pts")).alias("last_purchase_ts"),
    )


@register(
    "join_shuffle_hash_hint",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, c.c_name
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_totalprice > 400000
    """,
    category="join",
)
def join_shuffle_hash_hint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHUFFLE_HASH join hint: forces a shuffled hash join where the
    planner would default to broadcast or sort-merge — the right call when
    one side is modestly larger than the broadcast threshold but still
    builds a hash table cheaper than sorting both sides (classic for
    mid-size dimensions at 100 TB). Completes the hint surface next to
    join_broadcast_hint; plan-asserted as ShuffledHashJoin in
    tests/test_plans.py."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    c = t(spark, sf_dir, "customer")
    return (
        o.join(c.hint("SHUFFLE_HASH"), o.o_custkey == c.c_custkey)
        .select("o_orderkey", "o_totalprice", "c_name")
    )


@register(
    "join_merge_hint",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, c.c_name
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_totalprice > 400000
    """,
    category="join",
)
def join_merge_hint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE (sort-merge) join hint: forces SortMergeJoin — the resilient
    choice when BOTH sides are large and neither hash table fits executor
    memory, and the zero-extra-cost choice when inputs are already
    bucketed+sorted on the key (io.bucketing writes that layout; its test
    asserts the Exchange-free plan). Plan-asserted as SortMergeJoin."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    c = t(spark, sf_dir, "customer")
    return (
        o.join(c.hint("MERGE"), o.o_custkey == c.c_custkey)
        .select("o_orderkey", "o_totalprice", "c_name")
    )


@register(
    "join_null_safe",
    oracle="""
    WITH c AS (
      SELECT c_custkey, nullif(c_nationkey % 5, 0) AS seg FROM customer
    ),
    s AS (
      SELECT s_suppkey, nullif(s_nationkey % 5, 0) AS seg FROM supplier
    )
    SELECT c.seg AS seg,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(COUNT(DISTINCT c.c_custkey) AS BIGINT) AS n_customers,
           CAST(COUNT(DISTINCT s.s_suppkey) AS BIGINT) AS n_suppliers
    FROM c JOIN s ON c.seg IS NOT DISTINCT FROM s.seg
    GROUP BY c.seg
    """,
    category="join",
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-safe equi-join (Spark `<=>` / eqNullSafe, SQL IS NOT DISTINCT
    FROM): NULL keys MATCH each other instead of vanishing, the semantics
    ETL needs when a segment/bucket column is legitimately absent on both
    sides (a plain equi-join silently drops every NULL-keyed row — a
    classic silent-data-loss bug this operator exists to make visible).
    The NULL segment is derived with nullif so the fixture exercises the
    null=null path deterministically. Physically `<=>` still plans as a
    hash-equi join on the key (NULL hashes like any value under null-safe
    equality), so the 100 TB shape is the ordinary shuffled/broadcast hash
    join — no nested-loop penalty. One caveat at scale, stated because it
    bites: ALL null-keyed rows land on ONE reducer key, so a mostly-null
    key column needs the salted pattern (join_salted_skew) on the NULL
    bucket; here NULL is 1/5 of keys by construction."""
    c = t(spark, sf_dir, "customer").select(
        "c_custkey", F.nullif(F.col("c_nationkey") % 5, F.lit(0)).alias("seg")
    )
    s = t(spark, sf_dir, "supplier").select(
        "s_suppkey", F.nullif(F.col("s_nationkey") % 5, F.lit(0)).alias("cseg")
    )
    return (
        c.join(s, F.col("seg").eqNullSafe(F.col("cseg")))
        .groupBy("seg")
        .agg(
            F.count("*").alias("n_pairs"),
            F.count_distinct("c_custkey").alias("n_customers"),
            F.count_distinct("s_suppkey").alias("n_suppliers"),
        )
    )


SJR_BITS = 8192   # bloom size in bits for the runtime join filter
SJR_WORD = 32     # bits packed per BIGINT word
SJR_HASHES = 2    # probe positions per key (salted xxhash64)


@register(
    "join_bloom_semijoin_reduction",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_totalprice > 450000
    GROUP BY o.o_orderpriority
    """,
    category="join",
)
def join_bloom_semijoin_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join reduction with a runtime bloom filter — the distributed-DB
    classic (Bernstein & Chiu 1981; Trino/Snowflake runtime filters; Spark
    3.3's spark.sql.optimizer.runtime.bloomFilter): the selective side
    (orders with totalprice > 450k, ~a few % of orders) builds an 8 KiB
    bit-array over its join keys; the fact scan (lineitem) probes the
    broadcast words MAP-SIDE and drops rows whose key can't possibly
    match BEFORE the shuffle — so shuffle volume tracks the dimension's
    selectivity, not the fact's size. Bloom filters never produce false
    negatives, so the result is EXACTLY the plain join: the oracle is
    that plain join with no bloom anywhere, and the driver hash-match
    certifies losslessness (false positives cost only wasted shuffle
    rows; the exact join drops them).

    Plan shape (r15 optimization, guide §2.3/§2.4): bit-array build = one
    bounded aggregate (positions -> <= 256 BIGINT words) folded into a
    ONE-ROW (word -> bits) map; the probe is a broadcast of that single
    row plus SJR_HASHES inline bit tests — a pure scan-side projection,
    no per-hash join, no extra shuffle, no per-row Python. Probe
    positions are salted xxhash64(key, j) — any hash works because bloom
    false positives are dropped by the exact join (the previous
    md5-substring-conv chain cost two cryptographic digests + two base
    conversions per fact row for no semantic gain; the oracle sees only
    the final join). The pre-aggregate distinct() is gone too: bit_or is
    idempotent, so duplicate positions cost nothing and the dedup
    exchange bought nothing. At 100 TB you'd size m from the build
    side's NDV (~10 bits/key for 1% FP) exactly as dedup's bloom
    prefilter documents."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)

    def pos(j, key_col):
        # xxhash64 is TYPE-sensitive: an int32 key and an int64 key with the
        # same value hash differently, so a fixture regen that narrowed one
        # side would silently produce bloom false NEGATIVES (dropped join
        # rows). Cast both sides to long so build and probe hash the same
        # type by construction (ADVICE r15; a no-op on today's int64 keys).
        return F.pmod(F.xxhash64(key_col.cast("long"), F.lit(j)), F.lit(SJR_BITS))

    build_pos = orders.select(
        F.explode(F.array(*[pos(j, F.col("o_orderkey")) for j in range(SJR_HASHES)])).alias("p")
    )
    words = build_pos.groupBy((F.col("p") / SJR_WORD).cast("long").alias("w")).agg(
        F.expr(f"bit_or(shiftleft(CAST(1 AS BIGINT), CAST(p % {SJR_WORD} AS INT)))").alias("bits")
    )
    wmap = words.agg(
        F.map_from_arrays(F.collect_list("w"), F.collect_list("bits")).alias("wm")
    )

    def bit_set(j):
        pj = pos(j, F.col("l_orderkey"))
        wbits = F.element_at(F.col("wm"), (pj / SJR_WORD).cast("long"))
        # call_function: F.shiftleft only takes a literal bit count
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (pj % SJR_WORD).cast("int")
        )
        return wbits.isNotNull() & (wbits.bitwiseAND(mask) != 0)

    probed = (
        li.join(F.broadcast(wmap), how="cross")
        .filter(bit_set(0) & bit_set(1))
        .drop("wm")
    )
    return (
        probed.join(orders, probed.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            money(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue_cents"),
        )
    )


SKEW_SALT = 8  # salt fan-out; at 100 TB size to (hot-key rows / target partition rows)


@register(
    "join_salted_skew_mitigation",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price_cents
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
    GROUP BY o.o_orderpriority
    """,
    category="join",
)
def join_salted_skew_mitigation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted skew join — the manual mitigation for a hot join key that
    AQE's skew handling cannot fix (AQE splits skewed SORT-MERGE
    partitions, but a hot key inside ONE partition of a hash join, or a
    skewed aggregation feeding the join, still lands on one task): the
    FACT side appends a deterministic salt in [0, S) (pmod of a hash of
    the row's identifying columns so every salt value is actually hit —
    l_linenumber % S would leave bucket 0 empty since l_linenumber is
    1..7; never rand(), which breaks retry determinism), the BUILD side
    is replicated S ways
    with explode(sequence(...)), and the join key becomes (key, salt) —
    the hot key's rows now spread across S tasks at the cost of an S-fold
    replication of the build side. The oracle is the PLAIN join with no
    salt anywhere, so the driver hash-match certifies the rewrite is
    lossless, exactly like the bloom semi-join entry.

    100 TB sizing: S = ceil(hot-key rows / target rows-per-task); the
    build-side replication cost is S x |build|, so salt only the keys
    that need it in production (split the fact by a hot-key list — the
    two-phase shape stays identical). The salted aggregate twin is
    agg_salted_twophase."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp")
    )
    fact = li.withColumn(
        "salt", F.pmod(F.hash("l_orderkey", "l_linenumber"), F.lit(SKEW_SALT)).cast("int")
    )
    build = o.select(
        "o_orderkey",
        "o_orderpriority",
        F.explode(F.sequence(F.lit(0), F.lit(SKEW_SALT - 1))).alias("salt"),
    )
    return (
        fact.join(
            build,
            (fact.l_orderkey == build.o_orderkey) & (fact.salt == build.salt),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            money(F.col("l_extendedprice")).alias("price_cents"),
        )
    )
