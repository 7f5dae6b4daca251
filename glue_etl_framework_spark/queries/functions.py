"""Scalar function families (SURVEY.md §2.8): string, date/time, math,
conditional/null, array, map/JSON, hash. IMPLICIT-SQL in the reference —
the whole Spark function library is reachable through its sql: key
(glue_etl_framework.py:60).

Cross-engine determinism: libm-backed transcendentals (ln/exp/log10) can
differ in the last ULP between the JVM and DuckDB, so those are rounded to
8 decimals on both sides; everything else here is exact IEEE or integer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from glue_etl_framework_spark.queries import register, t


@register(
    "string_funcs",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS uname,
           lower(c_mktsegment) AS lseg,
           CAST(length(c_name) AS INTEGER) AS name_len,
           substr(c_name, 10, 9) AS cust_num,
           CAST(CAST(substr(c_name, 10, 9) AS BIGINT) AS BIGINT) AS cust_num_int,
           concat(c_mktsegment, ':', CAST(c_custkey AS VARCHAR)) AS tag,
           replace(c_name, 'Customer#', 'C-') AS short_name,
           lpad(CAST(c_custkey AS VARCHAR), 6, '0') AS padded,
           trim('  ' || c_mktsegment || ' ') AS trimmed,
           regexp_extract(c_name, '([0-9]+)', 1) AS digits
    FROM customer
    """,
    category="function",
)
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("uname"),
        F.lower("c_mktsegment").alias("lseg"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 10, 9).alias("cust_num"),
        F.substring("c_name", 10, 9).cast("long").alias("cust_num_int"),
        F.concat(F.col("c_mktsegment"), F.lit(":"), F.col("c_custkey").cast("string")).alias("tag"),
        F.replace(F.col("c_name"), F.lit("Customer#"), F.lit("C-")).alias("short_name"),
        F.lpad(F.col("c_custkey").cast("string"), 6, "0").alias("padded"),
        F.trim(F.concat(F.lit("  "), F.col("c_mktsegment"), F.lit(" "))).alias("trimmed"),
        F.regexp_extract("c_name", r"([0-9]+)", 1).alias("digits"),
    )


@register(
    "string_split_funcs",
    oracle="""
    SELECT p_partkey,
           string_split(p_name, ' ')[1] AS first_word,
           string_split(p_name, ' ')[-1] AS last_word,
           CAST(length(string_split(p_name, ' ')) AS INTEGER) AS n_words,
           concat_ws('|', p_brand, p_type) AS brand_type,
           CASE WHEN contains(p_name, 'widget') THEN 1 ELSE 0 END AS has_widget
    FROM part
    """,
    category="function",
)
def string_split_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part")
    words = F.split(F.col("p_name"), " ")
    return p.select(
        "p_partkey",
        words.getItem(0).alias("first_word"),
        F.element_at(words, -1).alias("last_word"),
        F.size(words).alias("n_words"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.when(F.col("p_name").contains("widget"), 1).otherwise(0).alias("has_widget"),
    )


@register(
    "date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS y,
           CAST(month(o_orderdate) AS INTEGER) AS m,
           CAST(day(o_orderdate) AS INTEGER) AS d,
           CAST(quarter(o_orderdate) AS INTEGER) AS q,
           date_trunc('month', o_orderdate) AS month_start,
           strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS due_date,
           CAST(datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INTEGER) AS days_since_95,
           strftime(o_orderdate, '%Y-%m') AS ym,
           CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end
    FROM orders
    """,
    category="function",
)
def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.quarter("o_orderdate").alias("q"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.date_format(F.date_add(F.col("o_orderdate").cast("date"), 30), "yyyy-MM-dd").alias("due_date"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")).alias("days_since_95"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
        F.date_format(F.last_day(F.col("o_orderdate").cast("date")), "yyyy-MM-dd").alias("month_end"),
    )


@register(
    "math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_extendedprice - 50000) AS abs_diff,
           round(l_extendedprice, 1) AS rounded,
           CAST(ceil(l_discount * 100) AS BIGINT) AS disc_pct_ceil,
           CAST(floor(l_quantity / 10) AS BIGINT) AS qty_bucket,
           sqrt(l_extendedprice) AS sq,
           round(ln(l_extendedprice + 1), 6) AS log_price,
           round(log10(l_extendedprice + 1), 6) AS log10_price,
           l_extendedprice * l_extendedprice AS price_sq,
           CAST(l_orderkey % 7 AS BIGINT) AS key_mod,
           greatest(l_quantity, l_discount * 100) AS g,
           least(l_tax, l_discount) AS lst,
           CAST(sign(l_extendedprice - 50000) AS DOUBLE) AS sgn
    FROM lineitem
    """,
    category="function",
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = t(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey", "l_linenumber",
        F.abs(F.col("l_extendedprice") - 50000).alias("abs_diff"),
        F.round("l_extendedprice", 1).alias("rounded"),
        F.ceil(F.col("l_discount") * 100).alias("disc_pct_ceil"),
        F.floor(F.col("l_quantity") / 10).alias("qty_bucket"),
        F.sqrt("l_extendedprice").alias("sq"),
        # 6 decimals, not 8: at 60k rows the min distance-to-boundary of an
        # 8-decimal-rounded ln() lands within a few libm ulps (the guard-band
        # audit in tests/test_transcendental_guard.py caught a row at 1e-14)
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("log_price"),
        F.round(F.log10(F.col("l_extendedprice") + 1), 6).alias("log10_price"),
        (F.col("l_extendedprice") * F.col("l_extendedprice")).alias("price_sq"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
        F.greatest(F.col("l_quantity"), F.col("l_discount") * 100).alias("g"),
        F.least(F.col("l_tax"), F.col("l_discount")).alias("lst"),
        F.signum(F.col("l_extendedprice") - 50000).alias("sgn"),
    )


@register(
    "conditional_null_funcs",
    oracle="""
    SELECT e.event_id,
           coalesce(nullif(e.event_type, 'error'), 'recovered') AS type_or_recovered,
           CASE WHEN e.value IS NULL THEN -1.0 ELSE e.value END AS value_filled,
           ifnull(nullif(e.user_id, 0), -1) AS user_or_neg,
           CAST(CASE WHEN e.value > 100 THEN 1 ELSE 0 END AS INTEGER) AS is_big,
           nullif(e.event_type, 'click') AS maybe_null
    FROM events e
    """,
    category="function",
)
def conditional_null_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.coalesce(F.nullif(F.col("event_type"), F.lit("error")), F.lit("recovered")).alias("type_or_recovered"),
        F.when(F.col("value").isNull(), -1.0).otherwise(F.col("value")).alias("value_filled"),
        F.ifnull(F.nullif(F.col("user_id"), F.lit(0)), F.lit(-1)).alias("user_or_neg"),
        F.when(F.col("value") > 100, 1).otherwise(0).cast("int").alias("is_big"),
        F.nullif(F.col("event_type"), F.lit("click")).alias("maybe_null"),
    )


@register(
    "array_funcs",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
    SELECT doc_id,
           CAST(length(words) AS INTEGER) AS n_words,
           CAST(length(list_distinct(words)) AS INTEGER) AS n_distinct,
           CASE WHEN list_contains(words, 'spark') THEN 1 ELSE 0 END AS has_spark,
           array_to_string(words[1:3], '-') AS first3,
           array_to_string(list_sort(list_distinct(words)), ' ') AS sorted_vocab
    FROM toks
    """,
    category="function",
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(words).alias("n_words"),
        F.size(F.array_distinct(words)).alias("n_distinct"),
        F.when(F.array_contains(words, "spark"), 1).otherwise(0).alias("has_spark"),
        F.array_join(F.slice(words, 1, 3), "-").alias("first3"),
        F.array_join(F.sort_array(F.array_distinct(words)), " ").alias("sorted_vocab"),
    )


@register(
    "array_higher_order",
    oracle="""
    WITH v AS (SELECT vec_id, embedding FROM embeddings)
    SELECT vec_id,
           CAST(length(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_positive,
           round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 6) AS norm_sq,
           round(CAST(list_max(embedding) AS DOUBLE), 6) AS max_dim
    FROM v
    """,
    category="function",
)
def array_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions (transform/filter/aggregate) — the
    JVM-side path for vector math, no Python UDF."""
    e = t(spark, sf_dir, "embeddings")
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double") * x.cast("double"))
    return e.select(
        "vec_id",
        F.size(F.filter(F.col("embedding"), lambda x: x > 0)).alias("n_positive"),
        F.round(F.aggregate(dbl, F.lit(0.0), lambda acc, x: acc + x), 6).alias("norm_sq"),
        F.round(F.array_max("embedding").cast("double"), 6).alias("max_dim"),
    )


@register(
    "json_funcs",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_value,
           CASE WHEN CAST(json_extract(props, '$.k') AS BIGINT) > 50 THEN 'high' ELSE 'low' END AS k_class
    FROM events
    """,
    category="function",
)
def json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the events.props string column — both
    get_json_object (path) and from_json (typed struct) produce k_value."""
    e = t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return e.select(
        "event_id",
        k.alias("k_value"),
        F.when(k > 50, "high").otherwise("low").alias("k_class"),
    )


@register(
    "json_struct_parse",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS total_k,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY event_type
    """,
    category="function",
)
def json_struct_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json into a typed struct, then aggregate the extracted field."""
    e = t(spark, sf_dir, "events")
    parsed = e.withColumn("p", F.from_json("props", "struct<k:bigint>"))
    return parsed.groupBy("event_type").agg(
        F.sum(F.col("p.k")).alias("total_k"), F.count("*").alias("n")
    )


@register(
    "hash_funcs",
    oracle="""
    SELECT doc_id,
           md5(text) AS text_md5,
           sha256(text) AS text_sha256,
           substr(md5(concat(lang, ':', source)), 1, 8) AS bucket_hash
    FROM documents
    """,
    category="function",
)
def hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """md5/sha2 are bit-identical across engines (unlike hash/xxhash64,
    whose seeds differ — those are used internally, never compared)."""
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2(F.col("text"), 256).alias("text_sha256"),
        F.substring(F.md5(F.concat_ws(":", "lang", "source")), 1, 8).alias("bucket_hash"),
    )


@register(
    "explode_unnest",
    oracle="""
    SELECT word, CAST(COUNT(*) AS BIGINT) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) w
    GROUP BY word
    HAVING COUNT(*) >= 10
    """,
    category="function",
)
def explode_unnest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode = the lateral-view/UNNEST workhorse (UDTF-shaped)."""
    d = t(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 10)
    )


@register(
    "map_struct_funcs",
    oracle="""
    SELECT event_id, event_type,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k,
           event_type || '#' || CAST(user_id AS VARCHAR) AS composite_key
    FROM events WHERE event_type IN ('purchase', 'signup')
    """,
    category="function",
)
def map_struct_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a map + struct in flight, extract back out — exercises
    create_map/named_struct/element_at (flattened to scalars for the oracle)."""
    e = t(spark, sf_dir, "events").filter(F.col("event_type").isin("purchase", "signup"))
    m = F.create_map(F.lit("k"), F.get_json_object("props", "$.k").cast("long"))
    s = F.struct(F.col("event_type").alias("et"), F.col("user_id").alias("uid"))
    return e.select(
        "event_id", "event_type",
        F.element_at(m, "k").alias("k"),
        F.concat(s.getField("et"), F.lit("#"), s.getField("uid").cast("string")).alias("composite_key"),
    )


CHUNK_TOKENS = 10  # UDTF demo: tokens per emitted chunk


@register(
    "udf_python_udtf_chunks",
    oracle=f"""
    WITH n AS (
      SELECT doc_id, length(string_split(text, ' ')) AS n_toks FROM documents
    )
    SELECT doc_id,
           CAST((n_toks + {CHUNK_TOKENS} - 1) // {CHUNK_TOKENS} AS BIGINT) AS n_chunks,
           CAST(n_toks - {CHUNK_TOKENS} * ((n_toks + {CHUNK_TOKENS} - 1) // {CHUNK_TOKENS} - 1) AS BIGINT)
             AS last_chunk_tokens
    FROM n WHERE n_toks > 0
    """,
    category="udf",
)
def udf_python_udtf_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (SURVEY §2.10 UDTF row — the real Spark-4 @udtf API,
    not an explode stand-in): a table function that yields one row per
    10-token chunk of each document, consumed through a LATERAL join and
    re-aggregated to per-doc chunk stats the DuckDB oracle reproduces
    arithmetically — so the UDTF's full fan-out executes and is
    value-checked, while the driver result stays one row per doc.

    The honest scale note: a Python UDTF is the SLOW PATH (per-row
    Python evaluation, pickled rows across the JVM/Python boundary —
    unlike Arrow-batched pandas UDFs) and text_chunk_windows does this
    same chunking at scan speed with built-ins; this entry exists
    because the reference's python-script surface exposes arbitrary
    user table functions (glue_etl_framework.py:305) and the engine
    must run them: partition-parallel, no driver involvement. The class
    is defined inside this function so it pickles BY VALUE — a vanilla
    driver session whose workers lack repo paths still executes it
    (the lesson test_stateful_fold_twins_agree pins for streaming)."""
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="chunk_idx: int, n_tokens: int")
    class ChunkSplitter:
        def eval(self, text: str):
            # '' splits to [''] (one empty token) to match the oracle's
            # string_split semantics; only NULL yields no chunks.
            toks = text.split(" ") if text is not None else []
            for i in range(0, len(toks), CHUNK_TOKENS):
                yield i // CHUNK_TOKENS, len(toks[i : i + CHUNK_TOKENS])

    d = t(spark, sf_dir, "documents")
    chunks = d.lateralJoin(
        ChunkSplitter(F.col("text").outer()).alias("c")
    ).select("doc_id", F.col("c.chunk_idx").alias("chunk_idx"), F.col("c.n_tokens").alias("n_toks"))
    return chunks.groupBy("doc_id").agg(
        F.count("*").alias("n_chunks"),
        F.max(F.struct("chunk_idx", "n_toks")).getField("n_toks").alias("last_chunk_tokens"),
    )


@register(
    "udf_pandas_grouped_agg_trimmed_mean",
    oracle="""
    WITH v AS (
      SELECT l_returnflag, CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem
    )
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(round(CASE WHEN COUNT(*) <= 2 THEN NULL
                      ELSE CAST(SUM(cents) - MIN(cents) - MAX(cents) AS DOUBLE)
                           / (COUNT(*) - 2) END) AS BIGINT) AS trimmed_mean_cents
    FROM v GROUP BY l_returnflag
    """,
    category="udf",
)
def udf_pandas_grouped_agg_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas GROUPED_AGG UDAF (SURVEY §2.10 UDAF row — a real
    @pandas_udf aggregate, Arrow-batched, usable inside groupBy().agg
    alongside built-ins): min/max-trimmed mean of line-item cents per
    return flag. The UDAF computes sum-min-max over the exact BIGINT
    cents series and divides once, so the oracle reproduces it with
    plain SQL aggregates — the Python path is value-checked, not just
    smoke-tested. Defined nested for by-value pickling (vanilla-session
    workers). Scale: Arrow transfer is per (group x column) batch and
    partial aggregation does NOT apply to pandas UDAFs — each group's
    values gather on one executor, so keep groups high-cardinality or
    use the built-in formulation (as here, where sum/min/max/count
    compose the same answer shuffle-free; the UDAF exists to prove the
    extension surface)."""
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # functionType passed explicitly: this module uses
    # `from __future__ import annotations`, which stringizes type hints,
    # and pyspark's hint-based dispatch can't resolve them.
    @pandas_udf("double", functionType=PandasUDFType.GROUPED_AGG)
    def trimmed_mean(v):
        # Groups with <=2 rows have no interior values to average: return
        # None (NULL), mirrored by CASE WHEN COUNT(*) <= 2 THEN NULL in
        # the oracle (NULLIF(COUNT(*) - 2, 0) alone would miss the 1-row
        # group, whose denominator is -1, not 0). Without the guard a
        # 2-row group is a ZeroDivisionError task failure and a 1-row
        # group a negative denominator.
        if len(v) <= 2:
            return None
        return float(v.sum() - v.min() - v.max()) / (len(v) - 2)

    li = t(spark, sf_dir, "lineitem")
    v = li.select(
        "l_returnflag", F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents")
    )
    # Spark disallows mixing a GROUPED_AGG pandas UDF with non-pandas
    # aggregates in one agg() (INVALID_PANDAS_UDF_PLACEMENT) — the count
    # comes from a second tiny aggregate joined on the group key.
    trimmed = v.groupBy("l_returnflag").agg(
        F.round(trimmed_mean("cents")).cast("long").alias("trimmed_mean_cents")
    )
    counts = v.groupBy("l_returnflag").agg(F.count("*").alias("n"))
    return counts.join(trimmed, "l_returnflag").select(
        "l_returnflag", "n", "trimmed_mean_cents"
    )
