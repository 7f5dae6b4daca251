"""Vector similarity search over the embeddings table (EXT — north star
BASELINE.json:6): brute-force cosine top-k baseline + near-dup pairs, with
a quantized-integer dot product so results are bit-identical across engines.

Quantization: each float dim is scaled by 2^20 and rounded to BIGINT; dot
products and squared norms are then exact integer sums (order-independent,
< 2^53), and cosine = dot / (sqrt(nq_a) * sqrt(nq_b)) is a deterministic
double. This removes float-summation-order nondeterminism entirely.

Scale path: the LSH-bucketed ANN variant (random-hyperplane signatures via
the portable md5-bit trick) is in glue_etl_framework_spark.ext.similarity
together with pyspark.ml BucketedRandomProjectionLSH; its recall against
this exact baseline is property-tested in tests/.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from glue_etl_framework_spark.queries import register, t

SCALE = 1 << 20
N_QUERIES = 10  # vec_id < 10 are the query vectors for top-k
TOP_K = 5

_QUANT_SQL = f"""
      SELECT vec_id,
             list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * {SCALE}) AS BIGINT)) AS q
      FROM embeddings
"""

_NORM_SQL = """
      SELECT vec_id, q,
             CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS nq
      FROM quant
"""


def _quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """vec_id, q (BIGINT array), nq (squared norm, exact BIGINT)."""
    e = t(spark, sf_dir, "embeddings")
    q = F.transform(F.col("embedding"), lambda x: F.round(x.cast("double") * SCALE).cast("long"))
    df = e.select("vec_id", q.alias("q"))
    nq = F.aggregate(
        F.transform(F.col("q"), lambda x: x * x),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return df.select("vec_id", "q", nq.alias("nq"))


def _dot(qa, qb):
    return F.aggregate(
        F.zip_with(qa, qb, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


@register(
    "similarity_topk_bruteforce",
    oracle=f"""
    WITH quant AS ({_QUANT_SQL}),
    normed AS ({_NORM_SQL}),
    pairs AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             CAST(list_sum(list_transform(range(1, 65), i -> a.q[i] * b.q[i])) AS BIGINT)
               / (sqrt(CAST(a.nq AS DOUBLE)) * sqrt(CAST(b.nq AS DOUBLE))) AS cosine
      FROM normed a JOIN normed b ON b.vec_id <> a.vec_id
      WHERE a.vec_id < {N_QUERIES}
    )
    SELECT query_id, neighbor_id, round(cosine, 9) AS cosine
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY cosine DESC, neighbor_id) AS rn
          FROM pairs) r
    WHERE rn <= {TOP_K}
    """,
    category="similarity",
)
def similarity_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k for a query subset: broadcast the (small) query
    side against the full corpus — at scale this is queries-broadcast x
    corpus-scan with a per-query top-k (row_number), no global sort and no
    corpus x corpus blowup."""
    v = _quantized(spark, sf_dir)
    queries = v.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("q").alias("qa"), F.col("nq").alias("na")
    )
    corpus = v.select(
        F.col("vec_id").alias("neighbor_id"), F.col("q").alias("qb"), F.col("nq").alias("nb")
    )
    pairs = (
        F.broadcast(queries)
        .join(corpus, F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                _dot(F.col("qa"), F.col("qb"))
                / (F.sqrt(F.col("na").cast("double")) * F.sqrt(F.col("nb").cast("double")))
            ).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id", F.round("cosine", 9).alias("cosine"))
    )


@register(
    "similarity_neardup_pairs",
    oracle=f"""
    WITH quant AS ({_QUANT_SQL}),
    normed AS ({_NORM_SQL}),
    labeled AS (SELECT n.vec_id, n.q, n.nq, e.label
                FROM normed n JOIN embeddings e ON n.vec_id = e.vec_id)
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(CAST(list_sum(list_transform(range(1, 65), i -> a.q[i] * b.q[i])) AS BIGINT)
                   / (sqrt(CAST(a.nq AS DOUBLE)) * sqrt(CAST(b.nq AS DOUBLE))), 9) AS cosine
    FROM labeled a JOIN labeled b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE CAST(list_sum(list_transform(range(1, 65), i -> a.q[i] * b.q[i])) AS BIGINT)
            / (sqrt(CAST(a.nq AS DOUBLE)) * sqrt(CAST(b.nq AS DOUBLE))) >= 0.35
    """,
    category="similarity",
)
def similarity_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cosine >= 0.35), blocked by
    the label (coarse-cluster) column: the join key makes this an equi-join
    — only same-block pairs are ever scored, which is exactly the shape the
    100 TB path needs (with LSH-computed buckets instead of given labels;
    see ext.similarity). Exact cosine within each block."""
    v = _quantized(spark, sf_dir)
    lab = t(spark, sf_dir, "embeddings").select("vec_id", "label")
    v = v.join(lab, "vec_id")
    a = v.select(F.col("vec_id").alias("vec_a"), F.col("q").alias("qa"), F.col("nq").alias("na"), "label")
    b = v.select(F.col("vec_id").alias("vec_b"), F.col("q").alias("qb"), F.col("nq").alias("nb"), "label")
    cosine = _dot(F.col("qa"), F.col("qb")) / (
        F.sqrt(F.col("na").cast("double")) * F.sqrt(F.col("nb").cast("double"))
    )
    return (
        a.join(b, "label")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .filter(cosine >= 0.35)
        .select("vec_a", "vec_b", F.round(cosine, 9).alias("cosine"))
    )


@register(
    "similarity_label_centroid",
    oracle=f"""
    WITH quant AS ({_QUANT_SQL})
    SELECT e.label,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(SUM(q.q[1]) AS BIGINT) AS sum_dim1_q,
           CAST(SUM(q.q[64]) AS BIGINT) AS sum_dim64_q
    FROM embeddings e JOIN quant q ON e.vec_id = q.vec_id
    GROUP BY e.label
    """,
    category="similarity",
)
def similarity_label_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped vector aggregation (centroid-style sums in quantized space) —
    the building block for IVF coarse clustering; exact integer sums."""
    v = _quantized(spark, sf_dir)
    e = t(spark, sf_dir, "embeddings").select("vec_id", "label")
    return (
        e.join(v, "vec_id")
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vectors"),
            F.sum(F.element_at("q", 1)).alias("sum_dim1_q"),
            F.sum(F.element_at("q", 64)).alias("sum_dim64_q"),
        )
    )
