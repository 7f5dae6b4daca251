"""Approximate nearest-neighbor search over embedding columns at scale.

Two paths on top of the exact baseline in queries/similarity.py:

1. Hyperplane-LSH bucketing (pure column expressions): deterministic random
   hyperplanes derived from md5 bits; vectors sharing a signature bucket are
   candidates. Works on array<float> directly, no ml Vector conversion,
   whole plan stays in codegen.
2. pyspark.ml BucketedRandomProjectionLSH (euclidean) for
   approxNearestNeighbors / approxSimilarityJoin.

100 TB shape: both replace the corpus x corpus product with an equi-join on
bucket id; recall is tuned by (n_planes, n_tables) and verified against the
exact baseline in tests/.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

try:
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    HAS_ML = True
except ImportError:  # pragma: no cover
    HAS_ML = False


def _hyperplane(dim: int, plane: int, table: int) -> list[float]:
    """Deterministic pseudo-random unit-ish hyperplane: component sign/value
    from md5 — reproducible everywhere, no RNG state."""
    import hashlib

    comps = []
    for d in range(dim):
        h = hashlib.md5(f"{table}:{plane}:{d}".encode()).digest()
        # map first 4 bytes to [-1, 1)
        v = int.from_bytes(h[:4], "big") / 2**31 - 1.0
        comps.append(v)
    norm = math.sqrt(sum(c * c for c in comps)) or 1.0
    return [c / norm for c in comps]


def hyperplane_signatures(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 12,
    n_tables: int = 3,
) -> DataFrame:
    """Add ``sig_0..sig_{n_tables-1}`` integer bucket columns: bit p of
    sig_t = sign(v . hyperplane(t, p)). Cosine-similar vectors collide with
    probability (1 - theta/pi)^n_planes per table."""
    out = df
    for t in range(n_tables):
        sig = F.lit(0).cast("long")
        for p in range(n_planes):
            plane = _hyperplane(dim, p, t)
            dot = F.aggregate(
                F.zip_with(
                    F.col(vec_col),
                    F.array(*[F.lit(c) for c in plane]),
                    lambda x, c: x.cast("double") * c,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            sig = sig + F.when(dot > 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long"))
        out = out.withColumn(f"sig_{t}", sig)
    return out


def ann_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 10,
    n_tables: int = 4,
) -> DataFrame:
    """Approximate top-k neighbors: equi-join queries to corpus on any
    matching LSH table signature, score exact cosine only on candidates,
    keep best k per query. Returns (query_id, neighbor_id, cosine)."""
    csig = hyperplane_signatures(corpus, vec_col, dim, n_planes, n_tables)
    qsig = hyperplane_signatures(queries, vec_col, dim, n_planes, n_tables)
    c_long = _melt_sigs(csig, id_col, vec_col, n_tables).withColumnRenamed(id_col, "neighbor_id")
    q_long = _melt_sigs(qsig, id_col, vec_col, n_tables).withColumnRenamed(id_col, "query_id")
    cand = (
        q_long.withColumnRenamed(vec_col, "qv")
        .join(c_long.withColumnRenamed(vec_col, "cv"), ["table", "sig"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "qv", "cv")
        .distinct()
    )
    cos = _cosine(F.col("qv"), F.col("cv"))
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        cand.select("query_id", "neighbor_id", cos.alias("cosine"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def _melt_sigs(df: DataFrame, id_col: str, vec_col: str, n_tables: int) -> DataFrame:
    pairs = F.array(
        *[
            F.struct(F.lit(t).alias("table"), F.col(f"sig_{t}").alias("sig"))
            for t in range(n_tables)
        ]
    )
    return df.select(id_col, vec_col, F.explode(pairs).alias("ts")).select(
        id_col, vec_col, F.col("ts.table").alias("table"), F.col("ts.sig").alias("sig")
    )


def _cosine(a, b):
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
                      F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x.cast("double") * x.cast("double")),
                            F.lit(0.0), lambda acc, x: acc + x))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x.cast("double") * x.cast("double")),
                            F.lit(0.0), lambda acc, x: acc + x))
    return dot / (na * nb)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k (broadcast queries x corpus scan) — the recall
    baseline; same shape as queries/similarity.py but reusable on any
    DataFrame."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    pairs = F.broadcast(q).join(c, F.col("query_id") != F.col("neighbor_id"))
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        pairs.select("query_id", "neighbor_id", _cosine(F.col("qv"), F.col("cv")).alias("cosine"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def brp_lsh_similarity_join(
    df: DataFrame,
    distance_threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_length: float = 2.0,
    num_hash_tables: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Euclidean near-pairs via pyspark.ml BucketedRandomProjectionLSH
    approxSimilarityJoin: (id_a, id_b, euclidean_distance)."""
    if not HAS_ML:  # pragma: no cover
        raise NotImplementedError("pyspark.ml not available")
    vecs = df.select(id_col, array_to_vector(F.col(vec_col)).alias("features"))
    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes",
        bucketLength=bucket_length, numHashTables=num_hash_tables, seed=seed,
    )
    model = lsh.fit(vecs)
    joined = model.approxSimilarityJoin(vecs, vecs, distance_threshold, distCol="euclidean_distance")
    return (
        joined.select(
            F.col(f"datasetA.{id_col}").alias("id_a"),
            F.col(f"datasetB.{id_col}").alias("id_b"),
            "euclidean_distance",
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .distinct()
    )


# ---------------------------------------------------------------- IVF ----
# Inverted-file ANN: the third scale path (coarse-quantize -> probe nearest
# lists). queries/similarity.similarity_ann_ivf is the oracle-checked fixed
# pipeline; these are the reusable library pieces.


def _cos(qa, na, qb, nb):
    dot = F.aggregate(
        F.zip_with(qa, qb, lambda x, y: x * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return dot / (F.sqrt(na) * F.sqrt(nb))


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Add ``sqnorm`` (squared L2 norm, double) for reuse across scoring."""
    nq = F.aggregate(
        F.transform(F.col(vec_col), lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return df.withColumn("sqnorm", nq)


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 1,
) -> DataFrame:
    """Assign every corpus vector to its ``n_probe`` nearest centroids by
    cosine (ties to the lowest centroid id). ``centroids`` must have
    (cid, cvec) and be small enough to broadcast — the IVF contract (K ~
    sqrt(corpus) even at 100 TB broadcasts fine). Returns (id, cid, rank).
    One broadcast join + one window; no shuffle of the vectors beyond the
    window's key partitioning."""
    c = with_norm(centroids.select("cid", F.col("cvec")), "cvec").withColumnRenamed(
        "sqnorm", "c_sqnorm"
    )
    v = with_norm(corpus.select(id_col, vec_col), vec_col)
    cos = _cos(F.col(vec_col), F.col("sqnorm"), F.col("cvec"), F.col("c_sqnorm"))
    scored = v.join(F.broadcast(c), how="cross").select(id_col, "cid", cos.alias("cos"))
    if n_probe == 1:
        # Fast path for the bulk corpus assignment: max_by over (cos, -cid)
        # partially aggregates map-side, so the shuffle carries one row per
        # vector instead of all n x K scored rows (the window formulation
        # shuffles + sorts everything). Same winner: cos desc, ties to
        # lowest cid.
        return (
            scored.groupBy(id_col)
            .agg(F.max_by("cid", F.struct(F.col("cos"), (-F.col("cid")).alias("nc"))).alias("cid"))
            .select(id_col, "cid", F.lit(1).alias("rank"))
        )
    w = W.partitionBy(id_col).orderBy(F.col("cos").desc(), F.col("cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= n_probe)
        .select(id_col, "cid", "rank")
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN search: corpus vectors live in their nearest-centroid list
    (n_probe=1 assignment); each query scores only the lists of its
    ``n_probe`` nearest centroids. Returns (query_id, neighbor_id, cosine)
    with ``k`` rows per query. The only non-broadcast shuffle is the
    per-list candidate join keyed on cid — pairs scored shrink by ~K/n_probe
    vs brute force."""
    corpus_lists = ivf_assign(corpus, centroids, id_col, vec_col, n_probe=1).select(
        F.col(id_col).alias("neighbor_id"), "cid"
    )
    probes = ivf_assign(queries, centroids, id_col, vec_col, n_probe=n_probe).select(
        F.col(id_col).alias("query_id"), "cid"
    )
    qv = with_norm(queries.select(id_col, vec_col), vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.col("sqnorm").alias("q_sqnorm"),
    )
    nv = with_norm(corpus.select(id_col, vec_col), vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("n_vec"),
        F.col("sqnorm").alias("n_sqnorm"),
    )
    cos = _cos(F.col("q_vec"), F.col("q_sqnorm"), F.col("n_vec"), F.col("n_sqnorm"))
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        F.broadcast(probes)
        .join(corpus_lists, "cid")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .join(F.broadcast(qv), "query_id")
        .join(nv, "neighbor_id")
        .select("query_id", "neighbor_id", cos.alias("cosine"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )
