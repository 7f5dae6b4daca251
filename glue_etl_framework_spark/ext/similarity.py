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


def assert_vector_dim(df: DataFrame, vec_col: str, dim: int) -> None:
    """One cheap (min, max array-size) aggregate: raise a clear error if
    any vector's length differs from ``dim``. Without it a dim mismatch
    silently ZEROES every hyperplane projection (zip_with pads with
    nulls, null products null the aggregate, `when(proj > 0)` maps the
    null to bit 0), collapsing all vectors into one LSH bucket and
    turning the candidate self-join into the full O(n^2) cross product
    with bit-correct results — invisible until the shuffle dies at scale
    (r15 review). Called by the API entry points that take a ``dim``
    parameter; costs one scan-shaped job, negligible next to the silent
    failure it prevents."""
    row = df.agg(
        F.min(F.size(F.col(vec_col))).alias("lo"),
        F.max(F.size(F.col(vec_col))).alias("hi"),
    ).first()
    if row["lo"] is not None and (row["lo"] != dim or row["hi"] != dim):
        raise ValueError(
            f"{vec_col} vectors have length in [{row['lo']}, {row['hi']}] "
            f"but dim={dim} was configured — a mismatch would silently "
            "zero every LSH signature (one bucket, O(n^2) candidates); "
            "pass the actual embedding dimensionality"
        )


def float_array_sql(vals: list[float]) -> str:
    """Spark-SQL text of an array<double> literal whose elements are
    EXACTLY the given Python floats. ``repr(float)`` emits the shortest
    decimal that round-trips to the same IEEE-754 double, and Spark's
    decimal/scientific literal -> DOUBLE conversion is correctly rounded,
    so ``CAST(<repr> AS DOUBLE)`` reconstructs the identical bits (pinned
    value- and bit-exact by tests/test_r16_optimizations.py). Used by the
    float-plane signature builder below — the r15 band_value_sql treatment
    (one F.expr parse instead of dim x planes py4j F.lit round trips)
    extended to non-integer components (VERDICT r15 item 5)."""
    return "array(" + ",".join(f"CAST({float(v)!r} AS DOUBLE)" for v in vals) + ")"


def table_sig_sql(table: int, dim: int, n_planes: int, vec_col: str) -> str:
    """Spark-SQL text of hyperplane table ``table``'s signature value over
    a float-array column — semantically identical to the unrolled Column
    build it replaced in hyperplane_signatures (same zip_with/aggregate/
    CASE tree after parsing; the reference construction is kept in
    tests/test_r16_optimizations.py and pinned value- and dtype-equal)."""
    ident = vec_col.replace("`", "``")
    bits = []
    for p in range(n_planes):
        arr = float_array_sql(_hyperplane(dim, p, table))
        dot = (
            f"aggregate(zip_with(`{ident}`, {arr}, "
            f"(x, c) -> CAST(x AS DOUBLE) * c), "
            f"CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
        )
        bits.append(
            f"(CASE WHEN {dot} > 0.0 THEN CAST({1 << p} AS BIGINT) "
            f"ELSE CAST(0 AS BIGINT) END)"
        )
    return " + ".join(bits)


def hyperplane_signatures(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 12,
    n_tables: int = 3,
) -> DataFrame:
    """Add ``sig_0..sig_{n_tables-1}`` integer bucket columns: bit p of
    sig_t = sign(v . hyperplane(t, p)). Cosine-similar vectors collide with
    probability (1 - theta/pi)^n_planes per table.

    Contract: every vector must have exactly ``dim`` components — the
    plan-pure construction cannot check this itself (r15 review: a
    mismatch nulls the zip_with products and would silently zero every
    signature); API entry points validate via assert_vector_dim.

    r16 (guide §1.2 step 2, the band_value_sql treatment): each table's
    signature parses as ONE SQL string. The previous unrolled build made
    dim x n_planes x n_tables F.lit py4j round trips (64x12x3 ≈ 2.3k) per
    call — ~0.9 s of driver-side plan construction; the SQL text builds in
    ~1 ms and parses to the same expression tree, so execution is
    untouched (float literals reconstruct bit-exactly, see
    float_array_sql)."""
    if not 1 <= n_planes <= 63:
        raise ValueError(
            "n_planes must be in [1, 63] (bit 63 would overflow LongType "
            "— ADVICE r11, same bound as banded_signatures band_bits)"
        )
    out = df
    for t in range(n_tables):
        out = out.withColumn(
            f"sig_{t}", F.expr(table_sig_sql(t, dim, n_planes, vec_col))
        )
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
    keep best k per query. Returns (query_id, neighbor_id, cosine).
    Validates vector length against ``dim`` up front (one cheap job per
    side — r15 review: a mismatch would silently collapse every vector
    into one bucket); norms are computed once per vector, not per
    candidate pair, and candidate dedup keys on the id pair only."""
    assert_vector_dim(corpus, vec_col, dim)
    assert_vector_dim(queries, vec_col, dim)
    csig = hyperplane_signatures(with_norm(corpus, vec_col), vec_col, dim, n_planes, n_tables)
    qsig = hyperplane_signatures(with_norm(queries, vec_col), vec_col, dim, n_planes, n_tables)
    c_long = _melt_sigs(csig, id_col, vec_col, n_tables).withColumnRenamed(id_col, "neighbor_id")
    q_long = _melt_sigs(qsig, id_col, vec_col, n_tables).withColumnRenamed(id_col, "query_id")
    cand = (
        q_long.withColumnRenamed(vec_col, "qv").withColumnRenamed("sqnorm", "q_sqnorm")
        .join(
            c_long.withColumnRenamed(vec_col, "cv").withColumnRenamed("sqnorm", "n_sqnorm"),
            ["table", "sig"],
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "qv", "q_sqnorm", "cv", "n_sqnorm")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    cos = _cos(F.col("qv"), F.col("q_sqnorm"), F.col("cv"), F.col("n_sqnorm"))
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
    carry = [c for c in (id_col, vec_col, "sqnorm") if c in df.columns]
    return df.select(*carry, F.explode(pairs).alias("ts")).select(
        *carry, F.col("ts.table").alias("table"), F.col("ts.sig").alias("sig")
    )


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
    q = with_norm(queries.select(id_col, vec_col), vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        F.col("sqnorm").alias("q_sqnorm"),
    )
    c = with_norm(corpus.select(id_col, vec_col), vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
        F.col("sqnorm").alias("n_sqnorm"),
    )
    pairs = F.broadcast(q).join(c, F.col("query_id") != F.col("neighbor_id"))
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    cos = _cos(F.col("qv"), F.col("q_sqnorm"), F.col("cv"), F.col("n_sqnorm"))
    return (
        pairs.select("query_id", "neighbor_id", cos.alias("cosine"))
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
    if n_probe < 1:
        raise ValueError(
            "n_probe must be >= 1 (r15 review: 0 silently assigned "
            "nothing instead of raising like every sibling knob)"
        )
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
    with up to ``k`` rows per query (fewer when the probed lists hold
    fewer than k other vectors). The probe-to-list candidate join is
    BROADCAST (probes are n_probe rows per query); the non-broadcast
    shuffles are ivf_assign's per-vector aggregate, the corpus-side join
    keyed on neighbor_id, and the ranking window (r15 review — the old
    text pointed capacity planning at the wrong join). Pairs scored
    shrink by ~K/n_probe vs brute force."""
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


# ------------------------------------------- banded hyperplane LSH ----
# Parameterized production path for embedding near-dup PAIR emitters
# (VERDICT r10 item 1). The registry entry
# queries/similarity.similarity_lsh_hyperplane_pairs pins the banding
# constants (2 bands x 8 bits) because its DuckDB oracle must reproduce
# them bit-for-bit; the r10 ninth scale probe showed what that costs at
# volume: with a FIXED bucket count (2 x 256), bucket occupancy grows
# linearly with the corpus, so in-bucket candidate pairs grow ~n^2
# (measured: 10,183x output at 100x volume). These builders take the
# banding shape as ARGUMENTS so production callers scale signature bits
# with corpus size — buckets ~ n holds expected occupancy (and therefore
# per-bucket pair volume) constant, keeping total candidates linear in n.
# Sizing rule: band_bits = ceil(log2(n / target_rows_per_bucket)) — see
# scaled_band_bits and RECIPES.md ("Scale LSH signature bits with the
# corpus").

QUANT_SCALE = 1 << 20  # matches queries/similarity.SCALE: exact BIGINT dots


def hyperplane_signs(plane: int, dim: int = 64) -> list[int]:
    """Deterministic pseudo-random +-1 hyperplane components: sign of the
    top bit of md5("plane:i"), i 1-based — the identical construction the
    oracle-pinned registry entry bakes into both its Spark plan and its
    DuckDB SQL (queries/similarity.py), shared here so every banding shape
    draws from one hyperplane family."""
    import hashlib

    return [
        1 if hashlib.md5(f"{plane}:{i}".encode()).hexdigest()[0] >= "8" else -1
        for i in range(1, dim + 1)
    ]


def band_value_sql(b: int, band_bits: int, dim: int, q_col: str = "q") -> str:
    """Spark-SQL text of hyperplane band b's value over a quantized BIGINT
    array column — semantically identical to the unrolled Column build
    (same zip_with/aggregate/CASE tree after parsing), but ONE F.expr
    parse instead of band_bits x dim py4j literal round-trips. r15
    optimization: profiling showed the banded queries spent ~60% of their
    wall in Python-side plan CONSTRUCTION (~0.7 s per 8x64 sign-array
    batch of F.lit calls), not execution; the SQL-string form builds in
    ~1 ms. Value parity with the old build is pinned by the unchanged
    DuckDB oracles and tests/test_simhash_banding.py."""
    # Backtick-escape the interpolated column name (ADVICE r15): every
    # current caller passes a safe internal name, but a name containing a
    # backtick would otherwise produce malformed/injected SQL.
    q_ident = q_col.replace("`", "``")
    bits = []
    for k in range(band_bits):
        signs = hyperplane_signs(b * band_bits + k, dim)
        arr = "array(" + ",".join(str(s) for s in signs) + ")"
        proj = (
            f"aggregate(zip_with(`{q_ident}`, {arr}, (x, s) -> x * CAST(s AS BIGINT)), "
            f"CAST(0 AS BIGINT), (acc, x) -> acc + x)"
        )
        bits.append(f"(CASE WHEN {proj} > 0 THEN {1 << k} ELSE 0 END)")
    return " + ".join(bits)


def quantize_embeddings(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, q, nq): embedding scaled by 2^20 and rounded to BIGINT, plus
    the exact integer squared norm — dot products become order-independent
    integer sums (< 2^53), so downstream cosines are deterministic doubles
    on any partitioning."""
    q = F.transform(F.col(vec_col), lambda x: F.round(x.cast("double") * QUANT_SCALE).cast("long"))
    out = df.select(F.col(id_col).alias("vec_id"), q.alias("q"))
    nq = F.aggregate(
        F.transform(F.col("q"), lambda x: x * x),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return out.select("vec_id", "q", nq.alias("nq"))


def banded_signatures(
    qdf: DataFrame,
    n_bands: int = 2,
    band_bits: int = 8,
    dim: int = 64,
    q_col: str = "q",
) -> DataFrame:
    """(vec_id, bidx, bv): the band values of an (n_bands * band_bits)-bit
    random-hyperplane signature, one row per vector per band. Band b uses
    planes [b*band_bits, (b+1)*band_bits) of the shared hyperplane family,
    so (n_bands=2, band_bits=8) reproduces the registry entry's signature
    frame exactly. Pure column expressions over the quantized array — the
    whole signature stays in codegen; only (vec_id, bidx, bv) triples reach
    the candidate shuffle. band_bits caps at 63 like the simhash twin:
    bit k is set via a 1 << k LongType literal and 1 << 63 overflows
    (ADVICE r11 applied to BOTH twins; scaled_band_bits clamps at 28 but
    an explicit band_bits bypasses it)."""
    if not 1 <= band_bits <= 63:
        raise ValueError("band_bits must be in [1, 63] (bit 63 would overflow LongType)")
    band_cols = [
        F.expr(band_value_sql(b, band_bits, dim, q_col)).alias(f"band{b}")
        for b in range(n_bands)
    ]
    return qdf.select(
        "vec_id", F.posexplode(F.array(*band_cols)).alias("bidx", "bv")
    )


def scaled_band_bits(
    n_rows: int,
    target_rows_per_bucket: int = 32,
    min_bits: int = 8,
    max_bits: int = 28,
) -> int:
    """Signature bits PER BAND so expected bucket occupancy stays constant
    as the corpus grows: band_bits = ceil(log2(n / target)), i.e. bucket
    count 2^bits ~ n/target. Occupancy n/2^bits then lands in
    (target/2, target] for every n, so expected in-bucket pairs per vector
    — and total candidate volume — grow LINEARLY in n instead of
    quadratically (the r10 ninth-probe finding). min_bits keeps toy corpora
    at the oracle-pinned shape; max_bits caps plan width (28 bits = 268M
    buckets — beyond that, shard the corpus)."""
    if n_rows <= 0:
        return min_bits
    bits = math.ceil(math.log2(max(n_rows / target_rows_per_bucket, 1.0)))
    return max(min_bits, min(max_bits, bits))


def auto_bucket_cap(n_rows: int, band_bits: int, factor: int = 8) -> int:
    """Occupancy-derived hot-bucket cap: factor * ceil(n / 2^band_bits) —
    the RECIPES.md guidance ("choose the cap as 2–8x the banding target
    occupancy") made executable (VERDICT r12 item 3). n / 2^band_bits is
    the EXPECTED bucket occupancy under the banding in use; on a
    linear-density corpus actual bucket sizes concentrate near it (hash
    bits spread mass uniformly), so a cap factor x above it is a no-op by
    construction there and engages only on adversarial concentration
    (identical / boilerplate signatures piling thousands of docs into one
    bucket — the quadratic-candidate mass). With band_bits from
    scaled_band_bits in its UNCLAMPED range, occupancy is held in
    (16, 32] and the default factor lands the cap in (128, 264]; at the
    min_bits clamp (small corpora) occupancy — and so the cap — is
    smaller, and past the max_bits clamp the cap grows with n. In every
    regime the cap stays factor x the actual expected occupancy, which is
    the property the no-op-on-honest-buckets contract rests on. Applies
    to occupancy-targeted banding only (simhash /
    hyperplane emitters); hash-space minhash banding has no occupancy
    target — see ext.dedup.minhash_banded_candidate_pairs."""
    if not 1 <= band_bits <= 63:
        raise ValueError("band_bits must be in [1, 63]")
    if factor < 1:
        raise ValueError("factor must be >= 1")
    if n_rows <= 0:
        return factor
    return factor * math.ceil(n_rows / (1 << band_bits))


def quantized_cosine_joined(
    v: DataFrame, cand: DataFrame, a_col: str = "vec_a", b_col: str = "vec_b"
) -> DataFrame:
    """(a_col, b_col, cosine) for candidate id pairs against a quantized
    (vec_id, q, nq) frame — the single exact-cosine verify construction
    shared by the emitter (lsh_neardup_pairs) and its auditor
    (ext.dedup.estimate_lost_hyperplane_pairs). The audit's validity
    rests on verifying with bit-identical semantics to the emitter it
    prices; sharing removes the silent-divergence risk a copy carries
    (r15 review — same class as ext.dedup._simhash_hamming_joined)."""
    x = v.select(F.col("vec_id").alias(a_col), F.col("q").alias("qa"), F.col("nq").alias("na"))
    y = v.select(F.col("vec_id").alias(b_col), F.col("q").alias("qb"), F.col("nq").alias("nb"))
    dot = F.aggregate(
        F.zip_with(F.col("qa"), F.col("qb"), lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x_: acc + x_,
    )
    cosine = dot / (F.sqrt(F.col("na").cast("double")) * F.sqrt(F.col("nb").cast("double")))
    return cand.join(x, a_col).join(y, b_col).select(a_col, b_col, cosine.alias("cosine"))


def lsh_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bands: int = 2,
    band_bits: int | None = None,
    dim: int = 64,
    n_rows: int | None = None,
    max_bucket_size: int | str | None = None,
    top_k_partners: int | None = None,
    top_k_symmetric: bool = False,
    cap_metrics: dict | None = None,
) -> DataFrame:
    """Embedding near-duplicate pairs (vec_a, vec_b, cosine >= threshold)
    via banded random-hyperplane LSH with a PARAMETERIZED banding shape —
    the production form of the registry entry
    similarity_lsh_hyperplane_pairs (which pins n_bands=2, band_bits=8 for
    its oracle). band_bits=None sizes the bands from the corpus:
    scaled_band_bits(n_rows or df.count()) — pass n_rows when the count is
    already known to avoid the extra scan. Candidates come from ONE
    self-join keyed on (band index, band value); verification is the exact
    quantized cosine, so the emitted pairs are deterministic on any
    partitioning. Raising band_bits with log2(n) holds candidate volume
    linear in n; raising n_bands trades recall for candidates.

    Bounded-output knobs (default OFF; see ext.dedup.drop_hot_buckets —
    when the corpus's true pair density is quadratic, only a cap bounds
    the emitted stream): max_bucket_size drops over-occupied band buckets
    before the self-join (candidates linear in n by construction) —
    ``'auto'`` derives the cap from expected occupancy via
    auto_bucket_cap(n, band_bits), a no-op on linear-density corpora;
    top_k_partners keeps the k highest-cosine partners per vec_a after
    verification (rows <= k * n; per canonical LEFT id — see
    ext.dedup.keep_top_k_partners for the vec_b asymmetry;
    top_k_symmetric=True routes to keep_top_k_partners_symmetric so EVERY
    vector keeps its k best partners — union semantics, still <= k * n
    rows, 2x the window input). cap_metrics:
    optional dict recording the dropped mass per engaged lever
    (hot_buckets / dropped_band_rows / dropped_verified_pairs /
    max_bucket_size_resolved) at one eager job each — the "no silent
    caps" audit path."""
    if top_k_partners is None and top_k_symmetric:
        raise ValueError(
            "top_k_symmetric=True needs top_k_partners=<k> — without the "
            "knob there is no bound to symmetrize (refusing to silently "
            "return the unbounded pair stream)"
        )
    # Contract check FIRST (r15 review): a misspelled 'Auto', a stringly
    # '32', or an int < 1 previously survived to drop_hot_buckets — AFTER
    # two eager full-corpus checkpoints — and a bad string died there
    # with an opaque TypeError. An input error must not cost a
    # production scan.
    if max_bucket_size is not None and max_bucket_size != "auto" and (
        isinstance(max_bucket_size, bool)
        or not isinstance(max_bucket_size, int)
        or max_bucket_size < 1
    ):
        raise ValueError(
            f"max_bucket_size must be an int >= 1, the literal 'auto', or "
            f"None — got {max_bucket_size!r}"
        )
    if band_bits is None or max_bucket_size == "auto":
        n = n_rows if n_rows is not None else df.count()
    if band_bits is None:
        band_bits = scaled_band_bits(n)
    if max_bucket_size == "auto":
        max_bucket_size = auto_bucket_cap(n, band_bits)
        if cap_metrics is not None:
            cap_metrics["max_bucket_size_resolved"] = max_bucket_size
    # One quantization pass, three consumers (signatures + both verify-join
    # sides) — checkpoint so the lineage doesn't re-execute per consumer
    # (ADVICE r11; the simhash twin already did this).
    v = quantize_embeddings(df, id_col, vec_col).localCheckpoint(eager=True)
    # Aggregates the already-materialized checkpoint — near-free, and it
    # catches the silent all-in-one-bucket collapse a dim mismatch causes
    # (r15 review; see assert_vector_dim).
    assert_vector_dim(v, "q", dim)
    sig = banded_signatures(v, n_bands=n_bands, band_bits=band_bits, dim=dim)
    if max_bucket_size is not None:
        from glue_etl_framework_spark.ext.dedup import drop_hot_buckets

        # The cap adds two more consumers of the signature frame (bucket
        # count + cold join) on top of the self-join's two sides —
        # materialize the projection once instead of re-running it 5x.
        sig = drop_hot_buckets(
            sig.localCheckpoint(eager=True), max_bucket_size, ["bidx", "bv"],
            metrics=cap_metrics,
        )
    cand = (
        sig.select(F.col("vec_id").alias("vec_a"), "bidx", "bv")
        .join(sig.select(F.col("vec_id").alias("vec_b"), "bidx", "bv"), ["bidx", "bv"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .distinct()
    )
    out = (
        quantized_cosine_joined(v, cand)
        .filter(F.col("cosine") >= threshold)
        .select("vec_a", "vec_b", F.round("cosine", 9).alias("cosine"))
    )
    if top_k_partners is not None:
        from glue_etl_framework_spark.ext.dedup import (
            keep_top_k_partners,
            keep_top_k_partners_symmetric,
        )

        if top_k_symmetric:
            out = keep_top_k_partners_symmetric(
                out,
                top_k_partners,
                "vec_a",
                "vec_b",
                [F.col("cosine").desc(), F.col("_other").asc()],
                metrics=cap_metrics,
            )
        else:
            out = keep_top_k_partners(
                out,
                top_k_partners,
                "vec_a",
                [F.col("cosine").desc(), F.col("vec_b").asc()],
                metrics=cap_metrics,
            )
    return out
