"""Multimodal-column operators (EXT — north star BASELINE.json:6): treat
media payloads as opaque ``binary`` columns with typed metadata.

The container has no image/audio codecs, so the *decode* step is stubbed in
``glue_etl_framework_spark.ext.multimodal`` (mapInPandas plumbing, tested in
tests/test_ext.py). The operators here are the oracle-checkable storage-side
half: payload materialization (``encode`` → binary), content addressing
(md5/sha256 over bytes), and fixed-size chunking — the manifest layout a
100 TB blob pipeline needs (payload chunks + a metadata row per chunk, so a
downstream decoder can fetch/process chunks independently per partition).

Portability: payloads are derived as UTF-8 encodings of ``documents.text``
(both engines encode the identical substring, so bytes match even for
non-ASCII); hashes are md5/sha256 (bit-identical across engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from glue_etl_framework_spark.queries import register, t

CHUNK_CHARS = 256  # chunk boundary in characters (== bytes for ASCII corpora)


@register(
    "multimodal_payload_stats",
    oracle="""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           CAST(MAX(octet_length(encode(text))) AS BIGINT) AS max_bytes,
           CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_distinct_payloads
    FROM documents
    GROUP BY source
    """,
    category="multimodal",
)
def multimodal_payload_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source payload inventory over binary blobs: byte sizes and
    content-hash distinct count. One hash-groupBy on a small key — the
    payload bytes never shuffle (only their 16-byte digests do), which is
    the invariant that keeps this viable when payloads are MBs each."""
    d = t(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    return d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.length(payload)).alias("total_bytes"),
        F.max(F.length(payload)).cast("long").alias("max_bytes"),
        F.count_distinct(F.md5(payload)).alias("n_distinct_payloads"),
    )


@register(
    "multimodal_content_address",
    oracle="""
    SELECT doc_id,
           sha256(text) AS payload_sha256,
           CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes,
           octet_length(encode(text)) = length(text) AS is_ascii
    FROM documents
    """,
    category="multimodal",
)
def multimodal_content_address(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressed metadata row per blob: sha256 digest (the dedup /
    cache key for a blob store), byte size, and an ASCII flag
    (bytes == chars). Pure projection — no shuffle at any scale."""
    d = t(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    return d.select(
        "doc_id",
        F.sha2(payload, 256).alias("payload_sha256"),
        F.length(payload).cast("long").alias("payload_bytes"),
        (F.length(payload) == F.length("text")).alias("is_ascii"),
    )


@register(
    "multimodal_chunk_manifest",
    oracle=f"""
    WITH c AS (
      SELECT doc_id, text,
             unnest(range(0, CAST(ceil(length(text) / {CHUNK_CHARS}.0) AS BIGINT))) AS chunk_idx
      FROM documents
    )
    SELECT doc_id,
           CAST(chunk_idx AS INT) AS chunk_idx,
           CAST(octet_length(encode(substr(text, CAST(chunk_idx * {CHUNK_CHARS} + 1 AS INT), {CHUNK_CHARS}))) AS BIGINT) AS chunk_bytes,
           md5(substr(text, CAST(chunk_idx * {CHUNK_CHARS} + 1 AS INT), {CHUNK_CHARS})) AS chunk_md5
    FROM c
    """,
    category="multimodal",
)
def multimodal_chunk_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size chunk manifest: each blob becomes ceil(len/256) rows of
    (chunk_idx, bytes, md5). This is the frame-sample / tile layout for
    media: downstream Pandas-UDF decoders process chunks independently, so
    a 1 GB video never has to fit in one task — ``explode`` keeps the
    expansion distributed (no driver loop)."""
    d = t(spark, sf_dir, "documents")
    n_chunks = F.ceil(F.length("text") / F.lit(float(CHUNK_CHARS))).cast("long")
    chunk = F.encode(
        F.expr(f"substring(text, chunk_idx * {CHUNK_CHARS} + 1, {CHUNK_CHARS})"), "UTF-8"
    )
    return (
        d.filter(F.length("text") > 0)  # sequence(0,-1) would count down
        .select("doc_id", "text", F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias("chunk_idx"))
        .select(
            "doc_id",
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            F.length(chunk).cast("long").alias("chunk_bytes"),
            F.md5(chunk).alias("chunk_md5"),
        )
    )


FRAME_STRIDE = 4      # keep every 4th chunk ("frame")
FRAME_MAX_PER_DOC = 8  # cap sampled frames per blob


@register(
    "multimodal_frame_sample",
    oracle=f"""
    WITH c AS (
      SELECT doc_id, text,
             unnest(range(0, CAST(ceil(length(text) / {CHUNK_CHARS}.0) AS BIGINT))) AS chunk_idx
      FROM documents
    )
    SELECT doc_id,
           CAST(chunk_idx AS INT) AS frame_idx,
           CAST(chunk_idx // {FRAME_STRIDE} AS INT) AS sample_no,
           md5(substr(text, CAST(chunk_idx * {CHUNK_CHARS} + 1 AS INT), {CHUNK_CHARS})) AS frame_md5
    FROM c
    WHERE chunk_idx % {FRAME_STRIDE} = 0
      AND chunk_idx // {FRAME_STRIDE} < {FRAME_MAX_PER_DOC}
    """,
    category="multimodal",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strided frame sampling over the chunk manifest: keep every Nth chunk
    up to a per-blob cap — the video-keyframe / audio-snippet selection
    step that feeds a Pandas-UDF decoder (ext.multimodal.sample_frames has
    the mapInPandas plumbing; here the SELECTION itself is a pure narrow
    plan). The stride predicate applies during the explode, so skipped
    frames are never materialized, and the cap bounds per-task output no
    matter how large one blob is."""
    d = t(spark, sf_dir, "documents")
    n_chunks = F.ceil(F.length("text") / F.lit(float(CHUNK_CHARS))).cast("long")
    frame = F.encode(
        F.expr(f"substring(text, frame_idx * {CHUNK_CHARS} + 1, {CHUNK_CHARS})"), "UTF-8"
    )
    return (
        d.filter(F.length("text") > 0)
        .select(
            "doc_id", "text",
            F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias("frame_idx"),
        )
        .filter(
            (F.col("frame_idx") % FRAME_STRIDE == 0)
            & (F.floor(F.col("frame_idx") / FRAME_STRIDE) < FRAME_MAX_PER_DOC)
        )
        .select(
            "doc_id",
            F.col("frame_idx").cast("int").alias("frame_idx"),
            F.floor(F.col("frame_idx") / FRAME_STRIDE).cast("int").alias("sample_no"),
            F.md5(frame).alias("frame_md5"),
        )
    )



PHASH_BITS = 16
PHASH_MAX_HAMMING = 4  # near-dup if signatures differ in <= 4 of 16 bits


@register(
    "multimodal_phash_pairs",
    oracle=f"""
    WITH chunks AS (
      SELECT doc_id, md5(substring(text, i * {CHUNK_CHARS} + 1, {CHUNK_CHARS})) AS h
      FROM documents, UNNEST(range(0, CAST(ceil(length(text) / {CHUNK_CHARS}.0) AS BIGINT))) AS u(i)
      WHERE length(text) > 0
    ),
    sig AS (
      SELECT doc_id,
             CAST({' + '.join(
                 f"(CASE WHEN SUM(CASE WHEN substr(h, {k + 1}, 1) >= '8' THEN 1 ELSE -1 END) > 0 THEN {1 << k} ELSE 0 END)"
                 for k in range(16))} AS BIGINT) AS phash
      FROM chunks GROUP BY doc_id
    ),
    banded AS (SELECT doc_id, phash, phash // 256 AS band FROM sig)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
    FROM banded a JOIN banded b ON a.band = b.band AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.phash, b.phash)) <= {PHASH_MAX_HAMMING}
    """,
    category="multimodal",
)
def multimodal_phash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash-style near-dup pairs over binary payloads: a
    {PHASH_BITS}-bit signature from the majority vote of per-chunk hash
    bits (the modality-agnostic skeleton of pHash — with real images the
    chunk hash becomes a DCT-block sign, same plan), banded on the high
    byte so candidate pairs meet through an equi-join, verified by exact
    Hamming distance (bit_count of xor). Chunk-level, so a payload edit
    perturbs only its chunks' votes — robust where whole-blob md5 breaks.
    Two keyed shuffles (chunk sigs -> per-doc aggregate; band self-join);
    never all-pairs."""
    d = t(spark, sf_dir, "documents").filter(F.length("text") > 0)
    n_chunks = F.ceil(F.length("text") / F.lit(float(CHUNK_CHARS))).cast("long")
    chunks = d.select(
        "doc_id", "text",
        F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias("i"),
    ).select(
        "doc_id",
        F.md5(F.expr(f"substring(text, i * {CHUNK_CHARS} + 1, {CHUNK_CHARS})")).alias("h"),
    )
    bits = [
        F.when(
            F.sum(
                F.when(F.substring("h", k + 1, 1) >= "8", 1).otherwise(-1)
            )
            > 0,
            F.lit(1 << k),
        ).otherwise(F.lit(0))
        for k in range(PHASH_BITS)
    ]
    sig = chunks.groupBy("doc_id").agg(
        sum(bits[1:], bits[0]).cast("long").alias("phash")
    )
    banded = sig.select("doc_id", "phash", (F.col("phash") / 256).cast("long").alias("band"))
    a = banded.select(F.col("doc_id").alias("doc_a"), F.col("phash").alias("ph_a"), "band")
    b = banded.select(F.col("doc_id").alias("doc_b"), F.col("phash").alias("ph_b"), "band")
    hamming = F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b"))).cast("long")
    return (
        a.join(b, "band")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .filter(hamming <= PHASH_MAX_HAMMING)
        .select("doc_a", "doc_b", hamming.alias("hamming"))
    )


CDC_WINDOW = 8    # rolling window (bytes) the boundary test hashes
CDC_MASK = 16     # boundary when window-hash % MASK == 0 -> ~16-byte chunks


@register(
    "multimodal_cdc_chunks",
    oracle=f"""
    WITH pos AS (
      SELECT doc_id, text,
             unnest(range(1, greatest(length(text) - {CDC_WINDOW - 1}, 1) + 1)) AS i
      FROM documents
    ),
    bounds AS (
      SELECT doc_id, text, CAST(i AS BIGINT) AS b
      FROM pos
      WHERE i = 1
         OR ('0x' || substr(md5(substr(text, i, {CDC_WINDOW})), 1, 8))::UBIGINT
              % {CDC_MASK} = 0
    ),
    chunks AS (
      SELECT doc_id, b,
             COALESCE(LEAD(b) OVER (PARTITION BY doc_id ORDER BY b),
                      CAST(length(text) + 1 AS BIGINT)) AS e,
             text,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY b) AS chunk_idx
      FROM bounds
    )
    SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
           b AS start_pos, CAST(e - b AS BIGINT) AS chunk_bytes,
           md5(substr(text, CAST(b AS INTEGER), CAST(e - b AS INTEGER))) AS chunk_hash
    FROM chunks WHERE e > b
    """,
    category="multimodal",
)
def multimodal_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (the LBFS rolling-hash family,
    Muthitacharoen et al. SOSP'01) over binary payloads — the storage-
    dedup primitive fixed-size chunking cannot match: boundaries are
    declared wherever the hash of the local {CDC_WINDOW}-byte window
    passes the mask test, so an insertion shifts at most the chunk it
    lands in and every later chunk still re-aligns (with fixed chunks,
    one inserted byte re-writes the whole tail). Emits the per-payload
    chunk manifest (index, offset, size, content hash) — grouping by
    chunk_hash across payloads gives the dedup/compression ratio a blob
    store achieves. Work is inherently O(bytes) — the same asymptotics as
    reading the payload — via a position explode + per-position hash; the
    only window runs PARTITIONED per payload over its boundary rows
    (~bytes/{CDC_MASK} per doc, bounded by payload size, never corpus
    size). Deterministic throughout (md5 window test on both engines), so
    the full manifest is oracle-checked. The text column stands in for
    the payload bytes (same portability note as the rest of this
    module)."""
    from pyspark.sql import Window as W

    d = t(spark, sf_dir, "documents")
    pos = d.select(
        "doc_id",
        "text",
        F.posexplode(
            F.sequence(F.lit(1), F.greatest(F.length("text") - (CDC_WINDOW - 1), F.lit(1)))
        ).alias("_junk", "i"),
    ).drop("_junk")
    win_hash = F.conv(
        F.substring(F.md5(F.expr(f"substring(text, i, {CDC_WINDOW})")), 1, 8), 16, 10
    ).cast("long")
    bounds = pos.filter((F.col("i") == 1) | (win_hash % CDC_MASK == 0)).select(
        "doc_id", "text", F.col("i").cast("long").alias("b")
    )
    w = W.partitionBy("doc_id").orderBy("b")
    chunks = bounds.select(
        "doc_id",
        "b",
        F.coalesce(F.lead("b").over(w), (F.length("text") + 1).cast("long")).alias("e"),
        "text",
        F.row_number().over(w).cast("long").alias("chunk_idx"),
    )
    return chunks.filter(F.col("e") > F.col("b")).select(
        "doc_id",
        "chunk_idx",
        F.col("b").alias("start_pos"),
        (F.col("e") - F.col("b")).alias("chunk_bytes"),
        F.md5(F.expr("substring(text, CAST(b AS INT), CAST(e - b AS INT))")).alias(
            "chunk_hash"
        ),
    )
