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

