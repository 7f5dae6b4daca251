"""Multimodal columns: image/audio/video as opaque binary columns with
typed metadata, processed via Arrow-batched pandas UDFs (mapInPandas).

The container has no image/audio libraries, but the decode gate is CLOSED
offline for the two spec-simple container formats: ``default_image_decoder``
really decodes 24-bit BMP and ``default_audio_decoder`` really decodes
PCM-16 WAV via the pure-Python codecs in ``ext/media_codecs.py`` (the avro_py
playbook). Formats that need native codec libs (JPEG/PNG/MP3/...) still
raise NotImplementedError — inject a decoder for those. Everything
around the kernel — schema, batching, partition sizing, metadata extraction
— is real Spark plumbing and is what actually matters at 100 TB:

- blobs live in a ``binary`` column (parquet BinaryType) next to a
  ``struct`` metadata column; large assets use the path-reference pattern
  (store a URI, fetch inside the batch kernel).
- mapInPandas streams Arrow record batches: memory is bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` x max blob size, so
  oversized rows need a lower batch cap (set via session config).
- repartition before heavy decode so one task = one roughly-even slice of
  blobs; decode is CPU-bound, so partitions ~ cores.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_META_SCHEMA = (
    "doc_id bigint, byte_len int, sha256 string, format string"
)

FEATURE_SCHEMA = "doc_id bigint, width int, height int, n_channels int, mean_luma double"


def attach_binary_payload(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Fixture helper: materialize an opaque binary column from text (the
    fixtures ship no real blobs). At 100 TB the binary column arrives from
    the source parquet; everything downstream is identical."""
    return df.select(
        id_col,
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.length(F.col(text_col)).alias("orig_len"),
            F.lit("utf-8-fake-image").alias("format"),
        ).alias("meta"),
    )


def binary_metadata(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Cheap JVM-side metadata over blobs (no Python): byte length + sha256
    + declared format. This is the 'inspect 100 TB without decoding it'
    path — stays in whole-stage codegen."""
    return df.select(
        id_col,
        F.octet_length(F.col(payload_col)).alias("byte_len"),
        F.sha2(F.col(payload_col), 256).alias("sha256"),
        F.col("meta.format").alias("format"),
    )


def default_image_decoder(payload: bytes) -> dict:
    """REAL decode for BMP (pure-Python codec from the public spec —
    ext/media_codecs.py, the avro_py playbook), baseline JPEG
    (ext/jpeg_py.py, ITU-T T.81) and PNG (ext/png_py.py, RFC 2083 over
    stdlib zlib). Anything else raises NotImplementedError: a decode
    gate should fail honest, never guess."""
    if payload[:2] == b"BM":
        from glue_etl_framework_spark.ext.media_codecs import decode_bmp

        img = decode_bmp(payload)
        px = img["pixels"]
        return {
            "width": img["width"],
            "height": img["height"],
            "n_channels": img["n_channels"],
            "mean_luma": (sum(px) / len(px)) / 255.0,
        }
    if payload[:3] == b"\xff\xd8\xff":
        from glue_etl_framework_spark.ext.jpeg_py import decode_jpeg

        img = decode_jpeg(payload)
        px = img["pixels"]
        return {
            "width": img["width"],
            "height": img["height"],
            "n_channels": img["n_channels"],
            "mean_luma": (sum(px) / len(px)) / 255.0,
        }
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        from glue_etl_framework_spark.ext.png_py import decode_png

        img = decode_png(payload)
        px = img["pixels"]
        return {
            "width": img["width"],
            "height": img["height"],
            "n_channels": img["n_channels"],
            "mean_luma": (sum(px) / len(px)) / 255.0,
        }
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from glue_etl_framework_spark.ext.gif_py import decode_gif

        img = decode_gif(payload)
        px = img["pixels"]
        return {
            "width": img["width"],
            "height": img["height"],
            "n_channels": img["n_channels"],
            "mean_luma": (sum(px) / len(px)) / 255.0,
        }
    raise NotImplementedError(
        "unrecognized image container: BMP (media_codecs.py), baseline "
        "JPEG (jpeg_py.py), PNG (png_py.py) and GIF (gif_py.py) decode "
        "offline — inject a decoder via extract_image_features(decoder=...) "
        "for other formats"
    )


def default_audio_decoder(payload: bytes) -> dict:
    """REAL decode for PCM-16 WAV (ext/media_codecs.py); other audio formats
    raise NotImplementedError (no codec libs in this container)."""
    if payload[:4] == b"RIFF":
        from glue_etl_framework_spark.ext.media_codecs import decode_wav

        wav = decode_wav(payload)
        s = wav["samples"]
        return {
            "sample_rate": wav["sample_rate"],
            "n_channels": wav["n_channels"],
            "n_samples": len(s),
            "sample_sum": sum(s),
            "peak": max((abs(v) for v in s), default=0),
        }
    raise NotImplementedError(
        "only PCM-16 WAV decodes offline (ext/media_codecs.py); other audio "
        "formats need codec libs unavailable in this environment"
    )


def fake_image_decoder(payload: bytes) -> dict:
    """Deterministic fake decoder for tests: derives pseudo-dimensions and a
    luma statistic from the bytes themselves."""
    n = len(payload)
    width = 16 + (n % 64)
    height = 16 + ((n // 64) % 64)
    mean_luma = (sum(payload[:256]) / max(min(n, 256), 1)) / 255.0
    return {"width": width, "height": height, "n_channels": 3, "mean_luma": mean_luma}


def extract_image_features(
    df: DataFrame,
    decoder: Callable[[bytes], dict] = default_image_decoder,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    partitions: int | None = None,
) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches). The kernel
    sees pandas Series of raw bytes; output schema is fixed/typed. This is
    the pattern for any per-blob Python kernel (resize, frame-sample,
    fingerprint)."""
    src = df.select(id_col, payload_col)
    if partitions:
        src = src.repartition(partitions)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            feats = [decoder(bytes(p)) for p in b[payload_col]]
            out = pd.DataFrame(feats)
            out.insert(0, id_col, b[id_col].values)
            yield out

    return src.mapInPandas(kernel, schema=FEATURE_SCHEMA)


def sample_frames(
    df: DataFrame,
    every_nth: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    frame_size: int = 32,
) -> DataFrame:
    """'Video' frame sampling over a binary payload: split the blob into
    fixed-size chunks, keep every nth — pure JVM expressions (substring on
    binary), one row per sampled frame via posexplode. The real codec-backed
    variant swaps the chunker for a decode kernel; the plumbing (explode
    fan-out, frame indexing) is what this exercises."""
    n_frames = F.floor(F.octet_length(F.col(payload_col)) / frame_size).cast("int")
    idx = F.filter(
        F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0))),
        lambda i: i % every_nth == 0,
    )
    frames = F.transform(
        idx,
        lambda i: F.struct(
            i.alias("frame_index"),
            F.substring(F.col(payload_col), (i * frame_size + 1).cast("int"), frame_size).alias(
                "frame_bytes"
            ),
        ),
    )
    return df.select(id_col, F.explode(frames).alias("fr")).select(
        id_col,
        F.col("fr.frame_index").alias("frame_index"),
        F.col("fr.frame_bytes").alias("frame_bytes"),
    ).withColumn("frame_sha", F.sha2(F.col("frame_bytes"), 256))
