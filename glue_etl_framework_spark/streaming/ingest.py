"""Structured Streaming surface (SURVEY.md §2.9 — EXT; absent in the
batch-only reference).

``incremental_file_ingest`` is the idiomatic replacement for Glue job
bookmarks (``transformation_ctx``, glue_etl_framework.py:101,115,186,227):
a file-source stream with ``trigger(availableNow=True)`` + checkpoint
processes exactly the files that arrived since the last run, then stops —
the same process-only-new-files contract, but transactional (checkpointed
offsets) instead of best-effort.

The window/session/dedup helpers apply the *same* expressions as the batch
queries in queries/events.py, so batch results (oracle-checked) certify the
streaming semantics up to watermark-induced late-data drops.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_file_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream. Schema must be supplied (streams cannot infer);
    ``maxFilesPerTrigger`` bounds per-batch work for steady-state runs."""
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def incremental_file_ingest(
    spark: SparkSession,
    source_path: str,
    target_path: str,
    schema: T.StructType | str,
    checkpoint: str,
    transform: Callable[[DataFrame], DataFrame] | None = None,
    fmt: str = "parquet",
    out_fmt: str = "parquet",
) -> None:
    """One bookmarked run: read only files not yet recorded in the
    checkpoint, optionally transform, append to the target, stop.
    Re-running after new files arrive processes just the delta."""
    stream = read_file_stream(spark, source_path, schema, fmt)
    if transform is not None:
        stream = transform(stream)
    query = (
        stream.writeStream.format(out_fmt)
        .option("checkpointLocation", checkpoint)
        .option("path", target_path)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()


def stream_window_agg(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "1 hour",
    ts_col: str = "ts",
    keys: list[str] | None = None,
) -> DataFrame:
    """Tumbling/sliding windowed count+sum with a watermark — the streaming
    twin of queries/events.tumbling_window_agg / sliding_window_agg. State
    for windows older than the watermark is evicted (bounded state at any
    scale); late rows beyond it are dropped."""
    win = F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    grouped = events.withWatermark(ts_col, watermark).groupBy(win, *(keys or []))
    return grouped.agg(
        F.count("*").alias("n_events"),
        (F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0).alias("total_value"),
    ).select(
        F.col("window.start").alias("window_start"),
        *(keys or []),
        "n_events",
        "total_value",
    )


def stream_session_agg(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    ts_col: str = "ts",
    key: str = "user_id",
) -> DataFrame:
    """Session-window aggregation with watermark (streaming twin of
    queries/events.session_window_agg)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(key, F.session_window(ts_col, gap))
        .agg(F.count("*").alias("n_events"))
        .select(
            key,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


def stream_dedup(
    events: DataFrame,
    keys: list[str],
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Exactly-once-per-key stream dedup: dropDuplicates with a watermark
    bounds the dedup state to the watermark horizon (without it, state
    grows forever — never run unbounded dedup at scale)."""
    return events.withWatermark(ts_col, watermark).dropDuplicates(keys)
