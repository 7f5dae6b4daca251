"""Stream-stream and stream-sink composition (SURVEY.md §2.9 — EXT).

- ``stream_stream_join``: watermarked interval join between two event
  streams. State on both sides is bounded by the watermark + interval
  (without the time bound, stream-stream join state grows forever).
- ``upsert_sink``: write a streaming result through ``foreachBatch`` into a
  key-upserted parquet table — the standard bridge from streaming to a
  batch-queryable, last-writer-wins table when no lakehouse format is
  available. Each micro-batch is one atomic staged-commit upsert.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    watermark: str = "1 hour",
    interval: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join two streams on ``key`` where the right event happens within
    [left_ts - interval, left_ts]. Both sides carry watermarks so Spark can
    evict join state older than watermark + interval — the bound that makes
    a 100 TB/day stream-stream join feasible. Column names must not clash
    apart from ``key``."""
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[key] == rw[key])
        & (rw[right_ts] >= lw[left_ts] - F.expr(f"INTERVAL {interval}"))
        & (rw[right_ts] <= lw[left_ts])
    )
    return lw.join(rw, cond, how).drop(rw[key])


def upsert_sink(
    stream: DataFrame,
    location: str,
    keys: list[str],
    checkpoint: str,
    fmt: str = "parquet",
    order_by: str | None = None,
):
    """Start a foreachBatch query that upserts every micro-batch into the
    target by key (last-writer-wins, staged atomic rewrite). Exactly-once
    per key per batch: re-run batches re-apply the same upsert
    idempotently. ``order_by`` (e.g. the event timestamp) makes the winner
    among same-key rows WITHIN one micro-batch deterministic — without it
    the intra-batch winner is arbitrary. Returns the StreamingQuery
    (caller awaits/stops)."""
    from glue_etl_framework_spark.io.writers import upsert_by_key

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        upsert_by_key(
            batch_df.sparkSession, batch_df, location, keys, fmt=fmt, order_by=order_by
        )

    return (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )


def stream_static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    key: str,
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Enrich a stream with a STATIC dimension table — the most common
    production streaming join. No watermark is needed (static side holds no
    streaming state); the dimension is re-read per micro-batch, so an
    updated dim parquet is picked up on the next trigger. Broadcast by
    default: a dimension that fits in memory never shuffles the stream.
    For a dimension too large to broadcast, pass broadcast_dim=False and
    pre-bucket both sides on the key."""
    d = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(d, key, how)
