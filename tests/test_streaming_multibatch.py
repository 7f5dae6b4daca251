"""Multi-micro-batch drains of the windowed streaming plans (round 4).

The streaming_live_*_parity oracles pin the ONE-batch availableNow drain.
These tests pin the stronger production claim — "this plan runs unchanged
against a continuous source" — by draining the same plans in MANY
micro-batches (maxFilesPerTrigger=1 over time-range-ordered files, so
data arrives roughly in event-time order like a live source) and
asserting the append-mode emission still equals the watermark-horizon
batch computation:

- in-order arrival => no late-data drops, so the final emitted window set
  must STILL equal {windows with end <= max(ts) - delay}, with exact
  values, even though the watermark advanced incrementally across
  batches and windows were emitted progressively;
- stream dedup over unique keys must reproduce the full table regardless
  of how files batch.

(Out-of-order multi-batch arrival legitimately DROPS late rows — that is
what the watermark means — so no equality is asserted for shuffled
order; the one-batch parity entries document that contract.)
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

import glue_etl_framework_spark.streaming as ST
from glue_etl_framework_spark.queries import t

SF_SMOKE = "/root/testdata/sf0.001"
EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


@pytest.fixture(scope="module")
def spark():
    from glue_etl_framework_spark import get_spark

    return get_spark(app_name="test_multibatch", shuffle_partitions=8)


@pytest.fixture(scope="module")
def events(spark):
    return t(spark, SF_SMOKE, "events")


def _write_time_sliced(events, src: str, n_slices: int = 4) -> None:
    """Write events as n sequential time-slice files so the file stream
    source picks them up IN EVENT-TIME ORDER. A single
    repartitionByRange write is NOT enough: the source orders files by
    modification time, which follows task COMPLETION order, so a
    later-time file can land first and turn the earlier file's rows
    into late data (legitimately dropped by the watermark) — the
    first version of this test flaked exactly that way under a loaded
    box. Sequential single-file appends pin the arrival order."""
    import time as _time

    bounds = [r[0] for r in events.selectExpr("ts").orderBy("ts").collect()]
    qs = [bounds[int(len(bounds) * i / n_slices)] for i in range(1, n_slices)]
    lo = None
    for hi in qs + [None]:
        sl = events
        if lo is not None:
            sl = sl.filter(F.col("ts") >= F.lit(lo))
        if hi is not None:
            sl = sl.filter(F.col("ts") < F.lit(hi))
        sl.coalesce(1).write.mode("append").parquet(src)
        _time.sleep(0.05)  # distinct modification times
        lo = hi


def _drain(spark, stream_df, name, tmp, mode="append"):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", f"{tmp}/ckpt_{name}")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def test_tumbling_agg_multibatch_inorder_matches_horizon(spark, events, tmp_path):
    src = str(tmp_path / "src")
    # sequential time-slice files => each micro-batch is a later time
    # slice, the live-source arrival pattern (see _write_time_sliced)
    _write_time_sliced(events, src, 4)
    stream = ST.read_file_stream(spark, src, EVENTS_SCHEMA, max_files_per_trigger=1)
    got_df = _drain(
        spark,
        ST.stream_window_agg(stream, "1 hour", keys=["event_type"]),
        "mb_tumbling",
        tmp_path,
    )
    batch = (
        events.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            (F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0).alias("total_value"),
        )
        .select(F.col("window.start").alias("ws"), "event_type", "n_events", "total_value")
    )
    import datetime

    max_ts = events.agg(F.max("ts")).collect()[0][0]
    wm = max_ts - datetime.timedelta(hours=1)
    want = {
        (r.ws, r.event_type): (r.n_events, r.total_value)
        for r in batch.collect()
        if r.ws + datetime.timedelta(hours=1) <= wm
    }
    got = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in got_df.collect()
    }
    assert got == want, (
        f"multi-batch in-order drain drifted from the horizon set: "
        f"missing={set(want) - set(got)} extra={set(got) - set(want)}"
    )


def test_dedup_multibatch_reproduces_table(spark, events, tmp_path):
    src = str(tmp_path / "src")
    _write_time_sliced(events, src, 4)
    stream = ST.read_file_stream(spark, src, EVENTS_SCHEMA, max_files_per_trigger=1)
    got = _drain(spark, ST.stream_dedup(stream, ["event_id"]), "mb_dedup", tmp_path)
    assert got.count() == events.count()
    assert got.select("event_id").distinct().count() == events.count()


def test_stateful_totals_multibatch_inorder(spark, events, tmp_path):
    src = str(tmp_path / "src")
    _write_time_sliced(events, src, 3)
    stream = ST.read_file_stream(spark, src, EVENTS_SCHEMA, max_files_per_trigger=1)
    out = _drain(
        spark, ST.running_user_stats(stream), "mb_stateful", tmp_path, mode="update"
    )
    got = (
        out.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("total_value_cents").alias("total_value_cents"),
        )
    )
    want = events.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("total_value_cents"),
    )
    diff = got.join(want, "user_id").filter(
        (got["n_events"] != want["n_events"])
        | (got["total_value_cents"] != want["total_value_cents"])
    )
    assert got.count() == want.count()
    assert diff.count() == 0
