"""Custom stateful streaming operators via applyInPandasWithState
(SURVEY.md §2.9 — the "arbitrary stateful op" row; absent in the batch-only
reference, flagged as the hard part in SURVEY.md §7.4).

Shape: state lives per group key in the state store (RocksDB/HDFS-backed on
a cluster, checkpointed with the query), keyed exactly like the shuffle —
so state size scales with |keys|, never |rows|, and a 100 TB stream with
10M users holds 10M small state tuples. Arrow-batched pandas transfer keeps
the Python boundary off the per-row path.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_OUTPUT_SCHEMA = (
    "user_id long, n_events long, total_value_cents long, max_ts timestamp"
)
RUNNING_STATE_SCHEMA = "n_events long, total_value_cents long, max_ts timestamp"


def _running_user_stats_fn(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold each micro-batch into (n_events, sum(value cents), max ts) for
    one user and emit the updated running totals. Value cents are exact
    integers, so totals are order/batch-boundary independent — the stream
    converges to the batch answer regardless of how files are batched."""
    if state.exists:
        n, cents, max_ts = state.get
    else:
        n, cents, max_ts = 0, 0, None
    for pdf in batches:
        n += len(pdf)
        cents += int(pdf["value"].mul(100).round().astype("int64").sum())
        batch_max = pdf["ts"].max()
        max_ts = batch_max if max_ts is None else max(max_ts, batch_max)
    state.update((n, cents, max_ts))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value_cents": [cents],
            "max_ts": [max_ts],
        }
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Per-user running totals as a custom stateful operator: one output row
    per user per micro-batch with totals over the whole stream so far —
    something no built-in windowed agg expresses (state never expires; a
    production variant would set a timeout to retire idle keys).

    Input must have columns (user_id long, ts timestamp, value double) and
    be a streaming DataFrame in update output mode (Spark 4 rejects
    applyInPandasWithState in batch queries — the batch twin is a plain
    groupBy aggregate, which the parity test compares against).
    """
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _running_user_stats_fn,
            outputStructType=RUNNING_OUTPUT_SCHEMA,
            stateStructType=RUNNING_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
