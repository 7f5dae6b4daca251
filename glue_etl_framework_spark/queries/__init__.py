"""Named, oracle-checked query builders — the engine's operator inventory.

Each entry pairs a PySpark DataFrame builder ``(spark, sf_dir) -> DataFrame``
with the equivalent ANSI SQL that DuckDB runs on the same parquet files
(driver contract, /root/repo/__spark_entry__.py). One entry per operator of
SURVEY.md §2. Column names are aligned on both sides (the driver's compare
sorts columns by name before hashing).

Determinism discipline (so value hashes match across engines):
- Sums over doubles are order-dependent in the last ULPs, so money-style
  aggregates round to integer cents per row and sum as BIGINT (exact in any
  order), then divide once. ``F.money`` / SQL ``ROUND(x*100)::BIGINT``.
- DuckDB ``SUM(BIGINT)`` returns INT128 — every integer sum is cast back to
  BIGINT in the oracle to match Spark's LongType.
- Quantities are integer-valued doubles; their sums are exact as-is.
- Hash-derived values use md5/sha2 (bit-identical across engines), never
  engine-native ``hash``/``xxhash64`` (different seeds/algorithms).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None => non-SQL-expressible; driver does rows-only
    category: str
    # Tie-break within the never-checked and green tiers of
    # load_registry(): entries added while an attestation backlog exists
    # set this >0 so they queue BEHIND the backlog in the driver window
    # and can never displace it (VERDICT r06 item 5), and once green they
    # stay at the registry tail. Ignored for FAILED entries — a failure
    # re-enters the very next window regardless of rank (ADVICE r07).
    window_rank: int = 0


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, category: str, window_rank: int = 0):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name, fn, oracle, category, window_rank)
        return fn
    return deco


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table (TESTDATA.md: one parquet file per table).

    events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    rejects (PARQUET_TYPE_ILLEGAL); read it as long ns and truncate to µs —
    the same truncation DuckDB applies, so both engines see identical values.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            from pyspark.sql import functions as F

            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # Round-tripped fixtures (tests write Spark-produced parquet back
            # out) come back as TIMESTAMP_NTZ; session TZ is pinned to UTC so
            # this cast is value-identity, and strict consumers (unix_micros)
            # need plain TIMESTAMP.
            from pyspark.sql import functions as F

            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# Registration order drives the driver's CORRECTNESS sampling (it records the
# first N registry entries). Rounds 1-4 attested 200/321 (see
# CORRECTNESS_r*.json; _driver_checked_names sorts those to the back).
# Round-5 window: all 22 tpch + all 20 io_ops (the reference's core workload
# shape and its entire §2.1 scan/sink surface — the most user-visible
# unattested code), then the events.py core fills the remaining ~8 slots.
# Round-6 plan (ROUND5_NOTES.md): remaining events + aggregates sketches +
# functions/udf + streaming_live parity twins.
_MODULES = [
    "tpch",
    "io_ops",
    "events",
    "aggregates",
    "functions",
    "llmops",
    "dedup",
    "similarity",
    "text",
    "curation",
    "multimodal",
    "setops",
    "windows",
    "relational",
    "streaming_live",  # the only no-oracle entries (rows-only driver check)
]


def _driver_history() -> tuple[set[str], set[str], dict[str, int]]:
    """(passed, failed, last_pass_round) from past driver CORRECTNESS rounds.

    The driver's correctness window is the first ~50 entries of ``queries()``
    per round, so rotation is the only way every operator eventually gets a
    driver row. Reading past CORRECTNESS_r*.json makes the rotation
    self-maintaining. An entry whose LATEST driver row was red (hash/rows/
    schema mismatch or an error) counts as FAILED, not checked — it must
    re-enter the very next window so the fix gets its green row.

    ``last_pass_round`` maps each passed name to the (1-based) index of the
    most recent round whose row for it was green — the green tier sorts by
    it ascending (STALEST first), so once the whole registry is green the
    window keeps rotating as a staleness refresh instead of freezing on the
    first modules forever (round-9 change; before it, an all-green registry
    re-attested the same tpch/io head every round and the tail never got a
    fresh row).
    """
    import json
    from pathlib import Path

    repo_root = Path(__file__).resolve().parents[2]
    latest: dict[str, bool] = {}
    last_pass: dict[str, int] = {}
    for rnd, f in enumerate(sorted(repo_root.glob("CORRECTNESS_r*.json")), 1):
        try:
            data = json.loads(f.read_text())
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        for name, row in data.items():
            if not isinstance(row, dict):
                latest[name] = True
                last_pass[name] = rnd
                continue
            ok = row.get("err") is None and not any(
                row.get(k) is False
                for k in ("rows_match", "schema_match", "hash_match")
            )
            latest[name] = ok
            if ok:
                last_pass[name] = rnd
    passed = {n for n, ok in latest.items() if ok}
    failed = {n for n, ok in latest.items() if not ok}
    return passed, failed, last_pass


def load_registry() -> dict[str, QuerySpec]:
    """Import all query modules (idempotent) and return the registry,
    ordered for the driver's windowed correctness check: previously-FAILED
    entries first (their fix needs a green row immediately), then
    never-checked entries (module-priority order, insertion order within a
    module), then everything already green ordered STALEST-ATTESTATION-FIRST
    (so the window rotates through the whole registry as a staleness
    refresh once everything is green) — see _driver_history."""
    for mod in _MODULES:
        importlib.import_module(f"glue_etl_framework_spark.queries.{mod}")
    passed, failed, last_pass = _driver_history()
    mod_rank = {m: i for i, m in enumerate(_MODULES)}
    order = list(REGISTRY)

    def tier(name: str) -> int:
        if name in failed:
            return 0
        if name in passed:
            return 2
        return 1

    ranked = sorted(
        range(len(order)),
        key=lambda i: (
            tier(order[i]),
            # window_rank queues late additions behind the attestation
            # backlog (never-checked tier) and keeps already-green late
            # additions at the registry tail — but a FAILED entry must
            # re-enter the very next window regardless of its rank
            # (ADVICE r07: a failed rank>0 entry otherwise sorts behind
            # every failed rank-0 entry, deviating from the documented
            # "failed re-enters immediately" intent if the failed set
            # ever exceeds the window).
            0 if tier(order[i]) == 0 else REGISTRY[order[i]].window_rank,
            # Staleness: green entries with the OLDEST last green row come
            # first, so every entry's driver attestation stays at most
            # ~ceil(322/42) rounds old. 0 for non-green tiers (no effect).
            last_pass.get(order[i], 0) if tier(order[i]) == 2 else 0,
            mod_rank.get(
                REGISTRY[order[i]].fn.__module__.rsplit(".", 1)[-1], 99
            ),
            i,
        ),
    )
    return {order[i]: REGISTRY[order[i]] for i in ranked}
