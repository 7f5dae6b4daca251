"""Shared-subtree materialization policy (VERDICT r15 item 3).

One helper, one documented rule, for every query-path ``localCheckpoint``
whose subtree feeds multiple consumers that AQE exchange reuse cannot
deduplicate (no exchange in the subtree, or consumers pruning different
columns — the r15 rule).

Why ``localCheckpoint`` and not ``persist``/``cache``
-----------------------------------------------------
``persist`` registers the plan with Spark's CacheManager, which matches
CANONICALIZED plans, not DataFrame identities: a second invocation of the
same builder in the same process builds an identical plan and would silently
read the FIRST invocation's cached blocks instead of recomputing from
parquet. That is cross-invocation result reuse — exactly what the bench and
oracle contract forbids (every invocation must compute from the input
files) — and it also never unpersists, so cached intermediates accumulate
for the life of the session. ``localCheckpoint`` registers nothing: each
invocation materializes its own RDD blocks, which are dropped by GC when
the DataFrame goes out of scope.

The honest trade at cluster scale (what this costs at 100 TB)
-------------------------------------------------------------
``localCheckpoint`` truncates lineage and pins blocks to the executors that
computed them:

- An executor loss makes the checkpointed frame unrecoverable and FAILS the
  query (no recompute path). On long multi-hour jobs where retry cost
  dominates, swap to reliable ``checkpoint()`` with a checkpoint dir — same
  call sites, one-line change — or accept a full-query retry.
- The materialized frame must fit executor storage. Size classes:

  * BOUNDED — frames whose size is bounded by a constant of the problem,
    not the data (vocab tables, seed frontiers, centroid samples, band
    bucket-count tables). Default storage (MEMORY_AND_DISK) is safe at any
    input scale.
  * DATA_SIZED — frames proportional to the input (exploded token/window/
    shingle streams, dedup survivor sets). These stay at Spark's
    localCheckpoint default (MEMORY_AND_DISK, deserialized): blocks that
    do not fit storage memory are evicted to disk block-by-block, so
    executor memory is a cache, not the bound, and execution memory
    reclaims pages under pressure — while in-memory reads stay
    deserialized (free re-reads). DISK_ONLY was MEASURED and REJECTED as
    the default (r16 interleaved A/B, burst evidence in
    OPTIMIZATION_r16.md): it forces a serialize-on-write plus a
    deserialize on EVERY consumer pass, and the checkpointed frames here
    are re-read 2-5x by construction — uniformly 1.2-1.7x slower at
    fixture scale with no capacity benefit MEMORY_AND_DISK's eviction
    doesn't already provide. The size class still matters: it is the
    audited statement that the frame can exceed memory and the
    documentation hook for the per-site bound rationale.

``SPARK_GRAFT_CKPT_DATA_SIZED_LEVEL`` overrides the DATA_SIZED storage
level by name (e.g. ``DISK_ONLY`` on a memory-tight cluster where even
evictable cache pressure is unwanted, or ``MEMORY_AND_DISK_SER`` to trade
CPU for footprint) — the scale knob stays parameterized with an honest,
measured local default, per the bench contract.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

BOUNDED = "bounded"
DATA_SIZED = "data_sized"


def _data_sized_level() -> StorageLevel | None:
    """None = Spark's own localCheckpoint default (MEMORY_AND_DISK,
    deserialized — note pyspark's StorageLevel.MEMORY_AND_DISK constant is
    the SERIALIZED-memory variant at the JVM level, so passing it would
    silently change semantics; the deserialized twin is
    MEMORY_AND_DISK_DESER)."""
    name = os.environ.get("SPARK_GRAFT_CKPT_DATA_SIZED_LEVEL")
    if name is None:
        return None
    level = getattr(StorageLevel, name, None)
    if not isinstance(level, StorageLevel):
        raise ValueError(
            f"SPARK_GRAFT_CKPT_DATA_SIZED_LEVEL={name!r} is not a "
            "pyspark.storagelevel.StorageLevel name"
        )
    return level


def checkpoint_shared(
    df: DataFrame, *, size_class: str, eager: bool = True
) -> DataFrame:
    """Materialize a multi-consumer subtree once (module docstring has the
    full policy). ``size_class`` is mandatory so every call site states
    whether the frame is BOUNDED (constant-bounded) or DATA_SIZED
    (input-proportional; storage level parameterized, measured default
    MEMORY_AND_DISK — see module docstring). ``eager=False`` lets a
    sequential first consumer double as the materializing job (the r15
    connected-components pattern); keep ``eager=True`` when the first
    consumers are planned independently."""
    if size_class == DATA_SIZED:
        level = _data_sized_level()
        if level is None:
            return df.localCheckpoint(eager=eager)
        return df.localCheckpoint(eager=eager, storageLevel=level)
    if size_class == BOUNDED:
        return df.localCheckpoint(eager=eager)
    raise ValueError(f"size_class must be BOUNDED or DATA_SIZED, got {size_class!r}")
