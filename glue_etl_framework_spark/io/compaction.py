"""Small-file compaction: the table-maintenance pass every long-lived
100 TB table needs.

Incremental/streaming writes accumulate many small files (one per task per
micro-batch); scans then pay per-file open/footer costs and the driver pays
listing costs. Compaction rewrites a table's files into ~target-size
outputs without changing its rows — the operational complement of the
reference's one-shot ``repartition``/``coalesce`` output knobs
(glue_etl_framework.py:196-207), which only shape a single write.

Design: file count is computed from the table's actual on-disk bytes (no
data pass), the rewrite is a single narrow-ish job (`repartition(n)` for
even output sizes, or `coalesce(n)` to avoid a shuffle when slightly
uneven outputs are fine), and the swap is transactional via
:func:`glue_etl_framework_spark.io.writers.staged_write` — readers see the
old files or the new files, never a mix. Partitioned layouts compact
per-partition (partition columns are re-derived from the data, so the
directory structure is preserved).
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import SparkSession

from glue_etl_framework_spark.io.writers import _strip_scheme, staged_write

_DATA_SUFFIXES = (".parquet", ".orc", ".json", ".csv", ".avro", ".gz", ".snappy")


def table_file_stats(location: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) under a table directory, recursively;
    hidden/metadata files (_SUCCESS, .crc, ...) excluded. Driver-side
    listing only — the same cost any scan's file index pays."""
    location = _strip_scheme(location)
    n, total = 0, 0
    for root, _dirs, files in os.walk(location):
        for f in files:
            if f.startswith(("_", ".")):
                continue
            if not f.endswith(_DATA_SUFFIXES):
                continue
            n += 1
            total += os.path.getsize(os.path.join(root, f))
    return n, total


def plan_compaction(
    location: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files_to_compact: int = 2,
) -> int | None:
    """Number of output files a compaction should produce, or ``None`` when
    compaction isn't worthwhile (already few files, or files already at or
    above ~half the target on average)."""
    n_files, total = table_file_stats(location)
    if n_files < min_files_to_compact or total == 0:
        return None
    if total / n_files >= target_file_bytes / 2:
        return None  # average file already reasonably sized
    return max(1, -(-total // target_file_bytes))  # ceil division


def partition_dir_stats(
    location: str, partition_keys: list[str]
) -> dict[tuple[str, ...], tuple[int, int]]:
    """Per-hive-partition (n_data_files, bytes) for single- or multi-level
    ``k=v`` layouts: {(v1, v2, ...) -> (n, bytes)}. Values are the raw dir
    strings (no URL decoding — matched by string-cast join in
    compact_table)."""
    location = _strip_scheme(location).rstrip("/")
    out: dict[tuple[str, ...], tuple[int, int]] = {}

    def walk(path: str, vals: tuple[str, ...], depth: int) -> None:
        if depth == len(partition_keys):
            n, b = table_file_stats(path)
            if n:
                out[vals] = (n, b)
            return
        key = partition_keys[depth]
        for d in os.listdir(path):
            full = os.path.join(path, d)
            if os.path.isdir(full) and d.startswith(f"{key}="):
                walk(full, vals + (d[len(key) + 1 :],), depth + 1)

    walk(location, (), 0)
    return out


def compact_table(
    spark: SparkSession,
    location: str,
    fmt: str = "parquet",
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_keys: list[str] | None = None,
    shuffle: bool = True,
    options: dict[str, Any] | None = None,
) -> int | None:
    """Rewrite the table at ``location`` into ~``target_file_bytes`` files.

    Returns the output file count, or ``None`` if no compaction was needed
    (the table is untouched). ``shuffle=True`` uses ``repartition`` (even
    file sizes, one shuffle); ``shuffle=False`` uses ``coalesce`` (no
    shuffle, sizes follow input locality).

    Partitioned layouts are sized PER PARTITION: each hive partition gets
    ceil(partition_bytes / target) output files, with rows salted across
    them by a deterministic row hash — a 1 TB partition compacts to ~8x128MB
    files, not one 1 TB file, while small partitions still collapse to one.
    The per-partition plan is a driver-side directory listing (the same cost
    any scan's file index pays), broadcast back as a tiny (partition ->
    n_out) map. The rewrite commits through ``staged_write``, so a crash
    mid-compaction leaves the original table intact and a reader never sees
    a partial mix."""
    location = _strip_scheme(location).rstrip("/")
    n_out = plan_compaction(location, target_file_bytes)
    if n_out is None:
        return None
    df = spark.read.format(fmt).options(**{k: str(v) for k, v in (options or {}).items()}).load(location)
    if partition_keys:
        from pyspark.sql import functions as F

        stats = partition_dir_stats(location, list(partition_keys))
        rows = [
            (*vals, max(1, -(-b // target_file_bytes)))
            for vals, (_n, b) in sorted(stats.items())
        ]
        schema = ", ".join(f"_p_{i} string" for i in range(len(partition_keys)))
        nmap = spark.createDataFrame(rows, f"{schema}, _n_out int")
        cond = None
        for i, k in enumerate(partition_keys):
            c = df[k].cast("string") == nmap[f"_p_{i}"]
            cond = c if cond is None else (cond & c)
        data_cols = [c for c in df.columns if c not in set(partition_keys)]
        salt = F.pmod(F.xxhash64(*[df[c] for c in data_cols]), F.col("_n_out"))
        total = sum(r[-1] for r in rows) or 1
        # 8x over-provisioned shuffle partitions: hash placement of the
        # (partition, salt) groups rarely collides, so files land near the
        # target size (a rare collision merges two salt groups of the same
        # partition into one ~2x-target file — maintenance-grade, not
        # bin-packing-exact).
        df = (
            df.join(F.broadcast(nmap), cond)
            .withColumn("_salt", salt)
            .repartition(total * 8, *partition_keys, "_salt")
            .drop("_salt", "_n_out", *[f"_p_{i}" for i in range(len(partition_keys))])
        )
        n_out = total
    elif shuffle:
        df = df.repartition(n_out)
    else:
        df = df.coalesce(n_out)
    out: dict[str, Any] = {"location": location, "format": fmt}
    if partition_keys:
        out["partition_keys"] = list(partition_keys)
    if options:
        out["options"] = dict(options)
    staged_write(df, out)
    return n_out


def analyze_table(
    spark: SparkSession, table: str, columns: list[str] | None = None
) -> None:
    """Refresh table (and optionally column) statistics in the catalog —
    the other half of table maintenance alongside compaction. Size/row
    stats feed join-strategy selection (auto-broadcast); column histograms
    feed CBO (spark.sql.cbo.enabled) join reordering. Run after large
    writes or compactions so the optimizer sees current sizes."""
    spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS")
    if columns:
        cols = ", ".join(columns)
        spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS FOR COLUMNS {cols}")


STALE_MARKERS = (".__stage__", ".__old__")


def vacuum_stale_stages(root: str, dry_run: bool = False) -> list[str]:
    """Remove orphaned staged-write artifacts under ``root``.

    A crash between :func:`~glue_etl_framework_spark.io.writers.staged_write`'s
    stage-out and swap can strand ``<table>.__stage__<id>`` (never-committed
    new data) or ``<table>.__old__<id>`` (superseded backup) directories.
    Neither is ever referenced by readers — the live table is always at the
    unsuffixed path — so both are safe to delete at any time; this is the
    plain-file analogue of a table format's VACUUM of uncommitted files.

    Scans ``root`` recursively (driver-side directory walk — metadata only,
    no data read; on object stores this is a prefix listing) and removes
    any directory whose name contains a stale marker. With ``dry_run``
    the candidates are returned but kept. Returns the affected paths."""
    import shutil

    victims: list[str] = []
    for dirpath, dirnames, _ in os.walk(root, topdown=True):
        stale = [d for d in dirnames if any(m in d for m in STALE_MARKERS)]
        for d in stale:
            victims.append(os.path.join(dirpath, d))
            dirnames.remove(d)  # do not descend into a dir being removed
    if not dry_run:
        for v in victims:
            shutil.rmtree(v, ignore_errors=True)
    return sorted(victims)
