"""Sink dispatch: DataFrame -> file path or catalog table.

Maps the reference's ``write_dynamic_frame``-equivalent block
(/root/reference/glue/glue_etl_framework.py:190-270):

- output layout knobs ``repartition`` / ``coalesce`` / ``partition_keys``
  (reference :196-207) -> ``df.repartition/coalesce`` + ``write.partitionBy``.
- ``refresh: full`` (default, reference :212-213, purge at :217-219/:240-243)
  -> ``mode("overwrite")`` — no manual recursive delete needed.
- ``refresh: incremental`` (README.md:55,68 "UPSERT") -> ``mode("append")``;
  on partitioned tables with ``spark.sql.sources.partitionOverwriteMode=
  dynamic`` (our session default) ``incremental`` rewrites only the
  partitions present in the result — honest partition-level upsert.
  Key-level MERGE is :func:`upsert_by_key`.
- governed-table transactions (reference :237-266) -> :func:`staged_write`,
  a staged-directory + atomic-rename commit on plain files.

At 100 TB: writes are partitioned (partition pruning for readers), file
count is controlled by repartition/coalesce, and nothing is collected to
the driver.
"""

from __future__ import annotations

import os
import shutil
import uuid
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SUPPORTED_FORMATS = {"parquet", "csv", "json", "orc", "avro", "xml", "text"}


def _strip_scheme(path: str) -> str:
    # Accept both file://host-less and the file:/p single-slash rendering
    # that Spark's catalog (DESCRIBE FORMATTED) uses for local locations.
    if path.startswith("file://"):
        return path[len("file://"):]
    if path.startswith("file:/"):
        return path[len("file:"):]
    return path


def _layout(df: DataFrame, output: dict[str, Any]) -> tuple[DataFrame, list[str]]:
    """Apply repartition/coalesce (reference :196-202: repartition wins) and
    parse partition_keys (comma-separated string or list, reference :204-207)."""
    repartition = output.get("repartition")
    coalesce = output.get("coalesce")
    if repartition:
        df = df.repartition(int(repartition))
    elif coalesce:
        df = df.coalesce(int(coalesce))
    keys = output.get("partition_keys") or []
    if isinstance(keys, str):
        keys = [k.strip() for k in keys.split(",") if k.strip()]
    return df, list(keys)


def _write_avro_fallback(
    df: DataFrame, location: str, refresh: str, partition_keys: list[str]
) -> None:
    """Jar-less avro sink via the pure-Python codec (io/avro_py.py):
    refresh=full clears prior ``*.avro`` part files then writes one file per
    partition; refresh=incremental appends new part files. Hive-style
    ``partition_keys`` layouts need the native datasource — raise rather
    than silently flatten the layout."""
    import glob as _glob
    import logging
    import os

    from glue_etl_framework_spark.io.avro_py import write_avro
    from glue_etl_framework_spark.session import avro_package

    if partition_keys:
        raise RuntimeError(
            "partitioned avro output needs the native spark-avro datasource "
            f"({avro_package()}); the pure-Python fallback writes unpartitioned "
            "part files only"
        )
    logging.getLogger("glue_etl_framework_spark").warning(
        "spark-avro datasource (%s) not on classpath; writing %s with the "
        "pure-Python avro codec (io/avro_py.py)",
        avro_package(),
        location,
    )
    location = _strip_scheme(location)
    if refresh == "full":
        for old in _glob.glob(os.path.join(location, "*.avro")):
            os.remove(old)
    write_avro(df, location)


def write_table(df: DataFrame, output: dict[str, Any]) -> None:
    """Write the query result per the ``output_table`` config block
    (README.md:51-58): keys ``target`` (file|catalog), ``location``,
    ``format`` (default parquet — the reference's 'glueparquet' default at
    :209-210 is Spark's native parquet writer here), ``partition_keys``,
    ``repartition``/``coalesce``, ``refresh`` (full|incremental),
    ``database``/``table_name`` for catalog targets, ``options`` passthrough.
    """
    target = str(output.get("target", output.get("sink", "file"))).lower()
    fmt = str(output.get("format", "parquet")).lower()
    if fmt == "glueparquet":  # reference default name, same writer here
        fmt = "parquet"
    if fmt not in SUPPORTED_FORMATS:
        raise ValueError(f"unsupported output format {fmt!r}")
    refresh = str(output.get("refresh", "full")).lower()
    if refresh not in {"full", "incremental"}:
        raise ValueError(f"refresh must be 'full' or 'incremental', got {refresh!r}")
    df, partition_keys = _layout(df, output)

    # Glue-style format_options on the SINK (README.md output_table row)
    # translate exactly like the source side; plain 'options' pass through.
    from glue_etl_framework_spark.io.readers import _translate_options

    opts = _translate_options(output.get("format_options"))
    opts.update({k: str(v) for k, v in (output.get("options") or {}).items()})
    writer = df.write.format(fmt).options(**opts)
    if partition_keys:
        writer = writer.partitionBy(*partition_keys)
    if refresh == "full":
        writer = writer.mode("overwrite")
    elif partition_keys:
        # Partition-level upsert (README.md:68): only partitions present in
        # df are replaced. The semantics are set PER-WRITE so incremental
        # refresh is safe even on a session without our get_spark default of
        # spark.sql.sources.partitionOverwriteMode=dynamic.
        writer = writer.mode("overwrite").option("partitionOverwriteMode", "dynamic")
    else:
        writer = writer.mode("append")

    if target in {"file", "s3"}:
        location = output.get("location")
        if not location:
            raise ValueError("file target requires 'location'")
        try:
            writer.save(str(location))
        except Exception as exc:  # noqa: BLE001 - avro fallback, see readers.py
            if fmt == "avro" and "Failed to find data source" in str(exc):
                _write_avro_fallback(df, str(location), refresh, partition_keys)
            else:
                raise
    elif target == "jdbc":
        # Mirror of the JDBC source (readers.py): the reference stubs JDBC
        # entirely (glue_etl_framework.py:119-120); here it is a real writer.
        # refresh=full overwrites (truncate semantics left to the JDBC
        # dialect), incremental appends.
        options = {k: str(v) for k, v in (output.get("options") or {}).items()}
        for key in ("url", "dbtable", "user", "password", "driver"):
            if key in output:
                options.setdefault(key, str(output[key]))
        if "dbtable" not in options and (output.get("table_name") or output.get("name")):
            options["dbtable"] = str(output.get("table_name") or output.get("name"))
        # README: 'schema' qualifies the destination table for JDBC targets
        schema = output.get("schema")
        if schema and "dbtable" in options and "." not in options["dbtable"]:
            options["dbtable"] = f"{schema}.{options['dbtable']}"
        if "url" not in options or "dbtable" not in options:
            raise ValueError("jdbc target requires 'url' and 'dbtable'")
        mode = "overwrite" if refresh == "full" else "append"
        df.write.format("jdbc").options(**options).mode(mode).save()
    elif target in {"catalog", "gdc"}:
        database = output.get("database")
        name = output.get("table_name") or output.get("name")
        if not database or not name:
            raise ValueError("catalog target requires 'database' and 'table_name'")
        spark = df.sparkSession
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}")
        table = f"{database}.{name}"
        if refresh == "incremental" and spark.catalog.tableExists(table):
            # insertInto resolves columns POSITIONALLY — align df to the
            # table's column order first so a reordered query can't silently
            # write values into the wrong columns.
            aligned = df.select(*spark.table(table).columns)
            part_cols = [c.name for c in spark.catalog.listColumns(table) if c.isPartition]
            w = aligned.write.format(fmt)
            if part_cols:
                # Dynamic partition overwrite replaces only the partitions
                # present in df (UPDATE_IN_DATABASE semantics of the
                # reference's catalog sink, :245-258). insertInto ignores
                # writer-level options (unlike .save), so force the session
                # conf for the duration of this write and restore it after.
                conf_key = "spark.sql.sources.partitionOverwriteMode"
                prev = spark.conf.get(conf_key, None)
                spark.conf.set(conf_key, "dynamic")
                try:
                    w.mode("overwrite").insertInto(table)
                finally:
                    if prev is None:
                        spark.conf.unset(conf_key)
                    else:
                        spark.conf.set(conf_key, prev)
            else:
                # A NON-partitioned table has no partitions to scope an
                # overwrite, so overwrite-insertInto would truncate the whole
                # table; incremental means append (mirrors the file branch).
                w.mode("append").insertInto(table)
        else:
            location = output.get("location")
            if location:
                writer = writer.option("path", str(location))
            writer.saveAsTable(table)
    else:
        raise ValueError(f"unknown target type {target!r}")


def staged_write(df: DataFrame, output: dict[str, Any]) -> str:
    """Transactional write: stage to a temp dir next to the target, then
    atomically swap into place (replaces the reference's Lake Formation
    governed transaction, glue_etl_framework.py:237-266 — begin/commit/
    cancel). On failure the stage dir is removed and the previous data is
    restored (cancel_transaction equivalent, :264-266); the old data is
    deleted only after the new data is live. Returns the final location.

    File targets: stage dir + os.rename (atomic on a local FS; on object
    stores this maps to a manifest swap). Catalog targets (the reference's
    governed-table path, :245-266): see :func:`_staged_write_catalog` —
    stage dir + ``ALTER TABLE ... SET LOCATION`` metadata swap, so readers
    see either the old table or the new one, never a partial write."""
    target = str(output.get("target", output.get("sink", "file"))).lower()
    if target in {"catalog", "gdc"}:
        return _staged_write_catalog(df, output)
    location = _strip_scheme(str(output["location"]).rstrip("/"))
    stage = f"{location}.__stage__{uuid.uuid4().hex[:8]}"
    staged_cfg = dict(output)
    staged_cfg["target"] = "file"
    staged_cfg["location"] = stage
    staged_cfg["refresh"] = "full"
    try:
        write_table(df, staged_cfg)
        backup = f"{location}.__old__{uuid.uuid4().hex[:8]}"
        had_old = os.path.exists(location)
        if had_old:
            os.rename(location, backup)
        try:
            os.rename(stage, location)
        except BaseException:
            # Commit failed after the old dir was moved aside: put the old
            # data back before cleanup, or the target would be left empty.
            if had_old:
                os.rename(backup, location)
            raise
        if had_old:
            shutil.rmtree(backup, ignore_errors=True)
    except BaseException:
        shutil.rmtree(stage, ignore_errors=True)
        raise
    return location


def _table_location(spark: SparkSession, table: str) -> str | None:
    for row in spark.sql(f"DESCRIBE FORMATTED {table}").collect():
        if (row.col_name or "").strip() == "Location":
            return _strip_scheme((row.data_type or "").strip())
    return None


def _staged_write_catalog(df: DataFrame, output: dict[str, Any]) -> str:
    """Governed catalog write: stage the data to a fresh directory, then
    commit with a single metastore operation — ``ALTER TABLE ... SET
    LOCATION`` for an existing table (metadata-only, atomic at the
    metastore; the old directory is deleted only afterwards), or ``CREATE
    TABLE ... LOCATION`` for a new one. A failure during the stage write
    leaves the old table fully readable and removes the stage dir (the
    reference's cancel_transaction, glue_etl_framework.py:264-266).

    Schema note: the swap keeps the table's registered schema; a governed
    full refresh that *changes* the schema should drop+recreate instead
    (same as the reference's recreate_table path, :217-233)."""
    database = output.get("database")
    name = output.get("table_name") or output.get("name")
    if not database or not name:
        raise ValueError("catalog target requires 'database' and 'table_name'")
    fmt = str(output.get("format", "parquet")).lower()
    if fmt == "glueparquet":
        fmt = "parquet"
    spark = df.sparkSession
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}")
    table = f"{database}.{name}"
    exists = spark.catalog.tableExists(table)
    old_loc = _table_location(spark, table) if exists else None
    base = _strip_scheme(
        str(
            output.get("location")
            or old_loc
            or os.path.join(
                _strip_scheme(spark.conf.get("spark.sql.warehouse.dir")),
                f"{database}.db",
                str(name),
            )
        ).rstrip("/")
    )
    stage = f"{base}.__stage__{uuid.uuid4().hex[:8]}"
    staged_cfg = dict(output)
    staged_cfg["target"] = "file"
    staged_cfg["location"] = stage
    staged_cfg["refresh"] = "full"
    partition_keys = output.get("partition_keys") or []
    if isinstance(partition_keys, str):
        partition_keys = [k.strip() for k in partition_keys.split(",") if k.strip()]
    try:
        write_table(df, staged_cfg)
        if exists:
            spark.sql(f"ALTER TABLE {table} SET LOCATION '{stage}'")
            # The ALTER is the commit point; the old directory is dead data
            # from here on. Delete it BEFORE the partition sync: SYNC drops
            # only partitions whose directory is gone, so stale entries
            # (which still point into the old root) must lose their files
            # first.
            if old_loc and os.path.exists(old_loc) and old_loc != stage:
                shutil.rmtree(old_loc, ignore_errors=True)
            part_cols = [c.name for c in spark.catalog.listColumns(table) if c.isPartition]
            if part_cols:
                spark.sql(f"MSCK REPAIR TABLE {table} SYNC PARTITIONS")
            spark.catalog.refreshTable(table)
        else:
            # CREATE TABLE ... PARTITIONED BY requires an explicit column
            # list; render it from the written DataFrame's schema (partition
            # columns keep their position — PARTITIONED BY names them).
            cols = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
            ddl = f"CREATE TABLE {table} ({cols}) USING {fmt} "
            if partition_keys:
                ddl += f"PARTITIONED BY ({', '.join(partition_keys)}) "
            ddl += f"LOCATION '{stage}'"
            spark.sql(ddl)
            if partition_keys:
                spark.sql(f"MSCK REPAIR TABLE {table}")
    except BaseException:
        shutil.rmtree(stage, ignore_errors=True)
        raise
    return stage


def upsert_by_key(
    spark: SparkSession,
    new_rows: DataFrame,
    location: str,
    keys: list[str],
    fmt: str = "parquet",
    order_by: str | None = None,
) -> None:
    """Key-level MERGE (last-writer-wins) on a plain-file table: existing
    rows whose key appears in ``new_rows`` are replaced, others kept —
    ``old ANTI-JOIN new  UNION ALL  new`` rewritten via a staged commit.
    This is README.md:68's non-partitioned "UPSERT" claim done honestly
    without a table format. At scale prefer a partitioned table + dynamic
    partition overwrite so only touched partitions rewrite.

    Scale notes: the anti-join carries NO broadcast hint — a 100 TB
    incremental batch is not broadcast-safe, so the join strategy is left
    to AQE (it still broadcasts genuinely small batches). No checkpoint is
    needed either: ``staged_write`` materializes the merged plan into the
    stage directory while the old files are still in place, so the scan
    never races the swap. ``order_by`` names a column that resolves
    intra-batch duplicate keys deterministically (greatest wins, e.g. an
    update timestamp); without it the winner among same-key batch rows is
    arbitrary (Spark's dropDuplicates)."""
    location = _strip_scheme(location)
    if order_by is not None:
        agg = F.max_by(F.struct(*new_rows.columns), F.col(order_by)).alias("_row")
        deduped_new = new_rows.groupBy(*keys).agg(agg).select("_row.*")
    else:
        deduped_new = new_rows.dropDuplicates(keys)
    if os.path.exists(location):
        old = spark.read.format(fmt).load(location)
        merged = old.join(deduped_new.select(*keys).distinct(), keys, "left_anti") \
                    .unionByName(deduped_new)
    else:
        merged = deduped_new
    staged_write(merged, {"location": location, "format": fmt})


def delete_by_keys(
    spark: SparkSession,
    location: str,
    keys_df: DataFrame,
    keys: list[str],
    fmt: str = "parquet",
) -> int:
    """Keyed hard delete on a plain-file table (the right-to-be-forgotten /
    GDPR erasure primitive): rows whose key appears in ``keys_df`` are
    removed via ``old ANTI-JOIN keys`` and the survivors replace the table
    through the same staged atomic commit as writes — a crash mid-delete
    leaves the old table fully readable, never a half-deleted directory.
    Returns the number of rows deleted.

    Scale notes: the deletion key set joins without a broadcast hint (an
    erasure backlog can be arbitrarily large; AQE still broadcasts small
    ones). The rewrite cost is the table scan — on a partitioned layout,
    pre-filter ``keys_df`` per partition and rewrite only affected
    partitions (partition pruning makes the anti-join scan skip the rest).
    The deleted-row count comes from ONE ``observe`` over the ONE rewrite
    job — no separate before/after count jobs re-scanning the table
    (ADVICE r02). Both metrics live in a SINGLE CollectMetrics node placed
    ABOVE the join: AQE's empty-relation propagation replaces a
    runtime-empty join subtree wholesale and completes any CollectMetrics
    *inside* it with a schema-less row that Observation.get cannot decode
    (hit when the table is already empty — found by the upsert/delete
    replay property test), while the node above the join survives the
    rewrite and reports zeros. The anti-join is therefore expressed as
    LEFT OUTER against the (distinct) key set plus a match-marker filter
    placed above the metrics — identical join-strategy choices for AQE,
    and CollectMetrics is an optimizer barrier so the filter cannot be
    pushed below the counts it must not affect.
    """
    from pyspark.sql import Observation

    location = _strip_scheme(location)
    obs = Observation()
    old = spark.read.format(fmt).load(location)
    # Marker must not collide with a real table column (arbitrary field
    # names are in-scope): a table that already has "__hit" would make the
    # post-join reference ambiguous and the drop() would destroy user data.
    # Compared case-insensitively: Spark resolves columns case-insensitively
    # by default (spark.sql.caseSensitive=false), so a table column "__HIT"
    # collides with marker "__hit" even though the Python strings differ
    # (ADVICE r07).
    marker = "__hit"
    lowered = {c.lower() for c in old.columns}
    while marker.lower() in lowered:
        marker += "_"
    key_set = keys_df.select(*keys).distinct().withColumn(marker, F.lit(1))
    survivors = (
        old.join(key_set, keys, "left")
        .observe(
            obs,
            F.count(F.lit(1)).alias("scanned"),
            F.count(F.when(F.col(marker).isNull(), 1)).alias("kept"),
        )
        .filter(F.col(marker).isNull())
        .drop(marker)
    )
    staged_write(survivors, {"location": location, "format": fmt})
    metrics = obs.get
    return metrics["scanned"] - metrics["kept"]


def scd2_merge(
    current: DataFrame | None,
    updates: DataFrame,
    keys: list[str],
    ts_col: str,
) -> DataFrame:
    """Slowly-changing-dimension type-2 MERGE: maintain full attribute
    history with ``valid_from`` / ``valid_to`` / ``is_current`` columns —
    the dimension-table pattern the reference's upsert config cannot
    express (glue/glue_etl_framework.py:128 keeps only latest rows).

    ``updates`` carries ``keys + attributes + ts_col``; ``current`` is a
    prior output of this function (or None to initialize). Per batch:
    the latest update per key wins (deterministic lexicographic max on
    ``(ts, attributes)``); a changed attribute set closes the open row at
    the update timestamp and opens a new one; unchanged and update-less
    keys pass through untouched; history rows are never rewritten.

    Scale design: one keyed shuffle for the per-key latest-update
    aggregate and one for the full-outer join of OPEN rows with updates —
    the (much larger, append-only) closed-history side is unioned back
    without a shuffle. Branching happens in a single pass by building an
    array of 1-2 row structs per joined key and exploding it, so the join
    is computed once, not once per branch. No broadcast hint (AQE
    broadcasts genuinely small batches), nothing collected to the driver.
    """
    attrs = [c for c in updates.columns if c not in keys and c != ts_col]
    latest = (
        updates.groupBy(*keys)
        .agg(F.max(F.struct(F.col(ts_col).alias("_ts"), *attrs)).alias("_r"))
        .select(*keys, "_r._ts", *[F.col(f"_r.{a}").alias(f"_u_{a}") for a in attrs])
    )
    if current is None:
        return latest.select(
            *keys,
            *[F.col(f"_u_{a}").alias(a) for a in attrs],
            F.col("_ts").alias("valid_from"),
            F.lit(None).cast(latest.schema["_ts"].dataType).alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
    open_rows = current.filter(F.col("is_current"))
    history = current.filter(~F.col("is_current"))
    j = open_rows.join(latest, keys, "full_outer")

    def row(attr_src: str, valid_from, valid_to, is_current):
        cols = [F.col(k).alias(k) for k in keys]
        cols += [
            (F.col(f"_u_{a}") if attr_src == "update" else F.col(a)).alias(a)
            for a in attrs
        ]
        cols += [
            valid_from.alias("valid_from"),
            valid_to.alias("valid_to"),
            F.lit(is_current).alias("is_current"),
        ]
        return F.struct(*cols)

    null_ts = F.lit(None).cast(latest.schema["_ts"].dataType)
    keep = row("current", F.col("valid_from"), F.col("valid_to"), True)
    new_open = row("update", F.col("_ts"), null_ts, True)
    closed = row("current", F.col("valid_from"), F.col("_ts"), False)
    changed = F.lit(False)
    for a in attrs:
        changed = changed | ~F.col(a).eqNullSafe(F.col(f"_u_{a}"))
    no_update = F.col("_ts").isNull()
    new_key = ~no_update & F.col("is_current").isNull()
    rows = (
        F.when(no_update, F.array(keep))
        .when(new_key, F.array(new_open))
        .when(changed, F.array(closed, new_open))
        .otherwise(F.array(keep))
    )
    merged = j.select(F.explode(rows).alias("_row")).select("_row.*")
    return history.select(merged.columns).unionByName(merged)
