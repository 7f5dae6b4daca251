"""GlueTransform-equivalent DataFrame verbs (SURVEY.md §2.10).

Each function mirrors one documented GlueTransform reachable from the
reference's python-script jobs (star-import at glue_etl_framework.py:2) and
is implemented as stock DataFrame operations so Catalyst optimizes through
them. Scale notes inline where a verb has a non-obvious 100 TB shape.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Mapping
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _q(name: str) -> str:
    """Backtick-quote an identifier for F.col, escaping embedded backticks
    by doubling them (Spark's quoting rule). DynamicFrame-style data has
    arbitrary field names — a literal backtick in a JSON key crashed the
    bare f\"`{name}`\" interpolation with INVALID_ATTRIBUTE_NAME_SYNTAX
    (found by randomized schema fuzzing)."""
    return f"`{name.replace('`', '``')}`"


def apply_mapping(df: DataFrame, mapping: Iterable[tuple[str, str, str]]) -> DataFrame:
    """ApplyMapping: [(src, dst, dst_type)] — rename + cast per column in one
    projection."""
    return df.select(
        *[F.col(src).cast(dst_type).alias(dst) for src, dst, dst_type in mapping]
    )


def select_fields(df: DataFrame, fields: Iterable[str]) -> DataFrame:
    """SelectFields."""
    return df.select(*list(fields))


def drop_fields(df: DataFrame, fields: Iterable[str]) -> DataFrame:
    """DropFields."""
    return df.drop(*list(fields))


def rename_field(df: DataFrame, old: str, new: str) -> DataFrame:
    """RenameField."""
    return df.withColumnRenamed(old, new)


def filter_rows(df: DataFrame, predicate: Column | str) -> DataFrame:
    """Filter (predicate pushes down through Catalyst)."""
    return df.filter(predicate)


def map_rows(df: DataFrame, fn: Callable, schema: T.StructType | str) -> DataFrame:
    """Map: row-wise transform. Arrow-batched (mapInPandas) — the Pandas-UDF
    fast path, never row-at-a-time Python. ``fn`` maps a pandas DataFrame
    batch to a pandas DataFrame batch."""
    return df.mapInPandas(fn, schema=schema)


def resolve_choice(df: DataFrame, specs: Mapping[str, str]) -> DataFrame:
    """ResolveChoice: {column: action}. Actions: "cast:<type>" (coerce the
    ambiguous column), "project:<type>" (same cast; nulls where invalid —
    Spark cast semantics), "make_null" (null out). The DynamicFrame
    Choice-type never materializes in Spark — a permissive read gives one
    concrete type and this verb applies the user's resolution."""
    out = df
    for column, action in specs.items():
        if action.startswith(("cast:", "project:")):
            out = out.withColumn(column, F.col(column).cast(action.split(":", 1)[1]))
        elif action == "make_null":
            out = out.withColumn(column, F.lit(None).cast(df.schema[column].dataType))
        else:
            raise ValueError(f"unknown resolve_choice action {action!r}")
    return out


def join(left: DataFrame, right: DataFrame, keys1: list[str], keys2: list[str]) -> DataFrame:
    """Join.apply: equi-join on paired key lists."""
    cond = None
    for k1, k2 in zip(keys1, keys2):
        c = left[k1] == right[k2]
        cond = c if cond is None else cond & c
    return left.join(right, cond)


def union(df1: DataFrame, df2: DataFrame) -> DataFrame:
    """Union (by name, tolerating missing columns — DynamicFrame union
    semantics are schema-merging)."""
    return df1.unionByName(df2, allowMissingColumns=True)


def split_fields(df: DataFrame, paths: Iterable[str]) -> tuple[DataFrame, DataFrame]:
    """SplitFields -> (selected, rest)."""
    paths = list(paths)
    rest = [c for c in df.columns if c not in paths]
    return df.select(*paths), df.select(*rest)


def split_rows(df: DataFrame, predicate: Column | str) -> tuple[DataFrame, DataFrame]:
    """SplitRows -> (matching, non-matching)."""
    pred = F.expr(predicate) if isinstance(predicate, str) else predicate
    return df.filter(pred), df.filter(~pred)


def select_from_collection(frames: Iterable[DataFrame], index: int) -> DataFrame:
    """SelectFromCollection: pick one frame from a split result (the Glue
    DynamicFrameCollection is just a tuple of DataFrames here)."""
    return list(frames)[index]


def unbox(
    df: DataFrame,
    column: str,
    fmt: str = "json",
    schema: T.StructType | str | None = None,
    options: Mapping[str, str] | None = None,
) -> DataFrame:
    """Unbox: parse a string column into a typed struct (json or csv).
    Without an explicit schema the json variant infers it from ONE sampled
    non-null value (a single-row driver lookup, like Glue's inference pass
    — pass ``schema`` on wide tables to skip it); csv requires a schema."""
    opts = dict(options or {})
    if fmt == "json":
        if schema is None:
            sample = df.select(column).dropna().first()
            if sample is None:
                raise ValueError(f"cannot infer schema: column {column!r} is all null")
            schema = F.schema_of_json(F.lit(sample[0]))
        parsed = F.from_json(F.col(column), schema, opts)
    elif fmt == "csv":
        if schema is None:
            raise ValueError("unbox(fmt='csv') requires a schema")
        parsed = F.from_csv(F.col(column), F.lit(schema) if isinstance(schema, str) else F.lit(schema.simpleString()), opts)
    else:
        raise ValueError(f"unsupported unbox format {fmt!r}")
    return df.withColumn(column, parsed)


def unnest(df: DataFrame, separator: str = ".") -> DataFrame:
    """UnnestFrame: recursively flatten struct columns into top-level
    columns named parent<sep>child. Arrays are left intact (see
    relationalize for array explosion)."""
    while True:
        struct_cols = [
            f.name for f in df.schema.fields if isinstance(f.dataType, T.StructType)
        ]
        if not struct_cols:
            return df
        cols: list[Column] = []
        for field in df.schema.fields:
            if isinstance(field.dataType, T.StructType):
                for sub in field.dataType.fields:
                    cols.append(
                        F.col(f"{_q(field.name)}.{_q(sub.name)}").alias(
                            f"{field.name}{separator}{sub.name}"
                        )
                    )
            else:
                cols.append(F.col(_q(field.name)))
        df = df.select(*cols)


def relationalize(
    df: DataFrame, root_name: str, id_col: str = "_rid"
) -> dict[str, DataFrame]:
    """Relationalize: flatten nested structs and pivot each array column out
    to a child table keyed by (row id, array index) — the multi-table
    normalization GlueTransform. Returns {table_name: DataFrame}; the root
    table keeps scalars, each array column becomes ``root_name.col``.

    The row id is a deterministic content hash is NOT possible in general
    (duplicate rows), so monotonically_increasing_id is used — stable within
    one materialization, suitable for immediate write-out (as in Glue)."""
    frames: dict[str, DataFrame] = {}
    root = unnest(df.withColumn(id_col, F.monotonically_increasing_id()))
    for field in root.schema.fields:
        if isinstance(field.dataType, T.ArrayType):
            child = root.select(
                id_col, F.posexplode_outer(F.col(_q(field.name))).alias("index", "val")
            )
            if isinstance(field.dataType.elementType, T.StructType):
                child = unnest(child)
            frames[f"{root_name}.{field.name}"] = child
            root = root.drop(field.name)
    frames[root_name] = root
    return frames


def drop_null_fields(df: DataFrame) -> DataFrame:
    """DropNullFields: drop columns that are entirely null. One aggregate
    scan to count non-nulls (distributed), then a projection — the only
    driver-side data is one count per column."""
    counts = df.agg(
        *[F.count(F.col(_q(c))).alias(c) for c in df.columns]
    ).collect()[0]
    keep = [c for c in df.columns if counts[c] > 0]
    return df.select(*[F.col(_q(c)) for c in keep])


def fill_missing_values(df: DataFrame, values: Mapping[str, Any] | Any) -> DataFrame:
    """FillMissingValues (constant strategy): df.fillna. The reference's
    ML-imputation variant is out of scope (proprietary model)."""
    return df.fillna(values)


def spigot(df: DataFrame, path: str, n: int = 100, fraction: float | None = None) -> DataFrame:
    """Spigot: write a sample of the frame to JSON for inspection; returns
    the input unchanged (pass-through tap)."""
    sample = df.sample(fraction) if fraction is not None else df.limit(n)
    sample.write.mode("overwrite").json(path)
    return df


def errors_as_frame(spark, path: str, fmt: str = "json", schema: T.StructType | str | None = None,
                    options: Mapping[str, str] | None = None) -> tuple[DataFrame, DataFrame]:
    """ErrorsAsDynamicFrame equivalent: permissive read with a
    _corrupt_record column -> (good_rows, error_rows). For JSON/CSV sources;
    schema required for the corrupt-record column to surface."""
    reader = (
        spark.read.format(fmt)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .options(**dict(options or {}))
    )
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.load(path).cache()  # cache: corrupt-record requires stable scan
    good = df.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    return good, bad
