"""Unit tests for the GlueTransform-equivalent verbs (SURVEY.md §2.10)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from glue_etl_framework_spark import transforms as X


@pytest.fixture()
def df(spark):
    return spark.createDataFrame(
        [(1, "a", 10.5, None), (2, "b", None, "x"), (3, None, 3.25, None)],
        "id int, name string, score double, only_sometimes string",
    )


def test_apply_mapping(df):
    out = X.apply_mapping(df, [("id", "user_id", "bigint"), ("score", "pts", "string")])
    assert out.columns == ["user_id", "pts"]
    assert dict(out.dtypes) == {"user_id": "bigint", "pts": "string"}
    assert out.filter("user_id = 1").first().pts == "10.5"


def test_select_drop_rename(df):
    assert X.select_fields(df, ["id", "name"]).columns == ["id", "name"]
    assert "score" not in X.drop_fields(df, ["score"]).columns
    assert "nm" in X.rename_field(df, "name", "nm").columns


def test_filter_and_split_rows(df):
    assert X.filter_rows(df, "id > 1").count() == 2
    hit, miss = X.split_rows(df, "id > 1")
    assert (hit.count(), miss.count()) == (2, 1)


def test_map_rows_arrow_batched(df):
    def double_score(batches):
        for b in batches:
            yield pd.DataFrame({"id": b["id"], "score2": b["score"] * 2})

    out = X.map_rows(df, double_score, "id int, score2 double")
    assert out.filter("id = 1").first().score2 == 21.0


def test_resolve_choice(df):
    out = X.resolve_choice(df, {"score": "cast:string", "only_sometimes": "make_null"})
    assert dict(out.dtypes)["score"] == "string"
    assert out.filter(F.col("only_sometimes").isNotNull()).count() == 0
    with pytest.raises(ValueError):
        X.resolve_choice(df, {"score": "explode"})


def test_join_union(spark, df):
    other = spark.createDataFrame([(1, "EN"), (3, "DE")], "uid int, lang string")
    joined = X.join(df, other, ["id"], ["uid"])
    assert joined.count() == 2
    u = X.union(df.select("id", "name"), other.withColumnRenamed("uid", "id"))
    assert u.count() == 5
    assert set(u.columns) == {"id", "name", "lang"}


def test_split_fields(df):
    a, b = X.split_fields(df, ["id"])
    assert a.columns == ["id"] and "id" not in b.columns


def test_unnest(spark):
    df = spark.createDataFrame(
        [(1, {"x": 1, "y": {"z": "deep"}})],
        "id int, s struct<x:int, y:struct<z:string>>",
    )
    out = X.unnest(df)
    assert set(out.columns) == {"id", "s.x", "s.y.z"}
    assert out.first()["s.y.z"] == "deep"


def test_relationalize(spark):
    df = spark.createDataFrame(
        [(1, [10, 20], {"a": 1}), (2, [], {"a": 2})],
        "id int, vals array<int>, meta struct<a:int>",
    )
    frames = X.relationalize(df, "root")
    assert set(frames) == {"root", "root.vals"}
    root = frames["root"]
    assert {"id", "meta.a", "_rid"} <= set(root.columns)
    child = frames["root.vals"]
    got = {(r["index"], r["val"]) for r in child.collect()}
    assert (0, 10) in got and (1, 20) in got and (None, None) in got  # outer explode


def test_unnest_relationalize_hostile_names(spark):
    """Column/field names containing backticks, dots, and spaces must
    flatten cleanly — DynamicFrame-style data has arbitrary JSON keys. A
    literal backtick used to crash the identifier interpolation with
    INVALID_ATTRIBUTE_NAME_SYNTAX (found by randomized schema fuzzing)."""
    schema = T.StructType(
        [
            T.StructField("a`b", T.LongType()),
            T.StructField(
                "s.t",
                T.StructType(
                    [
                        T.StructField("x y", T.LongType()),
                        T.StructField("q`", T.ArrayType(T.LongType())),
                    ]
                ),
            ),
        ]
    )
    df = spark.createDataFrame([(1, (2, [7, 8])), (3, (4, []))], schema)
    flat = X.unnest(df)
    assert set(flat.columns) == {"a`b", "s.t.x y", "s.t.q`"}
    assert sorted(r["s.t.x y"] for r in flat.collect()) == [2, 4]
    frames = X.relationalize(df, "root")
    assert set(frames) == {"root", "root.s.t.q`"}
    vals = {r["val"] for r in frames["root.s.t.q`"].collect()}
    assert vals == {7, 8, None}
    kept = X.drop_null_fields(df.withColumn("dead`col", F.lit(None).cast("string")))
    assert "dead`col" not in kept.columns and "a`b" in kept.columns


def test_drop_null_fields(spark):
    df = spark.createDataFrame([(1, None, "x"), (2, None, None)], "a int, b string, c string")
    out = X.drop_null_fields(df)
    assert out.columns == ["a", "c"]


def test_fill_missing_values(df):
    out = X.fill_missing_values(df, {"score": 0.0, "name": "?"})
    assert out.filter("score = 0.0").count() == 1
    assert out.filter("name = '?'").count() == 1


def test_spigot(tmp_path, spark, df):
    out = X.spigot(df, str(tmp_path / "tap"), n=2)
    assert out is df
    assert spark.read.json(str(tmp_path / "tap")).count() == 2


def test_errors_as_frame(tmp_path, spark):
    p = tmp_path / "data.json"
    p.write_text('{"a": 1}\n{"a": broken}\n{"a": 3}\n')
    good, bad = X.errors_as_frame(spark, str(p), schema="a bigint, _corrupt_record string")
    assert sorted(r.a for r in good.collect()) == [1, 3]
    assert bad.count() == 1 and "broken" in bad.first()._corrupt_record


def test_unbox_json_infers_and_parses(spark):
    from glue_etl_framework_spark.transforms.verbs import unbox

    df = spark.createDataFrame(
        [(1, '{"a": 5, "b": "x"}'), (2, '{"a": 7, "b": "y"}')], "id int, payload string"
    )
    out = unbox(df, "payload")
    assert out.select("payload.a").rdd.map(lambda r: r[0]).collect() == [5, 7]
    assert out.filter("payload.b = 'y'").count() == 1


def test_unbox_csv_with_schema(spark):
    from glue_etl_framework_spark.transforms.verbs import unbox

    df = spark.createDataFrame([(1, "5|x")], "id int, payload string")
    out = unbox(df, "payload", fmt="csv", schema="a int, b string", options={"sep": "|"})
    row = out.first().payload
    assert (row.a, row.b) == (5, "x")


def test_select_from_collection(spark):
    from glue_etl_framework_spark.transforms.verbs import (
        select_from_collection,
        split_rows,
    )

    df = spark.createDataFrame([(1,), (2,), (3,)], "k int")
    frames = split_rows(df, "k > 1")
    assert select_from_collection(frames, 0).count() == 2
    assert select_from_collection(frames, 1).count() == 1
