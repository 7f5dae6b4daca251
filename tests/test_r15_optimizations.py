"""Focused pins for the r15 optimization-round internals changes.

Two changes altered HOW plans are constructed without changing what they
compute; these tests pin the equivalence directly (the oracle harness pins
it end-to-end, but these fail closer to the cause):

1. ext.similarity.band_value_sql — hyperplane band values built as one
   SQL-string parse must be value- and dtype-identical to the unrolled
   Column construction they replaced (16 bands x 64 F.lit py4j calls).
2. queries.t's schema cache — the cached-schema read path must return the
   same rows and schema as the inference path, including the events
   TIMESTAMP(NANOS) special case.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from glue_etl_framework_spark.ext.similarity import (
    band_value_sql,
    hyperplane_signs,
    quantize_embeddings,
)
from glue_etl_framework_spark.queries import _SCHEMA_CACHE, t
from tests.conftest import SF_SMOKE


def _unrolled_band(b: int, band_bits: int = 8, dim: int = 64):
    """The pre-r15 construction, kept here as the reference semantics."""
    bits = []
    for k in range(band_bits):
        signs = F.array(*[F.lit(s) for s in hyperplane_signs(b * band_bits + k, dim)])
        proj = F.aggregate(
            F.zip_with(F.col("q"), signs, lambda x, s: x * s.cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj > 0, F.lit(1 << k)).otherwise(F.lit(0)))
    return sum(bits[1:], bits[0])


def test_band_value_sql_matches_unrolled_construction(spark):
    v = quantize_embeddings(t(spark, SF_SMOKE, "embeddings"))
    df = v.select(
        _unrolled_band(0).alias("o0"),
        F.expr(band_value_sql(0, 8, 64, "q")).alias("n0"),
        _unrolled_band(1).alias("o1"),
        F.expr(band_value_sql(1, 8, 64, "q")).alias("n1"),
    )
    assert dict(df.dtypes) == {"o0": "int", "n0": "int", "o1": "int", "n1": "int"}
    assert df.filter((F.col("o0") != F.col("n0")) | (F.col("o1") != F.col("n1"))).count() == 0


def test_schema_cache_read_path_matches_inference(spark):
    def fingerprint(df):
        row = (
            df.select(F.xxhash64(*df.columns).alias("x"))
            .agg(F.count("*").alias("c"), F.expr("bit_xor(x)").alias("h"))
            .collect()[0]
        )
        return (row["c"], row["h"])

    for table in ("lineitem", "events", "documents"):
        _SCHEMA_CACHE.pop((SF_SMOKE, table), None)
        first = t(spark, SF_SMOKE, table)  # inference path (populates cache)
        assert (SF_SMOKE, table) in _SCHEMA_CACHE
        second = t(spark, SF_SMOKE, table)  # cached-schema path
        assert second.schema == first.schema
        assert fingerprint(second) == fingerprint(first)
    # the events nanos special case must survive the cached path
    assert dict(t(spark, SF_SMOKE, "events").dtypes)["ts"] == "timestamp"
