"""Bloom prefilter invariants (dedup_bloom_prefilter): the guarantees a
production pipeline relies on when it prunes with the filter instead of the
exact join — no false negatives, a measurable (not catastrophic) false-
positive rate at the fixture m/n, and a flag that is exactly "any bloom-
positive shingle"."""

from __future__ import annotations

from pyspark.sql import functions as F

from glue_etl_framework_spark.queries import load_registry
from tests.conftest import SF_ORACLE

REGISTRY = load_registry()


def _result(spark):
    return REGISTRY["dedup_bloom_prefilter"].fn(spark, SF_ORACLE).cache()


def test_no_false_negatives(spark):
    """Every true shingle overlap is bloom-positive: n_bloom_hits >=
    n_true_hits row-by-row. This is THE property that makes bloom pruning
    sound (a pruned doc can never have been a true duplicate)."""
    df = _result(spark)
    assert df.filter(F.col("n_bloom_hits") < F.col("n_true_hits")).count() == 0


def test_false_positive_rate_bounded(spark):
    """The FP rate among truly-novel shingles is nonzero (the FP code path
    is exercised at fixture scale) but far below saturation — if this
    creeps toward 1.0 the filter stopped pruning and BLOOM_BITS needs to
    grow with the reference shingle count."""
    agg = _result(spark).agg(
        F.sum("n_shingles").alias("n"),
        F.sum("n_bloom_hits").alias("b"),
        F.sum("n_true_hits").alias("t"),
    ).collect()[0]
    novel = agg["n"] - agg["t"]
    fp = (agg["b"] - agg["t"]) / novel
    assert 0 < fp < 0.25, f"FP rate {fp:.4f} outside expected band"


def test_flag_matches_bloom_hits(spark):
    df = _result(spark)
    bad = df.filter(
        (F.col("flagged") == 1) != (F.col("n_bloom_hits") > 0)
    ).count()
    assert bad == 0
