"""Properties of the count-min sketch operator (agg_countmin_sketch) that
the oracle hash-match alone can't state: the one-sided error guarantee over
the WHOLE vocabulary (the driver checks only the probe set) and cell-wise
mergeability (the reason the sketch is the 100 TB frequency path)."""

from __future__ import annotations

from pyspark.sql import functions as F

from glue_etl_framework_spark.queries.aggregates import (
    CM_DEPTH,
    CM_WIDTH,
    agg_countmin_sketch,
)
from tests.conftest import SF_SMOKE


def _cm_col(r, tok_col):
    return (
        F.conv(F.substring(F.md5(F.concat(F.lit(f"cm{r}:"), tok_col)), 1, 8), 16, 10)
        .cast("long") % CM_WIDTH
    )


def _cells(toks):
    rc = F.array(
        *[
            F.struct(F.lit(r).alias("r"), _cm_col(r, F.col("tok")).alias("c"))
            for r in range(CM_DEPTH)
        ]
    )
    return (
        toks.select(F.explode(rc).alias("rc"))
        .groupBy(F.col("rc.r").alias("r"), F.col("rc.c").alias("c"))
        .agg(F.count("*").alias("cell"))
    )


def _toks(spark):
    return (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    )


def test_countmin_never_underestimates_any_token(spark):
    """min-over-rows >= true count for EVERY token, not just the probe set."""
    toks = _toks(spark).select("tok")
    cells = _cells(toks)
    counts = toks.groupBy("tok").agg(F.count("*").alias("n"))
    rc = F.array(
        *[
            F.struct(F.lit(r).alias("r"), _cm_col(r, F.col("tok")).alias("c"))
            for r in range(CM_DEPTH)
        ]
    )
    est = (
        counts.select("tok", "n", F.explode(rc).alias("rc"))
        .join(
            F.broadcast(cells),
            (F.col("rc.r") == F.col("r")) & (F.col("rc.c") == F.col("c")),
        )
        .groupBy("tok", "n")
        .agg(F.min("cell").alias("cm_est"))
    )
    bad = est.filter(F.col("cm_est") < F.col("n")).count()
    assert bad == 0


def test_countmin_sketches_merge_by_cell_sum(spark):
    """sketch(A ∪ B) == cellwise_sum(sketch(A), sketch(B)) — the property
    that lets per-shard/per-day sketches union without re-scanning."""
    toks = _toks(spark)
    a = toks.filter(F.col("doc_id") % 2 == 0).select("tok")
    b = toks.filter(F.col("doc_id") % 2 == 1).select("tok")
    merged = (
        _cells(a)
        .unionByName(_cells(b))
        .groupBy("r", "c")
        .agg(F.sum("cell").alias("cell"))
    )
    whole = _cells(toks.select("tok"))
    diff = whole.join(merged, ["r", "c"], "full").filter(
        ~F.coalesce(whole["cell"], F.lit(0)).eqNullSafe(F.coalesce(merged["cell"], F.lit(0)))
    )
    assert diff.count() == 0


def test_countmin_output_bounded(spark):
    out = agg_countmin_sketch(spark, SF_SMOKE)
    assert out.count() <= 16
    assert out.filter(F.col("overshoot") < 0).count() == 0


def test_rendezvous_minimal_reshuffle(spark):
    """Dropping one shard from the HRW ring remaps ONLY that shard's docs:
    every other document's argmax over the remaining shards is unchanged."""
    from glue_etl_framework_spark.queries.llmops import HRW_SHARDS

    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select("doc_id")

    def ranked(n_shards):
        return F.array(
            *[
                F.struct(
                    F.md5(F.concat(F.lit(f"{s}:"), F.col("doc_id").cast("string"))).alias("h"),
                    F.lit(s).alias("shard"),
                )
                for s in range(n_shards)
            ]
        )

    both = d.select(
        "doc_id",
        F.array_max(ranked(HRW_SHARDS)).getField("shard").alias("full"),
        F.array_max(ranked(HRW_SHARDS - 1)).getField("shard").alias("reduced"),
    )
    moved_without_cause = both.filter(
        (F.col("full") != HRW_SHARDS - 1) & (F.col("full") != F.col("reduced"))
    ).count()
    assert moved_without_cause == 0
    # and the drained shard's docs all land somewhere in the remaining ring
    assert both.filter(F.col("reduced") == HRW_SHARDS - 1).count() == 0


def test_multiprobe_candidates_nest(spark):
    """Multi-probe LSH probes a superset of the plain buckets, so candidate
    sets and hits nest per query."""
    from glue_etl_framework_spark.queries.similarity import (
        similarity_lsh_multiprobe_recall,
    )

    out = similarity_lsh_multiprobe_recall(spark, SF_SMOKE).collect()
    assert out, "no query rows"
    for r in out:
        assert r.n_cand_multi >= r.n_cand_plain
        assert r.hits_multi >= r.hits_plain
