"""Properties of the count-min sketch operator (agg_countmin_sketch) that
the oracle hash-match alone can't state: the one-sided error guarantee over
the WHOLE vocabulary (the driver checks only the probe set) and cell-wise
mergeability (the reason the sketch is the 100 TB frequency path)."""

from __future__ import annotations

from pyspark.sql import functions as F

from glue_etl_framework_spark.queries.aggregates import (
    agg_countmin_sketch,
    cm_cells as _cells,
    cm_rc_array,
)
from tests.conftest import SF_SMOKE


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
    est = (
        counts.select("tok", "n", F.explode(cm_rc_array(F.col("tok"))).alias("rc"))
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
    # and every doc — including the drained shard's — gets a VALID shard in
    # the remaining ring (non-null, in range; 'reduced == HRW_SHARDS-1' would
    # be vacuous since that shard isn't in the reduced argmax at all)
    invalid = both.filter(
        F.col("reduced").isNull()
        | (F.col("reduced") < 0)
        | (F.col("reduced") > HRW_SHARDS - 2)
    ).count()
    assert invalid == 0
    drained = both.filter(F.col("full") == HRW_SHARDS - 1).count()
    assert drained > 0  # the property is only meaningful if the drained shard had docs


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


def test_jl_projection_preserves_distances_on_average(spark):
    """JL audit: the k-normalized projected distances are an unbiased
    estimate of the true distances — their mean ratio sits near 1, far
    from the un-normalized 1/4 (the bug this test would have caught)."""
    from glue_etl_framework_spark.queries.similarity import (
        JL_SCALE,
        similarity_jl_projection_audit,
    )
    from tests.conftest import SF_ORACLE

    rows = similarity_jl_projection_audit(spark, SF_ORACLE).collect()
    assert len(rows) >= 40
    mean_ratio = sum(r.ratio_fp for r in rows) / len(rows) / JL_SCALE
    assert 0.7 < mean_ratio < 1.4, mean_ratio
    # no pair wildly distorted (JL eps bound is ~sqrt(ln n / k) ~ 0.5)
    assert all(0.2 * JL_SCALE < r.ratio_fp < 3.0 * JL_SCALE for r in rows)
