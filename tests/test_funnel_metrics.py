"""Per-stage funnel metrics through the composite curation pipelines
(VERDICT r13 item 3): a production run reads its whole funnel's removal
and recall exposure from ONE dict — quality/exact/near-dup removals, hot
buckets + dropped band rows when a cap engages, CC rounds — while the
default (metrics=None) keeps the registry plans byte-identical (pinned
globally by the PLANS.md regen)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from glue_etl_framework_spark.queries.curation import (
    pipeline_incremental_ingest,
    pipeline_training_data_curation,
)

SF = "/root/testdata/sf0.001"


def test_curation_funnel_reconciles_and_output_unchanged(spark):
    m: dict = {}
    audited = pipeline_training_data_curation(spark, SF, metrics=m).collect()
    default = pipeline_training_data_curation(spark, SF).collect()
    assert sorted(map(tuple, audited)) == sorted(map(tuple, default))
    # the funnel is exact arithmetic, not estimates
    assert m["input_docs"] == spark.read.parquet(f"{SF}/documents.parquet").count()
    assert m["output_docs"] == len(audited)
    assert (
        m["input_docs"]
        - m["quality_removed"]
        - m["exact_removed"]
        - m["neardup_removed"]
        == m["output_docs"]
    )
    for k in ("quality_removed", "exact_removed", "neardup_removed"):
        assert m[k] >= 0, k
    # no cap passed -> no cap keys pretend-engaged
    assert "hot_buckets" not in m


def test_curation_cap_engages_into_same_dict(spark):
    """An explicit stage-3 cap writes its dropped mass into the SAME
    metrics dict, and capping can only shrink the loser set (the capped
    output is a superset of the uncapped one)."""
    m: dict = {}
    capped = {
        r["doc_id"]
        for r in pipeline_training_data_curation(
            spark, SF, max_bucket_size=1, metrics=m
        ).collect()
    }
    uncapped = {
        r["doc_id"] for r in pipeline_training_data_curation(spark, SF).collect()
    }
    assert uncapped <= capped
    assert m["hot_buckets"] > 0 and m["dropped_band_rows"] > 0
    m_uncapped: dict = {}
    pipeline_training_data_curation(spark, SF, metrics=m_uncapped).collect()
    assert m["neardup_removed"] <= m_uncapped["neardup_removed"]
    assert m["output_docs"] == len(capped)


def test_curation_rejects_auto_cap(spark):
    with pytest.raises(ValueError, match="'auto'"):
        pipeline_training_data_curation(spark, SF, max_bucket_size="auto")


def test_incremental_ingest_funnel_single_job_reconciles(spark):
    m: dict = {}
    audited = pipeline_incremental_ingest(spark, SF, metrics=m)
    rows = audited.collect()
    default = pipeline_incremental_ingest(spark, SF).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, default))
    assert m["incoming_docs"] == len(rows)
    assert m["bloom_flagged"] == sum(r["bloom_flagged"] for r in rows)
    assert m["admitted"] == sum(r["admitted"] for r in rows)
    assert m["rejected"] == m["incoming_docs"] - m["admitted"]


def test_semdedup_funnel_reconciles_and_output_unchanged(spark):
    """r15 (VERDICT r14 item 6): the cosine/embedding composite gets the
    same one-dict funnel contract the minhash curation pipeline has —
    and the default path stays byte-identical."""
    from glue_etl_framework_spark.queries.similarity import dedup_semdedup

    m: dict = {}
    audited = dedup_semdedup(spark, SF, metrics=m).collect()
    default = dedup_semdedup(spark, SF).collect()
    assert sorted(map(tuple, audited)) == sorted(map(tuple, default))
    assert m["input_vectors"] == spark.read.parquet(
        f"{SF}/embeddings.parquet"
    ).count()
    assert m["input_vectors"] == len(audited)  # one verdict row per vector
    assert m["neardup_removed"] == sum(1 for r in audited if r["kept"] == 0)
    assert m["input_vectors"] - m["neardup_removed"] == m["output_vectors"]
    # no cap passed -> no cap keys pretend-engaged
    assert "hot_buckets" not in m


def test_semdedup_cap_engages_into_same_dict(spark):
    """An explicit (cell, band)-bucket cap writes its dropped mass into
    the SAME metrics dict, and capping can only shrink the dropped set
    (the capped kept-set is a superset of the uncapped one)."""
    from glue_etl_framework_spark.queries.similarity import dedup_semdedup

    m: dict = {}
    capped_kept = {
        r["vec_id"]
        for r in dedup_semdedup(spark, SF, max_bucket_size=1, metrics=m).collect()
        if r["kept"] == 1
    }
    uncapped = dedup_semdedup(spark, SF).collect()
    uncapped_kept = {r["vec_id"] for r in uncapped if r["kept"] == 1}
    assert uncapped_kept <= capped_kept
    assert m["hot_buckets"] > 0 and m["dropped_band_rows"] > 0
    assert m["neardup_removed"] <= sum(1 for r in uncapped if r["kept"] == 0)
    assert m["input_vectors"] - m["neardup_removed"] == m["output_vectors"]


def test_semdedup_rejects_auto_cap(spark):
    from glue_etl_framework_spark.queries.similarity import dedup_semdedup

    with pytest.raises(ValueError, match="'auto'"):
        dedup_semdedup(spark, SF, max_bucket_size="auto")


def test_semdedup_rejects_bad_cap_before_any_job(spark):
    """r15 review: an out-of-range int cap must fail the up-front
    contract check, BEFORE the metrics path's eager full-corpus count —
    previously cap=0 passed the isinstance check, ran input_vectors =
    assign.count(), and only then hit drop_hot_buckets' range error (on
    a 100 TB run that input error costs a production scan)."""
    from glue_etl_framework_spark.queries.similarity import dedup_semdedup

    for bad in (0, -3):
        m: dict = {}
        with pytest.raises(ValueError, match=">= 1"):
            dedup_semdedup(spark, SF, max_bucket_size=bad, metrics=m)
        assert m == {}, "the eager metrics job must not have run"


def test_cc_metrics_record_rounds_and_fallback(spark):
    from glue_etl_framework_spark.ext.dedup import connected_component_labels

    nodes = spark.createDataFrame([(i,) for i in range(8)], ["doc_id"])
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(7)], ["id_a", "id_b"]
    )
    m: dict = {}
    labels = {
        (r["node"], r["label"])
        for r in connected_component_labels(nodes, chain, metrics=m).collect()
    }
    assert labels == {(i, 0) for i in range(8)}
    assert m["cc_converged"] is True and m["cc_fallback"] is False
    assert 0 < m["cc_rounds"] <= 50
    m2: dict = {}
    with pytest.warns(UserWarning, match="exhausted"):
        fallback = {
            (r["node"], r["label"])
            for r in connected_component_labels(
                nodes, chain, max_iterations=1, metrics=m2
            ).collect()
        }
    assert fallback == labels  # two-phase fallback still returns final labels
    assert m2 == {"cc_rounds": 1, "cc_converged": False, "cc_fallback": True}
