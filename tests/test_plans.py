"""Physical-plan regression tests: the scale properties (pushdown, pruning,
broadcast, single-shuffle, top-k short-circuits) asserted on the actual
plans, so a refactor can't silently trade them away. These are the
100 TB-discipline checks of SURVEY.md §4/§7 made executable."""

from __future__ import annotations

import re

import pytest

from glue_etl_framework_spark.queries import load_registry
from tests.conftest import SF_SMOKE

REGISTRY = load_registry()


def plan_of(spark, name: str) -> str:
    df = REGISTRY[name].fn(spark, SF_SMOKE)
    return df._jdf.queryExecution().executedPlan().toString()


def count_shuffles(plan: str) -> int:
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange hashpartitioning" in line
        or "Exchange rangepartitioning" in line
        or "Exchange SinglePartition" in line
    )


def test_filter_pushdown_reaches_scan(spark):
    plan = plan_of(spark, "scan_filter_projection")
    assert "PushedFilters: [" in plan
    # at least one real pushed predicate, not an empty list
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert pushed.strip(), "no predicates pushed to the parquet scan"


def test_column_pruning_reaches_scan(spark):
    plan = plan_of(spark, "scan_filter_projection")
    read_schema = plan.split("ReadSchema: ", 1)[1].splitlines()[0]
    # lineitem has 11 columns; the query needs far fewer
    assert read_schema.count(":") <= 6, f"scan reads too many columns: {read_schema}"


def test_flagship_broadcasts_all_dimensions(spark):
    plan = plan_of(spark, "flagship_revenue_by_region")
    assert plan.count("BroadcastHashJoin") == 4
    # single shuffle: the final group-by aggregate
    assert count_shuffles(plan) == 1, plan


def test_topk_per_group_uses_window_group_limit(spark):
    plan = plan_of(spark, "topk_per_group")
    assert "WindowGroupLimit" in plan


def test_orderby_limit_uses_take_ordered(spark):
    plan = plan_of(spark, "orderby_limit")
    assert "TakeOrderedAndProject" in plan


def test_ivf_assignment_is_broadcast(spark):
    # centroid assignment must be a broadcast nested-loop/hash join, never a
    # shuffled cross product
    plan = plan_of(spark, "similarity_ann_ivf")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_asof_join_single_shuffle(spark):
    # merge-formulation as-of join: one hash shuffle for the window on
    # user_id (+ one for the small orders pre-aggregate), never a per-match
    # blowup join
    plan = plan_of(spark, "join_asof")
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
    assert count_shuffles(plan) <= 2, plan


@pytest.mark.parametrize(
    "name",
    ["dedup_minhash_lsh", "dedup_simhash_pairs", "similarity_lsh_hyperplane_pairs"],
)
def test_candidate_generation_never_cross_product(spark, name):
    # every near-dup pipeline must key its self-join (band/bucket equi-join)
    plan = plan_of(spark, name)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ivf_assignment_has_no_window_sort(spark):
    """The nearest-centroid step must stay a hash aggregate (max_by) —
    a Window operator here means every n x K scored row gets shuffled."""
    plan = plan_of(spark, "similarity_ann_ivf")
    # Exactly two real Window operators remain: the n_probe=2 probe ranking
    # (tiny query side) and the final top-k. The full-corpus assignment must
    # be a max_by aggregate with a map-side partial, not a third window.
    windows = sum(1 for ln in plan.splitlines() if "+- Window [" in ln or ln.startswith("Window ["))
    assert windows <= 2, plan[:2000]
    assert "partial_max_by" in plan, "assignment lost its map-side partial aggregation"


def test_sessionize_single_exchange_for_both_windows(spark):
    """lag and the running session counter share partitioning AND ordering,
    so Catalyst must plan exactly one hashpartitioning exchange for them
    (plus the final aggregation exchange)."""
    plan = plan_of(spark, "events_sessionize_gap")
    assert count_shuffles(plan) <= 2, plan[:2000]


def test_stratified_sample_is_narrow(spark):
    """Deterministic stratified sampling is a pure filter: zero exchanges."""
    plan = plan_of(spark, "sample_stratified_language")
    assert count_shuffles(plan) == 0, plan[:2000]


def test_unigram_logprob_broadcasts_frequency_table(spark):
    """The token->frequency join must be broadcast (vocabulary-sized side),
    never a shuffle join keyed on token strings."""
    plan = plan_of(spark, "text_unigram_logprob")
    assert "BroadcastHashJoin" in plan


def test_salted_join_shuffles_on_key_and_salt(spark):
    """The salted join must actually partition on (key, salt) — that's the
    mechanism that spreads a hot key across reducers."""
    plan = plan_of(spark, "join_salted_skew")
    assert "ShuffledHashJoin" in plan or "SortMergeJoin" in plan, plan[:1500]
    assert "salt" in plan, "salt column missing from the join plan"


def test_binned_range_join_is_equi_join(spark):
    """The large-large range-join pattern must plan as a keyed join on bin —
    no nested loop, no cartesian product anywhere."""
    plan = plan_of(spark, "join_range_binned")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


@pytest.mark.parametrize("name", ["curation_decontaminate", "text_repetition_ratio"])
def test_llmops_candidate_joins_are_keyed(spark, name):
    """Decontamination and repetition scoring must never degenerate into an
    all-pairs comparison — the n-gram/bigram key drives every join."""
    plan = plan_of(spark, name)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_length_outlier_bounds_are_broadcast(spark):
    """The per-source percentile bounds are a tiny frame; joining them back
    must broadcast — a shuffle here would reshuffle the full corpus."""
    plan = plan_of(spark, "text_length_outlier_trim")
    assert "BroadcastHashJoin" in plan
    # the document side must not be exchanged for this join (scan-side filter)
    assert count_shuffles(plan) <= 1, plan[:2000]


@pytest.mark.parametrize(
    "name", ["dedup_ngram_contamination", "dedup_minhash_against_corpus"]
)
def test_new_dedup_candidates_never_cross_product(spark, name):
    """Round-2 dedup additions: gram DF and cross-side band joins must stay
    keyed equi-joins — an all-pairs product here is the 100 TB killer."""
    plan = plan_of(spark, name)
    assert "CartesianProduct" not in plan


def test_mixture_samplers_broadcast_rates_and_keep_scan_narrow(spark):
    """Both rebalancing samplers: the per-stratum rate table joins back via
    broadcast (data rows never shuffle), and the only Exchange feeds the
    tiny counts aggregate — not the corpus scan."""
    for name in ("sample_domain_mixture", "sample_temperature_rebalance"):
        plan = plan_of(spark, name)
        assert "BroadcastHashJoin" in plan, name
        # counts agg exchange + single-partition window over counts only
        assert count_shuffles(plan) <= 2, f"{name} shuffles data rows:\n{plan}"


def test_reservoir_sample_uses_window_group_limit(spark):
    """Per-stratum fixed-k sampling must short-circuit via WindowGroupLimit
    so the shuffle carries ~K rows per stratum, not the corpus."""
    plan = plan_of(spark, "sample_reservoir_per_group")
    assert "WindowGroupLimit" in plan


def test_scan_side_quality_gates_have_no_shuffle(spark):
    """Gopher gates, badwords filter, int8 audit, and the split assigner
    are pure per-row expressions — any Exchange is a regression."""
    for name in (
        "quality_gopher_filters",
        "quality_badwords_filter",
        "embedding_quantize_int8",
        "curation_train_eval_split",
    ):
        plan = plan_of(spark, name)
        assert count_shuffles(plan) == 0, f"{name} gained a shuffle:\n{plan}"


def test_pq_assignment_broadcasts_codebook(spark):
    """PQ encode/search: the codebook (and the query LUT) are constant-size
    broadcasts; corpus-side scoring must never shuffle raw vectors into a
    join — only the grouped assignment aggregate may exchange."""
    for name in ("similarity_pq_encode", "similarity_pq_adc_topk"):
        plan = plan_of(spark, name)
        assert "BroadcastHashJoin" in plan, name
        assert "CartesianProduct" not in plan, name


def test_perplexity_bucket_has_no_global_sort(spark):
    """Decile bucketing must use broadcast quantile cutoffs, not a global
    ntile: no range-partitioned Exchange (global sort) anywhere."""
    plan = plan_of(spark, "quality_perplexity_bucket")
    assert "Exchange rangepartitioning" not in plan


def test_chunk_windows_is_narrow(spark):
    """Context-window chunking is explode + slice projections only — any
    Exchange means the chunker stopped scaling with scan bandwidth."""
    plan = plan_of(spark, "text_chunk_windows")
    assert count_shuffles(plan) == 0, plan[:2000]


def test_substring_windows_never_cross_product(spark):
    """Exact-substring dedup: the dup-window membership join must stay an
    equi-join on the window hash — never all-pairs."""
    plan = plan_of(spark, "dedup_substring_windows")
    assert "CartesianProduct" not in plan


def test_zorder_bucket_single_shuffle_narrow_scan(spark):
    """The z-value is a pure projection: one Exchange (bucket aggregate)
    and a two-column parquet scan."""
    plan = plan_of(spark, "layout_zorder_bucket")
    assert count_shuffles(plan) == 1, plan[:2000]
    read_schema = plan.split("ReadSchema: ", 1)[1].splitlines()[0]
    assert read_schema.count(":") <= 2, f"scan reads too many columns: {read_schema}"


def test_token_budget_mix_scans_corpus_once(spark):
    """The grand total is a window over the per-source aggregate — the
    corpus parquet must appear in exactly one FileScan, with exactly two
    exchanges (source aggregate + single-partition total window)."""
    plan = plan_of(spark, "curation_token_budget_mix")
    assert plan.count("FileScan parquet") == 1, plan[:2000]
    assert count_shuffles(plan) <= 2, plan[:2000]


def test_radius_search_has_no_shuffle(spark):
    """Range search is broadcast-queries x corpus scan + filter — zero
    Exchanges; a shuffle here means the corpus moved for a per-row op."""
    plan = plan_of(spark, "similarity_radius_search")
    assert count_shuffles(plan) == 0, plan[:2000]


def test_knn_classify_topk_short_circuits(spark):
    """The per-query k-nearest step must plan as WindowGroupLimit so the
    shuffle carries ~K rows per query, never the scored corpus."""
    plan = plan_of(spark, "similarity_knn_classify")
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan


def test_novelty_ratio_joins_on_shingle_key(spark):
    """First-seen novelty must stay shingle-keyed — no all-pairs doc
    comparison anywhere in the plan."""
    plan = plan_of(spark, "text_novelty_ratio")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_user_sequences_group_limit_bounds_shuffle(spark):
    """The per-user first-N cap must short-circuit via WindowGroupLimit so
    long-history users can't blow up the sequence aggregate."""
    plan = plan_of(spark, "events_user_sequences")
    assert "WindowGroupLimit" in plan


def test_crossmodal_audit_never_cross_product(spark):
    """The audit composes banded dedup + two vector lookups — every join
    keyed, nothing all-pairs."""
    plan = plan_of(spark, "curation_crossmodal_audit")
    assert "CartesianProduct" not in plan


def test_cumulative_uniques_windows_only_daily_rows(spark):
    """The running sum must operate on the ~days-sized daily frame: two
    keyed aggregates first, and no Window before the final aggregate."""
    plan = plan_of(spark, "events_cumulative_uniques")
    assert count_shuffles(plan) <= 3, plan[:2000]


def test_cooccurrence_pmi_broadcasts_count_tables(spark):
    """Type-count and N lookups are broadcast; the only data-sized shuffles
    are the distinct projection and the user-keyed pair join."""
    plan = plan_of(spark, "events_cooccurrence_pmi")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_interval_overlap_is_bin_keyed(spark):
    """Interval x interval must meet in the bin equi-join — no nested loop,
    no cartesian product (the large-large discipline)."""
    plan = plan_of(spark, "join_interval_overlap")
    assert "CartesianProduct" not in plan


def test_ewma_lags_share_one_window(spark):
    """All EWMA lag terms share a single (partition, order) spec — the plan
    must contain exactly one Window operator and one hash exchange."""
    plan = plan_of(spark, "window_ewma_smooth")
    windows = sum(1 for ln in plan.splitlines() if "Window [" in ln)
    assert windows == 1, plan[:2000]
    assert count_shuffles(plan) == 1, plan[:2000]


@pytest.mark.parametrize(
    "name",
    ["dedup_containment_pairs", "graph_pagerank_transactions",
     "sample_importance_dsir", "tpch_q21_suppliers_who_kept_waiting"],
)
def test_round2_joins_never_cross_product(spark, name):
    """New candidate/iteration joins stay keyed: no cartesian anywhere."""
    plan = plan_of(spark, name)
    assert "CartesianProduct" not in plan, plan


def test_dsir_lambda_table_is_broadcast(spark):
    """The fixed-size 4096-bucket lambda table must join as a broadcast —
    that invariant is the operator's 100 TB story."""
    plan = plan_of(spark, "sample_importance_dsir")
    assert "BroadcastHashJoin" in plan


def test_tpch_q3_is_take_ordered(spark):
    plan = plan_of(spark, "tpch_q3_shipping_priority")
    assert "TakeOrderedAndProject" in plan


def test_tpch_q6_pushes_all_predicates_and_never_shuffles_rows(spark):
    """Q6 is the pushdown canary: filters reach the scan and the only
    exchange is the single-row partial->final aggregate."""
    plan = plan_of(spark, "tpch_q6_forecast_revenue")
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert pushed.strip(), "no predicates pushed to the lineitem scan"
    assert count_shuffles(plan) <= 1, plan


def test_weighted_sample_uses_window_group_limit(spark):
    plan = plan_of(spark, "sample_weighted_aes")
    assert "WindowGroupLimit" in plan


def test_multires_rollup_is_single_expand_aggregate(spark):
    """GROUPING SETS must plan one Expand + one aggregate exchange, not a
    union of three scans."""
    plan = plan_of(spark, "events_multires_rollup")
    assert plan.count("Expand") >= 1
    assert plan.count("Scan parquet") == 1, plan
    assert count_shuffles(plan) == 1, plan


def test_join_hints_pick_forced_strategies(spark):
    assert "ShuffledHashJoin" in plan_of(spark, "join_shuffle_hash_hint")
    assert "SortMergeJoin" in plan_of(spark, "join_merge_hint")


# Ops whose BUILDER executes work eagerly (checkpoint loops, stream drains,
# IO round-trip writes) — planning them here would run jobs, not just
# explain them.
_EXECUTING_OPS = {
    "dedup_connected_components", "graph_pagerank_transactions",
    "curation_dedup_keep_best", "dedup_cluster_size_hist",
    "dedup_graph_degree_stats", "streaming_live_tumbling_agg",
    "streaming_live_dedup",
    # queries/io_ops.py: every builder writes through a real sink first
    "io_roundtrip_parquet_partitioned", "io_roundtrip_csv_options",
    "io_roundtrip_json_timestamps", "io_roundtrip_orc_doubles",
    "io_roundtrip_avro_codec", "io_upsert_by_key_merge",
    "io_staged_write_crash_intact", "io_compact_small_files",
}
_CARTESIAN_OK = {"join_cross"}  # the one operator whose SEMANTICS are a cross join


_ALL_PLANS: dict[str, str] = {}


def _registry_plans(spark) -> dict[str, str]:
    """Executed-plan text for every non-executing registry entry, built once
    and shared by the registry-wide audits below."""
    if not _ALL_PLANS:
        from glue_etl_framework_spark.queries import load_registry

        for name in load_registry():
            if name in _EXECUTING_OPS:
                continue
            _ALL_PLANS[name] = plan_of(spark, name)
    return _ALL_PLANS


def test_no_query_plans_a_cartesian_product(spark):
    """Registry-wide plan audit: no operator may fall into a shuffled
    CartesianProduct — every pairwise computation must meet through a key
    (band, block, bucket, or join column). Broadcast single-row crossJoins
    (scalar totals/cutoffs) plan as BroadcastNestedLoopJoin and are fine;
    the shuffled cartesian is the scale-killer this guards against."""
    offenders = [
        name
        for name, plan in _registry_plans(spark).items()
        if name not in _CARTESIAN_OK and "CartesianProduct" in plan
    ]
    assert not offenders, f"cartesian products in: {offenders}"


def _bracket_groups(s: str) -> list[str]:
    """Top-level [...] groups of a plan-node line (nested brackets stay
    inside their group)."""
    depth, cur, out = 0, [], []
    for ch in s:
        if ch == "[":
            if depth == 0:
                cur = []
            else:
                cur.append(ch)
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth == 0:
                out.append("".join(cur))
            else:
                cur.append(ch)
        elif depth > 0:
            cur.append(ch)
    return out


_ORDER_RE = re.compile(r" (ASC|DESC) ")


def _has_unpartitioned_window(plan: str) -> bool:
    """True if any Window node in the executed plan has no PARTITION BY.

    Window prints as ``Window [defs], [partition], [order]``; the partition
    group is absent for global windows (``Window [defs], [order]`` or
    ``Window [defs]``). A partition-only window (no ORDER BY) also prints
    two groups, distinguished by the order group's ASC/DESC markers.
    """
    for ln in plan.splitlines():
        i = ln.find("Window [")
        if i < 0 or "WindowGroupLimit" in ln:
            continue
        if i > 0 and ln[i - 1].isalnum():
            continue
        g = _bracket_groups(ln[i + len("Window"):])
        if len(g) >= 3:
            continue  # partitioned, ordered
        if len(g) == 2 and not _ORDER_RE.search(g[1]):
            continue  # partitioned, no order
        return True
    return False


# Queries whose one global Window runs over a PROVABLY BOUNDED frame — each
# entry names the bound. Everything else in the registry must partition its
# windows: a partition-less Window over a data-sized input is a single-task
# stage, the quadratic-at-scale failure VERDICT r02 flagged in
# part_pareto_skyline (since fixed: two-level) and events_user_gini (since
# fixed: 64-bin histogram).
_GLOBAL_WINDOW_OK = {
    "sample_domain_mixture": "sum over per-source counts (#sources rows)",
    "sample_temperature_rebalance": "sum over per-language counts (#langs rows)",
    "curation_token_budget_mix": "sum over per-source weights (#sources rows)",
    "text_source_drift_kl": "global total over per-source counts (#sources rows)",
    # (the PQ codebook-index windows moved inside an eager localCheckpoint
    # in r5 — still bounded K x M rows, now invisible to this plan audit)
    "pipeline_corpus_health_report": "per-language counts (bounded by the language-code vocabulary)",
    "text_zipf_slope": "rank over TakeOrdered top-R tokens (fixed R)",
    "events_cumulative_uniques": "running sum over calendar days (time-bounded)",
    "orders_open_backlog_curve": "running sum over calendar days (time-bounded)",
    "window_pct_change": "lag over daily aggregate (time-bounded)",
    "events_user_gini": "cumulative over <=63 log2 histogram bins",
    "agg_exact_median_twopass": "cumulative over <=4096 histogram bins + one bin's distinct values",
    # (orders_survival_km_repeat_purchase's global cumsum became an exact
    # integer fold in r5 — no Window in its plan anymore)
    "quality_ks_binned_drift": "cumulative over <=64 log2 value bins",
    "part_pareto_skyline": "level-2 skyline over union of 32 local skylines",
    # SURVEY §2.5 operator demos whose SEMANTICS are a global frame (the
    # operator itself is the global window; partitioned variants are the
    # other §2.5 rows):
    "window_range_frame": "operator demo: global RANGE frame semantics",
    "window_ntile_dist": "operator demo: global NTILE semantics",
}


def test_no_unpartitioned_window_over_unbounded_input(spark):
    """Registry-wide plan audit: every Window must either declare a
    PARTITION BY or appear in the justified bounded-frame allowlist above.
    Compared with set equality so both NEW offenders and STALE allowlist
    entries fail the build."""
    found = {
        name
        for name, plan in _registry_plans(spark).items()
        if _has_unpartitioned_window(plan)
    }
    assert found == set(_GLOBAL_WINDOW_OK), (
        f"new unpartitioned windows: {sorted(found - set(_GLOBAL_WINDOW_OK))}; "
        f"stale allowlist entries: {sorted(set(_GLOBAL_WINDOW_OK) - found)}"
    )


def test_parameterized_banding_never_cross_product(spark):
    """The r11 parameterized ext emitters must keep the banded equi-join
    shape at ANY banding width — wider bands change constants, never the
    plan class (no cartesian, no nested-loop, bounded shuffles)."""
    from glue_etl_framework_spark.ext.dedup import simhash_neardup_pairs
    from glue_etl_framework_spark.ext.similarity import lsh_neardup_pairs

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select("doc_id", "text")
    for df in (
        lsh_neardup_pairs(emb, 0.35, band_bits=13),
        simhash_neardup_pairs(docs, hamming_max=6, band_bits=12),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
