"""Two-phase (large-star/small-star) connected components — the
diameter-proof ext alternative to min-id propagation (VERDICT r10 item 4:
propagation is O(component diameter) rounds, fine for near-clique dup
graphs but degenerate on chains; star contraction is O(log^2 n) rounds
regardless of shape). Verified against a driver-side union-find oracle and
against the propagation variant on the real MinHash dup graph."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from glue_etl_framework_spark.ext.dedup import (
    connected_component_labels,
    connected_component_labels_twophase,
)

SF_ORACLE = "/root/testdata/sf0.01"


def _union_find_labels(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # label = min id in component == root under min-union
    return {x: find(x) for x in range(n_nodes)}


def _run(spark, n_nodes, edge_list, fn, **kw):
    nodes = spark.createDataFrame([(i,) for i in range(n_nodes)], ["doc_id"])
    if edge_list:
        pairs = spark.createDataFrame(edge_list, ["id_a", "id_b"])
    else:
        pairs = nodes.select(
            F.col("doc_id").alias("id_a"), F.col("doc_id").alias("id_b")
        ).limit(0)
    out = fn(nodes, pairs, id_col="doc_id", **kw)
    return {r["node"]: r["label"] for r in out.collect()}


def test_twophase_matches_union_find_on_random_graphs(spark):
    rng = random.Random(11)
    for trial in range(3):
        n = 60
        edges = [
            tuple(sorted(rng.sample(range(n), 2)))
            for _ in range(rng.randint(10, 50))
        ]
        expected = _union_find_labels(n, edges)
        got = _run(spark, n, edges, connected_component_labels_twophase)
        assert got == expected, f"trial {trial}"


def test_twophase_handles_high_diameter_chain(spark):
    """A 64-node path has diameter 63: min-id propagation needs 63 rounds
    (its default max_iterations=10 would stop early), while star
    contraction collapses it within its default round budget — the reason
    this variant exists."""
    n = 64
    edges = [(i, i + 1) for i in range(n - 1)]
    got = _run(spark, n, edges, connected_component_labels_twophase)
    assert got == {i: 0 for i in range(n)}
    # the propagation variant at a chain-sized round budget agrees too
    prop = _run(spark, n, edges, connected_component_labels, max_iterations=n)
    assert prop == got


def test_twophase_isolated_nodes_and_empty_graph(spark):
    got = _run(spark, 5, [], connected_component_labels_twophase)
    assert got == {i: i for i in range(5)}
    got = _run(spark, 5, [(3, 4)], connected_component_labels_twophase)
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: 3}


def test_twophase_matches_propagation_on_minhash_graph(spark):
    """On the real near-dup graph (near-cliques) both algorithms must
    produce the oracle-checked labeling of dedup_connected_components."""
    from glue_etl_framework_spark.queries import t
    from glue_etl_framework_spark.queries.dedup import dedup_minhash_lsh

    d = t(spark, SF_ORACLE, "documents").select("doc_id")
    pairs = dedup_minhash_lsh(spark, SF_ORACLE).select(
        F.col("doc_a").alias("id_a"), F.col("doc_b").alias("id_b")
    )
    two = {
        (r["node"], r["label"])
        for r in connected_component_labels_twophase(d, pairs).collect()
    }
    prop = {
        (r["node"], r["label"])
        for r in connected_component_labels(d, pairs).collect()
    }
    assert two == prop
    assert len(two) == d.count()


def test_propagation_warns_when_round_budget_exhausted(spark):
    """A chain longer than max_iterations must produce a loud UserWarning
    (silently returning non-final labels hands the caller wrong
    components); the two-phase variant converges on the same graph without
    one."""
    import warnings

    n = 24
    edges = [(i, i + 1) for i in range(n - 1)]
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        _run(spark, n, edges, connected_component_labels, max_iterations=3)
    assert any("max_iterations" in str(w.message) for w in caught)

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        got = _run(spark, n, edges, connected_component_labels_twophase)
    assert not any("max_iterations" in str(w.message) for w in caught)
    assert got == {i: 0 for i in range(n)}


def test_propagation_exhaustion_default_falls_back_to_correct_labels(spark):
    """Strict-by-default (VERDICT r11 item 1): budget exhaustion on a
    chain must NOT surface warned-but-wrong labels — the default
    on_exhaustion='fallback' reruns via two-phase star contraction and the
    returned labels are the true component minima despite max_iterations
    being far below the chain's diameter."""
    import warnings

    n = 24
    edges = [(i, i + 1) for i in range(n - 1)]
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        got = _run(spark, n, edges, connected_component_labels, max_iterations=3)
    assert any("falling back" in str(w.message) for w in caught)
    assert got == {i: 0 for i in range(n)}  # final labels, not 3-round truncation


def test_propagation_exhaustion_raise_mode(spark):
    import pytest

    n = 16
    edges = [(i, i + 1) for i in range(n - 1)]
    with pytest.raises(RuntimeError, match="max_iterations"):
        _run(
            spark, n, edges, connected_component_labels,
            max_iterations=2, on_exhaustion="raise",
        )


def test_propagation_exhaustion_warn_mode_is_opt_in_truncation(spark):
    """on_exhaustion='warn' keeps the pre-r12 contract: non-final labels
    come back (the far end of the chain still carries a label above the
    true minimum 0) with only the warning — callers must opt in to that."""
    import warnings

    n = 24
    edges = [(i, i + 1) for i in range(n - 1)]
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        got = _run(
            spark, n, edges, connected_component_labels,
            max_iterations=3, on_exhaustion="warn",
        )
    assert any("max_iterations" in str(w.message) for w in caught)
    assert got[n - 1] > 0  # truncated: not yet the component minimum


def test_propagation_rejects_unknown_on_exhaustion(spark):
    import pytest

    nodes = spark.createDataFrame([(1,)], ["doc_id"])
    pairs = spark.createDataFrame([(1, 1)], ["id_a", "id_b"])
    with pytest.raises(ValueError, match="on_exhaustion"):
        connected_component_labels(nodes, pairs, on_exhaustion="ignore")


def test_twophase_exhaustion_warns_and_keeps_one_row_per_node(spark):
    """ADVICE r11 (medium): a truncated star-contraction run must never
    emit conflicting (node, label) rows — the min aggregate keeps one row
    per node — and must warn that the fingerprint never stabilized instead
    of silently projecting a non-star edge set."""
    import warnings

    rng = random.Random(7)
    n = 40
    edges = [tuple(sorted(rng.sample(range(n), 2))) for _ in range(60)]
    nodes = spark.createDataFrame([(i,) for i in range(n)], ["doc_id"])
    pairs = spark.createDataFrame(edges, ["id_a", "id_b"])
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        out = connected_component_labels_twophase(
            nodes, pairs, id_col="doc_id", max_iterations=0
        )
        rows = out.collect()
    assert any("fingerprint stabilized" in str(w.message) for w in caught)
    # one row per node, even though the projected edge set is not a star
    assert len(rows) == n
    assert len({r["node"] for r in rows}) == n
    # and a converged rerun on the same graph matches the union-find oracle
    assert _run(spark, n, edges, connected_component_labels_twophase) == _union_find_labels(n, edges)
