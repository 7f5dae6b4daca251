"""Property pins for the round-4 operators (test_round3_properties
pattern): invariants that the oracle hash alone does not state
explicitly, checked against the fixtures and pure-Python references."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from glue_etl_framework_spark.queries import load_registry, t

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from glue_etl_framework_spark import get_spark

    return get_spark(app_name="test_r4_props", shuffle_partitions=8)


@pytest.fixture(scope="module")
def reg():
    return load_registry()


def test_attribution_credit_conserves_per_conversion(spark):
    """Every converted journey must hand out exactly one conversion's
    credit: per-purchase fixed-point credits sum to MTA_SCALE up to the
    per-touch rounding slack (middles round individually, so the drift
    is bounded by (n-2)/2 micro-units per journey)."""
    from glue_etl_framework_spark.queries.llmops import MTA_SCALE, MTA_WINDOW_H

    e = t(spark, SF, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), "user_id", F.col("ts").alias("p_ts")
    )
    tch = e.filter(F.col("event_type").isin("click", "view")).select(
        F.col("user_id").alias("t_user"), F.col("ts").alias("t_ts"),
        F.col("event_id").alias("t_id"),
    )
    paired = p.join(
        tch,
        (F.col("t_user") == F.col("user_id"))
        & (F.col("t_ts") <= F.col("p_ts"))
        & (F.col("t_ts") > F.col("p_ts") - F.expr(f"INTERVAL {MTA_WINDOW_H} HOURS")),
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("p_id")
    rn = F.row_number().over(w.orderBy("t_ts", "t_id"))
    n = F.count("*").over(w)
    credit = (
        F.when(F.col("n") == 1, F.lit(1.0))
        .when(F.col("n") == 2, F.lit(0.5))
        .when((F.col("rn") == 1) | (F.col("rn") == F.col("n")), F.lit(0.4))
        .otherwise(F.lit(0.2) / (F.col("n") - 2))
    )
    per_conv = (
        paired.select("p_id", rn.alias("rn"), n.alias("n"))
        .select("p_id", "n", F.round(credit * MTA_SCALE).cast("long").alias("c"))
        .groupBy("p_id", "n")
        .agg(F.sum("c").alias("total"))
        .collect()
    )
    assert per_conv, "no converted journeys in fixture"
    for r in per_conv:
        slack = max(1, (r["n"] - 2 + 1) // 2) if r["n"] > 2 else 0
        assert abs(r["total"] - MTA_SCALE) <= slack, (
            f"journey {r['p_id']} (n={r['n']}) credit {r['total']} "
            f"drifts more than rounding slack {slack}"
        )


def test_holt_fold_matches_python_reference(spark, reg):
    """The Spark aggregate() fold must equal a step-by-step pure-Python
    integer Holt recursion over the same per-type daily series — an
    engine-independent third implementation (the oracle is DuckDB's
    list_reduce; this one is plain Python)."""
    from glue_etl_framework_spark.queries.llmops import HOLT_SCALE

    e = t(spark, SF, "events")
    daily = (
        e.groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count("*").alias("n"))
        .collect()
    )
    series: dict[str, list[tuple]] = {}
    for r in daily:
        series.setdefault(r["event_type"], []).append((r["day"], r["n"]))

    def tdiv(a: int, b: int) -> int:  # truncate toward zero, like div/`//`
        q = abs(a) // b
        return q if a >= 0 else -q

    expected = {}
    for et, pts in series.items():
        xs = [n * HOLT_SCALE for _, n in sorted(pts)]
        l, tr = xs[0], 0
        for x in xs[1:]:
            l2 = tdiv(2 * x + 8 * (l + tr), 10)
            tr = tdiv((l2 - l) + 9 * tr, 10)
            l = l2
        expected[et] = (l, tr)

    got = {
        r["event_type"]: (r["level_fp"], r["trend_fp"])
        for r in reg["events_forecast_holt_linear"].fn(spark, SF).collect()
    }
    assert got == expected


def test_batched_bpe_selected_merges_are_symbol_disjoint(spark, reg):
    """Within each pass of the batched trainer, selected merges must be
    mutually symbol-disjoint (the commutation precondition) and ranked
    candidates must be unique pairs."""
    rows = reg["text_bpe_learn_merges_batched"].fn(spark, SF).collect()
    assert rows, "trainer selected nothing"
    by_pass: dict[int, list] = {}
    for r in rows:
        by_pass.setdefault(r["pass_no"], []).append(r)
    for pass_no, sel in by_pass.items():
        assert sel[0:1], pass_no
        pairs = [r["pair"] for r in sel]
        assert len(set(pairs)) == len(pairs)
        syms = [set(p.split(" ")) for p in pairs]
        for i in range(len(syms)):
            for j in range(i + 1, len(syms)):
                assert syms[i].isdisjoint(syms[j]), (
                    f"pass {pass_no}: merges {pairs[i]!r} and {pairs[j]!r} "
                    "share a symbol — batch commutation violated"
                )
        # rank 1 is always selected (nothing outranks it)
        assert min(r["cand_rank"] for r in sel) == 1


def test_batched_bpe_first_pass_head_matches_serial_trainer(spark, reg):
    """The batched trainer's first selected merge must equal the serial
    trainer's first merge — both are the global argmax pair."""
    serial = reg["text_bpe_learn_merges"].fn(spark, SF).collect()
    batched = reg["text_bpe_learn_merges_batched"].fn(spark, SF).collect()
    s1 = next(r for r in serial if r["merge_order"] == 1)
    b1 = next(r for r in batched if r["pass_no"] == 1 and r["cand_rank"] == 1)
    assert (s1["pair"], s1["pair_count"]) == (b1["pair"], b1["pair_count"])
