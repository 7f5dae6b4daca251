"""scd2_merge: slowly-changing-dimension type-2 history maintenance.

Covers initialization, the four per-key branches (changed / unchanged /
new key / no update), multi-batch history accumulation, intra-batch
latest-update-wins determinism, and null-safe change detection."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from glue_etl_framework_spark.io.writers import scd2_merge

TS = dt.datetime


def _updates(spark, rows):
    return spark.createDataFrame(
        rows, "cust_id int, segment string, balance double, ts timestamp"
    )


def test_initialize_from_first_batch(spark):
    cur = scd2_merge(
        None, _updates(spark, [(1, "gold", 10.0, TS(2024, 1, 1))]), ["cust_id"], "ts"
    )
    [r] = cur.collect()
    assert (r.segment, r.valid_from, r.valid_to, r.is_current) == (
        "gold", TS(2024, 1, 1), None, True,
    )


def test_four_branches_one_batch(spark):
    base = scd2_merge(
        None,
        _updates(
            spark,
            [
                (1, "gold", 10.0, TS(2024, 1, 1)),   # will change
                (2, "iron", 5.0, TS(2024, 1, 1)),    # unchanged payload arrives
                (3, "tin", 1.0, TS(2024, 1, 1)),     # no update in batch 2
            ],
        ),
        ["cust_id"],
        "ts",
    )
    merged = scd2_merge(
        base,
        _updates(
            spark,
            [
                (1, "platinum", 20.0, TS(2024, 2, 1)),  # changed -> close + open
                (2, "iron", 5.0, TS(2024, 2, 1)),       # identical -> untouched
                (4, "new", 7.0, TS(2024, 2, 1)),        # new key -> open row
            ],
        ),
        ["cust_id"],
        "ts",
    )
    rows = {(r.cust_id, r.is_current): r for r in merged.collect()}
    assert len(rows) == 5
    assert rows[(1, False)].valid_to == TS(2024, 2, 1)
    assert rows[(1, True)].segment == "platinum"
    assert rows[(1, True)].valid_from == TS(2024, 2, 1)
    # unchanged: original open row kept, valid_from untouched
    assert rows[(2, True)].valid_from == TS(2024, 1, 1)
    assert rows[(3, True)].segment == "tin"
    assert rows[(4, True)].valid_from == TS(2024, 2, 1)


def test_history_accumulates_and_single_current(spark):
    cur = None
    for month, seg in [(1, "a"), (2, "b"), (3, "c")]:
        cur = scd2_merge(
            cur, _updates(spark, [(1, seg, 0.0, TS(2024, month, 1))]), ["cust_id"], "ts"
        )
    rows = sorted(cur.collect(), key=lambda r: r.valid_from)
    assert [r.segment for r in rows] == ["a", "b", "c"]
    assert [r.is_current for r in rows] == [False, False, True]
    # closed intervals chain: valid_to of row i == valid_from of row i+1
    assert rows[0].valid_to == rows[1].valid_from
    assert rows[1].valid_to == rows[2].valid_from


def test_intra_batch_latest_wins(spark):
    cur = scd2_merge(
        None,
        _updates(
            spark,
            [
                (1, "early", 1.0, TS(2024, 1, 1)),
                (1, "late", 2.0, TS(2024, 1, 2)),
            ],
        ),
        ["cust_id"],
        "ts",
    )
    [r] = cur.collect()
    assert (r.segment, r.valid_from) == ("late", TS(2024, 1, 2))


def test_null_safe_change_detection(spark):
    base = scd2_merge(
        None, _updates(spark, [(1, None, 1.0, TS(2024, 1, 1))]), ["cust_id"], "ts"
    )
    # same null segment again: NOT a change
    same = scd2_merge(
        base, _updates(spark, [(1, None, 1.0, TS(2024, 2, 1))]), ["cust_id"], "ts"
    )
    assert same.count() == 1
    # null -> value IS a change
    changed = scd2_merge(
        base, _updates(spark, [(1, "x", 1.0, TS(2024, 2, 1))]), ["cust_id"], "ts"
    )
    assert changed.count() == 2
    assert changed.filter(F.col("is_current")).collect()[0].segment == "x"
