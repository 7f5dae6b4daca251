"""Model-based property tests for the keyed writer pair: any sequence of
upsert / delete batches must leave the table equal to a plain dict replay
(last-writer-wins per key, erased keys absent)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from glue_etl_framework_spark.io.writers import delete_by_keys, upsert_by_key

KEYS = st.integers(min_value=0, max_value=9)
# a step is ("upsert", [(key, value), ...]) or ("delete", [key, ...])
STEP = st.one_of(
    st.tuples(
        st.just("upsert"),
        st.lists(st.tuples(KEYS, st.integers(0, 1000)), min_size=1, max_size=5),
    ),
    st.tuples(st.just("delete"), st.lists(KEYS, min_size=1, max_size=3)),
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(steps=st.lists(STEP, min_size=1, max_size=4))
def test_upsert_delete_replay_matches_dict_model(steps, spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("updel")
    loc = str(tmp / "table")
    model: dict[int, int] = {}
    seq = 0
    for op, payload in steps:
        if op == "upsert":
            seq += 1
            rows = [(k, v, seq * 10 + i) for i, (k, v) in enumerate(payload)]
            df = spark.createDataFrame(rows, "k long, v long, ord long")
            upsert_by_key(spark, df, loc, ["k"], order_by="ord")
            # last-writer-wins within the batch: highest ord per key
            for k, v, _ in sorted(rows, key=lambda r: r[2]):
                model[k] = v
        else:
            import os

            if not os.path.exists(loc):
                continue
            df = spark.createDataFrame([(k,) for k in payload], "k long")
            n_deleted = delete_by_keys(spark, loc, df, ["k"])
            # the returned count must equal the model's removals exactly —
            # duplicate keys in one batch count once, absent keys zero,
            # and a delete against an already-empty table returns 0 (the
            # AQE empty-relation case the single-observe rewrite fixed)
            assert n_deleted == len({k for k in payload if k in model})
            for k in payload:
                model.pop(k, None)
    import os

    if not os.path.exists(loc):
        assert not model
        return
    got = {r.k: r.v for r in spark.read.parquet(loc).select("k", "v").collect()}
    assert got == model
