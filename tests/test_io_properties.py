"""Property-based tests (hypothesis) for the io layer: upsert_by_key must
implement exact last-writer-wins dictionary semantics for ANY sequence of
batches — the honest-MERGE contract of README.md:68 (SURVEY.md §7.4 hard
part #1)."""

from __future__ import annotations

import uuid

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from glue_etl_framework_spark.io.writers import upsert_by_key

KEYS = st.integers(min_value=0, max_value=9)
VALS = st.text(alphabet="abcxyz", min_size=0, max_size=4)
# a batch is a key->value mapping: no intra-batch key conflicts, so
# last-writer-wins across batches is fully deterministic
BATCH = st.dictionaries(KEYS, VALS, min_size=1, max_size=6)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batches=st.lists(BATCH, min_size=1, max_size=4))
def test_upsert_sequences_match_dict_semantics(spark, tmp_path_factory, batches):
    loc = str(tmp_path_factory.mktemp("ups") / f"t_{uuid.uuid4().hex[:8]}")
    expected: dict[int, str] = {}
    for batch in batches:
        df = spark.createDataFrame(list(batch.items()), "k int, v string")
        upsert_by_key(spark, df, loc, ["k"])
        expected.update(batch)
        got = {r.k: r.v for r in spark.read.parquet(loc).collect()}
        assert got == expected


def test_upsert_is_idempotent(spark, tmp_path):
    loc = str(tmp_path / "idem")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    upsert_by_key(spark, df, loc, ["k"])
    first = sorted((r.k, r.v) for r in spark.read.parquet(loc).collect())
    upsert_by_key(spark, df, loc, ["k"])
    second = sorted((r.k, r.v) for r in spark.read.parquet(loc).collect())
    assert first == second == [(1, "a"), (2, "b")]


def test_codec_matrix_sizes_ordered(spark):
    """The codec matrix writes real codec-compressed files: zstd and gzip
    outputs must be smaller than snappy for the same data (sizes are
    environment facts, so they live here rather than in the hashed
    driver result)."""
    import glob
    import os

    from glue_etl_framework_spark.queries.io_ops import (
        _CODECS,
        _WORKDIRS,
        io_codec_roundtrip_matrix,
    )
    from tests.conftest import SF_ORACLE

    io_codec_roundtrip_matrix(spark, SF_ORACLE).collect()
    d = _WORKDIRS[("codec", SF_ORACLE)]

    def size(codec):
        return sum(
            os.path.getsize(f)
            for f in glob.glob(f"{d}/part_{codec}/*.parquet")
        )

    sizes = {c: size(c) for c in _CODECS}
    assert all(v > 0 for v in sizes.values()), sizes
    assert sizes["zstd"] < sizes["snappy"], sizes
    assert sizes["gzip"] < sizes["snappy"], sizes
