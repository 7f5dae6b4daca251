"""Property tests for late round-3 operators: the claims their docstrings
make, checked mechanically — CDC's insertion re-alignment promise and the
anisotropy audit's Gram-identity equivalence to the brute-force O(n^2)
computation."""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F

from glue_etl_framework_spark.queries import load_registry
from tests.conftest import SF_ORACLE

REGISTRY = load_registry()


def _write_docs(spark, tmp_path, texts):
    d = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, t, "en", "srcX", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{d}/documents.parquet")
    return d


def test_cdc_chunks_realign_after_insertion(spark, tmp_path):
    """THE content-defined-chunking property: prepending one byte must
    leave the tail of the chunk sequence intact (boundaries re-align at
    the first mask hit after the edit). Fixed-size chunking shares ~zero
    chunks after a 1-byte shift; CDC must share most of them."""
    base = " ".join(f"tok{i % 37}word{(i * 7) % 23}" for i in range(40))
    shifted = "X" + base
    d = _write_docs(spark, tmp_path, [base, shifted])
    out = REGISTRY["multimodal_cdc_chunks"].fn(spark, d).collect()
    h0 = [r.chunk_hash for r in sorted(out, key=lambda r: (r.doc_id, r.chunk_idx)) if r.doc_id == 0]
    h1 = [r.chunk_hash for r in sorted(out, key=lambda r: (r.doc_id, r.chunk_idx)) if r.doc_id == 1]
    assert len(h0) > 5, "degenerate chunking — mask/window too coarse for the fixture"
    shared = set(h0) & set(h1)
    # everything after the first re-aligned boundary is identical content,
    # so the overwhelming majority of chunks must be shared
    assert len(shared) >= 0.7 * len(h0), (len(shared), len(h0))
    # and the SUFFIX must match exactly once boundaries re-align
    k = 3
    assert h0[-k:] == h1[-k:], "tail chunks did not re-align after insertion"


def test_anisotropy_matches_bruteforce(spark):
    """The O(n) Gram-identity result equals the literal O(n^2) pairwise
    sum over the quantized vectors."""
    from glue_etl_framework_spark.queries.similarity import SCALE

    row = REGISTRY["embedding_anisotropy_audit"].fn(spark, SF_ORACLE).collect()[0]
    emb = pd.read_parquet(f"{SF_ORACLE}/embeddings.parquet")
    import numpy as np

    def round_half_away(x):
        # Spark F.round / DuckDB round() round half away from zero;
        # np.round is half-even and diverges on exact .5 ties
        return np.sign(x) * np.floor(np.abs(x) + 0.5)

    q = np.array(
        [round_half_away(np.asarray(v, dtype="float64") * SCALE) for v in emb["embedding"]]
    )
    q = q.astype("int64").astype(object)  # python ints: no int64 overflow
    s = q.sum(axis=0)
    gram = int(sum(x * x for x in s))
    self_dot = int(sum(int(sum(x * x for x in row_)) for row_ in q))
    n = len(q)

    def round_ha(x):
        import math

        return int(math.copysign(math.floor(abs(x) + 0.5), x))

    assert row.mean_self_dot == round_ha(self_dot / n)
    assert row.mean_pair_dot == round_ha((gram - self_dot) / (n * (n - 1)))
