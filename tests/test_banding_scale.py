"""Pins the parameterized banded-LSH scale path (VERDICT r10 item 1).

The r10 ninth scale probe proved that FIXED banding constants make
in-bucket candidate-pair output quadratic in corpus size (2 x 256 buckets
-> occupancy ~ n -> pairs ~ n^2; measured 10,183x output at 100x volume).
The fix is standard LSH parameter scaling — signature bits per band grow
with log2(n) so bucket count tracks the corpus and expected occupancy
stays constant. These tests pin (a) the sizing rule's math, (b) that the
parameterized ext builder at the oracle-pinned shape reproduces the
registry entry bit-for-bit, and (c) that scaled bits actually hold
candidate volume ~linear on a grown corpus where fixed bits go quadratic.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from glue_etl_framework_spark.ext import similarity as S

SF_ORACLE = "/root/testdata/sf0.01"
SF_BENCH = "/root/testdata/sf0.1"


def test_scaled_band_bits_holds_expected_occupancy_constant():
    """band_bits = ceil(log2(n/target)) => expected occupancy n/2^bits is
    in (target/2, target] for every corpus size past the min-bits clamp —
    the invariant that keeps expected in-bucket pairs per vector, and so
    total candidate volume, LINEAR in n."""
    target = 32
    clamp_ceiling = target * (1 << 8)  # below this, min_bits=8 governs
    for exp in range(2, 13):
        n = 10**exp
        bits = S.scaled_band_bits(n, target_rows_per_bucket=target)
        occupancy = n / (1 << bits)
        if n <= clamp_ceiling:
            assert occupancy <= target
        elif bits < 28:  # inside the clamps the rule must hold exactly
            assert target / 2 < occupancy <= target, (n, bits, occupancy)


def test_scaled_band_bits_monotone_and_clamped():
    ns = [1, 100, 10**4, 10**6, 10**8, 10**10, 10**14]
    bits = [S.scaled_band_bits(n) for n in ns]
    assert bits == sorted(bits), "bits must be non-decreasing in n"
    assert bits[0] == 8, "toy corpora stay at the oracle-pinned shape"
    assert bits[-1] == 28, "plan width is capped"
    assert S.scaled_band_bits(0) == 8
    assert S.scaled_band_bits(10**6, min_bits=4, max_bits=40) == 15


def test_pinned_shape_reproduces_registry_entry(spark):
    """lsh_neardup_pairs at (n_bands=2, band_bits=8) must emit the exact
    row set of the oracle-checked registry entry — the parameterization
    cannot drift from the attested constants."""
    from glue_etl_framework_spark.queries.similarity import (
        similarity_lsh_hyperplane_pairs,
    )

    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    ext_rows = {
        tuple(r)
        for r in S.lsh_neardup_pairs(
            emb, threshold=0.35, n_bands=2, band_bits=8
        ).collect()
    }
    reg_rows = {
        tuple(r) for r in similarity_lsh_hyperplane_pairs(spark, SF_ORACLE).collect()
    }
    assert ext_rows == reg_rows
    assert len(ext_rows) > 0


def _candidate_pairs(qdf, band_bits: int) -> int:
    """Total in-bucket candidate pairs = sum over buckets of C(c, 2) —
    counted from bucket sizes, never materialized."""
    sig = S.banded_signatures(qdf, n_bands=2, band_bits=band_bits)
    row = (
        sig.groupBy("bidx", "bv")
        .count()
        .agg(F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("pairs"))
        .collect()[0]
    )
    return int(row["pairs"] or 0)


@pytest.mark.slow
def test_scaled_bits_keep_candidate_volume_linear(spark):
    """Grow the corpus 16x with the probe's orthogonal sign-flip replicas
    (cross-replica cosines scramble to ~0, so TRUE structure grows
    linearly). With FIXED 8-bit bands, candidate pairs must blow up
    ~quadratically (~16x per-vector); with scaled_band_bits-sized bands
    the per-vector candidate load must stay within a small factor of the
    base corpus — the measurable form of the ninth-probe fix."""
    growth = 16
    base = spark.read.parquet(f"{SF_BENCH}/embeddings.parquet")
    n_base = base.count()
    reps = [base]
    for r in range(1, growth):
        def make_flipper(rep_idx):
            def flipper(x, i):
                src = F.format_string(f"%d:{rep_idx}", i)
                return F.when(F.pmod(F.xxhash64(src), F.lit(2)) == 0, -x).otherwise(x)

            return flipper

        reps.append(
            base.withColumn("vec_id", F.col("vec_id") + r * 1_000_000_000)
            .withColumn("embedding", F.transform("embedding", make_flipper(r)))
        )
    big = reps[0]
    for rep in reps[1:]:
        big = big.unionByName(rep)
    big = big.localCheckpoint(eager=True)
    n_big = n_base * growth

    q_base = S.quantize_embeddings(base)
    q_big = S.quantize_embeddings(big)
    # target = the BASE corpus's occupancy at the pinned 8-bit shape
    # (2000/256 ~ 8), so base and scaled-grown runs are compared at the
    # SAME expected bucket occupancy — the quantity the rule holds fixed.
    target = max(1, round(n_base / (1 << 8)))
    fixed_bits = S.scaled_band_bits(n_base, target_rows_per_bucket=target)
    assert fixed_bits == 8
    scaled = S.scaled_band_bits(n_big, target_rows_per_bucket=target)
    assert scaled > fixed_bits, "growth must actually trigger wider bands"

    per_vec_base = _candidate_pairs(q_base, fixed_bits) / n_base
    per_vec_fixed = _candidate_pairs(q_big, fixed_bits) / n_big
    per_vec_scaled = _candidate_pairs(q_big, scaled) / n_big

    # fixed bands: occupancy grew ~16x, so per-vector candidates ~16x
    assert per_vec_fixed > 6 * per_vec_base, (per_vec_base, per_vec_fixed)
    # scaled bands: per-vector load stays near the base corpus's (true
    # near-dup structure still collides; allow real-data clustering slack)
    assert per_vec_scaled < 4 * per_vec_base, (per_vec_base, per_vec_scaled)
    assert per_vec_scaled < per_vec_fixed / 3


def test_lsh_bucket_cap_and_top_k(spark):
    """Bounded-output knobs on the hyperplane emitter (VERDICT r11 item 2):
    capped output is a subset of uncapped; top_k_partners bounds rows per
    vec_a and keeps the highest-cosine partners."""
    from collections import Counter

    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    full = {
        (r["vec_a"], r["vec_b"])
        for r in S.lsh_neardup_pairs(emb, 0.35, band_bits=8).collect()
    }
    capped = {
        (r["vec_a"], r["vec_b"])
        for r in S.lsh_neardup_pairs(emb, 0.35, band_bits=8, max_bucket_size=4).collect()
    }
    assert capped <= full
    assert len(capped) < len(full)  # sf0.01 buckets exceed 4: the cap bit

    rows = S.lsh_neardup_pairs(emb, 0.35, band_bits=8, top_k_partners=2).collect()
    per_a = Counter(r["vec_a"] for r in rows)
    assert per_a and max(per_a.values()) <= 2
    # per vec_a the kept partners are the 2 best cosines of the full set
    best = {}
    for r in S.lsh_neardup_pairs(emb, 0.35, band_bits=8).collect():
        best.setdefault(r["vec_a"], []).append((-r["cosine"], r["vec_b"]))
    for a, kept in per_a.items():
        expect = {b for _, b in sorted(best[a])[:2]}
        got = {r["vec_b"] for r in rows if r["vec_a"] == a}
        assert got == expect, (a, got, expect)


def test_hyperplane_band_bits_bounds():
    """Same [1, 63] guard as the simhash twin (review finding r12: the
    ADVICE fix had been applied to only one of two identical sites)."""
    with pytest.raises(ValueError, match="63"):
        S.banded_signatures(None, n_bands=1, band_bits=64)
    with pytest.raises(ValueError):
        S.banded_signatures(None, n_bands=1, band_bits=0)


def test_lsh_auto_cap_and_metrics(spark):
    """'auto' on the hyperplane emitter: resolves via auto_bucket_cap(n,
    band_bits), records the resolution and any dropped mass in
    cap_metrics, and is pure sugar for the explicit cap."""
    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    n = emb.count()
    cap = S.auto_bucket_cap(n, 8)
    m = {}
    auto = {
        (r["vec_a"], r["vec_b"])
        for r in S.lsh_neardup_pairs(
            emb, 0.35, band_bits=8, max_bucket_size="auto", cap_metrics=m
        ).collect()
    }
    explicit = {
        (r["vec_a"], r["vec_b"])
        for r in S.lsh_neardup_pairs(emb, 0.35, band_bits=8, max_bucket_size=cap).collect()
    }
    assert auto == explicit
    assert m["max_bucket_size_resolved"] == cap
    # every hot bucket holds MORE than cap rows, so the dropped banding
    # mass must exceed cap per hot bucket (0 == 0 when none are hot)
    assert m["dropped_band_rows"] >= m["hot_buckets"] * (cap + 1)


def test_lsh_cap_metrics_account_for_both_levers(spark):
    """With both levers engaged the metrics dict carries all four keys and
    the dropped-pairs count reconciles with the uncapped-at-same-bucket-cap
    output exactly."""
    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    m = {}
    kept = S.lsh_neardup_pairs(
        emb, 0.35, band_bits=8, max_bucket_size=4, top_k_partners=2, cap_metrics=m
    ).count()
    bucket_only = S.lsh_neardup_pairs(
        emb, 0.35, band_bits=8, max_bucket_size=4
    ).count()
    assert m["dropped_verified_pairs"] == bucket_only - kept
    assert m["hot_buckets"] > 0  # sf0.01 buckets exceed 4 (pinned above)
    assert m["dropped_band_rows"] > 4 * m["hot_buckets"]
