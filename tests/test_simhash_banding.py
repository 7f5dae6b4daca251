"""Parameterized banded SimHash (ext.dedup) — the second fixed-banding
emitter class closed after the hyperplane one (RECIPES.md round-11 rule).
Pins (a) the pigeonhole FULL-recall guarantee of n_bands = hamming_max + 1
word-aligned bands, (b) that wider bands shrink candidate volume, and
(c) determinism across partitionings."""

from __future__ import annotations

from pyspark.sql import functions as F

from glue_etl_framework_spark.ext.dedup import (
    simhash_band_signatures,
    simhash_neardup_pairs,
)

SF_SMOKE = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select("doc_id", "text")


def _exact_hamming_pairs(spark, hamming_max, n_bands, band_bits):
    """Brute-force ground truth over the SAME signature: every unordered
    pair within the Hamming budget (500 docs -> 125k scored pairs)."""
    sig = simhash_band_signatures(_docs(spark), n_bands=n_bands, band_bits=band_bits)
    a = sig.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"))
    b = sig.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"))
    hamming = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: F.bit_count(x.bitwiseXOR(y))),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return (
        a.crossJoin(b)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= hamming_max)
    )


def test_pigeonhole_full_recall(spark):
    """With n_bands = hamming_max + 1, a pair within the Hamming budget
    differs in at most hamming_max bands, so at least one band matches
    exactly — the banded join must surface EVERY true pair."""
    hamming_max, band_bits = 6, 8
    banded = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in simhash_neardup_pairs(
            _docs(spark), hamming_max=hamming_max, band_bits=band_bits
        ).collect()
    }
    exact = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in _exact_hamming_pairs(
            spark, hamming_max, n_bands=hamming_max + 1, band_bits=band_bits
        ).collect()
    }
    assert banded == exact
    assert len(exact) > 0, "fixture must contain at least one near-dup pair"


def test_wider_bands_shrink_candidates(spark):
    """Growing band_bits (the log2(n) scaling knob) must not change the
    verified answer's correctness class but must cut candidate volume:
    count raw band collisions at 8 vs 16 bits."""
    docs = _docs(spark)

    def n_candidates(band_bits):
        sig = simhash_band_signatures(docs, n_bands=7, band_bits=band_bits)
        bands = sig.select("doc_id", F.posexplode("sig").alias("bidx", "bv"))
        return (
            bands.select(F.col("doc_id").alias("a"), "bidx", "bv")
            .join(bands.select(F.col("doc_id").alias("b"), "bidx", "bv"), ["bidx", "bv"])
            .filter(F.col("a") < F.col("b"))
            .select("a", "b")
            .distinct()
            .count()
        )

    assert n_candidates(16) < n_candidates(8)


def test_banded_pairs_deterministic_across_partitioning(spark):
    docs = _docs(spark)
    one = {
        tuple(r)
        for r in simhash_neardup_pairs(docs.repartition(1), band_bits=8).collect()
    }
    many = {
        tuple(r)
        for r in simhash_neardup_pairs(docs.repartition(13), band_bits=8).collect()
    }
    assert one == many


def test_band_bits_bounds():
    import pytest

    from glue_etl_framework_spark.ext.dedup import simhash_band_signatures

    with pytest.raises(ValueError):
        simhash_band_signatures(None, band_bits=0)
    with pytest.raises(ValueError):
        simhash_band_signatures(None, band_bits=65)
    # 64 passes no validation gate but 1 << 63 overflows LongType at
    # plan-build time — the advertised range must exclude it (ADVICE r11)
    with pytest.raises(ValueError, match="63"):
        simhash_band_signatures(None, band_bits=64)


def test_band_bits_63_builds_and_computes(spark):
    """The upper bound of the advertised range must actually work end to
    end: bit 62 is the highest set via a LongType literal (1 << 62 fits)."""
    from glue_etl_framework_spark.ext.dedup import simhash_band_signatures

    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "f g h i j")], ["doc_id", "text"]
    )
    rows = simhash_band_signatures(docs, n_bands=1, band_bits=63).collect()
    assert len(rows) == 2
    for r in rows:
        assert len(r["sig"]) == 1 and isinstance(r["sig"][0], int)


# ---- bounded-output contract (VERDICT r11 item 2) -------------------------
# When the corpus's true pair density is quadratic (the 100x eleventh-probe
# corpus: homogenized replicas put 18% of all pairs within Hamming 6), no
# banding parameter bounds the emitted stream — only a cap does. These pin
# the cap semantics; the measured recall cost lives in SCALING.md.


def _toy_docs(spark):
    """48 identical 'mass' docs (every band bucket they touch is hot) plus
    one isolated near-dup pair in buckets of size 2."""
    mass = [(i, "the quick brown fox jumps over the lazy dog again") for i in range(48)]
    pair = [(100, "completely different rare tokens qq ww ee rr tt yy"),
            (101, "completely different rare tokens qq ww ee rr tt zz")]
    return spark.createDataFrame(mass + pair, ["doc_id", "text"])


def test_bucket_cap_output_is_subset_of_uncapped(spark):
    docs = _toy_docs(spark)
    full = {(r["doc_a"], r["doc_b"]) for r in simhash_neardup_pairs(docs, band_bits=8).collect()}
    capped = {
        (r["doc_a"], r["doc_b"])
        for r in simhash_neardup_pairs(docs, band_bits=8, max_bucket_size=8).collect()
    }
    assert capped <= full


def test_bucket_cap_drops_hot_mass_keeps_cold_pair(spark):
    """The 48 identical docs share identical signatures -> every bucket
    they occupy has 48 members and is dropped at cap 8, so their
    48*47/2 = 1128 mutual pairs disappear; the isolated pair sits in
    buckets of size 2 and must survive."""
    docs = _toy_docs(spark)
    capped = {
        (r["doc_a"], r["doc_b"])
        for r in simhash_neardup_pairs(docs, band_bits=8, max_bucket_size=8).collect()
    }
    assert (100, 101) in capped
    assert all(a >= 100 for a, _ in capped), f"hot-bucket mass pairs leaked: {sorted(capped)[:5]}"
    uncapped = {
        (r["doc_a"], r["doc_b"])
        for r in simhash_neardup_pairs(docs, band_bits=8).collect()
    }
    assert len(uncapped) == 48 * 47 // 2 + 1  # the mass clique + the pair


def test_top_k_partners_bounds_rows_per_doc(spark):
    docs = _toy_docs(spark)
    out = simhash_neardup_pairs(docs, band_bits=8, top_k_partners=3).collect()
    from collections import Counter

    per_a = Counter(r["doc_a"] for r in out)
    assert max(per_a.values()) <= 3
    # deterministic: closest partners first (all mass pairs are hamming 0,
    # tie broken by doc_b), so doc 0 keeps partners 1, 2, 3
    kept_for_0 = sorted(r["doc_b"] for r in out if r["doc_a"] == 0)
    assert kept_for_0 == [1, 2, 3]


def test_cap_knob_validation(spark):
    import pytest

    docs = _toy_docs(spark)
    with pytest.raises(ValueError, match="max_bucket_size"):
        simhash_neardup_pairs(docs, band_bits=8, max_bucket_size=0).collect()
    with pytest.raises(ValueError, match="top_k_partners"):
        simhash_neardup_pairs(docs, band_bits=8, top_k_partners=0).collect()


def test_signature_reuse_path_identical(spark):
    """simhash_neardup_pairs(signatures=precomputed) must reproduce the
    direct call bit-for-bit — the reuse path shares one signature build
    across several hamming/cap settings (probe tooling relies on it)."""
    docs = _docs(spark)
    sig = simhash_band_signatures(docs, n_bands=7, band_bits=8).localCheckpoint(eager=True)
    direct = {
        tuple(r) for r in simhash_neardup_pairs(docs, band_bits=8).collect()
    }
    reused = {
        tuple(r)
        for r in simhash_neardup_pairs(docs, band_bits=8, signatures=sig).collect()
    }
    assert direct == reused
    capped_direct = {
        tuple(r)
        for r in simhash_neardup_pairs(docs, band_bits=8, max_bucket_size=16).collect()
    }
    capped_reused = {
        tuple(r)
        for r in simhash_neardup_pairs(
            docs, band_bits=8, max_bucket_size=16, signatures=sig
        ).collect()
    }
    assert capped_direct == capped_reused


def test_exact_dedup_first_then_capped_neardup_pipeline(spark):
    """Pins the RECIPES round-12 ordering rule end to end: an
    identical-doc clique is hot in every band and emits NOTHING under a
    bucket cap, so exact dedup (linear, uncapped) must run first — after
    it, the capped near-dup pass links the remaining near-pair and
    keep-representative yields one doc per true cluster."""
    from glue_etl_framework_spark.ext.dedup import dedup_keep_representative

    docs = _toy_docs(spark)  # 48 identical docs + near-dup pair (100, 101)
    # capped near-dup ALONE misses the identical clique entirely:
    capped_only = simhash_neardup_pairs(docs, band_bits=8, max_bucket_size=8)
    kept_wrong = dedup_keep_representative(docs, capped_only.select("doc_a", "doc_b")
                                           .withColumnRenamed("doc_a", "id_a")
                                           .withColumnRenamed("doc_b", "id_b"))
    assert kept_wrong.count() == 49  # 48 identical docs all kept + 1 of the pair
    # exact dedup first (hash the normalized text), then capped near-dup:
    exact = docs.dropDuplicates(["text"])
    assert exact.count() == 3  # one mass representative + both near-dups
    pairs = simhash_neardup_pairs(exact, band_bits=8, max_bucket_size=8)
    kept = dedup_keep_representative(
        exact,
        pairs.select(F.col("doc_a").alias("id_a"), F.col("doc_b").alias("id_b")),
    )
    assert kept.count() == 2  # mass representative + one of the near pair


def test_capped_and_topk_deterministic_across_partitioning(spark):
    """The bounded-output path must stay partitioning-invariant like the
    uncapped emitter: bucket counts are exact aggregates and the top-k
    window has a total order, so repartitioning cannot change the kept
    set."""
    docs = _docs(spark)
    kw = dict(band_bits=8, max_bucket_size=16, top_k_partners=2)
    one = {tuple(r) for r in simhash_neardup_pairs(docs.repartition(1), **kw).collect()}
    many = {tuple(r) for r in simhash_neardup_pairs(docs.repartition(13), **kw).collect()}
    assert one == many
    assert len(one) > 0


def test_minhash_banded_ext_matches_registry_entry(spark):
    """ext.dedup.minhash_banded_candidate_pairs (uncapped, shingle_n=3)
    must reproduce the oracle-attested dedup_minhash_lsh pair set
    bit-for-bit — one signature/banding construction across the registry
    and the parameterized production path."""
    from glue_etl_framework_spark.ext.dedup import minhash_banded_candidate_pairs
    from glue_etl_framework_spark.queries import t
    from glue_etl_framework_spark.queries.dedup import dedup_minhash_lsh

    entry = {
        (r["doc_a"], r["doc_b"]) for r in dedup_minhash_lsh(spark, SF_SMOKE).collect()
    }
    ext = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_banded_candidate_pairs(
            t(spark, SF_SMOKE, "documents").select("doc_id", "text")
        ).collect()
    }
    assert ext == entry
    assert len(ext) > 0


def test_minhash_banded_cap_semantics(spark):
    """Same cap contract as the other two emitter families: capped subset
    of uncapped; the identical-doc clique (identical shingle sets ->
    identical band signatures -> every bucket hot) emits nothing under the
    cap while cold-bucket docs keep their pairs."""
    from glue_etl_framework_spark.ext.dedup import minhash_banded_candidate_pairs

    docs = _toy_docs(spark)
    full = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_banded_candidate_pairs(docs).collect()
    }
    capped = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_banded_candidate_pairs(docs, max_bucket_size=8).collect()
    }
    assert capped <= full
    assert (0, 1) in full  # the identical mass pairs up uncapped
    assert all(a >= 100 for a, _ in capped)  # ...and is gone under the cap


def test_signature_reuse_rejects_insufficient_bands(spark):
    """The reuse path must not silently break the pigeonhole guarantee: a
    frame built with fewer bands than hamming_max + 1 raises instead of
    dropping pairs that share no full band (review finding r12)."""
    import pytest

    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d f")], ["doc_id", "text"]
    )
    sig = simhash_band_signatures(docs, n_bands=7, band_bits=8).localCheckpoint(eager=True)
    with pytest.raises(ValueError, match="bands"):
        simhash_neardup_pairs(docs, hamming_max=8, signatures=sig)
    # and the matching budget still works
    assert simhash_neardup_pairs(docs, hamming_max=6, signatures=sig).count() >= 0


# ---- signature-reuse bit-identity at ANY hamming budget (ADVICE r12) ------


def test_signature_reuse_wider_bands_bit_identical(spark):
    """A sig built with MORE bands than hamming_max + 1 must reproduce the
    direct call bit-for-bit: band b's hash depends only on (b, chunk), so
    the reuse path slices banding AND Hamming verification to the first
    n_bands words. Before the fix the Hamming filter ran over ALL passed
    bands — a strictly tighter criterion that silently shrank the pair
    set (the docstring advertises reuse across hamming settings)."""
    docs = _docs(spark)
    sig7 = simhash_band_signatures(docs, n_bands=7, band_bits=8).localCheckpoint(eager=True)
    for hmax in (3, 6):
        direct = {
            tuple(r)
            for r in simhash_neardup_pairs(docs, hamming_max=hmax, band_bits=8).collect()
        }
        reused = {
            tuple(r)
            for r in simhash_neardup_pairs(
                docs, hamming_max=hmax, band_bits=8, signatures=sig7
            ).collect()
        }
        assert reused == direct, f"hamming_max={hmax}"
        assert len(direct) > 0


def test_signature_reuse_validates_every_row(spark):
    """The band-count guard aggregates min(size(sig)) over the WHOLE frame
    (not an arbitrary first row), so a frame with one short row — e.g. a
    bad union — raises instead of silently producing wrong candidates."""
    import pytest

    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d f")], ["doc_id", "text"]
    )
    good = simhash_band_signatures(docs, n_bands=7, band_bits=8)
    short = simhash_band_signatures(
        docs.withColumn("doc_id", F.col("doc_id") + 10), n_bands=3, band_bits=8
    )
    mixed = good.union(short).localCheckpoint(eager=True)
    with pytest.raises(ValueError, match="bands"):
        simhash_neardup_pairs(docs, hamming_max=6, signatures=mixed)


# ---- dropped-mass observability (VERDICT r12 item 2) ----------------------


def test_cap_metrics_record_dropped_mass(spark):
    """cap_metrics must report exactly what the levers discarded: the 48
    identical docs occupy 7 band buckets of size 48 (> cap 8) -> 7 hot
    buckets, 7*48 dropped band rows; the surviving near pair emits 1 row,
    so top_k drops nothing."""
    docs = _toy_docs(spark)
    m = {}
    out = simhash_neardup_pairs(
        docs, band_bits=8, max_bucket_size=8, top_k_partners=3, cap_metrics=m
    )
    assert {(r["doc_a"], r["doc_b"]) for r in out.collect()} == {(100, 101)}
    assert m["hot_buckets"] == 7
    assert m["dropped_band_rows"] == 7 * 48
    assert m["dropped_verified_pairs"] == 0


def test_cap_metrics_count_topk_drops(spark):
    """top_k_partners' metric: the uncapped toy emits 1128 clique pairs +
    1 cold pair; at k=3 per doc_a the clique keeps 3 partners per doc
    (where it is the smaller id), so dropped = kept-complement, exactly."""
    docs = _toy_docs(spark)
    m = {}
    out = simhash_neardup_pairs(docs, band_bits=8, top_k_partners=3, cap_metrics=m)
    kept = out.count()
    assert m["dropped_verified_pairs"] == (48 * 47 // 2 + 1) - kept
    assert m["dropped_verified_pairs"] > 0


def test_cap_metrics_none_records_nothing(spark):
    """metrics=None is the default lazy path — nothing eager, no dict
    mutation anywhere (the registry entries rely on the byte-identical
    uncapped plan; this pins the capped plan's shape stays caller-silent
    too)."""
    docs = _toy_docs(spark)
    out = simhash_neardup_pairs(docs, band_bits=8, max_bucket_size=8)
    assert out.count() == 1  # plan still evaluates correctly


# ---- occupancy-derived auto cap (VERDICT r12 item 3) -----------------------


def test_auto_bucket_cap_formula():
    import pytest

    from glue_etl_framework_spark.ext.similarity import auto_bucket_cap

    assert auto_bucket_cap(500, 8) == 8 * 2        # ceil(500/256) = 2
    assert auto_bucket_cap(5000, 8) == 8 * 20      # the sf0.1 documents shape
    assert auto_bucket_cap(50, 8) == 8             # toy corpus: factor * 1
    assert auto_bucket_cap(1 << 20, 20) == 8       # occupancy exactly 1
    assert auto_bucket_cap(0, 8) == 8              # empty corpus: bare factor
    assert auto_bucket_cap(500, 8, factor=2) == 4
    with pytest.raises(ValueError, match="band_bits"):
        auto_bucket_cap(500, 0)
    with pytest.raises(ValueError, match="factor"):
        auto_bucket_cap(500, 8, factor=0)


def test_auto_cap_noop_when_buckets_match_occupancy(spark):
    """On a corpus whose signatures SPREAD (unique token sets -> bucket
    sizes near the expected occupancy the banding was sized for), the
    auto cap must be a no-op: capped output == uncapped, zero hot
    buckets. This is the 'engaged only when adversarial' half of the
    contract; the engagement half is the toy-clique test below."""
    docs = spark.createDataFrame(
        [(i, f"u{i}a u{i}b u{i}c u{i}d u{i}e u{i}f") for i in range(200)],
        ["doc_id", "text"],
    )
    m = {}
    capped = {
        tuple(r)
        for r in simhash_neardup_pairs(
            docs, band_bits=8, max_bucket_size="auto", cap_metrics=m
        ).collect()
    }
    full = {tuple(r) for r in simhash_neardup_pairs(docs, band_bits=8).collect()}
    assert capped == full
    assert m["hot_buckets"] == 0
    assert m["dropped_band_rows"] == 0
    assert m["max_bucket_size_resolved"] == 8  # factor * ceil(200/256)


def test_auto_cap_engages_on_adversarial_clique(spark):
    """The 48-identical-doc clique concentrates 48 docs into buckets the
    banding expected ~1 occupant in — auto (factor * ceil(50/256) = 8)
    drops exactly that mass and keeps the cold near pair, matching the
    explicit cap=8 semantics test above."""
    docs = _toy_docs(spark)
    m = {}
    capped = {
        (r["doc_a"], r["doc_b"])
        for r in simhash_neardup_pairs(
            docs, band_bits=8, max_bucket_size="auto", cap_metrics=m
        ).collect()
    }
    assert capped == {(100, 101)}
    assert m["max_bucket_size_resolved"] == 8
    assert m["hot_buckets"] == 7 and m["dropped_band_rows"] == 7 * 48


def test_auto_cap_matches_explicit_resolution(spark):
    """'auto' must be pure resolution sugar: identical output to passing
    auto_bucket_cap(n, band_bits) explicitly."""
    from glue_etl_framework_spark.ext.similarity import auto_bucket_cap

    docs = _docs(spark)
    cap = auto_bucket_cap(docs.count(), 8)
    auto = {
        tuple(r)
        for r in simhash_neardup_pairs(docs, band_bits=8, max_bucket_size="auto").collect()
    }
    explicit = {
        tuple(r)
        for r in simhash_neardup_pairs(docs, band_bits=8, max_bucket_size=cap).collect()
    }
    assert auto == explicit and len(auto) > 0


def test_minhash_banded_rejects_auto(spark):
    """Hash-space minhash banding has no occupancy target — 'auto' would
    degenerate to the bare factor and drop real near-dup groups; the
    emitter refuses it with guidance instead."""
    import pytest

    from glue_etl_framework_spark.ext.dedup import minhash_banded_candidate_pairs

    with pytest.raises(ValueError, match="auto"):
        minhash_banded_candidate_pairs(_toy_docs(spark), max_bucket_size="auto")


def test_minhash_banded_cap_metrics(spark):
    """The minhash family reports its dropped mass through the same
    metrics contract as the other two emitters."""
    from glue_etl_framework_spark.ext.dedup import minhash_banded_candidate_pairs

    docs = _toy_docs(spark)
    m = {}
    capped = minhash_banded_candidate_pairs(docs, max_bucket_size=8, cap_metrics=m)
    assert all(r["doc_a"] >= 100 for r in capped.collect())
    assert m["hot_buckets"] > 0
    assert m["dropped_band_rows"] >= m["hot_buckets"] * 9  # every hot bucket > cap 8


def test_auto_cap_with_signatures_requires_explicit_band_bits(spark):
    """'auto' derives the cap from band_bits, which is not recoverable
    from a passed signatures frame — a defaulted width would silently
    mis-size the cap (review finding r13), so the combination raises
    unless band_bits is explicit; with it, the resolution matches the
    direct path."""
    import pytest

    docs = _toy_docs(spark)
    sig = simhash_band_signatures(docs, n_bands=7, band_bits=8).localCheckpoint(eager=True)
    with pytest.raises(ValueError, match="band_bits"):
        simhash_neardup_pairs(docs, max_bucket_size="auto", signatures=sig)
    m = {}
    out = {
        (r["doc_a"], r["doc_b"])
        for r in simhash_neardup_pairs(
            docs, band_bits=8, max_bucket_size="auto", signatures=sig, cap_metrics=m
        ).collect()
    }
    assert out == {(100, 101)} and m["max_bucket_size_resolved"] == 8


def test_symmetric_top_k_gives_every_doc_its_partners(spark):
    """keep_top_k_partners_symmetric: the true per-doc bound. In the
    48-clique, the canonical-left variant leaves high-id docs with few or
    no rows (doc 47 appears as doc_a in 0 of the kept pairs at small k);
    the symmetric variant guarantees EVERY clique doc has its k best
    partners present, total rows stay <= k*n, and the output is a subset
    of the input pairs."""
    from collections import Counter

    from glue_etl_framework_spark.ext.dedup import keep_top_k_partners_symmetric

    docs = _toy_docs(spark)
    pairs = simhash_neardup_pairs(docs, band_bits=8).localCheckpoint(eager=True)
    m = {}
    kept = keep_top_k_partners_symmetric(
        pairs, 3, "doc_a", "doc_b",
        [F.col("hamming").asc(), F.col("_other").asc()], metrics=m,
    ).collect()
    full = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
    got = {(r["doc_a"], r["doc_b"]) for r in kept}
    assert got <= full
    assert len(kept) <= 3 * 50
    # every doc in the clique has >= 3 pairs touching it (its own k best)
    touch = Counter()
    for a, b in got:
        touch[a] += 1
        touch[b] += 1
    for doc in range(48):
        assert touch[doc] >= 3, doc
    # doc 47's own 3 best partners (hamming 0, smallest _other) are present
    partners_47 = {a if b == 47 else b for a, b in got if 47 in (a, b)}
    assert {0, 1, 2} <= partners_47
    assert m["dropped_verified_pairs"] == len(full) - len(got)


def test_symmetric_top_k_deterministic_across_partitioning(spark):
    from glue_etl_framework_spark.ext.dedup import keep_top_k_partners_symmetric

    docs = _docs(spark)
    pairs = simhash_neardup_pairs(docs, band_bits=8).localCheckpoint(eager=True)
    order = [F.col("hamming").asc(), F.col("_other").asc()]
    one = {
        tuple(r)
        for r in keep_top_k_partners_symmetric(
            pairs.repartition(1), 2, "doc_a", "doc_b", order
        ).collect()
    }
    many = {
        tuple(r)
        for r in keep_top_k_partners_symmetric(
            pairs.repartition(13), 2, "doc_a", "doc_b", order
        ).collect()
    }
    assert one == many and len(one) > 0


def test_emitter_top_k_symmetric_passthrough(spark):
    """top_k_symmetric=True on the emitter must equal hand-composing
    keep_top_k_partners_symmetric over the uncapped output (VERDICT r13
    item 5: the true per-doc bound reachable without manual
    symmetrize -> cap -> re-canonicalize), and differ from the
    asymmetric route where the clique makes the asymmetry visible."""
    from glue_etl_framework_spark.ext.dedup import keep_top_k_partners_symmetric

    docs = _toy_docs(spark)
    via_knob = {
        tuple(r)
        for r in simhash_neardup_pairs(
            docs, band_bits=8, top_k_partners=3, top_k_symmetric=True
        ).collect()
    }
    manual = {
        tuple(r)
        for r in keep_top_k_partners_symmetric(
            simhash_neardup_pairs(docs, band_bits=8).localCheckpoint(eager=True),
            3,
            "doc_a",
            "doc_b",
            [F.col("hamming").asc(), F.col("_other").asc()],
        ).collect()
    }
    assert via_knob == manual and len(via_knob) > 0
    asymmetric = {
        tuple(r)
        for r in simhash_neardup_pairs(
            docs, band_bits=8, top_k_partners=3
        ).collect()
    }
    assert via_knob != asymmetric  # per-doc coverage is a different set here


def test_hyperplane_top_k_symmetric_passthrough(spark):
    """Same passthrough contract on the hyperplane emitter."""
    from glue_etl_framework_spark.ext.dedup import keep_top_k_partners_symmetric
    from glue_etl_framework_spark.ext.similarity import lsh_neardup_pairs

    vecs = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    kw = dict(threshold=0.2, n_bands=2, band_bits=8)
    via_knob = {
        tuple(r)
        for r in lsh_neardup_pairs(
            vecs, top_k_partners=2, top_k_symmetric=True, **kw
        ).collect()
    }
    manual = {
        tuple(r)
        for r in keep_top_k_partners_symmetric(
            lsh_neardup_pairs(vecs, **kw).localCheckpoint(eager=True),
            2,
            "vec_a",
            "vec_b",
            [F.col("cosine").desc(), F.col("_other").asc()],
        ).collect()
    }
    assert via_knob == manual and len(via_knob) > 0


def test_signature_reuse_honors_id_col(spark):
    """ADVICE r13: a signatures frame keyed by the caller's own id column
    must work via id_col (renamed to the internal doc_id), and a frame
    matching neither column must raise a contract error naming the
    (doc_id, sig) shape — not an opaque AnalysisException."""
    import pytest

    docs = _docs(spark)
    sig = simhash_band_signatures(docs, n_bands=7, band_bits=8)
    direct = {
        tuple(r) for r in simhash_neardup_pairs(docs, signatures=sig).collect()
    }
    renamed = sig.withColumnRenamed("doc_id", "my_id")
    via_id_col = {
        tuple(r)
        for r in simhash_neardup_pairs(
            docs, id_col="my_id", signatures=renamed
        ).collect()
    }
    assert via_id_col == direct and len(direct) > 0
    with pytest.raises(ValueError, match=r"\(doc_id, sig\)"):
        simhash_neardup_pairs(
            docs, signatures=sig.withColumnRenamed("doc_id", "unrelated")
        )
    with pytest.raises(ValueError, match="'sig'"):
        simhash_neardup_pairs(
            docs, signatures=sig.withColumnRenamed("sig", "signature")
        )


def test_top_k_symmetric_requires_the_knob(spark):
    """top_k_symmetric=True without top_k_partners must raise (r14 review:
    silently returning the unbounded stream violates the loud-contract
    rule this round applies everywhere else), on BOTH emitters, before
    any eager work."""
    import pytest

    from glue_etl_framework_spark.ext.similarity import lsh_neardup_pairs

    docs = _toy_docs(spark)
    with pytest.raises(ValueError, match="top_k_partners"):
        simhash_neardup_pairs(docs, band_bits=8, top_k_symmetric=True)
    with pytest.raises(ValueError, match="top_k_partners"):
        lsh_neardup_pairs(docs, n_rows=50, top_k_symmetric=True)
