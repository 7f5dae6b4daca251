#!/usr/bin/env python
"""Adversarial capped-tail validation of the estimator's design CI
(r15 second review — ADVICE r14's correlated member-capped-tail
concern, measured; results in probes/recall_adversarial_r15.txt).

Fixtures: H member-capped buckets that AGREE heavily — either all
holding the same doc set ("same-docs") or a sliding window over a doc
ring ("overlap~k"). Pairs caught by take-all buckets or by >= 2 tail
buckets survive every delete-one jackknife replicate, so the jackknife
alone is blind to their member-cap Bernoulli randomness; the var_mem
term (conditional-on-draw member-cap variance) exists because this
harness measured up to 2.2x sd understatement without it.

For each fixture this compares:
- the CODE's single-deterministic-draw ``ci95_design`` (Spark path),
- the TRUE design sd from a Monte Carlo of the design (uniform
  K_rest-of-H_rest WOR tail draw + independent per-bucket M-member
  prefixes), using the code's pi weights.

Usage: python tools_probe_recall_adversarial.py
"""

import itertools
import random
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from glue_etl_framework_spark import get_spark
from glue_etl_framework_spark.ext.dedup import _estimate_lost_pairs_core

K = 8
CAP = 3


def build(H, docs_per, overlap):
    if overlap is None:
        return [list(range(docs_per)) for _ in range(H)]
    ring = docs_per + H - overlap
    return [[(b + i) % ring for i in range(docs_per)] for b in range(H)]


def spark_est(spark, buckets, M):
    rows = [(d, b, 7) for b, docs in enumerate(buckets) for d in docs]
    bands = spark.createDataFrame(rows, ["doc_id", "bidx", "bv"])
    return _estimate_lost_pairs_core(
        bands, lambda cand: cand, max_bucket_size=CAP,
        sample_buckets=K, max_members_per_bucket=M,
    )


def mc(buckets, M, n_sim=40000, seed=23):
    """True design sd: take-all = the floor(K/2) first buckets (matches
    the code's (m desc, bidx, bv) ordering on equal-size fixtures)."""
    rng = random.Random(seed)
    H = len(buckets)
    n_take = K // 2
    k_rest = K - n_take
    p = k_rest / (H - n_take)
    qs = {b: M * (M - 1) / (len(d) * (len(d) - 1)) for b, d in enumerate(buckets)}
    pairs = set()
    membership = defaultdict(list)
    for b, docs in enumerate(buckets):
        for pr in itertools.combinations(sorted(docs), 2):
            pairs.add(pr)
            membership[pr].append(b)
    code_pi = {}
    for pr in pairs:
        miss = 1.0
        for b in membership[pr]:
            miss *= (1 - qs[b]) if b < n_take else (1 - p * qs[b])
        code_pi[pr] = 1.0 - miss
    ests = []
    for _ in range(n_sim):
        drawn = list(range(n_take)) + rng.sample(range(n_take, H), k_rest)
        caught = set()
        for b in drawn:
            prefix = rng.sample(buckets[b], M)
            for pr in itertools.combinations(sorted(prefix), 2):
                caught.add(pr)
        ests.append(sum(1.0 / code_pi[pr] for pr in caught))
    mean = sum(ests) / n_sim
    sd = (sum((e - mean) ** 2 for e in ests) / (n_sim - 1)) ** 0.5
    return len(pairs), mean, sd


def main() -> None:
    spark = get_spark(app_name="recall_adversarial", shuffle_partitions=8)
    for tag, H, docs_per, M, overlap in [
        ("same-docs q=0.33", 12, 10, 6, None),
        ("same-docs q=0.13", 12, 10, 4, None),
        ("overlap~3 q=0.33", 12, 10, 6, 3),
        ("overlap~3 q=0.13", 12, 10, 4, 3),
    ]:
        buckets = build(H, docs_per, overlap)
        est = spark_est(spark, buckets, M)
        truth, mean, sd = mc(buckets, M)
        print(
            f"{tag}: truth={truth} code_est={est['est_lost_pairs']:.1f} "
            f"code_ci95_design=+-{est['ci95_design']:.1f} "
            f"code_ci95_nominal=+-{est['ci95']:.1f} "
            f"MC mean={mean:.1f} MC 1.96sd=+-{1.96 * sd:.1f} "
            f"covered={abs(est['est_lost_pairs'] - truth) <= est['ci95_design']} "
            f"understates={est['ci95_design'] < 1.96 * sd}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
