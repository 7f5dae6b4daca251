#!/usr/bin/env python
"""Scale probe for the PARAMETERIZED banded-LSH path (VERDICT r10 item 2).

The registry entries pin their banding constants for the oracle, which
makes their candidate output quadratic in corpus size (SCALING.md ninth
probe); `similarity_neardup_pairs`' own 100x run was capped for that
structural reason (10x exponent 1.22 recorded, 100x evidence hole). This
probe closes the hole through the production path: the same realistic
embeddings corpus (tools_scale_probe.build_realistic_embeddings — within-
replica cosines bit-preserved so TRUE pairs grow linearly, cross-replica
cosines scrambled to ~0), near-dup pairs emitted by
ext.similarity.lsh_neardup_pairs with band_bits = scaled_band_bits(n):
bits grow with log2(n), bucket count tracks the corpus, expected occupancy
— and therefore candidate volume per vector — stays constant.

Usage: python tools_probe_scaled_banding.py [growth ...]   (default: 10 100)
Reuses /tmp/scale_probe_<n>x_realistic corpora when present.
"""

from __future__ import annotations

import math
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from glue_etl_framework_spark import get_spark
from glue_etl_framework_spark.ext.similarity import (
    lsh_neardup_pairs,
    scaled_band_bits,
)
from glue_etl_framework_spark.session import warn_if_below_pair_emitter_floor

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
THRESHOLD = 0.35  # same verify threshold as similarity_neardup_pairs


def timed(df_builder, runs: int = 3) -> float:
    df_builder().write.format("noop").mode("overwrite").save()  # warm-up
    walls = []
    for _ in range(runs):
        t0 = time.perf_counter()
        df_builder().write.format("noop").mode("overwrite").save()
        walls.append(time.perf_counter() - t0)
    return statistics.median(walls)


def main() -> None:
    growths = [int(a) for a in sys.argv[1:]] or [10, 100]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS") or os.cpu_count() or 8)
    spark = get_spark(app_name="scaled_banding_probe", shuffle_partitions=cpus)
    msg = warn_if_below_pair_emitter_floor(spark, "ext.lsh_neardup_pairs")
    if msg:
        print(f"WARNING: {msg}", flush=True)

    def corpus(path: str):
        return spark.read.parquet(f"{path}/embeddings.parquet")

    base = corpus(SRC)
    n_base = base.count()
    bits_base = scaled_band_bits(n_base)
    wall_base = timed(
        lambda: lsh_neardup_pairs(base, THRESHOLD, band_bits=bits_base)
    )
    out_base = lsh_neardup_pairs(base, THRESHOLD, band_bits=bits_base).count()
    print(
        f"base: n={n_base} band_bits={bits_base} wall={wall_base:.2f}s "
        f"output={out_base}",
        flush=True,
    )

    for g in growths:
        out_dir = f"/tmp/scale_probe_{g}x_realistic"
        if not os.path.exists(f"{out_dir}/embeddings.parquet"):
            print(f"building {g}x realistic embeddings in {out_dir} ...", flush=True)
            from tools_scale_probe import build_realistic_embeddings

            Path(out_dir).mkdir(parents=True, exist_ok=True)
            build_realistic_embeddings(spark, g, out_dir)
        big = corpus(out_dir)
        n_big = big.count()
        bits = scaled_band_bits(n_big)
        wall = timed(lambda: lsh_neardup_pairs(big, THRESHOLD, band_bits=bits, n_rows=n_big))
        out = lsh_neardup_pairs(big, THRESHOLD, band_bits=bits, n_rows=n_big).count()
        exp = math.log(wall / wall_base) / math.log(g)
        print(
            f"{g}x: n={n_big} band_bits={bits} wall={wall:.2f}s "
            f"exponent {exp:.2f}  output {out_base} -> {out} "
            f"({out / max(out_base, 1):.0f}x)",
            flush=True,
        )


if __name__ == "__main__":
    main()
