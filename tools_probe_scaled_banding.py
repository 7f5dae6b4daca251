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

Usage: python tools_probe_scaled_banding.py [--simhash] [growth ...]
(default growths: 10 100). Reuses /tmp/scale_probe_<n>x_realistic corpora
when present.

`--simhash` probes the OTHER parameterized emitter instead
(ext.dedup.simhash_neardup_pairs on the realistic documents corpus —
filler-token replicas + ~1% planted near-dups, the sixth-probe corpus):
hamming_max=6, n_bands=7 (full pigeonhole recall), band_bits =
scaled_band_bits(n_docs). The registry entry's fixed top-16-of-32 banding
measured exponent 0.86 with 2683x output growth at 100x (ninth probe);
this run shows what the scaling rule does to the same workload.
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
from glue_etl_framework_spark.session import (
    warn_if_below_pair_emitter_floor,
    warn_if_low_disk,
)

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
    argv = [a for a in sys.argv[1:] if a != "--simhash"]
    simhash = "--simhash" in sys.argv[1:]
    growths = [int(a) for a in argv] or [10, 100]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS") or os.cpu_count() or 8)
    spark = get_spark(app_name="scaled_banding_probe", shuffle_partitions=cpus)
    probe_name = "ext.simhash_neardup_pairs" if simhash else "ext.lsh_neardup_pairs"
    for msg in (
        warn_if_below_pair_emitter_floor(spark, probe_name),
        warn_if_low_disk(spark, probe_name),
    ):
        if msg:
            print(f"WARNING: {msg}", flush=True)

    if simhash:
        from glue_etl_framework_spark.ext.dedup import simhash_neardup_pairs

        table, ensure = "documents", "build_realistic"

        def query(df, n_rows):
            return simhash_neardup_pairs(
                df.select("doc_id", "text"),
                hamming_max=6,
                band_bits=scaled_band_bits(n_rows),
            )
    else:
        table, ensure = "embeddings", "build_realistic_embeddings"

        def query(df, n_rows):
            return lsh_neardup_pairs(
                df, THRESHOLD, band_bits=scaled_band_bits(n_rows), n_rows=n_rows
            )

    def corpus(path: str):
        return spark.read.parquet(f"{path}/{table}.parquet")

    base = corpus(SRC)
    n_base = base.count()
    bits_base = scaled_band_bits(n_base)
    wall_base = timed(lambda: query(base, n_base))
    out_base = query(base, n_base).count()
    print(
        f"base: n={n_base} band_bits={bits_base} wall={wall_base:.2f}s "
        f"output={out_base}",
        flush=True,
    )

    for g in growths:
        out_dir = f"/tmp/scale_probe_{g}x_realistic"
        if not os.path.exists(f"{out_dir}/{table}.parquet"):
            print(f"building {g}x realistic {table} in {out_dir} ...", flush=True)
            import tools_scale_probe

            Path(out_dir).mkdir(parents=True, exist_ok=True)
            getattr(tools_scale_probe, ensure)(spark, g, out_dir)
        big = corpus(out_dir)
        n_big = big.count()
        bits = scaled_band_bits(n_big)
        wall = timed(lambda: query(big, n_big))
        out = query(big, n_big).count()
        exp = math.log(wall / wall_base) / math.log(g)
        print(
            f"{g}x: n={n_big} band_bits={bits} wall={wall:.2f}s "
            f"exponent {exp:.2f}  output {out_base} -> {out} "
            f"({out / max(out_base, 1):.0f}x)",
            flush=True,
        )


if __name__ == "__main__":
    main()
