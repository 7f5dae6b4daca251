#!/usr/bin/env python
"""Bounded-output probe: the capped simhash emitter at 100x (VERDICT r11
item 2).

The r11 eleventh probe's 100x simhash run died filling the 252 GB disk
with shuffle spill: the realistic corpus's filler tokens homogenize
within-replica token sets, so true pair density is quadratic in replica
size (~10^9-10^10 candidate rows at 100x) and NO banding width bounds the
stream — only a cap does. This probe measures what the cap costs and what
it buys:

1. recall-vs-cap at base and 10x, where the uncapped emitter completes:
   recall = |capped pairs| / |uncapped pairs| (capped output is a proven
   subset — tests/test_simhash_banding.py).
2. the 100x run that previously died, under the chosen cap: wall + output
   (single timed run; the corpus is reused from
   /tmp/scale_probe_100x_realistic).

Usage: python tools_probe_capped_simhash.py [--caps 32,64,128]
       [--growths 10,100] [--cap100 64]
Env: SPARK_GRAFT_DRIVER_MEMORY=64g recommended (pair-emitter floor).
"""

from __future__ import annotations

import math
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from glue_etl_framework_spark import get_spark
from glue_etl_framework_spark.ext.dedup import simhash_neardup_pairs
from glue_etl_framework_spark.ext.similarity import scaled_band_bits
from glue_etl_framework_spark.session import (
    warn_if_below_pair_emitter_floor,
    warn_if_low_disk,
)

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _arg(flag: str, default: str) -> str:
    for a in sys.argv[1:]:
        if a.startswith(flag + "="):
            return a.split("=", 1)[1]
    return default


def pairs(df, n_rows: int, cap: int | None):
    return simhash_neardup_pairs(
        df.select("doc_id", "text"),
        hamming_max=6,
        band_bits=scaled_band_bits(n_rows),
        max_bucket_size=cap,
    )


def timed_count(df) -> tuple[float, int]:
    t0 = time.perf_counter()
    n = df.count()
    return time.perf_counter() - t0, n


def main() -> None:
    caps = [int(c) for c in _arg("--caps", "32,64,128").split(",") if c]
    growths = [int(g) for g in _arg("--growths", "10").split(",") if g]
    cap100 = int(_arg("--cap100", "64"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS") or os.cpu_count() or 8)
    spark = get_spark(app_name="capped_simhash_probe", shuffle_partitions=cpus)
    for msg in (
        warn_if_below_pair_emitter_floor(spark, "ext.simhash_neardup_pairs[capped]"),
        warn_if_low_disk(spark, "ext.simhash_neardup_pairs[capped]"),
    ):
        if msg:
            print(f"WARNING: {msg}", flush=True)

    def corpus(path: str):
        return spark.read.parquet(f"{path}/documents.parquet")

    from pyspark.sql import functions as F

    # --- recall-vs-cap where uncapped completes: base + requested growths.
    # Recall is stratified by Hamming distance: the closest pairs (h<=2,
    # the ones an aggressive dedup actually needs) vs the long tail the
    # homogenized corpus manufactures.
    walls_uncapped: dict[int, float] = {}
    for g in [1] + growths:
        path = SRC if g == 1 else f"/tmp/scale_probe_{g}x_realistic"
        if not os.path.exists(f"{path}/documents.parquet"):
            print(f"{g}x corpus missing at {path}; skipping", flush=True)
            continue
        df = corpus(path)
        n = df.count()
        bits = scaled_band_bits(n)
        t0 = time.perf_counter()
        full = pairs(df, n, None).localCheckpoint(eager=True)
        wall_u = time.perf_counter() - t0
        walls_uncapped[g] = wall_u
        stratum = F.when(F.col("hamming") <= 2, "h<=2").when(
            F.col("hamming") <= 4, "h3-4"
        ).otherwise("h5-6")
        totals = {
            r["s"]: r["n"]
            for r in full.groupBy(stratum.alias("s")).count().withColumnRenamed("count", "n").collect()
        }
        n_full = sum(totals.values())
        print(
            f"{g}x: n={n} band_bits={bits} uncapped wall={wall_u:.2f}s "
            f"pairs={n_full} strata={dict(sorted(totals.items()))}",
            flush=True,
        )
        for cap in caps:
            wall_c, got = timed_count(pairs(df, n, cap))
            kept_df = pairs(df, n, cap).select("doc_a", "doc_b").withColumn("kept", F.lit(1))
            kept = {
                r["s"]: r["k"]
                for r in full.join(kept_df, ["doc_a", "doc_b"], "left")
                .groupBy(stratum.alias("s"))
                .agg(F.sum("kept").alias("k"))
                .collect()
            }
            strata = {
                s: f"{(kept.get(s) or 0)}/{t} ({(kept.get(s) or 0) / t:.3f})"
                for s, t in sorted(totals.items())
            }
            print(
                f"{g}x: cap={cap} wall={wall_c:.2f}s pairs={got} "
                f"recall={got / max(n_full, 1):.4f} per-stratum={strata}",
                flush=True,
            )

    # --- the run that previously died: 100x under the cap (--cap100=0 skips)
    path = "/tmp/scale_probe_100x_realistic"
    if cap100 <= 0:
        print("100x capped run skipped (--cap100=0)", flush=True)
    elif os.path.exists(f"{path}/documents.parquet"):
        df = corpus(path)
        n = df.count()
        bits = scaled_band_bits(n)
        wall, got = timed_count(pairs(df, n, cap100))
        line = (
            f"100x: n={n} band_bits={bits} cap={cap100} wall={wall:.2f}s "
            f"pairs={got}"
        )
        base_wall = walls_uncapped.get(1)
        if base_wall:
            line += f" exponent-vs-uncapped-base {math.log(wall / base_wall) / math.log(100):.2f}"
        print(line, flush=True)
    else:
        print(f"100x corpus missing at {path}; not probed", flush=True)


if __name__ == "__main__":
    main()
