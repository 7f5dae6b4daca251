#!/usr/bin/env python
"""Bounded-output probe: the capped simhash emitter at 100x (VERDICT r11
item 2).

The r11 eleventh probe's 100x simhash run died filling the 252 GB disk
with shuffle spill: the realistic corpus's filler tokens homogenize
within-replica token sets, so true pair density is quadratic in replica
size (~10^9-10^10 candidate rows at 100x) and NO banding width bounds the
stream — only a cap does. This probe measures what the cap costs and what
it buys, with the two cost phases timed separately:

- wall_sig: the signature build (simhash_band_signatures + checkpoint) —
  the shared, linear-in-n cost, paid once per corpus;
- wall_emit: candidates + exact-Hamming verify per (cap) setting, via
  simhash_neardup_pairs(signatures=sig) so every setting reuses the same
  build (the API's signature-reuse path).

1. recall-vs-cap at base and 10x, where the uncapped emitter completes:
   recall = |capped| / |uncapped| overall and per Hamming stratum
   (capped output is a proven subset — tests/test_simhash_banding.py).
2. the 100x run that previously died, under the chosen cap: wall_sig +
   wall_emit + output (uncapped 100x is NOT attempted — that is the run
   that filled the disk).

Usage: python tools_probe_capped_simhash.py [--caps=64,256,1024]
       [--growths=10] [--cap100=64]
Env: SPARK_GRAFT_DRIVER_MEMORY=64g recommended (pair-emitter floor).
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from glue_etl_framework_spark import get_spark
from glue_etl_framework_spark.ext.dedup import (
    simhash_band_signatures,
    simhash_neardup_pairs,
)
from glue_etl_framework_spark.ext.similarity import scaled_band_bits
from glue_etl_framework_spark.session import (
    warn_if_below_pair_emitter_floor,
    warn_if_low_disk,
)

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
HAMMING_MAX = 6
N_BANDS = HAMMING_MAX + 1


def _arg(flag: str, default: str) -> str:
    for a in sys.argv[1:]:
        if a.startswith(flag + "="):
            return a.split("=", 1)[1]
    return default


def main() -> None:
    # each cap is an int or the literal 'auto' (resolved per corpus via
    # ext.similarity.auto_bucket_cap(n, band_bits) — VERDICT r12 item 3)
    caps = [
        c if c == "auto" else int(c)
        for c in _arg("--caps", "64,256,1024").split(",")
        if c
    ]
    growths = [int(g) for g in _arg("--growths", "10").split(",") if g]
    cap100_raw = _arg("--cap100", "64")
    cap100 = cap100_raw if cap100_raw == "auto" else int(cap100_raw)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS") or os.cpu_count() or 8)
    spark = get_spark(app_name="capped_simhash_probe", shuffle_partitions=cpus)
    for msg in (
        warn_if_below_pair_emitter_floor(spark, "ext.simhash_neardup_pairs[capped]"),
        warn_if_low_disk(spark, "ext.simhash_neardup_pairs[capped]"),
    ):
        if msg:
            print(f"WARNING: {msg}", flush=True)

    from pyspark.sql import functions as F

    def corpus(path: str):
        return (
            spark.read.parquet(f"{path}/documents.parquet").select("doc_id", "text")
        )

    def build_sig(df, bits: int):
        """(wall_sig, checkpointed signature frame)."""
        t0 = time.perf_counter()
        sig = simhash_band_signatures(
            df, n_bands=N_BANDS, band_bits=bits
        ).localCheckpoint(eager=True)
        return time.perf_counter() - t0, sig

    def emit(df, sig, cap, bits, metrics=None):
        # band_bits must MATCH the passed signature build: with signatures=
        # it feeds only the 'auto' cap resolution (per-band width is not
        # recoverable from the frame)
        return simhash_neardup_pairs(
            df, hamming_max=HAMMING_MAX, band_bits=bits,
            max_bucket_size=cap, signatures=sig, cap_metrics=metrics,
        )

    def timed_emit(df, sig, cap, bits, metrics=None):
        t0 = time.perf_counter()
        out = emit(df, sig, cap, bits, metrics).localCheckpoint(eager=True)
        return time.perf_counter() - t0, out

    stratum = F.when(F.col("hamming") <= 2, "h<=2").when(
        F.col("hamming") <= 4, "h3-4"
    ).otherwise("h5-6")

    # --- recall-vs-cap where uncapped completes: base + requested growths
    for g in [1] + growths:
        path = SRC if g == 1 else f"/tmp/scale_probe_{g}x_realistic"
        if not os.path.exists(f"{path}/documents.parquet"):
            print(f"{g}x corpus missing at {path}; skipping", flush=True)
            continue
        df = corpus(path)
        n = df.count()
        bits = scaled_band_bits(n)
        wall_sig, sig = build_sig(df, bits)
        wall_u, full = timed_emit(df, sig, None, bits)
        totals = {
            r["s"]: r["n"]
            for r in full.groupBy(stratum.alias("s")).agg(F.count("*").alias("n")).collect()
        }
        n_full = sum(totals.values())
        print(
            f"{g}x: n={n} band_bits={bits} wall_sig={wall_sig:.2f}s "
            f"uncapped wall_emit={wall_u:.2f}s pairs={n_full} "
            f"strata={dict(sorted(totals.items()))}",
            flush=True,
        )
        for cap in caps:
            metrics = {}
            wall_c, capped = timed_emit(df, sig, cap, bits, metrics)
            kept = {
                r["s"]: r["k"]
                for r in full.join(
                    capped.select("doc_a", "doc_b").withColumn("kept", F.lit(1)),
                    ["doc_a", "doc_b"],
                    "left",
                )
                .groupBy(stratum.alias("s"))
                .agg(F.sum("kept").alias("k"))
                .collect()
            }
            got = sum(v or 0 for v in kept.values())
            strata = {
                s: f"{(kept.get(s) or 0)}/{t} ({(kept.get(s) or 0) / t:.3f})"
                for s, t in sorted(totals.items())
            }
            print(
                f"{g}x: cap={cap} wall_emit={wall_c:.2f}s pairs={got} "
                f"recall={got / max(n_full, 1):.4f} per-stratum={strata} "
                f"cap_metrics={metrics}",
                flush=True,
            )

    # --- the run that previously died: 100x under the cap (--cap100=0 skips)
    path = "/tmp/scale_probe_100x_realistic"
    if cap100 != "auto" and cap100 <= 0:
        print("100x capped run skipped (--cap100=0)", flush=True)
    elif os.path.exists(f"{path}/documents.parquet"):
        df = corpus(path)
        n = df.count()
        bits = scaled_band_bits(n)
        wall_sig, sig = build_sig(df, bits)
        metrics = {}
        wall_c, capped = timed_emit(df, sig, cap100, bits, metrics)
        print(
            f"100x: n={n} band_bits={bits} cap={cap100} wall_sig={wall_sig:.2f}s "
            f"wall_emit={wall_c:.2f}s total={wall_sig + wall_c:.2f}s "
            f"pairs={capped.count()} cap_metrics={metrics}",
            flush=True,
        )
    else:
        print(f"100x corpus missing at {path}; not probed", flush=True)


if __name__ == "__main__":
    main()
