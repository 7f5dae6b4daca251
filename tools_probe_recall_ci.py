#!/usr/bin/env python
"""Design-based CI validation for the lost-pair estimator (VERDICT r14
item 4): re-run the r14 probe configurations (probes/recall_estimator_r14.txt)
and check that ``ci95_design`` — the delete-one-jackknife interval over the
uniform tail draws — covers the recorded ground truths where the nominal
independence CI measurably did not.

Configs reproduced verbatim from the r14 artifact:
- 1x  = $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) documents,
  hamming_max=6 (7 bands), band_bits=8, cap=160 (the resolved 'auto'),
  truth 2,196,041 (uncapped-minus-capped set difference,
  probes/capped_simhash_r13.txt).
- 10x = /tmp/scale_probe_10x_realistic documents (rebuild with
  ``python tools_scale_probe.py 10 --realistic`` if absent), band_bits=11,
  cap=200, truth 6,995,840.

Usage: python tools_probe_recall_ci.py [--skip-10x]
Output: stdout + probes/recall_estimator_r15.txt
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from glue_etl_framework_spark import get_spark
from glue_etl_framework_spark.ext.dedup import (
    estimate_lost_simhash_pairs,
    simhash_band_signatures,
)

HAMMING_MAX = 6
N_BANDS = HAMMING_MAX + 1
ONE_X = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TEN_X = "/tmp/scale_probe_10x_realistic"

# (tag, sf_dir, band_bits, cap, truth, [(K, M), ...])
CONFIGS = [
    ("1x", ONE_X, 8, 160, 2_196_041, [(8, 256), (16, 512)]),
    ("10x", TEN_X, 11, 200, 6_995_840, [(32, 512), (126, 1024)]),
]


def main() -> None:
    skip_10x = "--skip-10x" in sys.argv[1:]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS") or os.cpu_count() or 8)
    spark = get_spark(app_name="recall_ci_probe", shuffle_partitions=cpus)
    lines = [
        "# r15: design-based CI for the lost-pair estimator (VERDICT r14 item 4)",
        "# same configs as probes/recall_estimator_r14.txt; 'covered' means",
        "# |est - truth| <= ci95_design for this deterministic draw. The r14",
        "# nominal CIs measurably understated (1x K=8: err -130,663 vs +-15,437).",
    ]
    for tag, sf_dir, band_bits, cap, truth, samples in CONFIGS:
        if tag == "10x" and skip_10x:
            lines.append("[10x] skipped (--skip-10x)")
            continue
        docs_path = f"{sf_dir}/documents.parquet"
        if not os.path.exists(docs_path):
            lines.append(
                f"[{tag}] SKIPPED: {docs_path} missing (build with "
                "tools_scale_probe.py 10 --realistic)"
            )
            continue
        docs = spark.read.parquet(docs_path).select("doc_id", "text")
        sig = simhash_band_signatures(docs, n_bands=N_BANDS, band_bits=band_bits)
        for k, m in samples:
            t0 = time.time()
            est = estimate_lost_simhash_pairs(
                sig,
                hamming_max=HAMMING_MAX,
                max_bucket_size=cap,
                sample_buckets=k,
                max_members_per_bucket=m,
            )
            wall = time.time() - t0
            err = est["est_lost_pairs"] - truth
            covered = abs(err) <= est["ci95_design"]
            lines.append(
                f"[{tag}] K={k} M={m}: wall={wall:.1f}s "
                f"est={est['est_lost_pairs']:.0f} "
                f"ci95_nominal=+-{est['ci95']:.0f} "
                f"ci95_design=+-{est['ci95_design']:.0f} "
                f"method={est['ci_method']} hot={est['hot_buckets']} "
                f"vs truth {truth} (err {err:+.0f}, "
                f"rel {err / truth:+.3f}) covered={covered}"
            )
            print(lines[-1], flush=True)
    out = Path(__file__).with_name("probes") / "recall_estimator_r15.txt"
    out.write_text("\n".join(lines) + "\n")
    print(f"wrote {out}")
    spark.stop()


if __name__ == "__main__":
    main()
