#!/usr/bin/env python
"""Scale probe: replicate the sf0.1 volume tables Nx with shifted keys and
time heavy queries against the inflated copy (SCALING.md method, committed
as a tool — round 2 ran this ad-hoc).

Replication semantics (realistic fact growth, not 10-way exact dupes):
- orders/lineitem: orderkey offset per replica (custkey/partkey/suppkey kept
  — dimension joins stay realistic).
- events: event_id AND user_id offset (user population grows with volume —
  required to probe per-user aggregates like events_user_gini honestly).
- documents: doc_id offset, text prefixed per replica (shingle sets shift;
  replicas remain honest near-dups of each other, which inflates
  pair-emitting dedup OUTPUT on purpose — see SCALING.md discussion).
- embeddings: vec_id offset, one coordinate perturbed per replica.
- part: partkey offset, retail price nudged per replica (part IS sf-scaled
  in TPC-H; fixed in the round-2 probe, replicated since round 3 so
  part-dimension operators — e.g. the two-level skyline — are probed on a
  GROWING input).
- region/nation/customer/supplier: fixed.

Usage: python tools_scale_probe.py [N_REPLICAS] [query ...]
Writes the inflated tables to /tmp/scale_probe_<N>x (reused if present).
"""

from __future__ import annotations

import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import functions as F

from glue_etl_framework_spark import get_spark
from glue_etl_framework_spark.queries import load_registry, t

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

KEY_OFFSET = 1_000_000_000  # far above any fixture key

DEFAULT_QUERIES = [
    "dedup_containment_pairs",
    "dedup_ngram_jaccard",
    "text_source_drift_kl",
    "part_pareto_skyline",
    "events_user_gini",
    "quality_fk_coverage_summary",
]


def build(spark, n: int, out_dir: str) -> None:
    fixed = ["region", "nation", "customer", "supplier"]
    for name in fixed:
        t(spark, SRC, name).write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")

    def replicate(name, shift_fn):
        base = t(spark, SRC, name)
        reps = [shift_fn(base, r) for r in range(n)]
        out = reps[0]
        for rep in reps[1:]:
            out = out.unionByName(rep)
        out.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")

    replicate(
        "orders",
        lambda df, r: df.withColumn("o_orderkey", F.col("o_orderkey") + r * KEY_OFFSET),
    )
    replicate(
        "lineitem",
        lambda df, r: df.withColumn("l_orderkey", F.col("l_orderkey") + r * KEY_OFFSET),
    )
    replicate(
        "events",
        lambda df, r: df.withColumn("event_id", F.col("event_id") + r * KEY_OFFSET)
        .withColumn("user_id", F.col("user_id") + r * KEY_OFFSET),
    )
    replicate(
        "documents",
        lambda df, r: df.withColumn("doc_id", F.col("doc_id") + r * KEY_OFFSET)
        .withColumn("text", F.concat(F.lit(f"rep{r} marker "), F.col("text"))),
    )
    replicate(
        "embeddings",
        lambda df, r: df.withColumn("vec_id", F.col("vec_id") + r * KEY_OFFSET)
        .withColumn(
            "embedding",
            F.transform(
                "embedding",
                lambda x, i: x + F.when(i == 0, F.lit(r * 1e-3)).otherwise(F.lit(0.0)),
            ),
        ),
    )
    replicate(
        "part",
        lambda df, r: df.withColumn("p_partkey", F.col("p_partkey") + r * KEY_OFFSET)
        .withColumn("p_retailprice", F.col("p_retailprice") + F.lit(r * 0.01)),
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    queries = sys.argv[2:] or DEFAULT_QUERIES
    out_dir = f"/tmp/scale_probe_{n}x"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS") or os.cpu_count() or 8)
    spark = get_spark(app_name="scale_probe", shuffle_partitions=cpus)
    reg = load_registry()
    done_marker = f"{out_dir}/_BUILD_COMPLETE"
    if not os.path.exists(done_marker):
        print(f"building {n}x tables in {out_dir} ...", flush=True)
        build(spark, n, out_dir)
        Path(done_marker).touch()

    def run(fn, sf_dir):
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    for name in queries:
        fn = reg[name].fn
        run(fn, SRC)  # warm-up
        base = []
        for _ in range(3):
            t0 = time.perf_counter()
            run(fn, SRC)
            base.append(time.perf_counter() - t0)
        run(fn, out_dir)  # warm-up
        big = []
        for _ in range(3):
            t0 = time.perf_counter()
            run(fn, out_dir)
            big.append(time.perf_counter() - t0)
        b, g = statistics.median(base), statistics.median(big)
        print(
            f"{name}: sf0.1 {b:.2f}s  {n}x {g:.2f}s  ratio {g / b:.1f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
