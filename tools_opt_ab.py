#!/usr/bin/env python
"""Per-query A/B harness for the optimization round: for each named registry
query, capture `.explain("formatted")` to plans/r15/<name>_<tag>.txt and time
median-of-N noop-sink materializations on a fresh bench-identical session
(master local[$SPARK_GRAFT_CPUS], shuffle_partitions=cpus — the same contract
bench.py uses, so A/B numbers are comparable to bench medians).

Usage:
    python tools_opt_ab.py name1,name2 --tag before [--runs 5] [--sf /root/testdata/sf0.1] [--no-plan]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--no-plan", action="store_true")
    ap.add_argument("--plans-dir", default="plans/r15")
    args = ap.parse_args()

    from glue_etl_framework_spark import get_spark
    from glue_etl_framework_spark.queries import load_registry

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS") or os.cpu_count() or 8)
    spark = get_spark(app_name=f"opt-ab-{args.tag}", shuffle_partitions=cpus)
    reg = load_registry()
    names = [n.strip() for n in args.names.split(",") if n.strip()]
    plans_dir = Path(__file__).parent / args.plans_dir
    plans_dir.mkdir(parents=True, exist_ok=True)

    results: dict[str, float] = {}
    for name in names:
        fn = reg[name].fn
        if not args.no_plan:
            df = fn(spark, args.sf)
            qe = df._jdf.queryExecution()
            formatted = qe.explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            (plans_dir / f"{name}_{args.tag}.txt").write_text(formatted)
        if args.runs < 1:  # plan-only capture
            print(f"{name}: plan written", flush=True)
            continue
        spark.sparkContext.setJobDescription(f"{name} [{args.tag}] warmup")
        fn(spark, args.sf).write.format("noop").mode("overwrite").save()
        runs = []
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"{name} [{args.tag}] run {i}")
            t0 = time.perf_counter()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        results[name] = round(statistics.median(runs), 4)
        print(f"{name}: {results[name]}s  (runs: {[round(r, 3) for r in runs]})", flush=True)
    print(json.dumps({"tag": args.tag, "medians": results}))


if __name__ == "__main__":
    main()
