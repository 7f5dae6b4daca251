#!/usr/bin/env python
"""Dump the POST-EXECUTION (AQE-final) physical plan for named registry
queries. The static `.explain("formatted")` dumps committed under plans/
show `AdaptiveSparkPlan isFinalPlan=false` — AQE's runtime decisions
(SMJ -> BroadcastHashJoin conversions, ReusedExchange dedup, coalesced
AQEShuffleRead) are invisible there, and this round's keep/revert calls
twice hinged on them (the prefix-filter window revert, the fused-aggregate
checkpoint). This tool materializes the query through the noop sink and
prints the executed plan, which carries the final re-optimized tree.

Usage:
    python tools_probe_final_plan.py name1,name2 [--sf DIR] [--tag r16]
Writes probes/final_plan_<tag>_<name>.txt when --tag is given.
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--tag", default=None)
    args = ap.parse_args()

    from glue_etl_framework_spark import get_spark
    from glue_etl_framework_spark.queries import load_registry

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS") or os.cpu_count() or 8)
    spark = get_spark(app_name="final-plan", shuffle_partitions=cpus)
    reg = load_registry()
    for name in [n.strip() for n in args.names.split(",") if n.strip()]:
        df = reg[name].fn(spark, args.sf)
        spark.sparkContext.setJobDescription(f"final-plan {name}")
        df.write.format("noop").mode("overwrite").save()
        plan = df._jdf.queryExecution().executedPlan().toString()
        header = f"== AQE-final executed plan: {name} @ {args.sf} ==\n"
        print(header + plan, flush=True)
        if args.tag:
            out = Path(__file__).parent / "probes" / f"final_plan_{args.tag}_{name}.txt"
            out.write_text(header + plan + "\n")
            print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
