#!/usr/bin/env python
"""Name-targeted strict-oracle check for the optimization round: run the
named registry entries through tests.oracle_harness.compare_query on vanilla
sessions (mirroring the driver / tools_window_sweep) at the given shuffle
settings, on sf0.01.

Usage:
    python tools_opt_oracle.py name1,name2 [--shuffle 8,200] [--tag r15opt]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_ORACLE = "/root/testdata/sf0.01"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names")
    ap.add_argument("--shuffle", default="8,200")
    ap.add_argument("--tag", default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from glue_etl_framework_spark.queries import load_registry
    from tests.oracle_harness import compare_query, duckdb_connection

    registry = load_registry()
    names = [n.strip() for n in args.names.split(",") if n.strip()]
    shuffles = [int(s) for s in args.shuffle.split(",")]
    lines = [f"# targeted oracle check names={names} shuffle={shuffles} sf_dir={SF_ORACLE}"]
    n_fail = 0
    con = duckdb_connection(SF_ORACLE)
    try:
        for shuffle in shuffles:
            spark = (
                SparkSession.builder.master("local[8]")
                .appName(f"opt-oracle-s{shuffle}")
                .config("spark.sql.shuffle.partitions", str(shuffle))
                .config("spark.sql.session.timeZone", "UTC")
                .config("spark.ui.showConsoleProgress", "false")
                .getOrCreate()
            )
            spark.sparkContext.setLogLevel("ERROR")
            for name in names:
                t0 = time.time()
                res = compare_query(registry[name], spark, con, SF_ORACLE)
                status = "OK " if res.ok else "FAIL"
                if not res.ok:
                    n_fail += 1
                line = (
                    f"[shuffle={shuffle}] {status} {name} "
                    f"rows={res.spark_rows}/{res.oracle_rows} {time.time() - t0:.1f}s"
                    + ("" if res.ok else f" :: {res.mismatches}")
                )
                print(line, flush=True)
                lines.append(line)
            spark.stop()
    finally:
        con.close()
    lines.append(f"# total checks={len(names) * len(shuffles)} fails={n_fail}")
    print(lines[-1])
    if args.tag:
        out = Path(__file__).parent / "probes" / f"oracle_targeted_{args.tag}.txt"
        out.write_text("\n".join(lines) + "\n")
        print(f"wrote {out}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
