"""Catalog-wide SQLMetrics sweep: profile every batch query and flag
plan-health anomalies — spills, shuffle volume far above scan volume,
excessive exchange counts. The flags are triage heuristics, not
failures (token/shingle pipelines legitimately shuffle more rows than
they scan); the hard invariant asserted here is ZERO spill.

Usage: python scripts/metrics_sweep.py [--sf DIR]
Prints one JSON line per flagged query plus a summary; exits non-zero
only if a query SPILLS (the one unambiguous red flag at small SF).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_vpcflowlogs_parquet_spark.observability import profile
from aws_vpcflowlogs_parquet_spark.plans.catalog import QUERIES
from aws_vpcflowlogs_parquet_spark.session import get_spark


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if args and args[0] == "--sf":
        sf_dir = args[1]
    spark = get_spark("sweep")
    spills = 0
    n = 0
    for name in sorted(QUERIES):
        if name.startswith("q_stream"):
            continue  # availableNow streams don't re-execute under collect
        d = profile(QUERIES[name](spark, sf_dir))
        n += 1
        flags = []
        if d["spill_bytes"] > 0:
            flags.append("SPILL")
            spills += 1
        if d["scan_rows"] and d["shuffle_records"] > 3 * d["scan_rows"]:
            flags.append("shuffle>3x-scan (fan-out pipeline?)")
        if d["n_exchanges"] > 8:
            flags.append(f"exchanges={d['n_exchanges']}")
        if flags:
            print(json.dumps({"query": name, "flags": flags, **d}))
    print(json.dumps({"summary": {"queries": n, "spilling": spills}}))
    return 1 if spills else 0


if __name__ == "__main__":
    raise SystemExit(main())
