"""Phase-split timing for catalog queries: builder (driver-side plan
construction, incl. any build-time jobs) vs first execution vs steady-state
execution — the §1 'measure first' breakdown that tells fixed overhead from
compute.

Also times the raw table-metadata path (spark.read.parquet per table) since
every builder call pays it.

Usage: python scripts/bench_phase.py [--sf DIR] [--reps N] q_topk q_agg_sum_group ...
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_vpcflowlogs_parquet_spark.plans.catalog import QUERIES
from aws_vpcflowlogs_parquet_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    reps = 3
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i : i + 2]
    spark = get_spark("bench-phase")

    # raw metadata cost: one read.parquet per table, timed cold-ish
    t0 = time.perf_counter()
    for name in ["events", "documents", "lineitem", "orders", "customer"]:
        spark.read.parquet(f"{sf_dir}/{name}.parquet")
    meta = time.perf_counter() - t0
    print(f"read.parquet x5 tables: {meta:.3f}s ({meta/5:.3f}s each)")

    # warm
    QUERIES["q_agg_sum_group"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.catalog.clearCache()

    for name in args or []:
        rows = []
        for r in range(reps):
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            spark.catalog.clearCache()
            rows.append({"build": round(t1 - t0, 3), "exec": round(t2 - t1, 3)})
        print(json.dumps({"query": name, "runs": rows}))


if __name__ == "__main__":
    main()
