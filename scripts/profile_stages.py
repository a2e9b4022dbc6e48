"""Per-operator metric dump for catalog queries (post-AQE plan walk):
codegen span durations, scan times, shuffle volumes, AQE partition
counts — enough to spot a stage whose wall time concentrates in one
task (single-row-group scan / coalesced-to-one pattern) without the UI.

Usage: python scripts/profile_stages.py [--sf DIR] q_bootstrap_ci ...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_vpcflowlogs_parquet_spark.observability import _metrics, _nodes
from aws_vpcflowlogs_parquet_spark.plans.catalog import QUERIES
from aws_vpcflowlogs_parquet_spark.session import get_spark

INTERESTING = (
    "pipelineTime",
    "scanTime",
    "shuffleBytesWritten",
    "shuffleRecordsWritten",
    "numPartitions",
    "numOutputRows",
    "aggTime",
    "sortTime",
    "buildTime",
    "numFiles",
    "numCoalescedPartitions",
    "spillSize",
)


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    spark = get_spark("profile-stages")
    QUERIES["q_agg_sum_group"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.catalog.clearCache()
    for name in args:
        df = QUERIES[name](spark, sf_dir)
        t0 = time.perf_counter()
        # collect, not noop-write: the write wraps the plan in its own
        # QueryExecution, leaving df's node metrics empty. Catalog
        # queries return small results, so collect is fine here.
        n = len(df.collect())
        wall = time.perf_counter() - t0
        spark.catalog.clearCache()
        print(f"== {name}: wall {wall:.2f}s")
        for node in _nodes(df._jdf.queryExecution().executedPlan()):
            nm = node.nodeName()
            vals = _metrics(node)
            shown = {
                k: v
                for k, v in vals.items()
                if any(t in k for t in INTERESTING) and v
            }
            if shown:
                compact = ", ".join(
                    f"{k}={v}" for k, v in sorted(shown.items())
                )
                print(f"   {nm[:46]:46s} {compact[:150]}")


if __name__ == "__main__":
    main()
