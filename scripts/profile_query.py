"""Profile catalog queries: execute and print the SQLMetrics digest
(rows, shuffle volume, spills, peak memory) per query.

Usage: python scripts/profile_query.py q_topk q_agg_sum_group
       python scripts/profile_query.py --sf /root/testdata/sf0.1 q_topk
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_vpcflowlogs_parquet_spark.observability import profile
from aws_vpcflowlogs_parquet_spark.plans.catalog import QUERIES
from aws_vpcflowlogs_parquet_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.001"
    if args and args[0] == "--sf":
        sf_dir = args[1]
        args = args[2:]
    spark = get_spark("profile")
    for name in args or sorted(QUERIES):
        digest = profile(QUERIES[name](spark, sf_dir))
        print(json.dumps({"query": name, **digest}))


if __name__ == "__main__":
    main()
