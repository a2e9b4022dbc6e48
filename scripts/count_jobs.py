"""Count Spark jobs per catalog query (build + noop exec), for the
r13 probe-fusion evidence: the _ckpt_count change moves convergence
probes into the checkpoint materialization, so the win shows up as a
lower job count, not in the final unrolled plan text.

Usage: python scripts/count_jobs.py q_kcore q_ktruss ...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_vpcflowlogs_parquet_spark.plans.catalog import QUERIES
from aws_vpcflowlogs_parquet_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("count-jobs")
    sc = spark.sparkContext
    for name in sys.argv[1:]:
        sc.setJobGroup(name, name)
        t0 = time.perf_counter()
        try:
            df = QUERIES[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
        finally:
            sc.setJobGroup(None, None)
        dt = time.perf_counter() - t0
        n = len(sc.statusTracker().getJobIdsForGroup(name))
        print(f"{name}: jobs={n} wall={dt:.2f}s")


if __name__ == "__main__":
    main()
