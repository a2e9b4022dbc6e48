"""Interleaved A/B of streaming-harness posture knobs (VERDICT r13 items
1 & 6): state-partition count (SPARK_GRAFT_STREAM_PARTITIONS) and the
state-store provider, over the registered stream queries themselves —
the builders run their own availableNow harness, so wall time here is
exactly what the bench times.

Usage:
  python scripts/ab_stream.py --reps 4 --partitions 6,2 q_stream_stream_join ...
  python scripts/ab_stream.py --reps 4 --provider rocksdb q_stream_stream_join
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_vpcflowlogs_parquet_spark.plans.catalog import QUERIES
from aws_vpcflowlogs_parquet_spark.session import get_spark

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)


def main() -> None:
    args = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = 4
    parts = ["6"]
    providers = ["hdfs"]
    if "--reps" in args:
        i = args.index("--reps"); reps = int(args[i + 1]); del args[i : i + 2]
    if "--partitions" in args:
        i = args.index("--partitions")
        parts = args[i + 1].split(",")
        del args[i : i + 2]
    if "--provider" in args:
        i = args.index("--provider")
        providers = ["hdfs", args[i + 1]]
        del args[i : i + 2]
    names = args

    spark = get_spark("ab-stream")
    variants = [(p, pr) for p in parts for pr in providers]
    results: dict = {}
    for rep in range(reps):
        for p, pr in variants:
            if p == "auto":
                os.environ.pop("SPARK_GRAFT_STREAM_PARTITIONS", None)
            else:
                os.environ["SPARK_GRAFT_STREAM_PARTITIONS"] = p
            if pr == "rocksdb":
                spark.conf.set(
                    "spark.sql.streaming.stateStore.providerClass", ROCKSDB
                )
            else:
                spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
            for name in names:
                t0 = time.perf_counter()
                df = QUERIES[name](spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                results.setdefault((name, p, pr), []).append(dt)
                print(
                    f"rep{rep} {name} parts={p} prov={pr}: {dt:.2f}s",
                    flush=True,
                )
    os.environ.pop("SPARK_GRAFT_STREAM_PARTITIONS", None)
    print("\n=== medians ===")
    for (name, p, pr), ts in sorted(results.items()):
        print(
            f"{name} parts={p} prov={pr}: median {statistics.median(ts):.2f}s"
            f"  ({', '.join(f'{t:.2f}' for t in ts)})"
        )


if __name__ == "__main__":
    main()
