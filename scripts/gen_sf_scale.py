"""Generate a SCALED copy of selected sf0.1 tables for spot-benching the
parked scale hypotheses (VERDICT r12 item 3). NOT driver data — the
output lives in scratch, is never committed, and is used only to A/B
plan alternatives at partition sizes where shuffle bytes matter.

Scaling is deterministic (seedless arithmetic on the source rows):
each replica k of N shifts ids by k * (max_id + 1) and perturbs text
deterministically so near-dup structure is preserved per replica but
replicas don't collide. Row counts scale exactly by N.

Usage: python scripts/gen_sf_scale.py --mult 10 --out /root/scratch/sf1 \
           documents lineitem orders events
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aws_vpcflowlogs_parquet_spark.session import get_spark

ID_COLS = {
    "documents": "doc_id",
    "lineitem": "l_orderkey",
    "orders": "o_orderkey",
    "events": "event_id",
    "customer": "c_custkey",
}


def main() -> None:
    args = sys.argv[1:]
    mult = 10
    out = "/root/scratch/sf1"
    src = "/root/testdata/sf0.1"
    if "--mult" in args:
        i = args.index("--mult"); mult = int(args[i + 1]); del args[i : i + 2]
    if "--out" in args:
        i = args.index("--out"); out = args[i + 1]; del args[i : i + 2]
    if "--src" in args:
        i = args.index("--src"); src = args[i + 1]; del args[i : i + 2]
    tables = args or ["documents", "lineitem", "orders", "events"]

    spark = get_spark("gen-sf-scale")
    os.makedirs(out, exist_ok=True)
    for t in tables:
        df = spark.read.parquet(f"{src}/{t}.parquet")
        idc = ID_COLS[t]
        max_id = df.agg(F.max(idc)).collect()[0][0]
        reps = []
        for k in range(mult):
            r = df.withColumn(idc, F.col(idc) + F.lit(k * (int(max_id) + 1)))
            if t == "documents" and k > 0:
                # perturb text deterministically: suffix one replica-unique
                # token so replicas are not exact clones of each other
                # (keeps per-replica near-dup structure intact)
                r = r.withColumn(
                    "text", F.concat(F.col("text"), F.lit(f" zrep{k}"))
                )
            if t == "orders" and k > 0:
                r = r.withColumn(
                    "o_custkey", F.col("o_custkey") + F.lit(0)
                )  # fk space unchanged: joins stay realistic (fan-in grows)
            reps.append(r)
        big = reps[0]
        for r in reps[1:]:
            big = big.unionByName(r)
        n_files = max(1, mult // 2)
        big.repartition(n_files).write.mode("overwrite").parquet(f"{out}/{t}.parquet")
        n = spark.read.parquet(f"{out}/{t}.parquet").count()
        print(f"{t}: {n} rows -> {out}/{t}.parquet")


if __name__ == "__main__":
    main()
